#!/usr/bin/env python3
"""Pinned protocol for the bench gate's DENOMINATOR: the DuckDB wall
over every registered oracle SQL on the same parquet tables.

The round-16 review measured the wall's protocol sensitivity firsthand:
a same-connection accumulated pass read 114.5 s where fresh-connection
passes read 57.7-66.7 s — DuckDB's buffer-pool state and accumulated
temp structures double the number depending on measurement style, so an
unpinned denominator moves the engine/oracle ratio by 2x on its own.
This script IS the protocol; the receipt it writes cites it by name.

Protocol (each measured dimension declared in the receipt):
  - FRESH duckdb connection per pass (no cross-pass buffer reuse),
    3 passes, suite wall = sum of per-query execution walls within the
    pass, headline = MIN pass wall (same steady-state estimator as the
    engine bench's min-of-N);
  - per-query walls = min across passes, kept in the receipt for plan
    audits;
  - BOTH sort dispositions: "kept" runs each oracle verbatim;
    "stripped" removes the TERMINAL top-level ORDER BY (the same
    presentation-only clause the engine bench strips — the round-16
    advisor flagged the one-sided strip as biased in the engine's
    favor, so the matched-scale comparison must pair engine-stripped
    with oracle-stripped, and this receipt carries both so either
    pairing is auditable). An ORDER BY followed by LIMIT/OFFSET is
    load-bearing and is never stripped (n_unstrippable declares how
    many).
  - memory capped + spill dir exactly like the gate itself
    (local_check.py): the denominator must be the same DuckDB the
    correctness gate runs.

Usage:
  python3 scripts/oracle_wall.py <sfDir> <oracle_sql.json> <out.json> [passes]
e.g.
  python3 scripts/oracle_wall.py /root/testdata/sf0.1 \
      /tmp/verify_out/oracle_sql.json receipts/duckdb_sf01_wall_r17.json
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def strip_terminal_order_by(sql):
    """Remove a trailing top-level ORDER BY clause.

    Returns (sql, status) where status is one of:
      "stripped" — a terminal presentation-only ORDER BY was removed;
      "retained" — a terminal ORDER BY exists but LIMIT/OFFSET follows
                   it (load-bearing, never stripped);
      "none"     — no top-level terminal ORDER BY in the query at all.
    Only "retained" counts toward the receipt's n_unstrippable — a
    query with no ORDER BY was never a candidate for stripping and
    must not inflate that declaration.

    Depth- and quote-aware scan: the clause must sit at paren depth 0
    outside string literals, and nothing semantic (LIMIT/OFFSET) may
    follow it — an ORDER BY that feeds a LIMIT changes the result set
    and is never stripped."""
    depth = 0
    in_str = False
    last = -1
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if in_str:
            if c == "'":
                # doubled quote = escaped quote inside the literal
                if i + 1 < n and sql[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and c in "oO" and sql[i:i + 5].upper() == "ORDER":
            j = i + 5
            while j < n and sql[j].isspace():
                j += 1
            if sql[j:j + 2].upper() == "BY":
                last = i
        i += 1
    if last < 0:
        return sql, "none"
    tail = sql[last:].upper()
    if "LIMIT" in tail or "OFFSET" in tail:
        return sql, "retained"
    return sql[:last].rstrip(), "stripped"


def fresh_connection(sf_dir):
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    con.execute("SET preserve_insertion_order=false")
    os.makedirs("tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def measure(sf_dir, oracles, passes):
    """One disposition: per-pass suite walls + per-query min walls."""
    names = sorted(oracles)
    per_query = {n: [] for n in names}
    suite_walls = []
    errors = {}
    for p in range(passes):
        con = fresh_connection(sf_dir)  # FRESH per pass: the pinned protocol
        wall = 0.0
        for name in names:
            t0 = time.perf_counter()
            try:
                con.execute(oracles[name]).fetchall()
                dt = time.perf_counter() - t0
                per_query[name].append(dt)
                wall += dt
            except Exception as e:  # a broken oracle must be loud, not a fast wall
                errors[name] = str(e)[:200]
        con.close()
        suite_walls.append(round(wall, 3))
        print(f"  pass {p + 1}/{passes}: {wall:.1f} s", file=sys.stderr)
    return {
        "suite_walls": suite_walls,
        "min_wall": min(suite_walls),
        "per_query_min": {n: round(min(w), 4) for n, w in per_query.items() if w},
        "errors": errors,
    }


def main(sf_dir, oracle_path, out_path, passes=3):
    with open(oracle_path) as f:
        oracles = json.load(f)
    stripped = {}
    n_unstrippable = 0  # terminal ORDER BY retained because LIMIT/OFFSET follows
    n_no_order_by = 0   # no terminal ORDER BY to strip in the first place
    for name, sql in oracles.items():
        s, status = strip_terminal_order_by(sql)
        stripped[name] = s
        if status == "retained":
            n_unstrippable += 1
        elif status == "none":
            n_no_order_by += 1
    print(f"oracle_wall: {len(oracles)} oracles, sort KEPT:", file=sys.stderr)
    kept_res = measure(sf_dir, oracles, passes)
    print(f"oracle_wall: sort STRIPPED ({n_unstrippable} unstrippable):",
          file=sys.stderr)
    stripped_res = measure(sf_dir, stripped, passes)
    receipt = {
        "protocol": "scripts/oracle_wall.py: fresh connection per pass, "
                    f"{passes} passes, min pass wall; memory 24GB + spill "
                    "(same DuckDB config as local_check.py)",
        "sf_dir": sf_dir,
        "n_queries": len(oracles),
        "passes": passes,
        "sort_kept": kept_res,
        "sort_stripped": stripped_res,
        "n_unstrippable": n_unstrippable,
        "n_no_order_by": n_no_order_by,
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(receipt, f, indent=1)
    print(json.dumps({
        "kept_min": kept_res["min_wall"],
        "stripped_min": stripped_res["min_wall"],
        "n_errors": len(kept_res["errors"]) + len(stripped_res["errors"]),
        "receipt": out_path,
    }))
    return 0


if __name__ == "__main__":
    a = sys.argv[1:]
    sys.exit(main(a[0], a[1], a[2], int(a[3]) if len(a) > 3 else 3))
