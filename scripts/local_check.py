#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle SQL in DuckDB
over the same parquet tables and diff against the Spark parquet dumps
written by graft.Verify. Mimics the driver: sort columns by name, sort
rows, compare values exactly.

Usage: python3 scripts/local_check.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: the engine must be bit-identical
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    try:
        if a != a and b != b:  # NaN-ish
            return True
    except Exception:
        pass
    return a == b


def main(sf_dir, out_dir, only_dumped=False, sql_only=False):
    con = duckdb.connect()
    # Cap DuckDB and give it a spill path: the round-13 sf1 run was
    # OOM-KILLED by the kernel (125 GB RSS) while evaluating x211's
    # oracle — an uncapped DuckDB prefers RAM over spilling. With a
    # limit + temp_directory the same query spills and completes (or
    # fails loudly inside DuckDB), and the gate can never take the
    # whole box down again.
    con.execute("SET memory_limit='24GB'")
    con.execute("SET preserve_insertion_order=false")
    os.makedirs("tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    if sql_only:
        # --sql-only: EXECUTE every oracle string (no Spark dumps needed,
        # out_dir only has to contain oracle_sql.json). This is the cheap
        # pre-round gate: a broken oracle string can never silently zero
        # a round's correctness again (round-11 brief item #7).
        for name, sql in sorted(oracles.items()):
            try:
                con.execute(sql).fetchall()
                print(f"PASS {name} (sql executes)")
                n_pass += 1
            except Exception as e:
                print(f"FAIL {name}: oracle SQL error: {e}")
                n_fail += 1
        print(f"== {n_pass} pass, {n_fail} fail ==")
        return 1 if n_fail else 0
    for name, sql in sorted(oracles.items()):
        # --only-dumped: targeted iteration (SPARK_GRAFT_QUERIES subsets)
        # writes only some dumps; skip the rest instead of FAILing them.
        # The full driver-mimicking gate must NOT pass this flag.
        if only_dumped and not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        # The driver hashes STRINGIFIED cells, so a dtype drift that is
        # value-equal still fails remotely: round 7's x59 was cell-exact
        # but DuckDB's HUGEINT promotion made the oracle column float64,
        # and "10000.0" hashes != "10000". Python == is blind to that
        # (10000.0 == 10000 is True), so compare dtype KINDS per column
        # (int vs float vs object). Signed/unsigned (kinds 'i'/'u') and
        # width-only differences stringify identically and are allowed;
        # float-width drift shares kind 'f' but can STILL stringify
        # differently (np.float32(0.1) prints '0.1', the same value
        # widened to float64 prints '0.10000000149011612'), so float
        # columns additionally get the stringified compare below.
        kind_bad = [
            (col, str(g[col].dtype), str(w[col].dtype))
            for col in g.columns
            if g[col].dtype.kind != w[col].dtype.kind
            and {g[col].dtype.kind, w[col].dtype.kind} != {"i", "u"}
        ]
        if kind_bad:
            col, gk, wk = kind_bad[0]
            print(f"FAIL {name}: dtype drift col={col} spark={gk} oracle={wk}"
                  f" (driver hashes stringified cells; 10000 != 10000.0)")
            n_fail += 1
            continue
        str_bad = None
        for col in g.columns:
            if g[col].dtype.kind == "f" or w[col].dtype.kind == "f":
                gs = g[col].astype(str).tolist()
                ws = w[col].astype(str).tolist()
                for i, (a, b) in enumerate(zip(gs, ws)):
                    if a != b:
                        str_bad = (col, i, a, b)
                        break
            if str_bad:
                break
        if str_bad:
            col, i, a, b = str_bad
            print(f"FAIL {name}: stringified float drift col={col} row={i}"
                  f" spark={a!r} oracle={b!r} (driver hashes stringified cells)")
            n_fail += 1
            continue
        bad = None
        for col in g.columns:
            gv, wv = list(g[col]), list(w[col])
            for i, (a, b) in enumerate(zip(gv, wv)):
                if not cell_eq(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: col={col} row={i} spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    flags = {"--only-dumped", "--sql-only"}
    args = [a for a in sys.argv[1:] if a not in flags]
    sys.exit(main(args[0], args[1],
                  only_dumped="--only-dumped" in sys.argv,
                  sql_only="--sql-only" in sys.argv))
