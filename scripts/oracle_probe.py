#!/usr/bin/env python3
"""Piece-wise DuckDB timing probe for the expensive sf1 oracles
(round-16 brief item #3: x189 1,252 s / x232 767 s / x256 235 s /
x175 205 s / x257 125 s / x158 117 s at sf1 — 86% of the gate wall).

Times individual CTE prefixes of each oracle so the rewrite targets the
measured hot piece, not a guess. Local tooling — NOT part of the engine.

Usage: ORACLE_SQL_JSON=<verify-dump>/oracle_sql.json \
       python3 scripts/oracle_probe.py [sf_dir] [probe...]
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def t(con, name, sql):
    t0 = time.time()
    n = con.execute(sql).fetchone()
    dt = time.time() - t0
    print(f"PROBE {name:28s} {dt:8.1f} s  -> {n}", flush=True)
    return dt


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "tmp/sf1"
    wanted = set(sys.argv[2:])
    with open(os.environ.get("ORACLE_SQL_JSON",
                             "/tmp/verify_out/oracle_sql.json")) as f:
        oracles = json.load(f)
    con = connect(sf_dir)

    def run(name):
        return not wanted or name in wanted

    # x232 pieces: edge distinct, then the full oracle
    if run("x232"):
        t(con, "x232_edges", """
          SELECT count(*) FROM (
            SELECT DISTINCT o_custkey AS src, l_partkey AS dst
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey)""")
        t(con, "x232_full", f"SELECT count(*) FROM ({oracles['x232_hits']})")

    # x7 pipeline pieces shared by x158/x189
    if run("x7"):
        x7 = oracles["x7_dedup_minhash"]
        t(con, "x7_full", f"SELECT count(*) FROM ({x7})")

    if run("x158"):
        t(con, "x158_full",
          f"SELECT count(*) FROM ({oracles['x158_cluster_keepers']})")

    if run("x189"):
        t(con, "x189_full",
          f"SELECT count(*) FROM ({oracles['x189_grouped_kfold']})")

    if run("x175"):
        t(con, "x175_full",
          f"SELECT count(*) FROM ({oracles['x175_link_pred_full']})")

    if run("x256"):
        t(con, "x256_full",
          f"SELECT count(*) FROM ({oracles['x256_audio_keepone']})")

    if run("x257"):
        t(con, "x257_full",
          f"SELECT count(*) FROM ({oracles['x257_video_keepone']})")

    if run("x250"):
        t(con, "x250_full",
          f"SELECT count(*) FROM ({oracles['x250_audio_neardup']})")


if __name__ == "__main__":
    main()
