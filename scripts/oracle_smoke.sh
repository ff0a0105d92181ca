#!/bin/sh
# One-command oracle runnability gate (round-11 brief item #7): dump
# oracle_sql.json WITHOUT a SparkSession, then execute every oracle SQL
# in DuckDB at sf0.001. A broken oracle string fails here in ~1 min
# instead of silently zeroing the round's correctness gate.
#
# Usage: sh scripts/oracle_smoke.sh  [sfDir]  (default /root/testdata/sf0.001)
set -e
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
OUT=tmp/oracle_smoke
mkdir -p "$OUT"
SPARK_GRAFT_SQL_ONLY=1 sbt -batch "runMain graft.Verify $SF $OUT" >/dev/null
python3 scripts/local_check.py "$SF" "$OUT" --sql-only
