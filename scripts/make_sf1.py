#!/usr/bin/env python3
"""Upscale a testdata SF directory 10x into an sf1-equivalent volume.

Local tooling (like local_check.py): generates the one-decade-up corpus
the round-end bench row runs against. NOT part of the engine.

Design: 10 key-shifted copies per fact/dim table, with the two content
tables de-correlated so the blown-up corpus behaves like independent
data rather than a pile of exact replicas (which would hand the dedup
family 45 artificial near-dup pairs per copy-group and starve the
ANN family of cluster diversity):

- documents: copy 0 keeps the original text; copies 1-9 suffix every
  word with `_cN`, so every 5-gram shingle is distinct across copies —
  n-gram/MinHash/SimHash workloads scale linearly, like a real corpus.
- embeddings: copy 0 keeps the originals; copies 1-9 get deterministic
  pseudo-random 64-dim vectors (sin-hash), so IVF cells fill ~uniformly
  and cluster sizes stay ~stride, like a real corpus at 10x.
- region/nation stay fixed (dimensions don't scale with SF).
- All other tables replicate with primary/foreign keys shifted by the
  same per-table stride, so every FK join still lands.

Usage: python3 scripts/make_sf1.py /root/testdata/sf0.1 tmp/sf1 [--skew]

--skew (round 15): after the uniform decade, overlay the three
adversarial shapes the tripwires probe one-op-at-a-time, composed into
ONE corpus so the skew receipt (scripts/skew_receipts.py) can measure
every family against the same data:

- VIRAL FINGERPRINT: 210,000 byte-identical documents (ids past the
  uniform range, one shared ~120-char text). 210k exceeds the 2^16
  hot-bucket cap in EVERY banded pipeline — text SimHash/MinHash, image
  phash (~70k of the flood per modality class), video frame hashes, and
  the audio energy profile — so the loud drop contracts fire instead of
  a quadratic candidate join; the exact-dedup/election paths see one
  210k-member group (combinable min).
- FAT STRATUM: the flood all lands in source='src0', fattening one
  source stratum ~40x — the StratumRank two-phase family must ride its
  partitions, never a 1-task stratum sort.
- HUB VERTEX: 100,000 extra events for ONE new user spread over the
  time domain — the entity-keyed window family's worst partition.
- EMBEDDING FLOOD (round 16): 80,000 byte-identical embedding vectors
  (ids past the uniform range, one shared 64-dim vector, one label) —
  the duplicated-embedding shape the ANN family (LSH bands, IVF cells,
  brute top-k over bucketed candidates) must ride flat or refuse
  loudly; 80k exceeds the 2^16 hot-bucket caps the banded ANN paths
  carry, mirroring the document flood's design.
- GRAPH HUB (round 17): the graph family (x64/x73/x86/x148/x195/x232)
  builds its co-shingle graph over documents with doc_id < 1500 and a
  shingle-df cap of 64, so the high-id viral flood never reaches it —
  the skew receipt was measuring those ops on an UNSKEWED graph. One
  mid-range hub doc (id 748) now shares a distinct under-the-cap
  trigram (df=2) with each of 300 spoke docs (doc_id % 5 == 2, i.e.
  20% of the graph's nodes), creating a degree-300 power-law hub: the
  wedge volume at the hub is deg² = 90k, which the Σdeg²-priced ops
  (x148's strategy pin, x73's wedge enumeration) must ride flat, while
  a viral ACROSS-many-docs shingle would instead trip the df-64 cap —
  both arms of the design are exercised.
"""
import os
import sys

import duckdb

K = 10
SKEW_FLOOD_DOCS = 210_000
SKEW_HUB_EVENTS = 100_000
SKEW_FLOOD_EMBS = 80_000
SKEW_VIRAL_TEXT = ("the viral copypasta spreads again tonight friends "
                   "share it forward before the mods can ever catch up")
SKEW_GRAPH_HUB_DOC = 748  # mid-range, NOT a spoke (748 % 5 == 3)


def main(src, dst, skew=False):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE cp AS SELECT unnest(range({K})) AS cp")

    def stride(table, key):
        return con.execute(
            f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

    c_s = stride("customer", "c_custkey")
    o_s = stride("orders", "o_orderkey")
    p_s = stride("part", "p_partkey")
    s_s = stride("supplier", "s_suppkey")
    u_s = stride("events", "user_id")
    e_s = stride("events", "event_id")
    d_s = stride("documents", "doc_id")
    v_s = stride("embeddings", "vec_id")

    def emit(table, sql):
        con.execute(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM '{src}/{t}.parquet'")

    emit("customer", f"""
        SELECT c_custkey + cp * {c_s} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet', cp""")
    emit("supplier", f"""
        SELECT s_suppkey + cp * {s_s} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{src}/supplier.parquet', cp""")
    emit("part", f"""
        SELECT p_partkey + cp * {p_s} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM '{src}/part.parquet', cp""")
    emit("orders", f"""
        SELECT o_orderkey + cp * {o_s} AS o_orderkey,
               o_custkey + cp * {c_s} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet', cp""")
    emit("lineitem", f"""
        SELECT l_orderkey + cp * {o_s} AS l_orderkey,
               l_partkey + cp * {p_s} AS l_partkey,
               l_suppkey + cp * {s_s} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet', cp""")
    hub_events = f"""
        UNION ALL
        SELECT {10 * e_s} + i AS event_id,
               make_timestamp(epoch_us(mn)
                 + (epoch_us(mx) - epoch_us(mn)) * i // {SKEW_HUB_EVENTS}) AS ts,
               {10 * u_s} + 7 AS user_id,
               ['click', 'view', 'purchase', 'signup', 'error'][1 + i % 5]
                 AS event_type,
               CAST(i % 100 AS DOUBLE) AS value,
               '{{"k": ' || (i % 100) || '}}' AS props
        FROM (SELECT unnest(range({SKEW_HUB_EVENTS})) AS i),
             (SELECT min(ts) AS mn, max(ts) AS mx
              FROM '{src}/events.parquet')""" if skew else ""
    emit("events", f"""
        SELECT event_id + cp * {e_s} AS event_id, ts,
               user_id + cp * {u_s} AS user_id,
               event_type, value, props
        FROM '{src}/events.parquet', cp{hub_events}""")
    viral_docs = f"""
        UNION ALL
        SELECT {10 * d_s} + i AS doc_id, '{SKEW_VIRAL_TEXT}' AS text,
               'en' AS lang, 'src0' AS source
        FROM (SELECT unnest(range({SKEW_FLOOD_DOCS})) AS i)""" if skew else ""
    # graph hub overlay (--skew): hub doc 748 carries one private
    # trigram per spoke (' gs<s>a gs<s>b gs<s>c'); each spoke doc
    # (doc_id % 5 == 2, < 1500) carries its own copy — every such
    # trigram has df exactly 2 (under the co-shingle graph's df-64
    # cap), so 300 hub edges materialize instead of being dropped.
    # Boundary trigrams straddling two spokes' tokens are unique
    # (df=1) and edge-free. cp>0 copies shift past doc_id 1500 and
    # never enter the graph.
    if skew:
        doc_text = f"""
               CASE WHEN cp = 0 AND doc_id = {SKEW_GRAPH_HUB_DOC}
                    THEN text || (SELECT string_agg(' gs' || s || 'a gs' || s
                                    || 'b gs' || s || 'c', '' ORDER BY s)
                                  FROM (SELECT unnest(range(2, 1500, 5)) AS s))
                    WHEN cp = 0 AND doc_id < 1500 AND doc_id % 5 = 2
                    THEN text || ' gs' || doc_id || 'a gs' || doc_id
                         || 'b gs' || doc_id || 'c'
                    WHEN cp = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1_c' || cp, 'g')
               END"""
    else:
        doc_text = """
               CASE WHEN cp = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1_c' || cp, 'g')
               END"""
    emit("documents", f"""
        SELECT doc_id, text, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM (
          SELECT doc_id + cp * {d_s} AS doc_id,
                 {doc_text} AS text,
                 lang, source
          FROM '{src}/documents.parquet', cp{viral_docs})""")
    flood_embs = f"""
        UNION ALL
        SELECT {10 * v_s} + i AS vec_id,
               CAST(list_transform(range(64),
                    j -> sin(j * 12.9898) * 0.7) AS FLOAT[]) AS embedding,
               CAST(9999 AS INTEGER) AS label
        FROM (SELECT unnest(range({SKEW_FLOOD_EMBS})) AS i)""" if skew else ""
    emit("embeddings", f"""
        SELECT vec_id + cp * {v_s} AS vec_id,
               CASE WHEN cp = 0 THEN embedding
                    ELSE CAST(list_transform(range(len(embedding)),
                         j -> sin((vec_id * 64 + j) * 12.9898
                                  + cp * 78.233) * 0.7) AS FLOAT[])
               END AS embedding,
               label
        FROM '{src}/embeddings.parquet', cp{flood_embs}""")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], skew="--skew" in sys.argv[3:])
