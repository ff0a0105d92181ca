#!/usr/bin/env python3
"""Skewed-decade receipt run (round-15 brief item #8).

The sf1 receipt proves 10x volume at UNIFORM shape; the tripwires prove
per-op floods in isolation. This composes them once: the --skew corpus
(scripts/make_sf1.py --skew: one 210k viral fingerprint landing in one
fat source stratum, one 100k-event hub user) benched over the
dedup / rank / graph / entity-window families, walls compared against
the same queries' UNIFORM sf1 receipts.

Flat-or-refuse contract: a query passes when its skew wall stays within
SLACK x (its sf1 wall x its family's data multiplier) — the flood makes
the document corpus ~5.2x the uniform decade, so a LINEAR doc op is
EXPECTED at ~5x; what must not happen is the quadratic shape (a 210k
identical-content group detonating a candidate join instead of tripping
the 2^16 hot-bucket drop). A loud refusal recorded in bench errors is
also a pass IF it is one of the documented refusal contracts.

Local tooling (like local_check.py) — NOT part of the engine.

Usage: python3 scripts/skew_receipts.py [--skew-dir tmp/sf1skew]
           [--base /root/testdata/sf0.1]
"""
import argparse
import json
import os
import subprocess
import sys

# the families the brief names, by registered query id
FAMILIES = {
    "dedup_flood": [
        "x1_dedup_exact", "x5_fingerprint", "x7_dedup_minhash",
        "x8_dedup_simhash", "x30_incremental_dedup", "x38_decontaminate",
        "x39_neardup_clusters", "x43_bloom_decontaminate", "x49_dedup_best",
        "x56_substring_dedup", "x118_normalized_dedup", "x158_cluster_keepers",
        "x250_audio_neardup", "x254_consensus_neardup", "x58_curation_pipeline",
        "x258_code_signals", "x259_chunk_dedup",
    ],
    "rank_stratum": [
        "x27_stratified_sample", "x37_seq_packing", "x48_take_per_stratum",
        "x89_token_budget_cut", "x97_curriculum_interleave",
        "x98_quantile_norm", "x103_length_quantiles", "x249_dist_match",
        "x253_pad_waste",
    ],
    # round 17: the full graph family — the co-shingle graph reads
    # doc_id < 1500 with a df-64 shingle cap, so the high-id viral
    # flood never reached it; make_sf1.py --skew now plants a
    # degree-300 power-law hub (doc 748 + 300 spokes, each edge via a
    # private df=2 trigram under the cap) that the wedge-volume-priced
    # ops must ride flat
    "graph": ["x64_pagerank", "x73_triangles", "x86_kcore",
              "x148_link_pred", "x195_ppr", "x232_hits"],
    "hub_user": [
        "x40_sessionize", "x52_funnel", "x123_funnel_timing", "x227_streaks",
    ],
    # round 16: the duplicated-embedding flood (80k identical vectors in
    # one LSH band bucket / IVF cell) — the ANN family must ride it flat
    # or refuse loudly; brute/banded/cell variants all probed
    "ann_flood": [
        "x10_knn_lsh", "x57_semantic_dedup", "x62_semantic_dedup_mp",
        "x21_knn_ivf",
    ],
}
# expected data multiplier vs the uniform sf1 corpus, per family:
# docs 50k -> 260k (flood 210k), events 1.0M -> 1.1M,
# embeddings 20k -> 100k (flood 80k)
MULT = {"dedup_flood": 5.2, "rank_stratum": 5.2, "graph": 5.2,
        "hub_user": 1.1, "ann_flood": 5.0}
SLACK = 2.0
# walls under the family floor never fail the ratio gate: JVM noise for
# most families; for hub_user the floor is the hub's CONSTANT cost —
# a 100k-event single partition adds single-digit seconds to one task
# regardless of the corpus multiplier (the multiplier model prices
# volume, not one fat partition), so anything under 15 s is flat.
ABS_FLOOR_SEC = {"dedup_flood": 5.0, "rank_stratum": 5.0, "graph": 5.0,
                 "hub_user": 15.0, "ann_flood": 5.0}

# Per-query absolute bound overrides, each with the reason written into
# the receipt: costs that are ADDITIVE constants of the skew shape, not
# multiples of the uniform wall, which the (sf1 wall x multiplier)
# model cannot price. (Round 16: the x250 override is GONE — the
# star/clique form pre-collapses the identical flood family, so the
# pair-quadratic answer it priced no longer exists.)
BOUND_OVERRIDE = {
    # x21's centroid seeds are a CORPUS SLICE (vec_id % 50 == 7), so the
    # corpus x seed similarity matrix — the op's dominant term, priced
    # identically by the DuckDB oracle's CROSS JOIN — scales with the
    # SQUARE of the data multiplier (~5.2x docs -> ~25x pairs), not
    # linearly like the rest of the ann_flood family (fixed query/probe
    # counts). The linear-family bound is structurally wrong for it and
    # only ever passed by slack (r17: wall 11.2 s vs bound 12.0); round
    # 18's sf1-side improvements tightened the denominator and exposed
    # the mismatch (wall 10.8 s — FASTER than r17 — vs bound 10.4).
    # The structural bound would be 2 x sf1_wall x mult^2 ~ 56 s; this
    # override pins 4x tighter than that, just above the measured flood
    # walls, so a genuine detonation still fails loudly.
    "x21_knn_ivf": (13.0,
        "corpus-derived seed slice: pair volume scales x(mult^2)=~25, "
        "not x5.2 (oracle CROSS JOIN pays the same); structural bound "
        "2 x sf1 x mult^2 ~ 56 s, pinned at 13 s against the measured "
        "10.8-11.2 s flood walls"),
}

# The REFUSE arm of flat-or-refuse: a bench error is a PASS when it is
# one of the engine's documented loud-refusal contracts — a guard firing
# on adversarial volume is the designed behavior, not a defect. Matched
# as a substring against the recorded error message. Entries are the
# SPECIFIC refusal texts, never op-name prefixes (round-16 advisor
# find: 'StratumRank:' also matched argument-validation require()
# failures, so a plumbing regression could score as a documented
# refusal). bench.json truncates errors to 100 chars — every entry
# below appears within the first 100 chars of its full message.
# (No refusal fires on THIS skew corpus — every family rides the flood
# flat; the list is the reviewed surface a harsher corpus extends.)
DOCUMENTED_REFUSALS = [
    # StratumRank two-phase: driver offset-table past 2^20 strata
    "stratum cardinality too high for the driver-side offset table",
    # audioNeardupPairs pair-view: flood family past maxFamily
    "identical-profile family larger than maxFamily",
    # StratumRank reserved bookkeeping-column collision
    "collide with internal bookkeeping names",
]


def refusal_documented(err):
    return err is not None and any(s in err for s in DOCUMENTED_REFUSALS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skew-dir", default="tmp/sf1skew")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.skew_dir, "documents.parquet")):
        subprocess.run([sys.executable, "scripts/make_sf1.py", args.base,
                        args.skew_dir, "--skew"], check=True)

    queries = [q for qs in FAMILIES.values() for q in qs]
    env = dict(os.environ)
    env.update({"SPARK_GRAFT_SF_DIR": args.skew_dir,
                "SPARK_GRAFT_RUNS": "1",
                # SERIAL: the flat-or-refuse bound compares each wall
                # against its (serially measured) sf1 wall — the round-17
                # FAIR-pool default would fold co-run interference into
                # the numerator and break the per-query comparability
                "SPARK_GRAFT_PARALLEL": "1",
                "SPARK_GRAFT_QUERIES": ",".join(queries)})
    print(f"[skew] benching {len(queries)} queries on {args.skew_dir}",
          flush=True)
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"], check=True,
                   env=env)
    with open("bench.json") as f:
        bench = json.load(f)

    with open("receipts/sf1_receipts.json") as f:
        sf1 = json.load(f)["walls_sec"]

    fam_of = {q: f for f, qs in FAMILIES.items() for q in qs}
    rows, failures = {}, []
    for q in queries:
        wall = bench["queries"].get(q)
        err = bench.get("errors", {}).get(q)
        base = sf1.get(q)
        fam = fam_of[q]
        override = BOUND_OVERRIDE.get(q)
        if override:
            bound = override[0]
        else:
            bound = (base * MULT[fam] * SLACK) if base else None
        floor = ABS_FLOOR_SEC[fam]
        flat = (err is None and wall is not None and
                (wall <= floor or (bound is not None and wall <= bound)))
        refused = refusal_documented(err)
        ok = flat or refused
        rows[q] = {"family": fam, "skew_wall_sec": wall, "sf1_wall_sec": base,
                   "bound_sec": round(bound, 1) if bound else None,
                   "bound_override_reason": override[1] if override else None,
                   "error": err, "documented_refusal": refused, "ok": ok}
        if not ok:
            failures.append(q)

    out = {
        "generated_by": "scripts/skew_receipts.py",
        "skew_dir": args.skew_dir,
        "skew_shape": {
            "viral_fingerprint_docs": 210000,
            "fat_stratum": "src0 (the flood's source)",
            "hub_user_events": 100000,
            "graph_hub": ("doc 748 shares a private df=2 trigram with each "
                          "of 300 spoke docs (doc_id %% 5 == 2, < 1500): a "
                          "degree-300 hub inside the co-shingle graph's id "
                          "range, under its df-64 cap"),
            "doc_multiplier_vs_sf1": MULT["dedup_flood"],
            "event_multiplier_vs_sf1": MULT["hub_user"],
        },
        "contract": (f"flat-or-refuse: wall <= {SLACK} x (sf1 wall x family "
                     f"data multiplier) or its per-query override, or under its "
                     f"family floor {ABS_FLOOR_SEC}, "
                     "and no undocumented bench error"),
        "queries": rows,
    }
    os.makedirs("receipts", exist_ok=True)
    with open("receipts/skew_receipts.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    total = sum(v["skew_wall_sec"] or 0 for v in rows.values())
    print(f"[skew] total {total:.1f} s over {len(rows)} queries; "
          f"{len(failures)} failures", flush=True)
    for q in sorted(rows, key=lambda q: -(rows[q]["skew_wall_sec"] or 0)):
        v = rows[q]
        print(f"  {'OK ' if v['ok'] else 'FAIL'} {q}: {v['skew_wall_sec']} s "
              f"(sf1 {v['sf1_wall_sec']} s, bound {v['bound_sec']})"
              + (f" ERR={v['error']}" if v["error"] else ""), flush=True)
    print("[skew] receipts written to receipts/skew_receipts.json", flush=True)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
