package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics over document-similarity graphs — the
  * curation primitive behind "influence"-style corpus weighting (rank
  * documents by how central they are in the near-duplicate / shared-
  * passage graph, then sample inversely so one viral passage doesn't
  * dominate a mixture).
  *
  * [[Dedup]]'s connected components find WHICH docs are entangled;
  * PageRank here scores HOW entangled, with a fixed-iteration power
  * method whose every step is exact-decimal summed, so the scores are
  * bit-identical on any engine and can carry a hash-parity oracle —
  * rare for an iterative float algorithm.
  *
  * 100 TB posture: one iteration = one equi-join (ranks ⋈ edges on src)
  * + one map-side-combinable groupBy(dst) — the canonical distributed
  * PageRank step; nothing is quadratic and nothing lands on the driver.
  * The edge list and the per-node attribute table are localCheckpointed
  * once, so the k unrolled iterations reference materialized inputs
  * instead of re-deriving the (expensive) edge build k times — the same
  * lineage-cutting discipline as [[Dedup.connectedComponents]].
  */
object Graph {

  /** Undirected co-shingle edges: `(src, dst)` BOTH directions for every
    * distinct doc pair sharing at least one word-`n`-gram whose document
    * frequency is at most `maxShingleDf`. The df cap is the stop-gram
    * guard that keeps this linear at corpus scale: a boilerplate shingle
    * in 100k docs would otherwise emit 10^10 pairs from one hash bucket;
    * capped, a shingle contributes at most `maxShingleDf²` pairs. Same
    * inverted-index shape as [[Dedup.jaccardPairs]] (pairs come from
    * co-occurrence buckets, never a cross join). */
  def coShingleEdges(docs: DataFrame, id: Column, text: Column, n: Int,
      maxShingleDf: Long = 64L): DataFrame = {
    val sh = docs
      .select(id.as("doc_id"), explode(Dedup.shingles(text, n)).as("sh"))
      .select(col("doc_id"), Dedup.md5Hash60(col("sh")).as("h"))
    val kept = sh.groupBy(col("h")).agg(count(lit(1)).as("dfh"))
      .where(col("dfh") <= maxShingleDf)
      .select(col("h"))
    val occ = sh.join(kept, Seq("h"))
    val pairs = occ.as("a")
      .join(occ.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("s"), col("b.doc_id").as("d"))
      .distinct()
    // symmetrize in ONE pass (round 18): the old two-arm unionAll
    // embedded the inverted-index self-join + distinct under both arms
    // — Catalyst duplicates the subtree, so every co-shingle consumer
    // paid the pair enumeration twice (StageProbe: two identical
    // 16.9 MB scan+join chains inside one x148 execution). explode
    // over a 2-struct array emits both directions from one subtree.
    pairs.select(explode(array(
        struct(col("s").as("src"), col("d").as("dst")),
        struct(col("d").as("src"), col("s").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** Per-node triangle counts and local clustering coefficient on a
    * symmetric edge list — the redundancy-structure probe for the
    * co-shingle graph (a tight cluster of mutually-overlapping docs is
    * one boilerplate family; a hub with no triangles is a template
    * touching many unrelated docs).
    *
    * Exact distributed counting in the canonical a<b<c wedge form: join
    * ordered edges (a<b) with (b<c) to enumerate each wedge once, then
    * semi-join the closing edge (a<c) — every triangle found exactly
    * once, never a cross join. Per-node count = triangles touching the
    * node (via the 3-role union); coefficient = 2T / (deg·(deg−1)),
    * one integer-ratio IEEE division (degree-1 nodes: 0 by definition,
    * ANSI-safe).
    *
    * 100 TB posture: wedge volume is Σ deg²/2 — the real cost of exact
    * triangle counting anywhere; the stop-gram df cap upstream
    * ([[coShingleEdges]]) bounds each SHINGLE's contribution, but a
    * node appearing in many distinct capped shingles can still
    * concentrate degree, so the operator also REFUSES a hub loudly at
    * plan build (`maxDegree`, default 100k → 10^10 wedges from that one
    * node — the same Σ² failure mode, and the same loud-refusal
    * contract, as `semanticDedupWithin`'s hot cluster and
    * `nearDupPairs`' hot bucket). The probe runs over the
    * already-checkpointed 8-byte edge list — one small aggregation, not
    * a corpus scan. Joins are hash equi-joins on node ids (8 bytes);
    * nothing touches text.
    * Output: `(doc_id, degree, n_triangles, clustering)`. */
  def triangleStats(edges: DataFrame, maxDegree: Long = 100000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val hottest = e.groupBy(col("src")).count()
      .agg(coalesce(max(col("count")), lit(0L))).head().getLong(0)
    require(hottest <= maxDegree,
      s"triangleStats enumerates sum(deg^2)/2 wedges; the hottest node " +
        s"has degree $hottest > maxDegree=$maxDegree (10^10 wedges at " +
        s"100k from that node alone). Tighten the upstream shingle df " +
        s"cap (coShingleEdges maxShingleDf), drop hub nodes before " +
        s"counting, or switch to a sampled/approximate triangle count " +
        s"for hub-heavy graphs")
    val ord = e.where(col("src") < col("dst"))
    val wedges = ord.as("ab")
      .join(ord.as("bc"), col("ab.dst") === col("bc.src"))
      .select(col("ab.src").as("a"), col("ab.dst").as("b"), col("bc.dst").as("c"))
    val tris = wedges.join(ord.as("ac"),
      col("a") === col("ac.src") && col("c") === col("ac.dst"), "left_semi")
    // 3-role credit in ONE pass (round 18): the old 3-arm unionAll
    // embedded the wedge join + closing semi-join under every arm —
    // the triangle enumeration ran three times per query. explode over
    // the 3-element array credits all roles from a single subtree.
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    deg.join(perNode, col("src") === col("node"), "left")
      .select(col("src").as("doc_id"), col("deg").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") < 2, lit(0.0)).otherwise(
          lit(2.0) * coalesce(col("n_triangles"), lit(0L)).cast("double") /
            (col("deg") * (col("deg") - lit(1L))).cast("double")).as("clustering"))
  }

  /** Fixed-iteration PageRank on a symmetric edge list.
    *
    * r_0 = 1/N; r_{k+1}(v) = (1−d)/N + d · Σ_{u→v} r_k(u)/deg(u).
    * Undirected input means every node has in- and out-edges, so there
    * is no dangling-mass term. Exactness contract: each contribution
    * `r/deg` is one IEEE division, the inbound sum runs through an
    * exact DECIMAL(28,16) accumulator (order-independent), and the
    * damping blend is one fixed chain of double ops — the identical
    * sequence the oracle SQL spells out, so k iterations stay
    * hash-exact.
    *
    * LINEAGE CONTRACT (all iterative ops here — pageRank,
    * [[personalizedPageRank]], [[labelPropagation]], [[hits]],
    * [[kCorePeel]]): the INPUTS (edges, attrs) are localCheckpointed
    * once, so each iteration's plan grows over a pinned LogicalRDD by a
    * CONSTANT ~5 nodes (one equi-join, one combinable rollup, one
    * projection; HITS twice). At the enforced iteration caps (≤ 8–16,
    * `require`d below and in each sibling) the deepest analyzed tree
    * stays under ~90 nodes — milliseconds for the analyzer, no
    * exponential re-analysis because nothing upstream of the pinned
    * leaves re-enters the optimizer. The caps are therefore the
    * contract, not a tuning knob: a future run-to-fixpoint variant
    * MUST add a per-round `localCheckpoint` (the [[kCorePeel]] shape —
    * it already pins every round because its loop both filters and
    * feeds the next round's join on the same frame) rather than raise
    * a cap. Pinned in PlanAuditSpec ("iteration caps are enforced").
    *
    * Output: `(doc_id, degree, pr)`. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters=$iters out of range [1, 8]")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nRow = deg.agg(count(lit(1)).as("n"))
    val attrs = deg.crossJoin(broadcast(nRow))
      .select(col("src").as("node"), col("deg"), col("n"))
      .localCheckpoint(false)
    var ranks = attrs.select(col("node"), col("deg"),
      (lit(1.0) / col("n").cast("double")).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ranks.join(e, col("node") === col("src"))
        .select(col("dst"),
          (col("r") / col("deg").cast("double")).cast(DecimalType(28, 16)).as("c"))
      val inbound = contrib.groupBy(col("dst")).agg(sum(col("c")).as("sdec"))
      ranks = attrs.join(inbound, col("node") === col("dst"))
        .select(col("node"), col("deg"),
          ((lit(1.0) - lit(damping)) / col("n").cast("double") +
            lit(damping) * col("sdec").cast("double")).as("r"))
    }
    ranks.select(col("node").as("doc_id"), col("deg").as("degree"), col("r").as("pr"))
  }

  /** Personalized PageRank (random walk with restart): like [[pageRank]]
    * but the teleport lands on a SEED set instead of uniformly — the
    * "influence of these documents" query (which corpus regions a set of
    * known-good seeds irrigates, or how far a contamination seed set
    * bleeds). `isSeed` is a deterministic predicate over the node id
    * (kept a Column function so both the engine and an oracle can state
    * the same seed set without shipping one); restart mass is
    * `1e12 div |seeds|` on seeds, 0 elsewhere, and each iteration
    * computes `r ← (15·p + 85·Σ inbound (r div deg)) div 100` — the
    * whole walk in e12 fixed-point BIGINT, damping 0.85 as the exact
    * rational 85/100. Unlike [[pageRank]]'s DECIMAL(28,16)-truncated
    * doubles, NO float ever appears: every operation is integer
    * multiply/divide/sum, so the scores are bit-identical on any
    * engine with no double→decimal rounding-mode edge (which is where
    * a mixed float/decimal variant of this operator actually diverged
    * between engines at the 16th decimal). Mass leaks ≤1 e12-unit per
    * division — ~1e-12 relative, invisible at ranking granularity.
    * Nodes with no inbound edges keep their restart term via the left
    * join (unlike [[pageRank]]'s inner join, a seed leaf must not lose
    * its mass).
    *
    * 100 TB posture: identical shape to [[pageRank]] — per iteration
    * ONE equi-join (ranks ⋈ edges on src) + one map-side-combinable
    * groupBy(dst); the seed count is a broadcast 1-row crossjoin at
    * plan build; attrs and edges are localCheckpointed once so k
    * iterations plan over materialized inputs. Nothing quadratic,
    * nothing driver-side. */
  def personalizedPageRank(edges: DataFrame, isSeed: Column => Column,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters=$iters out of range [1, 10]")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nSeed = deg.where(isSeed(col("src"))).agg(count(lit(1)).as("ns"))
    val attrs = deg.crossJoin(broadcast(nSeed))
      .select(col("src").as("node"), col("deg"),
        when(isSeed(col("src")),
          expr("CAST(1000000000000 AS BIGINT) DIV ns"))
          .otherwise(lit(0L)).as("p"))
      .localCheckpoint(false)
    var ranks = attrs.select(col("node"), col("deg"), col("p"),
      col("p").as("r"))
    for (_ <- 1 to iters) {
      val contrib = ranks.join(e, col("node") === col("src"))
        .select(col("dst"), expr("r DIV deg").as("c"))
      val inbound = contrib.groupBy(col("dst")).agg(sum(col("c")).as("sint"))
      ranks = attrs.join(inbound, col("node") === col("dst"), "left")
        .select(col("node"), col("deg"), col("p"),
          expr("(15 * p + 85 * coalesce(sint, CAST(0 AS BIGINT))) DIV 100")
            .as("r"))
    }
    ranks.select(col("node").as("doc_id"), col("deg").as("degree"),
      col("r").as("ppr_e12"))
  }

  /** `rounds` of k-core PEELING on a symmetric edge list: each round
    * drops every node whose current degree is below `k` (and all its
    * edges), the Batagelj/Zaveršnik decomposition step — the
    * graph-shaped redundancy filter (a doc surviving a deep 3-core of
    * the co-shingle graph sits in a densely mutually-overlapping
    * boilerplate family; a leaf hanging off a hub does not). A FIXED
    * round count keeps the operator oracle-expressible (each round is
    * one aggregation + two semi-joins, unrolled in SQL); if the peel
    * reaches its fixpoint early, later rounds are no-ops, so `rounds`
    * is a floor on convergence, not a semantic knob.
    *
    * Output: `(doc_id, deg)` — survivors of the last round with their
    * RESIDUAL degree (what round `rounds+1` would peel on).
    *
    * 100 TB posture: per round ONE combinable degree count + two
    * left-semi joins carrying (long, long) edges only, each round
    * checkpointed so round r+1 plans over materialized edges instead
    * of r stacked join trees (the pageRank/BPE discipline). Work is
    * O(E) per round and the edge set only shrinks; round counts are
    * small by design (the standard full decomposition is iterative-
    * to-fixpoint — at web scale run rounds until the survivor count
    * stabilizes, each round one cheap job). */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 16,
      s"kCorePeel: k=$k rounds=$rounds out of range (k >= 1, 1 <= rounds <= 16)")
    var e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val keepNodes = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
        .select(col("src"))
        .localCheckpoint(false)
      e = e.join(keepNodes, Seq("src"), "left_semi")
        .join(keepNodes.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint(false)
    }
    e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("doc_id"), col("deg"))
  }

  /** Link prediction over the co-shingle graph: for every NON-edge pair
    * (a, b) with at least one common neighbor, the common-neighbor
    * count and the resource-allocation index `Σ_z 1e6 div deg(z)` over
    * shared neighbors z — the Zhou/Lü/Zhang score that beats plain
    * common-neighbors by discounting hub intermediaries, here in exact
    * integer form so the oracle hash-matches. The "which docs are
    * about to become near-dups" probe: a high-RA non-edge is a pair
    * the next crawl increment will likely connect.
    *
    * 100 TB posture: candidate pairs come ONLY from wedge enumeration
    * (join edges on the shared mid-node) — Σ deg² work, the same
    * irreducible bound as [[triangleStats]], guarded by the same loud
    * `maxDegree` refusal; existing edges leave via an anti-join on the
    * ordered edge list; the top-`k` cut is TakeOrderedAndProject
    * (per-partition heaps), never a global sort. All joins carry
    * 8-byte node ids.
    *
    * `maxMidDegree` (finite ⇒ the FULL-CORPUS contract, x175): mid
    * nodes above it are pruned before wedge enumeration — the classic
    * hub-removal approximation (scores become "RA over common
    * neighbors of degree ≤ D"; a hub intermediary contributed at most
    * 1e6/D anyway, the RA discount's own point). This bounds the wedge
    * work at N·D² STRUCTURALLY, so the loud refusal is unnecessary and
    * skipped — at 100 TB a data-dependent refusal is a pager, a
    * structural bound is a plan.
    * Output: top `k` rows (a, b, cn, ra_e6) by (ra_e6, cn desc, a, b). */
  def linkPrediction(edges: DataFrame, k: Int, maxDegree: Long = 100000L,
      maxMidDegree: Long = Long.MaxValue): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    if (maxMidDegree == Long.MaxValue) {
      val hottest = deg.agg(coalesce(max(col("deg")), lit(0L))).head().getLong(0)
      require(hottest <= maxDegree,
        s"linkPrediction enumerates sum(deg^2)/2 wedges; the hottest node " +
          s"has degree $hottest > maxDegree=$maxDegree. Tighten the " +
          s"upstream shingle df cap (coShingleEdges maxShingleDf), drop " +
          s"hub nodes before scoring, or set maxMidDegree for the " +
          s"structurally-bounded hub-pruned contract")
    }
    // wedge a—z—b with a<b: both legs read the SAME mid-node partition,
    // weighted by the mid-node's degree discount.
    // PIN the wedge-join width (round 18, StageProbe-measured: the
    // self-join ran as 3 tasks at sf0.1 — 8.4 CPU-s serialized onto a
    // 3.1 s wall — because AQE prices the join by its INPUT shuffle,
    // 3 MB of edges, while the OUTPUT is the Σdeg²-bounded wedge
    // expansion, 48 MB+). An explicit repartition-by-num on the join
    // key is exempt from AQE coalescing, is shared by both aliases of
    // the self-join (ReusedExchange), and satisfies the join's
    // distribution so no further exchange appears. Same fix, same
    // rationale as RecordLinkage.linkPairs' block-key pin. The
    // checkpoint under it is load-bearing twice over: without it the
    // e⋈deg subtree is DUPLICATED under both join aliases (measured:
    // two full builds per execution), and the upstream join's own
    // hash(src)=hash(z) exchange makes a bare repartition-by-num
    // "redundant" to Catalyst — it was silently elided and AQE then
    // coalesced the surviving ENSURE_REQUIREMENTS exchange right back
    // to 3 tasks. Over the checkpoint's UnknownPartitioning scan the
    // pin is structural.
    val width = e.sparkSession.sparkContext.defaultParallelism
    val mid = e.join(deg, Seq("src"))
      .where(col("deg") <= maxMidDegree)
      .select(col("src").as("z"), col("dst").as("leaf"),
        expr("1000000L DIV deg").as("w"))
      .localCheckpoint(false)
      .repartition(width, col("z"))
    val pairs = mid.as("ea")
      .join(mid.as("eb"),
        col("ea.z") === col("eb.z") && col("ea.leaf") < col("eb.leaf"))
      .select(col("ea.leaf").as("a"), col("eb.leaf").as("b"), col("ea.w"))
    val ord = e.where(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
    // aggregate to pair cardinality FIRST, then anti-join the (much
    // smaller) pair set against existing edges — not the wedge stream
    pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"), sum(col("w")).as("ra_e6"))
      .join(ord, Seq("a", "b"), "left_anti")
      .orderBy(col("ra_e6").desc, col("cn").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Degree assortativity of a symmetric edge list — do hubs link to
    * hubs (r > 0, social-network shape) or to leaves (r < 0,
    * hub-and-spoke / boilerplate-template shape)? Pearson's r over the
    * per-edge (deg src, deg dst) pairs needs a square root, but on the
    * SYMMETRIZED list both marginals coincide, so
    *
    *   r_ppm = (m₂·Σxy − S²)·1e6 DIV (m₂·Σx² − S²)
    *
    * with S = Σ deg(src) over directed edges and m₂ = 2·|edges| — one
    * truncating DIV, sign preserved (both engines truncate toward
    * zero), NULL for regular graphs (zero denominator).
    *
    * 100 TB posture: degrees are one combinable rollup over the
    * (already df-capped, hub-guarded) edge list; the two lookups
    * broadcast the |nodes|-row degree table back onto the edges; the
    * statistic is one more combinable rollup. Callers with graphs
    * whose NODE table outgrows a broadcast should pre-bucket — the
    * co-shingle fixtures here are slice-bounded by construction.
    * Output: one row (n_nodes, n_edges, min_deg, max_deg, r_ppm). */
  def assortativity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(false) // stats + two edge lookups below
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
    val ds = deg.select(col("src").as("__a"), col("deg").as("x"))
    val dd = deg.select(col("src").as("__b"), col("deg").as("y"))
    e.join(broadcast(ds), col("src") === col("__a"))
      .join(broadcast(dd), col("dst") === col("__b"))
      .agg(count(lit(1)).as("m2"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("q"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .crossJoin(broadcast(stats))
      .select(col("n_nodes"), expr("m2 DIV 2").as("n_edges"),
        col("min_deg"), col("max_deg"),
        expr("CASE WHEN m2 * q - s * s > 0 THEN " +
          "CAST((m2 * sxy - s * s) * 1000000 DIV (m2 * q - s * s) " +
          "AS BIGINT) ELSE NULL END").as("r_ppm"))
  }

  /** Community detection by SYNCHRONOUS label propagation — the
    * near-linear community pass next to [[pageRank]]'s centrality and
    * x39's connected components (CC says "reachable"; LPA says "densely
    * attached": one bridge edge joins two CC halves but LPA keeps them
    * apart). Deterministic contract: labels start as the node id; each
    * of the `rounds` synchronous steps moves every node to its
    * neighbors' PLURALITY label (ties → smallest label — the same
    * max(struct) argmax election as x158, so no RNG and no visit-order
    * dependence anywhere); isolated endpoints cannot exist on a
    * symmetric edge list. A fixed small round count is the documented
    * semantics (classic LPA converges in ~5 rounds; a fixed count is
    * also what makes the oracle expressible), not an optimization.
    *
    * 100 TB posture: per round ONE equi-join (labels ⋈ edges on src,
    * 8-byte rows) + one combinable (node, label) count + one
    * max(struct) election per node — the [[pageRank]] iteration shape
    * exactly; edges are localCheckpointed once. Output is the
    * community-size histogram (size, n_communities, n_nodes) — the
    * corpus-shape answer, descending by size with size ties impossible
    * to diverge (sizes are exact counts).
    * Output: (community_size, n_communities, n_nodes). */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds=$rounds out of range [1, 8]")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
    for (_ <- 1 to rounds) {
      labels = e.join(labels, col("src") === col("node"))
        .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("mx"))
        .select(col("dst").as("node"), (-col("mx.nl")).as("lab"))
    }
    labels.groupBy("lab").agg(count(lit(1)).as("sz"))
      .groupBy("sz")
      .agg(count(lit(1)).as("n_communities"),
        sum(col("sz")).as("n_nodes"))
      .select(col("sz").as("community_size"), col("n_communities"),
        col("n_nodes"))
  }

  /** HITS hubs & authorities on a DIRECTED bipartite-or-general edge
    * list — [[pageRank]] ranks by random-walk visitation; HITS answers
    * the two-sided question (which right-nodes are endorsed by the
    * strongest left-nodes, and vice versa). Kleinberg's mutual
    * recursion in e12 integer fixed point with L1 normalization each
    * half-step: a(j) = Σ_{i→j} h(i) then a ← a·1e12 DIV Σa (and
    * symmetrically for h) — every operation is integer
    * multiply/divide/sum, so scores are bit-identical on any engine at
    * ANY `iters` (parity never depends on convergence; the
    * [[personalizedPageRank]] lesson). Floor leak per normalization
    * ≤ |nodes| e12-units — invisible at the e6 reporting grid.
    *
    * 100 TB posture: edges localCheckpointed once; per half-step ONE
    * equi-join on 8-byte ids + one combinable rollup + a broadcast
    * 1-row total — the [[pageRank]] iteration shape exactly, twice per
    * round. Output: top-k authorities (node, auth_e12, rank) via
    * TakeOrdered (never a global rank window — the x67 lesson). */
  def hits(edges: DataFrame, iters: Int, k: Int): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters=$iters out of range [1, 8]")
    require(k >= 1 && k <= 1000, s"k=$k out of range")
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(false)
    def l1Norm(df: DataFrame, node: String, m: String): DataFrame = {
      val tot = df.agg(sum(expr(s"CAST($m AS DECIMAL(38,0))")).as("t"))
      df.crossJoin(broadcast(tot))
        .select(col(node),
          expr(s"CAST(CAST($m AS DECIMAL(38,0)) * 1000000000000 DIV t " +
            "AS BIGINT)").as(m))
    }
    var hubs = e.select(col("src")).distinct()
      .select(col("src"), lit(1000000L).as("h"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      // each propagation round's groupBy output is checkpointed BEFORE
      // l1Norm (round 18, StageProbe-measured): l1Norm embeds its input
      // subtree TWICE (once under the broadcast total, once as the
      // stream), and rounds nest — so without the pin the edge joins
      // re-executed ~2^rounds times per query (x232: ~12 CPU-s for
      // work whose single-pass cost is ~4). Same lineage-cutting
      // discipline as [[Dedup.connectedComponents]]; the pinned frames
      // are node-cardinality (node, score) pairs, never edges.
      auth = l1Norm(
        e.join(hubs, Seq("src"))
          .groupBy(col("dst")).agg(sum(col("h")).as("a"))
          .localCheckpoint(false),
        "dst", "a")
      hubs = l1Norm(
        e.join(auth, Seq("dst"))
          .groupBy(col("src")).agg(sum(col("a")).as("h"))
          .localCheckpoint(false),
        "src", "h")
    }
    // orderBy+limit plans as TakeOrderedAndProject (the x34/x67 shape —
    // never an unpartitioned rank window); position = rank
    auth.orderBy(col("a").desc, col("dst")).limit(k)
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("long"))
      .select(col("dst").as("node"), col("a").as("auth_e12"), col("rank"))
  }
}
