package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-18 scale-posture pins.
  *
  * 1. [[Spread.toClusterWidth]]'s size gate, BOTH sides (the 2 MB
  *    threshold is a box-derived constant — these pins stop a Spark
  *    upgrade from silently flipping the gate's behavior).
  * 2. Guard-count tables execute WITHOUT a forced broadcast: the
  *    block/band count tables have data-dependent cardinality, so the
  *    operators must degrade to a shuffle join when broadcasting is
  *    impossible (`autoBroadcastJoinThreshold=-1` simulates the 100 TB
  *    regime where the table outgrows the driver) and return identical
  *    rows either way.
  * 3. [[StratumRank]]'s `withTotal` export: `__cs` must equal the
  *    stratum's true total (it feeds quantile position arithmetic).
  * 4. [[graft.ops.RecordLinkage.linkPairs]]' dedup-by-construction:
  *    the round-18 rewrite replaced a pair-granularity `distinct` with
  *    an origin-band rule; the hot-home/cool-shadow corner is the one
  *    case where a naive both-shifted drop would lose a pair.
  */
class ScaleGuardSpec extends SparkSpec {
  import spark.implicits._

  test("Spread gate, sub-threshold side: a small under-split frame keeps its scan partitioning") {
    val small = spark.range(0, 1000, 1, 1).toDF("id") // ~8 KB plan stats
    val out = Spread.toClusterWidth(small)
    assert(out.rdd.getNumPartitions === 1,
      "sub-gate frame must NOT be exchanged: the spread costs more than it buys below 2 MB")
  }

  test("Spread gate, super-threshold side: a large under-split frame spreads to cluster width") {
    val par = spark.sparkContext.defaultParallelism
    val big = spark.range(0, 1000000, 1, 1).toDF("id") // ~8 MB plan stats, 1 partition
    val out = Spread.toClusterWidth(big)
    assert(out.rdd.getNumPartitions === par,
      s"super-gate under-split frame must spread to defaultParallelism=$par")
    // already-wide frames are left alone regardless of size
    val wide = spark.range(0, 1000000, 1, par * 2).toDF("id")
    assert(Spread.toClusterWidth(wide).rdd.getNumPartitions === par * 2)
  }

  test("StratumRank withTotal: __cs is the stratum's true row count on every row") {
    val df = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L), ("b", 8L))
      .toDF("s", "v")
    val ranked = StratumRank.rank(df, col("s"), Seq(col("v")), withTotal = true)
    val got = ranked.select(col("s"), col("__rn"), col("__cs"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("a", 1L, 3L), ("a", 2L, 3L), ("a", 3L, 3L),
      ("b", 1L, 2L), ("b", 2L, 2L)))
    // default (withTotal = false) keeps the pre-r18 schema
    val bare = StratumRank.rank(df, col("s"), Seq(col("v")))
    assert(!bare.columns.contains("__cs"), bare.columns.mkString(","))
  }

  /** Synthetic linkage corpus exercising the dedup rule's three cases:
    * nat=1: two same-band records in a cool home block (must pair ONCE
    * — the old `distinct`'s job); nat=2: a hot home block (302 probe
    * rows > 256) whose two band-B records can only meet in the cool
    * band+1 shadow block (must still pair); plus a cross-band pair. */
  private def linkageCorpus = {
    // nat=1: k=1,2 in band 10 (cents 0..); cool everywhere
    val cool = Seq((1L, 1, "A", 500L), (2L, 1, "A", 900L))
    // nat=2: 300 records in band 9 (cents -10000..-9001 → band 9) make
    // block (2, 10) hot with shifted copies; k=1001,1002 in band 10
    // meet only in block (2, 11)
    val floodBandNine = (1L to 300L).map(i => (2000L + i, 2, "B", -9500L))
    val hotHome = Seq((1001L, 2, "B", 500L), (1002L, 2, "B", 700L))
    // nat=3: cross-band pair — k=1,2 in adjacent bands (meets once, in
    // the higher block)
    val cross = Seq((3001L, 3, "C", 9999L), (3002L, 3, "C", 10001L))
    (cool ++ floodBandNine ++ hotHome ++ cross)
      .toDF("k", "nat", "seg", "cents")
  }

  test("linkPairs dedup-by-construction: one row per pair, hot-home pairs survive via the shadow block") {
    val pairs = graft.ops.RecordLinkage.linkPairs(linkageCorpus,
      col("k"), col("nat"), col("cents"), col("seg"), k = 1000)
      .select("id_a", "id_b", "score").as[(Long, Long, Int)].collect().toSeq
    // exactly once each — no duplicate from the double-probe scheme
    assert(pairs.size === pairs.distinct.size, s"duplicate pairs: $pairs")
    val byPair = pairs.map(p => (p._1, p._2)).toSet
    assert(byPair.contains((1L, 2L)), s"cool same-band pair lost: $pairs")
    assert(byPair.contains((1001L, 1002L)),
      s"hot-home pair must survive via its cool shadow block: $pairs")
    assert(byPair.contains((3001L, 3002L)), s"cross-band pair lost: $pairs")
    // the flood's own pairs are guard-dropped (block > maxBlock), and
    // no flood member pairs with the band-10 records' shadow copies
    assert(!pairs.exists(p => p._1 > 2000L && p._1 <= 2300L),
      s"hot-block pairs must be dropped whole: ${pairs.take(5)}")
  }

  test("guard-count joins degrade to shuffle when broadcast is impossible (100 TB driver posture)") {
    val defaultRows = graft.ops.RecordLinkage.linkPairs(linkageCorpus,
      col("k"), col("nat"), col("cents"), col("seg"), k = 1000)
      .collect().toSeq
    val docs = (1L to 60L).map(i => (i, ("z" * (i % 7).toInt) + s"doc $i body"))
      .toDF("doc_id", "text")
    // editDistancePairs carries no terminal sort, so compare as SETS —
    // partition order legitimately moves with the join strategy
    val defaultEdit = Dedup.editDistancePairs(docs, col("doc_id"), col("text"))
      .collect().toSet
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val shuffled = graft.ops.RecordLinkage.linkPairs(linkageCorpus,
        col("k"), col("nat"), col("cents"), col("seg"), k = 1000)
      // no forced broadcast anywhere in the physical plan: the guard
      // is allowed to SHUFFLE — at 100 TB its cardinality is unbounded
      shuffled.collect()
      val p = shuffled.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastExchange"),
        s"guard join must not force a broadcast under threshold=-1:\n$p")
      assert(shuffled.collect().toSeq === defaultRows,
        "linkPairs rows must not depend on the guard join's strategy")
      assert(Dedup.editDistancePairs(docs, col("doc_id"), col("text"))
        .collect().toSet === defaultEdit,
        "editDistancePairs rows must not depend on the guard join's strategy")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
