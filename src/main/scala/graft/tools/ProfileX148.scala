package graft.tools

import graft.Tables
import graft.ext.{Dedup, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the x148 link-prediction drift (VERDICT r12 #5):
  * r11 benched it at 4.5 s, r12 forensics measured 9–10 s standalone on
  * a quiet box with UNTOUCHED code. Times each stage in isolation —
  * shingle hash, df-cap, occurrence join, pair distinct, edge
  * checkpoint, the hottest-degree probe, wedge join + vote — to find
  * where the wall went.
  */
object ProfileX148 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-x148")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def time(name: String)(work: => Unit): Unit = {
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        work
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-28s min=${ts.min}%6.2fs runs=${ts.map(t => f"$t%.2f").mkString("[", ",", "]")}")
    }

    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 1500)

    // stage 1: shingle + hash projection
    val sh = docs
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
      .select(col("doc_id"), Dedup.md5Hash60(col("sh")).as("h"))
    time("shingle_hash") { sh.write.format("noop").mode("overwrite").save() }

    // stage 2: df-cap
    val kept = sh.groupBy(col("h")).agg(count(lit(1)).as("dfh"))
      .where(col("dfh") <= 64L).select(col("h"))
    time("df_cap") { kept.write.format("noop").mode("overwrite").save() }

    // stage 3: occurrence join + pair distinct + symmetrize
    val occ = sh.join(kept, Seq("h"))
    val pairs = occ.as("a")
      .join(occ.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("s"), col("b.doc_id").as("d"))
      .distinct()
    val sym = pairs.select(col("s").as("src"), col("d").as("dst"))
      .unionAll(pairs.select(col("d").as("src"), col("s").as("dst")))
    time("edges_nocheckpoint") { sym.write.format("noop").mode("overwrite").save() }

    // stage 4: full coShingleEdges + localCheckpoint (what x148 does first)
    var e: DataFrame = null
    time("edges_checkpoint") {
      e = Graph.coShingleEdges(docs, col("doc_id"), col("text"), n = 3,
        maxShingleDf = 64L).localCheckpoint(false)
      e.count()
    }
    println(s"PROF edge_count = ${e.count()}")

    // stage 5: the hottest-degree refusal probe
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    time("hottest_probe") {
      deg.agg(coalesce(max(col("deg")), lit(0L))).head()
    }

    // stage 6: wedge join + vote + anti-join + top-k over checkpointed edges
    time("wedge_vote") {
      Graph.linkPrediction(e, k = 50)
        .write.format("noop").mode("overwrite").save()
    }

    // end-to-end as the query runs it
    time("x148_end_to_end") {
      Graph.linkPrediction(
        Graph.coShingleEdges(docs, col("doc_id"), col("text"), n = 3,
          maxShingleDf = 64L), k = 50)
        .write.format("noop").mode("overwrite").save()
    }
    // diagnostics: wedge volume and degree concentration
    val degStats = deg.agg(max(col("deg")).as("mx"),
      sum(col("deg") * col("deg")).as("sumsq"), count(lit(1)).as("nodes")).head()
    println(s"PROF deg_max=${degStats.getLong(0)} sum_deg2=${degStats.getLong(1)} nodes=${degStats.getLong(2)}")
    val mid = e.join(deg, Seq("src"))
      .select(col("src").as("z"), col("dst").as("leaf"))
    val wedges = mid.as("ea").join(mid.as("eb"),
        col("ea.z") === col("eb.z") && col("ea.leaf") < col("eb.leaf"))
      .count()
    println(s"PROF wedge_rows=$wedges")
    // hypothesis: AQE coalesces the tiny pre-join shuffle (201k rows ~
    // 5 MB) down to ~1 partition, then the wedge join explodes 150x
    // INSIDE those few tasks — compare with coalescing off
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    time("wedge_vote_nocoalesce") {
      Graph.linkPrediction(e, k = 50)
        .write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // and with AQE off entirely
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("wedge_vote_noaqe") {
      Graph.linkPrediction(e, k = 50)
        .write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // candidate fix: pin the wedge-join input partition count at
    // cluster parallelism (repartition(N, z) resists AQE coalescing;
    // N derives from the runtime, not a constant)
    time("wedge_vote_pinned") {
      val degF = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val midF = e.join(degF, Seq("src"))
        .select(col("src").as("z"), col("dst").as("leaf"),
          expr("1000000L DIV deg").as("w"))
        .repartition(spark.sparkContext.defaultParallelism, col("z"))
      val pairsF = midF.as("ea")
        .join(midF.as("eb"),
          col("ea.z") === col("eb.z") && col("ea.leaf") < col("eb.leaf"))
        .select(col("ea.leaf").as("a"), col("eb.leaf").as("b"), col("ea.w"))
      val ordF = e.where(col("src") < col("dst"))
        .select(col("src").as("a"), col("dst").as("b"))
      pairsF.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("cn"), sum(col("w")).as("ra_e6"))
        .join(ordF, Seq("a", "b"), "left_anti")
        .orderBy(col("ra_e6").desc, col("cn").desc, col("a"), col("b"))
        .limit(50)
        .write.format("noop").mode("overwrite").save()
    }
    // ground truth: AQE's chosen partition counts in the final plan
    val dfPlan = Graph.linkPrediction(e, k = 50)
    dfPlan.write.format("noop").mode("overwrite").save()
    println("PROF ==== final plan ====")
    dfPlan.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("AQEShuffleRead")
        || l.contains("Join") || l.contains("HashAggregate(keys=[a"))
      .foreach(l => println("PROF | " + l.trim.take(150)))
    // attribute the wall: wedge join alone, +agg, +anti-join+topk
    val degA = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val midA = e.join(degA, Seq("src"))
      .select(col("src").as("z"), col("dst").as("leaf"),
        expr("1000000L DIV deg").as("w"))
    val pairsA = midA.as("ea")
      .join(midA.as("eb"),
        col("ea.z") === col("eb.z") && col("ea.leaf") < col("eb.leaf"))
      .select(col("ea.leaf").as("a"), col("eb.leaf").as("b"), col("ea.w"))
    time("stage_wedges_only") {
      pairsA.write.format("noop").mode("overwrite").save()
    }
    val aggA = pairsA.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"), sum(col("w")).as("ra_e6"))
    time("stage_wedges_agg") {
      aggA.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
