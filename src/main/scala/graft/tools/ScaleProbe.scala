package graft.tools

import graft.Tables
import graft.ext.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the ANN/semantic-dedup family's ONE free parameter:
  * `stride`, the sampled-seed spacing that sets centroid/codebook
  * cardinality to N/stride.
  *
  * The registered queries (x21/x26/x33/x57/x60/x62) pin stride=50 so
  * the oracle SQL is a literal; that is correct at a FIXED scale
  * factor, but holding stride constant across a decade grows the cell
  * count 10× and the corpus×centroid assignment N·(N/stride) — the
  * superlinear growth the sf1 bench row exposes (x33 ~39×, x60 ~43×
  * for 10× rows). The operator doctrine at scale is the standard IVF
  * one: hold the CELL COUNT (≈ N/stride) fixed-or-√N by raising
  * stride with the corpus, which this probe demonstrates by timing the
  * same operators at the same SF under both policies. Run:
  *
  *   SPARK_GRAFT_SF_DIR=tmp/sf1 SPARK_GRAFT_STRIDE=500 \
  *     sbt "runMain graft.tools.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stride = sys.env.getOrElse("SPARK_GRAFT_STRIDE", "50").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-24s stride=$stride%-5d ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    val embs = Similarity.withNorm(
      Tables.embeddings(spark, sfDir), col("vec_id"), col("embedding"))
    val n = embs.count()
    println(s"PROBE corpus n=$n cells~${n / stride}")
    val qids = (0L until 10L).toSeq
    time("x21_ivf") {
      Similarity.ivfSearch(embs, Similarity.seedCentroids(embs, stride), qids, k = 5)
    }
    time("x33_pq") {
      Similarity.pqSearch(embs, qids, k = 5, m = 4, stride = stride)
    }
    time("x60_ivf_pq") {
      Similarity.ivfPqSearch(embs, Similarity.seedCentroids(embs, stride),
        qids, k = 5, m = 4, stride = stride)
    }
    time("x57_semdedup") {
      Similarity.semanticDedup(embs, threshold = 0.4, stride = stride, iters = 1)
    }
    time("x62_semdedup_mp") {
      Similarity.semanticDedupMultiProbe(embs, threshold = 0.4, stride = stride, iters = 1)
    }
    spark.stop()
  }
}
