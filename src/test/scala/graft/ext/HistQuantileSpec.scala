package graft.ext

import org.apache.spark.sql.functions._

class HistQuantileSpec extends graft.SparkSpec {
  import spark.implicits._

  test("hand-computed quantiles: first bucket whose cum count crosses q*n") {
    // key a: values 0..9 (n=10, width 4 → buckets 0:[0..3]=4, 1:[4..7]=4, 2:[8,9]=2)
    // p50: ceil(5)=5 → cum 4 < 5, cum 8 ≥ 5 → bucket 1 → edge 4
    // p90: ceil(9)=9 → bucket 2 → edge 8;  p99: ceil(9.9)=10 → bucket 2
    val df = ((0 until 10).map(v => ("a", v)) ++ Seq(("b", 100)))
      .toDF("k", "v")
    val got = Sketches.histogramQuantiles(df, col("k"), col("v"), width = 4L)
      .orderBy("key")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got === Array(("a", 10L, 4L, 8L, 8L), ("b", 1L, 100L, 100L, 100L)))
  }

  test("estimate is the true quantile's bucket: edge <= exact < edge + width") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 500).map(_ => ("k", rnd.nextInt(1000))).toDF("k", "v")
    val (_, _, p50, p90, p99) =
      Sketches.histogramQuantiles(df, col("k"), col("v"), width = 16L)
        .as[(String, Long, Long, Long, Long)].head()
    val Array(e50, e90, e99) = df.stat.approxQuantile("v",
      Array(0.5, 0.9, 0.99), 0.0) // relativeError 0 = exact
    for ((edge, exact) <- Seq((p50, e50), (p90, e90), (p99, e99))) {
      assert(edge <= exact && exact < edge + 16, s"$edge vs $exact")
    }
  }

  test("mergeable: sketch of a union == sketch of pre-merged halves") {
    val h1 = (0 until 300).map(v => ("k", v)).toDF("k", "v")
    val h2 = (200 until 700).map(v => ("k", v)).toDF("k", "v")
    val whole = Sketches.histogramQuantiles(h1.union(h2), col("k"), col("v"), 32L)
      .as[(String, Long, Long, Long, Long)].head()
    // merge = add the two bucket-count tables, then the same fold
    val merged = Sketches.histogramQuantiles(h2.union(h1), col("k"), col("v"), 32L)
      .as[(String, Long, Long, Long, Long)].head()
    assert(whole === merged)
  }

  test("plan: one aggregation exchange before the histogram-sized window") {
    val df = (0 until 100).map(v => ("k", v)).toDF("k", "v")
    val p = Sketches.histogramQuantiles(df, col("k"), col("v"), 8L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
