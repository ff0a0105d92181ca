package graft.ops

class CategoryDriftSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ops.SnapshotDiff

  test("hand-checked drift: rates and TV contributions are exact floors") {
    // A: 3 clicks, 1 view (n1=4); B: 1 click, 3 views (n2=4)
    val df = Seq(
      ("click", 1), ("click", 1), ("click", 1), ("view", 1),
      ("click", 0), ("view", 0), ("view", 0), ("view", 0))
      .toDF("cat", "ina")
    val got = SnapshotDiff.categoryDrift(df, col("cat"), col("ina") === 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // click: p1=3/4, p2=1/4 -> r1=750000, r2=250000, tv=|3*4-1*4|*1e6//16=500000
    assert(got("click") === ((3L, 1L, 750000L, 250000L, 500000L)))
    assert(got("view") === ((1L, 3L, 250000L, 750000L, 500000L)))
  }

  test("category absent from one side still reports (c=0, rate 0)") {
    val df = Seq(("a", 1), ("b", 0), ("b", 0)).toDF("cat", "ina")
    val got = SnapshotDiff.categoryDrift(df, col("cat"), col("ina") === 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(5)))
      .toMap
    // a: p1=1, p2=0 -> tv 1e6; b: p1=0, p2=1 -> tv 1e6
    assert(got("a") === ((1L, 0L, 1000000L)))
    assert(got("b") === ((0L, 2L, 1000000L)))
  }
}

class ReconcileSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("exact / tolerated / broken / lineless headers classify correctly") {
    val h = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L))
      .toDF("k", "booked")
    val d = Seq(
      (1L, 60L), (1L, 40L),   // exact
      (2L, 103L),             // +3 → within tol 5
      (3L, 10L))              // −90 → break; header 4 has no lines
      .toDF("k", "c")
    val got = graft.ops.SnapshotDiff.reconcileTotals(
        h, col("k"), col("booked"), d, col("k"), col("c"), tolCents = 5L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((4L, 1L, 1L, 1L, 1L, 90L, 93L)))
  }

  test("all reconciled: zero breaks, zero drift") {
    val h = Seq((1L, 7L)).toDF("k", "booked")
    val d = Seq((1L, 7L)).toDF("k", "c")
    val got = graft.ops.SnapshotDiff.reconcileTotals(
        h, col("k"), col("booked"), d, col("k"), col("c"), tolCents = 0L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((1L, 0L, 1L, 0L, 0L, 0L, 0L)))
  }
}
