package graft.plans

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom LogicalPlan+Strategy+SparkPlan as-of join must agree with
  * the declarative union+window form on real data and on edge cases. */
class AsofPlanSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("custom exec == window form on sf0.01 events (2014 rows)") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val errors = ev.where(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val viaWindow = graft.ops.AsofJoin.asof(errors, clicks, key = "user_id",
      leftTime = "ts", rightTime = "ts", leftId = "event_id", rightId = "event_id")
      .select(col("event_id"), col("asof_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    val viaExec = AsofJoinPlan.asof(errors, clicks, key = "user_id",
      leftTime = "ts", rightTime = "ts", rightId = "event_id")
      .select(col("event_id"), col("asof_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(viaExec.size === viaWindow.size)
    assert(viaExec === viaWindow)
    assert(viaExec.nonEmpty)
  }

  test("plan: custom AsofJoinExec node, both children clustered+sorted") {
    val l = Seq((1L, 10L, ts(100))).toDF("event_id", "user_id", "ts")
    val r = Seq((2L, 10L, ts(50))).toDF("event_id", "user_id", "ts")
    val df = AsofJoinPlan.asof(l, r, "user_id", "ts", "ts", "event_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(df.as[(Long, Long, Timestamp, Option[Long])].collect()
      === Array((1L, 10L, ts(100), Some(2L))))
  }

  test("randomized equivalence: dense ties, key boundaries, null keys and times") {
    val rnd = new scala.util.Random(42)
    // few keys + coarse times → heavy collision pressure on every edge:
    // equal times across sides, runs of same-key rows, null keys/times
    def rows(n: Int, idBase: Long) = (0 until n).map { i =>
      val key: java.lang.Long =
        if (rnd.nextInt(20) == 0) null else rnd.nextInt(8).toLong
      val t: Timestamp =
        if (rnd.nextInt(25) == 0) null else ts(rnd.nextInt(30).toLong)
      (idBase + i, key, t)
    }
    val l = rows(400, 10000L).toDF("event_id", "user_id", "ts")
    val r = rows(300, 50000L).toDF("event_id", "user_id", "ts")
    val viaWindow = graft.ops.AsofJoin.asof(l, r, "user_id", "ts", "ts",
      "event_id", "event_id")
      .select("event_id", "asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    val viaExec = AsofJoinPlan.asof(l, r, "user_id", "ts", "ts", "event_id")
      .select("event_id", "asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(viaExec === viaWindow)
    assert(viaExec.values.exists(_.isDefined) && viaExec.values.exists(_.isEmpty))
  }

  test("mixed int/long key types fail fast instead of mis-partitioning") {
    // Murmur3 hashes Int(5) and Long(5) to different partitions; the
    // exec must reject the pair at planning, not return silent nulls
    val l = Seq((1L, 5, ts(100))).toDF("event_id", "user_id", "ts")   // int key
    val r = Seq((2L, 5L, ts(50))).toDF("event_id", "user_id", "ts")   // long key
    val e = intercept[Exception] {
      AsofJoinPlan.asof(l, r, "user_id", "ts", "ts", "event_id").collect()
    }
    assert(e.getMessage.contains("type-sensitive"), e.getMessage)
    // non-long right id is equally rejected
    val rIntId = Seq((2, 5L, ts(50))).toDF("event_id", "user_id", "ts")
    val l2 = Seq((1L, 5L, ts(100))).toDF("event_id", "user_id", "ts")
    val e2 = intercept[Exception] {
      AsofJoinPlan.asof(l2, rIntId, "user_id", "ts", "ts", "event_id").collect()
    }
    assert(e2.getMessage.contains("must be bigint"), e2.getMessage)
  }

  test("tie + carry semantics: equal time visible, max id wins, keys don't leak") {
    val l = Seq(
      (101L, 1L, ts(100)), // two clicks at exactly t=100 → max id 22 wins
      (102L, 1L, ts(99)),  // before both clicks → only the t=50 click
      (103L, 2L, ts(500)), // other key: no clicks → null (no leak from key 1)
      (104L, 3L, ts(10))   // key with later-only clicks → null
    ).toDF("event_id", "user_id", "ts")
    val r = Seq(
      (20L, 1L, ts(50)),
      (21L, 1L, ts(100)),
      (22L, 1L, ts(100)),
      (30L, 3L, ts(999))
    ).toDF("event_id", "user_id", "ts")
    val got = AsofJoinPlan.asof(l, r, "user_id", "ts", "ts", "event_id")
      .select("event_id", "asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      101L -> Some(22L), 102L -> Some(20L), 103L -> None, 104L -> None))
  }
}
