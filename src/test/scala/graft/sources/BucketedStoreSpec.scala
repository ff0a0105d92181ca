package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero exchanges (co-located join)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
        .select("l_orderkey", "l_quantity")
      val os = graft.Tables.orders(spark, "/root/testdata/sf0.001")
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      BucketedStore.writeBucketed(li, "graft_li_b", "l_orderkey", 8)
      BucketedStore.writeBucketed(os, "graft_os_b", "l_orderkey", 8)
      val joined = BucketedStore.cooperativeJoin(spark, "graft_li_b", "graft_os_b", "l_orderkey")
      // correctness: same rows as the plain join
      val expected = li.join(os, "l_orderkey").count()
      assert(joined.count() === expected)
      assert(expected > 0)
      // plan: no shuffle exchange anywhere (bucketing co-locates both sides)
      val exchanges = joined.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"expected shuffle-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_li_b")
      spark.sql("DROP TABLE IF EXISTS graft_os_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
