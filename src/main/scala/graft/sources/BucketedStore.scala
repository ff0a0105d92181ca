package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage for co-located joins (100 TB posture; SURVEY §7.5).
  *
  * A fact-fact equi-join shuffles both sides on the key every query.
  * Writing both tables bucketed by that key (same bucket count) lets
  * Spark plan the join with ZERO exchanges — each task joins bucket i of
  * both sides in place. At 100 TB the one-time bucketed write amortizes
  * across every subsequent join/aggregation on the key.
  */
object BucketedStore {

  /** Save `df` bucketed by `key` as managed table `table`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortBy: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key)
    sortBy.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }

  /** Join two same-bucketing tables on their bucket key — planned
    * shuffle-free when bucket counts match. */
  def cooperativeJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
