package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query receives `(spark, sfDir)` and reads only the tables it
  * needs — Catalyst prunes columns and pushes filters into the parquet
  * scan, which is the 100 TB posture: narrow `ReadSchema`, non-empty
  * `PushedFilters`, partition-parallel scans.
  *
  * The driver's parquet stamps timestamps as TIMESTAMP(NANOS), which
  * Spark's vectorized reader rejects; we read them as nanos-since-epoch
  * longs (`spark.sql.legacy.parquet.nanosAsLong`) and convert to proper
  * `TimestampType` at the scan edge (`timestamp_micros(nanos div 1000)`),
  * so every downstream operator sees real timestamps.
  */
object Tables {

  /** Resolved-relation cache, keyed per (session, dir, table): a
    * DataFrame is an immutable analyzed plan, so reusing one across
    * queries is safe — and `spark.read.parquet` pays file listing +
    * footer schema resolution on EVERY call, a pure per-query constant
    * when 272 registered queries each re-resolve the same handful of
    * tables (the bench's ~0.5 s/query fixed-cost audit, round 16).
    * Bounded: ≤ LIVE sessions × 10 tables — a session's entries are
    * evicted when its context ends (advisor find, round 16: the
    * unbounded map strongly retained stopped sessions and their
    * analyzed plans for the JVM lifetime; weak keys don't work here
    * because the cached DataFrame itself references its session).
    *
    * CONTRACT: the dataset directory is immutable for the session's
    * lifetime — the cached plan pins the parquet file listing at first
    * resolution, so regenerating a directory under a live session
    * would serve a stale file list. The driver's testdata dirs are
    * write-once; tests that rewrite a dir use a fresh path. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
  private val evictionHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (evictionHooked.add(spark)) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          cache.keySet.removeIf(k => k._1 eq spark)
          evictionHooked.remove(spark)
        }
      })
    }
    cache.computeIfAbsent((spark, dir, name), { _ =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
    })
  }

  /** Read a table, normalizing the given time columns to `TimestampType`:
    * nanos-longs become `timestamp_micros(n div 1000)`, NTZ timestamps are
    * reinterpreted in the session TZ (UTC — same instant). */
  private def tableTs(spark: SparkSession, dir: String, name: String,
      tsCols: String*): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = table(spark, dir, name)
    df.select(df.schema.fields.map { f =>
      if (tsCols.contains(f.name)) f.dataType match {
        case LongType => timestamp_micros(expr(s"`${f.name}` div 1000L")).as(f.name)
        case TimestampNTZType => col(f.name).cast("timestamp").as(f.name)
        case _ => col(f.name)
      } else col(f.name)
    }.toIndexedSeq: _*)
  }

  def events(spark: SparkSession, dir: String): DataFrame =
    tableTs(spark, dir, "events", "ts")
  def orders(spark: SparkSession, dir: String): DataFrame =
    tableTs(spark, dir, "orders", "o_orderdate")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    tableTs(spark, dir, "lineitem", "l_shipdate")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
