package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** JDBC fidelity path for the reference's actual store (MySQL).
  *
  * The reference scans its stream-source catalog with a plain SELECT
  * (StreamTest.cpp:685-689) and writes results back row-by-row with a
  * partial UPDATE that skips empty fields but always writes the score
  * and resolution type (StreamTest.cpp:151-190). Spark-first mapping:
  *
  *  - scan → `spark.read.format("jdbc")`, so Catalyst pushes filters
  *    and projections INTO the database (`PushedFilters` in the plan)
  *    instead of pulling the whole table;
  *  - big tables → partitioned reads (`partitionColumn` range split):
  *    N executors each issue a bounded-range query, which is the only
  *    way a 100 TB-scale JDBC scan parallelizes;
  *  - writeback → `foreachBatch` + per-partition batched UPDATEs with
  *    the skip-empty CASE applied in SQL, executed on the executors
  *    (never a driver-side row loop).
  *
  * Tested against embedded Derby (ships with Spark); the SQL used is
  * portable to MySQL unchanged.
  */
object JdbcCatalog {

  /** Catalog scan. `predicates`-free: filters applied by the caller on
    * the returned DataFrame still push down into the database. */
  def read(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Parallel range-partitioned scan for fact-sized tables: each of
    * `numPartitions` tasks reads one bounded slice of `partitionColumn`. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** The update columns of the reference's partial UPDATE, in statement
    * order: skip-empty fields first, then the always-written pair. */
  val PartialUpdateFields: Seq[String] = Seq(
    "video_format", "video_resolution", "audio_format",
    "audio_sampling_rate", "target_matching_id")

  /** Portable partial-UPDATE statement (Derby + MySQL): empty-string
    * update values keep the existing column, `flow_score` and
    * `resolution_type` always write (StreamTest.cpp:151-190). */
  def partialUpdateSql(table: String): String = {
    val keeps = PartialUpdateFields
      .map(f => s"$f = CASE WHEN ? = '' THEN $f ELSE ? END")
    (keeps ++ Seq("flow_score = ?", "resolution_type = ?"))
      .mkString(s"UPDATE $table SET ", ", ", " WHERE id = ?")
  }

  /** Batched partial update executed on the executors: one connection +
    * one prepared statement per partition, rows added with `addBatch`.
    * Update rows carry `(url_id, <PartialUpdateFields...>, flow_score,
    * resolution_type)`. The reference UPDATE never inserts, so unmatched
    * ids are simply no-ops. */
  def upsertPartial(updates: DataFrame, url: String, table: String): Unit = {
    val sql = partialUpdateSql(table)
    val cols = Seq("url_id") ++ PartialUpdateFields ++
      Seq("flow_score", "resolution_type")
    val projected = updates.selectExpr(cols: _*)
    val scoreOrd = 1 + PartialUpdateFields.length
    projected.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url)
        try {
          val st = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            var p = 1
            PartialUpdateFields.indices.foreach { i =>
              val v = Option(r.getString(1 + i)).getOrElse("")
              st.setString(p, v); st.setString(p + 1, v)
              p += 2
            }
            // null score/type write SQL NULL rather than NPE-ing the task
            if (r.isNullAt(scoreOrd)) st.setNull(p, java.sql.Types.INTEGER)
            else st.setInt(p, r.getAs[Number](scoreOrd).intValue())
            if (r.isNullAt(scoreOrd + 1)) st.setNull(p + 1, java.sql.Types.INTEGER)
            else st.setInt(p + 1, r.getAs[Number](scoreOrd + 1).intValue())
            // setObject: the id column may be string or numeric — bind as-is
            st.setObject(p + 2, r.get(0))
            st.addBatch()
            n += 1
            if (n % 1000 == 0) st.executeBatch()
          }
          st.executeBatch()
          st.close()
        } finally conn.close()
      }
    }
  }

  /** Streaming writeback: idempotent `foreachBatch` partial update (the
    * merge is deterministic, so a retried batchId rewrites the same
    * values — ST7 semantics over JDBC). */
  def upsertWriter(finalized: DataFrame, url: String,
      table: String): DataStreamWriter[Row] =
    finalized.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertPartial(batch, url, table)
      }

  /** Test/bootstrap helper: run DDL/DML statements over a JDBC url. */
  def execute(url: String, statements: Seq[String]): Unit = {
    val conn = DriverManager.getConnection(url)
    try statements.foreach { s =>
      val st = conn.createStatement()
      try st.execute(s) finally st.close()
    } finally conn.close()
  }
}
