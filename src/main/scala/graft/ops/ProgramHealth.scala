package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** "Weakest programs" report: programs whose BEST source scores <= 60.
  *
  * Reference (StreamTest.cpp:625-638): `SELECT DISTINCT lbd.stream_name
  * FROM live_stream_sources lss JOIN live_broadcast_details lbd ON
  * lss.target_matching_id = lbd.id WHERE lss.target_matching_id IN
  * (SELECT target_matching_id FROM live_stream_sources WHERE
  * target_matching_id >= 237 AND is_del = 0 AND stream_type <> 'XXX'
  * GROUP BY target_matching_id HAVING MAX(flow_score) <= 60)`.
  *
  * Spark-first: the HAVING MAX subquery is one `groupBy().agg(max)` +
  * filter; the `IN` becomes a left-semi join; the program dim is
  * broadcast. Two shuffles total (the group-by and the distinct), both
  * on narrow projections.
  */
object ProgramHealth {

  def weakPrograms(
      sources: DataFrame,
      programs: DataFrame,
      threshold: Int = 60,
      minMatchingId: Int = 237): DataFrame = {
    val weakIds = sources
      // try_cast matches MySQL's silent coercion of empty/non-numeric ids
      // (row excluded) instead of ANSI-mode failing the whole job.
      .where(col("target_matching_id").try_cast("int") >= minMatchingId &&
        col("is_del") === 0 && col("stream_type") =!= "XXX")
      .groupBy(col("target_matching_id"))
      .agg(max(col("flow_score")).as("max_score"))
      .where(col("max_score") <= threshold)
      .select("target_matching_id")
    val dim = programs.select(col("id").as("program_id"), col("stream_name"))
    sources
      .join(broadcast(dim), col("target_matching_id") === col("program_id"), "inner")
      .join(weakIds, Seq("target_matching_id"), "left_semi")
      .select("stream_name")
      .distinct()
      .orderBy("stream_name")
  }
}
