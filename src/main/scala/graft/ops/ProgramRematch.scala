package graft.ops

import graft.model.ResolutionDim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Daily finalization: resolution classify + FHD/HD program rematch.
  *
  * Reference (StreamTest.cpp:998-1023): per scored stream,
  *  - `resolution_type = getResolutionType(video_resolution)` (the
  *    25-entry map with UNKNOWN/CUSTOM fallback, StreamTest.h:181-194);
  *  - the name suffix is `" FHD"` when `resolution_type >= FHD1080`,
  *    else `" HD"` (only ONE suffix is tried, chosen by resolution);
  *  - a linear scan over the program dim matches `stream_name + suffix`
  *    against `programs.stream_name`, FIRST match wins (1007-1014);
  *  - no match keeps the old `target_matching_id` (1016-1023) — i.e.
  *    left-outer join + coalesce.
  *
  * Spark-first: the 25-entry resolution map is a chained `when` (pure
  * codegen, no shuffle); the program dim is broadcast; first-match-wins
  * is a `min(id)` pre-aggregation of the dim on the join key (the
  * reference's "first" is the dim's scan order, which is unspecified in
  * MySQL — we make it deterministic by taking the smallest id and
  * document the divergence).
  */
object ProgramRematch {

  /** "WxH" string → 27-value enum ordinal (StreamTest.h:181-194). */
  def resolutionType(res: Column): Column = {
    val mapped = ResolutionDim.byString.foldLeft(null: Column) {
      case (null, (s, t)) => when(res === s, t)
      case (acc, (s, t))  => acc.when(res === s, t)
    }
    mapped.otherwise(
      when(res.isNull || res === "" || res === "0x0", ResolutionDim.Unknown)
        .otherwise(ResolutionDim.Custom))
  }

  /** Apply resolution classify + rematch to a scored rollup.
    *
    * @param scored   rollup rows with `target_matching` (stream name),
    *                 `target_matching_id`, `video_resolution`
    * @param programs program dim (`id`, `stream_name`)
    */
  def rematch(scored: DataFrame, programs: DataFrame): DataFrame = {
    // First-match-wins, made deterministic: one dim row per stream_name.
    val dim = programs
      .groupBy(col("stream_name").as("match_name"))
      .agg(min(col("id")).as("matched_id"))
    val withRes = scored
      .withColumn("resolution_type", resolutionType(col("video_resolution")))
      .withColumn("is_fhd", col("resolution_type") >= ResolutionDim.Fhd1080)
      .withColumn("match_name",
        concat(col("target_matching"),
          when(col("is_fhd"), lit(" FHD")).otherwise(lit(" HD"))))
    withRes
      .join(broadcast(dim), Seq("match_name"), "left_outer")
      .withColumn("target_matching_id",
        coalesce(col("matched_id"), col("target_matching_id")))
      .drop("match_name", "matched_id")
  }

  /** The unmatched streams (reference logs them, StreamTest.cpp:1016-1019)
    * — expressed as a broadcast left-anti join. */
  def unmatched(scored: DataFrame, programs: DataFrame): DataFrame = {
    val withRes = scored
      .withColumn("resolution_type", resolutionType(col("video_resolution")))
      .withColumn("match_name",
        concat(col("target_matching"),
          when(col("resolution_type") >= ResolutionDim.Fhd1080, lit(" FHD"))
            .otherwise(lit(" HD"))))
    withRes.join(
      broadcast(programs.select(col("stream_name").as("match_name"))),
      Seq("match_name"), "left_anti")
  }
}
