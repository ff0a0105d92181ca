package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.queries.ReferencePipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The end-to-end day-cycle receipt (round-14 brief item 6): the
  * reference's full E1→E2→E3 lifecycle composed from the SHIPPED
  * pieces — DSv2 `ProbeCatalogSource` → `ingest` (exactly-once file
  * sink) → `rollupDaySoFar` → `finalizeDay` → S6 `upsertCatalog` +
  * alert emission inside a `foreachBatch` cadence loop — with one
  * foreachBatch KILLED after its write and before its commit, then
  * replayed from the checkpoint. ST7's idempotence claim was
  * previously pinned only per-component; this asserts it end to end:
  * the post-replay catalog is byte-identical to a clean run's and no
  * alert is duplicated.
  */
/** One catalog row as the S6 sink sees it (top-level: Spark encoders
  * reject inner case classes). */
final case class CatRow(id: String, url: String,
    target_matching: String, is_del: Int, stream_type: String,
    video_format: String, video_resolution: String, audio_format: String,
    audio_sampling_rate: String, target_matching_id: String,
    flow_score: Int, resolution_type: Int)

class DayCycleIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("E1→E2→E3 over the DSv2 probe source; a killed+replayed foreachBatch leaves identical catalog state and no duplicate alert") {
    // ---- the S-table the probes walk ----
    val catDir = Files.createTempDirectory("graft-cycle-cat").toString
    (0 until 6).map(i =>
        (s"s$i", s"http://v${i % 2}.example/s$i", s"Prog $i", s"${200 + i}"))
      .toDF("id", "url", "target_matching", "target_matching_id")
      .write.mode("overwrite").parquet(catDir)

    // ---- E1: DSv2 probe source → classified events → fact store ----
    val factDir = Files.createTempDirectory("graft-cycle-fact").toString
    val ingestCkpt = Files.createTempDirectory("graft-cycle-ick").toString
    val events = spark.readStream
      .format("graft.sources.ProbeCatalogProvider")
      .option("catalogPath", catDir)
      .option("batchSize", "6").option("maxRounds", "4")
      .load().as[graft.model.DetectionEvent]
    val iq = DetectionPipeline.ingest(events, factDir, ingestCkpt)
    iq.processAllAvailable(); iq.stop()
    val store = spark.read.parquet(factDir)
    assert(store.count() === 24) // 4 rounds x 6 probes, exactly once

    // the simulated day + two report-cadence cursors (mid-day, end-of-day)
    val day = store.agg(min(col("event_date"))).head.getDate(0).toLocalDate
    val times = store.where(col("event_date") === lit(java.sql.Date.valueOf(day)))
      .select("created_time").collect().map(_.getTimestamp(0)).sorted
    val midCursor = times(times.length / 2).toInstant
    val endCursor = times.last.toInstant
    val programs = ReferencePipeline.programRows.toDF("id", "stream_name")
    val initialCatalog: Seq[CatRow] = (0 until 6).map(i =>
      CatRow(s"s$i", s"http://v${i % 2}.example/s$i", s"Prog $i", 0, "live",
        "", "", "", "", s"${200 + i}", 0, 0))

    // ---- E2+E3+S6 cadence loop: one tick = one recompute+upsert ----
    // driver-side stores standing in for the catalog DB / alert channel
    final class Stores {
      @volatile var catalog: Seq[CatRow] = initialCatalog
      val alerts = scala.collection.concurrent.TrieMap.empty[Long, Seq[String]]
      val attempts = scala.collection.concurrent.TrieMap.empty[Long, Int]
      @volatile var crashesLeft: Int = 0
    }

    def runCycle(stores: Stores, ckpt: String,
        ticks: Seq[Seq[Long]]): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Long] // tick payload: cursor index
      def start() = mem.toDF().writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val cursors = batch.collect().map(_.getLong(0)).sorted
          if (cursors.nonEmpty) {
            val upTo = if (cursors.max == 0L) midCursor else endCursor
            stores.attempts.updateWith(batchId)(c => Some(c.getOrElse(0) + 1))
            val fin = DetectionPipeline.finalizeDay(
              DetectionPipeline.rollupDaySoFar(spark, factDir, day, upTo),
              programs)
            val merged = DetectionPipeline.upsertCatalog(
              stores.catalog.toDF(), fin)
            // WRITE: catalog state + the batch's alert set (keyed by
            // batchId — the idempotent S6/report discipline)
            stores.catalog = merged.as[CatRow].collect().toSeq
            val alerted = fin.where(col("n_error") >= 1)
              .select("url_id").as[String].collect().toSeq.sorted
            stores.alerts.put(batchId, alerted)
            // KILL: after the write, before Spark commits the batch
            if (stores.crashesLeft > 0) {
              stores.crashesLeft -= 1
              throw new RuntimeException(
                "injected kill: wrote, did not commit — replay must be a no-op")
            }
          }
        }
        .start()

      ticks.zipWithIndex.foreach { case (tick, i) =>
        mem.addData(tick: _*)
        var q = start()
        try q.processAllAvailable()
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
        if (q.exception.isDefined || !q.isActive) {
          // the injected kill: REPLAY from the same checkpoint
          try q.stop() catch { case _: Throwable => () }
          q = start()
          q.processAllAvailable()
        }
        q.stop()
        assert(stores.alerts.contains(i.toLong), s"tick $i never processed")
      }
    }

    // clean run (no kill) → the reference state
    val clean = new Stores
    runCycle(clean, Files.createTempDirectory("graft-cycle-c1").toString,
      Seq(Seq(0L), Seq(1L)))
    // killed run: tick 0's foreachBatch dies after writing, replays
    val killed = new Stores
    killed.crashesLeft = 1
    runCycle(killed, Files.createTempDirectory("graft-cycle-c2").toString,
      Seq(Seq(0L), Seq(1L)))

    // the kill actually fired and the batch actually replayed
    assert(killed.attempts(0L) === 2, s"attempts: ${killed.attempts}")
    assert(clean.attempts(0L) === 1)
    // S6 idempotence end to end: catalog state identical to the clean run
    assert(killed.catalog.sortBy(_.id) === clean.catalog.sortBy(_.id))
    // the cycle genuinely updated the catalog (not a vacuous no-op pass)
    assert(killed.catalog.sortBy(_.id) !== initialCatalog.sortBy(_.id))
    assert(killed.catalog.forall(c => c.flow_score >= 0 && c.resolution_type >= 1))
    // no duplicate alert: one entry per batch, replay overwrote in place
    assert(killed.alerts.size === 2)
    assert(killed.alerts === clean.alerts)
    val allAlerts = killed.alerts.values.flatten.toSeq
    assert(allAlerts.distinct.size === allAlerts.size ||
      killed.alerts(0L).toSet.subsetOf(killed.alerts(1L).toSet))
  }
}
