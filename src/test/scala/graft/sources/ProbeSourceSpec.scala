package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProbeSourceSpec extends SparkSpec {
  import spark.implicits._

  test("DSv2 probe source: batch cursor wraps the catalog, events are classified") {
    // tiny catalog: 7 streams, batchSize 5, 3 rounds => 15 probes, wrapping
    val catDir = Files.createTempDirectory("graft-cat").toString
    (0 until 7).map(i => (s"s$i", s"http://v${i % 2}.example/s$i", s"Prog $i", s"${200 + i}"))
      .toDF("id", "url", "target_matching", "target_matching_id")
      .write.mode("overwrite").parquet(catDir)

    val stream = spark.readStream
      .format("graft.sources.ProbeCatalogProvider")
      .option("catalogPath", catDir)
      .option("batchSize", "5")
      .option("maxRounds", "3")
      .load()
    val q = stream.writeStream
      .format("memory").queryName("probe_events")
      .start()
    q.processAllAvailable()
    q.stop()

    val out = spark.table("probe_events").collect()
    assert(out.length === 15)
    val byStream = out.groupBy(_.getAs[String]("url_id")).view.mapValues(_.length).toMap
    // 15 probes over 7 streams wrapping: s0 probed at cursor 0,7,14 => 3
    assert(byStream("s0") === 3)
    assert(byStream.values.sum === 15)
    // classified outcomes: item 0 or 1001..1016; metadata shapes hold
    out.foreach { r =>
      val item = r.getAs[Int]("item")
      assert(item == 0 || (item >= 1001 && item <= 1016))
      assert(r.getAs[String]("flow_address").startsWith("http://"))
      assert(r.getAs[java.sql.Timestamp]("created_time") != null)
    }
    // deterministic: same (stream, seq) -> same outcome across runs
    val q2 = spark.readStream
      .format("graft.sources.ProbeCatalogProvider")
      .option("catalogPath", catDir)
      .option("batchSize", "5").option("maxRounds", "3")
      .load()
      .writeStream.format("memory").queryName("probe_events2").start()
    q2.processAllAvailable(); q2.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("url_id"), r.getAs[java.sql.Timestamp]("created_time").getTime,
        r.getAs[Int]("item"))
    val again = spark.table("probe_events2").collect().map(key).sortBy(_.toString)
    val first = out.map(key).sortBy(_.toString)
    assert(again.toSeq === first.toSeq)
  }

  test("checkpoint restart resumes from the committed offset (no backwards end)") {
    val catDir = Files.createTempDirectory("graft-cat-r").toString
    (0 until 4).map(i => (s"s$i", s"http://v0.example/s$i", s"Prog $i", s"${200 + i}"))
      .toDF("id", "url", "target_matching", "target_matching_id")
      .write.mode("overwrite").parquet(catDir)
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val outDir = Files.createTempDirectory("graft-probe-out").toString

    def run(rounds: Int): Unit = {
      // a FRESH stream instance each run — `advanced` starts at 0 and must
      // be floored up from the checkpoint (the round-1 restart bug)
      val q = spark.readStream
        .format("graft.sources.ProbeCatalogProvider")
        .option("catalogPath", catDir)
        .option("batchSize", "4")
        .option("maxRounds", rounds.toString)
        .load()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop()
    }
    run(rounds = 2)                      // batches 1-2 → probes seq 0..7
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst === 8)
    run(rounds = 4)                      // restart: must CONTINUE at seq 8
    val all = spark.read.parquet(outDir)
    assert(all.count() === 16)           // 2 more batches, no replays
    // every probe sequence (via created_time) appears exactly once
    val times = all.select("created_time").collect()
      .map(_.getTimestamp(0).getTime).sorted
    assert(times.distinct.length === 16)
  }
}
