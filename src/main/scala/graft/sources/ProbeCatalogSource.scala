package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Data Source v2 streaming source that models the reference's probe
  * main loop (StreamTest.cpp:1059-1177) as a genuine Spark source — the
  * stretch goal SURVEY §4 reserved:
  *
  *  - the stream-source catalog is loaded once (the reference's
  *    `GetStreamInfoSqlDbData`, full SELECT into memory);
  *  - each micro-batch advances a cursor by `batchSize` (= `nTestNum`
  *    25), wrapping at the end of the catalog (StreamTest.cpp:1169-1176);
  *  - every catalog row in the batch is probed (here: the deterministic
  *    `SimulatedProber` — real ffmpeg I/O is out of scope) and emits one
  *    classified detection event.
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft.sources.ProbeCatalogProvider")
  *     .option("catalogPath", ".../catalog.parquet") // id,url,target_matching,target_matching_id
  *     .option("batchSize", "25")
  *     .option("maxRounds", "3")   // optional: stop advancing after N batches (tests)
  *     .load()
  * }}}
  */
class ProbeCatalogProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ProbeCatalogSource.EventSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ProbeCatalogTable(new CaseInsensitiveStringMap(properties))
}

object ProbeCatalogSource {
  /** DetectionEvent schema (FIXTURES.md §A1), in model column order. */
  val EventSchema: StructType = StructType(Seq(
    StructField("url_id", StringType),
    StructField("flow_address", StringType),
    StructField("item", IntegerType),
    StructField("return_value", StringType),
    StructField("lag_details", StringType),
    StructField("streaming_protocol", StringType),
    StructField("bitrate", StringType),
    StructField("stream_length", StringType),
    StructField("video_format", StringType),
    StructField("video_resolution", StringType),
    StructField("audio_format", StringType),
    StructField("audio_sampling_rate", StringType),
    StructField("created_time", TimestampType),
    StructField("target_matching_id", StringType),
    StructField("target_matching", StringType)))

  final case class CatalogEntry(
      id: String, url: String, targetMatching: String, targetMatchingId: String)

  /** Deterministic probe simulation: outcome is a pure function of
    * (stream id, probe sequence number) — ~1 in 5 probes fails, cycling
    * through all 16 error codes; metadata mirrors the event-derivation
    * mix. Epoch base 2024-06-01T00:00:00Z + 1 s per probe. */
  object SimulatedProber {
    val EpochBaseMicros: Long = 1717200000L * 1000000L // 2024-06-01 UTC

    def probe(e: CatalogEntry, seq: Long): InternalRow = {
      val h = graft.functions.PolyHash.hash(s"${e.id}#$seq")
      val failed = h % 5 == 0
      val item = if (failed) 1001 + (h % 16).toInt else 0
      val k = (h % 97).toInt
      def s(v: String) = UTF8String.fromString(v)
      InternalRow(
        s(e.id),
        s(e.url),
        item,
        s(if (failed) "-1" else "0"),
        s(""),
        s(if (k % 5 == 0) "" else if (k % 2 == 0) "hls" else "flv"),
        s(if (k % 11 == 0) "" else s"${k * 100} kb/s"),
        s(if (k % 13 == 0) "N/A" else k.toString),
        s(if (k % 3 == 0) "h264" else if (k % 3 == 1) "hevc" else ""),
        s(k % 7 match {
          case 0 => "0x0"
          case 1 => ""
          case 2 => "1920x1080"
          case 3 => "1280x720"
          case 4 => "640x360"
          case 5 => "3840x2160"
          case _ => "999x777"
        }),
        s(if (k % 4 == 0) "aac" else "mp3"),
        s(if (k % 6 == 0) "" else "44100"),
        EpochBaseMicros + seq * 1000000L,
        s(e.targetMatchingId),
        s(e.targetMatching))
    }
  }
}

final case class ProbeOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class ProbeCatalogTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"probe_catalog(${options.get("catalogPath")})"
  override def schema(): StructType = ProbeCatalogSource.EventSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ProbeCatalogSource.EventSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ProbeMicroBatchStream(options)
      }
    }
}

class ProbeMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl {
  import ProbeCatalogSource._

  private val catalogPath = options.get("catalogPath")
  private val batchSize = options.getInt("batchSize", 25)
  private val tasksPerBatch = options.getInt("tasksPerBatch", 5)
  /** Stop advancing after this many batches; <=0 = unbounded (daemon). */
  private val maxRounds = options.getLong("maxRounds", -1L)

  private lazy val catalog: Array[CatalogEntry] = {
    val spark = SparkSession.active
    spark.read.parquet(catalogPath)
      .select("id", "url", "target_matching", "target_matching_id")
      .collect()
      .map(r => CatalogEntry(r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
  }

  private var advanced = 0L

  override def initialOffset(): Offset = ProbeOffset(0)

  /** Floor the in-memory cursor to an offset learned from the engine
    * (checkpoint restore, commit, restart) so a fresh instance never
    * returns an end behind a committed start, and `maxRounds` counts
    * batches across restarts instead of resetting to zero. */
  private def floorTo(n: Long): Unit =
    advanced = math.max(advanced, (n + batchSize - 1) / batchSize)

  /** `SupportsAdmissionControl` variant — the engine hands us the last
    * known start offset, which makes restart recovery airtight: the
    * plain `latestOffset()` can be called BEFORE any deserialized
    * checkpoint offset reaches the stream, and a stale in-memory cursor
    * would then regress the offset log (observed as an empty batch
    * followed by replays in ProbeSourceSpec's restart case). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    floorTo(start.asInstanceOf[ProbeOffset].n)
    if (maxRounds <= 0 || advanced < maxRounds) advanced += 1
    ProbeOffset(advanced * batchSize)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def deserializeOffset(json: String): Offset = {
    val n = json.toLong
    floorTo(n)
    ProbeOffset(n)
  }

  override def commit(end: Offset): Unit =
    floorTo(end.asInstanceOf[ProbeOffset].n)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ProbeOffset].n
    val e = end.asInstanceOf[ProbeOffset].n
    if (catalog.isEmpty || e <= s) return Array.empty
    // cursor positions s until e, wrapped over the catalog (the
    // reference's nIdx advance-and-wrap), sliced into tasks
    (s until e).grouped(math.max(1, ((e - s) / tasksPerBatch).toInt + 1))
      .map { seqs =>
        val entries = seqs.map(i => (catalog((i % catalog.length).toInt), i)).toArray
        ProbePartition(entries): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val entries = partition.asInstanceOf[ProbePartition].entries
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < entries.length }
          override def get(): InternalRow = {
            val (entry, seq) = entries(i)
            SimulatedProber.probe(entry, seq)
          }
          override def close(): Unit = ()
        }
      }
    }

  override def stop(): Unit = ()
}

final case class ProbePartition(
    entries: Array[(ProbeCatalogSource.CatalogEntry, Long)]) extends InputPartition
