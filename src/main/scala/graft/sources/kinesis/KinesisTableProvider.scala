package graft.sources.kinesis

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, Write, WriteBuilder}
import org.apache.spark.sql.connector.write.streaming.StreamingWrite
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.readStream.format("kinesis")` — DSv2 entry point (SURVEY §7-M3;
  * option surface mirrors the reference's SQL layer, SURVEY §2.1):
  *
  *   streams              comma-separated stream names (required)
  *   initialPosition      latest | trim_horizon | at_timestamp (default latest)
  *   startingTimestamp    epoch ms, required with at_timestamp
  *   maxRecordsPerTrigger per-trigger record budget (admission control)
  *   endpointUrl, regionName                             (AWS client)
  *   awsAccessKeyId, awsSecretKey                        (basic creds)
  *   stsRoleArn, stsSessionName, stsExternalId           (STS chain)
  *   fake.id              use the registered in-memory service (offline)
  *   kplAggregate         sink only: pack records into KPL aggregated
  *                        blobs per flush (producer-side aggregation)
  *   kplMaxAggregatedSize sink only: blob size cap, default 1 MiB
  *
  * Payload stays opaque BINARY `data` (the reference's decoder model);
  * format decoding is a DataFrame-side concern — see
  * [[graft.sources.kinesis.Payload]].
  *
  * Reference options intentionally ABSENT because Structured Streaming
  * supersedes their mechanism (rather than accepting them as silent
  * no-ops):
  *   checkpointInterval → the engine's offsetLog/commitLog WAL owns
  *     progress (per-batch, exactly-once), not a KCL-side timer;
  *   storageLevel → no receiver, no block storage: readers pull sequence
  *     ranges on demand and re-pull them on recovery;
  *   kinesisAppName → lease coordination lived in the KCL/DynamoDB app
  *     table; the checkpointLocation plays that role here;
  *   metricsLevel (CloudWatch) → observability flows through Spark's
  *     streaming progress events/metrics sink instead.
  */
final class KinesisTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kinesis"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisTableProvider.RecordSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KinesisTable(new CaseInsensitiveStringMap(properties))
}

object KinesisTableProvider {
  /** Fixed record schema (SURVEY §1.1 metadata StructType). */
  val RecordSchema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("streamName", StringType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("shardId", StringType),
    StructField("approximateArrivalTimestamp", TimestampType)))

  /** Sink input contract: a partition key and an opaque payload. */
  val SinkSchema: StructType = StructType(Seq(
    StructField("partitionKey", StringType),
    StructField("data", BinaryType)))

  private[kinesis] def clientFactory(options: CaseInsensitiveStringMap): KinesisClientFactory = {
    val opt = (k: String) => Option(options.get(k))
    opt("fake.id") match {
      case Some(id) => FakeClientFactory(id)
      case None => AwsClientFactory(
        opt("endpointurl"), opt("regionname"),
        opt("awsaccesskeyid"), opt("awssecretkey"),
        opt("stsrolearn"), opt("stssessionname"), opt("stsexternalid"))
    }
  }

  private[kinesis] def streamNames(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw = Option(options.get("streams")).getOrElse(
      throw new IllegalArgumentException("option 'streams' is required"))
    raw.split(",").map(_.trim).filter(_.nonEmpty).toSeq
  }
}

final class KinesisTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String =
    s"kinesis(${KinesisTableProvider.streamNames(options).mkString(",")})"

  override def schema(): StructType = KinesisTableProvider.RecordSchema

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // Merge table-level options (from getTable properties) with scan-time
    // ones; scan-time wins.
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ scanOptions.asScala).asJava)
    () => new KinesisScan(merged)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ info.options.asScala).asJava)
    new KinesisWriteBuilder(merged, info.schema())
  }
}

final class KinesisScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = KinesisTableProvider.RecordSchema

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KinesisMicroBatchStream(
      KinesisTableProvider.streamNames(options),
      KinesisTableProvider.clientFactory(options),
      Option(options.get("initialposition")).getOrElse("latest"),
      Option(options.get("startingtimestamp")).map(_.toLong),
      Option(options.get("maxrecordspertrigger")).map(_.toLong))
}

final class KinesisWriteBuilder(options: CaseInsensitiveStringMap, schema: StructType)
  extends WriteBuilder {
  override def build(): Write = new Write {
    override def toStreaming: StreamingWrite = {
      val streams = KinesisTableProvider.streamNames(options)
      require(streams.size == 1, "kinesis sink writes to exactly one stream")
      new KinesisStreamingWrite(streams.head,
        KinesisTableProvider.clientFactory(options), schema,
        kplAggregate = Option(options.get("kplaggregate")).exists(_.toBoolean),
        kplMaxAggregatedSize =
          Option(options.get("kplmaxaggregatedsize")).map(_.toInt).getOrElse(1 << 20))
    }
  }
}
