package graft.sources.kinesis

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{BinaryType, StringType, StructType}

/** Streaming Kinesis sink: PutRecords in bounded batches from each task
  * (SURVEY §2.2-A "kinesis sink" row). Input contract: a `partitionKey`
  * STRING and a `data` BINARY column (extra columns rejected up front so
  * misuse fails at plan time, not mid-stream).
  *
  * Delivery is at-least-once (PutRecords is not transactional; Kinesis has
  * no idempotent producer) — the same guarantee the reference offers.
  * Flushes every 500 records, the PutRecords API batch cap.
  *
  * Option `kplAggregate=true` turns on producer-side KPL aggregation (the
  * KPL default posture; see [[Kpl]]): each flush packs its records, in
  * order, into aggregated blobs bounded by `kplMaxAggregatedSize` bytes
  * (default 1 MiB — the Kinesis record cap), cutting per-record service
  * cost on high-rate small-record streams. The source side reads either
  * shape through `Payload.deaggregate`.
  */
final class KinesisStreamingWrite(
    stream: String,
    clientFactory: KinesisClientFactory,
    schema: StructType,
    kplAggregate: Boolean = false,
    kplMaxAggregatedSize: Int = 1 << 20) extends StreamingWrite {

  private val pkIdx  = validated(schema, "partitionKey", StringType)
  private val datIdx = validated(schema, "data", BinaryType)

  private def validated(s: StructType, name: String, tpe: org.apache.spark.sql.types.DataType): Int = {
    val i = s.fieldNames.indexOf(name)
    require(i >= 0 && s.fields(i).dataType == tpe,
      s"kinesis sink requires column '$name' of type ${tpe.simpleString}; " +
        s"got schema ${s.simpleString}")
    i
  }

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new KinesisWriterFactory(stream, clientFactory, pkIdx, datIdx,
      kplAggregate, kplMaxAggregatedSize)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

final class KinesisWriterFactory(
    stream: String,
    clientFactory: KinesisClientFactory,
    pkIdx: Int,
    datIdx: Int,
    kplAggregate: Boolean,
    kplMaxAggregatedSize: Int) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new KinesisDataWriter(stream, clientFactory.create(), pkIdx, datIdx,
      kplAggregate, kplMaxAggregatedSize)
}

final class KinesisDataWriter(
    stream: String,
    client: KinesisClient,
    pkIdx: Int,
    datIdx: Int,
    kplAggregate: Boolean = false,
    kplMaxAggregatedSize: Int = 1 << 20) extends DataWriter[InternalRow] {

  private val MaxBatch = 500 // PutRecords request cap
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]

  override def write(row: InternalRow): Unit = {
    buf += ((row.getUTF8String(pkIdx).toString, row.getBinary(datIdx)))
    if (buf.size >= MaxBatch) flush()
  }

  /** Greedy in-order packing: cut a blob when adding the next record would
    * cross the size cap. The blob's transport partition key is its first
    * member's key (members keep their own keys in the aggregate's key
    * table, restored by deaggregation); per-key ordering within the shard
    * is preserved because packing never reorders.
    */
  private def pack(records: Seq[(String, Array[Byte])]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    val chunk = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var size = 0
    def cut(): Unit = if (chunk.nonEmpty) {
      out += ((chunk.head._1, Kpl.aggregate(chunk.toSeq)))
      chunk.clear(); size = 0
    }
    records.foreach { case (pk, data) =>
      val rec = pk.length + data.length + 16 // key-table + varint overhead bound
      if (chunk.nonEmpty && size + rec > kplMaxAggregatedSize) cut()
      chunk += ((pk, data)); size += rec
    }
    cut()
    out.toSeq
  }

  private def flush(): Unit = if (buf.nonEmpty) {
    client.putRecords(stream, if (kplAggregate) pack(buf.toSeq) else buf.toSeq)
    buf.clear()
  }

  override def commit(): WriterCommitMessage = { flush(); KinesisCommit }
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}

case object KinesisCommit extends WriterCommitMessage
