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
  */
final class KinesisStreamingWrite(
    stream: String,
    clientFactory: KinesisClientFactory,
    schema: StructType) extends StreamingWrite {

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
    new KinesisWriterFactory(stream, clientFactory, pkIdx, datIdx)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

final class KinesisWriterFactory(
    stream: String,
    clientFactory: KinesisClientFactory,
    pkIdx: Int,
    datIdx: Int) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new KinesisDataWriter(stream, clientFactory.create(), pkIdx, datIdx)
}

final class KinesisDataWriter(
    stream: String,
    client: KinesisClient,
    pkIdx: Int,
    datIdx: Int) extends DataWriter[InternalRow] {

  private val MaxBatch = 500 // PutRecords request cap
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]

  override def write(row: InternalRow): Unit = {
    buf += ((row.getUTF8String(pkIdx).toString, row.getBinary(datIdx)))
    if (buf.size >= MaxBatch) flush()
  }

  private def flush(): Unit = if (buf.nonEmpty) {
    client.putRecords(stream, buf.toSeq)
    buf.clear()
  }

  override def commit(): WriterCommitMessage = { flush(); KinesisCommit }
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}

case object KinesisCommit extends WriterCommitMessage
