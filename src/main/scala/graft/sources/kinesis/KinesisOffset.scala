package graft.sources.kinesis

import org.apache.spark.sql.connector.read.streaming.Offset

/** Streaming offset = per-(stream, shard) next-sequence-to-read
  * (SURVEY §1.1: "Offset JSON = Map[shardId, sequenceNumber]"). Written to
  * the checkpoint offsetLog BEFORE a batch executes (WAL ordering), so
  * recovery replans the identical [start, until) ranges and re-reads them —
  * the exactly-once design the reference achieved via
  * KinesisBackedBlockRDD's replay-by-range fallback.
  *
  * JSON is rendered with sorted keys so equal offsets are byte-identical
  * (offset equality in MicroBatchExecution is JSON-string equality).
  */
final case class KinesisOffset(shardOffsets: Map[ShardKey, Long]) extends Offset {
  override def json(): String =
    shardOffsets.toSeq
      .sortBy { case (k, _) => (k.stream, k.shardId) }
      .map { case (k, v) => s""""${k.stream}/${k.shardId}":$v""" }
      .mkString("{", ",", "}")
}

/** A shard qualified by its stream (the `streams` option is comma-separated
  * — one source can fan in several streams, per the reference's option
  * surface).
  */
final case class ShardKey(stream: String, shardId: String)

object KinesisOffset {
  private val Entry = """"([^"/]+)/([^"]+)"\s*:\s*(\d+)""".r

  /** Inverse of json(); tolerant of whitespace, dependency-free. */
  def fromJson(json: String): KinesisOffset =
    KinesisOffset(Entry.findAllMatchIn(json).map { m =>
      ShardKey(m.group(1), m.group(2)) -> m.group(3).toLong
    }.toMap)
}
