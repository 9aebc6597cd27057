package graft.sources.kinesis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StructType

/** Payload decoding for the kinesis source (the reference's `format` option
  * + user decoder function, SURVEY §1.1 "Payload schema"): the source keeps
  * `data` as opaque BINARY; these helpers parse it into typed columns with
  * the schema the caller declares. Kept DataFrame-side (not inside the
  * source) so decoding runs in whole-stage codegen like any other
  * expression and the source never guesses schemas in production.
  */
object Payload {

  /** JSON payloads → typed `payload.*` columns alongside the metadata. */
  def json(df: DataFrame, schema: StructType): DataFrame =
    df.withColumn("payload", from_json(col("data").cast("string"), schema))
      .select(col("streamName"), col("partitionKey"), col("sequenceNumber"),
        col("shardId"), col("approximateArrivalTimestamp"), col("payload.*"))

  /** CSV payloads (headerless, declared schema). */
  def csv(df: DataFrame, schema: StructType): DataFrame =
    df.withColumn("payload",
      from_csv(col("data").cast("string"), schema, Map.empty[String, String]))
      .select(col("streamName"), col("partitionKey"), col("sequenceNumber"),
        col("shardId"), col("approximateArrivalTimestamp"), col("payload.*"))

  /** UTF-8 text payloads (the reference's default decoder). */
  def utf8(df: DataFrame): DataFrame =
    df.withColumn("text", col("data").cast("string"))
      .select(col("streamName"), col("partitionKey"), col("sequenceNumber"),
        col("shardId"), col("approximateArrivalTimestamp"), col("text"))

  /** KPL deaggregation (see [[Kpl]]): expands KPL-aggregated blobs to their
    * member records, passing non-aggregated records through untouched.
    * Output keeps the source's exact record schema, so json/csv/utf8 chain
    * after it unchanged: member records carry their OWN partition key from
    * the aggregate's key table; stream/shard/sequence/arrival provenance is
    * inherited from the transport record (members of one blob share its
    * sequence number, exactly as Kinesis stores them).
    */
  def deaggregate(df: DataFrame): DataFrame =
    df.withColumn("rec",
      explode(ColumnBridge.column(KplDeaggregate(ColumnBridge.expression(col("data"))))))
      .select(col("rec.data").as("data"), col("streamName"),
        coalesce(col("rec.partitionKey"), col("partitionKey")).as("partitionKey"),
        col("sequenceNumber"), col("shardId"), col("approximateArrivalTimestamp"))
}
