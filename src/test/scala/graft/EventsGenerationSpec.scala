package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.streaming.EventStream

/** Round 10: the driver regenerated the fixtures with `events.ts` as plain
  * µs timestamps where every earlier generation carried INT64 nanosecond
  * timestamps read as longs under `nanosAsLong`. The readers now branch on
  * the footer-inferred type (`Tables.events` / `EventStream.rawSchema`) —
  * but with the ns fixtures gone, nothing in the tree exercised the
  * LongType branch anymore. This spec stages an ns-generation events table
  * from the current one (epoch-ns BIGINT, plus a sub-µs remainder so the
  * exact `div 1000` truncation is observable) and pins both readers to the
  * identical µs normalization the µs generation gets.
  */
class EventsGenerationSpec extends GraftSpec {

  /** ns-generation staging: `ts` as epoch-ns BIGINT + 829 ns. Built from
    * the normalized reader (not the raw footer schema) so the staging is
    * itself generation-independent.
    */
  private lazy val nsDir: String = {
    val tmp = Files.createTempDirectory("graft_nsgen").toString
    Tables.events(spark, TestEnv.Sf001)
      .withColumn("ts", unix_micros(col("ts")) * lit(1000L) + lit(829L))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("batch reader: ns-generation INT64 ts lands on the µs-generation instants") {
    val us = Tables.events(spark, TestEnv.Sf001)
    val ns = Tables.events(spark, nsDir)
    assert(ns.schema("ts").dataType == TimestampType,
      "LongType branch must normalize to µs TimestampType")
    val a = TestEnv.sparkRows(us.orderBy("event_id"))
    val b = TestEnv.sparkRows(ns.orderBy("event_id"))
    assert(a == b,
      "ns fixture must land on the same instants (sub-µs remainder truncated)")
  }

  test("streaming reader takes the LongType branch on the ns generation") {
    val streamed = EventStream.runAvailableNow(spark, "nsgen",
      EventStream.readEvents(spark, nsDir), "append")
    val batch = Tables.events(spark, nsDir)
    assert(TestEnv.sparkRows(streamed.orderBy("event_id")) ==
      TestEnv.sparkRows(batch.orderBy("event_id")),
      "streamed ns-generation read must equal the batch read")
  }
}
