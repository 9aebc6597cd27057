package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{EventStream, StreamOps}

/** SURVEY §5.2(2): streaming batch-equivalence. The mode-agnostic transforms
  * in StreamOps must produce, under Trigger.AvailableNow (single micro-batch
  * + trailing no-data batch), exactly the rows the same transform produces
  * on a batch scan of the same data — and the multi-batch tests pin the
  * *policies* (late-data drop, session flush at watermark, cross-batch
  * funnel state) that AvailableNow alone cannot exercise.
  */
class StreamingEquivalenceSpec extends GraftSpec {

  private val sf = TestEnv.Sf001

  private def canonRows(df: DataFrame): Seq[Seq[String]] =
    TestEnv.sparkRows(df)._2

  private def assertSameRows(streaming: DataFrame, batch: DataFrame): Unit = {
    val s = canonRows(streaming)
    val b = canonRows(batch)
    assert(s.size == b.size, s"row counts differ: stream=${s.size} batch=${b.size}")
    assert(s == b)
  }

  // ------------------------------------------------- AvailableNow == batch

  test("S1 tumbling: AvailableNow equals batch") {
    val stream = EventStream.runAvailableNow(spark, "eq_s1",
      StreamOps.tumbling(EventStream.readEvents(spark, sf)), "complete")
    assertSameRows(
      stream.orderBy(col("ws"), col("event_type")),
      StreamOps.tumbling(Tables.events(spark, sf))
        .orderBy(col("ws"), col("event_type")))
  }

  test("S2 sliding: AvailableNow equals batch") {
    val stream = EventStream.runAvailableNow(spark, "eq_s2",
      StreamOps.sliding(EventStream.readEvents(spark, sf)), "complete")
    assertSameRows(
      stream.orderBy(col("ws"), col("event_type")),
      StreamOps.sliding(Tables.events(spark, sf))
        .orderBy(col("ws"), col("event_type")))
  }

  test("S14 CMS cells: AvailableNow equals batch (additive partials commute)") {
    val stream = EventStream.runAvailableNow(spark, "eq_s14",
      StreamOps.cmsUserCells(EventStream.readEvents(spark, sf)), "complete")
    assertSameRows(
      stream.orderBy(col("i"), col("b")),
      StreamOps.cmsUserCells(Tables.events(spark, sf))
        .orderBy(col("i"), col("b")))
  }

  test("S4 watermarked append: emits exactly the windows closed by the final watermark") {
    val stream = EventStream.runAvailableNow(spark, "eq_s4",
      StreamOps.watermarkTumbling(EventStream.readEvents(spark, sf)), "append")
    val events = Tables.events(spark, sf)
    val maxTs = events.agg(max(col("ts"))).collect().head.getTimestamp(0)
    val batch = StreamOps.watermarkTumbling(events)
      .where(col("ws") + expr("INTERVAL 1 HOUR") <=
        lit(maxTs) - expr("INTERVAL 2 HOURS"))
    assertSameRows(
      stream.orderBy(col("ws"), col("event_type")),
      batch.orderBy(col("ws"), col("event_type")))
  }

  test("S5 dedup keys: AvailableNow equals batch distinct") {
    val stream = EventStream.runAvailableNow(spark, "eq_s5",
      StreamOps.dedupKeys(EventStream.readEvents(spark, sf)), "append")
    assertSameRows(
      stream.orderBy(col("user_id"), col("event_type")),
      Tables.events(spark, sf).select(col("user_id"), col("event_type"))
        .distinct().orderBy(col("user_id"), col("event_type")))
  }

  test("S6 stream-stream join: AvailableNow equals batch join") {
    val stream = EventStream.runAvailableNow(spark, "eq_s6",
      StreamOps.purchaseClickJoin(EventStream.readEvents(spark, sf)), "append")
    assertSameRows(
      stream.orderBy(col("p_event_id"), col("c_event_id")),
      StreamOps.purchaseClickJoin(Tables.events(spark, sf))
        .orderBy(col("p_event_id"), col("c_event_id")))
  }

  test("S15 left-outer stream-stream join: AvailableNow equals batch left join") {
    // The sentinel (admitted through both side filters via user_id = -1)
    // pushes the final watermark past every real purchase's ±30min band,
    // so every unmatched purchase's null row must surface — making the
    // streaming result equal the batch left join exactly.
    val stream = EventStream.runAvailableNow(spark, "eq_s15",
      StreamOps.purchaseClickLeftJoin(
        EventStream.readEventsWithSentinel(spark, sf)), "append")
      .where(col("user_id") =!= -1L)
    assertSameRows(
      stream.orderBy(col("p_event_id"), col("c_event_id")),
      StreamOps.purchaseClickLeftJoin(Tables.events(spark, sf))
        .orderBy(col("p_event_id"), col("c_event_id")))
    assert(stream.where(col("c_event_id").isNull).count() > 0,
      "the fixture must exercise the outer (null-emission) path")
  }

  test("S16 full-outer stream-stream join: AvailableNow equals batch full join") {
    // Both null paths must resolve: the sentinel pushes BOTH watermarks
    // past every real row's band, so unmatched purchases (null click
    // columns) and unmatched clicks (null purchase columns) all flush.
    val stream = EventStream.runAvailableNow(spark, "eq_s16",
      StreamOps.purchaseClickFullJoin(
        EventStream.readEventsWithSentinel(spark, sf)), "append")
      .where(col("user_id") =!= -1L)
    val keys = Seq(col("p_event_id").asc_nulls_first,
      col("c_event_id").asc_nulls_first)
    assertSameRows(
      stream.orderBy(keys: _*),
      StreamOps.purchaseClickFullJoin(Tables.events(spark, sf))
        .orderBy(keys: _*))
    assert(stream.where(col("c_event_id").isNull).count() > 0,
      "the fixture must exercise the purchase-side null-emission path")
    assert(stream.where(col("p_event_id").isNull).count() > 0,
      "the fixture must exercise the click-side null-emission path")
  }

  test("S7 stream-static join: AvailableNow equals batch join") {
    val customer = Tables.customer(spark, sf)
    val stream = EventStream.runAvailableNow(spark, "eq_s7",
      StreamOps.staticEnrich(EventStream.readEvents(spark, sf), customer), "append")
    assertSameRows(
      stream.orderBy(col("event_id")),
      StreamOps.staticEnrich(Tables.events(spark, sf), customer)
        .orderBy(col("event_id")))
  }

  test("S8 funnel: AvailableNow equals batch flatMapGroupsWithState") {
    val stream = EventStream.runAvailableNow(spark, "eq_s8",
      StreamOps.funnel(EventStream.readEvents(spark, sf)), "append")
    assertSameRows(
      stream.orderBy(col("user_id")),
      StreamOps.funnel(Tables.events(spark, sf)).orderBy(col("user_id")))
  }

  // ------------------------------------------------------ policy tests ----

  /** Row shape for MemoryStream-driven tests. */
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  private def ev(id: Long, tsSec: Long, user: Long, typ: String): Ev =
    Ev(id, new Timestamp(tsSec * 1000L), user, typ, 1.0, "{}")

  /** Drive a MemoryStream through explicit micro-batches into a memory sink;
    * returns the sink table after all batches (and their watermark-followup
    * no-data batches) complete.
    */
  private def runBatches(
      xform: DataFrame => DataFrame,
      mode: String,
      batches: Seq[Ev]*): DataFrame = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ms = MemoryStream[Ev]
    val qn = "policy_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q: StreamingQuery = xform(ms.toDF())
      .writeStream.format("memory").queryName(qn).outputMode(mode).start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    s.table(qn)
  }

  private val T0 = 1700000000L // fixed epoch-second base, hour-unaligned

  test("S4 policy: a late event behind the watermark is dropped, not double-counted") {
    val t0Hour = T0 - (T0 % 3600)
    val batch1 = Seq(
      ev(1, t0Hour + 60, 1, "click"),
      ev(2, t0Hour + 120, 1, "click"),
      // 5h later: pushes watermark to (t0+5h) - 2h = t0+3h, closing hour t0.
      ev(3, t0Hour + 5 * 3600 + 60, 2, "click"))
    // Late arrival inside the already-closed t0 hour window.
    val batch2 = Seq(ev(4, t0Hour + 300, 1, "click"))

    val out = runBatches(StreamOps.watermarkTumbling, "append", batch1, batch2)
      .where(col("ws") === lit(new Timestamp(t0Hour * 1000L)))
      .collect()
    assert(out.length == 1, s"window t0 must be emitted exactly once, got ${out.length}")
    assert(out.head.getAs[Long]("n_events") == 2L,
      "late event must be dropped from the closed window")
  }

  test("S5 policy: duplicate keys arriving in a later batch are suppressed") {
    val batch1 = Seq(ev(1, T0, 1, "click"), ev(2, T0 + 10, 2, "view"))
    val batch2 = Seq(ev(3, T0 + 20, 1, "click")) // dup key within watermark
    val out = runBatches(StreamOps.dedupKeys, "append", batch1, batch2)
    assert(out.count() == 2, "the second (user 1, click) must be deduplicated")
  }

  test("S3 policy: sessions flush once the watermark passes them; open sessions are withheld") {
    val real = Seq(
      ev(1, T0, 1, "click"),
      ev(2, T0 + 600, 1, "click"),          // same session (10 min gap)
      ev(3, T0 + 600 + 2400, 1, "click"),   // 40 min gap → new session
      ev(4, T0 + 100, 2, "view"))
    // Sentinel far in the future advances the watermark past every real
    // session close; its own session stays open and is withheld.
    val sentinel = Seq(ev(99, T0 + 86400, 999, "click"))

    val out = runBatches(StreamOps.sessions, "append", real, sentinel)
      .where(col("user_id") =!= 999)
    val expected = StreamOps.sessions(
      spark.createDataFrame(real).toDF("event_id", "ts", "user_id",
        "event_type", "value", "props"))
    assertSameRows(
      out.orderBy(col("user_id"), col("session_start")),
      expected.orderBy(col("user_id"), col("session_start")))
    // Structure check: user 1 has exactly 2 sessions of sizes 2 and 1.
    val u1 = out.where(col("user_id") === 1).orderBy(col("session_start"))
      .collect().map(_.getAs[Long]("n_events")).toSeq
    assert(u1 == Seq(2L, 1L))
  }

  test("S15 policy: outer null rows emit only when the watermark passes the interval") {
    // The contract the declared row leans on: an unmatched purchase is
    // WITHHELD while a matching click could still arrive (watermark ≤
    // interval end), and emits with nulls exactly once the watermark
    // proves otherwise. Batch 1 alone leaves the watermark 1h behind its
    // max ts, so only the inner match may emit; the far-future sentinel
    // batch then expires the state and the null row must appear.
    val batch1 = Seq(
      ev(1, T0, 1, "purchase"),            // no click within ±30min → outer
      ev(2, T0 + 60, 3, "purchase"),       // matched pair → inner
      ev(3, T0 + 120, 3, "click"),
      // Wrong user for event 1, and ts kept near T0: the batch-1 max ts
      // minus the 1h delay must stay BEHIND event 1's interval end, or
      // the withheld assertion would race the no-data batch's eviction.
      ev(4, T0 + 90, 2, "click"))
    val sentinel = Seq(ev(99, T0 + 86400, -1, "sentinel"))

    val withheld = runBatches(StreamOps.purchaseClickLeftJoin, "append", batch1)
      .where(col("user_id") =!= -1L).collect()
    assert(withheld.map(_.getAs[Long]("p_event_id")).toSeq == Seq(2L),
      "only the inner match may emit before the watermark passes event 1's band")

    val flushed = runBatches(StreamOps.purchaseClickLeftJoin, "append",
      batch1, sentinel)
      .where(col("user_id") =!= -1L)
      .orderBy(col("p_event_id")).collect()
    assert(flushed.map(_.getAs[Long]("p_event_id")).toSeq == Seq(1L, 2L),
      "the sentinel push must flush event 1's null row exactly once")
    val outer = flushed.head
    assert(outer.isNullAt(outer.fieldIndex("c_event_id")) &&
      outer.isNullAt(outer.fieldIndex("c_ts")),
      "the flushed unmatched row must carry NULL click columns")
  }

  test("S16 policy: an unmatched CLICK is withheld, then flushes with NULL purchase columns") {
    // The side S15 never resolves. Event 4's click has no same-user
    // purchase whose ±30-min band could cover it — but while the
    // watermark trails its position a matching purchase could still
    // arrive, so the full join must WITHHOLD it (batch 1 emits only the
    // inner match); the sentinel push must then flush it exactly once
    // with NULL purchase columns, alongside event 1's purchase-side null
    // row from the S15 leg.
    val batch1 = Seq(
      ev(1, T0, 1, "purchase"),            // no click in band → p-side null
      ev(2, T0 + 60, 3, "purchase"),       // matched pair → inner
      ev(3, T0 + 120, 3, "click"),
      ev(4, T0 + 90, 2, "click"))          // no purchase in band → c-side null
    val sentinel = Seq(ev(99, T0 + 86400, -1, "sentinel"))

    val withheld = runBatches(StreamOps.purchaseClickFullJoin, "append", batch1)
      .where(col("user_id") =!= -1L).collect()
    assert(withheld.map(_.getAs[Long]("user_id")).toSeq == Seq(3L),
      "only the inner match may emit before the watermark resolves both bands")

    val flushed = runBatches(StreamOps.purchaseClickFullJoin, "append",
      batch1, sentinel)
      .where(col("user_id") =!= -1L)
      .orderBy(col("user_id")).collect()
    assert(flushed.map(_.getAs[Long]("user_id")).toSeq == Seq(1L, 2L, 3L),
      "the sentinel push must flush both sides' null rows exactly once")
    val pSide = flushed(0) // user 1: unmatched purchase
    assert(pSide.getAs[Long]("p_event_id") == 1L &&
      pSide.isNullAt(pSide.fieldIndex("c_event_id")) &&
      pSide.isNullAt(pSide.fieldIndex("c_ts")),
      "the unmatched purchase must carry NULL click columns")
    val cSide = flushed(1) // user 2: unmatched click
    assert(cSide.getAs[Long]("c_event_id") == 4L &&
      cSide.isNullAt(cSide.fieldIndex("p_event_id")) &&
      cSide.isNullAt(cSide.fieldIndex("p_ts")),
      "the unmatched click must carry NULL purchase columns")
  }

  test("S8 policy: funnel state carries across micro-batches") {
    val batch1 = Seq(ev(1, T0, 7, "signup"), ev(2, T0 + 50, 8, "purchase"))
    val batch2 = Seq(ev(3, T0 + 100, 7, "purchase"), // converts user 7
      ev(4, T0 + 200, 7, "purchase")) // ignored: already converted
    val out = runBatches(StreamOps.funnel, "append", batch1, batch2).collect()
    assert(out.length == 1, "exactly one conversion (user 8 never signed up)")
    val r = out.head
    assert(r.getAs[Long]("user_id") == 7L)
    assert(r.getAs[Timestamp]("purchase_ts").getTime == (T0 + 100) * 1000L,
      "must convert on the FIRST purchase after signup")
  }

  test("S8 policy: a purchase at the exact signup timestamp converts (inclusive tie)") {
    // Oracle semantics: purchase.ts >= signup.ts. Same-microsecond events
    // must therefore convert; the group sort breaks the tie signup-first.
    val batch = Seq(ev(1, T0, 5, "signup"), ev(2, T0, 5, "purchase"))
    val out = runBatches(StreamOps.funnel, "append", batch).collect()
    assert(out.length == 1, "same-timestamp signup+purchase must convert")
    assert(out.head.getAs[Timestamp]("purchase_ts").getTime == T0 * 1000L)
  }

  test("S9 foreachBatch parquet sink: all input rows land in per-batch dirs") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_s9").toString
    val q = StreamOps.foreachBatchParquet(EventStream.readEvents(spark, sf), outDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_s9_ckpt").toString)
      .start()
    q.awaitTermination()
    val written = spark.read.parquet(s"$outDir/batch_*")
    assert(written.count() == Tables.events(spark, sf).count())
  }
}
