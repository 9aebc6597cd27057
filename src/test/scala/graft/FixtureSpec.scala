package graft

import org.apache.spark.sql.functions._

/** Pins the fixture invariants the declared queries rely on implicitly.
  * If the test corpus is ever regenerated with different properties, these
  * fail with a named assumption instead of leaving a downstream hash
  * mismatch to diagnose (SURVEY rules reference each one).
  */
class FixtureSpec extends GraftSpec {
  private val sf = TestEnv.Sf001

  test("doc_id and vec_id fit in 32 bits (packed-pair dedup assumption)") {
    val maxDoc = Tables.documents(spark, sf).agg(max(col("doc_id")))
      .collect().head.getLong(0)
    val maxVec = Tables.embeddings(spark, sf).agg(max(col("vec_id")))
      .collect().head.getLong(0)
    assert(maxDoc >= 0 && maxDoc < (1L << 31), s"doc_id domain changed: $maxDoc")
    assert(maxVec >= 0 && maxVec < (1L << 31), s"vec_id domain changed: $maxVec")
  }

  test("l_quantity is non-null and positive (percentile/stats forms)") {
    val bad = Tables.lineitem(spark, sf)
      .where(col("l_quantity").isNull || col("l_quantity") <= 0).count()
    assert(bad == 0)
  }

  test("events.value is exactly 2-decimal (R2 exact-sum discipline)") {
    val bad = Tables.events(spark, sf)
      .where(col("value") =!= round(col("value"), 2)).count()
    assert(bad == 0, "stream_tumbling's decimal(18,2) sum would lose precision")
  }

  test("events.ts normalizes into a sane microsecond range") {
    val r = Tables.events(spark, sf)
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).collect().head
    val lo = r.getTimestamp(0).toInstant
    val hi = r.getTimestamp(1).toInstant
    assert(lo.isAfter(java.time.Instant.parse("2000-01-01T00:00:00Z")))
    assert(hi.isBefore(java.time.Instant.parse("2099-12-31T00:00:00Z")),
      "sentinel (2100) must stay strictly after all real events")
  }

  test("embeddings are dense, fixed-width, null-free (DotProduct fast path)") {
    val e = Tables.embeddings(spark, sf)
    val widths = e.select(size(col("embedding")).as("w")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(widths == Set(64), s"embedding width changed: $widths")
    val withNulls = e.where(exists(col("embedding"), x => x.isNull)).count()
    assert(withNulls == 0)
  }

  test("documents text yields >= 11 tokens per doc for the winnowing window") {
    val tooShort = Tables.documents(spark, sf)
      .where(size(filter(split(col("text"), " "), t => t =!= "")) < 11).count()
    // llm_fingerprint_winnow filters these out; the guard documents how
    // many rows that filter is expected to drop (currently a handful).
    assert(tooShort < 20, s"token-length distribution shifted: $tooShort short docs")
  }
}
