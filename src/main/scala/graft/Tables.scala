package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated test tables (TESTDATA.md / FIXTURES.md).
  *
  * All readers are plain parquet scans so Catalyst predicate pushdown /
  * column pruning reach the file source. The only special case is `events`:
  * its `ts` column has shipped in two physical forms across fixture
  * generations — parquet INT64 TIMESTAMP(NANOS) (which Spark 4 refuses to
  * read unless `spark.sql.legacy.parquet.nanosAsLong=true`; we then
  * normalize ns→µs with exact integer division) and plain µs timestamps
  * (isAdjustedToUTC=false, inferred as TIMESTAMP_NTZ). `events` branches on
  * the footer-inferred type so both generations land on the identical µs
  * TimestampType schema.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts` normalized to a µs TimestampType — identical to what
    * DuckDB produces reading the same file (SURVEY §1.2): ns files truncate
    * to µs via exact integer division, µs/NTZ files cast value-identically
    * under the UTC session timezone.
    *
    * `nanosAsLong` is only consulted during footer-schema inference (i.e.
    * inside `spark.read.parquet`, which resolves the schema eagerly), so
    * the conf is set for exactly that call and restored in `finally` —
    * execution of the returned DataFrame after restore is verified to work
    * (probe, round 8) and the reader no longer leaves a session-conf
    * mutation behind (the nit carried since round 5).
    *
    * The set/read/restore window is synchronized (round-8 ADVICE): two
    * concurrent `events()` calls could otherwise interleave so one call
    * restores the conf to false while the other is still inside footer
    * inference, failing with the NANOS error the set exists to avoid. The
    * lock serializes this method against itself; a concurrent NON-events
    * parquet read on the same session merely sees `nanosAsLong=true` during
    * the brief inference window, which is harmless (it only widens what a
    * reader would accept, and no other test table carries ns timestamps).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = rawEvents(spark, dir)
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df // already µs TimestampType
    }
  }

  /** The footer-inferred events frame with `ts` untouched: LongType for the
    * ns-fixture generation (read under the scoped `nanosAsLong`), timestamp
    * for the µs generation. `EventStream` probes this to pick the matching
    * streaming read schema.
    */
  def rawEvents(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    nanosLock.synchronized {
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try table(spark, dir, "events")
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  private val nanosLock = new Object

  /** SURVEY rule R2: aggregate monetary/quantity doubles as exact decimals so
    * sums are order-independent and engine-exact.
    */
  def dec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(18,2)")

  /** Round 21 (optimization guide §2.5, input-skew remedy): floor on the
    * parallelism of a heavy map-side pipeline. The fixture tables are
    * single-file, single-row-group parquet, so a scan — and everything
    * fused above its first exchange: tokenization, shingling, dot
    * products, partial aggregation — otherwise runs as ONE task
    * regardless of core count (parquet cannot split below a row group;
    * profiled at sf0.1: llm_knn_graph's bucket join ran 2.0 s
    * single-task on a 32-core session). Repartitions by a provided
    * unique key (hash — deterministic, and unlike round-robin it pays no
    * sort-before-repartition) ONLY when the scan is narrower than the
    * session's default parallelism; at production scale scans are
    * already wider than the core count and this is a no-op, so nothing
    * here is tuned to the local fixture.
    */
  def spread(spark: SparkSession, df: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, key) else df
  }
}
