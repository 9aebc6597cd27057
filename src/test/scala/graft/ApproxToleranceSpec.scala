package graft

import org.apache.spark.sql.functions._

/** SURVEY §5.2(5): sketch/approx operators can never be oracle-compared —
  * the compensating check is a relative-error bound against the exact
  * answer. `approx_count_distinct` uses HyperLogLog++ with default
  * relativeSD = 0.05; we assert the declared query's estimates land within
  * 5% of exact on both test scale factors.
  */
class ApproxToleranceSpec extends GraftSpec {
  private val tol = 0.05

  // Round 22 (r20 verdict #5, r21 carry-over): the two sketch rows are the
  // only oracle-dark queries, so their tolerance evidence must itself be
  // scale-pinned — a bound that only holds at toy scales is no bound. The
  // bench corpus joins the two gate SFs as a THIRD scale (guarded like
  // every SfBench consumer: hosts without the bench fixtures cancel, not
  // fail). Sketch error is sublinear in N for both estimators (HLL++
  // relativeSD is N-free; GK rank error is a fraction of N), so the same
  // literals apply at every SF.
  for (sf <- Seq(TestEnv.Sf001, TestEnv.Sf01, TestEnv.SfBench).distinct) {
    def guard(): Unit =
      if (sf == TestEnv.SfBench) assume(TestEnv.sfBenchExists,
        s"bench corpus $sf not present on this host")

    test(s"agg_approx_percentile within 2% of exact at $sf") {
      guard()
      // GK sketch at accuracy 10000 bounds RANK error at 1e-4; on the
      // fixture's price distribution that is far inside a 2% VALUE
      // bound, which is what a consumer of the percentile reads.
      val approx = SparkEntry.queries("agg_approx_percentile")(spark, sf)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
      val exact = Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.95)").as("p95"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
      assert(approx.keySet == exact.keySet)
      approx.foreach { case (flag, (a50, a95)) =>
        val (e50, e95) = exact(flag)
        assert(math.abs(a50 - e50) / e50 <= 0.02,
          s"$flag p50: approx=$a50 exact=$e50")
        assert(math.abs(a95 - e95) / e95 <= 0.02,
          s"$flag p95: approx=$a95 exact=$e95")
      }
    }

    test(s"agg_approx_distinct within ${(tol * 100).toInt}% of exact at $sf") {
      guard()
      val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
        .collect().head
      val exact = Tables.lineitem(spark, sf)
        .agg(countDistinct(col("l_partkey")).as("parts"),
          countDistinct(col("l_suppkey")).as("supps"))
        .collect().head

      def relErr(a: Long, e: Long): Double = math.abs(a - e).toDouble / e

      // Column order in the declared query: approx_parts, approx_supps.
      val schema = approx.schema.fieldNames.toSeq
      schema.zipWithIndex.foreach { case (name, i) =>
        val a = approx.getLong(i)
        val e = if (name.contains("part")) exact.getLong(0) else exact.getLong(1)
        val err = relErr(a, e)
        assert(err <= tol,
          s"$name: approx=$a exact=$e relative error $err > $tol")
      }
    }
  }
}
