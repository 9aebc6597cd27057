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

  for (sf <- Seq(TestEnv.Sf001, TestEnv.Sf01)) {
    test(s"agg_approx_distinct within ${(tol * 100).toInt}% of exact at $sf") {
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
