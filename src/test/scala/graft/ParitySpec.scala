package graft

/** DuckDB-oracle parity suite (SURVEY §5.2(1)) — the local replica of the
  * driver's correctness gate. Every `SparkEntry.queries` entry that declares
  * an `oracleSql` is executed by both engines on sf0.001 and compared
  * row-by-row with columns sorted by name, values canonicalized the same way
  * on both sides. A red test here means a red driver CORRECTNESS row, so
  * this suite is the commit gate (rule R6).
  *
  * sf0.001 keeps `sbt test` fast; `tools/run_verify.sh` + `tools/parity.py`
  * remain the sf0.01 pre-push check (same compare, driver-identical
  * type-sensitive semantics).
  */
class ParitySpec extends GraftSpec {
  private lazy val con = TestEnv.duck(TestEnv.Sf001)

  for (q <- SparkEntry.all; sql <- q.oracle) {
    test(s"parity: ${q.name}") {
      val (sCols, sRows) = TestEnv.sparkRows(q.fn(spark, TestEnv.Sf001))
      val (dCols, dRows) = TestEnv.duckRows(con, sql)
      assert(sCols == dCols, s"column sets differ: $sCols vs $dCols")
      assert(sRows.size == dRows.size,
        s"row counts differ: spark=${sRows.size} duckdb=${dRows.size}")
      sRows.zip(dRows).zipWithIndex.foreach { case ((s, d), i) =>
        assert(s == d, s"row $i differs:\n  spark : $s\n  duckdb: $d")
      }
    }
  }

  test("every declared query either has an oracle or is a documented no-oracle op") {
    // The only rows allowed to omit oracleSql are approx/sketch/streaming
    // ops (engine-specific results); keep the list explicit so a forgotten
    // oracle fails loudly instead of silently downgrading the driver check.
    val allowedNoOracle = SparkEntry.all.filter(_.oracle.isEmpty).map(_.name).toSet
    val expected = allowedNoOracle.forall(n =>
      n.startsWith("agg_approx") || n.startsWith("stream_"))
    assert(expected, s"undocumented no-oracle queries: $allowedNoOracle")
  }
}
