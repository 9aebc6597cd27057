package graft

import java.nio.file.{Files, Paths}

/** Ledger pins (round 15, r14 verdict #3): three rounds running, a query
  * count drifted in prose somewhere (README round 13, README again round
  * 14, the test-harness paragraph round 15's predecessor) — so the counts
  * are now asserted against the code, making drift a test failure instead
  * of a per-round chore. Pinned:
  *
  *   - README.md "N declared operators"        == SparkEntry.all.size
  *   - README.md "M of them hash-verified"     == SparkEntry.oracleSql.size
  *   - SURVEY §2.2.1 "N declared queries, M DuckDB-hash-verified" — same
  *
  * The specs run from the repo root (sbt's working dir), so the prose
  * files resolve relative to it; if a file is missing (a packaged-jar
  * consumer running the suite elsewhere) the case cancels rather than
  * fails — the pin is for THIS repo's governance, not the library API.
  */
class GovernanceSpec extends GraftSpec {

  private def read(name: String): Option[String] = {
    val p = Paths.get(name)
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  test("README.md operator counts match SparkEntry") {
    val txt = read("README.md")
    assume(txt.isDefined, "README.md not found relative to the test cwd")
    val declared = "(\\d+) declared operators".r
      .findFirstMatchIn(txt.get).map(_.group(1).toInt)
    assert(declared.contains(SparkEntry.all.size),
      s"README declares $declared operators, code has ${SparkEntry.all.size}")
    val verified = "(\\d+) of them hash-verified".r
      .findFirstMatchIn(txt.get).map(_.group(1).toInt)
    assert(verified.contains(SparkEntry.oracleSql.size),
      s"README claims $verified hash-verified, code has ${SparkEntry.oracleSql.size} oracle rows")
  }

  test("SURVEY §2.2.1 totals match SparkEntry") {
    val txt = read("SURVEY.md")
    assume(txt.isDefined, "SURVEY.md not found relative to the test cwd")
    val m = "Totals: \\*\\*(\\d+) declared queries, (\\d+) DuckDB-hash-verified\\*\\*".r
      .findFirstMatchIn(txt.get)
    assert(m.isDefined, "SURVEY §2.2.1 Totals line not found — keep its exact shape")
    assert(m.get.group(1).toInt == SparkEntry.all.size,
      s"SURVEY declares ${m.get.group(1)} queries, code has ${SparkEntry.all.size}")
    assert(m.get.group(2).toInt == SparkEntry.oracleSql.size,
      s"SURVEY claims ${m.get.group(2)} hash-verified, code has ${SparkEntry.oracleSql.size}")
  }

  test("every declared query name is unique and every oracle has a query") {
    val names = SparkEntry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate declared query names: $dups")
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet),
      "oracleSql contains keys with no matching query")
  }
}
