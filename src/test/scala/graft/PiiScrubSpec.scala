package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._

/** Planted-PII semantics for `llm_pii_scrub`. The driver corpus is a
  * small-vocabulary token soup with no PII-shaped strings, so its
  * hash-verified run proves only the all-zeros path; this spec stages a
  * corpus with KNOWN emails / IPv4s / SSNs / phone numbers and pins
  * (a) the exact redacted text and per-category counts row by row, and
  * (b) Spark↔DuckDB agreement on the same staged table — the regex-engine
  * (Java vs RE2) parity that the patterns' shared-subset discipline
  * promises.
  */
class PiiScrubSpec extends GraftSpec {

  // (text, expected scrubbed, n_email, n_ip, n_ssn, n_phone)
  private val planted = Seq(
    ("contact me at alice.smith+work@example.co.uk for details",
      "contact me at [EMAIL] for details", 1L, 0L, 0L, 0L),
    ("server at 192.168.0.1 and 10.0.0.255 responded",
      "server at [IP] and [IP] responded", 0L, 2L, 0L, 0L),
    ("ssn 123-45-6789 on file",
      "ssn [SSN] on file", 0L, 0L, 1L, 0L),
    ("call (212) 555-0123 or +1 212 555 0199 today",
      "call [PHONE] or [PHONE] today", 0L, 0L, 0L, 2L),
    ("mixed: bob@x.io from 127.0.0.1 dial 555-123-4567",
      "mixed: [EMAIL] from [IP] dial [PHONE]", 1L, 1L, 0L, 1L),
    ("clean text with no identifiers at all",
      "clean text with no identifiers at all", 0L, 0L, 0L, 0L),
    // Round-10 ADVICE: a ≥10-digit run (order id) must NOT get a 10-digit
    // suffix redacted as [PHONE] — the leading (^|[^0-9]) guard pins this.
    ("order 12345678901234 shipped yesterday",
      "order 12345678901234 shipped yesterday", 0L, 0L, 0L, 0L),
    // …while a phone at the very start of the text (the ^ alternative of
    // the guard) still redacts.
    ("212-555-0123 is the number",
      "[PHONE] is the number", 0L, 0L, 0L, 1L),
    ("", "", 0L, 0L, 0L, 0L))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_pii").toString
    val rows = planted.zipWithIndex.map { case ((t, _, _, _, _, _), i) =>
      (i.toLong, t, "en", s"src${i % 3}")
    }
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("planted PII is redacted with exact placeholders and counts") {
    val out = SparkEntry.queries("llm_pii_scrub")(spark, dir)
      .collect().sortBy(_.getLong(0))
    assert(out.length == planted.size)
    for ((r, (_, scrubbed, ne, nip, nssn, nph)) <- out.zip(planted)) {
      assert(r.getString(1) == scrubbed,
        s"doc ${r.getLong(0)}: expected <$scrubbed> got <${r.getString(1)}>")
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        ((ne, nip, nssn, nph)),
        s"doc ${r.getLong(0)}: counts differ")
    }
  }

  test("planted corpus: Spark and DuckDB scrub identically") {
    val q = SparkEntry.all.find(_.name == "llm_pii_scrub").get
    Class.forName("org.duckdb.DuckDBDriver")
    val con = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = con.createStatement()
      st.execute("SET TimeZone='UTC'")
      st.execute(s"CREATE VIEW documents AS SELECT * FROM " +
        s"read_parquet('$dir/documents.parquet/*.parquet')")
      st.close()
      val (sCols, sRows) = TestEnv.sparkRows(q.fn(spark, dir))
      val (dCols, dRows) = TestEnv.duckRows(con, q.oracle.get)
      assert(sCols == dCols, "column sets differ")
      assert(sRows == dRows, "rows differ between engines")
    } finally con.close()
  }
}
