package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Planted-semantics checks for the round-8 curation rows (known-answer
  * corpora built in place; the DuckDB hash equivalence is ParitySpec's
  * job).
  *
  * `llm_contamination` (the asymmetric benchmark-decontamination row): a
  * corpus document embedding an exact
  * ≥5-token span of a benchmark document shares ≥3 trigrams and MUST be
  * flagged against exactly that benchmark doc; a corpus document sharing
  * fewer than 3 trigrams must NOT be. The DuckDB hash equivalence is
  * ParitySpec's job — this spec pins the SEMANTICS on a corpus where the
  * ground truth is known by construction, and the plan shape (benchmark
  * side broadcast, no corpus-side shuffle join) that the query's 100 TB
  * comment claims.
  */
class ContaminationSpec extends GraftSpec {

  test("planted benchmark span is flagged; sub-threshold overlap is not") {
    val dir = Files.createTempDirectory("graft_contam").toString
    val benchText = "zebra quokka wombat capisce xylophone quince jackal"
    val rows = Seq(
      // doc_id % 20 == 0 → the benchmark side.
      (20L, benchText, "en", "bench"),
      // Embeds a 5-token exact span of the benchmark doc → 3 shared
      // trigrams ("quokka wombat capisce", "wombat capisce xylophone",
      // "capisce xylophone quince") → flagged.
      (21L, "intro words quokka wombat capisce xylophone quince outro", "en", "train"),
      // Shares only a 4-token span → 2 shared trigrams → below k=3.
      (22L, "padding quokka wombat capisce xylophone padding end", "en", "train"),
      // No overlap at all.
      (23L, "completely different tokens here nothing shared with bench", "en", "train"))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("llm_contamination")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((21L, 20L, 3L)),
      s"expected exactly the planted (21,20,3) contamination hit, got ${got.toSeq}")
  }

  test("DF cap: a stopword-like gram stops counting toward contamination") {
    val dir = Files.createTempDirectory("graft_contam_cap").toString
    // Benchmark doc 40 has 4 trigrams. Doc 41 embeds the full span (4
    // shared grams -> flagged uncapped). Docs 42..47 each carry the
    // "s1 s2 s3 s4" prefix, pushing the corpus DF of trigrams "s1 s2 s3"
    // and "s2 s3 s4" to 7 > DfCap=5, so the capped query drops both and
    // doc 41 falls to 2 shared grams — below k=3, unflagged. The planted
    // docs themselves share only those 2 (now-dropped) grams, so they are
    // never flagged either way.
    val rows = Seq((40L, "s1 s2 s3 s4 s5 s6", "en", "bench"),
      (41L, "intro s1 s2 s3 s4 s5 s6 outro", "en", "train")) ++
      (42L to 47L).map(i => (i, s"s1 s2 s3 s4 filler$i tail$i", "en", "train"))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val uncapped = SparkEntry.queries("llm_contamination")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(uncapped == Seq((41L, 40L, 4L)),
      s"uncapped must flag the planted span with all 4 grams, got $uncapped")
    val capped = SparkEntry.queries("llm_contamination_capped")(spark, dir)
      .collect().toSeq
    assert(capped.isEmpty,
      s"with the two high-DF grams dropped, doc 41 shares only 2 grams and " +
        s"must fall below k=3, got $capped")
  }

  test("repetition metrics: planted extremes land exactly") {
    val dir = Files.createTempDirectory("graft_rep").toString
    val rows = Seq(
      // All-identical tokens: top_tok_frac = 1, top_bigram_frac = 1,
      // distinct_ratio = 1/10, repetitive.
      (1L, Seq.fill(10)("spam").mkString(" "), "en", "t"),
      // All-distinct tokens (every bigram also unique): top_tok_frac =
      // 1/10, top_bigram_frac = 1/9, distinct_ratio = 1 — 1/9 > 0.08 and
      // 1/10 < 0.12, so the bigram rule alone flags it (10 tokens is
      // below the scale where the thresholds are meaningful; the planted
      // point only pins the arithmetic, not the policy).
      (2L, (1 to 10).map(i => s"w$i").mkString(" "), "en", "t"))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("llm_repetition")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    assert(got == Seq(
      (1L, 1.0, 1.0, 0.1, true),
      (2L, 0.1, 1.0 / 9.0, 1.0, true)),
      s"planted repetition extremes mismatch: $got")
  }

  test("plan: benchmark gram side broadcasts; corpus side never shuffle-joins") {
    for (q <- Seq("llm_contamination", "llm_contamination_capped")) {
      val p = SparkEntry.queries(q)(spark, TestEnv.Sf001)
        .queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"$q: benchmark grams must broadcast, plan:\n${p.take(2000)}")
      assert(!p.contains("SortMergeJoin"),
        s"$q: the 100 TB corpus side must not shuffle to join, plan:\n${p.take(2000)}")
    }
  }
}
