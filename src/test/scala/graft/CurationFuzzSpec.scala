package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized cross-engine parity for the text-curation rows.
  *
  * ParitySpec proves Spark==DuckDB on the driver's fixed corpus; this spec
  * proves the TOKENIZATION SEMANTICS agree beyond it — a seeded random
  * corpus salted with the inputs the fixed corpus never contains: empty
  * text, whitespace-only text, a lone token, runs of repeated spaces
  * (empty split fragments), unicode (combining bytes under md5), pure
  * punctuation, and giant single-token repetition. Any Spark↔DuckDB
  * divergence in split/filter/md5/list semantics on those inputs shows up
  * here as a row diff long before a driver corpus could trip it.
  */
class CurationFuzzSpec extends GraftSpec {

  /** Write `rows` as the corpus parquet under a fresh temp dir and hand the
    * caller a DuckDB connection with the matching `documents` view (shared
    * by both corpus tests — round-12 reuse factoring).
    */
  private def withCorpus(prefix: String, rows: Seq[(Long, String, String, String)])(
      f: (String, java.sql.Connection) => Unit): Unit = {
    val dir = Files.createTempDirectory(prefix).toString
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Class.forName("org.duckdb.DuckDBDriver")
    val con = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = con.createStatement()
      st.execute("SET TimeZone='UTC'")
      // Spark writes a part-file DIRECTORY; glob it for DuckDB.
      st.execute(s"CREATE VIEW documents AS SELECT * FROM " +
        s"read_parquet('$dir/documents.parquet/*.parquet')")
      st.close()
      f(dir, con)
    } finally con.close()
  }

  private val Queries = Seq(
    "llm_repetition", "llm_token_count", "llm_sample_stratified",
    // Bounded-vocab unigram scorer: same tokenize surface, plus the
    // top-K tie-break and the OOV coalesce-to-0 path, which the fuzz
    // corpus (>16 distinct tokens incl. unicode/punctuation) forces.
    "llm_unigram_score",
    "llm_vocab_topk", "llm_fingerprint", "llm_contamination",
    // PII scrub on the adversarial corpus: no PII-shaped strings, so both
    // engines must agree on the all-zeros path over unicode/punctuation.
    "llm_pii_scrub",
    // The 16-word fuzz vocabulary makes high-DF trigrams common, so the
    // DF cap genuinely bites on this corpus (unlike the driver's sf0.01,
    // where it is output-neutral).
    "llm_contamination_capped",
    // Composed curation pipeline: the one row that threads EVERY curation
    // surface (norm-key dedup, PII scrub, quality/repetition lambdas,
    // sample predicate) through the adversarial inputs at once — NULL
    // text keys to '' and must attribute 'quality' (no tokens, no
    // score) in both engines — exercised by the PLANTED-NULL test below,
    // not this corpus (it can't carry NULL text; see the seq_pack test's
    // note) — one-token docs must be non-repetitive without evaluating
    // the bigram lambda, empty-split fragments must not shift the dedup
    // key.
    "llm_pipeline_curate",
    // Near-dup family (round-8 verdict #4): same tokenize/md5/list
    // adversarial surface as the rows above, plus the 0/0-Jaccard edge
    // (two empty token sets) and token-less docs vanishing from the
    // SimHash fingerprint set. All four self-bound their id range
    // (doc_id < 200 / < 150), and the fuzz ids are 0..66, so the
    // all-pairs joins stay at ~2.2k pairs.
    "llm_neardup_jaccard", "llm_neardup_shingle", "llm_simhash_neardup",
    "llm_dedup_norm",
    // τ-sweep (r18): the dup-heavy fuzz sentences give every τ a live
    // pair population, the empty/whitespace docs form a multi-member
    // empty-token-set group (intra pairs at jac 1.0 with NO signature
    // row — explode of an empty tids array must drop the rep from
    // banding in Spark exactly as the 0-jaccard cross pairs fall out of
    // the oracle), and the r=2 banding must keep recall 1 on the 16-word
    // vocabulary's compressed jaccard range.
    "llm_minhash_tau_sweep",
    // Cross-split leakage (r18, second session): the fuzz corpus's
    // identical sentences form multi-member norm-key groups whose
    // members the salted split scatters across train/valid/test, so the
    // leak join genuinely fires; empty/whitespace docs all share the ''
    // key (one giant group) and NULL-less short docs exercise the
    // 8-token prefix key edge exactly as llm_dedup_norm does.
    "llm_split_leakage",
    // BPE merge training (r18, second session): the fuzz corpus's
    // unicode/punctuation tokens exercise character-level substr
    // agreement between the engines (multibyte chars must count as ONE
    // symbol on both sides), 1-char words must vanish from the pair
    // enumeration (the sequence(1,0)-descending guard), and the dup-heavy
    // sentences make the histogram weighting observable.
    "llm_bpe_merges",
    // BPE merge application (r19): the separator-string fold over the
    // SAME adversarial surface — multibyte chars must encode as ONE
    // symbol (per-char substr agreement again, now on the APPLY side),
    // 1-char words carry zero merge sites but still count one token,
    // empty/whitespace docs take the coalesce-to-0 branch, and the
    // dup-heavy sentences give the trained merges live application
    // targets so n_tokens < n_sym_before is genuinely exercised.
    "llm_bpe_apply",
    // Vocab-cached BPE application (r20): the SAME output contract as
    // llm_bpe_apply through a different plan (per-distinct-word fold +
    // occurrence join-back) — the fuzz corpus's dup-heavy sentences make
    // n_occ > 1 live, and the empty/whitespace docs take the
    // explode_outer NULL-word row instead of the map-only coalesce.
    "llm_bpe_apply_cached",
    // Tokenizer fertility (r20): the shared per-distinct-word fold grouped
    // by language — the fuzz corpus's unicode tokens make multibyte
    // symbol counting load-bearing on the per-LANG sums, empty/whitespace
    // docs exercise the zero-word language stratum (coalesce-to-0 +
    // NULL-fertility branch) through the null-safe lang join, and the
    // dup-heavy sentences make n_occ > 1 weighting observable in the
    // per-lang token totals.
    "llm_tokenizer_fertility",
    // Percentile length trim (r18, second session): the fuzz corpus's
    // giant repetition doc and empty/whitespace docs are genuine length
    // tails, and its tiny per-lang groups force the interpolation's
    // small-n frac paths (n−1 scaled by .05/.95 lands between ranks).
    "llm_outlier_docs",
    // Count-Min sketch (r18, second session): the fuzz corpus's 16-word
    // vocabulary in 16 buckets makes collisions dense, unicode tokens
    // exercise the md5 bucket hash, and most probes are ABSENT (pure
    // collision-mass estimates) — both engines must agree cell-for-cell.
    "llm_freq_sketch",
    // Per-source duplication audit (r18, second session): the fuzz
    // corpus's dup-heavy sentences and empty/whitespace ''-key group
    // spread across its src0..3 sources, so every source has a real
    // dup_rate and the ''-key collapse is cross-checked per source.
    "llm_dup_rate_by_source",
    // Directional containment (r14): the giant repetition doc is a
    // containment magnet (every "spam spam spam" shingle set contains
    // it), the short adversarial docs exercise the small-|sh(a)|
    // denominator, and symmetric dups must emit BOTH directions.
    "llm_neardup_containment",
    // Full-corpus prefix-filter containment (r15): same adversarial
    // surface as the bounded row PLUS the scale machinery's own edges —
    // the 16-word vocabulary makes hot shingles routine (prefix-filter
    // rarity ordering genuinely reorders), the repetition magnet
    // collapses to a tiny shingle set probed by everything, and
    // identical fuzz sentences form multi-member rep groups that must
    // emit both intra directions at cont = 1.0.
    "llm_containment_prefix",
    // REAL-decode rows on the adversarial corpus: sha256-derived BMP/WAV
    // containers decode for EVERY text (including empty/unicode), so the
    // JDK decoder output must match DuckDB's arithmetic recomputation
    // cell-for-cell — channel means in the decoder's accumulation order,
    // dyadic-exact PCM moments.
    "llm_image_decode", "llm_audio_decode",
    // Segment-level dedup on the adversarial corpus: segment-less docs
    // (empty / whitespace-only text) must vanish from BOTH engines, the
    // giant within-doc repetition doc collapses to few distinct segments
    // (array_distinct vs DISTINCT parity), and the duplicate-heavy fuzz
    // sentences force cross-doc ownership (n_kept < n_segs) paths.
    "llm_dedup_paragraph",
    // Sequence packing on the adversarial corpus: token-less docs (empty /
    // whitespace-only) take the NULL-block-range branch while still
    // occupying a row of the prefix sum; the giant repetition doc spans
    // many blocks; both engines must agree on the identical global
    // exclusive prefix sum computed via different plans (two-level scan vs
    // single window).
    "llm_seq_pack",
    // tf-idf keywords: the 16-word vocabulary makes score ties routine, so
    // the (score DESC, tok ASC) total order is genuinely load-bearing;
    // unicode/punctuation tokens exercise the tokenize surface.
    "llm_tfidf_topk",
    // Incremental dedup: the dup-heavy fuzz sentences put key collisions
    // on BOTH sides of the old/new split (ids 0..66 → new = 0,10,…,60),
    // forcing the dup_of_old, within-batch-dup, and clean-keep paths; the
    // empty/whitespace adversarial docs all share the md5('') key.
    "llm_dedup_incremental",
    // Mixture calculator: the fuzz corpus's src0..3 counts are uneven
    // (67 docs round-robin'd over 4 sources), so the binding-source min
    // and the rate=1 row are both exercised.
    "llm_mix_weights",
    // Per-source quota: ~17 docs per fuzz source, so the K=10 cap
    // genuinely bites on every source (unlike sf0.001's sparser strata),
    // and the md5-hex string ordering must agree across engines for
    // the kept set to hash identically.
    "llm_domain_quota",
    // Duplicate-shingle audit (r18): the dup-heavy fuzz sentences give
    // the gdf >= 2 branch a live population, token-poor docs (empty /
    // whitespace / < 3 tokens) must vanish from BOTH engines' output,
    // and the giant repetition doc's distinct-shingle collapse
    // (array_distinct vs list_distinct) must agree before the fraction.
    "llm_dupgram_fraction",
    // Duplicated-span audit (r19): the giant repetition doc is ALL
    // overlapping duplicate 5-grams (the interval-union path where every
    // position is covered many times but counts once), identical fuzz
    // sentences duplicate spans ACROSS docs, token-poor docs (< 5
    // tokens, incl. empty/whitespace/NULL via coalesce) must emit
    // n_dup_tokens = 0 rows — not vanish — in BOTH engines.
    "llm_dedup_spans",
    // Split assignment (r18): pure doc_id arithmetic — included so the
    // 90/5/5 boundaries are exercised on a doc_id range (0..66) the
    // driver corpus doesn't cover.
    "llm_split_assign",
    // BM25 (r18): the fuzz vocabulary contains NONE of the literal query
    // terms, so every score is exactly 0.0 in both engines and the
    // top-10 is decided purely by the doc_id tiebreak — the all-miss
    // path; empty/whitespace docs also pin dl = 0 through the length
    // normalization (0/avgdl, not 0/0 — avgdl > 0 on this corpus).
    "llm_bm25_search",
    // RRF fusion (r20): on the all-miss fuzz corpus BOTH rankers tie
    // every score at 0.0, so the two rank columns are decided purely by
    // the doc_id tiebreak (identical rankings — the degenerate-fusion
    // path where every doc fuses from the same rank twice), AND the
    // 67-doc corpus is smaller than K=100, so both top-K lists truncate
    // at the corpus — the small-corpus edge the fixture never hits; the
    // df=0 tf-idf guard branch is live on every doc.
    "llm_hybrid_rrf",
    // Bigram LM + fluency scoring (r18): transition-less docs (empty /
    // whitespace / one token) must vanish from the score output in BOTH
    // engines, the giant repetition doc collapses to ONE high-count
    // transition (its min_p IS that transition's smoothed P), and the
    // 16-word vocabulary compresses the probability range so the rare
    // threshold and top-20 count ties are genuinely contested.
    "llm_bigram_lm", "llm_bigram_score")

  test("random+adversarial corpus: curation rows agree with DuckDB") {
    val rnd = new Random(0xF022)
    val words = Vector("the", "héllo", "wörld", "a", "b,", "x.y", "--", "ζ",
      "token", "TOKEN", "tok", "42", "0.5", "spam", "data{}", "\\q")
    def sentence(n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val adversarial = Seq(
      "",                       // empty text → empty token list
      "   ",                    // whitespace only → all fragments filtered
      "one",                    // single token — below every n-gram guard
      "a  b   c",               // repeated spaces → empty split fragments
      "spam " * 50 + "spam",    // giant within-doc repetition
      "...!!!???",              // punctuation-only token
      "é é é é é é")            // unicode repetition
    val texts = adversarial ++ (1 to 60).map(_ => sentence(1 + rnd.nextInt(40)))
    val langs = Vector("en", "de", "zh")
    val rows = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, langs(i % langs.size), s"src${i % 4}")
    }
    withCorpus("graft_fuzz", rows) { (dir, con) =>
      for (q <- SparkEntry.all if Queries.contains(q.name); sql <- q.oracle) {
        val (sCols, sRows) = TestEnv.sparkRows(q.fn(spark, dir))
        val (dCols, dRows) = TestEnv.duckRows(con, sql)
        assert(sCols == dCols, s"${q.name}: column sets differ")
        assert(sRows.size == dRows.size,
          s"${q.name}: row counts differ spark=${sRows.size} duckdb=${dRows.size}")
        sRows.zip(dRows).zipWithIndex.foreach { case ((s, d), i) =>
          assert(s == d, s"${q.name} row $i differs:\n  spark : $s\n  duckdb: $d")
        }
      }
    }
  }

  test("stream_incr_dedup fuzz: dup keys across the split, NULL/empty props") {
    // Round-13 verdict #4: the streaming corpus-ingest dedup row shipped
    // without its fuzz row. This corpus forces the paths the driver's
    // events table never does: the SAME payload key on both sides of the
    // history/new split (dup_of_old with n_old > 1), NULL vs '' vs
    // whitespace-only props all collapsing to one key (concat_ws skips
    // NULL, normKey filters empty fragments — both engines must agree on
    // the collapsed spelling), unicode props under md5, and a fresh key
    // taking the coalesce(n_old, 0) → keep branch.
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z"))
    def t(i: Int) = new java.sql.Timestamp(t0.getTime + i * 60000L)
    val rows = Seq(
      // history side (event_id % 10 != 0)
      (1L, t(1), 7L, "click", 1.0, """{"p":"dup"}"""),
      (2L, t(2), 7L, "click", 2.0, """{"p":"dup"}"""), // key seen twice in history
      (3L, t(3), 8L, "view", 0.5, null.asInstanceOf[String]), // NULL props
      (4L, t(4), 8L, "view", 0.6, ""),                 // '' props — same key as NULL
      (5L, t(5), 9L, "buy", 3.0, "é ζ würde"),         // unicode payload
      (6L, t(6), 9L, "buy", 3.5, "   "),               // whitespace-only props
      // new batch (event_id % 10 == 0)
      (10L, t(10), 7L, "click", 1.5, """{"p":"dup"}"""), // dup_of_old, n_old=2
      (20L, t(11), 8L, "view", 0.7, null.asInstanceOf[String]), // collides w/ 3,4
      (30L, t(12), 9L, "buy", 9.0, "é ζ würde"),       // unicode dup
      (40L, t(13), 11L, "scroll", 0.1, "fresh key"),   // unseen → keep
      (50L, t(14), 9L, "buy", 0.0, ""))                // '' key = whitespace key
    val dir = Files.createTempDirectory("graft_fuzz_events").toString
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    Class.forName("org.duckdb.DuckDBDriver")
    val con = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = con.createStatement()
      st.execute("SET TimeZone='UTC'")
      st.execute(s"CREATE VIEW events AS SELECT * FROM " +
        s"read_parquet('$dir/events.parquet/*.parquet')")
      st.close()
      val q = SparkEntry.all.find(_.name == "stream_incr_dedup").get
      val (sCols, sRows) = TestEnv.sparkRows(q.fn(spark, dir))
      val (dCols, dRows) = TestEnv.duckRows(con, q.oracle.get)
      assert(sCols == dCols, "column sets differ")
      assert(sRows.size == 5 && dRows.size == 5,
        s"expected the 5 new-batch rows: spark=${sRows.size} duckdb=${dRows.size}")
      sRows.zip(dRows).zipWithIndex.foreach { case ((s, d), i) =>
        assert(s == d, s"stream_incr_dedup fuzz row $i differs:\n" +
          s"  spark : $s\n  duckdb: $d")
      }
    } finally con.close()
  }

  test("all-1-char-words corpus: BPE apply agrees on the empty merge table") {
    // r19 ADVICE: when NO word has >= 2 chars the merge table is empty.
    // Spark's collect_list over zero rows is [] and the fold returns the
    // real symbol count; DuckDB's list() is NULL, and before the oracle's
    // coalesce([]) guard the NULLed fold made n_tokens read 0 — a latent
    // cross-engine divergence the shared fuzz corpus never exercises
    // (its 16-word vocabulary always trains 20 merges). This corpus pins
    // the guard: every token is a single char (ASCII, unicode, digit), so
    // n_tokens must equal n_sym_before and chars_per_tok must read 1.0 in
    // BOTH engines.
    val rows = Seq(
      (0L, "a b c a b", "en", "src0"),
      (1L, "é ζ 7", "de", "src1"),   // 1-char multibyte symbols
      (2L, "x", "en", "src2"),       // lone token
      (3L, "", "en", "src3"),        // empty doc → coalesce-to-0 branch
      (4L, "  ", "fr", "src0"))      // whitespace-only → same branch
    withCorpus("graft_bpe_1char", rows) { (dir, con) =>
      for (name <- Seq("llm_bpe_apply", "llm_bpe_apply_cached")) {
        val q = SparkEntry.all.find(_.name == name).get
        val (sCols, sRows) = TestEnv.sparkRows(q.fn(spark, dir))
        val (dCols, dRows) = TestEnv.duckRows(con, q.oracle.get)
        assert(sCols == dCols, s"$name column mismatch")
        assert(sRows.size == 5 && dRows.size == 5,
          s"$name must emit one row per doc: spark=${sRows.size} duckdb=${dRows.size}")
        sRows.zip(dRows).zipWithIndex.foreach { case ((s, d), i) =>
          assert(s == d, s"$name 1-char-corpus row $i differs:\n" +
            s"  spark : $s\n  duckdb: $d")
        }
        // The semantic claim itself, not just parity: zero merges applied.
        val byId = q.fn(spark, dir).collect().map(r =>
          r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_sym_before"),
            r.getAs[Long]("n_tokens"))).toMap
        assert(byId(0L) == ((5L, 5L)) && byId(1L) == ((3L, 3L)) &&
          byId(2L) == ((1L, 1L)) && byId(3L) == ((0L, 0L)) &&
          byId(4L) == ((0L, 0L)),
          s"$name: with an empty merge table tokens must equal symbols: $byId")
      }
    }
  }

  test("NULL-text docs: curate attributes 'quality' and bm25 scores dl=0 in both engines") {
    // Round-18 review: size(regexp_extract_all(NULL)) is -1 under the
    // pinned non-ANSI config (n_pii would read -4 vs DuckDB's NULL) and
    // size(toksAll(NULL)) = -1 would enter bm25's Σdl while DuckDB's sum
    // skips NULL — one NULL doc would shift avgdl and poison EVERY
    // document's score. Both rows now fold NULL to '' before their text
    // stages; this planted corpus pins the fold cross-engine.
    val rows = Seq(
      (0L, "alpha beta gamma delta", "en", "src0"),
      (1L, null.asInstanceOf[String], "en", "src1"), // planted NULL text
      (2L, "alpha beta gamma delta", "en", "src2"),  // dup of 0 (norm key)
      (3L, "epsilon zeta", "fr", "src3"))
    withCorpus("graft_null_curate", rows) { (dir, con) =>
      for (name <- Seq("llm_pipeline_curate", "llm_bm25_search")) {
        val q = SparkEntry.all.find(_.name == name).get
        val (sCols, sRows) = TestEnv.sparkRows(q.fn(spark, dir))
        val (dCols, dRows) = TestEnv.duckRows(con, q.oracle.get)
        assert(sCols == dCols, s"$name column mismatch")
        assert(sRows.size == dRows.size, s"$name row-count mismatch")
        sRows.zip(dRows).zipWithIndex.foreach { case ((s, d), i) =>
          assert(s == d, s"$name NULL-corpus row $i differs:\n" +
            s"  spark : $s\n  duckdb: $d")
        }
      }
    }
  }

  test("llm_outlier_docs: an all-NULL-n_chars language drops in both engines") {
    // Round-18 ADVICE: a lang whose docs ALL have NULL n_chars got no
    // bounds row on the Spark side (the counts CTE filters NULL) but the
    // un-filtered DuckDB oracle kept the group with NULL quantiles, so
    // the inner join retained its docs with NULL outlier — a latent
    // cross-engine divergence no fixture planted. The oracle's b CTE now
    // carries the matching NOT NULL filter; this corpus plants the
    // all-NULL language ('xx': every doc NULL text → NULL n_chars) plus
    // a MIXED language ('en': one NULL doc among real lengths) so both
    // the drop-the-lang and the NULL-doc-joins-with-NULL-outlier paths
    // are pinned cross-engine.
    val rows = Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "src0"),
      (1L, "zeta", "en", "src1"),
      (2L, null.asInstanceOf[String], "en", "src2"),  // mixed-lang NULL doc
      (3L, "eta theta iota kappa", "en", "src3"),
      (4L, null.asInstanceOf[String], "xx", "src0"),  // all-NULL language
      (5L, null.asInstanceOf[String], "xx", "src1"))
    withCorpus("graft_outlier_null", rows) { (dir, con) =>
      val q = SparkEntry.all.find(_.name == "llm_outlier_docs").get
      val (sCols, sRows) = TestEnv.sparkRows(q.fn(spark, dir))
      val (dCols, dRows) = TestEnv.duckRows(con, q.oracle.get)
      assert(sCols == dCols, "llm_outlier_docs column mismatch")
      // The 'xx' docs (ids 4, 5) must vanish; the mixed-lang NULL doc
      // (id 2) must survive with NULL outlier — in BOTH engines.
      assert(sRows.size == 4 && dRows.size == 4,
        s"expected 4 surviving docs, spark=${sRows.size} duckdb=${dRows.size}")
      sRows.zip(dRows).zipWithIndex.foreach { case ((s, d), i) =>
        assert(s == d, s"llm_outlier_docs NULL-corpus row $i differs:\n" +
          s"  spark : $s\n  duckdb: $d")
      }
    }
  }

  test("llm_seq_pack: NULL-text docs count 0 tokens in both engines") {
    // Round-12 review: under the pinned non-ANSI config Spark's size(NULL)
    // is -1, which would silently shift every later doc's tok_offset while
    // DuckDB's len(NULL) = NULL drops the row from its prefix sum. The
    // declared contract is n_toks = 0 (the doc occupies a row, spans no
    // block, and shifts nothing) — this corpus plants a NULL mid-stream so
    // a regression breaks every doc after it, not just the NULL row. (The
    // shared fuzz corpus can't carry NULL text: other rows' oracles have
    // their own NULL-text semantics out of this row's scope.)
    val rows = Seq(
      (0L, "alpha beta gamma", "en", "src0"),
      (1L, null.asInstanceOf[String], "en", "src1"), // planted NULL text
      (2L, "delta " * 40 + "delta", "en", "src2"),   // spans blocks
      (3L, "", "en", "src3"),                        // empty ≠ NULL, same 0
      (4L, "epsilon zeta", "en", "src0"))
    withCorpus("graft_seqpack_null", rows) { (dir, con) =>
      val q = SparkEntry.all.find(_.name == "llm_seq_pack").get
      val (sCols, sRows) = TestEnv.sparkRows(q.fn(spark, dir))
      val (dCols, dRows) = TestEnv.duckRows(con, q.oracle.get)
      assert(sCols == dCols)
      assert(sRows.size == 5 && dRows.size == 5)
      sRows.zip(dRows).zipWithIndex.foreach { case ((s, d), i) =>
        assert(s == d, s"llm_seq_pack NULL-corpus row $i differs:\n" +
          s"  spark : $s\n  duckdb: $d")
      }
    }
  }
}
