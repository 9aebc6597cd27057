package graft

/** Physical-plan pins: the 100 TB-shaped claims in query comments, made
  * executable. The round-2 verdict's central finding was plans drifting
  * from their design comments (a fact table silently broadcast, an SMJ
  * claim executing as BHJ); this suite fails the build when the executed
  * plan stops being the claimed plan.
  *
  * Assertions plan (without executing) on sf0.01 — the driver's gate scale,
  * so a size-threshold-dependent strategy flip between sf0.001 and sf0.01
  * cannot slip past the pins; they check STRUCTURE (operator
  * presence/absence), never timings.
  */
class PlanAuditSpec extends GraftSpec {

  /** Every pin renders plans with maxToStringFields raised (round-8 ADVICE,
    * closed round 10): Spark truncates long expression trees in plan
    * strings ("... N more fields"), so a needle whose rendering happened to
    * truncate would silently pass an absence assertion or fail a presence
    * one. Rendering-only conf — safe to set on the shared session.
    */
  private def untruncated(s: org.apache.spark.sql.SparkSession): Unit =
    s.conf.set("spark.sql.debug.maxToStringFields", "100000")

  private def plan(name: String): String = {
    untruncated(spark)
    SparkEntry.queries(name)(spark, TestEnv.Sf01)
      .queryExecution.executedPlan.toString
  }

  /** Plan `name` in a child session with auto-broadcast DISABLED: at
    * threshold -1 only broadcast() hints produce a BroadcastExchange, so
    * the plan shows exactly which sides the code PROMISES are bounded —
    * sf0.01's everything-fits-in-10MB sizes can no longer mask a
    * corpus-bound hint (round-9 verdict #1). newSession() scopes the conf
    * (own SQLConf, shared context), so parallel suites keep their plans.
    */
  private def planNoAutoBroadcast(name: String): String = {
    val s = spark.newSession()
    untruncated(s)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // The LSH/IVF builders persist() intermediates and the CacheManager is
    // shared + dedupes by logical plan, so an entry registered earlier by a
    // default-conf suite would hand this pin the OLD compile (auto-BHJ) via
    // the embedded InMemoryRelation print. Clear first so registration
    // happens under the pinned conf; parallel suites merely recompute.
    s.sharedState.cacheManager.clearCache()
    SparkEntry.queries(name)(s, TestEnv.Sf01)
      .queryExecution.executedPlan.toString
  }

  private def assertHas(name: String, needle: String): Unit = {
    val p = plan(name)
    assert(p.contains(needle), s"$name: expected $needle in plan:\n${p.take(2000)}")
  }

  private def assertNot(name: String, needle: String): Unit = {
    val p = plan(name)
    assert(!p.contains(needle), s"$name: must NOT contain $needle:\n${p.take(2000)}")
  }

  test("no query plans a CartesianProduct except the declared bounded cross join") {
    for (q <- SparkEntry.all.map(_.name)
         if q != "join_cross" && !q.startsWith("stream_")) {
      assertNot(q, "CartesianProduct")
    }
  }

  test("join_shuffle_inner executes as the pinned sort-merge join") {
    assertHas("join_shuffle_inner", "SortMergeJoin")
  }

  test("join_multiway_q5 keeps fact-to-fact joins sort-merge (no fact broadcast)") {
    assertHas("join_multiway_q5", "SortMergeJoin")
  }

  test("join_theta_range keeps its equi-key SMJ with the range as post-filter") {
    assertHas("join_theta_range", "SortMergeJoin")
    assertNot("join_theta_range", "BroadcastNestedLoopJoin")
  }

  test("join_broadcast_inner broadcasts the dimension side") {
    assertHas("join_broadcast_inner", "BroadcastHashJoin")
  }

  test("topk_limit plans as TakeOrderedAndProject (no global sort)") {
    assertHas("topk_limit", "TakeOrderedAndProject")
  }

  test("scan_project_filter pushes predicates and prunes columns at the parquet scan") {
    val p = plan("scan_project_filter")
    assert(p.contains("PushedFilters: [IsNotNull") || p.contains("PushedFilters: ["),
      "expected pushed filters")
    assert(!p.contains("l_comment"), "pruned column must not be read")
    // 5 projected columns only
    assert("ReadSchema: [^\\n]*l_orderkey".r.findFirstIn(p).isDefined)
  }

  test("stream_static_anti broadcasts the suppression index as an anti join") {
    // Static suppression index is dimension-scale by contract and hinted;
    // the batch plan of the same transform must show a broadcast LeftAnti
    // (an unhinted shuffle anti would re-shuffle the stream every batch).
    val df = graft.streaming.StreamOps.staticSuppress(
      Tables.events(spark, TestEnv.Sf01), Tables.customer(spark, TestEnv.Sf01))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast anti join:\n${p.take(1500)}")
  }

  test("stream_incr_dedup shuffle-joins the corpus-scale index, no broadcast") {
    // The one stream-static row where broadcast would be WRONG: the static
    // side is the ingest-history key index (corpus-scale by contract, like
    // llm_dedup_incremental's old side), so under auto-broadcast-off the
    // batch form of the same transform must show a SHUFFLE left join with
    // ZERO BroadcastExchanges — a hint here would ship 10¹⁰⁺ keys to every
    // executor per micro-batch.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.debug.maxToStringFields", "100000")
    val ev = Tables.events(s, TestEnv.Sf01)
    val df = graft.streaming.StreamOps.incrementalDedup(
      ev, graft.streaming.StreamOps.incrementalIndex(ev))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastExchange"),
      s"the ingest-history index must never broadcast:\n${p.take(3000)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"membership must be a shuffle join on the digest:\n${p.take(3000)}")
  }

  test("stream_static_join broadcasts the static dimension") {
    // Static side is wrapped in broadcast() in StreamOps.staticEnrich; the
    // batch plan of the same transform must show it.
    val df = graft.streaming.StreamOps.staticEnrich(
      Tables.events(spark, TestEnv.Sf01), Tables.customer(spark, TestEnv.Sf01))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast enrich:\n${p.take(1500)}")
  }

  test("llm_dedup_exact is a single hash-shuffle aggregation (partial + final)") {
    val p = plan("llm_dedup_exact")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial+final agg expected")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "dedup must not join")
  }

  test("llm_ann_ivf broadcasts centroids and vector attachments") {
    val p = plan("llm_ann_ivf")
    assert("BroadcastExchange".r.findAllIn(p).size >= 3,
      "centroids (x2 uses) and vector attachments must broadcast")
  }

  test("llm_ann_ivf materializes the embeddings scan once (no per-use re-scan)") {
    // Round-4 verdict #2: the quantizer-sizing count() must share one scan
    // with the pipeline. After the persist() fix every use is an
    // InMemoryTableScan leaf and the query tree holds ZERO direct parquet
    // scans — the single real scan lives inside the one cached relation.
    // (Tree walk, not string match: every InMemoryTableScan PRINT embeds
    // the cached child plan, so string-counting sees phantom scans.)
    val leaves = SparkEntry.queries("llm_ann_ivf")(spark, TestEnv.Sf01)
      .queryExecution.sparkPlan.collectLeaves()
    val parquet = leaves.count(_.getClass.getSimpleName.contains("FileSourceScan"))
    val cached = leaves.count(_.getClass.getSimpleName.contains("InMemoryTableScan"))
    assert(cached >= 5, s"expected all embeddings uses cached, got $cached")
    assert(parquet == 0,
      s"expected zero direct parquet scans (one shared cached scan), got $parquet")
  }

  test("join_part_q14 keeps the part⋈lineitem join sort-merge (part is fact-sized at scale)") {
    assertHas("join_part_q14", "SortMergeJoin")
  }

  test("llm_sim_cosine_topk ends in per-partition top-k, not a global sort of all pairs") {
    assertHas("llm_sim_cosine_topk", "TakeOrderedAndProject")
  }

  test("window queries partition by their keys (no single-partition global windows)") {
    for (q <- Seq("win_rank", "win_lag_lead", "win_frame_rows", "win_topn_group")) {
      val p = plan(q)
      assert(!p.contains("SinglePartition"),
        s"$q must not collapse to a single partition:\n${p.take(1200)}")
    }
  }

  test("full-corpus explodes do not re-tokenize below the Generate (r8 pathology)") {
    // InferFiltersFromGenerate + pushdown substitutes the exploded array
    // expression into a Filter below the projection, re-running the whole
    // tokenize/gram pipeline per document (measured 2× CPU — 3.1 s → 1.3 s
    // on llm_contamination at sf0.1). These rows use explode_outer so the
    // inferred filter never exists; this pin fails if a refactor brings
    // the double evaluation back in any form.
    // Needles: the EXPENSIVE stage that must never appear in a Filter.
    // llm_contamination keeps an explicit (cheap, required) size(toks)>=3
    // guard in its scan filter — Spark's sequence(1, n) turns descending
    // for n < 1 — so its needle is the trigram assembly, not the split.
    // (plan() renders untruncated — see the helper — so a reintroduced
    // inferred filter cannot hide behind "... N more fields".)
    val needles = Seq(
      "fn_array" -> "split(",
      "llm_vocab_topk" -> "split(",
      "llm_unigram_score" -> "split(",
      "llm_contamination" -> "array_join(")
    for ((q, needle) <- needles) {
      val dup = plan(q).linesIterator
        .filter(l => l.contains("Filter") && l.contains(needle))
      assert(dup.isEmpty,
        s"$q re-evaluates the expensive pipeline in a Filter:\n${dup.mkString("\n")}")
    }
  }

  test("per-doc map-only rows shuffle once at most (the oracle-ordering sort)") {
    // llm_repetition, llm_sample_stratified, and llm_pii_scrub claim ZERO
    // corpus shuffles; the only Exchange allowed is the rangepartitioning
    // for the final deterministic orderBy.
    for (q <- Seq("llm_repetition", "llm_sample_stratified", "llm_pii_scrub",
        "llm_image_decode", "llm_image_decode_var", "llm_audio_decode",
        "llm_emb_quant", "llm_split_assign")) {
      val exchanges = plan(q).linesIterator.filter(_.contains("Exchange")).toList
      assert(exchanges.size <= 1 && exchanges.forall(_.contains("rangepartitioning")),
        s"$q must be map-only up to the output sort, got:\n${exchanges.mkString("\n")}")
    }
  }

  test("llm_pipeline_curate: one corpus scan, one dedup exchange, no joins") {
    // The composed curation pipeline's 100 TB claim: the dedup verdict's
    // hash exchange on the normalized key is the ONLY corpus-scale
    // shuffle; scrub/quality/repetition/sample stack as per-row lambdas
    // on the same scan (plus the oracle-ordering range exchange), and no
    // stage joins or broadcasts anything.
    val p = plan("llm_pipeline_curate")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toList
    assert(exchanges.size == 2 &&
      exchanges.count(_.contains("hashpartitioning")) == 1 &&
      exchanges.count(_.contains("rangepartitioning")) == 1,
      s"expected exactly one dedup hash exchange + the output sort, got:\n${exchanges.mkString("\n")}")
    assert(p.linesIterator.count(_.contains("FileScan")) == 1,
      "pipeline must read the corpus once")
    assert(!p.contains("Join"), s"no stage may join:\n${p.take(1500)}")
  }

  test("llm_dupgram_fraction: the gram-frequency side shuffle-joins, never broadcasts") {
    // The shingle-DF table is CORPUS-scale (the corpus's shingle
    // vocabulary — same boundedness class as llm_dedup_incremental's
    // index side); broadcasting it is the 100 TB anti-pattern the design
    // comment rules out. At threshold -1 only a hint could broadcast, so
    // absence here pins the promise.
    val p = planNoAutoBroadcast("llm_dupgram_fraction")
    assert(!p.contains("BroadcastExchange"),
      s"gram-frequency side must never broadcast:\n${p.take(2000)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"expected a shuffled gram join:\n${p.take(2000)}")
  }

  test("llm_bigram_score: the bigram table shuffle-joins, never broadcasts") {
    // The LM table is vocabulary²-scale (corpus-bound at web scale —
    // the tfidf anti-pattern argument); only the scalar V row may
    // broadcast. At threshold -1 any other BroadcastExchange would be a
    // corpus-bound hint.
    val p = planNoAutoBroadcast("llm_bigram_score")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"expected shuffled transition⋈LM join:\n${p.take(2000)}")
    val bx = p.linesIterator.count(_.contains("BroadcastExchange"))
    assert(bx <= 1, s"only the scalar V row may broadcast, got $bx:\n${p.take(2000)}")
  }

  test("llm_bm25_search: single-row stats broadcast, no shuffle join, top-k heaps") {
    // The corpus stats (N, Σdl, per-term df) reduce to ONE row — the only
    // legitimate broadcast; per-doc tf/dl are map-side lambdas and the
    // top-10 must plan as TakeOrderedAndProject heaps, so the row is two
    // scans + zero shuffle joins at any corpus size.
    val p = planNoAutoBroadcast("llm_bm25_search")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrderedAndProject:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no corpus-scale shuffle join allowed:\n${p.take(2000)}")
    assert(p.contains("BroadcastExchange"),
      s"the single-row stats must broadcast:\n${p.take(2000)}")
  }

  test("real-decode rows run the decode expression exactly once per row") {
    // CollapseProject substituting the feature array into its 7-8 getItem
    // consumers would run the full ImageIO / javax.sound decode that many
    // times per row; the two-step projection must survive optimization.
    for ((q, needle) <- Seq("llm_image_decode" -> "(?i)imagefeatures".r,
        "llm_image_decode_var" -> "(?i)imagefeatures".r,
        "llm_audio_decode" -> "(?i)audiofeatures".r)) {
      val n = needle.findAllIn(plan(q)).size
      assert(n == 1, s"$q: decode expression appears $n times in the plan (want 1)")
    }
  }

  test("minhash candidate distinct adds no exchange above the pair reshard") {
    // Round-9 replaced the packed-long candidate key with a two-column
    // (a_rep, b_rep) distinct (round-8 verdict #1: the packing collided rep
    // ids >= 2^32). The design comment (LlmQueries lshRepGraph step 4)
    // claims the change costs no extra shuffle: repartition(a_rep) already
    // satisfies the distinct's ClusteredDistribution (a_rep is a subset of
    // the grouping keys), so the ~6x per-band pair multiplicity collapses
    // WITHIN the reshard stage and no per-pair row ever crosses the wire.
    // Pin the exact stage shape: final + partial HashAggregate on the pair,
    // then the expansion Generate, then the REPARTITION_BY_COL exchange —
    // with no Exchange between the aggregates and the Generate. Anchors are
    // operator-header lines (never expression interiors), so plan-string
    // truncation (round-8 ADVICE caveat) cannot blind this pin.
    val lines = plan("llm_neardup_minhash").linesIterator.toVector
    def pairAgg(l: String) =
      l.contains("HashAggregate(keys=[a_rep#") && l.contains(", b_rep#") &&
        l.contains("functions=[]")
    val i = lines.indexWhere(pairAgg)
    assert(i >= 0, "candidate-distinct HashAggregate on (a_rep, b_rep) not found")
    assert(pairAgg(lines(i + 1)),
      s"expected back-to-back partial+final pair aggregates, got:\n${lines(i + 1)}")
    val gen = lines.indexWhere(_.contains("Generate explode(rest#"), i + 2)
    assert(gen >= 0, "pair-expansion Generate not found below the distinct")
    val between = lines.slice(i + 2, gen).filter(_.contains("Exchange"))
    assert(between.isEmpty,
      s"candidate distinct must not add a shuffle, got:\n${between.mkString("\n")}")
    assert(lines(gen + 1).contains("Exchange hashpartitioning(a_rep#") &&
      lines(gen + 1).contains("REPARTITION_BY_COL"),
      s"expected the a_rep reshard directly under the Generate:\n${lines(gen + 1)}")
  }

  test("LSH verify stage never broadcasts the reps side (corpus-bound at 10⁹ docs)") {
    // Round-9 verdict #1: broadcast(ga)/broadcast(gb) in lshRepGraph's
    // verify join shipped ALL reps with their full token-id arrays — reps
    // ≈ docs on a mostly-unique corpus, so that is the tokenized corpus on
    // the driver. sf0.01 can't see it (auto-broadcast picks BHJ for KB
    // tables either way), so the pin plans with auto-broadcast OFF: only
    // hints broadcast there, and the verify joins must surface as shuffle
    // joins on a_rep / b_rep. The ONLY hinted broadcasts in the whole
    // pair-list query are the three answer-bound member re-attachments
    // (semi-join-reduced ca/cb + the gsize>1 intra side) — pin the exact
    // count so a reintroduced corpus-bound hint fails loudly.
    val p = planNoAutoBroadcast("llm_neardup_minhash")
    assert("SortMergeJoin(?:[^\\n]*) \\[a_rep#".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin(?:[^\\n]*) \\[a_rep#".r.findFirstIn(p).isDefined,
      s"verify join on a_rep must shuffle, not broadcast:\n${p.take(3000)}")
    assert("SortMergeJoin(?:[^\\n]*) \\[b_rep#".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin(?:[^\\n]*) \\[b_rep#".r.findFirstIn(p).isDefined,
      s"verify join on b_rep must shuffle, not broadcast:\n${p.take(3000)}")
    val hinted = p.linesIterator.count(_.contains("BroadcastExchange"))
    assert(hinted == 3,
      s"expected exactly the 3 answer-bound hinted broadcasts, got $hinted:\n" +
        p.linesIterator.filter(_.contains("BroadcastExchange")).mkString("\n"))
  }

  test("llm_unigram_score joins the corpus map-side against K-bounded broadcasts") {
    // The scale contract: the exploded-token stream joins the vocab table
    // and the one-row total ONLY via hint-backed broadcasts (both bounded
    // by construction — top-K limit / single row), so with auto-broadcast
    // off the plan must still show exactly those BroadcastExchanges and
    // the corpus side must never reach a shuffle join.
    val p = planNoAutoBroadcast("llm_unigram_score")
    assert("BroadcastExchange".r.findAllIn(p).size == 2,
      s"expected exactly the vocab + total broadcasts:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus side must not shuffle-join:\n${p.take(3000)}")
    // TakeOrderedAndProject: the vocab top-K must be heap-based, not a
    // global sort of the full vocabulary.
    assert(p.contains("TakeOrderedAndProject"),
      s"vocab top-K must plan as TakeOrderedAndProject:\n${p.take(3000)}")
  }

  test("subq_exists_corr decorrelates to one semi join, no nested loop") {
    // The correlated EXISTS (equi + non-equi correlated predicate) must
    // rewrite to a single left-semi join — a BroadcastNestedLoopJoin here
    // would mean the decorrelator failed and the plan re-scans lineitem
    // per outer row at fact scale.
    val p = plan("subq_exists_corr")
    assert(p.contains("LeftSemi"),
      s"expected the decorrelated left-semi join:\n${p.take(2000)}")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"correlated EXISTS must not plan as a nested loop:\n${p.take(2000)}")
  }

  test("llm_mix_weights: ONE corpus scan, targets the only broadcast") {
    // The scale contract (TextQueries comment): a single corpus scan and
    // count shuffle; total + feasibility are window aggregates over the
    // #sources-bounded post-join table, so under auto-broadcast-off the
    // only BroadcastExchange is the target list and nothing shuffle-joins.
    // The scan-count pin is the load-bearing one — the first cut computed
    // the two globals as separate agg branches and re-scanned the corpus
    // three times.
    val p = planNoAutoBroadcast("llm_mix_weights")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"corpus must be scanned exactly once:\n${p.take(3000)}")
    assert("BroadcastExchange".r.findAllIn(p).size == 1,
      s"expected exactly the target-list broadcast:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"nothing may shuffle-join (all non-corpus sides are bounded):\n${p.take(3000)}")
  }

  test("llm_dedup_incremental shuffle-joins the corpus index, no broadcast") {
    // The scale contract (LlmQueries comment): BOTH sides of the
    // membership join are corpus-scale (the old index AND the daily
    // batch), so under auto-broadcast-off the left join on the digest must
    // be a shuffle join with ZERO BroadcastExchanges anywhere.
    val p = planNoAutoBroadcast("llm_dedup_incremental")
    assert(!p.contains("BroadcastExchange"),
      s"neither join side may broadcast (both corpus-scale):\n${p.take(3000)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"membership must be a shuffle join on the digest:\n${p.take(3000)}")
  }

  test("llm_seq_pack prefix-sums three-level: no window input grows with N") {
    // The scale contract (TextQueries comment; deepened round 21 per the
    // r20 verdict): the corpus-wide exclusive prefix sum must NOT plan as
    // one global window partition, and since round 21 the BUCKET table's
    // own scan is two-level too — the N/W-row bucket cumsum previously
    // ran as ONE unpartitioned window whose input grew with N. Exactly
    // three Window nodes: doc-level PARTITIONED by bkt (≤W rows), bucket-
    // level PARTITIONED by sbkt (≤W rows), and the only unpartitioned one
    // consuming the N/W²-row super-bucket table (≤W rows until N > W³ =
    // 10¹⁸ docs at the production W = 10⁶). Both offset tables broadcast
    // (bounded by construction); the corpus side never shuffle-joins.
    val p = planNoAutoBroadcast("llm_seq_pack")
    assert("Window \\[".r.findAllIn(p).size == 3,
      s"expected exactly the three-level scan's three Window nodes:\n${p.take(3000)}")
    assert("windowspecdefinition\\(bkt#\\d+L?, doc_id#".r.findFirstIn(p).isDefined,
      s"doc-level cumsum must be PARTITIONED by bkt (a corpus-wide " +
        s"unpartitioned window is the classic scale-killer):\n${p.take(3000)}")
    assert("windowspecdefinition\\(sbkt#\\d+L?, bkt#".r.findFirstIn(p).isDefined,
      s"bucket-level cumsum must be PARTITIONED by sbkt (its input is " +
        s"N/W rows — corpus-growing):\n${p.take(3000)}")
    assert("BroadcastExchange".r.findAllIn(p).size == 2,
      s"expected exactly the two offset-table broadcasts:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus side must not shuffle-join the bucket offsets:\n${p.take(3000)}")
  }

  test("llm_tfidf_topk shuffle-joins the vocab; rank-limit pushes down") {
    // The scale contract (TextQueries comment): df is corpus-bound (web
    // vocabularies run 10^9+ tokens), so tf⋈df must SHUFFLE-join on tok
    // under auto-broadcast-off; the only hinted broadcast is the
    // single-row n_docs total; and the row_number ≤ K filter must plan as
    // WindowGroupLimit (per-partition heaps) so no document's full
    // vocabulary survives to the window sort.
    val p = planNoAutoBroadcast("llm_tfidf_topk")
    assert("SortMergeJoin(?:[^\\n]*) \\[tok#".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin(?:[^\\n]*) \\[tok#".r.findFirstIn(p).isDefined,
      s"tf⋈df must shuffle-join on tok (vocab is corpus-bound):\n${p.take(3000)}")
    assert("BroadcastExchange".r.findAllIn(p).size == 1,
      s"expected exactly the single-row n_docs broadcast:\n${p.take(3000)}")
    assert(p.contains("WindowGroupLimit"),
      s"row_number ≤ K must push down as WindowGroupLimit:\n${p.take(3000)}")
  }

  test("llm_domain_quota caps push down as WindowGroupLimit heaps") {
    // The scale contract (TextQueries comment): rk ≤ K must plan as
    // WindowGroupLimit so each input partition keeps only its top-K per
    // source BEFORE the exchange — without it, a few-huge-sources corpus
    // serializes into a handful of window partitions. Nothing in the row
    // may broadcast (it is a single-input window query).
    val p = planNoAutoBroadcast("llm_domain_quota")
    assert(p.contains("WindowGroupLimit"),
      s"rk <= K must push down as WindowGroupLimit:\n${p.take(3000)}")
    assert(!p.contains("BroadcastExchange"),
      s"single-input window query must not broadcast:\n${p.take(3000)}")
  }

  test("llm_neardup_cosine_lsh buckets by band; verify never broadcasts the corpus") {
    // The scale contract (VectorQueries comment): signatures are map-only
    // over the rep-collapsed vectors (planes are plan literals — no
    // joins), pair generation joins on the (band_idx, band_val) bucket
    // key CARRYING rep vectors + norms so the verify runs inline
    // (round-14 A/B; the distinct-then-attach form was 25× slower at 10×
    // staging) — both bucket-join inputs are corpus-bound, so the ONLY
    // BroadcastExchanges allowed under auto-broadcast-off are the three
    // answer-bound member re-attachments of the round-15 expansion
    // (semi-join-reduced ca/cb + the gsize>1 intra side — exactly
    // llm_neardup_minhash's stage-6 pin). Distinct plan_ids, because the
    // cached chunks/verified subtrees re-PRINT their build plan at every
    // InMemoryRelation reference.
    val p = planNoAutoBroadcast("llm_neardup_cosine_lsh")
    assert("SortMergeJoin(?:[^\\n]*)band_".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin(?:[^\\n]*)band_".r.findFirstIn(p).isDefined,
      s"pair generation must join on the band bucket key:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"),
      s"no all-pairs fallback anywhere in the LSH plan:\n${p.take(3000)}")
    val hinted = p.linesIterator.filter(_.contains("BroadcastExchange"))
      .flatMap("plan_id=(\\d+)".r.findFirstMatchIn(_).map(_.group(1)))
      .toSet
    assert(hinted.size == 3,
      s"expected exactly the 3 answer-bound hinted broadcasts, got ${hinted.size}:\n" +
        p.linesIterator.filter(_.contains("BroadcastExchange")).mkString("\n"))
  }

  test("llm_containment_prefix: df and verify shuffle; only expansion broadcasts") {
    // The scale contract (TextQueries comment): the df table is
    // vocabulary-scale and the reps sides are corpus-scale, so the
    // rarity-ranking join on sid, the candidate prefix⋈index join on sid,
    // and both verify attachments on a_rep/b_rep must all SHUFFLE under
    // auto-broadcast-off; the ONLY hinted broadcasts are the three
    // answer-bound member re-attachments of the expansion (the minhash
    // stage-6 pin). No cartesian anywhere.
    val p = planNoAutoBroadcast("llm_containment_prefix")
    for (key <- Seq("sid", "a_rep", "b_rep")) {
      assert(s"SortMergeJoin(?:[^\\n]*) \\[$key#".r.findFirstIn(p).isDefined ||
        s"ShuffledHashJoin(?:[^\\n]*) \\[$key#".r.findFirstIn(p).isDefined,
        s"$key join must shuffle, not broadcast:\n${p.take(3000)}")
    }
    assert(!p.contains("CartesianProduct"),
      s"no all-pairs fallback in the prefix-filter plan:\n${p.take(3000)}")
    val hinted = p.linesIterator.filter(_.contains("BroadcastExchange"))
      .flatMap("plan_id=(\\d+)".r.findFirstMatchIn(_).map(_.group(1)))
      .toSet
    assert(hinted.size == 3,
      s"expected exactly the 3 answer-bound hinted broadcasts, got ${hinted.size}:\n" +
        p.linesIterator.filter(_.contains("BroadcastExchange")).mkString("\n"))
  }

  test("llm_knn_graph scores inline over the band bucket join; top-k pushes down") {
    // The scale contract (VectorQueries comment, round 15): candidates
    // come from the SRP signature table's SELF-join on the
    // (band_idx, band_val) bucket key with vectors CARRIED (zero
    // re-attach joins, zero broadcasts — the query side IS the corpus),
    // the ≤8× per-band candidate multiplicity collapses in ONE
    // (q_id, n_id) hash aggregation with a map-side partial, and the
    // per-q top-3 must plan as WindowGroupLimit heaps so no bucket's
    // full candidate list survives to the sort.
    val p = planNoAutoBroadcast("llm_knn_graph")
    assert("SortMergeJoin(?:[^\\n]*)band_".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin(?:[^\\n]*)band_".r.findFirstIn(p).isDefined,
      s"candidates must come from the band bucket self-join:\n${p.take(3000)}")
    assert(!p.contains("BroadcastExchange"),
      s"corpus-bound sides must never broadcast:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"),
      s"no all-pairs fallback in the graph plan:\n${p.take(3000)}")
    assert("HashAggregate\\(keys=\\[q_id#(?:[^\\n]*), n_id#".r
      .findFirstIn(p).isDefined,
      s"multi-band duplicates must collapse in one (q_id, n_id) agg:\n${p.take(3000)}")
    assert(p.contains("WindowGroupLimit"),
      s"nn_rank <= 3 must push down as WindowGroupLimit:\n${p.take(3000)}")
  }

  test("llm_kmeans_update shuffle-joins q with cell; one linear (c_id, dim) agg") {
    // The scale contract (VectorQueries comment): the quantized-vector
    // table and the cell assignment are BOTH corpus-bound, so their join
    // on vec_id must SHUFFLE under auto-broadcast-off (the only allowed
    // BroadcastExchanges are the hier index's bounded hinted tables —
    // sups / c2s); the centroid update itself is one hash aggregation on
    // (c_id, dim) with a map-side partial so the 64-rows-per-vector
    // explode collapses before the exchange.
    val p = planNoAutoBroadcast("llm_kmeans_update")
    assert("SortMergeJoin(?:[^\\n]*) \\[vec_id#".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin(?:[^\\n]*) \\[vec_id#".r.findFirstIn(p).isDefined,
      s"q ⋈ cell must shuffle on vec_id, not broadcast:\n${p.take(3000)}")
    assert("BroadcastHashJoin(?:[^\\n]*) \\[vec_id#".r.findFirstIn(p).isEmpty,
      s"corpus-bound vec_id sides must never broadcast:\n${p.take(3000)}")
    val aggs = p.linesIterator
      .filter(l => l.contains("HashAggregate(keys=[c_id#") && l.contains("dim#"))
      .size
    assert(aggs >= 2,
      s"expected partial+final (c_id, dim) aggregates:\n${p.take(3000)}")
  }

  test("llm_cluster_sample broadcasts only the centroid table; top-K pushes down") {
    // The scale contract (VectorQueries comment): the centroid table is
    // ncells×64 (index-scale), so its hinted broadcast must survive
    // auto-broadcast-off; the corpus-bound q ⋈ cell join must SHUFFLE on
    // vec_id; and the per-cell rk ≤ 8 must plan as WindowGroupLimit
    // heaps so no cell's full member list survives to the sort.
    val p = planNoAutoBroadcast("llm_cluster_sample")
    assert("BroadcastHashJoin(?:[^\\n]*) \\[c_id#".r.findFirstIn(p).isDefined,
      s"centroid attachment must be the hinted broadcast join:\n${p.take(3000)}")
    assert("SortMergeJoin(?:[^\\n]*) \\[vec_id#".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin(?:[^\\n]*) \\[vec_id#".r.findFirstIn(p).isDefined,
      s"q ⋈ cell must shuffle on vec_id:\n${p.take(3000)}")
    assert("BroadcastHashJoin(?:[^\\n]*) \\[vec_id#".r.findFirstIn(p).isEmpty,
      s"corpus-bound vec_id sides must never broadcast:\n${p.take(3000)}")
    assert(p.contains("WindowGroupLimit"),
      s"rk <= 8 must push down as WindowGroupLimit:\n${p.take(3000)}")
  }

  test("llm_diversity_prune broadcasts only the centroid table; keep-list stays linear") {
    // The scale contract (VectorQueries comment): same stage shapes as
    // llm_cluster_sample — index-scale centroid table broadcast (hinted,
    // survives auto-broadcast-off), corpus-bound q ⋈ cell shuffles on
    // vec_id, never broadcasts. No WindowGroupLimit pin here ON PURPOSE:
    // every vector is emitted with its keep flag (the linear keep-list
    // contract), so there is no limit to push down — the pin instead
    // guards that the rank and the cell-count ride Window nodes, not a
    // self-join re-scan of the corpus.
    val p = planNoAutoBroadcast("llm_diversity_prune")
    assert("BroadcastHashJoin(?:[^\\n]*) \\[c_id#".r.findFirstIn(p).isDefined,
      s"centroid attachment must be the hinted broadcast join:\n${p.take(3000)}")
    assert("SortMergeJoin(?:[^\\n]*) \\[vec_id#".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin(?:[^\\n]*) \\[vec_id#".r.findFirstIn(p).isDefined,
      s"q ⋈ cell must shuffle on vec_id:\n${p.take(3000)}")
    assert("BroadcastHashJoin(?:[^\\n]*) \\[vec_id#".r.findFirstIn(p).isEmpty,
      s"corpus-bound vec_id sides must never broadcast:\n${p.take(3000)}")
    assert("Window ".r.findAllIn(p).size >= 1 && !p.contains("CartesianProduct"),
      s"rank/count must be window passes, no cartesian:\n${p.take(3000)}")
  }

  test("llm_minhash_tau_sweep: gsize joins shuffle, only the 1-row total broadcasts") {
    // The scale contract (LlmQueries comment): gs is corpus-bound (one
    // row per distinct token set), so attaching group sizes to the
    // verified pairs must SHUFFLE on a_rep/b_rep under auto-broadcast-off
    // — hinting gs would be the corpus-bound broadcast anti-pattern. The
    // ONLY promised-bounded broadcast is the one-row corpus total behind
    // frac_linked (the llm_mix_weights pattern). The τ explode multiplies
    // only answer-bound rows, so nothing else may materialize a
    // cartesian.
    val p = planNoAutoBroadcast("llm_minhash_tau_sweep")
    assert("BroadcastExchange".r.findAllIn(p).size == 1,
      s"expected exactly the one-row total broadcast:\n${p.take(3000)}")
    assert("SortMergeJoin(?:[^\\n]*) \\[a_rep#".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin(?:[^\\n]*) \\[a_rep#".r.findFirstIn(p).isDefined,
      s"gsize attachment must shuffle on a_rep:\n${p.take(3000)}")
    assert("BroadcastHashJoin(?:[^\\n]*) \\[a_rep#".r.findFirstIn(p).isEmpty &&
      "BroadcastHashJoin(?:[^\\n]*) \\[b_rep#".r.findFirstIn(p).isEmpty,
      s"corpus-bound rep sides must never broadcast:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian anywhere in the sweep:\n${p.take(3000)}")
  }

  test("llm_dedup_semantic final assembly is one answer-bound broadcast") {
    // The loop's internals are pinned via the shared pieces (srp rep-pair
    // generation by the cosine_lsh pin; the label loop is the cluster
    // row's extracted machinery). What is pinned here is the final
    // assignment: rep-collapsed chunks ⟕ labels — labels is answer-bound
    // (one row per DISTINCT vector with ≥1 edge, round 15), so its hinted
    // broadcast must survive auto-broadcast-off, the member expansion
    // must not shuffle-JOIN anywhere, and the only shuffles are the
    // chunks build's own two linear corpus exchanges (groupBy(v, chunk) +
    // the window over v — both keyed on the vector value) plus the
    // output orderBy. Distinct plan_ids: the cached chunks subtree
    // re-prints its build at every InMemoryRelation reference.
    val p = planNoAutoBroadcast("llm_dedup_semantic")
    assert("BroadcastHashJoin(?:[^\\n]*) \\[rep_id#".r.findFirstIn(p).isDefined,
      s"labels attachment must be the hinted broadcast join:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"final assembly must not shuffle-join:\n${p.take(3000)}")
    // Exchange classification, not a count: the cached chunks subtree is
    // compiled once by the eager label loop and RE-printed with fresh
    // plan_ids at the final assembly's InMemoryTableScan, so ids don't
    // dedupe the prints — but every non-broadcast exchange must still be
    // either the output orderBy or a chunks-build shuffle keyed on the
    // VECTOR VALUE (groupBy(v, chunk) / the window over v). A shuffle
    // keyed on members/comp/rep_id here would mean the expansion or the
    // label attach regressed to a corpus-wide join exchange.
    val exchanges = p.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("Broadcast")).toList
    assert(exchanges.exists(_.contains("rangepartitioning(vec_id")),
      s"output-order Exchange missing:\n${exchanges.mkString("\n")}")
    // REPARTITION_BY_NUM on vec_id is the round-21 conditional scan
    // spread (Tables.spread — absent at production scale where scans are
    // already wide), not a corpus-wide join exchange.
    assert(exchanges.forall(l => l.contains("rangepartitioning(vec_id") ||
      (l.contains("hashpartitioning(vec_id") && l.contains("REPARTITION_BY_NUM")) ||
      (l.contains("hashpartitioning") &&
        (l.contains("(v#") || l.contains("transform(v#")))),
      s"every hash exchange must be the rep-collapse build (keyed on the vector):\n" +
        exchanges.mkString("\n"))
  }

  test("llm_dedup_paragraph shuffles linearly; ownership never broadcasts") {
    // The scale contract (LlmQueries comment): within-doc dedup is
    // map-side (array_distinct before the explode — exactly ONE Generate,
    // no re-run of the segment pipeline in a Filter), and the ownership
    // table is corpus-bound, so with auto-broadcast off the join-back on
    // the segment hash must be a SHUFFLE join with ZERO BroadcastExchanges
    // anywhere in the plan.
    val p = planNoAutoBroadcast("llm_dedup_paragraph")
    assert(!p.contains("BroadcastExchange"),
      s"ownership table must never broadcast (corpus-bound):\n${p.take(3000)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"join-back on h must be a shuffle join:\n${p.take(3000)}")
    assert("Generate ".r.findAllIn(p).size <= 2, // seg is referenced twice
      s"segment pipeline must not be re-expanded beyond its two consumers:\n${p.take(3000)}")
    val dup = p.linesIterator.filter(l => l.contains("Filter") && l.contains("slice("))
    assert(dup.isEmpty,
      s"segment pipeline re-evaluated in a Filter:\n${dup.mkString("\n")}")
  }

  test("IVF rerank tail never broadcasts the full embeddings table") {
    // Round-9 verdict #1: broadcast(nb) re-attached candidate vectors by
    // broadcasting every corpus vector — multi-TB at 10¹⁰ × 64-d. With
    // auto-broadcast off, the hinted (promised-bounded) sides are the
    // √N centroids and the explicitly probeMax-filtered query vectors;
    // candidate re-attachment must shuffle-join on n_id.
    for (q <- Seq("llm_ann_ivf", "llm_knn_bucketed", "llm_ann_hier",
        "llm_knn_hier")) {
      val p = planNoAutoBroadcast(q)
      assert("SortMergeJoin(?:[^\\n]*) \\[n_id#".r.findFirstIn(p).isDefined ||
        "ShuffledHashJoin(?:[^\\n]*) \\[n_id#".r.findFirstIn(p).isDefined,
        s"$q: candidate re-attachment on n_id must shuffle, not broadcast:\n${p.take(3000)}")
      assert("BroadcastHashJoin(?:[^\\n]*) \\[q_id#".r.findFirstIn(p).isDefined,
        s"$q: probe-bound query-vector attachment should stay broadcast:\n${p.take(3000)}")
    }
  }

  test("join_q21_waiting: self-join legs shuffle on l_orderkey, top-20 as heaps") {
    // The late set is fact-scale at 100 TB — broadcasting it into the
    // semi/anti legs is the multi-TB mistake; under threshold=-1 only the
    // hinted supplier dimension may broadcast, both self-join legs must
    // be shuffle joins, and the final top-20 must plan as a heap.
    val p = planNoAutoBroadcast("join_q21_waiting")
    val selfJoins = "SortMergeJoin [^\\n]*Left(Semi|Anti)".r.findAllIn(p).size +
      "ShuffledHashJoin [^\\n]*Left(Semi|Anti)".r.findAllIn(p).size
    assert(selfJoins == 2,
      s"both semi/anti self-join legs must shuffle, found $selfJoins:\n${p.take(3000)}")
    assert("BroadcastExchange".r.findAllIn(p).size == 1,
      s"only the supplier dimension may broadcast:\n${p.take(3000)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must plan as TakeOrderedAndProject:\n${p.take(3000)}")
    // Round 22 (r21 verdict #1): the threshold=-1 view above only shows
    // what the code PROMISES is bounded; the r21 driver's 52.6 s 32-core
    // boot came from the DEFAULT session, where AQE's runtime estimates
    // sat near the broadcast threshold and flipped the fact legs to
    // 600k-row broadcasts boot-nondeterministically. The legs now carry
    // hint("merge") (a logical-plan hint, so AQE's replanning honors it
    // too) — pin the default-session plan: both self-join legs SMJ, the
    // late-derivation orders join SMJ, supplier the only broadcast.
    val pd = plan("join_q21_waiting")
    val defSelf = "SortMergeJoin [^\\n]*Left(Semi|Anti)".r.findAllIn(pd).size
    assert(defSelf == 2,
      s"default session: semi/anti legs must be SMJ (merge-hinted), found $defSelf:\n${pd.take(3000)}")
    assert("BroadcastExchange".r.findAllIn(pd).size == 1,
      s"default session: only the supplier dimension may broadcast:\n${pd.take(3000)}")
  }

  test("llm_bpe_merges: vocab-bound after the word histogram, top-k as heaps") {
    // The histogram-weighting claim: after the one corpus-scale word agg,
    // everything is vocab/alphabet-bound — no join anywhere (a join would
    // mean the pair stage re-touches the corpus), and the merge ranking
    // must plan as TakeOrderedAndProject heaps, not a global sort.
    val p = plan("llm_bpe_merges")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 merges must plan as TakeOrderedAndProject:\n${p.take(3000)}")
    assert(!p.contains("Join"),
      s"no join belongs in the BPE count pipeline:\n${p.take(3000)}")
  }

  test("join_skew_salted: the join keys on (event_type, salt), not event_type alone") {
    // The whole demonstration is the widened key: the SMJ (merge-hinted,
    // so sf-scale auto-broadcast can't erase it) must list the salt in
    // its join keys and the exchanges must hash-partition on it — a
    // 5-value event_type partitioning is the straggler the row exists
    // to prevent.
    val p = plan("join_skew_salted")
    assert("SortMergeJoin \\[event_type#\\d+, salt#\\d+L?\\]".r.findFirstIn(p).isDefined,
      s"the SMJ must key on (event_type, salt):\n${p.take(3000)}")
    assert("hashpartitioning\\(event_type#\\d+, salt#\\d+L?".r.findFirstIn(p).isDefined,
      s"the shuffle must partition on the salted key:\n${p.take(3000)}")
  }

  test("join_eps_band: binning makes the theta join an equi shuffle join") {
    // The naive ε-join is a CartesianProduct (the global pin forbids it);
    // the binned form must plan as an EQUI join on bin with both sides
    // shuffled — both are corpus-bound, so no broadcast under
    // threshold=-1.
    val p = planNoAutoBroadcast("join_eps_band")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the binned join must not be a product:\n${p.take(3000)}")
    assert(!p.contains("BroadcastExchange"),
      s"neither corpus-bound side may broadcast:\n${p.take(3000)}")
    assert("(SortMergeJoin|ShuffledHashJoin) \\[bin#".r.findFirstIn(p).isDefined,
      s"the join must be an equi join on bin:\n${p.take(3000)}")
  }

  test("llm_split_leakage: the train-key join shuffles, neither side broadcasts") {
    // Both join inputs are corpus-bound (eval docs ~10% of corpus, train
    // keys up to 90%) — a broadcast on either side is the multi-TB
    // mistake; under threshold=-1 the key join must plan as a shuffle
    // join with the train side already reduced to one row per key.
    val p = planNoAutoBroadcast("llm_split_leakage")
    assert(!p.contains("BroadcastExchange"),
      s"no side of the leak join may broadcast (both corpus-bound):\n${p.take(3000)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"the key join must shuffle:\n${p.take(3000)}")
  }

  test("llm_pq_codes: one corpus exchange (the min_by agg), codebook broadcast") {
    // The codebook is M·K = 128 rows BY CONSTRUCTION — the broadcast must
    // survive auto-broadcast-off (it is hinted, i.e. promised bounded);
    // the N·M·K scored expansion must collapse map-side, leaving exactly
    // one hash exchange (the (vec_id, m) agg) plus the oracle-ordering
    // range exchange.
    val p = planNoAutoBroadcast("llm_pq_codes")
    assert(p.contains("BroadcastExchange"),
      s"codebook must broadcast under threshold=-1:\n${p.take(3000)}")
    // Round 21: the conditional scan spread (Tables.spread,
    // REPARTITION_BY_NUM on vec_id) hash-partitions the cached vectors by
    // vec_id, which already satisfies the (vec_id, m) code agg's
    // clustered distribution — so the agg needs NO exchange of its own
    // (guide §2.4, two operations sharing one partitioning). Allow either
    // that fused shape (0 non-spread hash exchanges) or the standalone
    // agg exchange (1, when the scan is wide enough that spread is a
    // no-op); anything more is a regression.
    val hashEx = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("REPARTITION_BY_NUM"))
    assert(hashEx <= 1,
      s"expected at most 1 hash exchange (the code agg), got $hashEx:\n${p.take(3000)}")
    // Round-22 ADVICE: 0 non-spread hash exchanges is only the CLAIMED
    // fused shape when the spread's hashpartitioning(vec_id) repartition
    // is actually present to justify it — otherwise a vanished agg
    // exchange would pass unnoticed.
    if (hashEx == 0) {
      assert("REPARTITION_BY_NUM".r.findFirstIn(p).isDefined &&
        "hashpartitioning\\(vec_id#\\d+L".r.findFirstIn(p).isDefined,
        s"0 agg exchanges requires the spread's vec_id repartition in-plan:\n${p.take(3000)}")
    }
  }

  test("llm_pq_search: ADC scores via broadcast dt, corpus codes never broadcast") {
    // The distance tables are PqProbeMax·M·K rows (hinted, bounded); the
    // corpus-side code rows must reach the join map-side so the partial
    // collect_list collapses to one row per (q, vec) BEFORE the only
    // corpus exchange; top-10 per query must prune as WindowGroupLimit
    // heaps before the window exchange.
    val p = planNoAutoBroadcast("llm_pq_search")
    assert("BroadcastHashJoin".r.findAllIn(p).nonEmpty,
      s"dt attachment must be a broadcast hash join:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join belongs in the ADC scan:\n${p.take(3000)}")
    assert(p.contains("WindowGroupLimit"),
      s"top-k must prune as WindowGroupLimit heaps:\n${p.take(3000)}")
  }

  test("llm_ann_ivfpq: cell membership shuffles, only index-scale sides broadcast") {
    // probes ⋈ cell on c_id carries the FULL corpus on the cell side —
    // broadcasting it is the multi-TB mistake the ivfKnn discipline
    // forbids; under threshold=-1 it must plan as a shuffle join. The
    // hinted broadcasts (centroids, codebook, distance tables) all stay.
    val p = planNoAutoBroadcast("llm_ann_ivfpq")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"cell membership must shuffle-join:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"),
      s"the hinted index-scale sides should broadcast:\n${p.take(3000)}")
    assert(p.contains("WindowGroupLimit"),
      s"top-k must prune as WindowGroupLimit heaps:\n${p.take(3000)}")
  }

  test("llm_bpe_apply: map-only application past ONE broadcast merge array") {
    // The apply claim: the trained merge table collapses to one array row
    // (alphabet²-bound BY CONSTRUCTION) and attaches to the corpus scan as
    // a hinted broadcast nested-loop of that single row; everything
    // downstream is per-doc lambda work. Under threshold=-1 that must be
    // the ONLY BroadcastExchange, and no shuffle join may appear anywhere
    // (training is join-free per the llm_bpe_merges pin; a shuffle join
    // here would mean the apply side re-touches the corpus).
    val p = planNoAutoBroadcast("llm_bpe_apply")
    assert("BroadcastExchange".r.findAllIn(p).size == 1,
      s"exactly the merge-array row may broadcast:\n${p.take(3000)}")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row merge array must attach as BNLJ:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no shuffle join belongs in BPE apply:\n${p.take(3000)}")
  }

  test("llm_bpe_apply_cached: per-word fold, vocab join-back SHUFFLES") {
    // The cached claim: the fold runs once per DISTINCT word (the word
    // set attaches the ONE broadcast merge-array row exactly like the
    // map-only row), and the per-word token counts come back to the
    // (doc_id, word) occurrence table through a SHUFFLE join — a
    // web-scale vocabulary is corpus-derived and unbounded, so under
    // threshold=-1 broadcasting it would be the 100 TB anti-pattern.
    // The only BroadcastExchange allowed is the merge array.
    val p = planNoAutoBroadcast("llm_bpe_apply_cached")
    assert("BroadcastExchange".r.findAllIn(p).size == 1,
      s"exactly the merge-array row may broadcast:\n${p.take(3000)}")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row merge array must attach as BNLJ:\n${p.take(3000)}")
    assert("SortMergeJoin [^\\n]*LeftOuter".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin [^\\n]*LeftOuter".r.findFirstIn(p).isDefined,
      s"the vocab join-back must be a shuffled left-outer join:\n${p.take(3000)}")
  }

  test("llm_pq_train: qv joins codes by SHUFFLE, only the codebook broadcasts") {
    // The M-step joins two CORPUS-bound sides (quantized vectors ⋈ code
    // assignments) on vec_id — the kmeans_update discipline: a broadcast
    // of either would ship the corpus to every executor. Under
    // threshold=-1 the only BroadcastExchange allowed is the 128-row seed
    // codebook inside the E-step's assignment expansion.
    val p = planNoAutoBroadcast("llm_pq_train")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"qv ⋈ codes must be a shuffle join:\n${p.take(3000)}")
    assert("BroadcastExchange".r.findAllIn(p).size == 1,
      s"only the M·K codebook may broadcast:\n${p.take(3000)}")
  }

  test("llm_dedup_spans: the dup-gram set shuffle-joins, never broadcasts") {
    // The gram-frequency side is corpus-vocabulary-scale (same contract
    // as llm_dupgram_fraction's df side): under threshold=-1 the join
    // back must SHUFFLE with zero BroadcastExchanges, and the covered-
    // position count must aggregate as a count(distinct) whose partials
    // dedup map-side (two-phase HashAggregate), not via a global sort.
    val p = planNoAutoBroadcast("llm_dedup_spans")
    assert(!p.contains("BroadcastExchange"),
      s"the dup-gram set must never broadcast:\n${p.take(3000)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"the gram join back must be a shuffle join:\n${p.take(3000)}")
  }

  test("subq_recursive_cte: breadth-parallel recursion, orders filter pushed down") {
    // The recursion must plan as Spark's level-synchronous loop operator
    // (UnionLoop — one distributed step per month level, never a
    // per-customer nested loop), and the o_custkey < 100 bound must reach
    // the orders scan as a pushed filter so the corpus-bound side prunes
    // before the aggregations.
    val p = plan("subq_recursive_cte")
    assert(p.contains("UnionLoop"),
      s"recursion must plan as the UnionLoop operator:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop shape belongs in the recursion:\n${p.take(3000)}")
    assert("PushedFilters: \\[[^\\]]*LessThan\\(o_custkey,100\\)".r
      .findFirstIn(p).isDefined,
      s"the customer bound must push into the orders scan:\n${p.take(4000)}")
  }

  test("subq_recursive_graph: UnionLoop closure, bounded scans, hops guard") {
    // The closure must plan as the level-synchronous UnionLoop (one
    // distributed frontier⋈edges join per level, never a per-node nested
    // loop), the hops cycle guard must gate the recursive reference, and
    // the key bounds must reach the ROLLUP join-back scan as pushed
    // filters — that bound is what makes the join-back side answer-bound
    // (broadcastable at any corpus size) instead of corpus-scale; the
    // edge scans inside the loop carry the same bounds as Filters on the
    // logical Relations, pushed when each iteration replans.
    val p = plan("subq_recursive_graph")
    assert(p.contains("UnionLoop"),
      s"closure must plan as the UnionLoop operator:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop shape belongs in the closure:\n${p.take(3000)}")
    assert("PushedFilters: \\[[^\\]]*LessThan\\(c_custkey,1000\\)".r
      .findFirstIn(p).isDefined,
      s"the key bound must push into the rollup join-back scan:\n${p.take(5000)}")
    assert("c_custkey#\\d+L? >= 3".r.findFirstIn(p).isDefined &&
      "c_custkey#\\d+L? < 1000".r.findFirstIn(p).isDefined,
      s"the key bounds must reach the edge scans:\n${p.take(4000)}")
    assert("hops#\\d+L? < 12".r.findFirstIn(p).isDefined,
      s"the cycle guard must gate the recursive reference:\n${p.take(4000)}")
  }

  test("stream_outer_join: left-outer by shuffle, neither event side broadcast") {
    // Batch form of the S15 transform: both sides are the corpus-scale
    // event stream, so under threshold=-1 the left join must shuffle on
    // the user key with ZERO BroadcastExchanges — the same state-shuffle
    // shape the streaming symmetric-hash join partitions by.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.debug.maxToStringFields", "100000")
    val p = graft.streaming.StreamOps.purchaseClickLeftJoin(
      Tables.events(s, TestEnv.Sf01)).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastExchange"),
      s"neither event side may broadcast:\n${p.take(3000)}")
    assert(("SortMergeJoin [^\\n]*LeftOuter".r.findFirstIn(p).isDefined ||
        "ShuffledHashJoin [^\\n]*LeftOuter".r.findFirstIn(p).isDefined),
      s"expected a shuffled LeftOuter join:\n${p.take(3000)}")
  }

  test("stream_full_outer: full-outer by shuffle, neither event side broadcast") {
    // Batch form of the S16 transform: like S15, both sides are the
    // corpus-scale event stream, so under threshold=-1 the full join must
    // shuffle on the user key with ZERO BroadcastExchanges — the same
    // two-sided state-shuffle shape the streaming symmetric-hash join
    // partitions by (a broadcast full-outer does not even exist in Spark;
    // the pin guards against a nested-loop fallback too).
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.debug.maxToStringFields", "100000")
    val p = graft.streaming.StreamOps.purchaseClickFullJoin(
      Tables.events(s, TestEnv.Sf01)).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastExchange"),
      s"neither event side may broadcast:\n${p.take(3000)}")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"no nested-loop shape belongs in the full join:\n${p.take(3000)}")
    assert(("SortMergeJoin [^\\n]*FullOuter".r.findFirstIn(p).isDefined ||
        "ShuffledHashJoin [^\\n]*FullOuter".r.findFirstIn(p).isDefined),
      s"expected a shuffled FullOuter join:\n${p.take(3000)}")
  }

  test("win_session_batch: ONE corpus exchange — windows and session agg share it") {
    // The sessionization contract: the lag window, the cumsum window, and
    // the (user_id, session_id) aggregate all run on the single
    // hashpartitioning(user_id) exchange — the windows share one sort, and
    // the groupBy's clustering requirement is subset-satisfied by the
    // window's user_id partitioning, so no second hash exchange may appear
    // (the only other Exchange is the oracle-ordering range partition).
    // Event-time work is µs-BIGINT, so the scan reads exactly the three
    // columns the session needs.
    val p = plan("win_session_batch")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"lag window, cumsum window and session agg must share ONE hash exchange:\n${p.take(3000)}")
    assert("Window \\[".r.findAllIn(p).size == 2,
      s"expected exactly the lag and cumsum windows:\n${p.take(3000)}")
    assert(p.contains("partial_count"),
      s"the session aggregate must combine map-side (partial agg):\n${p.take(3000)}")
    assert("ReadSchema: struct<event_id:bigint,ts:[^,>]*,user_id:bigint>".r
      .findFirstIn(p).isDefined,
      s"the events scan must prune to (event_id, ts, user_id):\n${p.take(3000)}")
  }

  test("agg_mode: distinct-value-bound count, WindowGroupLimit pick, no collection") {
    // The deterministic-mode contract: the corpus stage is a map-side
    // partial (nation, segment) count — DISTINCT-VALUE-bound state, never
    // a per-group value collection (no collect_list/collect_set anywhere)
    // — and the rn=1 pick over the aggregated table plans as a
    // WindowGroupLimit heap, the top-k shape, not a full sort-and-filter.
    val p = plan("agg_mode")
    assert(p.contains("partial_count"),
      s"the (nation, segment) count must combine map-side:\n${p.take(3000)}")
    assert(p.contains("WindowGroupLimit"),
      s"the rn=1 pick must plan as a WindowGroupLimit heap:\n${p.take(3000)}")
    assert(!p.contains("collect_list") && !p.contains("collect_set"),
      s"mode must never collect group values:\n${p.take(3000)}")
    assert("ReadSchema: struct<c_nationkey:int,c_mktsegment:string>".r
      .findFirstIn(p).isDefined,
      s"the customer scan must prune to (nationkey, mktsegment):\n${p.take(3000)}")
  }

  test("fn_pivot: explicit-values pivot compiles to distinct-value-bound aggs") {
    // The native-pivot contract: with EXPLICIT pivot values (the only
    // scale-correct overload — pivot(col) alone collects the distinct
    // values at the driver before planning) the pivot disappears at
    // analysis into a two-level aggregate: a map-side-partial
    // (user, event_type) count, then a pivotfirst agg keyed on user —
    // both states distinct-value-bound, no per-group collection, and the
    // scan pruned to the two columns the pivot touches.
    val p = plan("fn_pivot")
    assert(p.contains("partial_count"),
      s"the (user, type) count must combine map-side:\n${p.take(3000)}")
    assert(p.contains("pivotfirst"),
      s"the explicit-values pivot must compile to pivotfirst aggs:\n${p.take(3000)}")
    assert(!p.contains("collect_list") && !p.contains("collect_set"),
      s"pivot must never collect group values:\n${p.take(3000)}")
    assert("ReadSchema: struct<user_id:bigint,event_type:string>".r
      .findFirstIn(p).isDefined,
      s"the events scan must prune to (user_id, event_type):\n${p.take(3000)}")
  }

  test("llm_tokenizer_fertility: vocab sides shuffle, only the merge array broadcasts") {
    // The fertility contract inherits llm_bpe_apply_cached's discipline:
    // the per-distinct-word fold attaches the ONE broadcast merge-array
    // row (BNLJ of a 1-row side), the occ ⋈ word-tokens join and the
    // null-safe lang join-back both SHUFFLE (vocabulary and language
    // strata are corpus-derived — broadcasting either is the 100 TB
    // anti-pattern), and every aggregate combines map-side.
    val p = planNoAutoBroadcast("llm_tokenizer_fertility")
    assert("BroadcastExchange".r.findAllIn(p).size == 1,
      s"exactly the merge-array row may broadcast:\n${p.take(3000)}")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row merge array must attach as BNLJ:\n${p.take(3000)}")
    assert("SortMergeJoin \\[w#\\d+\\], \\[w#\\d+\\], Inner".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin \\[w#\\d+\\], \\[w#\\d+\\], Inner".r.findFirstIn(p).isDefined,
      s"the occ ⋈ word-tokens join must shuffle on w:\n${p.take(3000)}")
    assert("SortMergeJoin [^\\n]*LeftOuter".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin [^\\n]*LeftOuter".r.findFirstIn(p).isDefined,
      s"the lang join-back must be a shuffled left-outer join:\n${p.take(3000)}")
    assert(p.contains("partial_sum") && p.contains("partial_count"),
      s"the histogram and lang aggregates must combine map-side:\n${p.take(3000)}")
  }

  test("llm_pagerank: pure shuffle rounds — scores and edges never broadcast") {
    // Every join side in the fixpoint (scores, edges, degree counts) is
    // corpus-scale by contract: broadcasting any of them ships the graph
    // to every executor and caps it at driver memory. Under threshold=-1
    // the plan must be pure shuffle rounds — zero BroadcastExchange, a
    // shuffled contribution join per round, exactly four shuffled
    // left-outer per-node join-backs (one per damped iteration), and no
    // nested-loop shape anywhere.
    val p = planNoAutoBroadcast("llm_pagerank")
    assert(!p.contains("BroadcastExchange"),
      s"nothing in the fixpoint may broadcast:\n${p.take(3000)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"the contribution joins must shuffle:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop shape belongs in the fixpoint:\n${p.take(3000)}")
    assert("(SortMergeJoin|ShuffledHashJoin) [^\\n]*LeftOuter".r
      .findAllIn(p).size == 4,
      s"four damped rounds = four per-node join-backs:\n${p.take(4000)}")
  }

  test("llm_hybrid_rrf: top-K heaps, no corpus shuffle, K-bound fusion join") {
    // The production RRF shape: each ranker contributes its TOP-K list
    // via a TakeOrderedAndProject heap (never a global sort), ranks are
    // window-assigned WITHIN the K-row lists (single-partition exchanges
    // are answer-bound by the preceding limit), and the fusion join is
    // the K-row full-outer SMJ. The corpus itself never hash-shuffles:
    // its only joins are the 1-row stats BNLJ attach, and the two score
    // columns come from ONE persisted pass.
    val p = planNoAutoBroadcast("llm_hybrid_rrf")
    assert("TakeOrderedAndProject".r.findAllIn(p).size == 3,
      s"two top-100 ranker heaps + the fused top-10 heap:\n${p.take(3000)}")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the corpus must never hash-shuffle in this row:\n${p.take(3000)}")
    assert("SortMergeJoin [^\\n]*FullOuter".r.findFirstIn(p).isDefined,
      s"the fusion join is the K-bound full-outer SMJ:\n${p.take(3000)}")
    assert(!p.contains("ShuffledHashJoin") &&
      "SortMergeJoin".r.findAllIn(p).size == 1,
      s"no corpus-scale join may appear beyond the fusion join:\n${p.take(3000)}")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row stats must attach as BNLJ:\n${p.take(3000)}")
  }
}
