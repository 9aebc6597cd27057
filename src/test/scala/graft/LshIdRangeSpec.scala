package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Round-8 verdict #1: the LSH candidate distinct must be correct for doc
  * ids ≥ 2³². Round 8 packed each candidate pair into one long
  * ((a_rep << 32) | b_rep), which silently bled rep ids past 2³² into the
  * neighbor's bit-field — wrong pairs at exactly the 10⁹–10¹⁰-doc scale the
  * dedup family targets. The fix is a two-column (a_rep, b_rep) distinct;
  * this spec pins it with a synthetic corpus whose doc_ids straddle 2³²
  * (and 2³³), asserting the full near-dup pair list equals an all-pairs
  * brute-force reference computed with the same tokenizer, and that the
  * cluster assignment built on the same graph is exact.
  *
  * Under the packed-long code this corpus fails in both directions: a
  * near-dup pair (1, 2³²+7) unpacks to the nonexistent pair (1, 7), and a
  * pair with both reps ≥ 2³³ overflows the shift entirely — the pairs
  * below simply vanish from the output.
  */
class LshIdRangeSpec extends GraftSpec {

  test("doc_ids straddling 2^32: minhash pair list equals brute force, clusters exact") {
    val dir = Files.createTempDirectory("graft_idrange").toString
    val Two32 = 1L << 32
    val Two33 = 1L << 33
    // Three token-set shapes around the A text: A' and A'' each replace a
    // DIFFERENT token (jac(A,A') = jac(A,A'') = 9/11 ≈ 0.818 ≥ 0.8;
    // jac(A',A'') = 8/12 < 0.8), plus an exact duplicate of A so the
    // identical-set rep collapse and intra-pair expansion also cross 2³².
    val aToks = (1 to 10).map(i => s"a$i")
    val textA  = aToks.mkString(" ")
    val textA1 = (aToks.dropRight(1) :+ "x1").mkString(" ")
    val textA2 = ((aToks.take(8) :+ aToks(9)) :+ "x2").mkString(" ")
    val textB  = (1 to 10).map(i => s"b$i").mkString(" ")
    val textB1 = ((1 to 9).map(i => s"b$i") :+ "y1").mkString(" ")
    val docs = Seq(
      (1L, textA),            // rep of the A-component
      (Two32 - 1L, textA1),   // near-dup below the boundary
      (Two32, textA),         // exact dup ACROSS the boundary (intra pair)
      (Two32 + 7L, textA2),   // near-dup above the boundary (cand pair 1↔2³²+7)
      (Two33 + 5L, textB),    // B-component: both reps ≥ 2³³ —
      (Two33 + 50L, textB1),  //   the cand pair that overflows a packed shift
      (Two33 + 9L, textB),    // exact dup of B, id ≥ 2³³
      (3L, "c1 c2 c3"))       // singleton
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    try {
      // Brute-force reference: all-pairs token-set Jaccard with the exact
      // tokenizer the LSH path canonicalizes on.
      val t = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          array_distinct(filter(split(col("text"), " "), x => x =!= "")).as("toks"))
      val a = t.select(col("doc_id").as("a_id"), col("toks").as("a_toks"))
      val b = t.select(col("doc_id").as("b_id"), col("toks").as("b_toks"))
      val inter = size(array_intersect(col("a_toks"), col("b_toks")))
      val brute = a.join(b, col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          (inter.cast("double") /
            (size(col("a_toks")) + size(col("b_toks")) - inter).cast("double")).as("jac"))
        .where(col("jac") >= 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

      val lsh = SparkEntry.queries("llm_neardup_minhash")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

      // Guard the fixture itself: the interesting pairs must exist and
      // cross the boundary, or the spec stops testing anything.
      assert(brute.contains((1L, Two32 + 7L, 9.0 / 11.0)),
        s"fixture lost its boundary-straddling near-dup pair: $brute")
      assert(brute.contains((Two33 + 5L, Two33 + 50L, 9.0 / 11.0)),
        s"fixture lost its both-sides-above-2^32 pair: $brute")
      assert(brute.contains((1L, Two32, 1.0)),
        s"fixture lost its boundary-straddling exact-dup pair: $brute")
      assert(lsh == brute,
        s"LSH pair list diverges from brute force above 2^32:\n" +
          s"  missing: ${(brute -- lsh).toSeq.sorted}\n  extra  : ${(lsh -- brute).toSeq.sorted}")

      // Cluster assignment over the same graph: the A-component collapses
      // to keep_id 1, the B-component to 2³³+5, the singleton keeps itself.
      val clusters = SparkEntry.queries("llm_dedup_cluster")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = Map(
        1L -> 1L, (Two32 - 1L) -> 1L, Two32 -> 1L, (Two32 + 7L) -> 1L,
        (Two33 + 5L) -> (Two33 + 5L), (Two33 + 50L) -> (Two33 + 5L),
        (Two33 + 9L) -> (Two33 + 5L),
        3L -> 3L)
      assert(clusters == expected, s"cluster assignment wrong: $clusters")
    } finally Cleanup.release(spark, blocking = true)
  }
}
