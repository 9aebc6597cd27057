package graft

import org.apache.spark.sql.functions._

import graft.functions.{MinHash, MinHashAgg}

/** Spark-side integration of the MinHash aggregator: the udaf running under
  * Spark's partial aggregation must produce exactly the signature the pure
  * JVM fold produces — this is what licenses map-side combine at scale.
  */
class MinHashSparkSpec extends GraftSpec {

  test("minhash udaf under groupBy equals the pure-JVM signature") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, Seq("the", "quick", "brown", "fox")),
      (2L, Seq("the", "quick", "brown", "fox")),          // identical set
      (3L, Seq("lorem", "ipsum", "dolor", "sit", "amet")),
      (4L, Seq("the", "quick"))
    ).toDF("doc_id", "tokens")

    val sigs = docs
      .select(col("doc_id"), explode(col("tokens")).as("token"))
      // Force a shuffle so partial + final merge paths both execute.
      .repartition(4, col("token"))
      .groupBy(col("doc_id"))
      .agg(MinHash.minhash(MinHash.tokenId(col("token"))).as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap

    // Pure-JVM expectation using the same token-id hash (xxhash64 & 0xffffffff)
    // computed via Spark to keep the hash function single-sourced.
    val ids = docs
      .select(col("doc_id"), explode(col("tokens")).as("token"))
      .select(col("doc_id"), MinHash.tokenId(col("token")).as("id"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val agg = new MinHashAgg
    ids.foreach { case (doc, tokenIds) =>
      val expected = tokenIds.foldLeft(agg.zero)((b, t) => agg.reduce(b, t))
      assert(sigs(doc).sameElements(expected), s"doc $doc signature mismatch")
    }
    assert(sigs(1L).sameElements(sigs(2L)), "identical docs must share signatures")
    assert(!sigs(1L).sameElements(sigs(3L)), "disjoint docs must differ")
  }

  test("llm_neardup_minhash finds the same pairs as exact all-pairs jaccard at sf0.001") {
    val minhash = SparkEntry.queries("llm_neardup_minhash")(spark, TestEnv.Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // Exact answer straight from the oracle SQL via DuckDB.
    val con = TestEnv.duck(TestEnv.Sf001)
    val (_, exact) = TestEnv.duckRows(con,
      SparkEntry.oracleSql("llm_neardup_minhash"))
    con.close()
    assert(minhash.size == exact.size,
      s"pair counts differ: minhash=${minhash.size} exact=${exact.size}")
  }
}
