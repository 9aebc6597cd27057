package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized + adversarial cross-engine parity for the EMBEDDING rows —
  * the vector-side twin of CurationFuzzSpec (round 15). The driver corpus
  * has NO duplicate vectors, so the rep-collapse machinery added this
  * round (srpRepGraph's intra-group pairs, llm_dedup_semantic's glue
  * guard, member expansion) runs entirely on its singleton path at the
  * gate; this corpus forces the paths the gate never sees:
  *
  *   - byte-identical CLONE groups of several sizes (5/3/2) — intra
  *     pairs at selfCos, chunked member expansion, rep-graph labels;
  *   - a 3-member ALL-ZEROS group — 0/0 cosine is NULL in both engines,
  *     so the group must stay singletons (the glue guard's whole case);
  *   - a near-clone group pair (one component nudged) — cross-group
  *     expansion with the verified cos inherited by every member pair;
  *   - random vectors with components spanning magnitudes (the
  *     quantization scale/rounding surface).
  *
  * Every included row is compared Spark-vs-DuckDB with the SAME
  * oracle SQL the driver runs, driver-strict.
  */
class VectorFuzzSpec extends GraftSpec {

  private val Queries = Seq(
    "llm_neardup_cosine",     // all-pairs baseline incl. zero-vector pairs
    "llm_neardup_cosine_lsh", // rep-collapse + intra/cross expansion
    "llm_dedup_semantic",     // rep-graph components + glue guard
    "llm_emb_quant",          // zero-vector scale branch
    "llm_kmeans_update",      // exact sums over clones + zeros
    "llm_cluster_sample",     // distance ties among clones (vec_id break)
    "llm_diversity_prune",    // DESC-rank ties among clones + ⌈0.3·n⌉ budget
    "llm_pq_codes",           // argmin code ties among clones ((d², k) break)
    "llm_pq_search",          // ADC rank ties among clones (vec_id break)
    "llm_ann_ivfpq",          // cell-pruned ADC over the same tie surface
    "llm_pq_recon",           // zero-vector distortion (0-d2 path) + clones
    "llm_kmeans_shift",       // zero-vector seed cells (q≡0 vs mean) + clones
    "llm_pq_pack",            // packed nibbles over clone/zero code ties
    "llm_pq_train")           // Lloyd M-step: clone groups pile exact BIGINT
                              // sums on one codeword; zeros hit scale=0

  test("clone/zero/near-clone embedding corpus: vector rows agree with DuckDB") {
    val rnd = new Random(0x5EED15)
    def vec(): Array[Double] =
      Array.fill(64)((rnd.nextInt(2000001) - 1000000) / 1000000.0)
    val base = vec()
    val nearClone = base.clone(); nearClone(7) = nearClone(7) + 0.001
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    var id = 0L
    def add(v: Array[Double], copies: Int): Unit =
      (0 until copies).foreach { _ => rows += ((id, v)); id += 1 }
    add(base, 5)                  // clone group A
    add(nearClone, 3)             // clone group B, near-dup of A
    add(vec(), 1)
    add(Array.fill(64)(0.0), 3)   // all-zeros group — must stay singletons
    add(vec().map(_ * 1e-4), 2)   // tiny-magnitude clone pair
    (0 until 46).foreach(_ => add(vec(), 1))

    val dir = Files.createTempDirectory("graft_vecfuzz").toString
    spark.createDataFrame(rows.toSeq.map { case (i, v) => (i, v) })
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    Class.forName("org.duckdb.DuckDBDriver")
    val con = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = con.createStatement()
      st.execute(s"CREATE VIEW embeddings AS SELECT * FROM " +
        s"read_parquet('$dir/embeddings.parquet/*.parquet')")
      st.close()
      for (q <- SparkEntry.all if Queries.contains(q.name); sql <- q.oracle) {
        val (sCols, sRows) = TestEnv.sparkRows(q.fn(spark, dir))
        val (dCols, dRows) = TestEnv.duckRows(con, sql)
        assert(sCols == dCols, s"${q.name}: column sets differ")
        assert(sRows.size == dRows.size,
          s"${q.name}: row counts differ spark=${sRows.size} duckdb=${dRows.size}")
        sRows.zip(dRows).zipWithIndex.foreach { case ((s, d), i) =>
          assert(s == d, s"${q.name} row $i differs:\n  spark : $s\n  duckdb: $d")
        }
        info(s"${q.name}: ${sRows.size} rows match")
        Cleanup.release(spark, blocking = true)
      }
      // The structural claims the corpus was built to force, checked on
      // the (already cross-verified) semantic output directly:
      val keep = SparkEntry.queries("llm_dedup_semantic")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((0L to 7L).map(keep).toSet == Set(0L),
        s"clone groups A+B must collapse to keep_id 0, got ${(0L to 7L).map(keep)}")
      assert((9L to 11L).map(keep) == Seq(9L, 10L, 11L),
        s"all-zeros vectors must keep themselves, got ${(9L to 11L).map(keep)}")
    } finally {
      con.close()
      Cleanup.release(spark, blocking = true)
    }
  }
}
