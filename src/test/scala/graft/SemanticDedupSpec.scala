package graft

import org.apache.spark.sql.functions._

/** Cross-validation for `llm_dedup_semantic` (round 14): the declared row
  * computes components via distributed min-label propagation; this spec
  * recomputes them via a driver-side union-find over the HASH-VERIFIED
  * pair set (`llm_neardup_cosine_lsh`'s output — both engines agree on it
  * bit-for-bit) and demands identical keep_ids for every vector. This is
  * the same cross-check the cluster row got at sf0.1 in round 5 (0
  * mismatches over 2.97M pairs), here as a committed suite: it holds at
  * scales where the recursive-CTE oracle is never run, and it would catch
  * a propagation bug (early convergence, a pointer-jump that skips a
  * component) that the driver hash at small SF might miss.
  *
  * Also pinned: keep_id is idempotent (keep_id of a keeper is itself) —
  * the property downstream "drop non-keepers" filters rely on.
  */
class SemanticDedupSpec extends GraftSpec {

  // The bench-scale corpus included deliberately: the biggest local
  // corpus, where the oracle walk is never run and the loop does the most
  // rounds. Named via TestEnv.SfBench (round-15 ADVICE: the hardcoded
  // sf0.1 path failed on hosts with only the test fixtures) — env-
  // overridable like Bench's sfDir, cancelled when absent.
  for (sf <- Seq(TestEnv.Sf001, TestEnv.Sf01, TestEnv.SfBench)) {
    test(s"llm_dedup_semantic equals union-find over the verified pairs at $sf") {
      if (sf == TestEnv.SfBench) assume(TestEnv.sfBenchExists,
        s"bench-scale corpus $sf absent on this host — case cancelled")
      val pairs = SparkEntry.queries("llm_neardup_cosine_lsh")(spark, sf)
        .select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val got = SparkEntry.queries("llm_dedup_semantic")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x
        else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = got.keys.map(v => v -> find(v)).toMap

      val mismatches = got.collect {
        case (v, k) if expected(v) != k => (v, k, expected(v))
      }
      assert(mismatches.isEmpty,
        s"${mismatches.size} keep_id mismatches, e.g. ${mismatches.take(3)}")
      info(s"${got.size} vectors, ${pairs.length} pairs, 0 mismatches at $sf")

      val keepers = got.values.toSet
      assert(keepers.forall(k => got(k) == k),
        "keep_id must be idempotent: every keeper keeps itself")
    }
  }
}
