package graft

import org.apache.spark.sql.functions._

import graft.functions.MinHash
import graft.queries.LlmQueries

/** Round-6 verdict "next round" #6: the LSH banding stage claims (comment at
  * LlmQueries `llm_neardup_minhash`, backed by functions/MinHash.scala) that
  * a true pair at Jaccard j survives banding with probability
  * 1 − (1 − j^r)^b — ≈ 1 − 5e-8 at the τ = 0.8 operating point with
  * b = 32, r = 4. This spec pins that bound empirically against the exact
  * all-pairs Jaccard truth (the same semantics the driver hash-verifies via
  * `llm_neardup_jaccard`): candidate recall must meet the bound, and —
  * because the verify stage re-checks exact Jaccard — the surviving pair
  * set must also be a SUBSET of the truth (precision 1).
  *
  * Runs at both sf0.001 and sf0.01. Recall is measured at the
  * representative level (distinct token sets): identical-set collapse is
  * lossless by construction (identical sets ⇒ identical signatures and
  * identical Jaccard to every other set), so rep-level recall IS doc-level
  * recall, at all-pairs cost over reps instead of docs.
  */
class LshRecallSpec extends GraftSpec {

  for (sf <- Seq(TestEnv.Sf001, TestEnv.Sf01)) {
    test(s"LSH candidate recall ≥ 1-(1-τ^r)^b and exact precision at $sf") {
      val (chunks, verified) = LlmQueries.lshRepGraph(spark, sf)
      try {
        val reps = chunks.where(col("cmin") === col("rep_id"))
          .select(col("rep_id"), col("tids"))
        val a = reps.select(col("rep_id").as("a_rep"), col("tids").as("a_t"))
        val b = reps.select(col("rep_id").as("b_rep"), col("tids").as("b_t"))
        val inter = size(array_intersect(col("a_t"), col("b_t")))
        val truthSet = a.join(b, col("a_rep") < col("b_rep"))
          .select(col("a_rep"), col("b_rep"),
            (inter.cast("double") /
              (size(col("a_t")) + size(col("b_t")) - inter).cast("double")).as("jac"))
          .where(col("jac") >= 0.8)
          .select(col("a_rep"), col("b_rep"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val gotSet = verified.select(col("a_rep"), col("b_rep"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

        // Precision 1: exact verify can never pass a below-threshold pair.
        val spurious = gotSet -- truthSet
        assert(spurious.isEmpty,
          s"verify stage passed ${spurious.size} below-τ pairs: ${spurious.take(5)}")

        // Recall bound at the hardest true pair (j = τ): with hundreds of
        // true pairs and a per-pair miss probability ≤ (1-τ^r)^b ≈ 4.8e-8,
        // the expected miss count is ≪ 1; ε = 1e-3 is the spec's slack for
        // the claim "recall ≥ 1 − (1 − τ^r)^b − ε". Hashes are seeded, so
        // the measurement is deterministic — a regression in signatures,
        // banding, or candidate generation fails this loudly.
        val tau = 0.8
        val bound = 1.0 -
          math.pow(1.0 - math.pow(tau, MinHash.RowsPerBand), MinHash.NumBands)
        assert(truthSet.nonEmpty, s"degenerate corpus at $sf: no true pairs")
        val recall = gotSet.intersect(truthSet).size.toDouble / truthSet.size
        info(f"recall = $recall%.6f over ${truthSet.size} true rep pairs " +
          f"(bound ${bound}%.8f)")
        assert(recall >= bound - 1e-3,
          f"LSH recall $recall%.6f < bound $bound%.8f - 1e-3 " +
            s"(missed ${(truthSet -- gotSet).size} of ${truthSet.size})")
      } finally chunks.unpersist()
    }
  }
}
