package graft

import org.apache.spark.sql.functions._

/** Recall proof for the full-corpus prefix-filter containment row (round
  * 15): unlike the banding rows, whose recall is probabilistic and
  * floor-pinned, the prefix filter is EXACT by construction — C(a→b) ≥ τ
  * forces |sh(a)∩sh(b)| ≥ ⌈τ·|sh(a)|⌉, so a's ⌊|sh(a)|/2⌋+1-shingle prefix
  * must intersect sh(b). This spec pins recall = 1 the strongest way the
  * suite can: the scale row restricted to the bounded row's id range must
  * equal the bounded all-pairs row EXACTLY, row for row, cont for cont —
  * at both fixture SFs. A candidate-generation bug (wrong prefix length,
  * df-ordering dropping a required shingle, a missed direction) shows up
  * as a missing ordered pair here long before the driver hash could see a
  * near-dup-dense corpus miss it.
  */
class ContainmentPrefixSpec extends GraftSpec {

  for (sf <- Seq(TestEnv.Sf001, TestEnv.Sf01)) {
    test(s"llm_containment_prefix equals the bounded exact row on its range at $sf") {
      val full = SparkEntry.queries("llm_containment_prefix")(spark, sf)
        .where(col("a_id") < 300 && col("b_id") < 300)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val exact = SparkEntry.queries("llm_neardup_containment")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

      val missing = exact.keySet.diff(full.keySet)
      assert(missing.isEmpty,
        s"prefix filter must have recall 1: missing ${missing.take(5)}")
      val extra = full.keySet.diff(exact.keySet)
      assert(extra.isEmpty,
        s"scale row emitted pairs the exact row does not: ${extra.take(5)}")
      val diffs = exact.collect {
        case (k, v) if full(k) != v => (k, full(k), v)
      }
      assert(diffs.isEmpty, s"cont values differ: ${diffs.take(5)}")
      info(s"${exact.size} ordered pairs, exact match at $sf")
    }
  }
}
