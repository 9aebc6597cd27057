package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{MinHash, MinHashAgg}

/** Property tests for the MinHash sketch (SURVEY §5.2(3)): the algebraic
  * invariants that make the aggregator safe under Spark's partial
  * aggregation, plus the statistical error bound that justifies using the
  * sketch for near-dup detection at 100 TB.
  */
object MinHashProps extends Properties("MinHash") {
  private val agg = new MinHashAgg

  private def sig(tokens: Set[Long]): Array[Long] =
    tokens.foldLeft(agg.zero)((b, t) => agg.reduce(b, t))

  private val genTokens: Gen[Set[Long]] =
    Gen.nonEmptyContainerOf[Set, Long](Gen.choose(0L, 0xffffffffL))

  property("deterministic: same set → same signature") =
    forAll(genTokens) { ts =>
      sig(ts).sameElements(sig(ts))
    }

  property("order-independent: shuffled reduce order → same signature") =
    forAll(genTokens) { ts =>
      val forward  = ts.toSeq.foldLeft(agg.zero)((b, t) => agg.reduce(b, t))
      val backward = ts.toSeq.reverse.foldLeft(agg.zero)((b, t) => agg.reduce(b, t))
      forward.sameElements(backward)
    }

  property("merge(sig(A), sig(B)) == sig(A ∪ B) — partial-agg soundness") =
    forAll(genTokens, genTokens) { (a, b) =>
      // Buffers are mutated in place; clone so sig(a) survives the merge.
      val merged = agg.merge(sig(a).clone(), sig(b))
      merged.sameElements(sig(a ++ b))
    }

  property("signature values in [0, Prime) and length NumHashes") =
    forAll(genTokens) { ts =>
      val s = sig(ts)
      s.length == MinHash.NumHashes && s.forall(v => v >= 0 && v < MinHash.Prime)
    }

  property("slot-match fraction estimates Jaccard within 4σ + 2%") =
    forAll(genTokens, genTokens) { (a, b) =>
      val sa = sig(a); val sb = sig(b)
      val matches = sa.zip(sb).count { case (x, y) => x == y }
      val est = matches.toDouble / MinHash.NumHashes
      val j = (a & b).size.toDouble / (a | b).size.toDouble
      val sigma = math.sqrt(j * (1 - j) / MinHash.NumHashes)
      // 4σ two-sided bound + 2% slack for the tiny-set regime; flake
      // probability per trial ≈ 6e-5.
      math.abs(est - j) <= 4 * sigma + 0.02
    }

  property("identical sets always share every LSH band") = Prop.forAll(genTokens) { ts =>
    val s1 = sig(ts); val s2 = sig(ts)
    (0 until MinHash.NumBands).forall { band =>
      val from = band * MinHash.RowsPerBand
      s1.slice(from, from + MinHash.RowsPerBand)
        .sameElements(s2.slice(from, from + MinHash.RowsPerBand))
    }
  }
}
