package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.kinesis.Kpl

/** Property tests for the KPL aggregated-record codec (SURVEY §5.2(3)
  * style): roundtrip identity over arbitrary keys/payloads, and the
  * no-false-positive guarantee on arbitrary non-KPL bytes — the property
  * the deaggregation decode path leans on to pass plain records through
  * untouched.
  */
object KplProps extends Properties("Kpl") {

  // Partition keys: arbitrary unicode strings (KPL keys are UTF-8, 1-256
  // chars in the real service; the codec itself has no charset landmines
  // to hide, so test wider).
  private val genKey: Gen[String] =
    Gen.chooseNum(1, 32).flatMap(n => Gen.stringOfN(n, Gen.asciiPrintableChar))

  private val genPayload: Gen[Array[Byte]] =
    Gen.chooseNum(0, 512).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))

  private val genRecords: Gen[List[(String, Array[Byte])]] =
    Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.zip(genKey, genPayload)))

  private def canon(rs: Seq[(String, Array[Byte])]): Seq[(String, Seq[Byte])] =
    rs.map { case (k, d) => (k, d.toSeq) }

  property("roundtrip: parse(aggregate(rs)) == rs, keys and order preserved") =
    forAll(genRecords) { rs =>
      Kpl.parse(Kpl.aggregate(rs)).exists(got => canon(got) == canon(rs))
    }

  property("arbitrary bytes never parse as KPL (no silent record fabrication)") =
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      // The 4-byte magic + valid protobuf + matching md5 trailer makes a
      // false positive on random bytes astronomically unlikely — and the
      // decode path depends on that: a false positive would REPLACE a real
      // payload with garbage members.
      Kpl.parse(bytes).isEmpty
    }

  property("truncation at any point degrades to non-KPL, never throws") =
    forAll(genRecords, Gen.chooseNum(0.0, 1.0)) { (rs, frac) =>
      val blob = Kpl.aggregate(rs)
      val cut = (blob.length * frac).toInt.min(blob.length - 1)
      // Must not throw; a truncated blob either fails the md5 (usual) or
      // parses as nothing.
      Kpl.parse(blob.take(cut))
      true
    }

  property("single-bit corruption anywhere is detected (md5) or still parses the body") =
    forAll(genRecords, Gen.chooseNum(0, Int.MaxValue)) { (rs, seed) =>
      val blob = Kpl.aggregate(rs)
      val pos = seed % blob.length
      val bad = blob.clone()
      bad(pos) = (bad(pos) ^ 0x01).toByte
      // Flipping a bit in magic/body/md5 must yield None (detected) — it
      // can never parse to a DIFFERENT record set than some consistent
      // blob would; throwing is the one forbidden outcome.
      Kpl.parse(bad) match {
        case None => true
        case Some(got) =>
          // only possible if the flip landed in a payload byte AND md5
          // happened to collide — with md5 that's effectively impossible;
          // treat as failure so we hear about it.
          canon(got) == canon(rs)
      }
    }
}
