package graft

import org.apache.spark.sql.functions._

/** Structural properties of the quantized Lloyd update (round 15) that
  * the row's oracle hash cannot express on its own terms:
  *
  *   - PARTITION: each vector lands in exactly one cell, so the member
  *     counts restricted to any one dimension sum to the corpus size;
  *   - per-cell consistency: every dimension of a cell reports the same
  *     member count (one wrong-keyed shuffle would break this first);
  *   - DOMAIN: quantized components live in [-127, 127], so every
  *     centroid-update mean must too — and qsum must equal n·q_mean
  *     exactly under the one-division discipline.
  */
class KmeansSpec extends GraftSpec {

  for (sf <- Seq(TestEnv.Sf001, TestEnv.Sf01)) {
    test(s"llm_kmeans_update: partition + domain invariants at $sf") {
      val rows = SparkEntry.queries("llm_kmeans_update")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
      val n = Tables.embeddings(spark, sf).count()

      val dim0 = rows.filter(_._2 == 0L)
      assert(dim0.map(_._3).sum == n,
        s"cell sizes must partition the corpus: ${dim0.map(_._3).sum} != $n")

      val cellCounts = rows.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
      val broken = cellCounts.filter(_._2.size != 1)
      assert(broken.isEmpty,
        s"every dimension of a cell must agree on n: ${broken.take(3)}")

      rows.foreach { case (c, dim, cnt, qsum, mean) =>
        assert(mean >= -127.0 && mean <= 127.0,
          s"cell $c dim $dim mean $mean outside the int8 domain")
        assert(mean == qsum.toDouble / cnt.toDouble,
          s"cell $c dim $dim mean must be the one exact division")
      }
      info(s"${cellCounts.size} cells × 64 dims over $n vectors at $sf")
    }
  }
}
