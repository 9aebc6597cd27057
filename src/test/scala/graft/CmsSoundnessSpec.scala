package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Quality bound for the Count-Min sketch row: the driver hash already
  * proves Spark==DuckDB on the sketch ARITHMETIC (CMS is deterministic
  * additive arithmetic — the one sketch family member that is
  * hash-verifiable); this spec proves the sketch's CONTRACT against the
  * exact counts the hash cannot see:
  *
  *   - one-sided error: est ≥ exact for EVERY probe (a CMS can only
  *     overcount — an undercount means the bucket arithmetic is broken);
  *   - the ε bound: overshoot ≤ e·N/w per probe. The textbook statement
  *     is probabilistic (P[overshoot > e·N/w] ≤ e^−d per probe over the
  *     hash draw), but THIS instance is deterministic — fixed salts,
  *     fixed corpus — so the inequality either holds or it does not, and
  *     it holds with room at both gate SFs (expected per-row collision
  *     mass is N/w = N/16; the min over d=4 rows sits well under e·N/w).
  *
  * The absent probe (nosuchtoken99, exact = 0) rides the same bounds: its
  * estimate is pure collision mass, the one-sided-error surface.
  */
class CmsSoundnessSpec extends GraftSpec {

  for (sf <- Seq(TestEnv.Sf001, TestEnv.Sf01)) {
    test(s"llm_freq_sketch: one-sided error within e·N/w at $sf") {
      val est = SparkEntry.queries("llm_freq_sketch")(spark, sf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      val toks = Tables.documents(spark, sf)
        .select(explode(filter(split(lower(col("text")), " "),
          t => t =!= "")).as("t"))
      val n = toks.count()
      val exact = toks.groupBy(col("t")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bound = math.ceil(math.E * n / TextQueries.CmsW).toLong

      for (p <- TextQueries.CmsProbes) {
        val ex = exact.getOrElse(p, 0L)
        assert(est(p) >= ex,
          s"$p: CMS must never undercount (est ${est(p)} < exact $ex)")
        assert(est(p) <= ex + bound,
          s"$p: overshoot ${est(p) - ex} exceeds e·N/w = $bound")
      }
      info(s"N=$n bound=$bound " + TextQueries.CmsProbes
        .map(p => s"$p=${est(p)}/${exact.getOrElse(p, 0L)}").mkString(" "))
    }
  }
}
