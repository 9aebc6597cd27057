package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** SURVEY §2.2 D — aggregation operators.
  *
  * Discipline (SURVEY rules): R1 total ORDER BY with explicit null ordering,
  * R2 exact decimal sums for monetary doubles, R3 defensive casts of final
  * decimal widths (Spark widens sums to (28,2), DuckDB to (38,2) — we cast
  * both sides to the same width), averages as `CAST(exact_sum AS DOUBLE) /
  * count` so IEEE division of identical inputs is bit-identical.
  */
object AggQueries {
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

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
            sum(dec(col("l_quantity"))).cast("decimal(38,2)").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("decimal(38,2)").as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * oneMinusDisc).cast("decimal(38,4)").as("sum_disc_price"),
            sum(dec(col("l_extendedprice")) * oneMinusDisc * onePlusTax).cast("decimal(38,6)").as("sum_charge"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", col("sum_qty").cast("double") / col("count_order"))
          .withColumn("avg_price", col("sum_base_price").cast("double") / col("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS sum_disc_price,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DECIMAL(38,6)) AS sum_charge,
          count(*) AS count_order,
          CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) / count(*) AS avg_qty,
          CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) / count(*) AS avg_price
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

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
            sum(dec(col("l_quantity"))).cast("decimal(38,2)").as("sum_qty"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
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
            sum(dec(col("l_quantity"))).cast("decimal(38,2)").as("sum_qty"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    Q(
      "agg_grouping_sets",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT l_returnflag, l_linestatus,
                 CAST(grouping(l_returnflag) AS INT) AS g_flag,
                 CAST(grouping(l_linestatus) AS INT) AS g_status,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
                 count(*) AS n_rows
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY g_flag, g_status,
                   l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
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
            sum(dec(col("l_quantity"))).cast("decimal(38,2)").as("sum_qty"),
            sum(q9 * q9).cast("double").as("sum_qty_sq"))
          .withColumn("nd", col("n_rows").cast("double"))
          .withColumn(
            "stddev_qty",
            sqrt((col("nd") * col("sum_qty_sq") - col("sum_qty").cast("double") * col("sum_qty").cast("double"))
              / (col("nd") * (col("nd") - lit(1.0)))))
          .drop("nd", "sum_qty_sq")
          .orderBy(col("l_returnflag"))
      },
      oracle = Some("""
        SELECT l_returnflag, min_qty, max_qty, n_rows, sum_qty,
               sqrt((nd * sum_qty_sq - CAST(sum_qty AS DOUBLE) * CAST(sum_qty AS DOUBLE)) / (nd * (nd - 1.0))) AS stddev_qty
        FROM (
          SELECT l_returnflag,
                 min(l_quantity) AS min_qty,
                 max(l_quantity) AS max_qty,
                 count(*) AS n_rows,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
                 CAST(sum(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty_sq,
                 CAST(count(*) AS DOUBLE) AS nd
          FROM lineitem GROUP BY l_returnflag) t
        ORDER BY l_returnflag""")),

    Q(
      "agg_percentile",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_quantity, 0.5)").as("p50_qty"),
            expr("percentile(l_quantity, 0.9)").as("p90_qty"),
            expr("percentile(l_extendedprice, 0.5)").as("p50_price"))
          .orderBy(col("l_returnflag"))
      },
      oracle = Some("""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS p50_qty,
               quantile_cont(l_quantity, 0.9) AS p90_qty,
               quantile_cont(l_extendedprice, 0.5) AS p50_price
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    Q(
      "agg_having_subq",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql("""
          SELECT o_custkey, count(*) AS cnt
          FROM orders GROUP BY o_custkey
          HAVING count(*) > (SELECT avg(cnt) FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_custkey) t)
          ORDER BY o_custkey""")
      },
      oracle = Some("""
        SELECT o_custkey, count(*) AS cnt
        FROM orders GROUP BY o_custkey
        HAVING count(*) > (SELECT avg(cnt) FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_custkey) t)
        ORDER BY o_custkey""")),

    // HLL++ sketch — engine-specific, never oracle-compared (SURVEY §5.2(5));
    // unit-tested against exact distinct within 5% relative error instead.
    Q(
      "agg_approx_distinct",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey")).as("approx_supps"))
      },
      oracle = None))
}
