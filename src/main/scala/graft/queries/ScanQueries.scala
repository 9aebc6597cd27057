package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** SURVEY §2.2 A/B — scans, projection, filter, CASE expressions.
  *
  * These are the rows where Catalyst's scan-side work is the whole story:
  * the projection must reach the parquet reader as `ReadSchema` (column
  * pruning) and every sargable predicate must show up in `PushedFilters`
  * (row-group pruning). Both verified via `.explain("formatted")` — the
  * lineitem scan in `scan_project_filter` reads 5 of 11 columns and pushes
  * both predicates.
  */
object ScanQueries {
  val defs: Seq[Q] = Seq(
    // A: projection + pushed predicates on the widest fact table. At 100 TB
    // this is the difference between reading 5 columns' row groups that
    // survive min/max pruning and reading the whole table.
    Q(
      "scan_project_filter",
      (s, d) => {
        Tables.lineitem(s, d)
          .select(
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), col("l_shipdate"))
          .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
            && col("l_quantity") < 10)
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_quantity < 10
        ORDER BY l_orderkey, l_linenumber""")),

    // A: the ns-timestamp scan landmine (SURVEY §1.2): parquet
    // INT64 TIMESTAMP(NANOS) read via nanosAsLong + exact ns→µs integer
    // division inside Tables.events; DuckDB reads the same file natively
    // truncated to the identical µs value.
    Q(
      "scan_events_ns",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .where(col("event_type") =!= "error")
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        SELECT event_id, ts, user_id, event_type, value
        FROM events
        WHERE event_type <> 'error'
        ORDER BY event_id""")),

    // B: AND/OR/NOT/IN/BETWEEN/LIKE/IS NULL mix over customer⋈orders. The
    // OR branch is intentionally not fully pushable — Catalyst still pushes
    // the per-side conjuncts and prunes columns.
    Q(
      "filter_complex",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val maybeNullBal =
          when(col("c_acctbal") < 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal"))
        o.join(c, col("o_custkey") === col("c_custkey"), "inner")
          .where(
            (col("o_orderpriority").isin("1-URGENT", "2-HIGH")
              || col("o_totalprice").between(100000.0, 200000.0))
              && !col("c_mktsegment").like("AUTO%")
              && maybeNullBal.isNotNull
              && col("o_orderstatus") =!= "P")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderpriority"), col("c_mktsegment"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE (o_orderpriority IN ('1-URGENT', '2-HIGH')
               OR o_totalprice BETWEEN 100000.0 AND 200000.0)
          AND NOT (c_mktsegment LIKE 'AUTO%')
          AND (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NOT NULL
          AND o_orderstatus <> 'P'
        ORDER BY o_orderkey""")),

    // B: CASE WHEN tiering + string-function mix, all codegen built-ins.
    Q(
      "expr_case",
      (s, d) => {
        Tables.customer(s, d)
          .select(
            col("c_custkey"),
            when(col("c_acctbal") < 0, "debtor")
              .when(col("c_acctbal") < 3000, "low")
              .when(col("c_acctbal") < 7000, "mid")
              .otherwise("high").as("tier"),
            when(col("c_acctbal") < 0, -1)
              .when(col("c_acctbal") < 3000, 0)
              .when(col("c_acctbal") < 7000, 1)
              .otherwise(2).as("tier_rank"),
            concat(upper(substring(col("c_mktsegment"), 1, 3)), lit(":"),
              col("c_name")).as("seg_tag"))
          .orderBy(col("c_custkey"))
      },
      oracle = Some("""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'debtor'
                    WHEN c_acctbal < 3000 THEN 'low'
                    WHEN c_acctbal < 7000 THEN 'mid'
                    ELSE 'high' END AS tier,
               CASE WHEN c_acctbal < 0 THEN -1
                    WHEN c_acctbal < 3000 THEN 0
                    WHEN c_acctbal < 7000 THEN 1
                    ELSE 2 END AS tier_rank,
               concat(upper(substring(c_mktsegment, 1, 3)), ':', c_name) AS seg_tag
        FROM customer
        ORDER BY c_custkey""")))
}
