package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** SURVEY §2.2 G — subqueries. Catalyst decorrelates the scalar subquery
  * into a left-outer aggregate join and rewrites the uncorrelated IN into a
  * left-semi join — both shuffle-parallel plans, no per-row re-execution.
  */
object SubqQueries {
  val defs: Seq[Q] = Seq(
    Q(
      "subq_scalar_corr",
      (s, d) => {
        // query-unique view names: shared-session safe (round-2 verdict #6)
        Tables.customer(s, d).createOrReplaceTempView("customer_ssc")
        Tables.orders(s, d).createOrReplaceTempView("orders_ssc")
        s.sql("""
          SELECT c_custkey, c_name,
                 (SELECT count(*) FROM orders_ssc WHERE o_custkey = c_custkey) AS n_orders
          FROM customer_ssc
          ORDER BY c_custkey""")
      },
      oracle = Some("""
        SELECT c_custkey, c_name,
               (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        FROM customer
        ORDER BY c_custkey""")),

    Q(
      "subq_in_uncorr",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer_siu")
        Tables.orders(s, d).createOrReplaceTempView("orders_siu")
        s.sql("""
          SELECT o_orderkey, o_totalprice
          FROM orders_siu
          WHERE o_custkey IN (SELECT c_custkey FROM customer_siu WHERE c_acctbal > 8000)
          ORDER BY o_orderkey""")
      },
      oracle = Some("""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
        ORDER BY o_orderkey""")),

    // TPC-H Q4 reshaped onto the fixture's column subset (no
    // l_commitdate/l_receiptdate — the late-shipment predicate is
    // l_shipdate > o_orderdate + 60 days): correlated EXISTS whose inner
    // predicate mixes an equi correlation (l_orderkey = o_orderkey) with a
    // NON-equi correlated comparison against an outer column — the shape
    // that actually stresses the decorrelator. Catalyst rewrites it to one
    // left-semi join with the range condition attached (no per-outer-row
    // re-execution, no nested loop — pinned in PlanAuditSpec), so the plan
    // is a single shuffle-parallel semi join at any fact size.
    Q(
      "subq_exists_corr",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_sec")
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sec")
        s.sql("""
          SELECT o_orderpriority, count(*) AS n_late
          FROM orders_sec
          WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
            AND EXISTS (SELECT 1 FROM lineitem_sec
                        WHERE l_orderkey = o_orderkey
                          AND l_shipdate > o_orderdate + INTERVAL '60' DAY)
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""")
      },
      oracle = Some("""
        SELECT o_orderpriority, count(*) AS n_late
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")))
}
