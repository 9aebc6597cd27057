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
        ORDER BY o_orderkey""")))
}
