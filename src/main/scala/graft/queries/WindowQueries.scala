package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Tables.dec

/** SURVEY §2.2 E — window functions.
  *
  * Every window partitions by a key (customer) so WindowExec parallelizes
  * across the shuffle; the only global window (`win_running_total`) runs
  * over a pre-aggregated per-day frame (≤ a few thousand rows at any sf),
  * never over raw fact rows — the pattern that survives 100 TB.
  * Ordering keys always end in a unique column (R1 determinism).
  */
object WindowQueries {

  val defs: Seq[Q] = Seq(
    Q(
      "win_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            row_number().over(w).as("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_totalprice,
               rank()       OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               row_number() OVER w AS rn
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_custkey, rn""")),

    Q(
      "win_lag_lead",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            lag(col("o_orderkey"), 1).over(w).as("prev_order"),
            lead(col("o_orderkey"), 1).over(w).as("next_order"))
          .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_orderdate,
               lag(o_orderkey, 1)  OVER w AS prev_order,
               lead(o_orderkey, 1) OVER w AS next_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    Q(
      "win_frame_rows",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-2, Window.currentRow)
        Tables.orders(s, d)
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            sum(dec(col("o_totalprice"))).over(w).cast("double").as("moving_sum"))
          .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum
        FROM orders
        ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    // Frame-edge value extraction: first/last/nth over the full-partition
    // ROWS frame (last_value over the default frame is the classic footgun
    // — it reads the current row, so the frame is spelled explicitly on
    // both engines), plus an IGNORE NULLS variant over a constructed
    // nullable (first order above a price threshold) — orders carries no
    // nullable column, so the CASE builds one the same way on both sides.
    Q(
      "win_first_last",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, d)
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            first(col("o_orderkey")).over(w).as("first_order"),
            last(col("o_orderkey")).over(w).as("last_order"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_order"),
            first(when(col("o_totalprice") > 200000, col("o_orderkey")),
              ignoreNulls = true).over(w).as("first_big"))
          .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_orderdate,
               first_value(o_orderkey) OVER w AS first_order,
               last_value(o_orderkey)  OVER w AS last_order,
               nth_value(o_orderkey, 2) OVER w AS second_order,
               first_value(CASE WHEN o_totalprice > 200000 THEN o_orderkey END
                 IGNORE NULLS) OVER w AS first_big
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    // Value-based frame: how many of my orders are within $1000 below this
    // one. Spelled in SQL on both sides (the DataFrame rangeBetween API
    // takes Long offsets only; the double-typed RANGE frame needs SQL).
    Q(
      "win_frame_range",
      (s, d) => {
        // query-unique view name: shared-session safe (round-2 verdict #6)
        Tables.orders(s, d).createOrReplaceTempView("orders_wfr")
        s.sql("""
          SELECT o_custkey, o_orderkey, o_totalprice,
                 count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                                RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_in_band
          FROM orders_wfr
          ORDER BY o_custkey, o_orderkey""")
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_totalprice,
               count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                              RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_in_band
        FROM orders
        ORDER BY o_custkey, o_orderkey""")),

    Q(
      "win_topn_group",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      oracle = Some("""
        SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t
        WHERE rn <= 2
        ORDER BY o_custkey, rn""")),

    // Distribution window functions: ntile buckets + percent_rank +
    // cume_dist. The ordering key ends in the unique o_orderkey, so every
    // rank is tie-free — percent_rank's (rank-1)/(n-1) and cume_dist's
    // peers/n are then single IEEE divisions with identical inputs on both
    // engines (a tied ordering would make cume_dist count peers and
    // diverge on representation).
    Q(
      "win_ntile_dist",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(
            col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      oracle = Some("""
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ntile(4)       OVER w AS quartile,
               percent_rank() OVER w AS pr,
               cume_dist()    OVER w AS cd
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_orderpriority, o_orderkey""")),

    // Cumulative daily revenue: aggregate to per-day rows first (bounded),
    // then an unbounded-preceding running sum over the small frame.
    Q(
      "win_running_total",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(col("o_orderdate").as("day"))
          .agg(sum(dec(col("o_totalprice"))).as("day_rev"))
        val w = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .select(
            col("day"),
            col("day_rev").cast("double").as("day_rev"),
            sum(col("day_rev")).over(w).cast("double").as("cum_rev"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        SELECT day,
               CAST(day_rev AS DOUBLE) AS day_rev,
               CAST(sum(day_rev) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_rev
        FROM (
          SELECT o_orderdate AS day, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS day_rev
          FROM orders GROUP BY o_orderdate) t
        ORDER BY day""")),

    // E (round 20): GAP-BASED SESSIONIZATION — the classic clickstream
    // operator the fixed tumbling/sliding rows cannot express: a session
    // is a maximal run of a user's events where consecutive gaps stay
    // within the threshold (12 h here — between this fixture's per-user
    // median gap ~7.7 h and its p90 ~24 h, so both session-continuing and
    // session-breaking gaps are live at every SF). The lag-flag/cumsum
    // composition is the standard batch form: is_new = (gap > threshold),
    // session_id = 1 + running sum of is_new — the first event's NULL lag
    // compares NULL and lands in the ELSE-0 branch on both engines.
    //
    // Everything is µs-BIGINT arithmetic (unix_micros / epoch_us on the
    // normalized µs timestamp) so every output column is hash-exact; the
    // ordering key ends in event_id (R1 determinism — equal timestamps
    // within a user cannot reorder the lag).
    //
    // Scale shape: ONE corpus exchange total. Both window passes and the
    // per-session aggregate run on hashpartitioning(user_id) — the lag
    // and cumsum windows share one sort, and the (user_id, session_id)
    // groupBy is subset-satisfied by the window's user_id partitioning,
    // so no second exchange (pinned); output is session-bound, not
    // event-bound. Parallelism is the user domain, the same contract the
    // stream_* rows shuffle state by.
    Q(
      "win_session_batch",
      (s, d) => {
        val gapUs = 43200000000L // 12 h in µs
        val byTime = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts)").as("ts_us"))
          .withColumn("is_new",
            when(col("ts_us") - lag(col("ts_us"), 1).over(byTime) > gapUs,
              lit(1L)).otherwise(lit(0L)))
          .withColumn("session_id",
            sum(col("is_new")).over(byTime.rowsBetween(
              Window.unboundedPreceding, Window.currentRow)) + lit(1L))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts_us")).as("start_us"),
            max(col("ts_us")).as("end_us"))
          .withColumn("duration_us", col("end_us") - col("start_us"))
          .orderBy(col("user_id"), col("session_id"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
          FROM events),
        f AS (
          SELECT user_id, event_id, ts_us,
                 CASE WHEN ts_us - lag(ts_us) OVER w > 43200000000
                      THEN 1 ELSE 0 END AS is_new
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        sess AS (
          SELECT user_id, ts_us,
                 CAST(1 + sum(is_new) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS session_id
          FROM f)
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts_us) AS start_us, max(ts_us) AS end_us,
               max(ts_us) - min(ts_us) AS duration_us
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id""")))
}
