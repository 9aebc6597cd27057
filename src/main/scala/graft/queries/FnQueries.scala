package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** SURVEY §2.2 F — sort / limit / set ops / scalar functions.
  *
  * Cross-engine deltas handled per SURVEY §7: DuckDB `day` vs Spark
  * `dayofmonth`, `string_split` (literal) vs `split` (regex) — identical
  * for the single-space separator — `json_extract_string` vs
  * `get_json_object`, and DuckDB's HUGEINT `sum(BIGINT)` cast back to
  * BIGINT on both sides. Sorts follow R1: explicit NULLS FIRST/LAST and
  * a unique trailing key.
  */
object FnQueries {
  val defs: Seq[Q] = Seq(
    Q(
      "sort_multi_nulls",
      (s, d) => {
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
              .otherwise(col("o_orderpriority")).as("pri"),
            col("o_totalprice"))
          .orderBy(col("pri").asc_nulls_first, col("o_totalprice").desc, col("o_orderkey"))
      },
      oracle = Some("""
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS pri,
               o_totalprice
        FROM orders
        ORDER BY pri ASC NULLS FIRST, o_totalprice DESC, o_orderkey""")),

    // Global top-100: plans as TakeOrderedAndProject (per-partition top-K +
    // driver merge), never a full global sort — the 100 TB-safe shape.
    Q(
      "topk_limit",
      (s, d) => {
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      oracle = Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100""")),

    Q(
      "set_union_all",
      (s, d) => {
        Tables.customer(s, d).select(col("c_nationkey").as("nk"))
          .unionAll(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
          .orderBy(col("nk"))
      },
      oracle = Some("""
        SELECT c_nationkey AS nk FROM customer
        UNION ALL
        SELECT s_nationkey AS nk FROM supplier
        ORDER BY nk""")),

    Q(
      "set_union_distinct",
      (s, d) => {
        Tables.customer(s, d).select(col("c_nationkey").as("nk"))
          .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
          .distinct()
          .orderBy(col("nk"))
      },
      oracle = Some("""
        SELECT c_nationkey AS nk FROM customer
        UNION
        SELECT s_nationkey AS nk FROM supplier
        ORDER BY nk""")),

    Q(
      "set_intersect",
      (s, d) => {
        Tables.orders(s, d).select(col("o_custkey").as("k"))
          .intersect(Tables.customer(s, d).select(col("c_custkey").as("k")))
          .orderBy(col("k"))
      },
      oracle = Some("""
        SELECT o_custkey AS k FROM orders
        INTERSECT
        SELECT c_custkey AS k FROM customer
        ORDER BY k""")),

    // Except against urgent-order customers so the result is non-empty at
    // every sf (plain customers-minus-order-customers is 0 rows).
    Q(
      "set_except",
      (s, d) => {
        Tables.customer(s, d).select(col("c_custkey").as("k"))
          .except(
            Tables.orders(s, d)
              .filter(col("o_orderpriority") === "1-URGENT")
              .select(col("o_custkey").as("k")))
          .orderBy(col("k"))
      },
      oracle = Some("""
        SELECT c_custkey AS k FROM customer
        EXCEPT
        SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY k""")),

    // Bag-semantics set ops: multiplicity carries through (INTERSECT ALL
    // keeps min(n_a, n_b) copies per value, EXCEPT ALL keeps n_a − n_b).
    // The two lineitem slices give every suppkey a genuine multiplicity on
    // both sides. Spark plans these as a replicate-count aggregation +
    // generate — one hash shuffle on the value, no row-by-row matching.
    Q(
      "set_intersect_all",
      (s, d) => {
        val a = Tables.lineitem(s, d).filter(col("l_quantity") < 10)
          .select(col("l_suppkey").as("k"))
        val b = Tables.lineitem(s, d).filter(col("l_quantity") > 40)
          .select(col("l_suppkey").as("k"))
        a.intersectAll(b).orderBy(col("k"))
      },
      oracle = Some("""
        SELECT l_suppkey AS k FROM lineitem WHERE l_quantity < 10
        INTERSECT ALL
        SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 40
        ORDER BY k""")),

    Q(
      "set_except_all",
      (s, d) => {
        val a = Tables.lineitem(s, d).filter(col("l_quantity") < 10)
          .select(col("l_suppkey").as("k"))
        val b = Tables.lineitem(s, d).filter(col("l_quantity") > 40)
          .select(col("l_suppkey").as("k"))
        a.exceptAll(b).orderBy(col("k"))
      },
      oracle = Some("""
        SELECT l_suppkey AS k FROM lineitem WHERE l_quantity < 10
        EXCEPT ALL
        SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 40
        ORDER BY k""")),

    // Wide→long reshape: Dataset.unpivot over the four lineitem measure
    // columns (all DOUBLE — unpivot requires one common value type). The
    // oracle is the portable UNION ALL expansion; Spark emits the source
    // column name as the metric value, so the literals match exactly.
    // Metric names sort identically in both engines (plain ASCII).
    Q(
      "fn_unpivot",
      (s, d) => {
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 200)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"), col("l_tax"))
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax")),
            "metric", "value")
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, metric, value FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
          FROM lineitem WHERE l_orderkey < 200
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
          FROM lineitem WHERE l_orderkey < 200
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
          FROM lineitem WHERE l_orderkey < 200
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
          FROM lineitem WHERE l_orderkey < 200) t
        ORDER BY l_orderkey, l_linenumber, metric""")),

    // Regex surface: extract / replace-all / match. Patterns stay inside
    // the class-and-alternation subset where Java regex (Spark) and RE2
    // (DuckDB) agree; DuckDB regexp_replace needs the explicit 'g' flag to
    // match Spark's replace-ALL semantics, and both engines return '' for
    // a no-match extract.
    Q(
      "fn_regexp",
      (s, d) => {
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            regexp_extract(col("text"), "(batch|stream|merge)", 1).as("first_kw"),
            regexp_replace(substring(col("text"), 1, 40), "[aeiou]", "_").as("devoweled"),
            col("text").rlike("join .* join").as("double_join"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        SELECT doc_id,
               regexp_extract(text, '(batch|stream|merge)', 1) AS first_kw,
               regexp_replace(substr(text, 1, 40), '[aeiou]', '_', 'g') AS devoweled,
               regexp_matches(text, 'join .* join') AS double_join
        FROM documents
        ORDER BY doc_id""")),

    Q(
      "fn_string",
      (s, d) => {
        Tables.customer(s, d)
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("up"),
            lower(col("c_mktsegment")).as("lo"),
            substring(col("c_name"), 1, 5).as("sub5"),
            length(col("c_name")).as("len"),
            concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cat"),
            trim(col("c_name")).as("tr"),
            regexp_replace(col("c_name"), "0", "").as("no_zeros"),
            col("c_name").like("%1%").as("has_one"))
          .orderBy(col("c_custkey"))
      },
      oracle = Some("""
        SELECT c_custkey,
               upper(c_name) AS up,
               lower(c_mktsegment) AS lo,
               substring(c_name, 1, 5) AS sub5,
               length(c_name) AS len,
               concat(c_name, '-', c_mktsegment) AS cat,
               trim(c_name) AS tr,
               replace(c_name, '0', '') AS no_zeros,
               (c_name LIKE '%1%') AS has_one
        FROM customer
        ORDER BY c_custkey""")),

    Q(
      "fn_date",
      (s, d) => {
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("bigint").as("y"),
            month(col("o_orderdate")).cast("bigint").as("m"),
            dayofmonth(col("o_orderdate")).cast("bigint").as("dom"),
            date_trunc("month", col("o_orderdate")).as("mon"),
            datediff(lit("1999-01-01").cast("date"), col("o_orderdate")).cast("bigint").as("days_to_99"),
            (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some("""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(month(o_orderdate) AS BIGINT) AS m,
               CAST(day(o_orderdate) AS BIGINT) AS dom,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS BIGINT) AS days_to_99,
               o_orderdate + INTERVAL 30 DAY AS plus30
        FROM orders
        ORDER BY o_orderkey""")),

    Q(
      "fn_math",
      (s, d) => {
        Tables.customer(s, d)
          .select(
            col("c_custkey"),
            abs(col("c_acctbal")).as("ab"),
            // `+ 0.0` normalizes IEEE -0.0 → 0.0: Spark ceil(double) yields
            // BIGINT (never -0.0) but DuckDB ceil keeps DOUBLE and returns
            // -0.0 for inputs in (-1,0), which the driver-strict compare
            // distinguishes. Same on the oracle side.
            (ceil(col("c_acctbal")).cast("double") + lit(0.0)).as("ce"),
            (floor(col("c_acctbal")).cast("double") + lit(0.0)).as("fl"),
            pmod(col("c_custkey"), lit(7)).cast("bigint").as("md"),
            (col("c_acctbal") * col("c_acctbal")).as("sq"),
            sqrt(abs(col("c_acctbal"))).as("rt"),
            round(col("c_acctbal").cast("decimal(12,2)"), 1).cast("double").as("rnd"),
            // ln/exp differ from DuckDB's libm in the last ulp (measured) —
            // use a power with an exactly-representable result instead.
            pow(lit(2.0), (col("c_custkey") % 10).cast("double")).as("pw"))
          .orderBy(col("c_custkey"))
      },
      oracle = Some("""
        SELECT c_custkey,
               abs(c_acctbal) AS ab,
               CAST(ceil(c_acctbal) AS DOUBLE) + 0.0 AS ce,
               CAST(floor(c_acctbal) AS DOUBLE) + 0.0 AS fl,
               CAST(c_custkey % 7 AS BIGINT) AS md,
               c_acctbal * c_acctbal AS sq,
               sqrt(abs(c_acctbal)) AS rt,
               CAST(round(CAST(c_acctbal AS DECIMAL(12,2)), 1) AS DOUBLE) AS rnd,
               power(2.0, CAST(c_custkey % 10 AS DOUBLE)) AS pw
        FROM customer
        ORDER BY c_custkey""")),

    Q(
      "fn_array",
      (s, d) => {
        // explode_outer: avoids InferFiltersFromGenerate re-evaluating the
        // split below the projection (2× tokenize CPU on a full-corpus
        // scan — see the llm_contamination pathology note, SURVEY §6 r8).
        // Identical results: a null token row fails the length filter.
        Tables.documents(s, d)
          .withColumn("token", explode_outer(split(col("text"), " ")))
          .filter(length(col("token")) > 0)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_tokens"),
            countDistinct(col("token")).as("n_distinct"))
          .orderBy(col("lang"))
      },
      oracle = Some("""
        SELECT lang, count(*) AS n_tokens, count(DISTINCT token) AS n_distinct
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents) t
        WHERE length(token) > 0
        GROUP BY lang
        ORDER BY lang""")),

    // Map construct + extract. The oracle states the *semantics* (the
    // extracted scalars), not the mechanism — raw map values are never
    // compared across engines (SURVEY §2.2-F row fn_map).
    Q(
      "fn_map",
      (s, d) => {
        Tables.customer(s, d)
          .withColumn(
            "m",
            map_from_arrays(
              array(lit("seg"), lit("name")),
              array(col("c_mktsegment"), col("c_name"))))
          .select(
            col("c_custkey"),
            element_at(col("m"), "seg").as("seg_val"),
            element_at(col("m"), "name").as("name_val"),
            // try_element_at: NULL-on-missing-key regardless of
            // spark.sql.ansi.enabled (plain element_at throws under ANSI).
            try_element_at(col("m"), lit("missing")).as("absent_val"),
            size(map_keys(col("m"))).cast("bigint").as("n_keys"))
          .orderBy(col("c_custkey"))
      },
      oracle = Some("""
        SELECT c_custkey,
               c_mktsegment AS seg_val,
               c_name AS name_val,
               CAST(NULL AS VARCHAR) AS absent_val,
               CAST(2 AS BIGINT) AS n_keys
        FROM customer
        ORDER BY c_custkey""")),

    Q(
      "fn_json",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(
            sum(get_json_object(col("props"), "$.k").cast("bigint")).cast("bigint").as("sum_k"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               count(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // F (round 20): NATIVE PIVOT — Spark's RelationalGroupedDataset.pivot
    // surface (llm_lang_pivot deliberately used conditional aggregation;
    // this row declares the API itself) in its only scale-correct form:
    // EXPLICIT pivot values. The one-argument pivot(col) overload runs a
    // driver-side collect of the distinct values before planning — the
    // no-collect rule bans it at any corpus size — while the explicit list
    // compiles to the same distinct-value-bound conditional-agg plan as
    // the hand-written row (one map-side-partial exchange, no pivot
    // operator survives to the physical plan). Spark's pivot-count yields
    // NULL for absent (group, value) combos where a FILTER count yields 0,
    // so both engines coalesce explicitly (Spark via coalesce-to-0L, the
    // oracle via FILTER count's native 0). The five listed values are the
    // fixture's complete event_type domain; an unlisted type would drop
    // from the pivot columns on BOTH sides identically (its rows still
    // contribute the user's group row).
    Q(
      "fn_pivot",
      (s, d) => {
        val tiers = Seq("click", "view", "purchase", "error", "signup")
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .pivot("event_type", tiers)
          .agg(count(lit(1)))
          .select(col("user_id") +: tiers.map(t =>
            coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
          .orderBy(col("user_id"))
      },
      oracle = Some("""
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click')    AS n_click,
               count(*) FILTER (WHERE event_type = 'view')     AS n_view,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               count(*) FILTER (WHERE event_type = 'error')    AS n_error,
               count(*) FILTER (WHERE event_type = 'signup')   AS n_signup
        FROM events
        GROUP BY user_id
        ORDER BY user_id""")))
}
