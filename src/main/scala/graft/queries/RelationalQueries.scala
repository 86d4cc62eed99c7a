package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational operator pack — SURVEY.md §2.2 (filters/projections),
  * §2.3 J1/J2/J6/J7 (joins), §2.4 (aggregations), §2.7 (set ops).
  *
  * Every query is totally ordered so the driver's row-hash compare is
  * deterministic, and every computed column is aliased identically to its
  * DuckDB oracle. Joins against region/nation/customer/supplier are broadcast
  * (dimension side ≤ a few MB even at 100 TB fact scale); aggregates are all
  * partial-aggregable so map-side combine keeps the shuffle small.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A-family: TPC-H Q1-style pricing summary (grouped agg, full scan,
    // map-side partials; the shuffle carries |groups| rows only).
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1997-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P2: predicates — BETWEEN, LIKE, IN, boolean mix (reference restriction
    // strings, `acquisition.py:645-654`, `spike_sorting.py:193`).
    "q02_filter_predicates" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")) &&
          col("l_returnflag").like("R%") &&
          col("l_quantity").isin(10.0, 20.0, 30.0, 40.0, 50.0) ||
          (col("l_discount") > 0.09 && col("l_tax") < 0.02))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
    }),

    // P3: projection with renames + computed columns (reference `proj()`,
    // `subject.py:232-236` TIMESTAMPDIFF arithmetic). The fee multiply runs
    // in exact decimal: double×1.1 lands on half-cent boundaries where
    // engines' double-rounding modes diverge.
    "q03_projection_computed" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          col("o_totalprice").as("price"),
          expr("round(cast(o_totalprice as decimal(18,4)) * 1.1, 2)")
            .cast("double").as("price_with_fee"),
          year(col("o_orderdate")).as("order_year"),
          datediff(lit("1999-01-01").cast("timestamp"), col("o_orderdate")).as("age_days"))
        .orderBy("o_orderkey")
    }),

    // J1: natural inner joins through the dimension chain; dims broadcast.
    "q04_join_revenue_by_nation" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = broadcast(Tables.customer(s, d))
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy("r_name", "n_name")
    }),

    // J2 + P5: left join keeping order-less customers, coalesced zero counts
    // (reference null-row semantics, `acquisition.py:664-705`).
    "q05_left_join_zero_counts" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))
        .orderBy("c_custkey")
    }),

    // J6: semi join — customers having a large order (EXISTS).
    "q06_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 100000)
      c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // J7: anti join — the populate-engine primitive (NOT EXISTS). Restricted
    // to urgent orders so the frontier is non-empty at every scale factor.
    "q07_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      c.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // §2.7 set ops: union + distinct of PK projections
    // (`spike_sorting.py:1297-1299`).
    "q08_union_distinct" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val highValue = o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      highValue.union(urgent).distinct()
        .withColumnRenamed("o_custkey", "custkey")
        .orderBy("custkey")
    }),

    // A5: grouped count / countDistinct.
    "q09_group_count_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy("l_returnflag")
    }),

    // A1: scalar max/min over a table (next-id assignment,
    // `tracking.py:73-76`).
    "q10_scalar_minmax" -> ((s, d) => {
      Tables.orders(s, d)
        .agg(
          max(col("o_orderkey")).as("max_key"),
          min(col("o_orderkey")).as("min_key"),
          (max(col("o_orderkey")) + 1).as("next_id"))
    }),

    // §2.7 difference: EXCEPT of key sets (customers ordering, minus those
    // ever ordering urgently — non-empty at every scale factor).
    "q11_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val active = o.select(col("o_custkey").as("custkey"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      active.except(urgent).orderBy("custkey")
    }),

    // §2.7 intersect.
    "q12_intersect" -> ((s, d) => {
      val seg = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val active = Tables.orders(s, d).select(col("o_custkey").as("custkey")).distinct()
      seg.intersect(active).orderBy("custkey")
    }),

    // RELATIONAL DIVISION: customers whose orders cover EVERY priority
    // class — the universal-quantifier join. Engine shape: distinct
    // (cust, priority) pairs, grouped coverage count compared to the
    // (broadcast scalar) class count — one aggregate, no quantifier
    // nesting. The oracle is the textbook DOUBLE NOT EXISTS — an
    // independent formulation of ∀.
    "q17_relational_division" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val nClasses = o.select(countDistinct("o_orderpriority").as("__n"))
      o.select("o_custkey", "o_orderpriority").distinct()
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("__covered"))
        .crossJoin(broadcast(nClasses))
        .filter(col("__covered") === col("__n"))
        .select(col("o_custkey").as("custkey"))
        .orderBy("custkey")
    }),

    // §2.4 PIVOT: per-user event-type counts as columns — Spark's pivot
    // with an EXPLICIT value list (never the discovery scan; the list is
    // part of the query contract), which plans as one aggregate of
    // conditional counts. Integer measures, exact.
    "q14_pivot" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("user_id")
    }),

    // §2.4 UNPIVOT: melt the q14 matrix back to (user_id, event_type, n)
    // rows via the stack expression — the lossless inverse (round-trip
    // sanity lives in the oracle equality itself).
    "q15_unpivot" -> ((s, d) => {
      val wide = Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
      wide.select(col("user_id"),
        expr("""stack(5, 'click', click, 'error', error,
                 'purchase', purchase, 'signup', signup, 'view', view)
                 AS (event_type, n)"""))
        .orderBy("user_id", "event_type")
    }),

    // Hierarchy closure (org-chart / BOM shape): every node walked to its
    // root through the PARENT TABLE — one keyed join per level through
    // the Checkpointer (the generic iterative-closure loop the CC and
    // PageRank rounds share; rounds = hierarchy DEPTH, not size), rolled
    // up per root. Fixture hierarchy: parent(k) = k div 10, roots k < 10.
    // The oracle is DuckDB's native WITH RECURSIVE walk.
    "q16_hierarchy_rollup" -> ((s, d) => {
      val nodes = Tables.customer(s, d).select(col("c_custkey").as("id"))
      val parents = nodes.select(col("id"),
        when(col("id") >= 10, expr("id div 10")).otherwise(col("id"))
          .as("parent"))
      // rounds cut with localCheckpoint (the Checkpointer.Local behavior;
      // superseded rounds are freed by the ContextCleaner)
      var cur = nodes.select(col("id"), col("id").as("anc"),
        lit(0L).as("depth")).localCheckpoint(true)
      var remaining = cur.filter(col("anc") >= 10).limit(1).count()
      while (remaining > 0) {
        cur = cur
          .join(parents.select(col("id").as("anc"),
            col("parent").as("__p")), Seq("anc"), "left")
          .select(col("id"),
            when(col("anc") >= 10, col("__p")).otherwise(col("anc"))
              .as("anc"),
            when(col("anc") >= 10, col("depth") + 1).otherwise(col("depth"))
              .as("depth"))
          .localCheckpoint(true)
        remaining = cur.filter(col("anc") >= 10).limit(1).count()
      }
      cur.groupBy(col("anc").as("root"))
        .agg(count(lit(1)).as("n_nodes"), max("depth").as("max_depth"))
        .orderBy("root")
    }),

    // §2.4 grouping sets: revenue CUBE over (segment, nation) — every
    // subtotal level in ONE aggregate pass (Spark expands grouping sets
    // map-side; the shuffle carries one partial per set per key).
    // Measures are integers (counts + cents) so subtotals are exact, and
    // the sort pins null placement explicitly (Spark defaults NULLS FIRST
    // asc, DuckDB NULLS LAST — an unpinned sort hash-mismatches).
    "q13_cube_revenue" -> ((s, d) => {
      val joined = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("c_nationkey").cast("long").as("nationkey"),
          floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
            .as("__cents"))
      joined.cube(col("c_mktsegment"), col("nationkey"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_items"),
          sum("__cents").as("revenue_cents"))
        .select(col("gid").cast("long").as("gid"), col("c_mktsegment"),
          col("nationkey"), col("n_items"), col("revenue_cents"))
        .orderBy(col("gid"), col("c_mktsegment").asc_nulls_first,
          col("nationkey").asc_nulls_first)
    })
  )

  val oracles: Map[String, String] = Map(
    // the textbook double NOT EXISTS: no priority class lacks an order
    // from this customer
    "q17_relational_division" ->
      """SELECT DISTINCT o.o_custkey AS custkey
       FROM orders o
       WHERE NOT EXISTS (
         SELECT 1 FROM (SELECT DISTINCT o_orderpriority FROM orders) p
         WHERE NOT EXISTS (
           SELECT 1 FROM orders o2
           WHERE o2.o_custkey = o.o_custkey
             AND o2.o_orderpriority = p.o_orderpriority))
       ORDER BY custkey""",
    // native recursive walk to the root; roll-up per root
    "q16_hierarchy_rollup" ->
      """WITH RECURSIVE nodes AS (
         SELECT c_custkey AS id FROM customer),
       walk(id, anc, depth) AS (
         SELECT id, id, CAST(0 AS BIGINT) FROM nodes
         UNION ALL
         SELECT id, anc // 10, depth + 1 FROM walk WHERE anc >= 10),
       fin AS (
         SELECT id, anc, depth FROM walk WHERE anc < 10)
       SELECT anc AS root, CAST(count(*) AS BIGINT) AS n_nodes,
         max(depth) AS max_depth
       FROM fin GROUP BY anc ORDER BY root""",
    // conditional-count columns — the engine-independent spelling of PIVOT
    "q14_pivot" ->
      """WITH ev AS (SELECT user_id, event_type FROM events)
       SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           AS BIGINT) AS click,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           AS BIGINT) AS error,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS BIGINT) AS purchase,
         CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
           AS BIGINT) AS signup,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           AS BIGINT) AS "view"
       FROM ev GROUP BY user_id ORDER BY user_id""",
    // melt of the q14 matrix: one row per (user, type) incl. zero counts
    "q15_unpivot" ->
      """WITH ev AS (SELECT user_id, event_type FROM events),
       types AS (SELECT unnest(['click', 'error', 'purchase', 'signup',
         'view']) AS event_type),
       users AS (SELECT DISTINCT user_id FROM ev),
       c AS (
         SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
         FROM ev GROUP BY 1, 2)
       SELECT u.user_id, t.event_type, coalesce(c.n, 0) AS n
       FROM users u CROSS JOIN types t
         LEFT JOIN c ON c.user_id = u.user_id
           AND c.event_type = t.event_type
       ORDER BY u.user_id, t.event_type""",
    // grouping id computed explicitly (2·grouping(seg) + grouping(nation))
    // so the bit order cannot differ between engines; NULLS FIRST pinned.
    "q13_cube_revenue" ->
      """WITH j AS (
         SELECT c.c_mktsegment, CAST(c.c_nationkey AS BIGINT) AS nationkey,
           CAST(floor(l.l_extendedprice * (100.0::DOUBLE) + (0.5::DOUBLE))
             AS BIGINT) AS cents
         FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey)
       SELECT CAST(2 * GROUPING(c_mktsegment) + GROUPING(nationkey)
           AS BIGINT) AS gid,
         c_mktsegment, nationkey, CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(cents) AS BIGINT) AS revenue_cents
       FROM j GROUP BY CUBE (c_mktsegment, nationkey)
       ORDER BY gid, c_mktsegment NULLS FIRST, nationkey NULLS FIRST""",
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1997-09-01'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_predicates" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
       FROM lineitem
       WHERE (l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
              AND l_returnflag LIKE 'R%'
              AND l_quantity IN (10.0, 20.0, 30.0, 40.0, 50.0))
          OR (l_discount > 0.09 AND l_tax < 0.02)
       ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_tax""",
    "q03_projection_computed" ->
      """SELECT o_orderkey,
         o_totalprice AS price,
         CAST(round(CAST(o_totalprice AS DECIMAL(18,4)) * 1.1, 2) AS DOUBLE)
           AS price_with_fee,
         CAST(year(o_orderdate) AS INTEGER) AS order_year,
         CAST(datediff('day', o_orderdate, TIMESTAMP '1999-01-01') AS INTEGER) AS age_days
       FROM orders
       ORDER BY o_orderkey""",
    "q04_join_revenue_by_nation" ->
      """SELECT r_name, n_name,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name, n_name
       ORDER BY r_name, n_name""",
    "q05_left_join_zero_counts" ->
      """SELECT c_custkey,
         count(o_orderkey) AS n_orders,
         round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey
       ORDER BY c_custkey""",
    "q06_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
       FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_totalprice > 100000)
       ORDER BY c_custkey""",
    "q07_anti_join" ->
      """SELECT c_custkey, c_name
       FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderpriority = '1-URGENT')
       ORDER BY c_custkey""",
    "q08_union_distinct" ->
      """SELECT DISTINCT o_custkey AS custkey FROM (
         SELECT o_custkey FROM orders WHERE o_totalprice > 150000
         UNION ALL
         SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
       ORDER BY custkey""",
    "q09_group_count_distinct" ->
      """SELECT l_returnflag,
         count(*) AS n_rows,
         count(DISTINCT l_orderkey) AS n_orders,
         count(DISTINCT l_partkey) AS n_parts
       FROM lineitem
       GROUP BY l_returnflag
       ORDER BY l_returnflag""",
    "q10_scalar_minmax" ->
      """SELECT max(o_orderkey) AS max_key, min(o_orderkey) AS min_key,
         max(o_orderkey) + 1 AS next_id
       FROM orders""",
    "q11_except" ->
      """SELECT o_custkey AS custkey FROM orders
       EXCEPT
       SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
       ORDER BY custkey""",
    "q12_intersect" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       INTERSECT
       SELECT o_custkey AS custkey FROM orders
       ORDER BY custkey"""
  )
}
