package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Registry.table

/** General relational surface (SURVEY §2.5/§2.6): aggregation, joins
  * (broadcast/shuffle/semi/anti/range), windows, top-k, set ops,
  * rollup/cube, distinct counting. Each paired with DuckDB oracle SQL.
  *
  * Scale notes are per-query; the common theme: group-by keys are
  * low-cardinality (partial aggregation collapses map-side), dimension joins
  * are broadcast (no shuffle of the fact table), and sorts are top-k
  * (TakeOrderedAndProject — never a full global sort).
  */
object Relational {

  /** Exact sum of a 2-decimal double column: decimal-cast (exact) then one
    * double conversion. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  private val DSUM = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  val queries: Seq[Q] = Seq(

    // ---- A5/aggregation: TPC-H Q1-shaped pricing summary ------------------
    // Scale: 2-key groupBy → partial agg collapses each task to ≤6 rows;
    // shuffle is a few KB regardless of input size. Filter pushed to scan.
    Q("q01_pricing_summary", (s, dir) => {
      val li = table(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""), headline = true),

    // ---- F-family: filter + projection (pushdown exercise) ----------------
    // Scale: predicate + 3-col projection reach the parquet scan
    // (PushedFilters/ReadSchema) — reads a fraction of the file.
    Q("q02_filter_project", (s, dir) => {
      table(s, dir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    }, Some("""
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0""")),

    // ---- Join: shuffle join fact⋈fact-sized side ---------------------------
    // Scale: customer is the smaller side; at 100 TB this is a shuffle join
    // on c_custkey = o_custkey — AQE handles skew; output is 5 rows.
    Q("q03_join_agg", (s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"),
          countDistinct(col("c_custkey")).as("n_customers"))
    }, Some(s"""
      SELECT c_mktsegment, COUNT(*) AS n_orders,
        ${DSUM("o_totalprice")} AS sum_price,
        COUNT(DISTINCT c_custkey) AS n_customers
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment"""), headline = true),

    // ---- Star join: broadcast the dimension chain -------------------------
    // Scale: supplier/nation/region are tiny → broadcast() all three; the
    // fact table is never shuffled. This is THE 100 TB join shape.
    Q("q04_star_join", (s, dir) => {
      val li = table(s, dir, "lineitem")
      val su = table(s, dir, "supplier")
      val na = table(s, dir, "nation")
      val re = table(s, dir, "region")
      li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(na), su("s_nationkey") === na("n_nationkey"))
        .join(broadcast(re), na("n_regionkey") === re("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }, Some("""
      SELECT r_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name"""), headline = true),

    // ---- Window: latest order per customer --------------------------------
    // Scale: single hash-partition by customer + in-partition sort; no
    // global sort. Unique o_orderkey tiebreak ⇒ deterministic.
    Q("q05_window_latest", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      table(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
          col("o_totalprice").as("latest_price"))
    }, Some("""
      SELECT o_custkey, o_orderkey AS latest_orderkey, o_totalprice AS latest_price
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
              ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) rn
            FROM orders) WHERE rn = 1""")),

    // ---- Top-k: TakeOrderedAndProject, not a global sort ------------------
    Q("q06_topk", (s, dir) => {
      table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(25)
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""")),

    // ---- Set ops: INTERSECT / EXCEPT / UNION (set semantics) --------------
    Q("q08_setops", (s, dir) => {
      val o = table(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val i = a.intersect(b).agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
      val e = a.except(b).agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
      val u = a.union(b).distinct().agg(count(lit(1)).as("n")).withColumn("op", lit("union"))
      i.unionByName(e).unionByName(u).select(col("op"), col("n"))
    }, Some("""
      SELECT 'intersect' AS op, COUNT(*) AS n FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus='O'
        INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus='F')
      UNION ALL
      SELECT 'except' AS op, COUNT(*) AS n FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus='O'
        EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus='F')
      UNION ALL
      SELECT 'union' AS op, COUNT(*) AS n FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus='O'
        UNION SELECT o_custkey FROM orders WHERE o_orderstatus='F')""")),

    // ---- Set ops with BAG semantics (ALL variants) -------------------------
    // q08 gates set semantics; EXCEPT ALL / INTERSECT ALL are a different
    // operator (multiplicity arithmetic, no dedup): EXCEPT ALL keeps
    // max(m−n, 0) copies, INTERSECT ALL min(m, n). Spark plans both as
    // aggregate-count + generate (never a distinct), which the per-key
    // multiplicities here exercise: statuses repeat per custkey.
    Q("q111_setops_all", (s, dir) => {
      val o = table(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 150000.0)
        .select(col("o_custkey"), col("o_orderstatus"))
      val b = o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_custkey"), col("o_orderstatus"))
      val ea = a.exceptAll(b)
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"),
          sum(col("o_custkey")).as("sum_keys"))
        .withColumn("op", lit("except_all"))
      val ia = a.intersectAll(b)
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"),
          sum(col("o_custkey")).as("sum_keys"))
        .withColumn("op", lit("intersect_all"))
      ea.unionByName(ia)
        .select(col("op"), col("o_orderstatus"), col("n"), col("sum_keys"))
    }, Some("""
      SELECT 'except_all' AS op, o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_custkey) AS BIGINT) AS sum_keys
      FROM (
        SELECT o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 150000.0
        EXCEPT ALL
        SELECT o_custkey, o_orderstatus FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
      GROUP BY o_orderstatus
      UNION ALL
      SELECT 'intersect_all' AS op, o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_custkey) AS BIGINT) AS sum_keys
      FROM (
        SELECT o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 150000.0
        INTERSECT ALL
        SELECT o_custkey, o_orderstatus FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
      GROUP BY o_orderstatus""")),

    // ---- Rollup subtotals --------------------------------------------------
    Q("q09_rollup", (s, dir) => {
      val c = table(s, dir, "customer")
      val n = table(s, dir, "nation")
      val r = table(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(dsum(col("c_acctbal")).as("sum_bal"), count(lit(1)).as("n_cust"))
    }, Some(s"""
      SELECT r_name, n_name, ${DSUM("c_acctbal")} AS sum_bal, COUNT(*) AS n_cust
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)""")),

    // ---- Rollup with grouping indicators -----------------------------------
    // grouping()/grouping_id() are how a rollup consumer tells a subtotal
    // row's NULL from a data NULL — without them q09's shape is ambiguous
    // the moment a grouping column is nullable. The oracle derives the same
    // id from per-column GROUPING() arithmetic (explicit bit order:
    // grouping_id(a, b) = GROUPING(a)·2 + GROUPING(b)), so an engine
    // bit-order disagreement would surface as a hash mismatch.
    Q("q110_rollup_grouping_id", (s, dir) => {
      val o = table(s, dir, "orders")
      o.rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_prio"),
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    }, Some(s"""
      SELECT o_orderstatus, o_orderpriority,
        CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
        COUNT(*) AS n, ${DSUM("o_totalprice")} AS sum_price
      FROM orders
      GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""")),

    // ---- Cube --------------------------------------------------------------
    Q("q10_cube", (s, dir) => {
      table(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    }, Some(s"""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        ${DSUM("o_totalprice")} AS sum_price
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""")),

    // ---- Semi/anti joins ---------------------------------------------------
    // Scale: left_semi/left_anti never materialize the right side's payload;
    // broadcast when the key set is small.
    Q("q11_semi_anti", (s, dir) => {
      val c = table(s, dir, "customer")
      val bigOrders = table(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      val semi = c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .withColumn("kind", lit("has_big_order"))
      val anti = c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .withColumn("kind", lit("no_big_order"))
      semi.unionByName(anti).select(col("kind"), col("c_mktsegment"), col("n"))
    }, Some("""
      SELECT 'has_big_order' AS kind, c_mktsegment, COUNT(*) AS n FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      GROUP BY c_mktsegment
      UNION ALL
      SELECT 'no_big_order' AS kind, c_mktsegment, COUNT(*) AS n FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      GROUP BY c_mktsegment""")),

    // ---- Range (non-equi) join --------------------------------------------
    // Scale: equi-key narrows first (orderkey), range predicate filters
    // within the joined pairs — never a pure theta join.
    Q("q12_range_join", (s, dir) => {
      val o = table(s, dir, "orders")
      val li = table(s, dir, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") >= o("o_orderdate") &&
          li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("sum_price"))
    }, Some(s"""
      SELECT o_orderpriority, COUNT(*) AS n_lines, ${DSUM("l_extendedprice")} AS sum_price
      FROM orders JOIN lineitem
        ON o_orderkey = l_orderkey
        AND l_shipdate >= o_orderdate
        AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
      GROUP BY o_orderpriority""")),

    // ---- Aggregate variants: distinct count, conditional agg, min/max -----
    Q("q13_agg_variants", (s, dir) => {
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("n_discounted"),
          count(lit(1)).as("n"))
    }, Some("""
      SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT l_suppkey) AS n_supps,
        MIN(l_extendedprice) AS min_price,
        MAX(l_extendedprice) AS max_price,
        CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
        COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag""")),

    // ---- Modern aggregate surface: count_if / bool aggs / arg-extremes ----
    // count_if, bool_and/bool_or, and max_by/min_by (DuckDB arg_max/
    // arg_min). The arg-extremes order by price·1e9 + key — a double that
    // is monotone in (price, key) (2-decimal price steps map to ~1e7,
    // far above the key range, so distinct (price, key) pairs can't
    // collide). The gate rests on DETERMINISM, not exactness: 2-decimal
    // prices are not exactly representable in binary doubles, but both
    // engines evaluate the identical IEEE multiply-add on identical
    // inputs, so the ordering keys agree bit-for-bit. Bare max_by on a
    // tied price column is engine-nondeterministic, the same discipline
    // as every top-k here.
    Q("q114_agg_surface", (s, dir) => {
      table(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("count_if(o_totalprice > 200000.0)").as("n_big"),
          expr("bool_and(o_totalprice > 0.0)").as("all_positive"),
          expr("bool_or(o_orderpriority = '1-URGENT')").as("any_urgent"),
          expr("max_by(o_orderkey, o_totalprice * 1e9 + o_orderkey)").as("key_of_max"),
          expr("min_by(o_orderkey, o_totalprice * 1e9 + o_orderkey)").as("key_of_min"),
          count(lit(1)).as("n"))
    }, Some("""
      SELECT o_orderstatus,
        CAST(count_if(o_totalprice > 200000.0) AS BIGINT) AS n_big,
        bool_and(o_totalprice > 0.0) AS all_positive,
        bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        arg_max(o_orderkey, o_totalprice * 1e9 + o_orderkey) AS key_of_max,
        arg_min(o_orderkey, o_totalprice * 1e9 + o_orderkey) AS key_of_min,
        COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus""")),

    // ---- Approx distinct: Spark HLL sketch --------------------------------
    // Sketch values differ across engines by design, so the ESTIMATE is not
    // oracle-comparable — but the sketch's CONTRACT is: HLL++ at the default
    // rsd=0.05 must land within ±5·rsd of the exact count (5σ — loose
    // enough to be engine-stable, tight enough that a broken sketch fails).
    // The query therefore emits the exact count plus a bounded-error flag,
    // and the oracle asserts the same exact count with the flag true.
    Q("q14_approx_distinct", (s, dir) => {
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("__approx"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_parts"), col("n"),
          (abs(col("__approx") - col("exact_parts")).cast("double") /
            col("exact_parts") <= 0.25).as("approx_within_bound"))
    }, Some("""
      SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        COUNT(*) AS n, TRUE AS approx_within_bound
      FROM lineitem GROUP BY l_returnflag""")),

    // ---- Outer joins: left + full, null-side accounting --------------------
    // Filters force unmatched rows on BOTH sides (customers without big
    // orders; big orders of mod-7 customers outside the mod-3 customer
    // slice). The per-side key sums pin exactly WHICH rows are null-extended,
    // not just how many. Scale: same shuffle/broadcast planning as inner —
    // outer-ness only changes the null-extension at probe time.
    Q("q97_outer_join", (s, dir) => {
      val cust = table(s, dir, "customer")
        .filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_acctbal"))
      val ords = table(s, dir, "orders")
        .filter(col("o_custkey") % 7 === 0 && col("o_totalprice") > 250000.0)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("cust_price"))
      // one accounting block per join type — the side tag/sums must stay
      // identical across arms (and mirror the oracle's), so both are
      // generated from a single definition
      def arm(joinType: String, label: String) =
        cust.join(ords, cust("c_custkey") === ords("o_custkey"), joinType)
          .select(when(col("c_custkey").isNull, "right_only")
            .when(col("o_custkey").isNull, "left_only").otherwise("both").as("side"),
            col("c_custkey"), col("o_custkey"), col("n_orders"))
          .groupBy(col("side"))
          .agg(count(lit(1)).as("n"),
            sum(coalesce(col("c_custkey"), col("o_custkey"))).as("sum_keys"),
            sum(coalesce(col("n_orders"), lit(0L))).as("sum_orders"))
          .withColumn("join_type", lit(label))
      arm("full_outer", "full").unionByName(arm("left_outer", "left"))
        .select(col("join_type"), col("side"), col("n"), col("sum_keys"), col("sum_orders"))
    }, Some {
      def armSql(joinType: String, label: String) = s"""
        SELECT '$label' AS join_type,
          CASE WHEN c_custkey IS NULL THEN 'right_only'
               WHEN o_custkey IS NULL THEN 'left_only' ELSE 'both' END AS side,
          COUNT(*) AS n,
          CAST(SUM(COALESCE(c_custkey, o_custkey)) AS BIGINT) AS sum_keys,
          CAST(SUM(COALESCE(n_orders, 0)) AS BIGINT) AS sum_orders
        FROM cust $joinType JOIN ords ON c_custkey = o_custkey
        GROUP BY 2"""
      s"""
      WITH cust AS (
        SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 = 0),
      ords AS (
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders WHERE o_custkey % 7 = 0 AND o_totalprice > 250000.0
        GROUP BY o_custkey)
      ${armSql("FULL OUTER", "full")}
      UNION ALL
      ${armSql("LEFT OUTER", "left")}"""
    }),

    // ---- Correlated subqueries (decorrelation exercise) --------------------
    // Written as SQL so Catalyst's decorrelation does the rewriting: EXISTS
    // → left semi, NOT EXISTS → left anti, and a correlated scalar COUNT —
    // the classic hard case, because COUNT over an empty correlated group
    // must yield 0, not NULL (the decorrelated left-outer join must
    // null-repair the aggregate). The oracle runs the same standard SQL.
    // Scale: all three decorrelate to single equi-joins on l_orderkey — no
    // per-row subquery execution anywhere.
    Q("q98_correlated_subquery", (s, dir) => {
      table(s, dir, "orders").createOrReplaceTempView("orders_v")
      table(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT 'exists' AS variant, o_orderpriority, COUNT(*) AS n
        FROM orders_v o
        WHERE EXISTS (SELECT 1 FROM lineitem_v l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
        GROUP BY o_orderpriority
        UNION ALL
        SELECT 'not_exists' AS variant, o_orderpriority, COUNT(*) AS n
        FROM orders_v o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem_v l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
        GROUP BY o_orderpriority
        UNION ALL
        SELECT 'corr_count' AS variant, o_orderpriority, COUNT(*) AS n
        FROM orders_v o
        WHERE o.o_totalprice > 60000.0 * (SELECT COUNT(*) FROM lineitem_v l
                                          WHERE l.l_orderkey = o.o_orderkey)
        GROUP BY o_orderpriority""")
    }, Some("""
      SELECT 'exists' AS variant, o_orderpriority, COUNT(*) AS n
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      UNION ALL
      SELECT 'not_exists' AS variant, o_orderpriority, COUNT(*) AS n
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey
                          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      UNION ALL
      SELECT 'corr_count' AS variant, o_orderpriority, COUNT(*) AS n
      FROM orders o
      WHERE o.o_totalprice > 60000.0 * (SELECT COUNT(*) FROM lineitem l
                                        WHERE l.l_orderkey = o.o_orderkey)
      GROUP BY o_orderpriority""")),

    // ---- Salted join gate (the explicit skew-mitigation path) --------------
    // Skew.saltedJoin spreads each hot key over 8 salt buckets; the GATE is
    // that salting is invisible in the result — the oracle computes the
    // plain unsalted join. countDistinct(l_partkey) would catch a key lost
    // to a salt-range mismatch; n/sum_price catch duplicated matches.
    Q("q99_salted_join", (s, dir) => {
      val li = table(s, dir, "lineitem")
      val p = table(s, dir, "part").withColumnRenamed("p_partkey", "l_partkey")
      graft.operators.Skew.saltedJoin(li, p, "l_partkey", buckets = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("sum_price"),
          countDistinct(col("l_partkey")).as("n_parts"))
    }, Some(s"""
      SELECT p_brand, COUNT(*) AS n, ${DSUM("l_extendedprice")} AS sum_price,
        COUNT(DISTINCT l_partkey) AS n_parts
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand""")),

    // ---- Null-safe equality join (<=> / IS NOT DISTINCT FROM) --------------
    // Standard equi-joins drop NULL keys (NULL = NULL is NULL); a null-safe
    // join matches them — the semantics a dimension with an "unknown"
    // bucket needs. Both sides derive a nullable key (mod-7 keys become
    // NULL), so NULL↔NULL matches are actually exercised: the n_null_key
    // column counts them, and would be 0 under a plain equi-join. Spark
    // still plans <=> as a hash join (EqualNullSafe is a valid hash key),
    // not a cartesian.
    Q("q112_nullsafe_join", (s, dir) => {
      val c = table(s, dir, "customer")
        .withColumn("nk", when(col("c_custkey") % 7 === 0,
          lit(null).cast("long")).otherwise(col("c_nationkey")))
      val s2 = table(s, dir, "supplier")
        .withColumn("nk", when(col("s_suppkey") % 5 === 0,
          lit(null).cast("long")).otherwise(col("s_nationkey")))
      c.join(s2, c("nk") <=> s2("nk"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(when(c("nk").isNull, 1L).otherwise(0L)).as("n_null_key"),
          countDistinct(col("s_suppkey")).as("n_supps"))
    }, Some("""
      SELECT c_mktsegment, COUNT(*) AS n,
        CAST(SUM(CASE WHEN cnk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_key,
        COUNT(DISTINCT s_suppkey) AS n_supps
      FROM (SELECT c_mktsegment,
              CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END AS cnk
            FROM customer) c
      JOIN (SELECT s_suppkey,
              CASE WHEN s_suppkey % 5 = 0 THEN NULL ELSE s_nationkey END AS snk
            FROM supplier) s
        ON c.cnk IS NOT DISTINCT FROM s.snk
      GROUP BY c_mktsegment""")),

    // ---- Lateral correlated subquery (per-row top-k) ----------------------
    // The third decorrelation class after q98's EXISTS/scalar: a LATERAL
    // derived table with ORDER BY + LIMIT per outer row. Catalyst rewrites
    // it to a rank window with WindowGroupLimit — the group-limit runs as
    // partial top-k BELOW the exchange (plan-visible), so no per-row
    // subquery ever executes and the shuffle carries at most k rows per
    // order. The oracle runs the identical standard SQL.
    Q("q109_lateral_topk", (s, dir) => {
      table(s, dir, "orders").createOrReplaceTempView("orders_v")
      table(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
        FROM orders_v o,
        LATERAL (SELECT l_linenumber, l_extendedprice FROM lineitem_v li
                 WHERE li.l_orderkey = o.o_orderkey
                 ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
        WHERE o.o_custkey < 50""")
    }, Some("""
      SELECT o.o_orderkey, CAST(l.l_linenumber AS INT) AS l_linenumber,
        l.l_extendedprice
      FROM orders o,
      LATERAL (SELECT l_linenumber, l_extendedprice FROM lineitem li
               WHERE li.l_orderkey = o.o_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
      WHERE o.o_custkey < 50""")),

    // ---- Warehouse merge/upsert (latest version wins, partition-pruned) ----
    // The batch-ingest shape a partitioned warehouse lives on: base snapshot
    // (version 1, partitioned by status) + one update batch carrying an
    // in-place upsert (mod-19 keys: price + 1000), a PARTITION MOVE (mod-31
    // keys: status → 'X' — the old partition must shed the key), and inserts
    // (mod-53 keys shifted into a brand-new 'N' partition). Only affected
    // partitions are rewritten (WarehouseSpec asserts untouched files
    // survive byte-identical); the gate here is end-to-end content: the
    // read-back table must equal the oracle's window-derived latest-per-key
    // over base ∪ updates. sum_version proves every updated key carries v2;
    // sum_keys pins exactly which keys live in which partition.
    Q("q100_warehouse_merge", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      // per-invocation dir: a fixed path would race two concurrent JVMs
      val wh = java.nio.file.Files
        .createTempDirectory("graft-merge-q100").toString + "/wh"
      o.withColumn("version", lit(1L))
        .repartition(col("o_orderstatus"))
        .write.partitionBy("o_orderstatus").parquet(wh)
      val k = col("o_orderkey")
      val upserts = o.filter(k % 19 === 0 || k % 31 === 0)
        .withColumn("o_totalprice",
          when(k % 19 === 0, col("o_totalprice") + 1000.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(k % 31 === 0 && k % 19 =!= 0, lit("X"))
            .otherwise(col("o_orderstatus")))
        .withColumn("version", lit(2L))
      val inserts = o.filter(k % 53 === 0)
        .withColumn("o_orderkey", k + 100000000L)
        .withColumn("o_orderstatus", lit("N"))
        .withColumn("version", lit(2L))
      graft.sources.Warehouse.merge(s, wh, upserts.unionByName(inserts),
        "o_orderkey", "version", "o_orderstatus")
      val out = graft.sources.Warehouse.read(s, wh)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_keys"),
          dsum(col("o_totalprice")).as("sum_price"),
          sum(col("version")).as("sum_version"))
      // materialize the per-status summary (the query's own output, a
      // handful of rows), then scrub the fixture — bench/verify invoke this
      // run repeatedly, and each invocation would otherwise abandon a full
      // partitioned orders copy under the system tmpdir
      val rows = out.collect()
      val schema = out.schema
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close() // walk streams hold directory handles until closed
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }, Some("""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 1 AS version
        FROM orders),
      upd AS (
        SELECT o_orderkey, o_custkey,
          CASE WHEN o_orderkey % 31 = 0 AND o_orderkey % 19 <> 0
               THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
          CASE WHEN o_orderkey % 19 = 0
               THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice,
          2 AS version
        FROM orders WHERE o_orderkey % 19 = 0 OR o_orderkey % 31 = 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice, 2
        FROM orders WHERE o_orderkey % 53 = 0),
      merged AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY o_orderkey
                      ORDER BY version DESC) AS rn
          FROM (SELECT * FROM base UNION ALL SELECT * FROM upd))
        WHERE rn = 1)
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(version) AS BIGINT) AS sum_version
      FROM merged GROUP BY o_orderstatus""")),

    // ---- Manifest-committed merge (table-level atomic publish) ------------
    // q100's exact merge semantics (upsert + partition move + insert,
    // latest version wins) re-run through CommittedTable: segments staged
    // invisibly, ONE atomic manifest swap publishes, readers resolve
    // old-or-new and never a mix (CommittedTableSpec kills the publish at
    // every stage to prove it). Identical inputs ⇒ the q100 oracle applies
    // verbatim — the gate pins that the atomic-publish path changes
    // DURABILITY semantics, not merge semantics.
    Q("q119_committed_merge", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-merge-q119").toString + "/wh"
      graft.sources.CommittedTable.write(
        o.withColumn("version", lit(1L)), wh, "o_orderstatus")
      val k = col("o_orderkey")
      val upserts = o.filter(k % 19 === 0 || k % 31 === 0)
        .withColumn("o_totalprice",
          when(k % 19 === 0, col("o_totalprice") + 1000.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(k % 31 === 0 && k % 19 =!= 0, lit("X"))
            .otherwise(col("o_orderstatus")))
        .withColumn("version", lit(2L))
      val inserts = o.filter(k % 53 === 0)
        .withColumn("o_orderkey", k + 100000000L)
        .withColumn("o_orderstatus", lit("N"))
        .withColumn("version", lit(2L))
      graft.sources.CommittedTable.merge(s, wh, upserts.unionByName(inserts),
        "o_orderkey", "version", "o_orderstatus")
      val out = graft.sources.CommittedTable.read(s, wh)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_keys"),
          dsum(col("o_totalprice")).as("sum_price"),
          sum(col("version")).as("sum_version"))
      val rows = out.collect()
      val schema = out.schema
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }, Some("""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 1 AS version
        FROM orders),
      upd AS (
        SELECT o_orderkey, o_custkey,
          CASE WHEN o_orderkey % 31 = 0 AND o_orderkey % 19 <> 0
               THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
          CASE WHEN o_orderkey % 19 = 0
               THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice,
          2 AS version
        FROM orders WHERE o_orderkey % 19 = 0 OR o_orderkey % 31 = 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice, 2
        FROM orders WHERE o_orderkey % 53 = 0),
      merged AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY o_orderkey
                      ORDER BY version DESC) AS rn
          FROM (SELECT * FROM base UNION ALL SELECT * FROM upd))
        WHERE rn = 1)
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(version) AS BIGINT) AS sum_version
      FROM merged GROUP BY o_orderstatus""")),

    // ---- Zone-map range read over a committed table -----------------------
    // readRange prunes segments whose manifest min/max cannot intersect the
    // bound (metadata-only; CommittedTableSpec proves the pruned plan and
    // the typed — never lexical — compare), then applies the exact
    // predicate, so the answer must equal a plain filtered aggregate over
    // the same rows — which is exactly what the oracle computes. The gate
    // pins that zone maps change I/O, never results. Fixture-scrub
    // convention (q100/q119): the timed query writes its own table.
    Q("q124_zonemap_range", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-zm-q124").toString + "/wh"
      graft.sources.CommittedTable.write(o, wh, "o_orderstatus",
        statsCols = Seq("o_totalprice", "o_orderkey"))
      val out = graft.sources.CommittedTable.readRange(s, wh, "o_totalprice",
          Some(50000.0), Some(150000.0))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_keys"),
          dsum(col("o_totalprice")).as("sum_price"))
      val rows = out.collect()
      val schema = out.schema
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_totalprice >= 50000.0 AND o_totalprice <= 150000.0
      GROUP BY o_orderstatus""")),

    // ---- Multi-column zone-map range read ---------------------------------
    // Real range queries AND several predicates (here price ∧ key):
    // readRangeMulti intersects per-column segment-survival sets in ONE
    // manifest scan — a segment is read only when BOTH stored [min,max]
    // ranges can intersect their bounds — and the metadata cost stays one
    // manifest read + one schema probe regardless of predicate count.
    // The oracle is the same plain conjunctive filter; the gate pins the
    // conjunction semantics (inclusive bounds, per-column independence).
    // Fixture-scrub convention (q100/q119): the timed query writes its
    // own table.
    Q("q131_zonemap_multi", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-zm-q131").toString + "/wh"
      try {
        graft.sources.CommittedTable.write(o, wh, "o_orderstatus",
          statsCols = Seq("o_totalprice", "o_orderkey"),
          sortCols = Seq("o_orderkey"))
        val out = graft.sources.CommittedTable.readRangeMulti(s, wh, Seq(
            ("o_totalprice", Some(50000.0), Some(150000.0)),
            ("o_orderkey", Some(1000L), Some(40000L))))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_orderkey")).as("sum_keys"),
            dsum(col("o_totalprice")).as("sum_price"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_totalprice >= 50000.0 AND o_totalprice <= 150000.0
        AND o_orderkey >= 1000 AND o_orderkey <= 40000
      GROUP BY o_orderstatus""")),

    // ---- Change feed over a committed table (key-level CDC) ---------------
    // write (gen 1) then a merge (gen 2: price bumps on ~1% of keys), then
    // stream the table's change feed in keys mode through the REAL DSv1
    // source (AvailableNow → parquet sink → read back). The gate pins the
    // CDC contract end-to-end: gen 1's batch is the whole initial load,
    // gen 2's batch is ONLY the upserted rows — the hot partitions'
    // unchanged rows must NOT re-emit (the oracle has no path that would
    // produce them). Fixture-scrub convention (q100/q119): the timed query
    // writes its own table, checkpoint, and sink, and removes them.
    Q("q133_change_feed", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
      val root = java.nio.file.Files.createTempDirectory("graft-cf-q133")
      try {
        val wh = root.toString + "/wh"
        graft.sources.CommittedTable.write(o, wh, "o_orderstatus")
        val upserts = o.filter(col("o_orderkey") % 97 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .withColumn("version", lit(2L))
        graft.sources.CommittedTable.merge(s, wh, upserts,
          "o_orderkey", "version", "o_orderstatus")
        val sink = root.toString + "/out"
        val q = graft.streaming.ChangeFeed
          .read(s, wh, keyDelta = Some(("o_orderkey", "version")))
          .writeStream.format("parquet").option("path", sink)
          .option("checkpointLocation", root.toString + "/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(120000)
        val out = s.read.parquet(sink)
          .groupBy(col("_change_gen").as("change_gen"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_orderkey")).as("sum_keys"),
            dsum(col("o_totalprice")).as("sum_price"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }, Some("""
      WITH feed AS (
        SELECT CAST(1 AS BIGINT) AS change_gen, o_orderkey, o_orderstatus,
          o_totalprice
        FROM orders
        UNION ALL
        SELECT CAST(2 AS BIGINT), o_orderkey, o_orderstatus,
          o_totalprice + 1000.0
        FROM orders WHERE o_orderkey % 97 = 0)
      SELECT change_gen, o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM feed GROUP BY change_gen, o_orderstatus""")),

    // ---- Row-level DELETE on a committed table ----------------------------
    // The right-to-be-forgotten primitive: delete every row matching a
    // predicate (price band ∪ a key residue class — cross-partition, with
    // survivors in every touched partition) by rewriting ONLY affected
    // partitions behind one manifest swap, then read the table back. The
    // oracle is a plain NOT-filter over the original rows — delete must
    // equal "the table, minus exactly the matching rows", nothing about
    // the publish mechanics visible in the data. Fixture-scrub convention
    // (q100/q119).
    Q("q134_committed_delete", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-del-q134").toString + "/wh"
      try {
        graft.sources.CommittedTable.write(o, wh, "o_orderstatus")
        graft.sources.CommittedTable.delete(s, wh,
          col("o_totalprice") > 250000.0 || col("o_orderkey") % 13 === 0,
          "o_orderstatus")
        val out = graft.sources.CommittedTable.read(s, wh)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_orderkey")).as("sum_keys"),
            dsum(col("o_totalprice")).as("sum_price"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE NOT (o_totalprice > 250000.0 OR o_orderkey % 13 = 0)
      GROUP BY o_orderstatus""")),

    // ---- Metadata-only COUNT(*) (manifest row counts) ---------------------
    // write + merge (q119's exact batch construction), then read per-
    // partition counts from the MANIFEST — rowCounts() plans zero jobs and
    // opens zero files; the oracle recomputes the merged table and counts
    // it the hard way. A drifted count would hash-mismatch. Fixture-scrub
    // convention (q100/q119).
    Q("q139_metadata_count", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-cnt-q139").toString + "/wh"
      try {
        graft.sources.CommittedTable.write(
          o.withColumn("version", lit(1L)), wh, "o_orderstatus")
        val k = col("o_orderkey")
        val upserts = o.filter(k % 19 === 0 || k % 31 === 0)
          .withColumn("o_orderstatus",
            when(k % 31 === 0 && k % 19 =!= 0, lit("X"))
              .otherwise(col("o_orderstatus")))
          .withColumn("version", lit(2L))
        val inserts = o.filter(k % 53 === 0)
          .withColumn("o_orderkey", k + 100000000L)
          .withColumn("o_orderstatus", lit("N"))
          .withColumn("version", lit(2L))
        graft.sources.CommittedTable.merge(s, wh,
          upserts.unionByName(inserts), "o_orderkey", "version",
          "o_orderstatus")
        val counts = graft.sources.CommittedTable.rowCounts(s, wh)
          .getOrElse(throw new IllegalStateException(
            "manifest lacks row counts — the metadata path is broken"))
        import s.implicits._
        counts.toSeq.toDF("o_orderstatus", "n_rows")
          .orderBy(col("o_orderstatus"))
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }, Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus FROM orders),
      upd AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 31 = 0 AND o_orderkey % 19 <> 0
               THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
          2 AS version
        FROM orders WHERE o_orderkey % 19 = 0 OR o_orderkey % 31 = 0
        UNION ALL
        SELECT o_orderkey + 100000000, 'N', 2
        FROM orders WHERE o_orderkey % 53 = 0),
      merged AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY o_orderkey
                      ORDER BY version DESC) AS rn
          FROM (SELECT o_orderkey, o_orderstatus, 1 AS version FROM base
                UNION ALL SELECT * FROM upd))
        WHERE rn = 1)
      SELECT o_orderstatus, COUNT(*) AS n_rows
      FROM merged GROUP BY o_orderstatus""")),

    // ---- Z-order compact + conjunctive zone-map read ----------------------
    // q131's read with the layout rewritten by compactZOrder first: the
    // multi-dimensional clustering must be LAYOUT-ONLY (the oracle is the
    // same plain conjunctive filter — any content drift fails the hash),
    // and the zone-map prune still composes (fresh per-segment stats are
    // recomputed from the staged files). Fixture-scrub convention.
    Q("q138_zorder_read", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-zo-q138").toString + "/wh"
      try {
        graft.sources.CommittedTable.write(o, wh, "o_orderstatus",
          statsCols = Seq("o_totalprice", "o_orderkey"))
        graft.sources.CommittedTable.compactZOrder(s, wh, "o_orderstatus",
          Seq("o_totalprice", "o_orderkey"), bits = 10)
        val out = graft.sources.CommittedTable.readRangeMulti(s, wh, Seq(
            ("o_totalprice", Some(80000.0), Some(200000.0)),
            ("o_orderkey", Some(500L), Some(60000L))))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_orderkey")).as("sum_keys"),
            dsum(col("o_totalprice")).as("sum_price"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_totalprice >= 80000.0 AND o_totalprice <= 200000.0
        AND o_orderkey >= 500 AND o_orderkey <= 60000
      GROUP BY o_orderstatus""")),

    // ---- Full CDF (insert/update-pre/post/delete) over two generations ----
    // gen 2 = a merge (price bumps on ~1% of keys + shifted-key inserts),
    // gen 3 = a delete of a residue class. The CDF of each generation is
    // re-derived in SQL from the same construction: gen 2 classifies the
    // bumped keys as update pre+post pairs and the shifted keys as
    // inserts; gen 3 tombstones exactly the deleted survivors. The gate
    // hashes per-(gen, type) aggregates — the classification itself, not
    // just row counts. Fixture-scrub convention (q100/q119).
    Q("q137_change_feed_cdf", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-cdf-q137").toString + "/wh"
      try {
        graft.sources.CommittedTable.write(o, wh, "o_orderstatus",
          retainGenerations = 4)
        val k = col("o_orderkey")
        val upserts = o.filter(k % 97 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .withColumn("version", lit(2L))
        val inserts = o.filter(k % 101 === 0)
          .withColumn("o_orderkey", k + 100000000L)
          .withColumn("version", lit(2L))
        graft.sources.CommittedTable.merge(s, wh,
          upserts.unionByName(inserts), "o_orderkey", "version",
          "o_orderstatus") // gen 2
        graft.sources.CommittedTable.delete(s, wh, k % 89 === 0,
          "o_orderstatus") // gen 3
        val cdf = Seq(2L, 3L).map(g =>
          graft.sources.CommittedTable
            .changesCdf(s, wh, g, "o_orderkey", "version")
            .withColumn("change_gen", lit(g)))
          .reduce(_ unionByName _)
        val out = cdf.groupBy(col("change_gen"),
            col(graft.sources.CommittedTable.ChangeTypeColumn)
              .as("change_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_orderkey")).as("sum_keys"),
            dsum(col("o_totalprice")).as("sum_price"),
            sum(col("version")).as("sum_version"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }, Some("""
      WITH cdf AS (
        -- gen 2: the ~1% bumped keys as update pre+post, shifted keys as inserts
        SELECT CAST(2 AS BIGINT) AS change_gen, 'update_postimage' AS change_type,
          o_orderkey, o_totalprice + 1000.0 AS o_totalprice, 2 AS version
        FROM orders WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT 2, 'update_preimage', o_orderkey, o_totalprice, 1
        FROM orders WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT 2, 'insert', o_orderkey + 100000000, o_totalprice, 2
        FROM orders WHERE o_orderkey % 101 = 0
        UNION ALL
        -- gen 3: tombstones for the deleted residue class, at its CURRENT
        -- (post-gen-2) values — bumped keys carry the bump, and the
        -- shifted inserts are deleted only if their NEW key matches
        SELECT 3, 'delete', o_orderkey,
          CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000.0
               ELSE o_totalprice END,
          CASE WHEN o_orderkey % 97 = 0 THEN 2 ELSE 1 END
        FROM orders WHERE o_orderkey % 89 = 0
        UNION ALL
        SELECT 3, 'delete', o_orderkey + 100000000, o_totalprice, 2
        FROM orders WHERE o_orderkey % 101 = 0
          AND (o_orderkey + 100000000) % 89 = 0)
      SELECT change_gen, change_type, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(version) AS BIGINT) AS sum_version
      FROM cdf GROUP BY change_gen, change_type""")),

    // ---- Row-level UPDATE on a committed table ----------------------------
    // UPDATE ... SET price = price*2+10 (exact in binary, no rounding hazard), status untouched, WHERE a key
    // residue class matches — partitions without a match keep their
    // original segments. The oracle is the CASE-mapped table: update must
    // equal "the table with the expression applied to exactly the
    // matching rows". Fixture-scrub convention (q100/q119).
    Q("q136_committed_update", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-upd-q136").toString + "/wh"
      try {
        graft.sources.CommittedTable.write(o, wh, "o_orderstatus")
        graft.sources.CommittedTable.update(s, wh,
          col("o_orderkey") % 7 === 0,
          Map("o_totalprice" -> (col("o_totalprice") * 2.0 + 10.0)),
          "o_orderstatus")
        val out = graft.sources.CommittedTable.read(s, wh)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_orderkey")).as("sum_keys"),
            dsum(col("o_totalprice")).as("sum_price"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0
          THEN o_totalprice * 2.0 + 10.0 ELSE o_totalprice END
          AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY o_orderstatus""")),

    // ---- Time-travel read of a committed table ----------------------------
    // write (gen 1) then a destructive merge (gen 2: price bumps + status
    // moves); readAt(1) must reproduce the PRE-merge table exactly — the
    // oracle aggregates the original orders, untouched by the update
    // batch the live read would see. Snapshot isolation as a hash-gated
    // fact, not a doc claim. Fixture-scrub convention (q100/q119).
    Q("q126_time_travel", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-tt-q126").toString + "/wh"
      graft.sources.CommittedTable.write(o, wh, "o_orderstatus",
        retainGenerations = 3)
      val k = col("o_orderkey")
      val upd = o.filter(k % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 5000.0)
        .withColumn("o_orderstatus",
          when(k % 21 === 0, lit("Z")).otherwise(col("o_orderstatus")))
        .withColumn("version", lit(2L))
      graft.sources.CommittedTable.merge(s, wh, upd,
        "o_orderkey", "version", "o_orderstatus")
      val out = graft.sources.CommittedTable.readAt(s, wh, gen = 1L)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_keys"),
          dsum(col("o_totalprice")).as("sum_price"))
      val rows = out.collect()
      val schema = out.schema
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY o_orderstatus""")),

    // ---- Warehouse merge with schema evolution (widened update batch) -----
    // q100's merge shape plus the add-column path (r10 verdict ask #2): the
    // update batch carries a NEW nullable `source` column; merge rewrites
    // ONLY the touched partitions with the widened schema (WarehouseSpec
    // proves untouched files stay byte-identical) and readEvolved NULL-fills
    // the column for old-generation rows — the standard warehouse
    // add-column semantics (metadata now, rewrite never). The gate pins the
    // evolved read end-to-end: per-status counts split by source
    // present/absent, prices proving upserts landed, versions proving
    // latest-wins survived the widen.
    Q("q116_merge_schema_evolution", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-merge-q116").toString + "/wh"
      o.withColumn("version", lit(1L))
        .repartition(col("o_orderstatus"))
        .write.partitionBy("o_orderstatus").parquet(wh)
      val k = col("o_orderkey")
      val upd = o.filter(k % 17 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 500.0)
        .withColumn("version", lit(2L))
        .withColumn("source", concat(lit("feed-"), (k % 3).cast("string")))
      graft.sources.Warehouse.merge(s, wh, upd,
        "o_orderkey", "version", "o_orderstatus", allowAddColumns = true)
      val out = graft.sources.Warehouse.readEvolved(s, wh, "o_orderstatus")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("source").isNull, 1L).otherwise(0L)).as("n_legacy"),
          count(col("source")).as("n_sourced"),
          sum(length(col("source"))).as("len_sources"),
          dsum(col("o_totalprice")).as("sum_price"),
          sum(col("version")).as("sum_version"))
      val rows = out.collect()
      val schema = out.schema
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }, Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version,
          CAST(NULL AS VARCHAR) AS source
        FROM orders),
      upd AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice + 500.0 AS o_totalprice,
          2 AS version, 'feed-' || CAST(o_orderkey % 3 AS VARCHAR) AS source
        FROM orders WHERE o_orderkey % 17 = 0),
      merged AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY o_orderkey
                      ORDER BY version DESC) AS rn
          FROM (SELECT * FROM base UNION ALL SELECT * FROM upd))
        WHERE rn = 1)
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
        CAST(COUNT(source) AS BIGINT) AS n_sourced,
        CAST(SUM(LENGTH(source)) AS BIGINT) AS len_sources,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(version) AS BIGINT) AS sum_version
      FROM merged GROUP BY o_orderstatus""")),

    // ---- Bloom sidecars: segment-level point-lookup skipping --------------
    // The table blooms o_orderkey; readKeys consults per-segment `_bloom-*`
    // sidecars so an id probe opens only segments that can contain a probed
    // key (no false negatives ⇒ answer identical to a full semi-join — the
    // oracle IS the full-scan IN-list). Fixture-scrub convention (q100/q119).
    Q("q146_bloom_point_lookup", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-bloom-q146").toString + "/wh"
      try {
        graft.sources.CommittedTable.write(o, wh, "o_orderstatus",
          keyCol = Some("o_orderkey"), bloomCols = Seq("o_orderkey"))
        import s.implicits._
        val probes = Seq(1L, 7L, 32L, 69L, 134L, 999999999L).toDF("o_orderkey")
        val out = graft.sources.CommittedTable.readKeys(s, wh, probes,
          "o_orderkey")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders
      WHERE o_orderkey IN (1, 7, 32, 69, 134, 999999999)""")),

    // ---- Bloom-pruned bulk key delete -------------------------------------
    // deleteKeys' affected-partition discovery consults the sidecars before
    // scanning anything; the final table must equal the oracle's NOT IN —
    // the sidecars change the I/O of the discovery, never the result.
    Q("q147_bloom_delete_keys", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-blodel-q147").toString + "/wh"
      try {
        graft.sources.CommittedTable.write(o, wh, "o_orderstatus",
          keyCol = Some("o_orderkey"), bloomCols = Seq("o_orderkey"))
        import s.implicits._
        val doomed = Seq(1L, 3L, 5L, 32L, 69L, 134L, 999999999L)
        graft.sources.CommittedTable.deleteKeys(s, wh,
          doomed.toDF("o_orderkey"), "o_orderkey", "o_orderstatus")
        val out = graft.sources.CommittedTable.read(s, wh)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_orderkey")).as("sum_keys"),
            dsum(col("o_totalprice")).as("sum_price"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_orderkey NOT IN (1, 3, 5, 32, 69, 134, 999999999)
      GROUP BY o_orderstatus""")),

    // ---- Composite (multi-column) partitioning ----------------------------
    // documents partitioned by (lang, source) through the composite-key
    // encoding; the update batch upserts AND moves rows across composite
    // partitions (source reassignment), then a MID-key component probe
    // (source alone, every lang) range-reads through the per-component zone
    // maps — the prune hive prefix-dirs cannot express. Fixture-scrub
    // convention (q100/q119).
    Q("q148_composite_partition", (s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .withColumn("version", lit(1L))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-comp-q148").toString + "/wh"
      try {
        graft.sources.CommittedTable.writeComposite(d, wh, Seq("lang", "source"),
          keyCol = Some("doc_id"), versionCol = Some("version"))
        val k = col("doc_id")
        val upserts = d.filter(k % 7 === 0)
          .withColumn("n_chars", col("n_chars") + 1000L)
          .withColumn("version", lit(2L))
        val moves = d.filter(k % 11 === 0 && k % 7 =!= 0)
          .withColumn("source", lit("resync"))
          .withColumn("version", lit(2L))
        graft.sources.CommittedTable.mergeComposite(s, wh,
          upserts.unionByName(moves), "doc_id", "version", Seq("lang", "source"))
        val out = graft.sources.CommittedTable.readRangeMulti(s, wh,
            Seq(("source", Some("src7"), Some("src7"))))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(col("doc_id")).as("sum_ids"),
            sum(col("n_chars")).as("sum_chars"),
            sum(col("version")).as("sum_version"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }, Some("""
      WITH base AS (
        SELECT doc_id, lang, source, n_chars, 1 AS version FROM documents),
      upd AS (
        SELECT doc_id, lang, source, n_chars + 1000 AS n_chars, 2 AS version
        FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id, lang, 'resync', n_chars, 2
        FROM documents WHERE doc_id % 11 = 0 AND doc_id % 7 <> 0),
      merged AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY version DESC) AS rn
          FROM (SELECT * FROM base UNION ALL SELECT * FROM upd))
        WHERE rn = 1)
      SELECT lang, COUNT(*) AS n,
        CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        CAST(SUM(version) AS BIGINT) AS sum_version
      FROM merged WHERE source = 'src7' GROUP BY lang"""))
  )
}
