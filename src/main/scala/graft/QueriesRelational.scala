package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operators on the TPC-H-ish tables: scan, project,
  * filter, aggregate, join (broadcast + shuffle), window, top-k,
  * semi/anti join, set ops, scalar functions.
  *
  * The reference has no relational query layer (SURVEY.md §2.4) — these
  * exercise the Spark substrate every other graft operator builds on,
  * and double as the BENCH headline queries.
  */
object QueriesRelational {

  def all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12,
                        q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24,
                        q25, q26, q27, q28, q29, q30, q31, q32, q33, q34)

  /** TPC-H Q1 shape: big scan + hash aggregate. The filter and the
    * 4-column projection push down to the parquet scan; sums are
    * decimal-exact so AQE partition coalescing can't perturb them.
    * The FINAL aggregates are rendered: scale-2 sums cast to double
    * (exact — every cent value fits a double), scale-10 sums to their
    * fixed-format decimal STRING, because the driver's cross-engine
    * hash trips on decimals' physical representation (round-1
    * hash-fail with values exactly equal) and DuckDB's decimal→double
    * conversion double-rounds at high scale where Spark's is
    * correctly rounded. String rendering is exact in both engines. */
  private def q01 = Q("q01_agg_pricing_summary",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(28,10)"))
            .cast("decimal(38,10)").cast("string").as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
            .cast("decimal(28,10)")).cast("decimal(38,10)").cast("string").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DECIMAL(38,10)) AS VARCHAR) AS sum_disc_price,
           |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,10))) AS DECIMAL(38,10)) AS VARCHAR) AS sum_charge,
           |  count(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** Selective filter + narrow projection: the plan must show
    * PushedFilters + a 4-column ReadSchema (verified in PlanSpec). */
  private def q02 = Q("q02_filter_project",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1996-04-01").cast("timestamp") &&
                col("l_discount") > lit(0.05))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
           |  AND l_discount > 0.05
           |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** Multi-way join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.
    * nation/region are broadcast explicitly (tiny dims); the
    * lineitem⋈orders join shuffles on orderkey and AQE picks the rest. */
  private def q03 = Q("q03_join_revenue_by_nation",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      val c  = Tables.customer(s, dir)
      val n  = Tables.nation(s, dir)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(28,10)"))
               .cast("decimal(38,10)").as("revenue_dec"),
             count(lit(1)).as("n_items"))
        // order on the exact decimal, render as fixed-format string
        // (DuckDB decimal→double double-rounds at scale 10)
        .orderBy(col("revenue_dec").desc, col("n_name"))
        .select(col("n_name"), col("revenue_dec").cast("string").as("revenue"), col("n_items"))
    },
    Some("""SELECT n_name, CAST(revenue_dec AS VARCHAR) AS revenue, n_items FROM (
           |  SELECT n_name,
           |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DECIMAL(38,10)) AS revenue_dec,
           |    count(*) AS n_items
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |    JOIN customer ON o_custkey = c_custkey
           |    JOIN nation ON c_nationkey = n_nationkey
           |  GROUP BY n_name) t
           |ORDER BY revenue_dec DESC, n_name""".stripMargin))

  /** Top-k with full deterministic tiebreak (sort + limit → Spark plans
    * a TakeOrderedAndProject, no full sort at scale). */
  private def q04 = Q("q04_topk_orders",
    (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
           |FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey
           |LIMIT 10""".stripMargin))

  /** Window function: latest order per customer (one shuffle on
    * custkey + in-partition sort). */
  private def q05 = Q("q05_window_latest_order",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
           |  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           |  FROM orders) t
           |WHERE rn = 1
           |ORDER BY o_custkey""".stripMargin))

  /** Semi + anti join — customers with open orders vs without any. */
  private def q06 = Q("q06_semi_anti_join",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
      val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without_orders"))
      withOrders.join(withoutOrders, Seq("c_mktsegment"), "full_outer")
        .select(col("c_mktsegment"),
                coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
                coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""WITH w AS (
           |  SELECT c_mktsegment, count(*) AS n_with_orders FROM customer
           |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           |  GROUP BY c_mktsegment),
           |wo AS (
           |  SELECT c_mktsegment, count(*) AS n_without_orders FROM customer
           |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           |  GROUP BY c_mktsegment)
           |SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
           |       coalesce(n_with_orders, 0) AS n_with_orders,
           |       coalesce(n_without_orders, 0) AS n_without_orders
           |FROM w FULL OUTER JOIN wo USING (c_mktsegment)
           |ORDER BY c_mktsegment""".stripMargin))

  /** Set operators: nations that have customers vs suppliers. */
  private def q07 = Q("q07_set_ops",
    (s, dir) => {
      val cn = Tables.customer(s, dir).select(col("c_nationkey").cast("int").as("nk")).distinct()
      val sn = Tables.supplier(s, dir).select(col("s_nationkey").cast("int").as("nk")).distinct()
      val both     = cn.intersect(sn).withColumn("tag", lit("both"))
      val custOnly = cn.except(sn).withColumn("tag", lit("customer_only"))
      val suppOnly = sn.except(cn).withColumn("tag", lit("supplier_only"))
      both.unionByName(custOnly).unionByName(suppOnly).orderBy(col("nk"), col("tag"))
    },
    Some("""WITH cn AS (SELECT DISTINCT CAST(c_nationkey AS INT) AS nk FROM customer),
           |     sn AS (SELECT DISTINCT CAST(s_nationkey AS INT) AS nk FROM supplier)
           |SELECT nk, 'both' AS tag FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
           |UNION ALL
           |SELECT nk, 'customer_only' AS tag FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
           |UNION ALL
           |SELECT nk, 'supplier_only' AS tag FROM (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
           |ORDER BY nk, tag""".stripMargin))

  /** Scalar-function parity pack — the reference's string/hash toolkit
    * (HashFunction.java:18-63 md5/sha; name sanitization regexes;
    * base64 at HttpChangeConsumer.java:206-209) as Spark builtins. */
  private def q08 = Q("q08_scalar_funcs",
    (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_partkey") <= 100)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          md5(col("p_name")).as("md5_hex"),
          sha2(col("p_name"), 256).as("sha256_hex"),
          base64(col("p_name").cast("binary")).as("b64"),
          regexp_replace(col("p_type"), "\\s+", "_").as("type_snake"),
          length(col("p_name")).as("name_len"),
          substring(col("p_brand"), 1, 5).as("brand5"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
           |  upper(p_name) AS uname,
           |  md5(p_name) AS md5_hex,
           |  sha256(p_name) AS sha256_hex,
           |  to_base64(encode(p_name)) AS b64,
           |  regexp_replace(p_type, '\s+', '_', 'g') AS type_snake,
           |  CAST(length(p_name) AS INT) AS name_len,
           |  substr(p_brand, 1, 5) AS brand5,
           |  concat_ws('|', p_brand, p_type) AS brand_type
           |FROM part
           |WHERE p_partkey <= 100
           |ORDER BY p_partkey""".stripMargin))

  /** As-of join (operators.TemporalJoin.asOf): each click event picks
    * up the latest purchase by the same user at or before its
    * timestamp — the temporal-join shape a CDC consumer uses to enrich
    * a fact stream with Debezium-fed dimension state at event time.
    * One shuffle + one sort, no join explosion (see TemporalJoin).
    * Oracle = DuckDB's native ASOF LEFT JOIN over the same frames. */
  private def q09 = Q("q09_asof_join",
    (s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      val l = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      val r = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("matched_event_id"),
          col("value").as("matched_value"))
      graft.operators.TemporalJoin.asOf(l, r,
          keyCols = Seq("user_id"), leftTime = "ts_us", rightTime = "ts_us",
          payloadCols = Seq("matched_event_id", "matched_value"),
          tiebreakCols = Seq("matched_event_id"),
          matchedTimeAs = Some("matched_ts_us"))
        .orderBy(col("event_id"))
    },
    Some(
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, value
        |  FROM events WHERE event_type = 'click'),
        |r0 AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id, value
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (  -- ties on (user, ts) resolved to the max event id, like
        |        -- the Spark side's ascending tiebreak (last wins)
        |  SELECT user_id, ts_us, max_by(event_id, event_id) AS matched_event_id,
        |         max_by(value, event_id) AS matched_value
        |  FROM r0 GROUP BY user_id, ts_us)
        |SELECT l.event_id, l.user_id, l.ts_us, l.value,
        |       r.matched_event_id, r.matched_value, r.ts_us AS matched_ts_us
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
        |ORDER BY l.event_id""".stripMargin))

  /** Point-in-range (interval) join (operators.TemporalJoin
    * .pointInRange): clicks landing inside the 5-minute window opened
    * by each error event of the same user, aggregated per window.
    * Planned as an EQUI join on (user, time bin) — not the
    * BroadcastNestedLoopJoin Spark gives a raw inequality join —
    * so it shuffles once and scales linearly in matches. */
  private def q10 = Q("q10_range_join",
    (s, dir) => {
      val win = 300000000L // 5 minutes in micros = the bin width
      val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      val r = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("range_id"), col("user_id"),
          col("ts_us").as("w_start"), (col("ts_us") + win).as("w_end"))
      val p = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("p_ts"),
          col("event_id").as("p_id"), col("value").as("p_value"))
      val joined = graft.operators.TemporalJoin.pointInRange(p, r,
        keyCols = Seq("user_id"), pointTime = "p_ts",
        rangeStart = "w_start", rangeEnd = "w_end", binWidth = win)
      val agg = joined.groupBy(col("range_id"))
        .agg(count(col("p_id")).as("n_clicks"),
          sum(col("p_value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      r.join(agg, Seq("range_id"), "left")
        .select(col("range_id"), col("user_id"), col("w_start"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"), col("sum_value"))
        .orderBy(col("range_id"))
    },
    Some(
      """WITH r AS (
        |  SELECT event_id AS range_id, user_id,
        |         epoch_ns(ts) // 1000 AS w_start,
        |         epoch_ns(ts) // 1000 + 300000000 AS w_end
        |  FROM events WHERE event_type = 'error'),
        |p AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS p_ts, event_id AS p_id, value AS p_value
        |  FROM events WHERE event_type = 'click')
        |SELECT r.range_id, r.user_id, r.w_start,
        |       count(p.p_id) AS n_clicks,
        |       CAST(sum(CAST(p.p_value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM r LEFT JOIN p
        |  ON r.user_id = p.user_id AND p.p_ts >= r.w_start AND p.p_ts <= r.w_end
        |GROUP BY r.range_id, r.user_id, r.w_start
        |ORDER BY r.range_id""".stripMargin))

  /** Multi-level aggregation: ROLLUP over (returnflag, linestatus)
    * with a grouping id. One hash aggregate evaluates every grouping
    * set in the same pass (Spark plans Expand + a single aggregate —
    * no per-level rescans), so the 100 TB cost is one scan + one
    * shuffle whatever the level count. Null group keys are rendered
    * as 'ALL' so cross-engine null-ordering differences can't bite. */
  private def q11 = Q("q11_grouping_sets",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("int").as("gid"),
             sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
             sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
             count(lit(1)).as("n_rows"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
                coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
                col("gid"), col("sum_qty"), col("sum_base_price"), col("n_rows"))
        .orderBy(col("gid"), col("returnflag"), col("linestatus")),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           |  coalesce(l_linestatus, 'ALL') AS linestatus,
           |  CAST(GROUPING_ID(l_returnflag, l_linestatus) AS INT) AS gid,
           |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           |  count(*) AS n_rows
           |FROM lineitem
           |GROUP BY ROLLUP(l_returnflag, l_linestatus)
           |ORDER BY gid, returnflag, linestatus""".stripMargin))

  /** Pivot: linestatus values become columns (sum + count per cell).
    * Spark's pivot with an EXPLICIT value list compiles to conditional
    * aggregates inside one hash aggregate — same single-scan shape as
    * the oracle's CASE form; never omit the list at scale (value
    * discovery adds a driver-side distinct pass over the pivot column). */
  private def q12 = Q("q12_pivot",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
             count(lit(1)).as("n"))
        .select(col("l_returnflag"),
                col("F_sum_qty").as("f_sum_qty"), col("F_n").as("f_n"),
                col("O_sum_qty").as("o_sum_qty"), col("O_n").as("o_n"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
           |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS f_sum_qty,
           |  count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS f_n,
           |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS o_sum_qty,
           |  count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS o_n
           |FROM lineitem
           |GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin))

  /** Correlated scalar subquery (TPC-H Q17 shape), deliberately
    * entered through the SQL API: Catalyst DECORRELATES the per-part
    * average into a join against a grouped aggregate — the plan a
    * 100 TB run needs (one aggregate + one shuffle join), not a
    * per-row re-scan. Sums stay decimal-exact; the final division is
    * one IEEE double op both engines run identically. */
  private def q13 = Q("q13_correlated_subquery",
    (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
      s.sql("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
              |       count(*) AS n_rows
              |FROM v_lineitem l1
              |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
              |                    FROM v_lineitem l2
              |                    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)
    },
    Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           |       count(*) AS n_rows
           |FROM lineitem l1
           |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
           |                    FROM lineitem l2
           |                    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin))

  /** Window FRAMES (beyond q05's row_number ranking): running total
    * (unbounded preceding), 3-row moving average, lag/lead — one
    * shuffle on the partition key, one in-partition sort, every frame
    * evaluated in the same window pass. The moving average is
    * sum/count over exact decimals with one final double division,
    * sidestepping avg()'s engine-specific decimal typing. */
  private def q14 = Q("q14_window_frames",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val w3 = w.rowsBetween(-2, Window.currentRow)
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dec = col("o_totalprice").cast("decimal(18,2)")
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
          sum(dec).over(wRun).cast("double").as("running_total"),
          (sum(dec).over(w3).cast("double") / count(lit(1)).over(w3)).as("mavg3"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER run AS DOUBLE) AS running_total,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
           |    / count(*) OVER w3 AS mavg3,
           |  lag(o_totalprice, 1) OVER ord AS prev_price,
           |  lead(o_totalprice, 1) OVER ord AS next_price
           |FROM orders
           |WINDOW
           |  ord AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           |  run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           |  w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin))

  /** UNPIVOT / melt: four lineitem measures rotate into (measure,
    * value) rows in ONE scan — Spark's `unpivot` plans an Expand (the
    * same single-pass node as q11's grouping sets), NOT four
    * self-unions, so the table is read once and the per-measure
    * aggregate collapses map-side (≤ 4·partitions rows shuffle). The
    * oracle renders the same relation as UNION ALL — the semantic
    * definition of the rotation. */
  private def q15 = Q("q15_unpivot",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
                col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_orderkey")),
                 Array(col("l_quantity"), col("l_extendedprice"),
                       col("l_discount"), col("l_tax")),
                 "measure", "value")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n_rows"),
             sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
             min(col("value")).as("min_value"),
             max(col("value")).as("max_value"))
        .orderBy(col("measure"))
    },
    Some("""WITH u AS (
           |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
           |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
           |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
           |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
           |SELECT measure, count(*) AS n_rows,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           |  min(value) AS min_value, max(value) AS max_value
           |FROM u
           |GROUP BY measure
           |ORDER BY measure""".stripMargin))

  /** EXACT per-group quantiles at scale
    * (Sketches.exactQuantilesPerGroup): the element at rank ⌈q·n⌉ in
    * (value, tiebreak) order per group — percentile_disc semantics
    * with a deterministic tiebreak, via the distributed exact-rank
    * machinery (range repartition + broadcast offsets; no group ever
    * sorts in one task — where approx_percentile trades exactness and
    * engine-portability for one pass). The oracle replays the rank
    * arithmetic verbatim. */
  private val q16Slot = new QueriesLlm.TrackerSlot
  private def q16 = Q("q16_exact_quantiles",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      graft.llm.Sketches.exactQuantilesPerGroup(li,
          col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey") * 10 + col("l_linenumber"),
          Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99),
          tracker = Some(q16Slot.fresh()))
        .orderBy(col("g"), col("q_name"))
    },
    Some("""WITH t AS (SELECT l_returnflag AS g, l_extendedprice AS v,
           |                  l_orderkey * 10 + l_linenumber AS id FROM lineitem),
           |n AS (SELECT g, count(*) AS n_rows FROM t GROUP BY g),
           |r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, id) AS rk FROM t),
           |tg AS (SELECT g, n_rows, q_name,
           |         CAST(ceil(CAST(n_rows AS DOUBLE) * qq) AS BIGINT) AS target
           |       FROM n CROSS JOIN (VALUES ('p50', 0.5), ('p90', 0.9), ('p99', 0.99)) qv(q_name, qq))
           |SELECT tg.g AS g, tg.n_rows, tg.q_name, r.v AS value
           |FROM tg JOIN r ON r.g = tg.g AND r.rk = tg.target
           |ORDER BY tg.g, tg.q_name""".stripMargin),
    cleanup = Some(_ => q16Slot.drain()))

  /** Gap-based batch sessionization (operators.Sessions.sessionize):
    * per-user sessions split at >4 h of inactivity, one row per
    * session with bounds and event count. The boundary lag and the
    * running session index stack on ONE (user) exchange + sort; the
    * rollup's map-side combine collapses event grain to session grain
    * before its shuffle. The oracle replays the identical two-window
    * + aggregate plan. */
  private def q17 = Q("q17_sessionize",
    (s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      graft.operators.Sessions.sessionize(ev, col("user_id"), col("ts_us"),
          col("event_id"), gapUs = 14400000000L)
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("session_idx"))
    },
    Some(
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id FROM events),
        |b AS (
        |  SELECT user_id, ts_us, event_id,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 14400000000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM b)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |       count(*) AS n_events,
        |       min(ts_us) AS start_us, max(ts_us) AS end_us,
        |       max(ts_us) - min(ts_us) AS duration_us
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin))

  /** Cohort retention matrix (operators.Sessions.cohortRetention):
    * users grouped by first-active day, counted on each later active
    * day. Days are epoch-day integers end to end; activity first
    * collapses to the (user, day) distinct grain, so the final
    * (cohort, offset) aggregate is bounded by days² regardless of
    * event volume. */
  private def q18 = Q("q18_cohort_retention",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        // integer DIV — a double `/` quotient is exact only below 2^53
        .select(col("user_id"), expr("ts_us DIV 86400000000").as("day"))
      graft.operators.Sessions.cohortRetention(ev, col("user_id"), col("day"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    Some(
      """WITH a AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 1000 // 86400000000 AS d FROM events),
        |c AS (
        |  SELECT user_id, d, min(d) OVER (PARTITION BY user_id) AS cohort_day FROM a)
        |SELECT cohort_day, d - cohort_day AS day_offset, count(*) AS n_keys
        |FROM c GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin))

  /** Ordered funnel (operators.Sessions.funnelStages): per user, how
    * far through view → click → purchase the event stream progresses,
    * each step counting only strictly after the previous match. The
    * Spark side is one key aggregate + a codegen'd `aggregate` fold
    * over the sorted sequence; the oracle proves the fold via the
    * equivalent chained conditional-min-position formulation. */
  private def q19 = Q("q19_funnel_stages",
    (s, dir) => {
      // a sparse slice (~1/7 of events) so the funnel differentiates:
      // on the dense full stream every user trivially completes it
      val ev = Tables.events(s, dir).filter(col("event_id") % 7 === 0)
        .withColumn("ts_us", unix_micros(col("ts")))
      graft.operators.Sessions.funnelStages(ev, col("user_id"), col("ts_us"),
          col("event_id"), col("event_type"), Seq("view", "click", "purchase"))
        .orderBy(col("stage"))
    },
    Some(
      """WITH e AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_ns(ts) // 1000, event_id) AS rn
        |  FROM events WHERE event_id % 7 = 0),
        |a1 AS (SELECT user_id, min(rn) AS r1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |a2 AS (SELECT e.user_id, min(rn) AS r2 FROM e JOIN a1 USING (user_id)
        |       WHERE event_type = 'click' AND rn > r1 GROUP BY e.user_id),
        |a3 AS (SELECT e.user_id, min(rn) AS r3 FROM e JOIN a2 USING (user_id)
        |       WHERE event_type = 'purchase' AND rn > r2 GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM events WHERE event_id % 7 = 0),
        |st AS (SELECT u.user_id,
        |         CASE WHEN r3 IS NOT NULL THEN 3 WHEN r2 IS NOT NULL THEN 2
        |              WHEN r1 IS NOT NULL THEN 1 ELSE 0 END AS stage
        |       FROM u LEFT JOIN a1 USING (user_id) LEFT JOIN a2 USING (user_id)
        |            LEFT JOIN a3 USING (user_id)),
        |g AS (SELECT stage, count(*) AS n_keys FROM st GROUP BY stage)
        |SELECT CAST(gs.s AS INT) AS stage, coalesce(g.n_keys, 0) AS n_keys
        |FROM generate_series(0, 3) gs(s) LEFT JOIN g ON g.stage = gs.s
        |ORDER BY stage""".stripMargin))

  /** Peak session concurrency per day (operators.PrefixSum): the
    * classic interval sweep — sessions (q17's sessionization) emit
    * (+1 at start, −1 past end) deltas, a GLOBAL running sum over
    * delta time is the live-session count, and each day reports its
    * maximum. The running sum is the distributed two-level scan
    * (bucketed windows + a bucket-count offset frame), NOT the
    * single-partition `Window.orderBy` the naive form would plan —
    * the whole point of the operator at 100 TB. Days are keyed by
    * delta activity (a day whose concurrency only carries over from
    * overnight sessions has no change point and no row — the sweep's
    * standard contract). */
  private def q20 = Q("q20_peak_concurrency",
    (s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      val sess = graft.operators.Sessions.sessionize(ev, col("user_id"),
        col("ts_us"), col("event_id"), gapUs = 14400000000L)
      val deltas = sess.select(explode(array(
          struct(col("start_us").as("t"), lit(1L).as("delta")),
          struct((col("end_us") + 1L).as("t"), lit(-1L).as("delta")))).as("e"))
        .select(col("e.t").as("t"), col("e.delta").as("delta"))
      graft.operators.PrefixSum.runningTotal(deltas, col("t"), col("delta"),
          bucketWidth = 86400000000L, out = "conc")
        .select(expr("t DIV 86400000000").as("day"), col("conc"))
        .groupBy(col("day")).agg(max(col("conc")).as("peak_sessions"))
        .orderBy(col("day"))
    },
    Some(
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id FROM events),
        |b AS (
        |  SELECT user_id, ts_us, event_id,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 14400000000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM b),
        |sess AS (
        |  SELECT user_id, session_idx, min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM s GROUP BY user_id, session_idx),
        |d AS (
        |  SELECT start_us AS t, 1 AS delta FROM sess
        |  UNION ALL SELECT end_us + 1, -1 FROM sess),
        |r AS (SELECT t, sum(delta) OVER (ORDER BY t) AS conc FROM d)
        |SELECT t // 86400000000 AS day, CAST(max(conc) AS BIGINT) AS peak_sessions
        |FROM r GROUP BY day ORDER BY day""".stripMargin))

  private val q21Slot = new QueriesLlm.TrackerSlot
  /** Distributed exact INTERPOLATED per-group quantiles
    * (Sketches.exactQuantilesContPerGroup): percentile_cont to q16's
    * percentile_disc — the value at fractional position q·(n−1),
    * linearly interpolated between the neighboring order statistics
    * over the same range-partition exact-rank machinery (each
    * quantile fetches its two neighbors by global rank; no group
    * ever sorts in one task). The oracle replays the IDENTICAL
    * interpolation expression rather than DuckDB's quantile_cont
    * builtin, so both engines run the same IEEE arithmetic. */
  private def q21 = Q("q21_interpolated_quantiles",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      graft.llm.Sketches.exactQuantilesContPerGroup(li,
          col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey") * 10 + col("l_linenumber"),
          Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95),
          tracker = Some(q21Slot.fresh()))
        .orderBy(col("g"), col("q_name"))
    },
    Some("""WITH t AS (SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v,
           |                  l_orderkey * 10 + l_linenumber AS id FROM lineitem),
           |n AS (SELECT g, count(*) AS n_rows FROM t GROUP BY g),
           |r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, id) AS rk FROM t),
           |tg AS (SELECT g, n_rows, q_name,
           |         CAST(floor(qq * CAST(n_rows - 1 AS DOUBLE)) AS BIGINT) + 1 AS lo_rank,
           |         qq * CAST(n_rows - 1 AS DOUBLE)
           |           - floor(qq * CAST(n_rows - 1 AS DOUBLE)) AS frac
           |       FROM n CROSS JOIN (VALUES ('p25', 0.25), ('p50', 0.5), ('p95', 0.95)) qv(q_name, qq)),
           |lo AS (SELECT tg.g, tg.n_rows, tg.q_name, tg.frac, r.v AS v_lo
           |       FROM tg JOIN r ON r.g = tg.g AND r.rk = tg.lo_rank),
           |hi AS (SELECT tg.g, tg.q_name, r.v AS v_hi
           |       FROM tg JOIN r ON r.g = tg.g
           |        AND r.rk = tg.lo_rank + CASE WHEN tg.frac > 0 THEN 1 ELSE 0 END)
           |SELECT lo.g AS g, lo.n_rows, lo.q_name AS q_name,
           |       v_lo + (v_hi - v_lo) * frac AS value
           |FROM lo JOIN hi ON hi.g = lo.g AND hi.q_name = lo.q_name
           |ORDER BY g, lo.q_name""".stripMargin),
    cleanup = Some(_ => q21Slot.drain()))

  /** Cumulative distinct counting — `COUNT(DISTINCT) OVER (ORDER BY)`,
    * which NEITHER engine supports as a window aggregate (and a
    * collect_set window would hold every seen value in state): the
    * scalable restatement is first-occurrence attribution. Each user
    * aggregates to its FIRST active day (one user-keyed aggregate —
    * the only corpus-grain shuffle), days count their new users, and
    * the running sum crosses only the tiny day frame. Output per
    * active day: (day, new_users, cum_distinct_users) — the classic
    * growth-accounting query. */
  private def q22 = Q("q22_cumulative_distinct",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      val firstDay = ev.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
      val newPerDay = firstDay.groupBy(col("first_day").as("day"))
        .agg(count(lit(1)).as("new_users"))
      val allDays = ev.select(col("day")).distinct()
      allDays.join(newPerDay, Seq("day"), "left")
        .select(col("day"), coalesce(col("new_users"), lit(0L)).as("new_users"))
        .withColumn("cum_distinct_users",
          sum(col("new_users")).over(
            org.apache.spark.sql.expressions.Window.orderBy(col("day"))))
        .orderBy(col("day"))
    },
    Some(
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 // 86400000000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY user_id),
        |npd AS (SELECT first_day AS day, count(*) AS new_users FROM f GROUP BY 1),
        |d AS (SELECT DISTINCT day FROM e)
        |SELECT d.day, coalesce(npd.new_users, 0) AS new_users,
        |       CAST(sum(coalesce(npd.new_users, 0)) OVER (ORDER BY d.day) AS BIGINT)
        |         AS cum_distinct_users
        |FROM d LEFT JOIN npd USING (day)
        |ORDER BY d.day""".stripMargin))

  private val q23Slot = new QueriesLlm.TrackerSlot
  /** Bounded graph reachability (operators.Graph.bfsHops) — the
    * RECURSIVE-QUERY capability Spark has no built-in for: BFS hop
    * distances over the order↔supplier bipartite graph (nodes encoded
    * 2·key+type), 3 hops out from the lowest order. The Spark side is
    * frontier BFS — each node expands exactly once through one edge
    * join + one anti join per round, superstep-materialized — where
    * the oracle's recursive CTE re-derives every (node, hops) pair
    * and collapses to min(hops) at the end: the two formulations
    * must agree exactly, which pins the frontier loop's min-hop
    * semantics. */
  private def q23 = Q("q23_graph_reachability",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").cast("long").as("o"),
                col("l_suppkey").cast("long").as("sp"))
      val edges = li.select((col("o") * 2).as("src"), (col("sp") * 2 + 1).as("dst"))
        .unionByName(li.select((col("sp") * 2 + 1).as("src"), (col("o") * 2).as("dst")))
      val source = li.agg((min(col("o")) * 2).as("node"))
      graft.operators.Graph.bfsHops(edges, col("src"), col("dst"),
          source, col("node"), maxHops = 3, tracker = Some(q23Slot.fresh()))
        .select(
          when(col("id") % 2 === 0, lit("order")).otherwise(lit("supplier")).as("kind"),
          expr("id DIV 2").as("key"), col("hops"))
        .orderBy(col("hops"), col("kind"), col("key"))
    },
    Some(
      """WITH RECURSIVE e AS (
        |  SELECT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
        |  UNION ALL SELECT l_suppkey * 2 + 1, l_orderkey * 2 FROM lineitem),
        |s AS (SELECT min(l_orderkey) * 2 AS node FROM lineitem),
        |r AS (
        |  SELECT node, 0 AS hops FROM s
        |  UNION
        |  SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.node WHERE r.hops < 3)
        |SELECT CASE WHEN node % 2 = 0 THEN 'order' ELSE 'supplier' END AS kind,
        |       node // 2 AS key, CAST(min(hops) AS INT) AS hops
        |FROM r GROUP BY node
        |ORDER BY hops, kind, key""".stripMargin),
    cleanup = Some(_ => q23Slot.drain()))

  private val q24Slot = new QueriesLlm.TrackerSlot
  /** Integer random-walk centrality (operators.Graph.massPropagate) —
    * the PageRank core over the same bipartite graph, in the repo's
    * cross-engine discipline: mass splits by TRUNCATING integer
    * division per round (the deterministic substitute for a floating
    * damping term), so both engines compute identical integers. The
    * Spark side is the superstep loop; the oracle unrolls the three
    * rounds as generated CTE stages. */
  private def q24 = Q("q24_walk_centrality",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").cast("long").as("o"),
                col("l_suppkey").cast("long").as("sp"))
      val edges = li.select((col("o") * 2).as("src"), (col("sp") * 2 + 1).as("dst"))
        .unionByName(li.select((col("sp") * 2 + 1).as("src"), (col("o") * 2).as("dst")))
      graft.operators.Graph.massPropagate(edges, col("src"), col("dst"),
          rounds = 3, initMass = 1000000L, tracker = Some(q24Slot.fresh()))
        .select(
          when(col("id") % 2 === 0, lit("order")).otherwise(lit("supplier")).as("kind"),
          expr("id DIV 2").as("key"), col("mass"))
        .orderBy(col("kind"), col("key"))
    },
    Some {
      val stages = (1 to 3).map { r =>
        s"""m$r AS (SELECT e.dst AS id, CAST(sum(m.mass // d.deg) AS BIGINT) AS mass
           |       FROM m${r - 1} m JOIN deg d ON d.src = m.id JOIN e ON e.src = m.id
           |       GROUP BY e.dst HAVING sum(m.mass // d.deg) > 0)""".stripMargin
      }.mkString(",\n        ")
      s"""WITH e AS (
         |  SELECT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
         |  UNION ALL SELECT l_suppkey * 2 + 1, l_orderkey * 2 FROM lineitem),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |m0 AS (SELECT id, CAST(1000000 AS BIGINT) AS mass FROM
         |         (SELECT src AS id FROM e UNION SELECT dst FROM e)),
         |$stages
         |SELECT CASE WHEN id % 2 = 0 THEN 'order' ELSE 'supplier' END AS kind,
         |       id // 2 AS key, mass
         |FROM m3 ORDER BY kind, key""".stripMargin
    },
    cleanup = Some(_ => q24Slot.drain()))

  private val q25Slot = new QueriesLlm.TrackerSlot
  /** Bounded weighted shortest paths (operators.Graph.shortestPaths)
    * — Bellman-Ford supersteps over the order↔supplier graph with
    * integer weights (per-pair min l_quantity), 3 relaxation rounds
    * from the lowest order. The oracle's recursive CTE enumerates
    * every ≤3-edge path and collapses to min(dist): after k rounds
    * Bellman-Ford holds exactly the ≤k-edge minimum, so the two
    * formulations must agree row-for-row — which pins both the
    * relaxation semantics and the integer-weight determinism. */
  private def q25 = Q("q25_weighted_shortest_path",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").cast("long").as("o"),
                col("l_suppkey").cast("long").as("sp"),
                col("l_quantity").cast("long").as("w"))
        .groupBy(col("o"), col("sp")).agg(min(col("w")).as("w"))
      val edges = li.select((col("o") * 2).as("src"), (col("sp") * 2 + 1).as("dst"), col("w"))
        .unionByName(li.select((col("sp") * 2 + 1).as("src"), (col("o") * 2).as("dst"), col("w")))
      val source = Tables.lineitem(s, dir).agg((min(col("l_orderkey")) * 2).as("node"))
      graft.operators.Graph.shortestPaths(edges, col("src"), col("dst"), col("w"),
          source, col("node"), rounds = 3, tracker = Some(q25Slot.fresh()))
        .select(
          when(col("id") % 2 === 0, lit("order")).otherwise(lit("supplier")).as("kind"),
          expr("id DIV 2").as("key"), col("dist"))
        .orderBy(col("kind"), col("key"))
    },
    Some(
      """WITH RECURSIVE w AS (
        |  SELECT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
        |         CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |e AS (SELECT src, dst, w FROM w UNION ALL SELECT dst, src, w FROM w),
        |s AS (SELECT min(l_orderkey) * 2 AS node FROM lineitem),
        |r AS (
        |  SELECT node, CAST(0 AS BIGINT) AS dist, 0 AS hops FROM s
        |  UNION
        |  SELECT e.dst, r.dist + e.w, r.hops + 1
        |  FROM r JOIN e ON e.src = r.node WHERE r.hops < 3)
        |SELECT CASE WHEN node % 2 = 0 THEN 'order' ELSE 'supplier' END AS kind,
        |       node // 2 AS key, min(dist) AS dist
        |FROM r GROUP BY node
        |ORDER BY kind, key""".stripMargin),
    cleanup = Some(_ => q25Slot.drain()))

  /** Semi-structured JSON processing — the column every event stream
    * carries: `events.props` parses through BOTH of Spark's JSON
    * surfaces (typed `from_json` with an explicit schema and stringly
    * `get_json_object`), aggregated per event type. `n_agree` pins
    * the two extraction paths to each other row-by-row (and the
    * oracle pins both to DuckDB's json_extract_string): a JSON parser
    * discrepancy shows as a count mismatch, not a silent drift. */
  private def q26 = Q("q26_json_extraction",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"),
          get_json_object(col("props"), "$.k").cast("int").as("k2"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("k")).as("sum_k"),
             countDistinct(col("k")).as("n_k"),
             sum(when(col("k") === col("k2"), 1L).otherwise(0L)).as("n_agree"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n,
           |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           |       CAST(count(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS n_k,
           |       count(*) AS n_agree
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Time-series gap fill + forward fill (operators.TimeSeries):
    * daily per-user value sums resampled onto the dense day grid,
    * holes carried forward from the last observation (0 before a
    * user's first day). The fill copies values — no arithmetic — so
    * cross-engine equality is exact once the daily sums are
    * decimal-accumulated; both engines run the same
    * IGNORE-NULLS-last-value window. */
  private def q27 = Q("q27_gap_fill_forward",
    (s, dir) => {
      val daily = Tables.events(s, dir).filter(col("user_id") < 50)
        .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"),
                col("value"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
      graft.operators.TimeSeries.gapFillForward(daily,
          col("user_id"), col("day"), col("v"), fillDefault = lit(0.0))
        .select(col("key").as("user_id"), col("tick").as("day"),
                col("has_obs"), col("filled_value"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""WITH ev AS (SELECT user_id, epoch_ns(ts) // 1000 // 86400000000 AS day, value
           |            FROM events WHERE user_id < 50),
           |daily AS (SELECT user_id, day,
           |            CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
           |          FROM ev GROUP BY 1, 2),
           |rng AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
           |days AS (SELECT unnest(generate_series(d0, d1)) AS day FROM rng),
           |grid AS (SELECT u.user_id, days.day
           |         FROM (SELECT DISTINCT user_id FROM daily) u CROSS JOIN days),
           |j AS (SELECT g.user_id, g.day, daily.v
           |      FROM grid g LEFT JOIN daily ON daily.user_id = g.user_id AND daily.day = g.day)
           |SELECT user_id, day, v IS NOT NULL AS has_obs,
           |       coalesce(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
           |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS filled_value
           |FROM j ORDER BY user_id, day""".stripMargin))

  /** Last-touch conversion attribution: each purchase attributes to
    * the user's LATEST preceding non-purchase event (as-of ≤
    * semantics, max-event-id tiebreak at equal timestamps — the
    * operators.TemporalJoin union+window form, no join node), then
    * falls to 'none' when the touch is older than the 2-hour window
    * or absent. The oracle restates it as a per-purchase row_number
    * pick — the formulation that cannot scale (per-conversion
    * ordered scan of the full touch history) but pins the exact
    * match-and-window semantics. */
  private def q28 = Q("q28_last_touch_attribution",
    (s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      val t = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts_us"),
          col("event_type").as("t_type"), col("event_id").as("t_event"))
      graft.operators.TemporalJoin.asOf(p, t,
          keyCols = Seq("user_id"), leftTime = "ts_us", rightTime = "ts_us",
          payloadCols = Seq("t_type"), tiebreakCols = Seq("t_event"),
          matchedTimeAs = Some("touch_ts"))
        .select(
          when(col("t_type").isNull ||
               col("ts_us") - col("touch_ts") > 7200000000L, "none")
            .otherwise(col("t_type")).as("touch"))
        .groupBy(col("touch")).agg(count(lit(1)).as("n_conversions"))
        .orderBy(col("touch"))
    },
    Some("""WITH ev AS (SELECT user_id, event_id, event_type,
           |              epoch_ns(ts) // 1000 AS ts_us FROM events),
           |p AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'purchase'),
           |t AS (SELECT user_id, event_id, event_type, ts_us FROM ev WHERE event_type <> 'purchase'),
           |lastt AS (SELECT p.event_id AS pid, p.ts_us AS pts, t.ts_us AS tts,
           |            t.event_type AS ttype,
           |            row_number() OVER (PARTITION BY p.event_id
           |              ORDER BY t.ts_us DESC, t.event_id DESC) AS rn
           |          FROM p JOIN t ON t.user_id = p.user_id AND t.ts_us <= p.ts_us),
           |att AS (SELECT pid, CASE WHEN pts - tts > 7200000000 THEN 'none' ELSE ttype END AS touch
           |        FROM lastt WHERE rn = 1)
           |SELECT touch, count(*) AS n_conversions FROM (
           |  SELECT p.event_id, coalesce(att.touch, 'none') AS touch
           |  FROM p LEFT JOIN att ON att.pid = p.event_id)
           |GROUP BY touch ORDER BY touch""".stripMargin))

  /** Referential-integrity audit — the data-quality sweep every
    * warehouse load gates on: orphan counts for each foreign-key
    * relation of the star schema, as anti joins (child keys with no
    * parent), one row per relation with child volume and orphan
    * count. Each anti join is a plain hash/broadcast join on the key;
    * relations are independent so the four audits parallelize as
    * separate stages of one job. Clean fixtures audit to zero —
    * which is itself the assertion. */
  private def q29 = Q("q29_referential_audit",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      val c  = Tables.customer(s, dir)
      val su = Tables.supplier(s, dir)
      val n  = Tables.nation(s, dir)
      def audit(rel: String, child: org.apache.spark.sql.DataFrame,
                childKey: String, parent: org.apache.spark.sql.DataFrame,
                parentKey: String) = {
        val orphans = child.join(parent,
          col(childKey) === col(parentKey), "left_anti")
        child.agg(count(lit(1)).as("n_child"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(rel).as("relation"), col("n_child"), col("n_orphans"))
      }
      audit("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(audit("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(audit("lineitem->supplier", li, "l_suppkey", su, "s_suppkey"))
        .unionByName(audit("customer->nation", c, "c_nationkey", n, "n_nationkey"))
        .orderBy(col("relation"))
    },
    Some("""SELECT relation, n_child, n_orphans FROM (
           |  SELECT 'lineitem->orders' AS relation,
           |    (SELECT count(*) FROM lineitem) AS n_child,
           |    (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_orphans
           |  UNION ALL SELECT 'orders->customer',
           |    (SELECT count(*) FROM orders),
           |    (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
           |  UNION ALL SELECT 'lineitem->supplier',
           |    (SELECT count(*) FROM lineitem),
           |    (SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
           |  UNION ALL SELECT 'customer->nation',
           |    (SELECT count(*) FROM customer),
           |    (SELECT count(*) FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)))
           |ORDER BY relation""".stripMargin))

  /** BITEMPORAL state reconstruction: "what did we BELIEVE (as of
    * transaction bound T) the world looked like AT valid time V" —
    * cdc14 travels the valid axis only; this walks a 2x2 grid of
    * (tx bound = event_id watermark, valid bound = event time) and
    * materializes per-cell state counts. The tx filter runs BEFORE
    * the per-user latest-event window (an event not yet ingested at T
    * cannot influence the belief), which is exactly the subtlety a
    * single-axis time travel gets wrong. The bounds derive from the
    * data (midpoint/max of each axis), so the query is scale-free. */
  private def q30 = Q("q30_bitemporal_grid",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("ts_us"),
          when(col("event_type") === "signup", "c")
            .when(col("event_type") === "error", "d")
            .otherwise("u").as("op"),
          col("value"))
      val rng = ev.agg(min(col("event_id")).as("e0"), max(col("event_id")).as("e1"),
                       min(col("ts_us")).as("t0"), max(col("ts_us")).as("t1"))
      val bounds = rng.select(explode(array(
          struct(((col("e0") + col("e1")) / 2).cast("long").as("tx_bound"),
                 ((col("t0") + col("t1")) / 2).cast("long").as("v_bound")),
          struct(((col("e0") + col("e1")) / 2).cast("long").as("tx_bound"),
                 col("t1").as("v_bound")),
          struct(col("e1").as("tx_bound"),
                 ((col("t0") + col("t1")) / 2).cast("long").as("v_bound")),
          struct(col("e1").as("tx_bound"), col("t1").as("v_bound"))))
          .as("b"))
        .select(col("b.tx_bound"), col("b.v_bound"))
      val w = Window.partitionBy(col("tx_bound"), col("v_bound"), col("user_id"))
        .orderBy(col("event_id").desc)
      ev.crossJoin(broadcast(bounds))
        .filter(col("event_id") <= col("tx_bound") && col("ts_us") <= col("v_bound"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "d")
        .groupBy(col("tx_bound"), col("v_bound"))
        .agg(count(lit(1)).as("n_users"),
             sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy(col("tx_bound"), col("v_bound"))
    },
    Some("""WITH ev AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
           |              CASE WHEN event_type = 'signup' THEN 'c'
           |                   WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
           |              value
           |            FROM events),
           |rng AS (SELECT min(event_id) AS e0, max(event_id) AS e1,
           |               min(ts_us) AS t0, max(ts_us) AS t1 FROM ev),
           |bounds AS (
           |  SELECT (e0 + e1) // 2 AS tx_bound, (t0 + t1) // 2 AS v_bound FROM rng
           |  UNION ALL SELECT (e0 + e1) // 2, t1 FROM rng
           |  UNION ALL SELECT e1, (t0 + t1) // 2 FROM rng
           |  UNION ALL SELECT e1, t1 FROM rng),
           |latest AS (SELECT b.tx_bound, b.v_bound, ev.user_id, ev.op, ev.value,
           |             row_number() OVER (PARTITION BY b.tx_bound, b.v_bound, ev.user_id
           |               ORDER BY ev.event_id DESC) AS rn
           |           FROM ev CROSS JOIN bounds b
           |           WHERE ev.event_id <= b.tx_bound AND ev.ts_us <= b.v_bound)
           |SELECT tx_bound, v_bound, count(*) AS n_users,
           |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM latest WHERE rn = 1 AND op <> 'd'
           |GROUP BY tx_bound, v_bound
           |ORDER BY tx_bound, v_bound""".stripMargin))

  /** Market-basket co-occurrence LIFT over order contents — the
    * association-mining family (which parts ship together more than
    * chance predicts): distinct (order, part) pairs self-join within
    * the order, so the blow-up is bounded by per-basket width (items
    * per order), never by catalog or order count; per-part and
    * co-occurrence supports are exact counts, lift is one fixed-order
    * double expression, and a minimum-support prune runs BEFORE the
    * lift math so noise pairs never leave the aggregate. Top-20 by
    * (lift, pair) plans TakeOrdered. */
  private def q31 = Q("q31_basket_lift",
    (s, dir) => {
      val items = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val n = items.select(col("o")).distinct().agg(count(lit(1)).as("n_orders"))
      val supp = items.groupBy(col("p")).agg(count(lit(1)).as("sp"))
      val co = items.select(col("o"), col("p").as("p1"))
        .join(items.select(col("o"), col("p").as("p2")), "o")
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("co"))
        .filter(col("co") >= 3)
      co.join(supp.select(col("p").as("p1"), col("sp").as("s1")), "p1")
        .join(supp.select(col("p").as("p2"), col("sp").as("s2")), "p2")
        .crossJoin(broadcast(n))
        .select(col("p1"), col("p2"), col("co"), col("s1"), col("s2"),
          (col("co").cast("double") * col("n_orders").cast("double") /
            (col("s1").cast("double") * col("s2").cast("double"))).as("lift"))
        .orderBy(col("lift").desc, col("p1"), col("p2"))
        .limit(20)
    },
    Some("""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
           |n AS (SELECT count(DISTINCT o) AS n_orders FROM items),
           |supp AS (SELECT p, count(*) AS sp FROM items GROUP BY 1),
           |co AS (SELECT a.p AS p1, b.p AS p2, count(*) AS co
           |       FROM items a JOIN items b ON b.o = a.o AND a.p < b.p
           |       GROUP BY 1, 2 HAVING count(*) >= 3)
           |SELECT p1, p2, co, s1.sp AS s1, s2.sp AS s2,
           |       CAST(co AS DOUBLE) * CAST(n_orders AS DOUBLE) /
           |         (CAST(s1.sp AS DOUBLE) * CAST(s2.sp AS DOUBLE)) AS lift
           |FROM co JOIN supp s1 ON s1.p = co.p1
           |        JOIN supp s2 ON s2.p = co.p2
           |        CROSS JOIN n
           |ORDER BY lift DESC, p1, p2
           |LIMIT 20""".stripMargin))

  /** User-journey TRANSITION MATRIX: the empirical Markov chain over
    * event types — for each (from, to) pair, how many consecutive
    * per-user transitions and what fraction of the from-state's
    * outgoing mass. One user-keyed window (lead over event order) +
    * one types²-sized aggregate; where the funnel (q19) checks ONE
    * prescribed sequence, this surfaces every path the users actually
    * take. Probabilities are single divisions of exact counts. */
  private def q32 = Q("q32_event_transitions",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val tr = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val outMass = tr.groupBy(col("from_type")).agg(sum(col("n")).as("out_n"))
      tr.join(outMass, "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast("double") / col("out_n").cast("double")).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""WITH tr0 AS (SELECT user_id, event_id, event_type,
           |        lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
           |      FROM events),
           |tr AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
           |       FROM tr0 WHERE next_type IS NOT NULL GROUP BY 1, 2),
           |om AS (SELECT from_type, sum(n) AS out_n FROM tr GROUP BY 1)
           |SELECT tr.from_type, tr.to_type, tr.n,
           |       CAST(tr.n AS DOUBLE) / CAST(om.out_n AS DOUBLE) AS p
           |FROM tr JOIN om ON om.from_type = tr.from_type
           |ORDER BY tr.from_type, tr.to_type""".stripMargin))

  /** Z-order layout audit (operators/Layout.scala) — the lakehouse
    * OPTIMIZE ZORDER pattern: interleave the bits of two clustering
    * dimensions (user bucket × event day) so contiguous key ranges
    * are tight rectangles in BOTH dimensions, then report per-z-range
    * bucket min/max stats plus whether a fixed predicate on EACH
    * dimension could skip the bucket — the file-skipping decision a
    * 100 TB scan makes from parquet footer stats. The z value is pure
    * bit algebra (2·bits shift/mask adds, codegen'd, zero shuffle);
    * the oracle recomputes it from the SAME generated term list
    * (Layout.duckZValue), so the curves cannot drift. */
  private def q33 = Q("q33_zorder_layout",
    (s, dir) => {
      import graft.operators.Layout
      // 5-bit grid cells fill at every SF (user % 32 × day % 32), so
      // the 16 z-range buckets are 8×8 rectangles — real skipping
      // geometry rather than a degenerate single bucket.
      val bits = 5; val lb = 4
      val dims = Tables.events(s, dir).select(
        Layout.clampDim(expr("user_id % 32"), bits).as("x"),
        Layout.clampDim(expr("((unix_micros(ts) DIV 86400000000) - 19723) % 32"), bits).as("y"))
      dims.select(Layout.zBucket(col("x"), col("y"), bits, lb).as("bucket"),
          col("x"), col("y"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .select(col("bucket"), col("n"),
          col("min_x"), col("max_x"), col("min_y"), col("max_y"),
          (col("min_x") <= 6 && col("max_x") >= 3).cast("int").as("scan_x_3_6"),
          (col("min_y") <= 13 && col("max_y") >= 10).cast("int").as("scan_y_10_13"))
        .orderBy(col("bucket"))
    },
    Some(s"""WITH d AS (SELECT ${graft.operators.Layout.duckClampDim("user_id % 32", 5)} AS x,
            |        ${graft.operators.Layout.duckClampDim("((epoch_ns(ts) // 1000 // 86400000000) - 19723) % 32", 5)} AS y
            |      FROM events),
            |b AS (SELECT ${graft.operators.Layout.duckZBucket("x", "y", 5, 4)} AS bucket, x, y FROM d),
            |g AS (SELECT bucket, count(*) AS n, min(x) AS min_x, max(x) AS max_x,
            |             min(y) AS min_y, max(y) AS max_y FROM b GROUP BY bucket)
            |SELECT bucket, n, min_x, max_x, min_y, max_y,
            |       CAST(min_x <= 6 AND max_x >= 3 AS INT) AS scan_x_3_6,
            |       CAST(min_y <= 13 AND max_y >= 10 AS INT) AS scan_y_10_13
            |FROM g ORDER BY bucket""".stripMargin))

  /** SHUFFLE-SKEW DIAGNOSIS — the pre-salting measurement feeding
    * operators.Skew: hash the join key into the 32 shuffle buckets
    * and report the bucket histogram's peak against the uniform
    * expectation (skew_x100 = max·buckets·100 DIV total — 100 means
    * perfectly uniform) plus the hottest KEY and its share (the salt
    * candidate). The fixture plants a classic hot key: 30% of
    * lineitem rows collapse onto key 1 — the diagnosis must localize
    * it and read its bucket's inflation. Two hash aggregates over
    * (8-byte key/bucket, count) rows; at any scale this is the cheap
    * probe you run BEFORE a join melts an executor. */
  private def q34 = Q("q34_skew_diagnosis",
    (s, dir) => {
      val keys = Tables.lineitem(s, dir).select(
        when(col("l_orderkey") % 10 < 3, lit(1L))
          .otherwise(col("l_suppkey").cast("long")).as("k"))
      val bucketed = keys.select(col("k"),
        pmod(graft.functions.Portable.hash64(col("k")), lit(32)).as("bucket"))
      val stats = bucketed.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("total"), count(lit(1)).as("n_buckets"),
          max(col("n")).as("max_bucket_n"))
        .withColumn("skew_x100", expr("max_bucket_n * 32 * 100 DIV total"))
      val hot = bucketed.groupBy(col("k")).agg(count(lit(1)).as("kn"))
        .orderBy(col("kn").desc, col("k")).limit(1)
        .select(col("k").as("hot_key"), col("kn").as("hot_n"))
      stats.crossJoin(hot)
        .select(col("total"), col("n_buckets"), col("max_bucket_n"),
          col("skew_x100"), col("hot_key"), col("hot_n"),
          expr("hot_n * 100 DIV total").as("hot_share_pct"))
    },
    Some(s"""WITH k AS (
            |  SELECT CASE WHEN l_orderkey % 10 < 3 THEN 1
            |              ELSE CAST(l_suppkey AS BIGINT) END AS k
            |  FROM lineitem),
            |b AS (SELECT k, ${graft.functions.Portable.duckHash64("k")} % 32 AS bucket FROM k),
            |bb AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
            |st AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_buckets,
            |              CAST(max(n) AS BIGINT) AS max_bucket_n FROM bb),
            |hot AS (SELECT k AS hot_key, CAST(count(*) AS BIGINT) AS hot_n
            |        FROM b GROUP BY k ORDER BY count(*) DESC, k LIMIT 1)
            |SELECT total, n_buckets, max_bucket_n,
            |  CAST(max_bucket_n * 32 * 100 // total AS BIGINT) AS skew_x100,
            |  hot_key, hot_n,
            |  CAST(hot_n * 100 // total AS BIGINT) AS hot_share_pct
            |FROM st CROSS JOIN hot""".stripMargin))
}
