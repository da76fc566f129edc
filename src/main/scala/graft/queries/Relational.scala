package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational query surface over the TPC-H-ish driver tables.
  *
  * The reference (polario) has no relational operators of its own —
  * it delegates to Polars (SURVEY.md §2.3-§2.7). This engine exposes
  * them Spark-natively; each query doubles as the driver-checkable
  * witness for one operator family.
  *
  * Determinism rules used throughout (required for hash-equality with
  * the DuckDB oracle):
  *  - double aggregation goes through exact decimal casts;
  *  - every ORDER BY ends in a unique tie-break column;
  *  - NULL ordering is spelled explicitly where sort keys are
  *    nullable (Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST).
  */
object Relational {

  import Q.{t, tp}

  private def sumDec(c: String, scale: Int = 2) =
    sum(col(c).cast(s"decimal(18,$scale)")).cast("double")

  val qs: Seq[Q] = Seq(

    // ---- grouped aggregation (TPC-H Q1 shape) --------------------
    Q("q01_pricing_summary",
      Some("""SELECT l_returnflag, l_linestatus,
             |  (sum(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sum_qty,
             |  (sum(CAST(l_extendedprice AS DECIMAL(18,2))))::DOUBLE AS sum_base_price,
             |  (sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))))::DOUBLE AS sum_disc_price,
             |  count(*) AS count_order
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sumDec("l_quantity").as("sum_qty"),
            sumDec("l_extendedprice").as("sum_base_price"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")),

    // ---- selective filter + scan pushdown (TPC-H Q6 shape) -------
    Q("q02_filter_revenue",
      Some("""SELECT count(*) AS n,
             |  (sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))))::DOUBLE AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24""".stripMargin),
      (s, dir) =>
        t(s, dir, "lineitem")
          .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01"))
            && col("l_shipdate") < to_timestamp(lit("1997-01-01"))
            && col("l_discount") >= 0.02 && col("l_discount") <= 0.06
            && col("l_quantity") < 24)
          .agg(
            count(lit(1)).as("n"),
            sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,6)"))
              .cast("double").as("revenue"))),

    // ---- multi-way join + agg (broadcast dims) -------------------
    Q("q03_revenue_by_nation",
      Some("""SELECT n_name,
             |  (sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))))::DOUBLE AS revenue,
             |  count(*) AS n_items
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin),
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("n_name")),

    // ---- broadcast star join over two dims -----------------------
    Q("q04_customers_by_region",
      Some("""SELECT r_name, count(*) AS n_customers,
             |  (sum(CAST(c_acctbal AS DECIMAL(18,2))))::DOUBLE AS sum_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name
             |ORDER BY r_name""".stripMargin),
      (s, dir) =>
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_customers"), sumDec("c_acctbal").as("sum_acctbal"))
          .orderBy("r_name")),

    // ---- global top-k (TakeOrderedAndProject) --------------------
    Q("q05_top_orders",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
      (s, dir) =>
        t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)),

    // ---- window function: per-group ranking ----------------------
    Q("q06_window_rank",
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)::INT AS rn
             |  FROM orders)
             |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 2)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn")
      }),

    // ---- distinct -----------------------------------------------
    Q("q07_distinct_segments",
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"),
      (s, dir) =>
        t(s, dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")),

    // ---- vertical concat / union-all (reference op U1/U3,
    //      hive_dataset.py:186, main.py:50-55) ---------------------
    Q("q08_union_names",
      Some("""SELECT r_name AS name FROM region
             |UNION ALL SELECT n_name FROM nation ORDER BY name""".stripMargin),
      (s, dir) =>
        t(s, dir, "region").select(col("r_name").as("name"))
          .unionAll(t(s, dir, "nation").select(col("n_name").as("name")))
          .orderBy("name")),

    // ---- set difference: urgent customers with no 'F' order ------
    Q("q09_set_except",
      Some("""SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY o_custkey""".stripMargin),
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
          .except(o.where(col("o_orderstatus") === "F").select("o_custkey"))
          .orderBy("o_custkey")
      }),

    // ---- set intersection: urgent customers who do have one ------
    Q("q10_set_intersect",
      Some("""SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY o_custkey""".stripMargin),
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
          .intersect(o.where(col("o_orderstatus") === "F").select("o_custkey"))
          .orderBy("o_custkey")
      }),

    // ---- rollup (grouping sets) ----------------------------------
    Q("q11_rollup_counts",
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  (sum(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), sumDec("l_quantity").as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // ---- scalar string/math functions ----------------------------
    Q("q12_scalar_functions",
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u, length(p_name)::INT AS name_len,
             |  substr(p_type, 1, 5) AS type_pfx,
             |  CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents,
             |  p_size % 7 AS size_mod, p_brand || '#' || p_type AS combo
             |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin),
      (s, dir) =>
        t(s, dir, "part")
          .where(col("p_partkey") <= 500)
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            length(col("p_name")).as("name_len"),
            substring(col("p_type"), 1, 5).as("type_pfx"),
            floor(col("p_retailprice") * 100).cast("bigint").as("price_cents"),
            (col("p_size") % 7).as("size_mod"),
            concat(col("p_brand"), lit("#"), col("p_type")).as("combo"))
          .orderBy("p_partkey")),

    // ---- date part extraction ------------------------------------
    Q("q13_orders_by_month",
      Some("""SELECT year(o_orderdate)::INT AS o_year, month(o_orderdate)::INT AS o_month,
             |  count(*) AS n, (sum(CAST(o_totalprice AS DECIMAL(18,2))))::DOUBLE AS sum_price
             |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin),
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(
            year(col("o_orderdate")).as("o_year"),
            month(col("o_orderdate")).as("o_month"))
          .agg(count(lit(1)).as("n"), sumDec("o_totalprice").as("sum_price"))
          .orderBy("o_year", "o_month")),

    // ---- conditional aggregation ---------------------------------
    Q("q14_conditional_agg",
      Some("""SELECT o_orderpriority,
             |  sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)::BIGINT AS n_big,
             |  sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
             |  count(*) AS n
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(when(col("o_totalprice") > 150000, 1).otherwise(0)).as("n_big"),
            sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority")),

    // ---- semi-structured extraction (events.props) ---------------
    Q("q15_json_extract",
      Some("""SELECT regexp_extract(props, '([0-9]+)', 1)::INT % 10 AS k_bucket,
             |  count(*) AS n, sum(regexp_extract(props, '([0-9]+)', 1)::INT)::BIGINT AS sum_k
             |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin),
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("k_val", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy((col("k_val") % 10).as("k_bucket"))
          .agg(count(lit(1)).as("n"), sum(col("k_val")).as("sum_k"))
          .orderBy("k_bucket")),

    // ---- event-time tumbling window (batch form) -----------------
    // events.ts is TIMESTAMP(NANOS) parquet, read as bigint nanos
    // (spark.sql.legacy.parquet.nanosAsLong) — outputs are epoch
    // seconds so both engines agree at any precision.
    Q("q16_events_hourly",
      Some("""SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch, event_type,
             |  count(*) AS n, (sum(CAST(value AS DECIMAL(18,2))))::DOUBLE AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type""".stripMargin),
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(
            expr("(ts div 3600000000000) * 3600").as("hour_epoch"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), sumDec("value").as("sum_value"))
          .orderBy("hour_epoch", "event_type")),

    // ---- event-time SLIDING window (batch form) ------------------
    // 2-hour windows advancing hourly via Spark's native window()
    // operator (TimeWindow → generated explode; every event lands in
    // exactly two windows). The nanos-long ts goes through
    // timestamp_micros; outputs are epoch seconds. Oracle states the
    // same membership arithmetically (unnest of the two covering
    // window starts).
    Q("q105_sliding_windows",
      Some("""WITH e AS (SELECT event_type, value, epoch_us(ts) // 3600000000 AS h FROM events),
             |x AS (SELECT event_type, value, unnest([h, h - 1]) AS wh FROM e)
             |SELECT wh * 3600 AS window_start, event_type, count(*) AS n,
             |  (sum(CAST(value AS DECIMAL(18,2))))::DOUBLE AS sum_value
             |FROM x GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin),
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(
            window(timestamp_micros(expr("ts div 1000")), "2 hours", "1 hour"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), sumDec("value").as("sum_value"))
          .select(
            col("window.start").cast("long").as("window_start"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("window_start", "event_type")),

    // ---- gap-filled hourly rate series ---------------------------
    // Every (type, hour) cell of the full observed range, zeros
    // included — "no events" is the cell an anomaly detector needs;
    // the spine is a sequence explode over aggregated bounds, so
    // nothing here scales with event volume.
    Q("q142_gap_fill",
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events),
             |c AS (SELECT event_type, h, count(*)::BIGINT AS n FROM e GROUP BY 1, 2),
             |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM c),
             |spine AS (SELECT unnest(range(h0, h1 + 1)) AS h FROM b),
             |t AS (SELECT DISTINCT event_type FROM c)
             |SELECT t.event_type, (spine.h * 3600)::BIGINT AS bucket_epoch,
             |  coalesce(c.n, 0)::BIGINT AS n
             |FROM spine CROSS JOIN t
             |LEFT JOIN c ON c.h = spine.h AND c.event_type = t.event_type
             |ORDER BY t.event_type, bucket_epoch""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.fillGaps(
          t(s, dir, "events"), "ts", "event_type", bucketSec = 3600L)),

    // ---- arbitrary grouping sets ---------------------------------
    // The GROUP BY surface beyond rollup/cube (q11/q27): explicit
    // grouping-set list with grouping() flags — one Expand pass, no
    // self-union of aggregates.
    Q("q166_grouping_sets",
      Some("""SELECT source, lang,
             |  grouping(source)::INT AS g_source, grouping(lang)::INT AS g_lang,
             |  count(*)::BIGINT AS n
             |FROM documents
             |GROUP BY GROUPING SETS ((source), (lang), ())
             |ORDER BY g_source, g_lang, source NULLS FIRST, lang NULLS FIRST""".stripMargin),
      (s, dir) => {
        t(s, dir, "documents").createOrReplaceTempView("q166_documents")
        s.sql("""SELECT source, lang,
                |  CAST(grouping(source) AS INT) AS g_source,
                |  CAST(grouping(lang) AS INT) AS g_lang,
                |  CAST(count(*) AS BIGINT) AS n
                |FROM q166_documents
                |GROUP BY GROUPING SETS ((source), (lang), ())
                |ORDER BY g_source, g_lang, source NULLS FIRST, lang NULLS FIRST""".stripMargin)
      }),

    // ---- window-function suite -----------------------------------
    // The remaining analytic-window surface in one witness: 3-arg
    // lag/lead defaults, ntile, cume_dist, percent_rank (exact
    // integer divisions), nth_value over an explicit ROWS frame — all
    // on the per-user timeline (one window shuffle).
    Q("q167_window_suite",
      Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |  lag(event_type, 1, 'none') OVER w AS prev_type,
             |  lead(event_type, 1, 'none') OVER w AS next_type,
             |  ntile(4) OVER w AS quartile,
             |  cume_dist() OVER w AS cd,
             |  percent_rank() OVER w AS pr,
             |  nth_value(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_type
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, ts_us, event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events").select(
          col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
          lag(col("event_type"), 1, "none").over(w).as("prev_type"),
          lead(col("event_type"), 1, "none").over(w).as("next_type"),
          // bigint: Spark ntile is int32, the DuckDB oracle's is
          // int64 — align so the driver's dtype-sensitive hash can't
          // see a (currently benign) drift.
          ntile(4).over(w).cast("bigint").as("quartile"),
          cume_dist().over(w).as("cd"),
          percent_rank().over(w).as("pr"),
          nth_value(col("event_type"), 2)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("second_type"))
          .orderBy("user_id", "ts_us", "event_id")
      }),

    // ---- per-group least-squares trend ---------------------------
    // OLS slope of event value (cents) vs hour per type, as the
    // exact scaled integer sign·(1e6·|num| div den) — sign outside
    // the divide (floor-vs-truncate divergence on negatives), x
    // centered per group.
    Q("q201_group_trend",
      Some("""WITH q AS (SELECT event_type AS g,
             |  epoch_us(ts) // 3600000000 AS x,
             |  floor(value * 100 + 0.5)::BIGINT AS y FROM events),
             |m AS (SELECT g, min(x) AS x0 FROM q GROUP BY g),
             |c AS (SELECT q.g, (q.x - m.x0)::HUGEINT AS x, q.y::HUGEINT AS y
             |  FROM q JOIN m ON q.g = m.g),
             |a AS (SELECT g, count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
             |  sum(x * y) AS sxy, sum(x * x) AS sxx FROM c GROUP BY g),
             |d AS (SELECT g, n, n * sxy - sx * sy AS num,
             |  n * sxx - sx * sx AS den FROM a)
             |SELECT g AS event_type, n,
             |  CASE WHEN den = 0 THEN NULL ELSE
             |    (CASE WHEN num < 0 THEN -1 ELSE 1 END *
             |     ((1000000::HUGEINT * abs(num)) // den))::BIGINT END AS slope_micro
             |FROM d ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val q = t(s, dir, "events").select(
          col("event_type"),
          expr("ts div 3600000000000").as("x"),
          floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("y"))
        graft.operators.Profile.groupTrend(q, "event_type", "x", "y")
      }),

    // ---- join-explosion guard ------------------------------------
    // Top-10 join keys by would-be output cardinality for an events
    // self-join on user_id — the report read before a risky join.
    Q("q199_join_blowup",
      Some("""WITH c AS (SELECT user_id::VARCHAR AS key_value,
             |  count(*)::BIGINT AS n FROM events GROUP BY user_id)
             |SELECT a.key_value, a.n AS n_left, b.n AS n_right,
             |  (a.n::HUGEINT * b.n)::BIGINT AS n_pairs
             |FROM c a JOIN c b ON a.key_value = b.key_value
             |ORDER BY n_pairs DESC, a.key_value LIMIT 10""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events")
        graft.operators.Skew.joinBlowupReport(ev, ev, "user_id", topN = 10)
      }),

    // ---- event debounce (throttle) -------------------------------
    // Events surviving a 60s per-user throttle — a sequential keep-
    // depends-on-last-keep recurrence (NOT sessionize-first), folded
    // with a struct accumulator in both engines.
    Q("q190_debounce",
      Some("""WITH l AS (SELECT user_id, count(*)::BIGINT AS n_events,
             |  list_sort(list(epoch_us(ts)::BIGINT)) AS tl FROM events GROUP BY user_id)
             |SELECT user_id, n_events,
             |  (list_reduce(list_prepend(0::BIGINT, tl),
             |    (acc, e) -> CASE WHEN acc // 2251799813685248 = 0
             |        OR e - acc % 2251799813685248 >= 60000000
             |      THEN (acc // 2251799813685248 + 1) * 2251799813685248 + e
             |      ELSE acc END) // 2251799813685248)::BIGINT AS n_kept
             |FROM l ORDER BY user_id""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.debounceCounts(
          t(s, dir, "events")
            .select(col("user_id"), expr("ts div 1000").as("ts_us")),
          "user_id", "ts_us", minGap = 60000000L)
          .orderBy("user_id")),

    // ---- bag-semantics set operations ----------------------------
    // EXCEPT ALL / INTERSECT ALL (multiset semantics — q09/q10's
    // distinct variants keep one copy; these keep counts): lang
    // multisets of two overlapping doc_id ranges, results counted.
    Q("q189_bag_setops",
      Some("""WITH a AS (SELECT lang FROM documents WHERE doc_id < 300),
             |b AS (SELECT lang FROM documents WHERE doc_id >= 200),
             |ex AS (SELECT lang FROM a EXCEPT ALL SELECT lang FROM b),
             |ix AS (SELECT lang FROM a INTERSECT ALL SELECT lang FROM b)
             |SELECT 'except_all' AS op, lang, count(*)::BIGINT AS n FROM ex GROUP BY lang
             |UNION ALL
             |SELECT 'intersect_all', lang, count(*)::BIGINT FROM ix GROUP BY lang
             |ORDER BY op, lang""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val a = docs.where(col("doc_id") < 300).select("lang")
        val b = docs.where(col("doc_id") >= 200).select("lang")
        a.exceptAll(b).groupBy(col("lang"))
          .agg(count(lit(1)).cast("bigint").as("n"))
          .select(lit("except_all").as("op"), col("lang"), col("n"))
          .unionAll(
            a.intersectAll(b).groupBy(col("lang"))
              .agg(count(lit(1)).cast("bigint").as("n"))
              .select(lit("intersect_all").as("op"), col("lang"), col("n")))
          .orderBy("op", "lang")
      }),

    // ---- key-skew diagnosis report -------------------------------
    // The pre-join report behind the q26/q65 salting remedies: top-10
    // hottest user_id values with share and exact ratio-to-average
    // (ppm); top-N via TakeOrdered, never a key-cardinality window.
    Q("q173_key_skew",
      Some("""WITH c AS (SELECT user_id::VARCHAR AS key_value,
             |  count(*)::BIGINT AS n FROM events GROUP BY user_id),
             |t AS (SELECT sum(n)::BIGINT AS tot, count(*)::BIGINT AS nkeys FROM c),
             |r AS (SELECT key_value, n,
             |  row_number() OVER (ORDER BY n DESC, key_value) AS rk FROM c)
             |SELECT rk::INT AS rk, key_value, n,
             |  n::DOUBLE / tot::DOUBLE AS share,
             |  ((1000000::HUGEINT * n * nkeys) // tot::HUGEINT)::BIGINT AS ratio_to_avg_ppm
             |FROM r, t WHERE rk <= 10 ORDER BY rk""".stripMargin),
      (s, dir) =>
        graft.operators.Skew.keySkewReport(
          t(s, dir, "events"), "user_id", topN = 10)),

    // ---- cohort retention matrix ---------------------------------
    // Daily cohorts × return-day offsets with distinct-user counts —
    // the retention triangle; all integer bucket arithmetic on the
    // nanos timestamps.
    Q("q162_retention",
      Some("""WITH e AS (SELECT user_id AS u, epoch_us(ts) // 86400000000 AS d
             |  FROM events),
             |c AS (SELECT u, min(d) AS cohort FROM e GROUP BY u),
             |a AS (SELECT DISTINCT e.u, c.cohort, e.d - c.cohort AS off
             |  FROM e JOIN c ON e.u = c.u)
             |SELECT (cohort * 86400)::BIGINT AS cohort_epoch,
             |  off::BIGINT AS bucket_offset, count(*)::BIGINT AS n_users
             |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) =>
        graft.operators.Funnel.retentionMatrix(
          t(s, dir, "events"), "user_id", "ts", bucketSec = 86400L)),

    // ---- ordered funnel conversion -------------------------------
    // view → click → purchase with strictly increasing timestamps:
    // per-step user counts via chained min-reach joins (one
    // user-keyed aggregate + join per step, never a timeline
    // collect).
    Q("q163_funnel",
      Some("""WITH e AS (SELECT user_id AS u, epoch_us(ts) AS ts, event_type AS t
             |  FROM events),
             |s1 AS (SELECT u, min(ts) AS r FROM e WHERE t = 'view' GROUP BY u),
             |s2 AS (SELECT e.u, min(e.ts) AS r FROM e
             |  JOIN s1 ON e.u = s1.u AND e.ts > s1.r WHERE e.t = 'click' GROUP BY e.u),
             |s3 AS (SELECT e.u, min(e.ts) AS r FROM e
             |  JOIN s2 ON e.u = s2.u AND e.ts > s2.r WHERE e.t = 'purchase' GROUP BY e.u)
             |SELECT * FROM (
             |  SELECT 1 AS step, 'view' AS event_type, count(*)::BIGINT AS n_users FROM s1
             |  UNION ALL SELECT 2, 'click', count(*)::BIGINT FROM s2
             |  UNION ALL SELECT 3, 'purchase', count(*)::BIGINT FROM s3)
             |ORDER BY step""".stripMargin),
      (s, dir) =>
        graft.operators.Funnel.funnelSteps(
          t(s, dir, "events"), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))),

    // ---- Z-order clustering key ----------------------------------
    // Morton interleave of (l_partkey, l_suppkey): the ZORDER BY
    // layout key — five shift-or-mask BIGINT steps per column,
    // bitwise-identical in both engines; ordering by it is the
    // clustered-write sort that makes zone maps work on BOTH keys.
    Q("q155_zorder", {
      def sp(e: String): String =
        Seq(16 -> "281470681808895", 8 -> "71777214294589695",
            4 -> "1085102592571150095", 2 -> "3689348814741910323",
            1 -> "6148914691236517205")
          .foldLeft(s"(($e)::BIGINT & 2147483647)") { case (x, (s, m)) =>
            s"(($x | ($x << $s)) & $m)"
          }
      Some(s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
              |  (${sp("l_partkey")} | (${sp("l_suppkey")} << 1))::BIGINT AS zval
              |FROM lineitem
              |ORDER BY zval, l_orderkey, l_linenumber""".stripMargin)
    },
      (s, dir) =>
        graft.operators.Sequencing.withZValue(
          t(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
          "l_partkey", "l_suppkey")
          .orderBy("zval", "l_orderkey", "l_linenumber")),

    // ---- interval merge (span flattening) ------------------------
    // Overlap-coalesced activity spans per user: each event spans
    // value minutes; merged bounds are pure integer min/max over the
    // (start, end)-sorted windows — q17 sessionize's geometric
    // sibling, the span-union primitive.
    Q("q154_merge_intervals",
      Some("""WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
             |    epoch_us(ts) + floor(value * 60000000)::BIGINT AS e FROM events),
             |m AS (SELECT user_id, s, e,
             |  max(e) OVER (PARTITION BY user_id ORDER BY s, e
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM iv),
             |g AS (SELECT user_id, s, e,
             |  sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
             |    OVER (PARTITION BY user_id ORDER BY s, e
             |      ROWS UNBOUNDED PRECEDING) AS gid FROM m)
             |SELECT user_id, min(s)::BIGINT AS ivl_start,
             |  max(e)::BIGINT AS ivl_end, count(*)::BIGINT AS n_merged
             |FROM g GROUP BY user_id, gid
             |ORDER BY user_id, ivl_start""".stripMargin),
      (s, dir) => {
        val iv = t(s, dir, "events").select(
          col("user_id"),
          expr("ts div 1000").as("s"),
          (expr("ts div 1000") +
            floor(col("value") * lit(60000000.0))).as("e"))
        graft.operators.TimeSeries.mergeIntervals(iv, "user_id", "s", "e")
          .orderBy("user_id", "ivl_start")
      }),

    // ---- per-user exponential moving average ---------------------
    // A sequential recurrence no window expresses: time-ordered list
    // + one strict left-to-right fold (q51 discipline); α = 1/4 is
    // dyadic so every step is the same IEEE tree in both engines.
    Q("q145_ema",
      Some("""WITH o AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
             |  FROM events GROUP BY user_id)
             |SELECT user_id, list_reduce(list_prepend(0.0::DOUBLE, vs),
             |  (acc, x) -> 0.25::DOUBLE * x + 0.75::DOUBLE * acc) AS ema
             |FROM o ORDER BY user_id""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.emaPerKey(
          t(s, dir, "events"), "user_id", "ts", "event_id", "value",
          alpha = 0.25)
          .orderBy("user_id")),

    // ---- forward-fill imputation ---------------------------------
    // Every third value nulled (both engines construct the gap
    // identically), then last-observation-carried-forward per user —
    // selection only, so filled values are bitwise originals;
    // leading nulls stay null.
    Q("q143_forward_fill",
      Some("""WITH e AS (SELECT event_id, user_id, ts,
             |  CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v FROM events)
             |SELECT event_id, user_id, v,
             |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
             |FROM e ORDER BY event_id""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.forwardFill(
          t(s, dir, "events")
            .select(col("event_id"), col("user_id"), col("ts"),
              when(col("event_id") % 3 === 0, lit(null)).otherwise(col("value")).as("v")),
          "user_id", "ts", "event_id", "v")
          .select(col("event_id"), col("user_id"), col("v"), col("filled"))
          .orderBy("event_id")),

    // ---- rolling trailing-window aggregates ----------------------
    // Per-user rolling sum over the trailing 3+current rows with a
    // DECIMAL-exact accumulator (window float sums associate
    // differently across engines; decimals don't).
    Q("q144_rolling_sum",
      Some("""SELECT event_id, user_id,
             |  (sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))::DOUBLE AS roll_sum,
             |  (count(value) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))::BIGINT AS roll_n
             |FROM events ORDER BY event_id""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.withRolling(
          t(s, dir, "events"), "user_id", "ts", "event_id", "value", nRows = 3)
          .select(col("event_id"), col("user_id"), col("roll_sum"), col("roll_n"))
          .orderBy("event_id")),

    // ---- first-order event-transition matrix ---------------------
    // What users do NEXT: adjacent (type → next type) counts over
    // each user's time-ordered timeline (one user-keyed shuffle with
    // human-bounded in-group sorts — the sessionize shape; the final
    // aggregate is type²-bounded). Spark orders by the nanos long,
    // DuckDB by the native timestamp — the same total order.
    Q("q134_transitions",
      Some("""WITH n AS (SELECT event_type AS from_type,
             |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events)
             |SELECT from_type, to_type, count(*)::BIGINT AS n
             |FROM n WHERE to_type IS NOT NULL
             |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin),
      (s, dir) =>
        graft.operators.Funnel.transitionCounts(
          t(s, dir, "events"), "user_id", "ts", "event_type", "event_id")),

    // ---- sessionization (gap > 30 min) ---------------------------
    Q("q17_sessionize",
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
             |g AS (SELECT user_id,
             |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
             |         OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
             |       THEN 1 ELSE 0 END AS new_sess
             |  FROM e)
             |SELECT user_id, count(*) AS n_events, sum(new_sess)::BIGINT AS n_sessions
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        t(s, dir, "events")
          .withColumn("us", expr("ts div 1000"))
          .withColumn("prev", lag(col("us"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1).otherwise(0))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), sum(col("new_sess")).as("n_sessions"))
          .orderBy("user_id")
      }),

    // ---- as-of join: latest prior click per purchase -------------
    // Custom operator (AsofJoin): union -> one key shuffle -> sort ->
    // struct carry-forward; oracle mirrors the identical window logic.
    Q("q19_asof_join",
      Some("""WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'),
             |r AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events WHERE event_type = 'click'),
             |u AS (
             |  SELECT user_id, us, 1 AS side, 0::BIGINT AS ord, event_id, NULL AS payload
             |  FROM l
             |  UNION ALL
             |  SELECT user_id, us, 0 AS side, event_id AS ord, NULL::BIGINT AS event_id,
             |         {'event_id': event_id, 'value': value} AS payload
             |  FROM r),
             |c AS (SELECT user_id, us, side, event_id,
             |        last_value(payload IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY us, side, ord
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
             |      FROM u)
             |SELECT event_id, user_id, m.event_id AS r_event_id, m.value AS r_value
             |FROM c WHERE side = 1 ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("us", expr("ts div 1000"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select("user_id", "event_id", "us")
        val clicks = ev.where(col("event_type") === "click")
          .select("user_id", "event_id", "value", "us")
        graft.operators.AsofJoin.asofJoin(
          purchases, clicks, keys = Seq("user_id"),
          leftTime = "us", rightTime = "us",
          rightCols = Seq("event_id", "value"), rightOrd = "event_id")
          .select("event_id", "user_id", "r_event_id", "r_value")
          .orderBy("event_id")
      }),

    // ---- top event per user (window + filter) --------------------
    Q("q18_top_event_per_user",
      Some("""SELECT user_id, event_id, value FROM (
             |  SELECT user_id, event_id, value,
             |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
             |  FROM events)
             |WHERE rn = 1 ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select("user_id", "event_id", "value")
          .orderBy("user_id")
      }),

    // ---- windowed range join (bucketize-and-join) ----------------
    // Clicks within the 10 minutes preceding each purchase, per user:
    // bucketized equi-join (one hash shuffle) instead of a nested-loop
    // range join.
    Q("q25_range_join",
      Some("""WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS lus FROM events WHERE event_type = 'purchase'),
             |r AS (SELECT user_id, value, epoch_us(ts) AS rus FROM events WHERE event_type = 'click')
             |SELECT l.event_id, count(*) AS n_clicks,
             |  (sum(CAST(r.value AS DECIMAL(18,2))))::DOUBLE AS sum_value
             |FROM l JOIN r ON l.user_id = r.user_id
             |  AND r.rus >= l.lus - 600000000 AND r.rus <= l.lus
             |GROUP BY l.event_id ORDER BY l.event_id""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("lus"))
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("value"), expr("ts div 1000").as("rus"))
        graft.operators.RangeJoin.priorWindowJoin(
          purchases, clicks, Seq("user_id"), "lus", "rus", before = 600000000L)
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_clicks"), sumDec("value").as("sum_value"))
          .orderBy("event_id")
      }),

    // ---- salted two-phase aggregation (skew handling) ------------
    // Only 3 distinct keys -> without salting, 3 reducers own ALL the
    // data; the salted partial phase spreads each key over 16
    // reducers. Decimal-exact sums make the two-phase result equal the
    // direct aggregation bit-for-bit.
    Q("q26_salted_agg",
      Some("""SELECT l_returnflag,
             |  (sum(CAST(l_extendedprice AS DECIMAL(18,2))))::DOUBLE AS sum_value,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        graft.operators.Skew.saltedSumCount(
          t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice",
          salts = 16, saltFrom = "l_orderkey")
          .orderBy("l_returnflag")),

    // ---- salted JOIN (skewed big side x replicated small side) ---
    // Salting is semantically transparent: the oracle is the PLAIN
    // join. The salted plan shuffles lineitem on (suppkey, salt) so a
    // hot supplier spreads over 8 reducers while supplier is exploded
    // 8-fold (tiny). Decimal-exact sum keeps the aggregate bitwise
    // comparable.
    Q("q65_salted_join",
      Some("""SELECT s_nationkey,
             |  (sum(CAST(l_extendedprice AS DECIMAL(18,2))))::DOUBLE AS sum_price,
             |  count(*) AS n
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin),
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_suppkey").as("suppkey"), col("l_extendedprice"))
        val sup = t(s, dir, "supplier")
          .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
        graft.operators.Skew.saltedJoin(li, sup, "suppkey",
          salts = 8, saltFrom = "l_extendedprice")
          .groupBy(col("s_nationkey"))
          .agg(
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
            count(lit(1)).as("n"))
          .orderBy("s_nationkey")
      }),

    // ---- cube grouping sets + grouping() -------------------------
    Q("q27_cube_counts",
      Some("""SELECT l_returnflag, l_linestatus,
             |  grouping(l_returnflag)::INT AS g_flag, grouping(l_linestatus)::INT AS g_status,
             |  count(*) AS n
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, g_flag, g_status""".stripMargin),
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping(col("l_returnflag")).cast("int").as("g_flag"),
            grouping(col("l_linestatus")).cast("int").as("g_status"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first,
            col("g_flag"), col("g_status"))),

    // ---- semi / anti joins ---------------------------------------
    Q("q28_semi_anti",
      Some("""SELECT
             |  (SELECT count(*) FROM part p WHERE EXISTS
             |    (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)) AS n_bulk,
             |  (SELECT count(*) FROM part p WHERE NOT EXISTS
             |    (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)) AS n_never_bulk""".stripMargin),
      (s, dir) => {
        val part = t(s, dir, "part")
        val bulk = t(s, dir, "lineitem").where(col("l_quantity") >= 49)
        val semi = part.join(bulk, col("p_partkey") === col("l_partkey"), "left_semi")
          .agg(count(lit(1)).as("n_bulk"))
        val anti = part.join(bulk, col("p_partkey") === col("l_partkey"), "left_anti")
          .agg(count(lit(1)).as("n_never_bulk"))
        semi.crossJoin(anti)
      }),

    // ---- left outer join with null-preserving aggregation --------
    Q("q29_left_outer",
      Some("""SELECT s_suppkey, count(l_orderkey) AS n_items,
             |  (sum(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sum_qty
             |FROM supplier LEFT JOIN lineitem
             |  ON s_suppkey = l_suppkey AND l_quantity > 49
             |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin),
      (s, dir) =>
        t(s, dir, "supplier")
          .join(t(s, dir, "lineitem"),
            col("s_suppkey") === col("l_suppkey") && col("l_quantity") > 49, "left")
          .groupBy(col("s_suppkey"))
          .agg(
            count(col("l_orderkey")).as("n_items"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("s_suppkey")),

    // ---- pivot (wide aggregation) --------------------------------
    // Spark's pivot relational operator; the oracle spells the same
    // result as portable conditional aggregation.
    Q("q49_pivot_events",
      Some("""SELECT user_id % 10 AS user_bucket,
             |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
             |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
             |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
             |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
             |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view
             |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin),
      (s, dir) =>
        t(s, dir, "events")
          .groupBy((col("user_id") % 10).as("user_bucket"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(coalesce(count(lit(1)), lit(0L)))
          .na.fill(0L)
          .orderBy("user_bucket")),

    // ---- cumulative window aggregation ---------------------------
    Q("q50_running_revenue",
      Some("""SELECT o_custkey, o_orderkey,
             |  (sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE AS running_total
             |FROM orders WHERE o_custkey < 100 ORDER BY o_custkey, o_orderkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .where(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
              .cast("double").as("running_total"))
          .orderBy("o_custkey", "o_orderkey")
      }),

    // ---- array aggregation (collect + sort for determinism) ------
    // The sorted distinct set is serialized with array_join so the
    // result columns are scalars: the driver's compare sorts values
    // column-wise and cannot hash an array cell (round-2 red row).
    // The cardinality (n_statuses) still witnesses the set semantics.
    Q("q57_collect_array",
      Some("""SELECT l_returnflag,
             |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
             |  count(DISTINCT l_linestatus) AS n_statuses
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            array_join(sort_array(collect_set(col("l_linestatus"))), ",").as("statuses"),
            countDistinct(col("l_linestatus")).as("n_statuses"))
          .orderBy("l_returnflag")),

    // ---- SQL interface: correlated scalar subquery ---------------
    // Exercises spark.sql(...) over registered views — Catalyst
    // decorrelates the subquery into a join.
    Q("q58_correlated_subquery",
      Some("""SELECT c_custkey,
             |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
             |FROM customer c WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT c_custkey,
                |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
                |FROM customer c WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin)
      }),

    // ---- date arithmetic -----------------------------------------
    Q("q59_date_arithmetic",
      Some("""SELECT epoch(date_trunc('week', o_orderdate))::BIGINT AS week_epoch,
             |  count(*) AS n,
             |  min(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate))::INT AS min_days,
             |  max(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate))::INT AS max_days
             |FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
             |GROUP BY 1 ORDER BY week_epoch""".stripMargin),
      (s, dir) =>
        t(s, dir, "orders")
          .where(col("o_orderdate") < to_timestamp(lit("1996-01-01")))
          .groupBy(unix_timestamp(date_trunc("week", col("o_orderdate"))).as("week_epoch"))
          .agg(
            count(lit(1)).as("n"),
            min(datediff(col("o_orderdate"), to_date(lit("1995-01-01")))).as("min_days"),
            max(datediff(col("o_orderdate"), to_date(lit("1995-01-01")))).as("max_days"))
          .orderBy("week_epoch")),

    // ---- sketch aggregates (HLL++ / GK) --------------------------
    // Approximate sketch VALUES are implementation-defined (DuckDB's
    // HLL would differ by design), so the hash-matchable statement is
    // the sketch's CONTRACT: Spark compares its own approx aggregates
    // against its own exact aggregates at the pinned error bounds
    // (HLL++ rsd 0.05 → |approx/exact − 1| ≤ 3·rsd; approx_percentile
    // accuracy 1000 → rank error 1/1000, checked against the exact
    // p45/p55 envelope) and emits booleans; the oracle derives the
    // same booleans from exact DuckDB aggregates — trivially true —
    // so a sketch drifting out of bounds is a HASH MISMATCH, not an
    // unchecked row. Tighter per-run bounds live in SketchSpec.
    Q("q45_sketches",
      Some("""SELECT l_returnflag, count(*)::BIGINT AS n,
             |  true AS orders_in_bounds, true AS median_in_bounds
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            approx_count_distinct(col("l_orderkey"), 0.05).as("__approx_d"),
            countDistinct(col("l_orderkey")).as("__exact_d"),
            expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("__approx_med"),
            expr("percentile(l_extendedprice, 0.45)").as("__med_lo"),
            expr("percentile(l_extendedprice, 0.55)").as("__med_hi"))
          .withColumn("orders_in_bounds",
            abs(col("__approx_d").cast("double") / col("__exact_d") - 1.0) <= 0.15)
          .withColumn("median_in_bounds",
            col("__approx_med") >= col("__med_lo") && col("__approx_med") <= col("__med_hi"))
          .select(col("l_returnflag"), col("n"),
            col("orders_in_bounds"), col("median_in_bounds"))
          .orderBy("l_returnflag")),

    // ---- single-pass column profiling ----------------------------
    // One aggregation pass over orders computes every column's
    // null/distinct/min/max stats (multi-distinct via Expand; the
    // operator's approx mode is the 100 TB path, exact here for the
    // oracle). min/max compare the STRING rendering in both engines.
    Q("q78_profile", {
      val cols = Seq("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus")
      Some(cols.map(c =>
        s"""SELECT '$c' AS column_name, count(*)::BIGINT AS n_rows,
           |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
           |  count(DISTINCT $c)::BIGINT AS n_distinct,
           |  min($c::VARCHAR) AS min_value, max($c::VARCHAR) AS max_value
           |FROM orders""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name"))
    },
      (s, dir) =>
        graft.operators.Profile.profile(
          tp(s, dir, "orders", "o_orderkey"),
          Seq("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus"))
          .orderBy("column_name")),

    // ---- profiling, approximate-distinct (100 TB) mode -----------
    // Profile.profile(exactDistinct = false) is the advertised scale
    // path (HLL++ instead of the multi-distinct Expand); its witness
    // is the q45 bounds-check pattern — Spark compares its own approx
    // n_distinct against its own exact n_distinct at 3·rsd (HLL++
    // default rsd 0.05) and emits a boolean; the oracle derives the
    // identical row from exact DuckDB aggregates, so sketch drift is
    // a hash mismatch. Exact columns (rows/nulls/min/max) are
    // oracle-exact directly — they are plain partial aggregates in
    // BOTH profile modes.
    // (witnessed on 2 columns — one high-cardinality key, one
    // low-cardinality string — because the checked mode pays the
    // Expand AND per-row HLL updates per column; q78 keeps 4-column
    // exact coverage, and the bounds contract is column-count-
    // independent.)
    Q("q86_profile_approx", {
      val cols = Seq("o_custkey", "o_orderpriority")
      Some(cols.map(c =>
        s"""SELECT '$c' AS column_name, count(*)::BIGINT AS n_rows,
           |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
           |  count(DISTINCT $c)::BIGINT AS n_distinct,
           |  min($c::VARCHAR) AS min_value, max($c::VARCHAR) AS max_value,
           |  true AS distinct_in_bounds
           |FROM orders""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name"))
    },
      (s, dir) =>
        graft.operators.Profile.profileChecked(
          tp(s, dir, "orders", "o_orderkey"),
          Seq("o_custkey", "o_orderpriority"))
          .orderBy("column_name")),

    // ---- declarative data-quality expectations -------------------
    // Named boolean rules evaluated in one aggregation pass; NULL
    // rule results count as violations (unknown never passes a gate).
    Q("q84_expectations", {
      val rules = Seq(
        "discount_range" -> "l_discount >= 0 AND l_discount <= 1",
        "flag_known" -> "l_returnflag IN ('A', 'N', 'R')",
        "price_nonneg" -> "l_extendedprice >= 0",
        "qty_positive" -> "l_quantity > 0")
      Some(rules.map { case (name, sql) =>
        s"""SELECT '$name' AS rule, count(*)::BIGINT AS n_rows,
           |  sum(CASE WHEN NOT coalesce($sql, false) THEN 1 ELSE 0 END)::BIGINT AS n_violations,
           |  (sum(CASE WHEN NOT coalesce($sql, false) THEN 1 ELSE 0 END) = 0) AS pass
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY rule"))
    },
      (s, dir) =>
        graft.operators.Validate.expect(
          t(s, dir, "lineitem"),
          Seq(
            "discount_range" -> "l_discount >= 0 AND l_discount <= 1",
            "flag_known" -> "l_returnflag IN ('A', 'N', 'R')",
            "price_nonneg" -> "l_extendedprice >= 0",
            "qty_positive" -> "l_quantity > 0"))
          .orderBy("rule")),

    // ---- per-group quantile winsorization ------------------------
    // Clip o_totalprice into its per-status [p05, p95] envelope
    // (bounds join back as a broadcast); clipped sum decimal-cast for
    // cross-engine float parity. percentile == quantile_cont bitwise.
    Q("q80_winsorize",
      Some("""WITH b AS (SELECT o_orderstatus,
             |    quantile_cont(o_totalprice::DOUBLE, 0.05) AS lo,
             |    quantile_cont(o_totalprice::DOUBLE, 0.95) AS hi
             |  FROM orders GROUP BY o_orderstatus)
             |SELECT o.o_orderstatus, count(*) AS n,
             |  (sum(CAST(least(greatest(o.o_totalprice::DOUBLE, b.lo), b.hi) AS DECIMAL(18,6))))::DOUBLE AS sum_clipped
             |FROM orders o JOIN b USING (o_orderstatus)
             |GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.winsorize(
          t(s, dir, "orders"), "o_totalprice", "o_orderstatus",
          lo = 0.05, hi = 0.95, out = "clipped")
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n"),
            sumDec("clipped", 6).as("sum_clipped"))
          .orderBy("o_orderstatus")),

    // ---- robust MAD outlier flags --------------------------------
    // |x − median| > 3·MAD within each order status; medians/MADs are
    // the same exact interpolated quantiles q44 proves bitwise-equal
    // across engines, so the boolean flags (and their counts)
    // hash-match.
    Q("q103_mad_outliers",
      Some("""WITH med AS (SELECT o_orderstatus,
             |  quantile_cont(o_totalprice::DOUBLE, 0.5) AS m FROM orders GROUP BY 1),
             |ad AS (SELECT o.o_orderstatus, abs(o.o_totalprice::DOUBLE - med.m) AS adev
             |  FROM orders o JOIN med USING (o_orderstatus)),
             |mad AS (SELECT o_orderstatus, quantile_cont(adev, 0.5) AS md FROM ad GROUP BY 1)
             |SELECT ad.o_orderstatus, count(*) AS n,
             |  sum(CASE WHEN ad.adev > 3.0 * mad.md THEN 1 ELSE 0 END)::BIGINT AS n_outliers
             |FROM ad JOIN mad USING (o_orderstatus)
             |GROUP BY ad.o_orderstatus ORDER BY ad.o_orderstatus""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.madOutliers(
          t(s, dir, "orders"), "o_totalprice", "o_orderstatus", k = 3.0)
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("is_outlier"), 1).otherwise(0)).cast("bigint").as("n_outliers"))
          .orderBy("o_orderstatus")),

    // ---- interval-overlap join (bucketized, credit-deduped) ------
    // Urgent-order service windows [day, day + 1..5) overlapping
    // high-priority windows: the Spark side explodes covering day
    // buckets, equi-joins on the bucket, and counts each pair once
    // via the credit rule (only the bucket holding max(starts) emits)
    // — no nested-loop range join, no post-join distinct. Oracle is
    // the plain inequality join.
    Q("q118_interval_overlap",
      Some("""WITH a AS (SELECT o_orderkey AS a_id,
             |    (o_orderdate::DATE - DATE '1970-01-01') AS s,
             |    (o_orderdate::DATE - DATE '1970-01-01') + (o_orderkey % 5 + 1) AS e
             |  FROM orders WHERE o_orderpriority = '1-URGENT'),
             |b AS (SELECT o_orderkey AS b_id,
             |    (o_orderdate::DATE - DATE '1970-01-01') AS s,
             |    (o_orderdate::DATE - DATE '1970-01-01') + (o_orderkey % 5 + 1) AS e
             |  FROM orders WHERE o_orderpriority = '2-HIGH')
             |SELECT count(*) AS n_pairs,
             |  sum(least(a.e, b.e) - greatest(a.s, b.s))::BIGINT AS sum_overlap
             |FROM a JOIN b ON a.s < b.e AND b.s < a.e""".stripMargin),
      (s, dir) => {
        val orders = t(s, dir, "orders")
        def iv(prio: String) = orders.where(col("o_orderpriority") === prio)
          .withColumn("s", expr("datediff(o_orderdate, DATE'1970-01-01')").cast("long"))
          .withColumn("e", col("s") + (col("o_orderkey") % 5 + 1))
        graft.operators.RangeJoin.intervalOverlapPairs(
          iv("1-URGENT"), "o_orderkey", "s", "e",
          iv("2-HIGH"), "o_orderkey", "s", "e", bucketWidth = 4L)
          .agg(count(lit(1)).as("n_pairs"), sum(col("overlap")).as("sum_overlap"))
      }),

    // ---- equi-width histogram ------------------------------------
    // width_bucket semantics in both engines; bucket 0 / nb+1 carry
    // under/overflow with null edges; edges are one multiply-and-add
    // per bucket index (exact-rounded, hash-comparable).
    Q("q115_histogram",
      Some("""WITH h AS (SELECT (CASE WHEN o_totalprice::DOUBLE < 0.0 THEN 0
             |    WHEN o_totalprice::DOUBLE >= 400000.0 THEN 17
             |    ELSE (floor((o_totalprice::DOUBLE - 0.0) / 25000.0) + 1)::INT END) AS bucket
             |  FROM orders WHERE o_totalprice IS NOT NULL)
             |SELECT bucket,
             |  CASE WHEN bucket BETWEEN 1 AND 16 THEN 0.0 + (bucket - 1)::DOUBLE * 25000.0 END AS lo_edge,
             |  CASE WHEN bucket BETWEEN 1 AND 16 THEN 0.0 + bucket::DOUBLE * 25000.0 END AS hi_edge,
             |  count(*) AS n
             |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin),
      (s, dir) =>
        graft.operators.Profile.histogram(
          t(s, dir, "orders"), "o_totalprice", lo = 0.0, hi = 400000.0, nb = 16)),

    // ---- referential integrity (orphan detection) ----------------
    // lineitem→orders with a deliberately punctured parent (every
    // third order removed) so the orphan path is exercised; the
    // parent reduces to distinct keys before the join.
    Q("q116_referential",
      Some("""WITH parent AS (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 3 <> 0)
             |SELECT count(*) AS n_child,
             |  sum(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_keys,
             |  sum(CASE WHEN l.l_orderkey IS NOT NULL AND p.o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_orphans,
             |  sum(CASE WHEN l.l_orderkey IS NOT NULL AND p.o_orderkey IS NULL THEN 1 ELSE 0 END) = 0 AS ok
             |FROM lineitem l LEFT JOIN parent p ON p.o_orderkey = l.l_orderkey""".stripMargin),
      (s, dir) =>
        graft.operators.Validate.referentialIntegrity(
          t(s, dir, "lineitem"),
          t(s, dir, "orders").where(col("o_orderkey") % 3 =!= 0),
          "l_orderkey", "o_orderkey")),

    // ---- dense global ordinals without a global window -----------
    // Ordinal = row_number over (o_totalprice, o_orderkey) — the
    // Spark side decomposes into quantile buckets + per-bucket
    // windows + driver offsets (no single-partition exchange; plan
    // pinned in OperatorsSpec); the oracle states the naive window.
    Q("q117_global_ordinals",
      Some("""WITH r AS (SELECT o_orderkey,
             |  row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS ordinal
             |  FROM orders)
             |SELECT o_orderkey, ordinal FROM r WHERE ordinal <= 100
             |ORDER BY ordinal""".stripMargin),
      (s, dir) =>
        graft.operators.Sequencing.withGlobalOrdinals(
          t(s, dir, "orders"), "o_totalprice", "o_orderkey")
          .where(col("ordinal") <= 100)
          .select("o_orderkey", "ordinal")
          .orderBy("ordinal")),

    // ---- exact percentiles (sort-based quantiles) ----------------
    Q("q44_percentiles",
      Some("""SELECT o_orderstatus,
             |  quantile_cont(o_totalprice::DOUBLE, 0.5) AS p50,
             |  quantile_cont(o_totalprice::DOUBLE, 0.9) AS p90,
             |  count(*) AS n
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            expr("percentile(o_totalprice, 0.5)").as("p50"),
            expr("percentile(o_totalprice, 0.9)").as("p90"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus")),

    // ---- PageRank centrality (exact scaled-integer iteration) ----
    // The supplier↔part supply graph from lineitem, ranked by 3
    // power-iteration rounds. Ranks are exact ppm integers (fixed
    // recurrence tree, integral divides), so both engines land on
    // identical longs; the oracle unrolls the same 3 rounds as
    // chained CTEs. Top 20 by rank with node tie-break.
    Q("q205_pagerank",
      Some("""WITH e0 AS (SELECT DISTINCT 's' || l_suppkey AS src,
             |    'p' || l_partkey AS dst FROM lineitem),
             |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
             |nodes AS (SELECT DISTINCT src AS node FROM e),
             |base AS (SELECT (1000000::HUGEINT // count(*)) AS b FROM nodes),
             |deg AS (SELECT src, count(*)::HUGEINT AS d FROM e GROUP BY src),
             |r0 AS (SELECT node, b AS r FROM nodes CROSS JOIN base),
             |c1 AS (SELECT e.dst AS node, sum(r0.r // deg.d) AS s FROM e
             |  JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
             |  GROUP BY e.dst),
             |r1 AS (SELECT nodes.node,
             |  (150 * b + 850 * coalesce(c1.s, 0)) // 1000 AS r
             |  FROM nodes CROSS JOIN base LEFT JOIN c1 ON nodes.node = c1.node),
             |c2 AS (SELECT e.dst AS node, sum(r1.r // deg.d) AS s FROM e
             |  JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
             |  GROUP BY e.dst),
             |r2 AS (SELECT nodes.node,
             |  (150 * b + 850 * coalesce(c2.s, 0)) // 1000 AS r
             |  FROM nodes CROSS JOIN base LEFT JOIN c2 ON nodes.node = c2.node),
             |c3 AS (SELECT e.dst AS node, sum(r2.r // deg.d) AS s FROM e
             |  JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
             |  GROUP BY e.dst),
             |r3 AS (SELECT nodes.node,
             |  (150 * b + 850 * coalesce(c3.s, 0)) // 1000 AS r
             |  FROM nodes CROSS JOIN base LEFT JOIN c3 ON nodes.node = c3.node)
             |SELECT node, r::BIGINT AS rank_ppm FROM r3
             |ORDER BY rank_ppm DESC, node LIMIT 20""".stripMargin),
      (s, dir) => {
        // no .distinct() here: pageRank dropDuplicates the union
        // anyway — a pre-distinct would just add a 3rd shuffle.
        // Nodes ride as LONGS through the three BSP rounds (suppliers
        // even, parts odd — rank arithmetic never looks at the key)
        // and become the oracle's 's…'/'p…' labels only in the final
        // 20-row projection: long keys hash, shuffle, and sort ~3×
        // faster than strings at the gate config, and proportionally
        // more at 100 TB where the key bytes dominate shuffle volume.
        val e0 = t(s, dir, "lineitem").select(
          (col("l_suppkey").cast("long") * 2L).as("src"),
          (col("l_partkey").cast("long") * 2L + 1L).as("dst"))
        val e = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
        graft.operators.Components.pageRank(e, "src", "dst", iters = 3)
          .select(
            when(col("node") % 2 === 0,
              concat(lit("s"), expr("node div 2")))
              .otherwise(concat(lit("p"), expr("node div 2"))).as("node"),
            col("rank_ppm"))
          .orderBy(col("rank_ppm").desc, col("node"))
          .limit(20)
      }),

    // ---- personalized PageRank (seeded teleport) -----------------
    // q205's graph re-ranked from a trusted seed set (every 5th
    // supplier): teleport mass lands only on seeds, so ranks read
    // "proximity to the seeds" — the crawl-frontier prioritizer. Same
    // exact ppm recurrence, seed-gated base term, 3 unrolled rounds.
    // Runs on the 1-in-7-parts subgraph: q205 already witnesses the
    // full-graph BSP cost; this query's point is teleport semantics.
    Q("q216_personalized_pagerank",
      Some("""WITH e0 AS (SELECT DISTINCT 's' || l_suppkey AS src,
             |    'p' || l_partkey AS dst FROM lineitem WHERE l_partkey % 7 = 0),
             |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
             |nodes AS (SELECT DISTINCT src AS node FROM e),
             |sd AS (SELECT DISTINCT 's' || s_suppkey AS node FROM supplier
             |  WHERE s_suppkey % 5 = 0),
             |ns AS (SELECT n.node,
             |  CASE WHEN sd.node IS NOT NULL THEN 1::HUGEINT ELSE 0::HUGEINT END AS sg
             |  FROM nodes n LEFT JOIN sd ON n.node = sd.node),
             |base AS (SELECT (1000000::HUGEINT // sum(sg)) AS b FROM ns),
             |deg AS (SELECT src, count(*)::HUGEINT AS d FROM e GROUP BY src),
             |r0 AS (SELECT node, sg, b * sg AS r FROM ns CROSS JOIN base),
             |c1 AS (SELECT e.dst AS node, sum(r0.r // deg.d) AS s FROM e
             |  JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
             |  GROUP BY e.dst),
             |r1 AS (SELECT ns.node, ns.sg,
             |  (150 * b * ns.sg + 850 * coalesce(c1.s, 0)) // 1000 AS r
             |  FROM ns CROSS JOIN base LEFT JOIN c1 ON ns.node = c1.node),
             |c2 AS (SELECT e.dst AS node, sum(r1.r // deg.d) AS s FROM e
             |  JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
             |  GROUP BY e.dst),
             |r2 AS (SELECT ns.node, ns.sg,
             |  (150 * b * ns.sg + 850 * coalesce(c2.s, 0)) // 1000 AS r
             |  FROM ns CROSS JOIN base LEFT JOIN c2 ON ns.node = c2.node),
             |c3 AS (SELECT e.dst AS node, sum(r2.r // deg.d) AS s FROM e
             |  JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
             |  GROUP BY e.dst),
             |r3 AS (SELECT ns.node, ns.sg,
             |  (150 * b * ns.sg + 850 * coalesce(c3.s, 0)) // 1000 AS r
             |  FROM ns CROSS JOIN base LEFT JOIN c3 ON ns.node = c3.node)
             |SELECT node, r::BIGINT AS rank_ppm FROM r3
             |ORDER BY rank_ppm DESC, node LIMIT 20""".stripMargin),
      (s, dir) => {
        // Long-encoded nodes (the q205 scheme); labels reconstructed
        // only in the final 20-row projection.
        val e0 = t(s, dir, "lineitem").where(col("l_partkey") % 7 === 0)
          .select(
            (col("l_suppkey").cast("long") * 2L).as("src"),
            (col("l_partkey").cast("long") * 2L + 1L).as("dst"))
        val e = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
        // Key-modulo seeds: non-empty inside the subgraph at EVERY
        // scale factor (a nationkey predicate had zero members in the
        // sf0.001 subgraph, tripping the operator's disjoint-seed
        // raise).
        val seeds = t(s, dir, "supplier").where(col("s_suppkey") % 5 === 0)
          .select((col("s_suppkey").cast("long") * 2L).as("node"))
        graft.operators.Components.personalizedPageRank(
          e, "src", "dst", seeds, "node", iters = 3)
          .select(
            when(col("node") % 2 === 0,
              concat(lit("s"), expr("node div 2")))
              .otherwise(concat(lit("p"), expr("node div 2"))).as("node"),
            col("rank_ppm"))
          .orderBy(col("rank_ppm").desc, col("node"))
          .limit(20)
      }),

    // ---- trailing z-score anomaly flags --------------------------
    // Per event type, events more than 3σ from their trailing-20
    // window — the σ-compare cross-multiplied into one exact integer
    // inequality (no float mean, no sqrt). Census checks the flagged
    // SET via id-sums.
    Q("q211_anomaly_flags",
      Some("""WITH q AS (SELECT event_id, event_type, ts,
             |  floor(value * 100 + 0.5)::HUGEINT AS x FROM events),
             |w AS (SELECT event_type, event_id, x,
             |  count(*) OVER win AS w,
             |  coalesce(sum(x) OVER win, 0) AS s1,
             |  coalesce(sum(x * x) OVER win, 0) AS s2
             |  FROM q WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
             |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
             |f AS (SELECT event_type, event_id,
             |  CASE WHEN w < 20 THEN NULL
             |    ELSE (w * x - s1) * (w * x - s1) > 9 * (w * s2 - s1 * s1) END AS a
             |  FROM w)
             |SELECT event_type, count(*)::BIGINT AS n_events,
             |  sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_anomalies,
             |  sum(CASE WHEN a THEN event_id ELSE 0 END)::BIGINT AS sum_anomaly_ids
             |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("x",
          floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
        graft.operators.TimeSeries.flagAnomalies(
          ev, "event_type", "ts", "event_id", "x", nRows = 20, k = 3)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).cast("bigint").as("n_events"),
            sum(when(col("is_anomaly"), 1L).otherwise(0L)).cast("bigint")
              .as("n_anomalies"),
            sum(when(col("is_anomaly"), col("event_id")).otherwise(0L))
              .cast("bigint").as("sum_anomaly_ids"))
          .orderBy("event_type")
      }),

    // ---- PSI drift between event-type value distributions --------
    // Per-bin population-stability contributions with the sign-
    // consistent integer-log2 surrogate (no libm) — click vs
    // purchase over value in [0, 300), 10 bins + under/overflow.
    Q("q222_psi_drift",
      Some("""WITH e AS (SELECT event_type, value FROM events
             |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
             |b AS (SELECT CASE WHEN value < 0.0 THEN 0
             |    WHEN value >= 300.0 THEN 11
             |    ELSE floor((value - 0.0) / 30.0)::INT + 1 END AS bucket,
             |  event_type FROM e),
             |c AS (SELECT bucket,
             |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_a,
             |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_b
             |  FROM b GROUP BY bucket),
             |t AS (SELECT sum(n_a)::BIGINT AS tot_a, sum(n_b)::BIGINT AS tot_b FROM c),
             |x AS (SELECT bucket, n_a, n_b,
             |  (n_a + 1) * (tot_b + 12) AS xx, (n_b + 1) * (tot_a + 12) AS yy
             |  FROM c CROSS JOIN t)
             |SELECT bucket, n_a, n_b,
             |  ((xx - yy) * (length(bin(xx)) - length(bin(yy))))::BIGINT AS contrib
             |FROM x ORDER BY bucket""".stripMargin),
      (s, dir) =>
        graft.operators.Profile.psiDrift(
          t(s, dir, "events"), "value", "event_type", "click", "purchase",
          lo = 0.0, hi = 300.0, nb = 10)),

    // ---- per-session training transcripts ------------------------
    // Dialogue assembly: gap-sessionized (30 min) user timelines
    // rendered as deterministic `type@offset_s` transcripts — the
    // event-log → chat-corpus shaping step. Byte-exact across engines
    // because turn order is pinned on (ts, event_id).
    Q("q226_dialogues",
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
             |g AS (SELECT user_id, event_id, event_type, us,
             |  CASE WHEN lag(us) OVER w IS NULL
             |    OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
             |  ROWS UNBOUNDED PRECEDING) AS sess FROM g),
             |t AS (SELECT *, min(us) OVER (PARTITION BY user_id, sess) AS start_us FROM s)
             |SELECT user_id, min(us)::BIGINT AS session_start_us,
             |  count(*)::BIGINT AS n_turns,
             |  ((max(us) - min(us)) // 1000000)::BIGINT AS duration_s,
             |  string_agg(event_type || '@' || ((us - start_us) // 1000000)::VARCHAR,
             |    ' ' ORDER BY us, event_id) AS transcript
             |FROM t GROUP BY user_id, sess
             |ORDER BY user_id, session_start_us""".stripMargin),
      (s, dir) =>
        graft.operators.Dialogue.assembleSessions(
          t(s, dir, "events")
            .select(col("user_id"), col("event_id"), col("event_type"),
              expr("ts div 1000").as("us")),
          "user_id", "us", "event_type", "event_id",
          gapUs = 1800000000L)),

    // ---- count-min sketch frequency estimates --------------------
    // Mergeable CMS per returnflag over l_quantity (built-in
    // count_min_sketch aggregate; graft_cms_query is the engine's
    // point-query half). Bounds-check pattern (q45): the estimate
    // must sit in [exact, exact + ceil(eps*N)] — with the pinned
    // seed that is deterministic, so sketch drift is a hash
    // mismatch. Oracle derives the same booleans from exact counts.
    Q("q228_cms_counts",
      Some("""SELECT l_returnflag, count(*)::BIGINT AS n,
             |  sum(CASE WHEN l_quantity::BIGINT = 1 THEN 1 ELSE 0 END)::BIGINT AS exact_q1,
             |  sum(CASE WHEN l_quantity::BIGINT = 25 THEN 1 ELSE 0 END)::BIGINT AS exact_q25,
             |  sum(CASE WHEN l_quantity::BIGINT = 50 THEN 1 ELSE 0 END)::BIGINT AS exact_q50,
             |  true AS q1_in_bounds, true AS q25_in_bounds, true AS q50_in_bounds
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) => {
        val g = t(s, dir, "lineitem")
          .withColumn("__q", expr("CAST(l_quantity AS BIGINT)"))
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            expr("count_min_sketch(__q, 0.01d, 0.99d, 42)").as("__cms"),
            sum(when(col("__q") === 1L, 1L).otherwise(0L)).as("exact_q1"),
            sum(when(col("__q") === 25L, 1L).otherwise(0L)).as("exact_q25"),
            sum(when(col("__q") === 50L, 1L).otherwise(0L)).as("exact_q50"))
        def ok(v: Long, exact: String) = {
          val est = expr(s"graft_cms_query(__cms, CAST($v AS BIGINT))")
          est >= col(exact) &&
            est <= col(exact) + expr("CAST(ceil(0.01d * n) AS BIGINT)")
        }
        g.withColumn("q1_in_bounds", ok(1L, "exact_q1"))
          .withColumn("q25_in_bounds", ok(25L, "exact_q25"))
          .withColumn("q50_in_bounds", ok(50L, "exact_q50"))
          .select(col("l_returnflag"), col("n"),
            col("exact_q1"), col("exact_q25"), col("exact_q50"),
            col("q1_in_bounds"), col("q25_in_bounds"), col("q50_in_bounds"))
          .orderBy("l_returnflag")
      }),

    // ---- Benford first-digit audit -------------------------------
    // Leading digit of |l_extendedprice| (truncated to integer
    // magnitude) vs the Benford shares — fabricated-data smell test.
    // The digit comes from the decimal STRING rendering (exact in any
    // engine, no runtime log10); Benford shares are driver constants
    // shared with the oracle; everything else is integer ppm.
    Q("q234_benford_audit", {
      val b = graft.operators.Profile.benfordPpm
      val bCase = (1 to 9).map(d => s"WHEN digit = $d THEN ${b(d)}")
        .mkString("CASE ", " ", " END")
      Some(s"""WITH v AS (SELECT CAST(floor(abs(l_extendedprice)) AS BIGINT) AS x
              |  FROM lineitem
              |  WHERE l_extendedprice IS NOT NULL AND floor(abs(l_extendedprice)) >= 1),
              |d AS (SELECT CAST(substr(CAST(x AS VARCHAR), 1, 1) AS INT) AS digit FROM v),
              |c AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
              |t AS (SELECT sum(n)::BIGINT AS tot FROM c)
              |SELECT digit, n, (1000000 * n // tot)::BIGINT AS share_ppm,
              |  ($bCase)::BIGINT AS benford_ppm,
              |  ((1000000 * n // tot) - ($bCase))::BIGINT AS delta_ppm
              |FROM c CROSS JOIN t ORDER BY digit""".stripMargin)
    },
      (s, dir) =>
        graft.operators.Profile.benfordAudit(
          t(s, dir, "lineitem"), "l_extendedprice"))
  ,

    // ---- per-user CUSUM drift statistic (no-reset, upcrossings) --
    // Page's running-max CUSUM as exactly two shared-sort windows
    // (prefix sum − running min); alarms are threshold UPCROSSINGS.
    // Integer-floored values, target 50, threshold 300 — exact
    // BIGINT throughout.
    Q("q252_cusum_drift",
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) * 1000 AS ts,
             |  CAST(floor(value) AS BIGINT) - 50 AS x FROM events),
             |p AS (SELECT user_id, event_id, ts, sum(x) OVER (PARTITION BY user_id
             |  ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
             |  FROM e),
             |m AS (SELECT *, least(min(least(pp, 0)) OVER (PARTITION BY user_id
             |  ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS mm
             |  FROM p),
             |s AS (SELECT user_id, ts, pp - mm AS sv,
             |  lag(pp - mm) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM m),
             |u AS (SELECT user_id, ts, sv,
             |  (sv >= 300 AND coalesce(prev, 0) < 300) AS up FROM s)
             |SELECT user_id, count(*)::BIGINT AS n_points, max(sv)::BIGINT AS max_s,
             |  sum(CASE WHEN up THEN 1 ELSE 0 END)::BIGINT AS n_alarms,
             |  min(CASE WHEN up THEN ts END)::BIGINT AS first_alarm_ts
             |FROM u GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.cusumUpcrossings(
          t(s, dir, "events")
            .withColumn("__v", expr("CAST(floor(value) AS BIGINT)")),
          "user_id", "ts", "event_id", "__v", target = 50L, threshold = 300L)),

    // ---- first/last-touch conversion attribution -----------------
    // Each purchase credited to the first and last click/view since
    // the user's previous purchase; segment = count of PRIOR
    // conversions; touch picks are min/max over (ts, id, type)
    // structs — no first() nondeterminism. Direct conversions (no
    // touch in segment) count under __DIRECT__.
    Q("q253_attribution",
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts FROM events),
             |seg AS (SELECT *, coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |  OVER (PARTITION BY user_id ORDER BY ts, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s FROM e),
             |tc AS (SELECT user_id, s, event_type,
             |  row_number() OVER (PARTITION BY user_id, s ORDER BY ts, event_id) AS rf,
             |  row_number() OVER (PARTITION BY user_id, s ORDER BY ts DESC, event_id DESC) AS rl
             |  FROM seg WHERE event_type IN ('click', 'view')),
             |ft AS (SELECT user_id, s, event_type AS ftype FROM tc WHERE rf = 1),
             |lt AS (SELECT user_id, s, event_type AS ltype FROM tc WHERE rl = 1),
             |conv AS (SELECT user_id, s FROM seg WHERE event_type = 'purchase'),
             |j AS (SELECT coalesce(ft.ftype, '__DIRECT__') AS first_t,
             |             coalesce(lt.ltype, '__DIRECT__') AS last_t
             |      FROM conv LEFT JOIN ft USING (user_id, s) LEFT JOIN lt USING (user_id, s)),
             |f AS (SELECT first_t AS touch_type, count(*)::BIGINT AS n_first FROM j GROUP BY 1),
             |l AS (SELECT last_t AS touch_type, count(*)::BIGINT AS n_last FROM j GROUP BY 1)
             |SELECT coalesce(f.touch_type, l.touch_type) AS touch_type,
             |  coalesce(n_first, 0)::BIGINT AS n_first,
             |  coalesce(n_last, 0)::BIGINT AS n_last
             |FROM f FULL JOIN l ON f.touch_type = l.touch_type
             |ORDER BY touch_type""".stripMargin),
      (s, dir) => {
        val att = graft.operators.Funnel.attribution(
          t(s, dir, "events"), "user_id", "ts", "event_type", "event_id",
          Seq("click", "view"), "purchase")
        val f = att.groupBy(
          coalesce(col("first_touch_type"), lit("__DIRECT__")).as("touch_type"))
          .agg(count(lit(1)).cast("bigint").as("n_first"))
        val l = att.groupBy(
          coalesce(col("last_touch_type"), lit("__DIRECT__")).as("touch_type"))
          .agg(count(lit(1)).cast("bigint").as("n_last"))
        f.join(l, Seq("touch_type"), "full")
          .na.fill(0L, Seq("n_first", "n_last"))
          .orderBy("touch_type")
      }),

    // ---- FORWARD as-of join --------------------------------------
    // q19's mirror: each purchase attached to the EARLIEST click at
    // or after it (pandas merge_asof direction='forward') — the
    // "first response after the alert" lookup. Same union-carry
    // shape with the frame looking ahead; the oracle replays it.
    Q("q264_asof_forward",
      Some("""WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'),
             |r AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events WHERE event_type = 'click'),
             |u AS (
             |  SELECT user_id, us, 1 AS side, 0::BIGINT AS ord, event_id, NULL AS payload
             |  FROM l
             |  UNION ALL
             |  SELECT user_id, us, 2 AS side, event_id AS ord, NULL::BIGINT AS event_id,
             |         {'event_id': event_id, 'value': value} AS payload
             |  FROM r),
             |c AS (SELECT user_id, us, side, event_id,
             |        first_value(payload IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY us, side, ord
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS m
             |      FROM u)
             |SELECT event_id, user_id, m.event_id AS r_event_id, m.value AS r_value
             |FROM c WHERE side = 1 ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("us", expr("ts div 1000"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select("user_id", "event_id", "us")
        val clicks = ev.where(col("event_type") === "click")
          .select("user_id", "event_id", "value", "us")
        graft.operators.AsofJoin.asofJoinForward(
          purchases, clicks, keys = Seq("user_id"),
          leftTime = "us", rightTime = "us",
          rightCols = Seq("event_id", "value"), rightOrd = "event_id")
          .select("event_id", "user_id", "r_event_id", "r_value")
          .orderBy("event_id")
      }),

    // ---- TPC-H Q5 shape: local supplier volume -------------------
    // Revenue where the supplier and customer share a nation, scoped
    // to one region and one year — the canonical 6-way star join.
    // Dims broadcast; the c=s nation equality rides the join.
    Q("q254_local_supplier_volume",
      Some("""SELECT n_name,
             |  (sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))))::DOUBLE AS revenue,
             |  count(*) AS n_items
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1997
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders").where(year(col("o_orderdate")) === 1997),
            col("c_custkey") === col("o_custkey"))
          .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region").where(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,6)")).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("n_name")),

    // ---- TPC-H Q10 shape: returned-item reporting ----------------
    // Top 20 customers by revenue lost to returns in one quarter;
    // revenue decimal-exact before the double render, top-k is
    // TakeOrderedAndProject with the key as tie-break.
    Q("q255_returned_items",
      Some("""SELECT c_custkey, c_name,
             |  (sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))))::DOUBLE AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE l_returnflag = 'R'
             |  AND year(o_orderdate) = 1997 AND month(o_orderdate) IN (7, 8, 9)
             |GROUP BY c_custkey, c_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders").where(
            year(col("o_orderdate")) === 1997 &&
              month(col("o_orderdate")).isin(7, 8, 9)),
            col("c_custkey") === col("o_custkey"))
          .join(t(s, dir, "lineitem").where(col("l_returnflag") === "R"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)),

    // ---- TPC-H Q3 shape: shipping priority -----------------------
    // Unshipped-revenue top 10 for one market segment around a
    // cutoff date; the order date rides out as epoch micros (the
    // timestamp-render convention of the events family).
    Q("q256_shipping_priority",
      Some("""SELECT l_orderkey,
             |  (sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))))::DOUBLE AS revenue,
             |  epoch_us(o_orderdate)::BIGINT AS order_us
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-06-15'
             |  AND l_shipdate > TIMESTAMP '1998-06-15'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
      (s, dir) =>
        t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
          .join(t(s, dir, "orders").where(
            expr("o_orderdate < TIMESTAMP'1998-06-15 00:00:00'")),
            col("c_custkey") === col("o_custkey"))
          .join(t(s, dir, "lineitem").where(
            expr("l_shipdate > TIMESTAMP'1998-06-15 00:00:00'")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("revenue"))
          .select(col("l_orderkey"), col("revenue"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("order_us"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)),

    // ---- pass@k (HumanEval estimator) ----------------------------
    // Unbiased pass@5 per user over a content-hash-thinned attempt
    // sample (value ≥ 70 = pass): 1 − C(n−c,5)/C(n,5) as exact
    // BIGINT product folds; n < k → NULL. The oracle replays the
    // identical folds via list_reduce.
    Q("q258_pass_at_k",
      Some("""WITH s AS (SELECT user_id, (value >= 70.0) AS pass FROM events
             |  WHERE event_id % 97 < 2),
             |g AS (SELECT user_id, count(*)::BIGINT AS n,
             |  sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS c
             |  FROM s GROUP BY user_id)
             |SELECT user_id, n, c,
             |  CASE WHEN n < 5 THEN NULL ELSE
             |    (1000000 - (1000000 * list_reduce(list_prepend(1::BIGINT,
             |      list_transform(range(0, 5), i -> greatest(n - c - i, 0))),
             |      (a, b) -> a * b))
             |    // list_reduce(list_prepend(1::BIGINT,
             |      list_transform(range(0, 5), i -> n - i)), (a, b) -> a * b))
             |  END::BIGINT AS pass_at_k_ppm
             |FROM g ORDER BY user_id""".stripMargin),
      (s, dir) =>
        graft.operators.Scoring.passAtK(
          t(s, dir, "events").where(expr("event_id % 97 < 2"))
            .withColumn("__pass", col("value") >= 70.0),
          "user_id", "__pass", k = 5)),

    // ---- rolling median (robust monitoring) ----------------------
    // Trailing 7-row exact median of floor(value) per user (lower
    // middle on even windows — integer, no float averaging),
    // aggregated per user for a compact witness.
    Q("q259_rolling_median",
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts,
             |  CAST(floor(value) AS BIGINT) AS v FROM events),
             |w AS (SELECT user_id, list_sort(list(v) OVER (PARTITION BY user_id
             |  ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
             |  FROM e),
             |m AS (SELECT user_id, win[((len(win) + 1) // 2)::INT] AS med,
             |  len(win)::BIGINT AS wn FROM w)
             |SELECT user_id, count(*)::BIGINT AS n,
             |  sum(med)::BIGINT AS sum_median, max(med)::BIGINT AS max_median,
             |  sum(wn)::BIGINT AS sum_window_rows
             |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.withRollingMedian(
          t(s, dir, "events")
            .withColumn("__v", expr("CAST(floor(value) AS BIGINT)")),
          "user_id", "ts", "event_id", "__v", nRows = 7)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).cast("bigint").as("n"),
            sum(col("roll_median")).cast("bigint").as("sum_median"),
            max(col("roll_median")).cast("bigint").as("max_median"),
            sum(col("roll_n")).cast("bigint").as("sum_window_rows"))
          .orderBy("user_id")),

    // ---- time-to-convert by first touch (q253 composed) ----------
    // Latency from the segment-opening touch to its conversion, per
    // first-touch type: n, exact lower-middle median, max — the
    // attribution read marketing actually asks for. Direct
    // conversions (no touch) are excluded; deltas in epoch nanos.
    Q("q261_time_to_convert",
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) * 1000 AS ts FROM events),
             |seg AS (SELECT *, coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |  OVER (PARTITION BY user_id ORDER BY ts, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s FROM e),
             |tc AS (SELECT user_id, s, event_type, ts,
             |  row_number() OVER (PARTITION BY user_id, s ORDER BY ts, event_id) AS rf
             |  FROM seg WHERE event_type IN ('click', 'view')),
             |ft AS (SELECT user_id, s, event_type AS ftype, ts AS fts FROM tc WHERE rf = 1),
             |conv AS (SELECT user_id, s, ts AS cts FROM seg WHERE event_type = 'purchase'),
             |j AS (SELECT ft.ftype, conv.cts - ft.fts AS delta
             |      FROM conv JOIN ft USING (user_id, s)),
             |g AS (SELECT ftype, list_sort(list(delta)) AS ds FROM j GROUP BY ftype)
             |SELECT ftype AS first_touch_type, len(ds)::BIGINT AS n,
             |  ds[((len(ds) + 1) // 2)::INT]::BIGINT AS median_delta,
             |  ds[len(ds)::INT]::BIGINT AS max_delta
             |FROM g ORDER BY first_touch_type""".stripMargin),
      (s, dir) => {
        val att = graft.operators.Funnel.attribution(
          t(s, dir, "events"), "user_id", "ts", "event_type", "event_id",
          Seq("click", "view"), "purchase")
        att.where(col("first_touch_type").isNotNull)
          .withColumn("__delta", col("conv_ts") - col("first_touch_ts"))
          .groupBy(col("first_touch_type"))
          .agg(sort_array(collect_list(col("__delta"))).as("__ds"))
          .select(col("first_touch_type"),
            size(col("__ds")).cast("bigint").as("n"),
            expr("element_at(__ds, CAST((size(__ds) + 1) div 2 AS INT))")
              .cast("bigint").as("median_delta"),
            expr("element_at(__ds, size(__ds))").cast("bigint").as("max_delta"))
          .orderBy("first_touch_type")
      })
  )
}
