package graft.queries

import graft.QuerySpec
import graft.QuerySpec._

/** Relational operator battery covering SURVEY.md §2.2–2.8: projections,
  * filters (range/compound/null/like), joins (equi, broadcast-dim,
  * semi/EXISTS, anti/NOT EXISTS, cross-with-aggregate), aggregations
  * (count, sum, distinct, stddev-via-moments, histogram), window last-wins
  * dedup (ref: PaimonStream.java:91 merge-engine semantics), sort/limit
  * top-k, UNION ALL, scalar string/date functions.
  *
  * All SQL here is dialect-shared (runs identically on Spark SQL and DuckDB).
  */
object Relational {

  /** TPC-H Q1-style pricing summary — A1/A2 aggregation shapes
    * (ref: Getting Started.ipynb c9/c25 counts; Berlin Buzzwords c12). */
  // r17 Spark side: the decimal MULTIPLY chains ran on java.math.BigDecimal
  // per row (a (18,2)×(18,2) product carries precision 37 — past Spark's
  // compact-long Decimal, so every row allocated BigDecimals); the money
  // columns are exact 2-decimal values, so Σ p·(1−d) ≡ Σ pc·(100−dc)/10⁴
  // in plain BIGINT cents (pc = p·100 recovered exactly: p is the double
  // nearest k/100 and NON-NEGATIVE — TPC-H money columns — so p·100 is
  // within ~k·2⁻⁵² of the integer k and the +0.5-truncate rounds to
  // exactly k; a negative amount would mis-truncate by one cent, which
  // is why the +0.5 idiom is confined to these columns). Products stay
  // ≤ ~10¹¹/row. ONE exact decimal division per GROUP rescales, and
  // CAST(exact rational AS DOUBLE) is the identical correctly-rounded
  // value the oracle's decimal-sum-then-cast produces. Single-column
  // decimal sums (no multiply) stay compact-long and are unchanged.
  //
  // r18 (advice): the SUM itself runs in DECIMAL(38,0), not BIGINT — a
  // BIGINT sum of ~1.2e11/row products wraps (non-ANSI) or throws (ANSI)
  // once a group exceeds ~8e7 rows, i.e. around SF 50-100. The per-row
  // cast is Decimal.fromLong (compact; each add of two < 10¹⁸ compacts
  // can't overflow a long, and Spark promotes the buffer to BigDecimal
  // only past 18 digits), so the r17 no-per-row-BigDecimal property
  // holds until a PARTIAL sum passes 10¹⁸ — ~10⁷ rows per task, far
  // above any real task size. Headroom is now 10³⁸.
  val q01 = dialect("q01_pricing_summary",
    sparkSql = """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(pc * (100 - dc) AS DECIMAL(38,0))) AS DECIMAL(38,4)) / 10000 AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(pc * (100 - dc) * (100 + tc) AS DECIMAL(38,0))) AS DECIMAL(38,6)) / 1000000 AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM (
      |  SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice,
      |    CAST(l_extendedprice * 100 + 0.5 AS BIGINT) AS pc,
      |    CAST(l_discount * 100 + 0.5 AS BIGINT) AS dc,
      |    CAST(l_tax * 100 + 0.5 AS BIGINT) AS tc
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00') t
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    duckSql = """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin)

  /** Range + compound filter → grouped agg — P3/P4 filter shapes. */
  val q02 = both("q02_filter_range",
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |WHERE l_quantity BETWEEN 10 AND 20
      |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND (l_discount > 0.02 OR l_tax > 0.05)
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin)

  /** 3-way equi-join fact×fact×dim with revenue agg — J-shapes + A2.
    * Spark side (r17): integer-cents revenue — see q01's comment (incl.
    * the r18 DECIMAL(38,0) sum: one revenue group over ~6e8 rows would
    * overflow a BIGINT sum); the plan (two broadcast joins, one lineitem
    * scan) was already optimal, the per-row BigDecimal multiply was the
    * remaining cost. */
  val q03 = dialect("q03_revenue_by_segment",
    sparkSql = """SELECT c_mktsegment,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice * 100 + 0.5 AS BIGINT)
      |        * (100 - CAST(l_discount * 100 + 0.5 AS BIGINT)) AS DECIMAL(38,0))) AS DECIMAL(38,4))
      |       / 10000 AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin,
    duckSql = """SELECT c_mktsegment,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin)

  /** Star join through two broadcastable dims (region→nation→customer→orders). */
  val q04 = both("q04_region_revenue",
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(*) AS n_orders
      |FROM region
      |JOIN nation ON r_regionkey = n_regionkey
      |JOIN customer ON n_nationkey = c_nationkey
      |JOIN orders ON c_custkey = o_custkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin)

  /** Top-k by aggregate — O1+O2 sort-then-limit (TakeOrderedAndProject). */
  val q05 = both("q05_top_customers",
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
      |  COUNT(*) AS n_orders
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY spend DESC, c_custkey
      |LIMIT 10""".stripMargin)

  /** DISTINCT set semantics — A4 (ref: Integrated Audits c32 audit compare). */
  val q06 = both("q06_distinct",
    """SELECT DISTINCT o_orderstatus, o_orderpriority
      |FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)

  /** UNION ALL of two filtered slices — U1 (ref: Table Maintenance c5). */
  val q07 = both("q07_union_slices",
    """SELECT event_type, COUNT(*) AS n
      |FROM (
      |  SELECT event_type FROM events WHERE value < 50
      |  UNION ALL
      |  SELECT event_type FROM events WHERE value >= 400
      |) u
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin)

  /** Last-wins dedup per key via row_number window — J3/A7
    * (ref: PaimonStream.java:91 'merge-engine'='deduplicate'). */
  val q08 = both("q08_lastwins_dedup",
    """SELECT user_id, event_id, event_type, value
      |FROM (
      |  SELECT user_id, event_id, event_type, value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |) t
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin)

  /** Z-score outlier filter via 1-row aggregate cross join — A3/A5/J1/P10
    * (ref: PyIceberg….ipynb c18/c25). stddev computed from exact decimal
    * moments so both engines derive the identical double threshold. */
  val q09 = both("q09_zscore_outliers",
    """WITH s AS (
      |  SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS svv,
      |         COUNT(*) AS n
      |  FROM events
      |)
      |SELECT e.event_type, COUNT(*) AS n_outliers
      |FROM events e, s
      |WHERE ABS(e.value - s.sv / s.n) > 2.0 * SQRT(s.svv / s.n - (s.sv / s.n) * (s.sv / s.n))
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin)

  /** Histogram binning — A6 (ref: PyIceberg….ipynb c17/c19 hist). */
  val q10 = both("q10_histogram",
    """SELECT CAST(FLOOR(value / 50.0) AS BIGINT) AS bin, COUNT(*) AS n
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin)

  /** Scalar string functions — F1/F2 battery + LIKE filter (P6). */
  val q11 = both("q11_string_funcs",
    """SELECT doc_id, UPPER(lang) AS lang_u,
      |  CAST(LENGTH(text) AS BIGINT) AS len,
      |  SUBSTR(text, 1, 10) AS head10,
      |  n_chars % 7 AS m7
      |FROM documents
      |WHERE doc_id < 100 AND text LIKE '%spark%'
      |ORDER BY doc_id""".stripMargin)

  /** EXISTS → left-semi join (planned as SortMergeJoin LeftSemi / BHJ). */
  val q12 = both("q12_exists_semi",
    """SELECT o_orderpriority, COUNT(*) AS n
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49
      |)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin)

  /** NOT EXISTS → left-anti join — J2 shape (equality-delete semantics,
    * ref: IcebergStream.java:118). */
  val q13 = both("q13_notexists_anti",
    """SELECT c_mktsegment, COUNT(*) AS n
      |FROM customer c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
      |)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin)

  /** Time bucketing (date_trunc / extract) — F7/F9 partition-transform math. */
  val q14 = both("q14_monthly_orders",
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY 1
      |ORDER BY 1""".stripMargin)

  /** NULL-generating division + null test — P5/F10 (ref: Getting
    * Started.ipynb c18 fare_per_distance_unit, c23 null filter).
    * NULLIF guards 0-discount; counts null vs non-null per flag. */
  val q15 = both("q15_null_division",
    """SELECT l_returnflag,
      |  COUNT(*) AS n,
      |  COUNT(l_extendedprice / NULLIF(l_discount, 0.0)) AS n_nonnull,
      |  CAST(SUM(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_disc
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin)

  /** Changelog-merge materialization as a batch query (J2-J4/S12
    * semantics over `events`): last event per user wins, users whose final
    * event is a 'logout' are deleted — the same last-wins + delete-kind
    * collapse the streaming foreachBatch merge applies
    * (ref: PaimonStream.java:91 dedup merge-engine, IcebergStream.java:118
    * equality delete). */
  val q28 = both("q28_changelog_merge",
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 AND event_type <> 'logout'
      |ORDER BY user_id""".stripMargin)

  /** As-of join: each purchase matched to the user's most recent prior
    * signup (union + carry-forward window — one shuffle; DuckDB's native
    * ASOF JOIN is the oracle). Inner semantics via the null filter. */
  val q29 = plan("q29_asof_join",
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      graft.Tables.registerAll(s, dir)
      // DuckDB reads the TIMESTAMP(NANOS) parquet at µs precision; truncate
      // our epoch-ns BIGINT the same way so join + output agree exactly
      val ev = s.table("events")
        .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val snup = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"))
      graft.operators.AsofJoin.asofJoin(p, snup, "user_id", "ts", asofCol = "l_ts")
        .filter(col("l_ts").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts").as("p_ts"), col("l_ts"))
        .orderBy("user_id", "event_id")
    },
    duckSql = """WITH p AS (SELECT user_id, event_id, epoch_ns(ts) AS ts FROM events WHERE event_type = 'purchase'),
      |l AS (SELECT user_id, epoch_ns(ts) AS ts FROM events WHERE event_type = 'signup')
      |SELECT p.user_id, p.event_id, p.ts AS p_ts, l.ts AS l_ts
      |FROM p ASOF JOIN l ON p.user_id = l.user_id AND p.ts >= l.ts
      |ORDER BY p.user_id, p.event_id""".stripMargin)

  /** ROLLUP aggregation (grand + per-status subtotals) — the grouping-sets
    * shape SURVEY §2.4 flags as a cheap extension. */
  val q30 = both("q30_rollup",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)

  /** CUBE grouping sets + COUNT(DISTINCT) — completes the grouping-sets
    * family next to q30's ROLLUP (SURVEY §2.4 extension). */
  val q34 = both("q34_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  COUNT(DISTINCT o_custkey) AS n_cust
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)

  /** Gap-based sessionization of the event stream (30-min inactivity
    * boundary) via LAG + running SUM windows — the batch twin of the
    * clickstream session analysis the reference's datagen feeds
    * (datagen.py:28-60). `ts` is epoch-nanos BIGINT on the Spark side
    * (nanosAsLong read) and epoch_ns() on the DuckDB side, so the gap
    * compare is exact integer math in both engines. */
  val q35 = dialect("q35_sessionization",
    sparkSql = """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |s AS (
      |  SELECT user_id,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      |  FROM x)
      |SELECT user_id, CAST(MAX(sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,
    duckSql = """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_id FROM events),
      |x AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM e),
      |s AS (
      |  SELECT user_id,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      |  FROM x)
      |SELECT user_id, CAST(MAX(sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin)

  /** INTERSECT / EXCEPT set semantics (beyond the reference's UNION-only
    * surface): nations present in both the customer and supplier bases,
    * and customer-only nations. Spark plans both as semi/anti aggregates
    * (hash-distinct + join) — no sort-based set diff. */
  val q45 = both("q45_setops",
    """SELECT 'both' AS which, n_name FROM (
      |  SELECT n.n_name FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  INTERSECT
      |  SELECT n.n_name FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey) t
      |UNION ALL
      |SELECT 'customers_only' AS which, n_name FROM (
      |  SELECT n.n_name FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  EXCEPT
      |  SELECT n.n_name FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey) t
      |ORDER BY which, n_name""".stripMargin)

  /** PIVOT: per-user-bucket event-type counts as columns. Spark's native
    * PIVOT clause (one hash aggregate, no per-column scans); the oracle
    * spells it as conditional aggregation. Absent cells coalesce to 0 so
    * both engines agree. */
  val q46 = dialect("q46_pivot",
    sparkSql = """SELECT bucket,
      |  COALESCE(click, 0) AS click, COALESCE(error, 0) AS error,
      |  COALESCE(purchase, 0) AS purchase, COALESCE(signup, 0) AS signup,
      |  COALESCE(view, 0) AS view
      |FROM (SELECT user_id % 10 AS bucket, event_type FROM events)
      |PIVOT (COUNT(1) FOR event_type IN
      |  ('click' AS click, 'error' AS error, 'purchase' AS purchase,
      |   'signup' AS signup, 'view' AS view))
      |ORDER BY bucket""".stripMargin,
    duckSql = """SELECT user_id % 10 AS bucket,
      |  CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
      |  CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
      |  CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
      |  CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
      |  CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
      |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin)

  /** Trailing 7-day moving average of event value over the daily series —
    * the RANGE-frame window shape (frame bounds in VALUE units, not row
    * counts, so gap days genuinely age out of the frame). Daily revenue
    * aggregates exactly in DECIMAL(18,2) (the testdata's value doubles
    * are 2-decimal), the frame sums decimals (order-independent), and the
    * average divides as double once at the end — bit-identical vs DuckDB.
    *
    * Scale shape: events collapse to per-DAY rows in a map-side-combined
    * aggregate before any window; the single-partition RANGE window then
    * runs over rows-per-day (bounded by the calendar, not the data). Day
    * bucketing runs on epoch-µs in BOTH engines (ts DIV 1000 Spark-side)
    * so a row within 1 µs of midnight cannot bucket differently. */
  val q55 = dialect("q55_moving_avg",
    sparkSql = """WITH daily AS (
      |  SELECT (ts DIV 1000) DIV 86400000000 AS day,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS rev, COUNT(*) AS n_ev
      |  FROM events GROUP BY 1)
      |SELECT day, CAST(rev AS DOUBLE) AS rev, n_ev,
      |  CAST(SUM(rev) OVER (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / CAST(SUM(n_ev) OVER (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS avg_value_7d
      |FROM daily ORDER BY day""".stripMargin,
    duckSql = """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS rev, COUNT(*) AS n_ev
      |  FROM events GROUP BY 1)
      |SELECT day, CAST(rev AS DOUBLE) AS rev, n_ev,
      |  CAST(SUM(rev) OVER (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / CAST(SUM(n_ev) OVER (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS avg_value_7d
      |FROM daily ORDER BY day""".stripMargin)

  /** Time-series gap filling + carry-forward (the reporting-table shape):
    * the high-value purchase series has days with NO events — a date
    * spine (sequence over the observed [min, max] day range) left-joins
    * the daily aggregate, missing days fill revenue 0, and the
    * carried-forward "last known" value comes from an IGNORE-NULLS
    * last_value window. Exact day arithmetic (epoch-µs integer division)
    * and DECIMAL daily sums keep both engines bit-identical; the spine is
    * generated, never scanned. Scale shape: one day-keyed aggregate, a
    * tiny generated spine (days, not events) on the broadcast side, one
    * ordered window over rows-per-DAY — the raw event stream is touched
    * exactly once. */
  val q72 = dialect("q72_gap_fill",
    sparkSql = """WITH d AS (
      |  SELECT (ts DIV 1000) DIV 86400000000 AS day,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS rev
      |  FROM events WHERE event_type = 'purchase' AND value >= 190
      |  GROUP BY 1),
      |spine AS (
      |  SELECT explode(sequence(mn, mx)) AS day
      |  FROM (SELECT MIN(day) AS mn, MAX(day) AS mx FROM d)),
      |f AS (
      |  SELECT spine.day, d.rev,
      |    last_value(d.rev, true) OVER (ORDER BY spine.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
      |  FROM spine LEFT JOIN d ON spine.day = d.day)
      |SELECT day, CAST(coalesce(rev, 0) AS DOUBLE) AS rev,
      |  CAST(carried AS DOUBLE) AS carried,
      |  CAST(CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
      |FROM f ORDER BY day""".stripMargin,
    duckSql = """WITH d AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS rev
      |  FROM events WHERE event_type = 'purchase' AND value >= 190
      |  GROUP BY 1),
      |spine AS (
      |  SELECT unnest(generate_series(mn, mx)) AS day
      |  FROM (SELECT MIN(day) AS mn, MAX(day) AS mx FROM d)),
      |f AS (
      |  SELECT spine.day, d.rev,
      |    last_value(d.rev IGNORE NULLS) OVER (ORDER BY spine.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
      |  FROM spine LEFT JOIN d ON spine.day = d.day)
      |SELECT day, CAST(coalesce(rev, 0) AS DOUBLE) AS rev,
      |  CAST(carried AS DOUBLE) AS carried,
      |  CAST(CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
      |FROM f ORDER BY day""".stripMargin)

  /** Strict sequential funnel (r9): signup → first view AFTER the signup →
    * first purchase AFTER that achieved view. Deliberately the
    * JOIN-CASCADE funnel, not q49's single-pass conditional aggregation:
    * q49 compares GLOBAL first-times (first click > first view), which
    * cannot express "first purchase after the first view that itself
    * followed signup" — each stage here anchors to the previous stage's
    * ACHIEVED time, so an early pre-signup view doesn't satisfy stage 2.
    * Scale shape: each stage is one map-side-combined MIN keyed by
    * user_id plus one equi-join to the prior stage's survivors — all
    * shuffles share the user_id hash partitioning and only one
    * (user, ts) row per survivor crosses stages, never raw events. Exact
    * integer µs arithmetic keeps both engines bit-identical. */
  val q80 = dialect("q80_funnel",
    sparkSql = """WITH s AS (
      |  SELECT user_id, MIN(ts DIV 1000) AS t0
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |v AS (
      |  SELECT e.user_id, MIN(e.ts DIV 1000) AS t1
      |  FROM events e JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'view' AND (e.ts DIV 1000) > s.t0
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts DIV 1000) AS t2
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'purchase' AND (e.ts DIV 1000) > v.t1
      |  GROUP BY e.user_id)
      |SELECT CAST(ord AS BIGINT) AS ord, stage, users FROM (
      |  SELECT 1 AS ord, 'signup' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM s
      |  UNION ALL
      |  SELECT 2, 'view_after_signup', CAST(COUNT(*) AS BIGINT) FROM v
      |  UNION ALL
      |  SELECT 3, 'purchase_after_view', CAST(COUNT(*) AS BIGINT) FROM p) f
      |ORDER BY ord""".stripMargin,
    duckSql = """WITH s AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS t0
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |v AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t1
      |  FROM events e JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'view' AND epoch_us(e.ts) > s.t0
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.t1
      |  GROUP BY e.user_id)
      |SELECT CAST(ord AS BIGINT) AS ord, stage, users FROM (
      |  SELECT 1 AS ord, 'signup' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM s
      |  UNION ALL
      |  SELECT 2, 'view_after_signup', CAST(COUNT(*) AS BIGINT) FROM v
      |  UNION ALL
      |  SELECT 3, 'purchase_after_view', CAST(COUNT(*) AS BIGINT) FROM p) f
      |ORDER BY ord""".stripMargin)

  /** Cohort retention (r9): users grouped by signup week, distinct-active
    * counts at week offsets 0–3. Week ids are exact integer µs division
    * (epoch-week from a fixed origin) — never float FLOOR, which loses
    * exactness above 2^53. Scale shape: the DISTINCT (user, week)
    * activity grid collapses the event stream before the cohort join, so
    * the join input is users × active-weeks, not raw events; both
    * aggregations are user-keyed and map-side combined. */
  val q81 = dialect("q81_cohort",
    sparkSql = """WITH su AS (
      |  SELECT user_id, MIN((ts DIV 1000) DIV 604800000000) AS cohort_w
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |act AS (
      |  SELECT DISTINCT user_id, (ts DIV 1000) DIV 604800000000 AS w FROM events)
      |SELECT su.cohort_w, act.w - su.cohort_w AS week_offset,
      |  CAST(COUNT(*) AS BIGINT) AS active_users
      |FROM su JOIN act ON su.user_id = act.user_id
      |WHERE act.w >= su.cohort_w AND act.w - su.cohort_w <= 3
      |GROUP BY 1, 2
      |ORDER BY cohort_w, week_offset""".stripMargin,
    duckSql = """WITH su AS (
      |  SELECT user_id, MIN(epoch_us(ts) // 604800000000) AS cohort_w
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |act AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS w FROM events)
      |SELECT su.cohort_w, act.w - su.cohort_w AS week_offset,
      |  CAST(COUNT(*) AS BIGINT) AS active_users
      |FROM su JOIN act ON su.user_id = act.user_id
      |WHERE act.w >= su.cohort_w AND act.w - su.cohort_w <= 3
      |GROUP BY 1, 2
      |ORDER BY cohort_w, week_offset""".stripMargin)

  val flagship: QuerySpec = q04

  /** SCD TYPE-2 history build from an event stream (r16) — the Delta Live
    * Tables `APPLY CHANGES … STORED AS SCD TYPE 2` / classic Kimball
    * shape: per entity (`user_id`), collapse consecutive events with the
    * SAME tracked state (`event_type`) into one VERSION row carrying
    * `valid_from` / `valid_to` (NULL = current), the run's event count
    * and an `is_current` flag. Gaps-and-islands via LAG(state) ≠ state
    * marking run STARTS, then LEAD over the starts for the validity
    * horizon — no self-join, no group-by re-shuffle: every window shares
    * (PARTITION BY user_id ORDER BY ts, event_id), so the whole history
    * builds in ONE exchange + ONE sort (PlanSpec-gated), which is the
    * 100 TB shape — cost is the one entity-keyed shuffle a CDC table
    * already pays. `ts` is epoch-ns BIGINT both sides (q35's contract).
    * Reference shape: IcebergStream.java's upsert keeps LAST state only;
    * this keeps the full auditable history. */
  val q104 = dialect("q104_scd2_history",
    sparkSql = """WITH x AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) <> event_type
      |         THEN 1 ELSE 0 END AS chg,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS cnt
      |  FROM events),
      |s AS (SELECT * FROM x WHERE chg = 1)
      |SELECT user_id, event_type AS state, ts AS valid_from,
      |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  CAST(COALESCE(LEAD(rn) OVER (PARTITION BY user_id ORDER BY ts, event_id), cnt + 1) - rn AS BIGINT) AS n_events,
      |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      |FROM s ORDER BY user_id, valid_from""".stripMargin,
    duckSql = """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type FROM events),
      |x AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) <> event_type
      |         THEN 1 ELSE 0 END AS chg,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS cnt
      |  FROM e),
      |s AS (SELECT * FROM x WHERE chg = 1)
      |SELECT user_id, event_type AS state, ts AS valid_from,
      |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  CAST(COALESCE(LEAD(rn) OVER (PARTITION BY user_id ORDER BY ts, event_id), cnt + 1) - rn AS BIGINT) AS n_events,
      |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      |FROM s ORDER BY user_id, valid_from""".stripMargin)

  def specs: Seq[QuerySpec] = Seq(q01, q02, q03, q04, q05, q06, q07, q08,
    q09, q10, q11, q12, q13, q14, q15, q28, q29, q30, q34, q35, q45, q46,
    q55, q72, q80, q81, q104)
}
