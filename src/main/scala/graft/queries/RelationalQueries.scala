package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator inventory over the TPC-H-ish corpus, mapping the
  * reference's operator surface (SURVEY.md §2) onto driver testdata:
  *
  *  - q01/q02/q03: scans + filter/projection pushdown (§2.1 S2/S6, §2.3)
  *  - q04: scalar expression surface (§2.4 F3-F8, F11-F12)
  *  - q10: daily sales aggregate — A1/A2 of
  *    `/root/reference/pipeline/ml/anomaly_detection.py:25-33`
  *  - q11: fct_purchases-shaped projection — F5-F7 arithmetic of
  *    `/root/reference/pipeline/dbt/.../gold/fct_purchases.sql:30-47`
  *  - q12: incremental high-watermark scalar subquery — W1 of
  *    `fct_purchases.sql:24-27`
  *  - q13: robust z-score anomaly flags — M1/M2 contract of
  *    `anomaly_detection.py:46-52` (deterministic median/MAD stand-in)
  *  - q20-q24: the join family the reference needs implicitly (§2.7)
  *  - q30-q32: window functions (§2.8 dedup-by-latest / running state)
  *  - q40-q42: sort/limit/set-ops/distinct (§2.8)
  *
  * Scale notes (100 TB posture): every aggregate is a hash aggregate
  * with map-side partial combine; dimension joins broadcast the small
  * side explicitly; fact-fact work shuffles only on join/group keys;
  * filters and projections are plain Catalyst expressions so they push
  * into the parquet scan (verified via .explain in BenchSpec).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[QueryDef] = Seq(

    // ── scans / filters / projections ────────────────────────────────
    QueryDef(
      "q01_pricing_summary",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      headline = true),

    QueryDef(
      "q02_revenue_filter",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
            && col("l_discount") >= 0.03 && col("l_discount") <= 0.07
            && col("l_quantity") < 24)
          .agg(
            round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
            count(lit(1)).as("n_rows")),
      Some("""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24""")),

    QueryDef(
      "q03_scan_project",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            // raw double (no ROUND): a*(1-b) in IEEE binary64 is
            // bit-identical across engines, while ROUND ties are not.
            // (l_orderkey, l_linenumber) is NOT unique in the corpus →
            // net_price joins the sort key for a total order.
            (col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("net_price"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("net_price")),
      Some("""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net_price
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        ORDER BY l_orderkey, l_linenumber, net_price""")),

    QueryDef(
      "q04_scalar_functions",
      (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            substring(col("p_type"), 1, 6).as("type_pfx"),
            length(col("p_name")).as("name_len"),
            concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
            when(col("p_size") > 25, lit("large")).otherwise(lit("small"))
              .as("size_class"),
            round(col("p_retailprice") * 1.1, 2).as("marked_up"),
            coalesce(nullif(col("p_brand"), lit("Brand#1")), lit("OTHER"))
              .as("brand_or_other"))
          .orderBy(col("p_partkey")),
      Some("""
        SELECT p_partkey,
               UPPER(p_brand) AS brand_u,
               SUBSTRING(p_type, 1, 6) AS type_pfx,
               LENGTH(p_name) AS name_len,
               p_brand || '#' || p_type AS brand_type,
               CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class,
               ROUND(p_retailprice * 1.1, 2) AS marked_up,
               COALESCE(NULLIF(p_brand, 'Brand#1'), 'OTHER') AS brand_or_other
        FROM part
        ORDER BY p_partkey""")),

    // ── reference-parity pipeline semantics on testdata ─────────────
    QueryDef(
      "q10_daily_sales",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("purchase_date"))
          .agg(
            round(sum(col("o_totalprice")), 2).as("daily_total_sales"),
            count(col("o_orderkey")).as("daily_transaction_count"))
          .orderBy(col("purchase_date")),
      Some("""
        SELECT CAST(o_orderdate AS DATE) AS purchase_date,
               ROUND(SUM(o_totalprice), 2) AS daily_total_sales,
               COUNT(o_orderkey) AS daily_transaction_count
        FROM orders
        GROUP BY CAST(o_orderdate AS DATE)
        ORDER BY purchase_date"""),
      headline = true),

    QueryDef(
      "q11_fct_projection",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(
            (col("l_orderkey") * 10 + col("l_linenumber")).cast("string")
              .as("transaction_id"),
            col("l_partkey").as("product_id"),
            to_date(col("l_shipdate")).as("purchase_date"),
            // raw double; transaction_id collides in this corpus
            // ((orderkey, linenumber) dupes) → total-order sort over
            // every output column keeps both engines row-aligned.
            (col("l_extendedprice") * (lit(1) - col("l_discount"))
              + col("l_tax")).as("final_amount"),
            (col("l_returnflag") === "R").as("is_member"))
          .orderBy(col("transaction_id"), col("product_id"),
            col("purchase_date"), col("final_amount"), col("is_member")),
      Some("""
        SELECT CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) AS transaction_id,
               l_partkey AS product_id,
               CAST(l_shipdate AS DATE) AS purchase_date,
               l_extendedprice * (1 - l_discount) + l_tax AS final_amount,
               l_returnflag = 'R' AS is_member
        FROM lineitem
        ORDER BY transaction_id, product_id, purchase_date, final_amount, is_member""")),

    QueryDef(
      "q12_incremental_watermark",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT event_id, user_id, event_type, value
          FROM events
          WHERE ts > (SELECT MAX(ts) FROM events WHERE event_type = 'signup')
          ORDER BY event_id""")
      },
      Some("""
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE ts > (SELECT MAX(ts) FROM events WHERE event_type = 'signup')
        ORDER BY event_id""")),

    QueryDef(
      "q13_anomaly_robust_z",
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("purchase_date"))
          .agg(
            round(sum(col("o_totalprice")), 2).as("daily_total_sales"),
            count(lit(1)).as("daily_transaction_count"))
        val med = daily.agg(
          expr("percentile(daily_total_sales, 0.5)").as("med"))
        val withMed = daily.crossJoin(med)
        val mad = withMed.agg(
          expr("percentile(abs(daily_total_sales - med), 0.5)").as("mad_v"))
        withMed.crossJoin(mad)
          .withColumn("anomaly_score",
            // + 0.0 normalizes IEEE signed zero after the round (repo
            // convention for SIGNED rounded outputs; see Similarity.simR)
            round(lit(0.6745) * (col("daily_total_sales") - col("med"))
              / nullif(col("mad_v"), lit(0.0)), 4) + lit(0.0))
          .withColumn("is_anomaly", abs(col("anomaly_score")) > 3.5)
          .select("purchase_date", "daily_total_sales",
            "daily_transaction_count", "anomaly_score", "is_anomaly")
          .orderBy(col("purchase_date"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS purchase_date,
                 ROUND(SUM(o_totalprice), 2) AS daily_total_sales,
                 COUNT(*) AS daily_transaction_count
          FROM orders GROUP BY 1),
        s AS (SELECT quantile_cont(daily_total_sales, 0.5) AS med FROM daily),
        m AS (SELECT quantile_cont(ABS(d.daily_total_sales - s.med), 0.5) AS mad_v
              FROM daily d, s)
        SELECT d.purchase_date, d.daily_total_sales, d.daily_transaction_count,
               ROUND(0.6745 * (d.daily_total_sales - s.med) / NULLIF(m.mad_v, 0), 4)
                 + 0.0 AS anomaly_score,
               ABS(ROUND(0.6745 * (d.daily_total_sales - s.med) / NULLIF(m.mad_v, 0), 4))
                 > 3.5 AS is_anomaly
        FROM daily d, s, m
        ORDER BY d.purchase_date""")),

    QueryDef(
      "q77_anomaly_iforest",
      (s, dir) => {
        // the genuine IsolationForest twin of the reference's
        // anomaly_detection.py:47 (n_estimators=100, seed 42): a
        // trained ensemble is not ANSI-SQL-expressible, so like the
        // multimodal stubs this is a rows-only driver check — the
        // determinism, outlier-ranking, and flag-agreement contracts
        // are pinned by IsolationForestSpec instead. q13 keeps the
        // SQL-oracled robust-z scorer on the same feature prep.
        val daily = t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("purchase_date"))
          .agg(
            round(sum(col("o_totalprice")), 2).as("daily_total_sales"),
            count(lit(1)).as("daily_transaction_count"))
        graft.analytics.Anomaly.IsolationForestScorer()
          .score(daily)
          .withColumn("anomaly_score", round(col("anomaly_score"), 6))
          .orderBy(col("purchase_date"))
      },
      None),

    QueryDef(
      "q88_anomaly_scorer_agreement",
      (s, dir) => {
        // differential check of the two M2 scorers on the same daily
        // features: the robust-z side replays exactly in SQL
        // (n_days, n_z_flagged, top_z_day), and the forest side is
        // pinned through agreement facts that hold deterministically on
        // this corpus family (seeded fit): every z-flagged day is
        // forest-flagged (n_flagged_by_both = n_z_flagged) and the
        // z-top day is forest-flagged. A forest regression (seed
        // handling, subsampling, tree build, scoring) breaks a pinned
        // column and hash-fails the row — upgrading q77's family from
        // rows-only to a value-checked driver gate while the trained
        // ensemble itself stays engine-side. z_score is rounded to 6
        // before the argmin so the oracle's quantile_cont replay can't
        // flip the top day on float noise; ties break on earliest date.
        val daily = t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("purchase_date"))
          .agg(
            round(sum(col("o_totalprice")), 2).as("daily_total_sales"),
            count(lit(1)).as("daily_transaction_count"))
        val z = graft.analytics.Anomaly.RobustZScorer().score(daily)
          .select(col("purchase_date"),
            (round(col("anomaly_score"), 6) + lit(0.0)).as("z_score"),
            col("is_anomaly").as("z_flag"))
        val f = graft.analytics.Anomaly.IsolationForestScorer().score(daily)
          .select(col("purchase_date"), col("is_anomaly").as("forest_flag"))
        z.join(f, Seq("purchase_date"))
          .agg(
            count(lit(1)).as("n_days"),
            sum(when(col("z_flag"), 1L).otherwise(0L)).as("n_z_flagged"),
            sum(when(col("z_flag") && col("forest_flag"), 1L).otherwise(0L))
              .as("n_flagged_by_both"),
            expr("min_by(purchase_date, struct(z_score, purchase_date))")
              .as("top_z_day"),
            expr("min_by(forest_flag, struct(z_score, purchase_date))")
              .as("top_z_forest_flagged"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS purchase_date,
                 ROUND(SUM(o_totalprice), 2) AS daily_total_sales,
                 COUNT(*) AS daily_transaction_count
          FROM orders GROUP BY 1),
        feats AS (
          SELECT purchase_date,
                 LN(1 + daily_total_sales) AS f1,
                 LN(1 + daily_transaction_count) AS f2
          FROM daily),
        med AS (
          SELECT quantile_cont(f1, 0.5) AS med1,
                 quantile_cont(f2, 0.5) AS med2
          FROM feats),
        mad AS (
          SELECT quantile_cont(ABS(f.f1 - med1), 0.5) AS mad1,
                 quantile_cont(ABS(f.f2 - med2), 0.5) AS mad2,
                 AVG(ABS(f.f1 - med1)) AS meanad1,
                 AVG(ABS(f.f2 - med2)) AS meanad2
          FROM feats f, med),
        z AS (
          SELECT purchase_date,
                 ROUND(-GREATEST(
                   COALESCE(ABS(CASE WHEN mad1 <> 0
                     THEN 0.6745 * (f1 - med1) / mad1
                     ELSE (f1 - med1) / NULLIF(1.253314 * meanad1, 0) END), 0),
                   COALESCE(ABS(CASE WHEN mad2 <> 0
                     THEN 0.6745 * (f2 - med2) / mad2
                     ELSE (f2 - med2) / NULLIF(1.253314 * meanad2, 0) END), 0)), 6)
                   + 0.0 AS z_score,
                 GREATEST(
                   COALESCE(ABS(CASE WHEN mad1 <> 0
                     THEN 0.6745 * (f1 - med1) / mad1
                     ELSE (f1 - med1) / NULLIF(1.253314 * meanad1, 0) END), 0),
                   COALESCE(ABS(CASE WHEN mad2 <> 0
                     THEN 0.6745 * (f2 - med2) / mad2
                     ELSE (f2 - med2) / NULLIF(1.253314 * meanad2, 0) END), 0))
                   > 3.5 AS z_flag
          FROM feats, med, mad)
        SELECT COUNT(*) AS n_days,
               CAST(SUM(CASE WHEN z_flag THEN 1 ELSE 0 END) AS BIGINT) AS n_z_flagged,
               CAST(SUM(CASE WHEN z_flag THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged_by_both,
               (SELECT purchase_date FROM z
                ORDER BY z_score, purchase_date LIMIT 1) AS top_z_day,
               TRUE AS top_z_forest_flagged
        FROM z""")),

    // ── joins ───────────────────────────────────────────────────────
    QueryDef(
      "q20_join_broadcast",
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("p_brand")),
      Some("""
        SELECT p_brand,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand"""),
      headline = true),

    QueryDef(
      "q21_join_multi",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val customer = t(s, dir, "customer")
        val nation = broadcast(t(s, dir, "nation"))
        val region = broadcast(t(s, dir, "region"))
        orders
          .join(customer, col("o_custkey") === col("c_custkey"))
          .join(nation, col("c_nationkey") === col("n_nationkey"))
          .join(region, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            round(sum(col("o_totalprice")), 2).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("r_name"))
      },
      Some("""
        SELECT r_name,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name"""),
      headline = true),

    QueryDef(
      "q22_semi_join",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey")),
      Some("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        ORDER BY c_custkey""")),

    QueryDef(
      "q23_anti_join",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey")),
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    QueryDef(
      "q24_outer_join_agg",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"),
            col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            coalesce(round(sum(col("o_totalprice")), 2), lit(0.0))
              .as("total_spent"))
          .orderBy(col("c_custkey")),
      Some("""
        SELECT c_custkey,
               COUNT(o_orderkey) AS n_orders,
               COALESCE(ROUND(SUM(o_totalprice), 2), 0.0) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey""")),

    QueryDef(
      "q27_full_outer",
      (s, dir) => {
        // symmetric difference view over two filtered order sets
        val recent = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select(col("o_custkey").as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("n_recent"))
        val big = t(s, dir, "orders")
          .filter(col("o_totalprice") > 100000)
          .select(col("o_custkey").as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("n_big"))
        recent.join(big, Seq("k"), "full_outer")
          .select(col("k"),
            coalesce(col("n_recent"), lit(0L)).as("n_recent"),
            coalesce(col("n_big"), lit(0L)).as("n_big"))
          .orderBy(col("k"))
      },
      Some("""
        WITH recent AS (
          SELECT o_custkey AS k, COUNT(*) AS n_recent
          FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY o_custkey),
        big AS (
          SELECT o_custkey AS k, COUNT(*) AS n_big
          FROM orders WHERE o_totalprice > 100000
          GROUP BY o_custkey)
        SELECT COALESCE(recent.k, big.k) AS k,
               COALESCE(n_recent, 0) AS n_recent,
               COALESCE(n_big, 0) AS n_big
        FROM recent FULL OUTER JOIN big ON recent.k = big.k
        ORDER BY k""")),

    // ── window functions ────────────────────────────────────────────
    QueryDef(
      "q30_topn_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        t(s, dir, "part")
          .withColumn("rn", row_number().over(w).cast("bigint"))
          .filter(col("rn") <= 3)
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), col("rn"))
          .orderBy(col("p_brand"), col("rn"))
      },
      Some("""
        SELECT p_brand, p_partkey, p_retailprice, rn
        FROM (SELECT p_brand, p_partkey, p_retailprice,
                     ROW_NUMBER() OVER (PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey) AS rn
              FROM part)
        WHERE rn <= 3
        ORDER BY p_brand, rn"""),
      headline = true),

    QueryDef(
      "q31_running_total",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"),
            round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS running_spend
        FROM orders
        ORDER BY o_custkey, o_orderkey"""),
      headline = true),

    QueryDef(
      "q32_lag_delta",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        t(s, dir, "events")
          .select(
            col("user_id"), col("event_id"),
            (round(col("value") - lag(col("value"), 1).over(w), 4) + lit(0.0))
              .as("delta"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT user_id, event_id,
               ROUND(value - LAG(value, 1) OVER (PARTITION BY user_id
                 ORDER BY event_id), 4) + 0.0 AS delta
        FROM events
        ORDER BY user_id, event_id""")),

    // ── sort / limit / set ops / distinct ───────────────────────────
    QueryDef(
      "q40_global_topk",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10""")),

    QueryDef(
      "q41_set_ops",
      (s, dir) => {
        val c = t(s, dir, "customer")
        c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
          .union(c.filter(col("c_acctbal") > 5000).select(col("c_custkey")))
          .distinct()
          .except(c.filter(col("c_nationkey") < 5).select(col("c_custkey")))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_nationkey < 5
        ORDER BY c_custkey""")),

    QueryDef(
      "q42_distinct",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderstatus"), col("o_orderpriority"))
          .distinct()
          .orderBy(col("o_orderstatus"), col("o_orderpriority")),
      Some("""
        SELECT DISTINCT o_orderstatus, o_orderpriority
        FROM orders
        ORDER BY o_orderstatus, o_orderpriority""")),

    QueryDef(
      "q43_bucketed_join",
      (s, dir) => {
        // co-located big⋈big join: both sides bucketed+sorted on the
        // join key, so the SortMergeJoin needs NO exchange on either
        // side — at 100 TB this is the difference between a fact-fact
        // join that shuffles petabytes and one that streams bucket
        // pairs (PlanSpec asserts the zero-exchange property). The
        // answer is physical-layout-invariant, which is exactly what
        // the plain-join oracle checks.
        val orders = Tables.load(s, dir, "orders")
        val customer = Tables.load(s, dir, "customer")
        // self-healing re-registration: a fresh catalog over a reused
        // warehouse dir (fresh session, old filesystem) would refuse
        // the managed-table location — drop both table AND location
        Seq("graft_b_orders", "graft_b_customer").foreach { tn =>
          s.sql(s"DROP TABLE IF EXISTS $tn")
          val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
          val loc = java.nio.file.Paths.get(wh, tn)
          if (java.nio.file.Files.exists(loc)) {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(loc).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          }
        }
        orders.write.mode("overwrite")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable("graft_b_orders")
        customer.write.mode("overwrite")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable("graft_b_customer")
        s.table("graft_b_orders")
          .join(s.table("graft_b_customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            round(sum(col("o_totalprice")), 2).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    QueryDef(
      "q110_dq_checks",
      (s, dir) => {
        // dbt-style data-quality suite, IMPLEMENTED (the reference's
        // README claims unique/not_null dbt tests that don't exist in
        // its repo — SURVEY.md §5): unique key, not-null, referential
        // integrity, and accepted-values checks, each one aggregate /
        // anti-join, unioned into a (check, n_violations) report.
        // Every check is the shuffle-minimal shape: uniqueness is one
        // hash agg on the key, the FK check is a broadcast anti-join.
        import graft.ext.DataQuality._
        val li = Tables.load(s, dir, "lineitem")
        val ord = Tables.load(s, dir, "orders")
        val cust = Tables.load(s, dir, "customer")
        report(Seq(
          uniqueCheck("unique_lineitem_key", li,
            Seq("l_orderkey", "l_linenumber")),
          notNullCheck("not_null_o_custkey", ord, "o_custkey"),
          fkCheck("fk_orders_customer", ord, "o_custkey", cust, "c_custkey"),
          acceptedValuesCheck("accepted_values_o_orderstatus", ord,
            "o_orderstatus", Seq("P", "O", "F"))))
      },
      Some("""
        SELECT check_name, n_violations FROM (
          SELECT 'unique_lineitem_key' AS check_name,
                 COUNT(*) AS n_violations FROM (
            SELECT l_orderkey, l_linenumber FROM lineitem
            GROUP BY 1, 2 HAVING COUNT(*) > 1) t
          UNION ALL
          SELECT 'not_null_o_custkey', COUNT(*)
          FROM orders WHERE o_custkey IS NULL
          UNION ALL
          SELECT 'fk_orders_customer', COUNT(*) FROM orders
          WHERE o_custkey IS NOT NULL
            AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                  WHERE c_custkey IS NOT NULL)
          UNION ALL
          SELECT 'accepted_values_o_orderstatus', COUNT(*) FROM orders
          WHERE o_orderstatus NOT IN ('P', 'O', 'F'))
        ORDER BY check_name""")),

    QueryDef(
      "q120_skew_report",
      (s, dir) => {
        // join-key skew diagnostics — the report that decides whether
        // a key needs salting ([[graft.ext.Skew]]) before a big join:
        // per candidate key, its distinct cardinality, the heaviest
        // key's share, and the max/mean ratio (a p99-style skew
        // factor). One hash agg per key column + 1-row rollups,
        // unioned — corpus scanned once per key, never collected.
        // ratios are kept in exact integer space until a single
        // correctly-rounded double division + floor: round(max/avg)
        // diverges between engines when the true value sits on a
        // .xx5 boundary (Spark rounds the shortest decimal repr,
        // DuckDB the binary value), while floor((max*k*C)/sum) is
        // bit-identical everywhere because both operands are exactly
        // representable integers.
        val li = Tables.load(s, dir, "lineitem")
        def keyStats(c: String) = {
          val counts = li.groupBy(col(c)).agg(count(lit(1)).as("n"))
          counts.agg(
            count(lit(1)).as("n_keys"),
            max(col("n")).as("max_rows"),
            (floor((max(col("n")) * count(lit(1)) * lit(100L)).cast("double")
              / sum(col("n")).cast("double")) / lit(100.0))
              .as("skew_factor"),
            (floor((max(col("n")) * lit(1000000L)).cast("double")
              / sum(col("n")).cast("double")) / lit(1000000.0))
              .as("top_key_share"))
            .select(lit(c).as("key_col"), col("n_keys"), col("max_rows"),
              col("skew_factor"), col("top_key_share"))
        }
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
          .map(keyStats).reduce(_ unionByName _)
          .orderBy(col("key_col"))
      },
      Some("""
        SELECT key_col, n_keys, max_rows, skew_factor, top_key_share
        FROM (
          SELECT 'l_orderkey' AS key_col, COUNT(*) AS n_keys,
                 CAST(MAX(n) AS BIGINT) AS max_rows,
                 FLOOR(CAST(MAX(n) * COUNT(*) * 100 AS DOUBLE)
                       / CAST(SUM(n) AS DOUBLE)) / 100.0 AS skew_factor,
                 FLOOR(CAST(MAX(n) * 1000000 AS DOUBLE)
                       / CAST(SUM(n) AS DOUBLE)) / 1000000.0 AS top_key_share
          FROM (SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY 1)
          UNION ALL
          SELECT 'l_partkey', COUNT(*), CAST(MAX(n) AS BIGINT),
                 FLOOR(CAST(MAX(n) * COUNT(*) * 100 AS DOUBLE)
                       / CAST(SUM(n) AS DOUBLE)) / 100.0,
                 FLOOR(CAST(MAX(n) * 1000000 AS DOUBLE)
                       / CAST(SUM(n) AS DOUBLE)) / 1000000.0
          FROM (SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY 1)
          UNION ALL
          SELECT 'l_suppkey', COUNT(*), CAST(MAX(n) AS BIGINT),
                 FLOOR(CAST(MAX(n) * COUNT(*) * 100 AS DOUBLE)
                       / CAST(SUM(n) AS DOUBLE)) / 100.0,
                 FLOOR(CAST(MAX(n) * 1000000 AS DOUBLE)
                       / CAST(SUM(n) AS DOUBLE)) / 1000000.0
          FROM (SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1)
          UNION ALL
          SELECT 'l_returnflag', COUNT(*), CAST(MAX(n) AS BIGINT),
                 FLOOR(CAST(MAX(n) * COUNT(*) * 100 AS DOUBLE)
                       / CAST(SUM(n) AS DOUBLE)) / 100.0,
                 FLOOR(CAST(MAX(n) * 1000000 AS DOUBLE)
                       / CAST(SUM(n) AS DOUBLE)) / 1000000.0
          FROM (SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1))
        ORDER BY key_col""")),

    QueryDef(
      "q121_salted_agg",
      (s, dir) =>
        // the explicit two-phase salted aggregation under the driver's
        // hash gate: l_returnflag is a 3-value hot key (the q120 skew
        // report's worst case), the salted partial/final split must
        // reproduce the plain GROUP BY exactly — the oracle IS the
        // plain GROUP BY, so any partial/merge mistake hash-fails.
        graft.ext.Skew.saltedSumCount(
            Tables.load(s, dir, "lineitem"),
            col("l_returnflag"), col("l_quantity"))
          .select(col("key").as("l_returnflag"),
            round(col("total"), 2).as("sum_qty"), col("n"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    QueryDef(
      "q127_gap_fill",
      (s, dir) => {
        // calendar gap-fill + forward-fill: densify sparse per-nation
        // daily order facts onto a generated date spine (every nation
        // × every day of 1995-01), zero-fill the gaps, and carry the
        // last ACTIVE day's revenue forward with an ignoreNulls
        // last() window — the standard time-series densification a
        // BI layer runs before charting/joining. Shape: the spine is
        // generated (nations × sequence(), no source scan), facts
        // aggregate once, the left join keys on (nation, day), and
        // the fill window rides the same partitioning — map-side
        // after one exchange.
        import org.apache.spark.sql.expressions.Window
        val nation = Tables.load(s, dir, "nation")
        val spine = nation.select(col("n_name").as("nation"),
          explode(expr(
            "sequence(date'1995-01-01', date'1995-01-31', interval 1 day)"))
            .as("day"))
        val daily = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate")
            .between(lit("1995-01-01"), lit("1995-01-31")))
          .join(Tables.load(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(nation, col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"), col("o_orderdate").as("day"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("revenue"))
        val w = Window.partitionBy(col("nation")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("nation", "day"), "left")
          .withColumn("last_active_revenue",
            last(col("revenue"), ignoreNulls = true).over(w))
          .select(col("nation"), col("day"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("revenue"), lit(0.0)).as("revenue"),
            col("last_active_revenue"))
          .orderBy(col("nation"), col("day"))
      },
      Some("""
        WITH spine AS (
          SELECT n_name AS nation, CAST(t.d AS DATE) AS day
          FROM nation,
               generate_series(DATE '1995-01-01', DATE '1995-01-31',
                               INTERVAL 1 DAY) AS t(d)),
        daily AS (
          SELECT n_name AS nation, o_orderdate AS day,
                 COUNT(*) AS n_orders,
                 ROUND(SUM(o_totalprice), 2) AS revenue
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-01-31'
          GROUP BY 1, 2)
        SELECT spine.nation, spine.day,
               COALESCE(d.n_orders, 0) AS n_orders,
               COALESCE(d.revenue, 0.0) AS revenue,
               LAST_VALUE(d.revenue IGNORE NULLS) OVER (
                 PARTITION BY spine.nation ORDER BY spine.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_active_revenue
        FROM spine LEFT JOIN daily d USING (nation, day)
        ORDER BY spine.nation, spine.day""")),

    QueryDef(
      "q128_equidepth_histogram",
      (s, dir) => {
        // equi-DEPTH histogram (deciles) of order value per order
        // priority — the profiling twin of q111's equi-width buckets:
        // ntile(10) over (price, key) so every bucket holds the same
        // row count and the bucket EDGES reveal the distribution.
        // The window partitions by priority, so the sort is per-group
        // and parallel — the global-ntile variant would need a total
        // sort, which is why a 100 TB profiler switches to
        // approx-quantile cuts (the q101 pattern) for ungrouped data.
        // The (price, key) tiebreak makes tile assignment a total
        // order, so both engines bucket identically.
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.load(s, dir, "orders")
          .withColumn("decile", ntile(10).over(w))
          .groupBy(col("o_orderpriority"), col("decile"))
          .agg(count(lit(1)).as("n_orders"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"),
            round(sum(col("o_totalprice")), 2).as("bucket_revenue"))
          .orderBy(col("o_orderpriority"), col("decile"))
      },
      Some("""
        WITH t AS (
          SELECT o_orderpriority, o_totalprice,
                 NTILE(10) OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice, o_orderkey) AS decile
          FROM orders)
        SELECT o_orderpriority, CAST(decile AS INTEGER) AS decile,
               COUNT(*) AS n_orders,
               MIN(o_totalprice) AS lo,
               MAX(o_totalprice) AS hi,
               ROUND(SUM(o_totalprice), 2) AS bucket_revenue
        FROM t
        GROUP BY 1, 2
        ORDER BY o_orderpriority, decile""")),

    QueryDef(
      "q111_price_histogram",
      (s, dir) => {
        // data-profiling histogram: 10 equi-width buckets over the
        // order price range. Two-pass shape (1-row min/max broadcast,
        // then a map-side bucket expression + one hash agg) — the
        // distributed twin of a describe()/profile step.
        val ord = Tables.load(s, dir, "orders")
        val bounds = ord.agg(
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
        ord.crossJoin(broadcast(bounds))
          // hi==lo guard: a single-valued corpus makes the width 0 and
          // the unguarded division 0/0 → NaN, which Spark's BIGINT cast
          // nulls while DuckDB's errors — the two engines would diverge
          // instead of both putting everything in bucket 0
          .withColumn("bucket",
            when(col("hi") === col("lo"), lit(0L)).otherwise(
              least(floor((col("o_totalprice") - col("lo")) * 10.0
                / (col("hi") - col("lo"))), lit(9L))).cast("bigint"))
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_orders"),
            round(min(col("o_totalprice")), 2).as("bucket_min"),
            round(max(col("o_totalprice")), 2).as("bucket_max"))
          .orderBy(col("bucket"))
      },
      Some("""
        WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
                   FROM orders)
        SELECT CASE WHEN hi = lo THEN 0
               ELSE LEAST(CAST(floor((o_totalprice - lo) * 10.0 / (hi - lo))
                 AS BIGINT), 9) END AS bucket,
               COUNT(*) AS n_orders,
               ROUND(MIN(o_totalprice), 2) AS bucket_min,
               ROUND(MAX(o_totalprice), 2) AS bucket_max
        FROM orders CROSS JOIN b
        GROUP BY 1
        ORDER BY bucket""")),

    QueryDef(
      "q144_scd2_pit_lookup",
      (s, dir) => {
        // POINT-IN-TIME dimension lookup against the q131 SCD2 build:
        // every lineitem shipment resolves the customer's priority
        // VERSION that was valid on its ship date — the standard
        // warehouse PIT join. Shape: equi-join on the customer key
        // (versions-per-customer fan-out is tiny and bounded by the
        // change count, so this is a plain hash join, never a range
        // scan), then the [valid_from, valid_to) half-open containment
        // filter picks exactly one version per fact — half-open is
        // what makes a change-date shipment land in the NEW version
        // and the match unique by construction. Aggregated to
        // (priority, ship year) with integer-exact counts/quantities
        // under the hash gate; shipments before a customer's first
        // observed version drop out on both engines (inner semantics).
        val dim = scd2PriorityDim(s, dir)
        val facts = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_date"),
            col("l_quantity"))
          .join(Tables.load(s, dir, "orders")
            .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
            Seq("l_orderkey"))
        facts.join(dim, Seq("o_custkey"))
          .filter(col("ship_date") >= col("valid_from") &&
            col("ship_date") < col("valid_to"))
          .groupBy(col("o_orderpriority"),
            year(col("ship_date")).cast("bigint").as("ship_year"))
          .agg(count(lit(1)).as("n_shipments"),
            sum(col("l_quantity")).cast("bigint").as("sum_qty"))
          .orderBy(col("o_orderpriority"), col("ship_year"))
      },
      Some("""
        WITH obs AS (
          SELECT o_custkey, CAST(o_orderdate AS DATE) AS obs_date,
                 o_orderkey, o_orderpriority
          FROM orders),
        changed AS (
          SELECT * FROM (
            SELECT o_custkey, obs_date, o_orderkey, o_orderpriority,
                   LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                     ORDER BY obs_date, o_orderkey) AS prev
            FROM obs)
          WHERE prev IS DISTINCT FROM o_orderpriority),
        dim AS (
          SELECT o_custkey, o_orderpriority,
                 obs_date AS valid_from,
                 COALESCE(LEAD(obs_date) OVER (PARTITION BY o_custkey
                   ORDER BY obs_date, o_orderkey), DATE '2099-12-31')
                   AS valid_to
          FROM changed),
        facts AS (
          SELECT o.o_custkey, CAST(l.l_shipdate AS DATE) AS ship_date,
                 l.l_quantity
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT d.o_orderpriority,
               CAST(EXTRACT(year FROM f.ship_date) AS BIGINT) AS ship_year,
               COUNT(*) AS n_shipments,
               CAST(SUM(f.l_quantity) AS BIGINT) AS sum_qty
        FROM facts f JOIN dim d ON f.o_custkey = d.o_custkey
         AND f.ship_date >= d.valid_from AND f.ship_date < d.valid_to
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    QueryDef(
      "q131_scd2_priority",
      (s, dir) => {
        // SCD Type-2 dimension build: turn the append-only orders log
        // into a slowly-changing history of each customer's order
        // priority — keep only observations where the priority CHANGED
        // (null-safe lag compare), then derive [valid_from, valid_to)
        // intervals with lead() plus a version number; valid_to stays
        // NULL on the open current version. Both windows ride the same
        // (custkey → date, orderkey) sort, so the whole build is one
        // exchange + per-group sorts, joinless; the (date, orderkey)
        // tiebreak totalizes the order so both engines pick identical
        // change points. All integer/string/date arithmetic under the
        // hash gate; the open current version closes with the SCD2
        // high-date sentinel (2099-12-31) rather than NULL — nullable
        // non-float columns diverge in the driver's string-compare
        // (None vs NaT), and the sentinel is the warehouse convention
        // anyway.
        scd2PriorityDim(s, dir).orderBy(col("o_custkey"), col("version"))
      },
      Some("""
        WITH obs AS (
          SELECT o_custkey, CAST(o_orderdate AS DATE) AS obs_date,
                 o_orderkey, o_orderpriority
          FROM orders),
        changed AS (
          SELECT * FROM (
            SELECT o_custkey, obs_date, o_orderkey, o_orderpriority,
                   LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                     ORDER BY obs_date, o_orderkey) AS prev
            FROM obs)
          WHERE prev IS DISTINCT FROM o_orderpriority)
        SELECT o_custkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY obs_date, o_orderkey) AS version,
               o_orderpriority,
               obs_date AS valid_from,
               COALESCE(LEAD(obs_date) OVER (PARTITION BY o_custkey
                 ORDER BY obs_date, o_orderkey), DATE '2099-12-31')
                 AS valid_to
        FROM changed
        ORDER BY o_custkey, version""")),

    QueryDef(
      "q137_pareto_abc",
      (s, dir) => {
        // Pareto / ABC analysis: rank customers by revenue, classify
        // by cumulative revenue share (A ≤ 80%, B ≤ 95%, C the tail),
        // and summarize each class. Determinism care: per-customer
        // revenue is rounded to 2dp BEFORE the running sum (hash-agg
        // summation order differs across engines; 2dp rounding
        // absorbs it), the running sum rides a totally-ordered window
        // (revenue DESC, custkey), and the TOTAL is max(cum) over the
        // full frame — the last prefix value — rather than a separate
        // unordered SUM, so the permille boundary sees bit-identical
        // doubles in both engines. The global-order window here rides
        // the customer-aggregated frame; at 100 TB-dimension scale the
        // same prefix sum runs as a two-pass range-partitioned scan
        // (per-partition partials + offset broadcast) instead of a
        // single-partition sort.
        import org.apache.spark.sql.expressions.Window
        val rev = Tables.load(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
        val wCum = Window.orderBy(col("revenue").desc, col("o_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.orderBy(col("revenue").desc, col("o_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        rev
          .withColumn("cum", sum(col("revenue")).over(wCum))
          .withColumn("permille",
            floor(col("cum") * 1000.0 / max(col("cum")).over(wAll))
              .cast("bigint"))
          .withColumn("abc_class",
            when(col("permille") <= 800, "A")
              .when(col("permille") <= 950, "B").otherwise("C"))
          .groupBy(col("abc_class"))
          .agg(count(lit(1)).as("n_customers"),
            round(sum(col("revenue")), 2).as("class_revenue"))
          .orderBy(col("abc_class"))
      },
      Some("""
        WITH rev AS (
          SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS revenue
          FROM orders GROUP BY 1),
        cums AS (
          SELECT o_custkey, revenue,
                 SUM(revenue) OVER (ORDER BY revenue DESC, o_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
          FROM rev),
        shares AS (
          SELECT revenue,
                 CAST(FLOOR(cum * 1000.0 / MAX(cum) OVER ()) AS BIGINT)
                   AS permille
          FROM cums)
        SELECT CASE WHEN permille <= 800 THEN 'A'
                    WHEN permille <= 950 THEN 'B'
                    ELSE 'C' END AS abc_class,
               COUNT(*) AS n_customers,
               ROUND(SUM(revenue), 2) AS class_revenue
        FROM shares
        GROUP BY 1
        ORDER BY abc_class""")),

    QueryDef(
      "q166_psi_drift",
      (s, dir) => {
        // Population Stability Index per month vs the first month —
        // the standard ML-ops drift monitor for a feature
        // distribution (PSI = Σ (qᵢ−pᵢ)·ln(qᵢ/pᵢ); <0.1 stable,
        // >0.25 action). Bins are q111's corpus-global equi-width 10
        // (1-row bounds broadcast, hi==lo guarded); shares use
        // ADD-ONE smoothing over the bin count — empty bins stay
        // finite from integer arithmetic, no epsilon constants near
        // the hash gate. The month×bin grid is aggregate-scale (80×10
        // here, never the fact table); reference shares broadcast.
        val ord = Tables.load(s, dir, "orders")
          .select(date_trunc("month", col("o_orderdate")).as("month"),
            col("o_totalprice"))
        val bounds = ord.agg(
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
        val c = ord.crossJoin(broadcast(bounds))
          .withColumn("bucket",
            when(col("hi") === col("lo"), lit(0L)).otherwise(
              least(floor((col("o_totalprice") - col("lo")) * 10.0
                / (col("hi") - col("lo"))), lit(9L))).cast("bigint"))
          .groupBy(col("month"), col("bucket"))
          .agg(count(lit(1)).as("n"))
        val nm = c.groupBy(col("month")).agg(sum(col("n")).cast("bigint").as("nm"))
        val filled = nm
          .select(col("month"), col("nm"),
            explode(expr("sequence(0L, 9L)")).as("bucket"))
          .join(c, Seq("month", "bucket"), "left")
          .withColumn("s",
            (coalesce(col("n"), lit(0L)) + 1).cast("double") / (col("nm") + 10))
        val refMonth = nm.agg(min(col("month")).as("ref_month"))
        val ref = filled.join(broadcast(refMonth),
            col("month") === col("ref_month"))
          .select(col("bucket"), col("s").as("s_ref"))
        filled.join(broadcast(ref), Seq("bucket"))
          // per-bucket PSI term in 1e-12 fixed-point (q145 convention):
          // terms are ≥ 0 (same-sign factors) over 10 buckets, so the
          // long sum is exact and far from overflow; libm ulp and
          // summation order can no longer move the 4dp round
          .withColumn("term_fp",
            floor((col("s") - col("s_ref")) * log(col("s") / col("s_ref"))
              * lit(1e12d)).cast("long"))
          .groupBy(col("month"), col("nm"))
          .agg(round(sum(col("term_fp")).cast("double") / lit(1e12d), 4)
            .as("psi"))
          .select(col("month"), col("nm").as("n_orders"), col("psi"))
          .orderBy(col("month"))
      },
      Some("""
        WITH o AS (
          SELECT date_trunc('month', o_orderdate) AS month, o_totalprice
          FROM orders),
        b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM o),
        c AS (
          SELECT month,
                 CASE WHEN hi = lo THEN 0
                 ELSE LEAST(CAST(floor((o_totalprice - lo) * 10.0 / (hi - lo))
                   AS BIGINT), 9) END AS bucket,
                 COUNT(*) AS n
          FROM o CROSS JOIN b GROUP BY 1, 2),
        nm AS (SELECT month, CAST(SUM(n) AS BIGINT) AS nm FROM c GROUP BY 1),
        grid AS (
          SELECT nm.month, nm.nm, g.bucket,
                 CAST(COALESCE(c.n, 0) + 1 AS DOUBLE) / (nm.nm + 10) AS s
          FROM nm CROSS JOIN (SELECT unnest(range(0, 10)) AS bucket) g
          LEFT JOIN c ON c.month = nm.month AND c.bucket = g.bucket),
        r AS (
          SELECT bucket, s AS s_ref FROM grid
          WHERE month = (SELECT MIN(month) FROM nm))
        SELECT grid.month, grid.nm AS n_orders,
               ROUND(CAST(SUM(CAST(FLOOR(
                   (s - s_ref) * LN(s / s_ref) * 1e12) AS BIGINT))
                 AS DOUBLE) / 1e12, 4) AS psi
        FROM grid JOIN r USING (bucket)
        GROUP BY grid.month, grid.nm
        ORDER BY grid.month"""))

    ,
    QueryDef(
      "q138_benford_screen",
      (s, dir) => {
        // Benford first-digit screen over order totals — the fraud /
        // fabricated-data smoke test: compare the observed first-digit
        // distribution against Benford's law and report the permille
        // deviation per digit. Everything under the hash gate is
        // integer or string: FLOOR before the bigint cast (Spark casts
        // double→bigint by truncation, DuckDB by rounding — floor
        // makes them agree), observed share via integer-div permille
        // over a 9-row full-frame window sum, and the expected shares
        // are the ROUNDED-permille Benford constants as shared
        // literals on both sides — no log10 anywhere near the gate.
        // Shape: map-side digit extract, one hash agg, a 9-row window
        // + broadcast join.
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val expected = Seq(
          ("1", 301L), ("2", 176L), ("3", 125L), ("4", 97L), ("5", 79L),
          ("6", 67L), ("7", 58L), ("8", 51L), ("9", 46L))
          .toDF("digit", "expected_permille")
        val wAll = Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.load(s, dir, "orders")
          .select(substring(floor(col("o_totalprice")).cast("bigint")
            .cast("string"), 1, 1).as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
          .withColumn("observed_permille",
            expr("n * 1000 div sum(n) over ()"))
          .join(broadcast(expected), Seq("digit"))
          .select(col("digit"), col("n"), col("observed_permille"),
            col("expected_permille"),
            abs(col("observed_permille") - col("expected_permille"))
              .as("deviation_permille"))
          .orderBy(col("digit"))
      },
      Some("""
        WITH d AS (
          SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                        1, 1) AS digit
          FROM orders),
        c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
        t AS (SELECT digit, n,
                     n * 1000 // CAST(SUM(n) OVER () AS BIGINT)
                       AS observed_permille
              FROM c),
        e(digit, expected_permille) AS (VALUES
          ('1', 301), ('2', 176), ('3', 125), ('4', 97), ('5', 79),
          ('6', 67), ('7', 58), ('8', 51), ('9', 46))
        SELECT t.digit, n, observed_permille,
               CAST(expected_permille AS BIGINT) AS expected_permille,
               ABS(observed_permille - expected_permille)
                 AS deviation_permille
        FROM t JOIN e ON t.digit = e.digit
        ORDER BY t.digit""")),

    QueryDef(
      "q139_pareto_twopass",
      (s, dir) => paretoAbcTwoPass(s, dir),
      Some("""
        WITH rev AS (
          SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS revenue
          FROM orders GROUP BY 1),
        cums AS (
          SELECT o_custkey, revenue,
                 ROUND(SUM(revenue) OVER (ORDER BY revenue DESC, o_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS cum
          FROM rev),
        shares AS (
          SELECT revenue,
                 CAST(FLOOR(cum * 1000.0 / MAX(cum) OVER ()) AS BIGINT)
                   AS permille
          FROM cums)
        SELECT CASE WHEN permille <= 800 THEN 'A'
                    WHEN permille <= 950 THEN 'B'
                    ELSE 'C' END AS abc_class,
               COUNT(*) AS n_customers,
               ROUND(SUM(revenue), 2) AS class_revenue
        FROM shares
        GROUP BY 1
        ORDER BY abc_class"""))
  )

  /** q131's SCD2 dimension build, shared with q144's point-in-time
    * lookup: one (custkey → date, orderkey) exchange, both windows on
    * the same sort, joinless (see q131's inline rationale for the
    * change-point and high-date-sentinel choices).
    */
  private def scd2PriorityDim(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("obs_date"), col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("obs_date"),
        col("o_orderkey"), col("o_orderpriority"))
      .withColumn("prev", lag(col("o_orderpriority"), 1).over(w))
      .filter(!(col("prev") <=> col("o_orderpriority")))
      .withColumn("version", row_number().over(w).cast("bigint"))
      .withColumn("valid_to", coalesce(
        lead(col("obs_date"), 1).over(w), lit("2099-12-31").cast("date")))
      .select(col("o_custkey"), col("version"), col("o_orderpriority"),
        col("obs_date").as("valid_from"), col("valid_to"))
  }

  /** q137's promised 100×-scale path, as code (r3 VERDICT ask #4): the
    * global running sum WITHOUT a single-partition window. Classic
    * two-pass range-partitioned prefix sum:
    *
    *  1. `repartitionByRange` on the global sort key (revenue DESC,
    *     custkey) — each partition holds a contiguous slice of the
    *     global order. The assignment is FROZEN by staging to parquet
    *     ([[graft.Staging.checkpoint]]): `spark_partition_id()` is
    *     nondeterministic across re-executions (range bounds are
    *     sampled per run), so both consumers below must read the same
    *     materialization.
    *  2. Per-partition LOCAL prefix sums via a window PARTITIONED BY
    *     pid — every partition sorts independently in parallel; no
    *     Exchange SinglePartition anywhere in the plan
    *     (PlanSpec-asserted).
    *  3. Per-partition totals — ≤ `partitions` rows, driver-bounded BY
    *     CONSTRUCTION — accumulate sequentially into partition
    *     offsets; global cum = local cum + broadcast offset.
    *
    * Determinism across engines AND across partitionings: the
    * per-customer revenue is 2dp-rounded before summing, and the
    * global cum is 2dp-rounded after assembly — accumulated fp error
    * over any realistic customer count is ≪ half a cent, so the
    * rounded cum is bit-identical to DuckDB's strictly-sequential
    * window sum no matter how the doubles were grouped. (q137 itself
    * keeps the raw-double prefix sum + max(cum) trick; this variant's
    * oracle mirrors its extra ROUND.)
    */
  def paretoAbcTwoPass(s: org.apache.spark.sql.SparkSession, dir: String,
      partitions: Int = 32): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
    val ranged = graft.Staging.checkpoint(
      rev.repartitionByRange(partitions, col("revenue").desc, col("o_custkey"))
        .withColumn("pid", spark_partition_id()), "pareto-ranged")
    val wLocal = Window.partitionBy(col("pid"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pass 1.5: partition totals → offsets. ≤ `partitions` rows; the
    // sequential fold preserves the left-to-right addition order of
    // the single-window formulation.
    val parts = ranged.groupBy(col("pid"))
      .agg(sum(col("revenue")).as("pt"))
      .orderBy(col("pid")).collect()
    var acc = 0.0
    val offsetRows = parts.toSeq.map { r =>
      val o = acc; acc += r.getDouble(1); (r.getInt(0), o)
    }
    val grandTotal = BigDecimal(acc)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    import s.implicits._
    val offsets = offsetRows.toDF("pid", "cum_offset")
    ranged
      .withColumn("local_cum", sum(col("revenue")).over(wLocal))
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("cum", round(col("local_cum") + col("cum_offset"), 2))
      .withColumn("permille",
        floor(col("cum") * 1000.0 / lit(grandTotal)).cast("bigint"))
      .withColumn("abc_class",
        when(col("permille") <= 800, "A")
          .when(col("permille") <= 950, "B").otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("revenue")), 2).as("class_revenue"))
      .orderBy(col("abc_class"))
  }

  /** q128's promised ungrouped-at-scale path, as code (r3 VERDICT ask
    * #4): a GLOBAL equi-depth histogram without the total sort that
    * exact global ntile() needs. One `percentile_approx` aggregate
    * (mergeable sketch, map-side combinable) produces the cut points;
    * bucket assignment is then a map-side array scan against the
    * broadcast 1-row cuts — two passes over the data, zero sorts,
    * zero windows (PlanSpec-asserted). Buckets are equi-depth up to
    * sketch error and value ties (a value equal to a cut lands
    * entirely in one bucket — ties are never split, the same contract
    * exact ntile gives only via its arbitrary-but-total tiebreak).
    */
  def equidepthApproxGlobal(s: org.apache.spark.sql.SparkSession, dir: String,
      buckets: Int = 10, accuracy: Int = 100000)
      : org.apache.spark.sql.DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val cuts = ord.agg(percentile_approx(col("o_totalprice"),
      array(probs.map(lit): _*), lit(accuracy)).as("cuts"))
    ord.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        aggregate(col("cuts"), lit(0),
          (n, c) => n + when(col("o_totalprice") > c, 1).otherwise(0)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        round(sum(col("o_totalprice")), 2).as("bucket_revenue"))
      .orderBy(col("bucket"))
  }
}
