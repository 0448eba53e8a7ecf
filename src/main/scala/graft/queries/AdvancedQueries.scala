package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Second tranche of the operator inventory: multi-dimensional
  * aggregation (rollup/cube/pivot), statistical aggregates,
  * percentiles, array/string aggregation, date/time functions,
  * ranking windows, range + as-of joins, lateral explode, and
  * approximate aggregates. Each carries a DuckDB oracle except the
  * approximate ones (error bounds asserted in ScalaTest instead).
  */
object AdvancedQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q05_rollup",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        val n = broadcast(Tables.load(s, dir, "nation"))
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .rollup(col("n_name"), col("o_orderstatus"))
          .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("n_name").asc_nulls_first,
            col("o_orderstatus").asc_nulls_first)
      },
      Some("""
        SELECT n_name, o_orderstatus,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, o_orderstatus)
        ORDER BY n_name ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST"""),
      headline = true),

    QueryDef(
      "q06_cube",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            round(avg(col("o_totalprice")), 4).as("avg_price"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some("""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(AVG(o_totalprice), 4) AS avg_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    QueryDef(
      "q07_pivot",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(round(sum(col("o_totalprice")), 2))
          .withColumnsRenamed(Map("F" -> "rev_f", "O" -> "rev_o", "P" -> "rev_p"))
          .orderBy(col("o_orderpriority")),
      Some("""
        SELECT o_orderpriority,
               ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS rev_f,
               ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS rev_o,
               ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS rev_p
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    QueryDef(
      "q129_unpivot",
      (s, dir) => {
        // UNPIVOT (melt) — the inverse of q07's pivot, closing the
        // wide↔long reshaping pair: event counts pivot wide per
        // status, zero-fill, then `Dataset.unpivot` melts the measure
        // columns back to (priority, status, n_orders) rows. Both
        // reshapes are map-side after the one pivot aggregation; the
        // zero-fill before melting makes the long form dense and
        // deterministic (no null-row drop semantics in play).
        val wide = Tables.load(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("F"),
            coalesce(col("O"), lit(0L)).as("O"),
            coalesce(col("P"), lit(0L)).as("P"))
        wide.unpivot(
            ids = Array(col("o_orderpriority")),
            values = Array(col("F"), col("O"), col("P")),
            variableColumnName = "o_orderstatus",
            valueColumnName = "n_orders")
          .orderBy(col("o_orderpriority"), col("o_orderstatus"))
      },
      Some("""
        WITH wide AS (
          SELECT o_orderpriority,
                 COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0)
                   AS f,
                 COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0)
                   AS o,
                 COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0)
                   AS p
          FROM orders
          GROUP BY o_orderpriority)
        SELECT o_orderpriority, o_orderstatus,
               CAST(n_orders AS BIGINT) AS n_orders
        FROM (
          SELECT o_orderpriority, 'F' AS o_orderstatus, f AS n_orders FROM wide
          UNION ALL
          SELECT o_orderpriority, 'O', o FROM wide
          UNION ALL
          SELECT o_orderpriority, 'P', p FROM wide)
        ORDER BY o_orderpriority, o_orderstatus""")),

    QueryDef(
      "q08_stat_aggs",
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            // + 0.0: signed-rounded-output convention (Similarity.simR)
            (round(corr(col("l_quantity"), col("l_extendedprice")), 6)
              + lit(0.0)).as("corr_qp"),
            (round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
              + lit(0.0)).as("covar_qp"),
            min(col("l_shipdate")).as("min_ship"),
            max(col("l_shipdate")).as("max_ship"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_price,
               ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
               ROUND(CORR(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qp,
               ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) + 0.0 AS covar_qp,
               MIN(l_shipdate) AS min_ship,
               MAX(l_shipdate) AS max_ship
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    QueryDef(
      "q09_percentiles",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
            round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
          .orderBy(col("o_orderpriority")),
      Some("""
        SELECT o_orderpriority,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    QueryDef(
      "q14_array_agg",
      (s, dir) =>
        Tables.load(s, dir, "customer")
          .filter(col("c_custkey") <= 50)
          .groupBy(col("c_nationkey"))
          .agg(
            array_join(sort_array(collect_list(col("c_custkey"))), ",")
              .as("custkeys"),
            count(lit(1)).as("n"))
          .orderBy(col("c_nationkey")),
      Some("""
        SELECT c_nationkey,
               array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
               COUNT(*) AS n
        FROM customer
        WHERE c_custkey <= 50
        GROUP BY c_nationkey
        ORDER BY c_nationkey""")),

    QueryDef(
      "q15_date_functions",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
            date_add(to_date(col("o_orderdate")), 30).as("due_date"),
            datediff(to_date(lit("2000-01-01")), to_date(col("o_orderdate")))
              .cast("bigint").as("days_to_y2k"))
          .orderBy(col("o_orderkey")),
      Some("""
        SELECT o_orderkey,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
               CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
               CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
               datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
        FROM orders
        ORDER BY o_orderkey""")),

    QueryDef(
      "q16_conditional_agg",
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_linestatus"))
          .agg(
            count(when(col("l_returnflag") === "R", 1)).as("n_returned"),
            count(when(col("l_discount") > 0.05, 1)).as("n_discounted"),
            round(sum(when(col("l_returnflag") === "R",
              col("l_extendedprice")).otherwise(0.0)), 2).as("returned_value"))
          .orderBy(col("l_linestatus")),
      Some("""
        SELECT l_linestatus,
               COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
               COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted,
               ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END), 2)
                 AS returned_value
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus""")),

    QueryDef(
      "q33_ranking_windows",
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.load(s, dir, "customer")
          .select(col("c_nationkey"), col("c_custkey"),
            rank().over(w).cast("bigint").as("rnk"),
            dense_rank().over(w).cast("bigint").as("drnk"),
            ntile(4).over(w).cast("bigint").as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank"))
          .filter(col("rnk") <= 5)
          .orderBy(col("c_nationkey"), col("rnk"), col("c_custkey"))
      },
      Some("""
        SELECT c_nationkey, c_custkey, rnk, drnk, quartile, pct_rank
        FROM (
          SELECT c_nationkey, c_custkey,
                 RANK() OVER w AS rnk,
                 DENSE_RANK() OVER w AS drnk,
                 NTILE(4) OVER w AS quartile,
                 ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
          FROM customer
          WINDOW w AS (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey))
        WHERE rnk <= 5
        ORDER BY c_nationkey, rnk, c_custkey""")),

    QueryDef(
      "q34_frame_windows",
      (s, dir) => {
        val byCust = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.load(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            first_value(col("o_orderkey")).over(
              byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("first_order"),
            round(avg(col("o_totalprice")).over(
              byCust.rowsBetween(-2, Window.currentRow)), 4)
              .as("moving_avg3"),
            lead(col("o_orderkey"), 1).over(byCust).as("next_order"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order,
               ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
               LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS next_order
        FROM orders
        ORDER BY o_custkey, o_orderkey""")),

    QueryDef(
      "q25_range_join",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"))
        val l = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
        // equi on the key + range on the date: planned as a hash join
        // with the range as residual — never a cartesian
        l.join(o, col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") >= col("o_orderdate")
            && col("l_shipdate") < date_add(to_date(col("o_orderdate")), 60)
              .cast("timestamp"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("shipped_in_60d"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, COUNT(*) AS shipped_in_60d
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey
         AND l_shipdate >= o_orderdate
         AND l_shipdate < CAST(CAST(o_orderdate AS DATE) + INTERVAL 60 DAY AS TIMESTAMP)
        GROUP BY o_orderkey
        ORDER BY o_orderkey"""),
      headline = true),

    QueryDef(
      "q26_asof_join",
      (s, dir) => {
        // as-of: for each event, the latest signup ts of the same user
        // at-or-before it — expressed as a conditional running max, so
        // it's ONE window pass over the user partition (no self-join,
        // no per-row subquery; scales as a sort within user groups).
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"),
            max(when(col("event_type") === "signup", col("ts")))
              .over(w).as("asof_signup_ts"))
          .select(col("event_id"), col("user_id"),
            unix_millis(col("asof_signup_ts")).as("asof_signup_ms"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT e.event_id, e.user_id,
               epoch_ms((SELECT MAX(e2.ts) FROM events e2
                         WHERE e2.user_id = e.user_id
                           AND e2.event_type = 'signup'
                           AND e2.ts <= e.ts)) AS asof_signup_ms
        FROM events e
        ORDER BY e.event_id""")),

    QueryDef(
      "q46_lateral_explode",
      (s, dir) =>
        Tables.load(s, dir, "part")
          .select(col("p_partkey"),
            explode(split(col("p_name"), " ")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"),
            min(col("p_partkey")).as("first_part"))
          .filter(col("n") >= 5)
          .orderBy(col("word")),
      Some("""
        SELECT word, COUNT(*) AS n, MIN(p_partkey) AS first_part
        FROM (SELECT p_partkey, UNNEST(string_split(p_name, ' ')) AS word
              FROM part)
        GROUP BY word
        HAVING COUNT(*) >= 5
        ORDER BY word""")),

    QueryDef(
      "q47_correlated_subquery",
      (s, dir) => {
        Tables.registerAll(s, dir)
        // above-average-for-their-nation customers via correlated scalar
        // subquery; Catalyst decorrelates to an aggregate + join
        s.sql("""
          SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 2) AS acctbal
          FROM customer c
          WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.5 FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
          ORDER BY c_custkey""")
      },
      Some("""
        SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.5 FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey""")),

    QueryDef(
      "q28_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT c_mktsegment, o_orderstatus,
                 CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
                 CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
                 ROUND(SUM(o_totalprice), 2) AS revenue,
                 COUNT(*) AS n_orders
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus),
                                  (c_mktsegment), ())
          ORDER BY c_mktsegment ASC NULLS FIRST,
                   o_orderstatus ASC NULLS FIRST""")
      },
      Some("""
        SELECT c_mktsegment, o_orderstatus,
               CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus),
                                (c_mktsegment), ())
        ORDER BY c_mktsegment ASC NULLS FIRST,
                 o_orderstatus ASC NULLS FIRST""")),

    QueryDef(
      "q18_array_functions",
      (s, dir) =>
        Tables.load(s, dir, "customer")
          .filter(col("c_custkey") <= 100)
          .groupBy(col("c_nationkey"))
          .agg(sort_array(collect_list(col("c_custkey"))).as("keys"))
          .select(
            col("c_nationkey"),
            size(col("keys")).cast("bigint").as("n"),
            element_at(col("keys"), 1).as("first_key"),
            element_at(col("keys"), -1).as("last_key"),
            array_contains(col("keys"), 7L).as("has_7"),
            array_join(transform(slice(col("keys"), 1, 3), _ * 2), ",")
              .as("doubled_head"),
            round(aggregate(col("keys"), lit(0L), (a, x) => a + x)
              .cast("double") / size(col("keys")), 4).as("mean_key"))
          .orderBy(col("c_nationkey")),
      Some("""
        WITH g AS (
          SELECT c_nationkey, list_sort(list(c_custkey)) AS keys
          FROM customer WHERE c_custkey <= 100
          GROUP BY c_nationkey)
        SELECT c_nationkey,
               CAST(len(keys) AS BIGINT) AS n,
               keys[1] AS first_key,
               keys[-1] AS last_key,
               list_contains(keys, 7) AS has_7,
               array_to_string(list_transform(keys[1:3], x -> x * 2), ',')
                 AS doubled_head,
               ROUND(CAST(list_sum(keys) AS DOUBLE) / len(keys), 4) AS mean_key
        FROM g
        ORDER BY c_nationkey""")),

    QueryDef(
      "q19_string_functions",
      (s, dir) =>
        Tables.load(s, dir, "nation")
          .select(
            col("n_nationkey"),
            initcap(lower(col("n_name"))).as("pretty"),
            lpad(col("n_name"), 12, ".").as("padded"),
            translate(col("n_name"), "AEIOU", "aeiou").as("devoweled"),
            regexp_replace(col("n_name"), "[AEIOU]", "_").as("masked"),
            split(col("n_name"), "A").getItem(0).as("first_seg"),
            instr(col("n_name"), "AN").cast("bigint").as("an_pos"),
            reverse(col("n_name")).as("rev"),
            repeat(substring(col("n_name"), 1, 2), 2).as("rep2"))
          .orderBy(col("n_nationkey")),
      Some("""
        SELECT n_nationkey,
               -- DuckDB initcap keeps other chars; emulate Spark's
               -- word-wise titlecase over the lowercased name
               list_aggregate(list_transform(string_split(lower(n_name), ' '),
                 w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS pretty,
               lpad(n_name, 12, '.') AS padded,
               translate(n_name, 'AEIOU', 'aeiou') AS devoweled,
               regexp_replace(n_name, '[AEIOU]', '_', 'g') AS masked,
               string_split(n_name, 'A')[1] AS first_seg,
               CAST(instr(n_name, 'AN') AS BIGINT) AS an_pos,
               reverse(n_name) AS rev,
               repeat(n_name[1:2], 2) AS rep2
        FROM nation
        ORDER BY n_nationkey""")),

    QueryDef(
      "q17_minby_maxby",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            // struct-valued ordering key makes ties deterministic
            min_by(col("o_orderkey"),
              struct(col("o_totalprice"), col("o_orderkey"))).as("cheapest"),
            max_by(col("o_orderkey"),
              struct(col("o_totalprice"), col("o_orderkey"))).as("priciest"),
            round(min(col("o_totalprice")), 2).as("min_price"),
            round(max(col("o_totalprice")), 2).as("max_price"))
          .orderBy(col("o_orderpriority")),
      Some("""
        WITH r AS (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey) AS rn_min,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max
          FROM orders)
        SELECT o_orderpriority,
               MIN(CASE WHEN rn_min = 1 THEN o_orderkey END) AS cheapest,
               MIN(CASE WHEN rn_max = 1 THEN o_orderkey END) AS priciest,
               ROUND(MIN(o_totalprice), 2) AS min_price,
               ROUND(MAX(o_totalprice), 2) AS max_price
        FROM r
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    QueryDef(
      "q49_null_aggregates",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .withColumn("v", when(col("o_orderstatus") === "P", lit(null))
            .otherwise(col("o_totalprice")))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_all"),
            count(col("v")).as("n_nonnull"),
            round(sum(col("v")), 2).as("sum_v"),
            round(avg(col("v")), 4).as("avg_v"),
            count(when(col("v").isNull, 1)).as("n_null"),
            count(when(col("v") <=> lit(null), 1)).as("n_null_safe_eq"))
          .orderBy(col("o_orderpriority")),
      Some("""
        WITH t AS (
          SELECT o_orderpriority,
                 CASE WHEN o_orderstatus = 'P' THEN NULL
                      ELSE o_totalprice END AS v
          FROM orders)
        SELECT o_orderpriority,
               COUNT(*) AS n_all,
               COUNT(v) AS n_nonnull,
               ROUND(SUM(v), 2) AS sum_v,
               ROUND(AVG(v), 4) AS avg_v,
               COUNT(CASE WHEN v IS NULL THEN 1 END) AS n_null,
               COUNT(CASE WHEN v IS NOT DISTINCT FROM NULL THEN 1 END)
                 AS n_null_safe_eq
        FROM t
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    QueryDef(
      "q35_top_brand_per_region_year",
      (s, dir) => {
        val joined = Tables.load(s, dir, "lineitem")
          .join(Tables.load(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.load(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.load(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.load(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .join(broadcast(Tables.load(s, dir, "part")),
            col("l_partkey") === col("p_partkey"))
        val revenue = joined
          .groupBy(col("r_name"), year(col("o_orderdate")).as("yr"),
            col("p_brand"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        val w = Window.partitionBy(col("r_name"), col("yr"))
          .orderBy(col("revenue").desc, col("p_brand"))
        revenue
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .withColumn("yr", col("yr").cast("bigint"))
          .orderBy(col("r_name"), col("yr"))
      },
      Some("""
        WITH rev AS (
          SELECT r_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
                 p_brand,
                 ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          JOIN part ON l_partkey = p_partkey
          GROUP BY r_name, yr, p_brand),
        ranked AS (
          SELECT r_name, yr, p_brand, revenue,
                 ROW_NUMBER() OVER (PARTITION BY r_name, yr
                   ORDER BY revenue DESC, p_brand) AS rn
          FROM rev)
        SELECT r_name, yr, p_brand, revenue
        FROM ranked WHERE rn = 1
        ORDER BY r_name, yr"""),
      headline = true),

    QueryDef(
      "q36_cohort_retention",
      (s, dir) => {
        val monthly = Tables.load(s, dir, "events")
          .select(col("user_id"),
            (year(col("ts")) * 12 + month(col("ts"))).cast("bigint").as("mon"))
          .distinct()
        val cohorts = monthly.groupBy(col("user_id"))
          .agg(min(col("mon")).as("cohort"))
        monthly.join(cohorts, Seq("user_id"))
          .groupBy(col("cohort"), (col("mon") - col("cohort")).as("months_since"))
          .agg(count_distinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort"), col("months_since"))
      },
      Some("""
        WITH m AS (
          SELECT DISTINCT user_id,
                 CAST(EXTRACT(year FROM ts) * 12 + EXTRACT(month FROM ts)
                   AS BIGINT) AS mon
          FROM events),
        c AS (SELECT user_id, MIN(mon) AS cohort FROM m GROUP BY user_id)
        SELECT c.cohort, m.mon - c.cohort AS months_since,
               COUNT(DISTINCT m.user_id) AS n_users
        FROM m JOIN c ON m.user_id = c.user_id
        GROUP BY c.cohort, months_since
        ORDER BY c.cohort, months_since""")),

    // approximate aggregates: the SKETCH VALUES are engine-specific
    // (HLL++ / t-digest internals), so the oracle checks what approx
    // aggs actually promise — acceptance bounds against the exact
    // answer. The exact columns hash-match outright; the booleans are
    // deterministic (fixed sketch on fixed data) and the oracle
    // asserts them TRUE, so any accuracy regression past the bound
    // hash-fails the driver gate. Raw sketch error magnitudes are
    // additionally pinned in ApproxAggSpec.
    QueryDef(
      "q48_approx_aggs",
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count_distinct(col("l_partkey")).as("exact_parts"),
            (abs(approx_count_distinct(col("l_partkey"))
              - count_distinct(col("l_partkey"))).cast("double")
              / count_distinct(col("l_partkey")).cast("double") <= 0.05)
              .as("hll_within_5pct"),
            expr("percentile(l_extendedprice, 0.5)").as("exact_median"),
            (abs(expr("approx_percentile(l_extendedprice, 0.5, 10000)")
              - expr("percentile(l_extendedprice, 0.5)"))
              / expr("percentile(l_extendedprice, 0.5)") <= 0.01)
              .as("tdigest_within_1pct"))
          .select(col("l_returnflag"), col("exact_parts"),
            col("hll_within_5pct"),
            round(col("exact_median"), 4).as("exact_median"),
            col("tdigest_within_1pct"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               TRUE AS hll_within_5pct,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median,
               TRUE AS tdigest_within_1pct
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""))
  )
}
