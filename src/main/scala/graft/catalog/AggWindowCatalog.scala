package graft.catalog

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** SURVEY §2.4 aggregations, §2.5 windows, §2.6 sorts/limits.
  *
  * All aggregates are partial-aggregation-friendly (plain hash aggregates);
  * window dedups shuffle exactly once on their partition key. Money sums are
  * DECIMAL(18,2) internally (SURVEY §4d), cast to DOUBLE at the output
  * boundary — the driver's pandas compare renders Spark DECIMAL as
  * object(Decimal) ('123.40') but DuckDB DECIMAL as float64 ('123.4'), so a
  * final DECIMAL column hash-mismatches on any trailing-zero value.
  */
object AggWindowCatalog {
  private val D = "decimal(18,2)"

  val all: Seq[QueryDef] = Seq(

    // ---- A1/A2: monthly net with category-exclusion + date filter ---------
    QueryDef(
      "a2_monthly_net",
      "SURVEY §2.4 A1/A2 GROUP BY date_trunc('month') SUM with NOT IN category filter (02_net_change_by_month.ipynb)",
      Some("""
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS net_amount
        FROM orders
        WHERE o_orderpriority NOT IN ('4-NOT SPECIFIED', '5-LOW')
          AND o_orderdate >= TIMESTAMP '1996-06-01 00:00:00'
        GROUP BY 1
      """)) { (spark, dir) =>
      Tables.orders(spark, dir)
        .filter(!col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")
          && col("o_orderdate") >= lit("1996-06-01 00:00:00").cast("timestamp_ntz"))
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(sum(col("o_totalprice").cast(D)).cast("double").as("net_amount"))
    },

    // ---- A3: yearly net by category ---------------------------------------
    QueryDef(
      "a3_yearly_by_category",
      "SURVEY §2.4 A3 groupby(year, category).sum (01_m_and_a_charts.ipynb)",
      Some("""
        SELECT year(o_orderdate) AS year,
               o_orderpriority AS category,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY 1, 2
      """)) { (spark, dir) =>
      Tables.orders(spark, dir)
        .groupBy(year(col("o_orderdate")).as("year"), col("o_orderpriority").as("category"))
        .agg(sum(col("o_totalprice").cast(D)).cast("double").as("total"))
    },

    // ---- A4: pivot period × category with fill 0 --------------------------
    QueryDef(
      "a4_pivot_year_status",
      "SURVEY §2.4 A4 pivot_table(index=year, columns=category, fill_value=0) (00 nb cell 8, 01 cell 5)",
      Some("""
        SELECT year(o_orderdate) AS year,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS "F",
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS "O",
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS "P"
        FROM orders
        GROUP BY 1
      """)) { (spark, dir) =>
      val pivoted = Tables.orders(spark, dir)
        .groupBy(year(col("o_orderdate")).as("year"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))   // value list given → no extra scan
        .agg(sum(col("o_totalprice").cast(D)).cast("double"))
      pivoted.na.fill(0.0, Seq("F", "O", "P"))
    },

    // ---- A4 quarterly variant ---------------------------------------------
    QueryDef(
      "a4_quarterly_pivot",
      "SURVEY §2.4 A4 to_period('Q') quarterly bucketing (01 nb cell 11)",
      Some("""
        SELECT CAST(year(o_orderdate) AS VARCHAR) || '-Q' || CAST(quarter(o_orderdate) AS VARCHAR) AS quarter,
               o_orderstatus AS category,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY 1, 2
      """)) { (spark, dir) =>
      Tables.orders(spark, dir)
        .groupBy(
          concat(year(col("o_orderdate")).cast("string"), lit("-Q"),
            quarter(col("o_orderdate")).cast("string")).as("quarter"),
          col("o_orderstatus").as("category"))
        .agg(sum(col("o_totalprice").cast(D)).cast("double").as("total"))
    },

    // ---- A5/W6: cumulative sum over ordered months ------------------------
    QueryDef(
      "a5_cumulative_savings",
      "SURVEY §2.4 A5 / §2.5 W6 running total over monthly net (02 nb cell 8)",
      Some("""
        SELECT month,
               CAST(net AS DOUBLE) AS net,
               CAST(SUM(net) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cumulative
        FROM (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                     SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS net
              FROM orders GROUP BY 1)
      """)) { (spark, dir) =>
      val monthly = Tables.orders(spark, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(sum(col("o_totalprice").cast(D)).as("net"))
      // Single-partition window is fine: cardinality = #months, tiny by
      // construction; the heavy lifting happened in the distributed groupBy.
      // Running total stays decimal (exact) and is double-cast only on output.
      // The constant partition key keeps semantics identical (one partition
      // either way) while silencing WindowExec's "No Partition Defined"
      // warning — that channel should only fire on UNBOUNDED inputs. A bare
      // lit(0) would be stripped by Spark 4's EliminateWindowPartitions
      // (foldable keys are removed) and x*0 over a non-nullable column
      // folds to 0, so the constant rides pmod(·, 1) — always 0, no
      // simplification rule, hence never stripped.
      val w = Window
        .partitionBy(coalesce(pmod(year(col("month")), lit(1)), lit(0)))
        .orderBy(col("month"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly.select(col("month"), col("net").cast("double").as("net"),
        sum(col("net")).over(w).cast("double").as("cumulative"))
    },

    // ---- A6/A7: per-entity health stats ------------------------------------
    QueryDef(
      "a6_account_health",
      "SURVEY §2.4 A6/A7 per-account MIN/MAX/COUNT freshness stats (control_center.py:77-128)",
      Some("""
        SELECT o_custkey,
               MIN(CAST(o_orderdate AS DATE)) AS first_date,
               MAX(CAST(o_orderdate AS DATE)) AS last_date,
               COUNT(*) AS txn_count,
               COUNT(DISTINCT o_orderstatus) AS status_count
        FROM orders
        GROUP BY o_custkey
      """)) { (spark, dir) =>
      Tables.orders(spark, dir)
        .groupBy(col("o_custkey"))
        .agg(
          min(col("o_orderdate").cast("date")).as("first_date"),
          max(col("o_orderdate").cast("date")).as("last_date"),
          count(lit(1)).as("txn_count"),
          countDistinct(col("o_orderstatus")).as("status_count"))
    },

    // ---- A8: pagination count twin -----------------------------------------
    QueryDef(
      "a8_filtered_count",
      "SURVEY §2.4 A8 COUNT(*) twin of a filtered page query (transaction_service.py:205-207)",
      Some("""
        SELECT COUNT(*) AS total
        FROM lineitem
        WHERE l_returnflag = 'R' AND l_quantity > 25
      """)) { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 25)
        .agg(count(lit(1)).as("total"))
    },

    // ---- A9: DISTINCT category list ----------------------------------------
    QueryDef(
      "a9_distinct_categories",
      "SURVEY §2.4 A9 DISTINCT category lists (category_service.py:13-31)",
      Some("""
        SELECT DISTINCT o_orderpriority AS category
        FROM orders
        WHERE o_orderstatus <> 'P'
      """)) { (spark, dir) =>
      Tables.orders(spark, dir)
        .filter(col("o_orderstatus") =!= "P")
        .select(col("o_orderpriority").as("category"))
        .distinct()
    },

    // ---- A10: label distribution -------------------------------------------
    QueryDef(
      "a10_class_distribution",
      "SURVEY §2.4 A10 value_counts / min-per-class gate (classifier_train.py:174-182)",
      Some("""
        SELECT label, COUNT(*) AS n
        FROM embeddings
        GROUP BY label
      """)) { (spark, dir) =>
      Tables.embeddings(spark, dir).groupBy(col("label")).agg(count(lit(1)).as("n"))
    },

    // ---- W1/W5: latest-row dedup via row_number ----------------------------
    QueryDef(
      "w1_latest_dedup",
      "SURVEY §2.5 W1/W5 row_number() PARTITION BY id ORDER BY ts DESC keep rn=1 (stg_simplefin.sql:39-42, stg_predictions.sql:17-24)",
      Some("""
        SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
        FROM (SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice,
                     ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                        ORDER BY l_shipdate DESC, l_linenumber DESC,
                                                 l_extendedprice DESC, l_partkey DESC) AS rn
              FROM lineitem)
        WHERE rn = 1
      """)) { (spark, dir) =>
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus —
      // the ORDER BY must be a total order or the kept row is nondeterministic.
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_shipdate").desc, col("l_linenumber").desc,
          col("l_extendedprice").desc, col("l_partkey").desc)
      Tables.lineitem(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_extendedprice"))
    },

    // ---- W5: latest-prediction dedup on a compound key ---------------------
    QueryDef(
      "w5_latest_prediction_dedup",
      "SURVEY §2.5 W5 one row per key by newest prediction_timestamp (stg_predictions.sql:17-24) — compound key + ts-desc row_number over events",
      Some("""
        SELECT user_id, event_type, ts, value
        FROM (SELECT user_id, event_type, ts, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
      """)) { (spark, dir) =>
      // W5 vs W1: the dedup key is compound (transaction_id alone in the
      // reference, but the predictions table arrives keyed per model run —
      // here (user_id, event_type)) and the order column is a true event-time
      // timestamp, not a business date. event_id desc makes the kept row
      // deterministic under equal timestamps.
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("ts"), col("value"))
    },

    // ---- W3+W4: the two-step reconnection dedup ----------------------------
    QueryDef(
      "w3w4_reconnection_dedup",
      "SURVEY §2.5 W3+W4 max-over-partition then dense_rank keep rank=1: drop cross-account re-imports, keep legit same-key repeats (stg_simplefin.sql:86-138)",
      Some("""
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_shipdate
        FROM (
          SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_shipdate,
                 DENSE_RANK() OVER (PARTITION BY l_orderkey, l_partkey
                                    ORDER BY last_seen DESC, l_suppkey) AS rk
          FROM (
            SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_shipdate,
                   MAX(l_shipdate) OVER (PARTITION BY l_orderkey, l_partkey, l_suppkey) AS last_seen
            FROM lineitem))
        WHERE rk = 1
      """)) { (spark, dir) =>
      // Logical txn key = (orderkey, partkey); "account_id" analog = suppkey;
      // "import ts" = shipdate. Step 1 (W3): newest sighting per (key, account).
      // Step 2 (W4): dense_rank keeps ALL rows of the winning account —
      // deliberately preserving legitimate duplicates within it — and drops
      // re-imports under other accounts. The explicit repartition on the
      // SHARED 2-col prefix makes ONE exchange satisfy both windows (subset
      // partitioning satisfies superset clustering); without it Catalyst
      // plans W3 on the 3-col key and must re-shuffle for W4.
      val w3 = Window.partitionBy(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      val w4 = Window.partitionBy(col("l_orderkey"), col("l_partkey"))
        .orderBy(col("last_seen").desc, col("l_suppkey"))
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_shipdate"))
        .repartition(col("l_orderkey"), col("l_partkey"))
        .withColumn("last_seen", max(col("l_shipdate")).over(w3))
        .withColumn("rk", dense_rank().over(w4))
        .filter(col("rk") === 1)
        .drop("last_seen", "rk")
    },

    // ---- O1/O2: whitelisted sort + NULLS LAST + offset/limit pagination ----
    QueryDef(
      "o1_sorted_page",
      "SURVEY §2.6 O1/O2 dynamic sort, explicit NULLS LAST, LIMIT/OFFSET page (transaction_service.py:196-213)",
      Some("""
        SELECT o_orderkey, CAST(sort_amt AS DOUBLE) AS sort_amt
        FROM (SELECT o_orderkey, sort_amt
              FROM (SELECT o_orderkey,
                           CASE WHEN o_orderstatus = 'P' THEN NULL
                                ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS sort_amt
                    FROM orders)
              ORDER BY sort_amt DESC NULLS LAST, o_orderkey
              LIMIT 50 OFFSET 100)
      """)) { (spark, dir) =>
      // PG `DESC NULLS LAST` made explicit (Spark desc default is nulls-last,
      // but asc default is nulls-FIRST — always spell it out, SURVEY §4b).
      // Page selection orders on the exact decimal; double-cast only the
      // projected output of the already-selected 50 rows.
      Tables.orders(spark, dir)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "P", lit(null).cast(D))
            .otherwise(col("o_totalprice").cast(D)).as("sort_amt"))
        .orderBy(col("sort_amt").desc_nulls_last, col("o_orderkey").asc_nulls_last)
        .offset(100).limit(50)
        .select(col("o_orderkey"), col("sort_amt").cast("double").as("sort_amt"))
    },

    // ---- O3: top-1 latest row ---------------------------------------------
    QueryDef(
      "o3_latest_model",
      "SURVEY §2.6 O3 ORDER BY ts DESC LIMIT 1 active-model pick (classifier_predict.py:33-84)",
      Some("""
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 1
      """)) { (spark, dir) =>
      Tables.orders(spark, dir)
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .limit(1)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    },

    // ---- W7: event-gap detection -------------------------------------------
    // The monitoring twin of i3's SCD2 lead(): per-key consecutive-event
    // deltas, keeping only gaps over a threshold — how a pipeline detects
    // connector outages, silent sources, and ingestion stalls (the batch
    // analog of a missed-heartbeat alert; the reference's connection-health
    // check infers the same thing from lookback windows,
    // connection_health.py:27-123). One window over the (user, ts)
    // shuffle, one filter — no self-join, state O(1) per row. At 100 TB
    // the partition key (user/source/connector id) keeps the sort local
    // to each key's rows.
    QueryDef(
      "w7_gap_detection",
      "Per-user event-gap report: lead() over (user_id, ts), keep gaps > 48 h with start/end/duration — the missed-heartbeat/outage detector as one window pass",
      Some("""
        SELECT user_id, gap_start, gap_end,
               CAST(date_diff('second', gap_start, gap_end) AS BIGINT) AS gap_seconds
        FROM (
          SELECT user_id, ts AS gap_start,
                 LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_end
          FROM events)
        WHERE gap_end IS NOT NULL
          AND date_diff('second', gap_start, gap_end) > 172800
      """)) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts").as("gap_start"),
          lead(col("ts"), 1).over(byUser).as("gap_end"))
        .filter(col("gap_end").isNotNull)
        .withColumn("gap_seconds",
          (unix_timestamp(col("gap_end")) - unix_timestamp(col("gap_start"))))
        .filter(col("gap_seconds") > 172800)
    },

    // ---- W8: the full ranking-function family -------------------------------
    // rank / dense_rank / percent_rank / cume_dist / ntile in one window —
    // the remaining SQL ranking surface beyond row_number (W1/W2/O-series).
    // All five ride the SAME (partition, order) specification, so Catalyst
    // plans ONE exchange and one sort for the lot. percent_rank and
    // cume_dist are doubles, but derived as single divisions of exact
    // integer ranks — cross-engine identical. Ties are real (duplicate
    // o_totalprice values exist), pinning the rank-vs-dense_rank gap
    // semantics, and the unique orderkey tiebreak keeps ntile assignment
    // deterministic.
    QueryDef(
      "w8_rank_functions",
      "rank/dense_rank/percent_rank/cume_dist over a TIED ordering (floor-bucketed price — the rank-gap semantics are real) + ntile(4) over the unique total order; one partitioning serves both windows; ratio doubles exact from integer ranks",
      Some("""
        SELECT o_orderkey, o_orderpriority,
               RANK() OVER wt AS rnk,
               DENSE_RANK() OVER wt AS drnk,
               PERCENT_RANK() OVER wt AS prnk,
               CUME_DIST() OVER wt AS cdist,
               NTILE(4) OVER wu AS quartile
        FROM orders
        WHERE o_orderkey % 11 = 0
        WINDOW wt AS (PARTITION BY o_orderpriority
                      ORDER BY FLOOR(o_totalprice / 1000) DESC),
               wu AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey)
      """)) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      // tied ordering: ranks are functions of the key only, so tied rows
      // get IDENTICAL outputs — deterministic without a tiebreak; ntile
      // splits ties arbitrarily, so it gets the unique total order instead
      val wt = Window.partitionBy(col("o_orderpriority"))
        .orderBy(floor(col("o_totalprice") / 1000).desc)
      val wu = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(spark, dir)
        .filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          rank().over(wt).as("rnk"),
          dense_rank().over(wt).as("drnk"),
          percent_rank().over(wt).as("prnk"),
          cume_dist().over(wt).as("cdist"),
          ntile(4).over(wu).as("quartile"))
    },

    // ---- W9: time-RANGE window frame ---------------------------------------
    // The rolling-window shape the ROWS-frame family can't express: "trailing
    // 30 days of revenue per customer" must bound the frame by the ORDER
    // VALUE (dates), not a row count — sparse/bursty order histories make
    // ROWS BETWEEN N PRECEDING wrong. Spark's rangeBetween needs a numeric
    // order column, so the date becomes epoch-days (unix_date) with a
    // [-29, 0] frame ≡ DuckDB's RANGE BETWEEN INTERVAL 29 DAY PRECEDING.
    // Determinism: RANGE frames include ALL peer rows of the current order
    // value on both engines, so same-day ties share identical sums and no
    // tiebreak is needed; the money sum accumulates in DECIMAL and casts to
    // DOUBLE once at the boundary. One hash exchange on o_custkey + one
    // in-partition sort — the standard distributed window shape.
    QueryDef(
      "w9_rolling_range",
      "Time-RANGE window frame: per-customer trailing-30-day revenue — epoch-day rangeBetween(-29,0) ≡ RANGE BETWEEN INTERVAL 29 DAY PRECEDING, DECIMAL accumulation, peer-inclusive and tie-proof",
      Some("""
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS rolling_30d
        FROM orders
      """)) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      // o_orderdate is TIMESTAMP_NTZ midnight-pinned in the fixtures, so
      // epoch-DAY framing is exact; a true time-of-day feed would order by
      // epoch seconds with a seconds-denominated frame instead
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_date(to_date(col("o_orderdate"))))
        .rangeBetween(-29, 0)
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("rolling_30d"))
    },

    // ---- W10: maximum drawdown (nested running aggregates) -----------------
    // The window-COMPOSITION shape the catalog's single running sums (a5,
    // w9) don't exercise: a running sum, a running max OF that sum, their
    // difference, and a final per-key max — the financial max-drawdown /
    // high-water-mark statistic. Signed series from order status (F = out-
    // flow) so drawdowns are real, not structurally zero. Everything
    // accumulates in DECIMAL: a double running sum would hash-diverge —
    // engines disagree on windowed-aggregate ADDITION ORDER (sequential
    // fold vs segment tree), which exact decimal is immune to. Both
    // windows share one (o_custkey, date, key) partitioning+sort, so the
    // plan pays ONE exchange and one sort; the final max is an ordinary
    // partial-aggregated groupBy.
    QueryDef(
      "w10_max_drawdown",
      "Per-customer maximum drawdown over the signed order series: running DECIMAL sum, running max of the sum, peak-minus-current, final per-key max — two stacked window frames over one partitioning+sort, exact decimal throughout",
      Some("""
        WITH seq AS (
          SELECT o_custkey, o_orderdate, o_orderkey,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))
                     * CASE WHEN o_orderstatus = 'F' THEN -1 ELSE 1 END)
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                   AS run_sum
          FROM orders),
        dd AS (
          SELECT o_custkey,
                 MAX(run_sum) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - run_sum AS drawdown
          FROM seq)
        SELECT o_custkey, CAST(MAX(drawdown) AS DOUBLE) AS max_drawdown
        FROM dd GROUP BY 1
      """)) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val order = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val signed = col("o_totalprice").cast("decimal(18,2)")
        .multiply(when(col("o_orderstatus") === "F", -1).otherwise(1))
      val seq = Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          sum(signed).over(order).as("run_sum"))
      val runMax = max(col("run_sum")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      seq.select(col("o_custkey"), (runMax - col("run_sum")).as("drawdown"))
        .groupBy(col("o_custkey"))
        .agg(max(col("drawdown")).cast("double").as("max_drawdown"))
    },

    // ---- W11: exact rolling 7-day uniques ----------------------------------
    // Rolling WAU — distinct users over each trailing 7-day window. A
    // windowed COUNT(DISTINCT) doesn't exist (neither engine supports it
    // over frames, and per-frame distinct state is the scale trap anyway);
    // the distributed statement is dedup-then-BOUNDED-fanout: reduce to
    // distinct (day, user) pairs first (events → at most days×users rows),
    // fan each pair to the ≤7 target days it can serve, and count distinct
    // per target day. Fanout is a constant 7× of the DEDUPED stream, never
    // of the event volume — at 100 TB the heavy dedup happens at full
    // parallelism before any window-shaped work exists. Target days
    // restricted to OBSERVED days so the tail doesn't invent empty dates.
    QueryDef(
      "w11_rolling_uniques",
      "Exact trailing-7-day distinct users per observed day (rolling WAU): dedup to (day, user) first, bounded 7-way fanout to target days, two-phase distinct count — no per-frame distinct state, fanout scales with the deduped stream",
      Some("""
        WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        fan AS (
          SELECT CAST(du.day + TO_DAYS(CAST(o.o AS INTEGER)) AS DATE) AS target_day,
                 du.user_id
          FROM du, unnest(range(0, 7)) AS o(o)),
        days AS (SELECT DISTINCT day FROM du)
        SELECT f.target_day AS day, COUNT(DISTINCT f.user_id) AS uniques_7d
        FROM fan f JOIN days d ON f.target_day = d.day
        GROUP BY 1
      """)) { (spark, dir) =>
      val du = Tables.events(spark, dir)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val fan = du
        .select(col("day"), col("user_id"),
          explode(sequence(lit(0), lit(6))).as("o"))
        .select(date_add(col("day"), col("o")).as("target_day"), col("user_id"))
      val days = du.select(col("day")).distinct()
      fan.join(broadcast(days), col("target_day") === col("day"))
        .groupBy(col("target_day").as("day"))
        .agg(count_distinct(col("user_id")).as("uniques_7d"))
    },

    // ---- W12: recency-decayed engagement score ------------------------------
    // The feature-engineering staple no plain window expresses: a per-user
    // engagement score where yesterday counts half of today — recommender /
    // churn features, exponential-decay counters. A true running EWMA is
    // sequential per key (each step divides the previous), which neither
    // engine can hash-compare in doubles; the ENGINE-EXACT statement is the
    // closed form: each event contributes value_cents div 2^days_ago —
    // per-element truncating integer halving, so every contribution is an
    // independent pure function of the row and the integer SUM is
    // commutative (no order, no doubles). The anchor day is one fixed-size
    // reduction embedded as a literal (the t8 stats posture); 2^d is exact
    // in double to 2^53, days capped at 40 where contributions are long
    // since zero. Map-only per event + one user-keyed aggregate.
    QueryDef(
      "w12_decayed_engagement",
      "Recency-decayed per-user engagement: each event contributes floor(cents / 2^days_before_anchor) — exact integer halving per day of age, commutative sums, anchor = max event day embedded as a literal; map-only + one keyed aggregate",
      Some("""
        WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS d0 FROM events),
        c AS (
          SELECT user_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT)
                   // CAST(power(2, LEAST(datediff('day', CAST(ts AS DATE), anchor.d0), 40)) AS BIGINT)
                   AS contrib,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events CROSS JOIN anchor)
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(contrib) AS BIGINT) AS decayed_cents,
               CAST(SUM(cents) AS BIGINT) AS total_cents
        FROM c GROUP BY 1
      """)) { (spark, dir) =>
      val e = Tables.events(spark, dir)
      val d0 = e.agg(max(to_date(col("ts")))).head.getDate(0)
      val days = least(datediff(lit(d0), to_date(col("ts"))), lit(40))
      val cents = floor(col("value") * 100 + 0.5).cast("long")
      e.select(col("user_id"), cents.as("cents"),
          pow(lit(2.0), days).cast("long").as("pow2"))
        .select(col("user_id"), col("cents"),
          expr("cents div pow2").as("contrib"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("contrib")).as("decayed_cents"),
          sum(col("cents")).as("total_cents"))
    })
}
