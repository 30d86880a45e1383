package graft.catalog

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.io.Tables

/** SURVEY §2.3 joins. Small dimension/mapping sides are explicitly
  * `broadcast()` (SURVEY §4: seed/mapping/pattern tables J1-J3) so no
  * shuffle is induced on the fact side at any scale.
  */
object JoinCatalog {
  private val D = "decimal(18,2)"

  val all: Seq[QueryDef] = Seq(

    // ---- J1/J2 + P3: conditional compound-key mapping join ---------------
    QueryDef(
      "j1_conditional_mapping_join",
      "SURVEY §2.3 J1/J2 LEFT JOIN on name AND (map key null/empty OR equal) + §2.2 P3 coalesce fallback (stg_simplefin.sql:23-50)",
      Some("""
        SELECT c.c_custkey,
               COALESCE(m.mapped_name, c.c_mktsegment, 'Missing mapping!') AS account_name
        FROM customer c
        LEFT OUTER JOIN (VALUES
            ('BUILDING',  CAST(NULL AS INTEGER), 'Building (all nations)'),
            ('MACHINERY', 3,                     'Machinery (nation 3)'),
            ('MACHINERY', 7,                     'Machinery (nation 7)')
          ) AS m(segment, nationkey, mapped_name)
          ON c.c_mktsegment = m.segment
         AND (m.nationkey IS NULL OR m.nationkey = c.c_nationkey)
      """)) { (spark, dir) =>
      val mapping = spark.createDataFrame(
        java.util.Arrays.asList(
          Row("BUILDING", null, "Building (all nations)"),
          Row("MACHINERY", Integer.valueOf(3), "Machinery (nation 3)"),
          Row("MACHINERY", Integer.valueOf(7), "Machinery (nation 7)")),
        StructType(Seq(
          StructField("segment", StringType),
          StructField("nationkey", IntegerType),
          StructField("mapped_name", StringType))))
      val c = Tables.customer(spark, dir)
      c.join(broadcast(mapping),
          c("c_mktsegment") === mapping("segment")
            && (mapping("nationkey").isNull || mapping("nationkey") === c("c_nationkey")),
          "left_outer")
        .select(c("c_custkey"),
          coalesce(col("mapped_name"), c("c_mktsegment"), lit("Missing mapping!")).as("account_name"))
    },

    // ---- J2: historic mapping join (empty-string wildcard + dual coalesce) -
    QueryDef(
      "j2_historic_mapping_join",
      "SURVEY §2.3 J2 historic mapping: info NULL OR '' OR equal wildcard, coalesce chains on two output columns (stg_historic_trxns.sql:10-34)",
      Some("""
        SELECT c.c_custkey,
               COALESCE(m.mapped_name, c.c_mktsegment, 'Missing mapping!') AS account_name,
               COALESCE(m.owner_name, c.c_mktsegment, 'Missing mapping!') AS owner_name
        FROM customer c
        LEFT OUTER JOIN (VALUES
            ('BUILDING',   '',                 'Building (any nation)',  'Shared'),
            ('AUTOMOBILE', '5',                'Automobile (nation 5)',  CAST(NULL AS VARCHAR)),
            ('FURNITURE',  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'Estate')
          ) AS m(segment, additional_info, mapped_name, owner_name)
          ON c.c_mktsegment = m.segment
         AND (m.additional_info IS NULL OR m.additional_info = ''
              OR CAST(c.c_nationkey AS VARCHAR) = m.additional_info)
      """)) { (spark, dir) =>
      // J2 differs from J1 in two reference-visible ways this entry pins:
      // the wildcard branch treats empty string like NULL
      // (stg_historic_trxns.sql), and BOTH account_name and owner_name fall
      // back through their own coalesce chain — a mapping row may supply one
      // and not the other.
      val m = spark.createDataFrame(
        java.util.Arrays.asList(
          Row("BUILDING", "", "Building (any nation)", "Shared"),
          Row("AUTOMOBILE", "5", "Automobile (nation 5)", null),
          Row("FURNITURE", null, null, "Estate")),
        StructType(Seq(
          StructField("segment", StringType),
          StructField("additional_info", StringType),
          StructField("mapped_name", StringType),
          StructField("owner_name", StringType))))
      val c = Tables.customer(spark, dir)
      c.join(broadcast(m),
          c("c_mktsegment") === m("segment")
            && (m("additional_info").isNull || m("additional_info") === ""
              || c("c_nationkey").cast("string") === m("additional_info")),
          "left_outer")
        .select(c("c_custkey"),
          coalesce(m("mapped_name"), c("c_mktsegment"), lit("Missing mapping!")).as("account_name"),
          coalesce(m("owner_name"), c("c_mktsegment"), lit("Missing mapping!")).as("owner_name"))
    },

    // ---- J5: validated-only filter + feature join + category override -----
    QueryDef(
      "j5_validated_feature_join",
      "SURVEY §2.3 J5 + §2.2 P10/P11: validated-only filter, LEFT JOIN onto features, user-over-derived category coalesce (stg_user_validated_categories.sql:8-31)",
      Some("""
        SELECT o.o_orderkey,
               c.c_name,
               c.c_acctbal,
               COALESCE(CASE WHEN o.o_orderpriority = '3-MEDIUM' THEN NULL
                             ELSE o.o_orderpriority END,
                        c.c_mktsegment) AS master_category
        FROM orders o
        LEFT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'F'
      """)) { (spark, dir) =>
      // The reference shape: the user-side table is FILTERED to validated
      // rows first (P10), then left-joined to the wide feature mart (J5),
      // and the user's category wins over the derived one only when set
      // (P11). '3-MEDIUM' plays the unset-category NULL here.
      val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      val c = Tables.customer(spark, dir)
      val userCat = when(col("o_orderpriority") === "3-MEDIUM", lit(null).cast("string"))
        .otherwise(col("o_orderpriority"))
      o.join(c, o("o_custkey") === c("c_custkey"), "left_outer")
        .select(o("o_orderkey"), c("c_name"), c("c_acctbal"),
          coalesce(userCat, c("c_mktsegment")).as("master_category"))
    },

    // ---- J4/J5/J6: plain left-outer equi join ----------------------------
    QueryDef(
      "j4_left_outer_equi",
      "SURVEY §2.3 J4/J5/J6 LEFT OUTER equi join on id (fct_trxns_with_predictions.sql:12-39)",
      Some("""
        SELECT o.o_orderkey,
               o.o_totalprice,
               c.c_name,
               c.c_mktsegment
        FROM orders o
        LEFT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
      """)) { (spark, dir) =>
      val o = Tables.orders(spark, dir)
      val c = Tables.customer(spark, dir)
      // no broadcast hint: customer grows with SF — AQE picks broadcast at
      // small scale and shuffled join when the build side outgrows it
      o.join(c, o("o_custkey") === c("c_custkey"), "left_outer")
        .select(o("o_orderkey"), o("o_totalprice"), c("c_name"), c("c_mktsegment"))
    },

    // ---- J6: THE serving read join, through Serving.servingJoin ----------
    // j4 gates the join SHAPE; this entry gates the actual serving-layer
    // function (`transaction_service.py:14-17`): predictions view LEFT
    // JOIN live user_categories overrides, overrides renamed uc_* so the
    // view-mode predicates can tell live validation from modeled columns.
    // Orders plays fct_trxns_with_predictions; the sparse override side is
    // the k%7=3 slice (most transactions have no user row — exactly the
    // reference's cardinality regime).
    QueryDef(
      "j6_serving_read_join",
      "SURVEY §2.3 J6 serving read join via Serving.servingJoin (transaction_service.py:14-17): predictions LEFT JOIN sparse user_categories overrides, uc_* renames",
      Some("""
        WITH t AS (
          SELECT o_orderkey AS transaction_id,
                 o_totalprice AS amount,
                 o_orderstatus AS predicted_master_category
          FROM orders),
        uc AS (
          SELECT o_orderkey AS transaction_id,
                 o_orderstatus = 'F' AS validated,
                 o_orderpriority AS master_category,
                 CAST(o_custkey AS VARCHAR) AS notes
          FROM orders WHERE o_orderkey % 7 = 3)
        SELECT t.transaction_id, t.amount, t.predicted_master_category,
               uc.validated AS uc_validated,
               uc.master_category AS uc_master_category,
               uc.notes AS uc_notes
        FROM t LEFT OUTER JOIN uc USING (transaction_id)
      """)) { (spark, dir) =>
      val orders = Tables.orders(spark, dir)
      val withPredictions = orders.select(
        col("o_orderkey").as("transaction_id"),
        col("o_totalprice").as("amount"),
        col("o_orderstatus").as("predicted_master_category"))
      val userCategories = orders.filter(col("o_orderkey") % 7 === 3).select(
        col("o_orderkey").as("transaction_id"),
        (col("o_orderstatus") === "F").as("validated"),
        col("o_orderpriority").as("master_category"),
        col("o_custkey").cast("string").as("notes"))
      graft.finance.Serving.servingJoin(withPredictions, userCategories)
    },

    // ---- J7: latest-import self-join via window max ----------------------
    QueryDef(
      "j7_latest_import_rows",
      "SURVEY §2.3 J7 inner join vs GROUP BY MAX(ts) → window max + filter (control_center.py:77-93)",
      Some("""
        SELECT l_orderkey, l_linenumber, l_shipdate
        FROM (SELECT l_orderkey, l_linenumber, l_shipdate,
                     MAX(l_shipdate) OVER (PARTITION BY l_orderkey) AS max_ship
              FROM lineitem)
        WHERE l_shipdate = max_ship
      """)) { (spark, dir) =>
      // Window-max + filter instead of the reference's aggregate self-join:
      // one shuffle on the partition key, no second scan of the fact table.
      val w = Window.partitionBy(col("l_orderkey"))
      Tables.lineitem(spark, dir)
        .withColumn("max_ship", max(col("l_shipdate")).over(w))
        .filter(col("l_shipdate") === col("max_ship"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    },

    // ---- J8: null-safe equality join --------------------------------------
    QueryDef(
      "j8_nullsafe_join",
      "SURVEY §2.3 J8 IS NOT DISTINCT FROM join → <=> (control_center.py:123-126)",
      Some("""
        WITH a AS (SELECT o_orderkey,
                          CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderpriority END AS pri,
                          o_totalprice
                   FROM orders WHERE o_orderkey % 10 = 1),
             b AS (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderpriority END AS pri,
                          COUNT(*) AS n
                   FROM orders GROUP BY 1)
        SELECT a.o_orderkey, a.pri, a.o_totalprice, b.n
        FROM a INNER JOIN b ON a.pri IS NOT DISTINCT FROM b.pri
      """)) { (spark, dir) =>
      val pri = when(col("o_orderstatus") === "P", lit(null).cast("string"))
        .otherwise(col("o_orderpriority"))
      val orders = Tables.orders(spark, dir)
      val a = orders.filter(col("o_orderkey") % 10 === 1)
        .select(col("o_orderkey"), pri.as("pri"), col("o_totalprice"))
      val b = orders.select(pri.as("pri")).groupBy(col("pri")).agg(count(lit(1)).as("n"))
      a.join(broadcast(b), a("pri") <=> b("pri"), "inner")
        .select(a("o_orderkey"), a("pri"), a("o_totalprice"), b("n"))
    },

    // ---- J9: NOT IN membership → left-anti join ---------------------------
    QueryDef(
      "j9_not_in_anti_join",
      "SURVEY §2.3 J9 NOT IN guards → left_anti (fct_validated_trxns.sql:16-18, fct_trxns_uncategorized.sql:11-23)",
      Some("""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
      """)) { (spark, dir) =>
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir)
            .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    // ---- §2.8: incremental append-only merge ------------------------------
    QueryDef(
      "i1_incremental_append",
      "SURVEY §2.8 append-only incremental: target ∪ (incoming anti-join target by key) (fct_validated_trxns.sql:13-19)",
      Some("""
        WITH target AS (
          SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount, 'existing' AS provenance
          FROM orders WHERE o_orderstatus = 'F'),
        incoming AS (
          SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount, 'incremental' AS provenance
          FROM orders WHERE o_totalprice > 100000)
        SELECT * FROM target
        UNION ALL
        SELECT i.* FROM incoming i
        WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.o_orderkey = i.o_orderkey)
      """)) { (spark, dir) =>
      val orders = Tables.orders(spark, dir)
      val target = orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice").cast(D).cast("double").as("amount"),
          lit("existing").as("provenance"))
      val incoming = orders.filter(col("o_totalprice") > 100000)
        .select(col("o_orderkey"), col("o_totalprice").cast(D).cast("double").as("amount"),
          lit("incremental").as("provenance"))
      val fresh = incoming.join(target.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      target.unionByName(fresh)
    },

    // ---- §2.8: delete-then-append upsert by id ----------------------------
    QueryDef(
      "i2_upsert_by_key",
      "SURVEY §2.8 predicted_transactions delete+insert upsert → anti-join old ∪ new (classifier_predict.py:149-170)",
      Some("""
        WITH old AS (
          SELECT o_orderkey, o_orderpriority AS category, 'v1' AS model_version
          FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        fresh AS (
          SELECT o_orderkey, o_orderstatus AS category, 'v2' AS model_version
          FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
        SELECT o.* FROM old o
        WHERE NOT EXISTS (SELECT 1 FROM fresh f WHERE f.o_orderkey = o.o_orderkey)
        UNION ALL
        SELECT * FROM fresh
      """)) { (spark, dir) =>
      val orders = Tables.orders(spark, dir)
      val old = orders.filter(col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        .select(col("o_orderkey"), col("o_orderpriority").as("category"), lit("v1").as("model_version"))
      val fresh = orders.filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        .select(col("o_orderkey"), col("o_orderstatus").as("category"), lit("v2").as("model_version"))
      old.join(fresh.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
        .unionByName(fresh)
    })
}
