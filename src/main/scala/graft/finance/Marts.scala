package graft.finance

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The marts layer: canonical transaction union, the feature mart, and the
  * categorized / uncategorized / validated / with-predictions facts —
  * the `dbt/models/marts` SQL models as lazily-composed DataFrame functions.
  */
object Marts {

  /** The ML feature columns appended by [[intTrxnsFeatures]], in output
    * order — shared with `stg_user_validated_categories` and the bootstrap
    * branch of `fct_validated_trxns`, which must carry the identical set
    * (`fct_validated_trxns.sql:46-63`). */
  val featureColumns: Seq[String] = Seq(
    "combined_text", "day_of_week", "month", "day_of_month",
    "is_negative", "amount_abs", "amount_bucket",
    "has_hotel_keyword", "has_gas_keyword", "has_grocery_keyword",
    "has_restaurant_keyword", "has_transport_keyword", "has_shop_keyword",
    "has_flight_keyword", "has_credit_fee_keyword", "has_interest_keyword")

  /** Keyword → regex alternation, exactly the reference's nine patterns
    * (`int_trxns_features.sql:66-109`). PG `~*` is a case-insensitive
    * substring regex match; the input is pre-lowered on both engines so
    * plain `rlike` reproduces it. */
  val keywordPatterns: Seq[(String, String)] = Seq(
    "has_hotel_keyword" -> "hotel|airbnb|inn|resort|motel|hipcamp|booking",
    "has_gas_keyword" -> "shell|chevron|exxon|bp|mobil|gas|fuel|76|arco",
    "has_grocery_keyword" -> "safeway|costco|trader|whole foods|kroger|grocery|market|albertsons|bowlberkeley",
    "has_restaurant_keyword" -> "restaurant|cafe|coffee|starbucks|mcdonald|burger|pizza|chipotle|dining",
    "has_transport_keyword" -> "uber|lyft|taxi|bart|metro|transit|parking|toll",
    "has_shop_keyword" -> "amazon|target|walmart|ebay|etsy|shop|store",
    "has_flight_keyword" -> "airline|united|delta|american|southwest|jetblue|alaska|spirit|frontier|airlines|flight",
    "has_credit_fee_keyword" -> "annual|membership|fee",
    "has_interest_keyword" -> "interest")

  /** The 20-column canonical transaction shape produced by [[intTrxns]]. */
  val canonicalColumns: Seq[String] = Seq(
    "transaction_id", "account_id", "original_account_name", "account_name",
    "detailed_account_name", "owner_name", "institution_domain",
    "institution_name", "amount", "posted", "posted_date", "transacted_at",
    "transacted_date", "description", "pending", "source_category",
    "master_category", "import_timestamp", "import_date", "source_name")

  /** `int_trxns.sql`: align both staged sources to the canonical shape
    * (P1 null-padding projections) and UNION ALL by name — the reference
    * aligns by explicit projection; `unionByName` makes positional drift
    * impossible (SURVEY §2.7). */
  def intTrxns(stgSimplefin: DataFrame, stgHistoric: DataFrame): DataFrame = {
    val simplefinFull = stgSimplefin.select(
      col("transaction_id"),
      col("account_id"),
      col("account_name").as("original_account_name"),
      col("mapped_account_name").as("account_name"),
      lit(null).cast("string").as("detailed_account_name"),
      lit(null).cast("string").as("owner_name"),
      col("institution_domain"),
      col("institution_name"),
      col("amount"),
      col("posted"),
      col("posted_date"),
      col("transacted_at"),
      col("transacted_date"),
      col("description"),
      col("pending"),
      lit(null).cast("string").as("source_category"),
      lit(null).cast("string").as("master_category"),
      col("import_timestamp"),
      col("import_date").cast("timestamp").as("import_date"),
      lit("simplefin").as("source_name"))
    val historicFull = stgHistoric.select(
      canonicalColumns.dropRight(1).map {
        case "import_date" => col("import_date").cast("timestamp").as("import_date")
        case c => col(c)
      } :+ lit("historic").as("source_name"): _*)
    simplefinFull.unionByName(historicFull)
  }

  /** `int_trxns_features.sql`: the canonical row minus a few raw columns,
    * plus text/date/amount/keyword ML features (P4–P7).
    *
    * Date-part convention: PG `extract(dow)` is 0=Sunday; the reference
    * remaps to pandas 0=Monday. Spark `dayofweek` is 1=Sunday, so
    * `(dayofweek + 5) % 7` lands on the same Monday=0 convention.
    */
  def intTrxnsFeatures(intTrxns: DataFrame): DataFrame = {
    val desc = lower(coalesce(col("description"), lit("")))
    val keywordCols: Seq[Column] = keywordPatterns.map { case (name, pat) =>
      when(desc.rlike(pat), 1).otherwise(0).as(name)
    }
    val base = Seq(
      "transaction_id", "account_id", "original_account_name", "account_name",
      "detailed_account_name", "owner_name", "institution_name", "amount",
      "posted_date", "transacted_date", "description", "pending",
      "source_category", "master_category", "import_timestamp", "import_date",
      "source_name").map(col)
    val features = Seq(
      concat(
        coalesce(col("description"), lit("")), lit(" "),
        coalesce(col("account_name"), lit("")), lit(" "),
        coalesce(col("institution_name"), lit(""))).as("combined_text"),
      ((dayofweek(col("transacted_date")) + 5) % 7).as("day_of_week"),
      month(col("transacted_date")).as("month"),
      dayofmonth(col("transacted_date")).as("day_of_month"),
      when(col("amount") < 0, 1).otherwise(0).as("is_negative"),
      abs(col("amount")).as("amount_abs"),
      when(abs(col("amount")) <= 10, 0)
        .when(abs(col("amount")) <= 50, 1)
        .when(abs(col("amount")) <= 100, 2)
        .when(abs(col("amount")) <= 500, 3)
        .when(abs(col("amount")) > 500, 4)
        .otherwise(5).as("amount_bucket"))
    intTrxns.select(base ++ features ++ keywordCols: _*)
  }

  /** `fct_trxns_categorized.sql` — P8. */
  def fctTrxnsCategorized(features: DataFrame): DataFrame =
    features.filter(col("master_category").isNotNull)

  /** `fct_trxns_uncategorized.sql` — P9: null-category rows not yet
    * user-validated. The reference's `NOT IN (… WHERE id IS NOT NULL)` is
    * translated to a left-anti join (identical for non-null probe ids, and
    * null ids never occur: both staged sources construct them). */
  def fctTrxnsUncategorized(features: DataFrame, fctValidated: DataFrame): DataFrame =
    features
      .filter(col("master_category").isNull)
      .join(fctValidated.select("transaction_id"), Seq("transaction_id"), "left_anti")

  /** `fct_trxns_with_predictions.sql` — J4: uncategorized rows left-joined
    * to the deduped prediction columns. */
  def fctTrxnsWithPredictions(uncategorized: DataFrame, stgPredictions: DataFrame): DataFrame =
    uncategorized.join(
      stgPredictions.select("transaction_id", "predicted_master_category",
        "prediction_confidence", "model_version", "prediction_timestamp"),
      Seq("transaction_id"), "left_outer")

  /** Full-refresh (bootstrap) build of `fct_validated_trxns`
    * (`fct_validated_trxns.sql:22-76`): every pre-categorized historic row —
    * null-padded with the user columns — UNION ALL every user-validated row. */
  def fctValidatedBootstrap(
      fctCategorized: DataFrame,
      stgUserValidated: DataFrame): DataFrame = {
    val bootstrap = fctCategorized.select(
      Seq("transaction_id", "account_id", "original_account_name",
        "account_name", "detailed_account_name", "owner_name",
        "institution_name", "amount", "posted_date", "transacted_date",
        "description", "pending", "source_category", "master_category",
        "import_timestamp", "import_date", "source_name").map(col) ++
        Seq(lit(null).cast("string").as("user_notes"),
          lit(null).cast("timestamp").as("category_changed_at")) ++
        featureColumns.map(col): _*)
    bootstrap.unionByName(stgUserValidated)
  }

  /** Incremental build of `fct_validated_trxns` (`:13-19`): append-only —
    * only user-validated rows whose id is not yet in the target. "Does NOT
    * allow for updating existing transactions." */
  def fctValidatedIncrement(
      existing: DataFrame,
      stgUserValidated: DataFrame): DataFrame =
    stgUserValidated.join(
      existing.select("transaction_id"), Seq("transaction_id"), "left_anti")
}
