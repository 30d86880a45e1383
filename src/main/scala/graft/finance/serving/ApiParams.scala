package graft.finance.serving

import graft.finance.Serving

/** Query-string parsing + validation for the serving façade, mirroring the
  * FastAPI `Query(...)` constraints on the reference's routes
  * (`ui/backend/api/transactions.py:38-47`,
  * `api/validated_transactions.py:53-61`). Pure functions returning
  * `Either[Seq[ParamError], P]` so the whole branch matrix is testable
  * without a socket; the HTTP layer maps `Left` to 422 exactly as FastAPI
  * renders request-validation failures.
  *
  * Semantics carried over faithfully:
  *   - out-of-range / unparseable typed params (limit, offset, threshold,
  *     booleans) → 422;
  *   - `view_mode` and `sort_order` are plain strings the reference never
  *     validates — an unknown view_mode matches no branch and serves ALL
  *     rows, an unknown sort_order falls to DESC
  *     (`transaction_service.py:167-201`); we preserve both fallbacks;
  *   - `sort_by` outside the whitelist silently falls back to
  *     `transacted_date` (`transaction_service.py:198-201`) — the fallback
  *     lives in [[Serving.transactionPage]] / `validatedTransactionPage`.
  */
object ApiParams {

  final case class ParamError(param: String, msg: String)

  final case class TransactionQuery(
      limit: Int,
      offset: Int,
      mode: Serving.ViewMode,
      descriptionSearch: Option[String],
      excludeLowConfidence: Boolean,
      lowConfidenceThreshold: Double,
      sortBy: String,
      ascending: Boolean)

  final case class ValidatedQuery(
      limit: Int,
      offset: Int,
      sortBy: String,
      ascending: Boolean,
      category: Option[String],
      accountNameFilter: Option[String],
      descriptionSearch: Option[String])

  /** `constants.py:34` — the default confidence floor the route exposes as
    * the threshold param's default. */
  val LowConfidenceThreshold = 0.40

  /** Parse an URL query string (`a=1&b=x`) into last-wins key→value, with
    * percent-decoding — the subset of RFC 3986 the reference's UI emits. */
  def parseQueryString(raw: String): Map[String, String] =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split("&").iterator.filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      val (k, v) = if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
      java.net.URLDecoder.decode(k, "UTF-8") ->
        java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap

  private def intParam(q: Map[String, String], name: String, default: Int,
      ge: Int, le: Int): Either[ParamError, Int] =
    q.get(name) match {
      case None => Right(default)
      case Some(s) => s.toIntOption match {
        case None => Left(ParamError(name, "value is not a valid integer"))
        case Some(v) if v < ge => Left(ParamError(name, s"ensure this value is >= $ge"))
        case Some(v) if v > le => Left(ParamError(name, s"ensure this value is <= $le"))
        case Some(v) => Right(v)
      }
    }

  private def doubleParam(q: Map[String, String], name: String, default: Double,
      ge: Double, le: Double): Either[ParamError, Double] =
    q.get(name) match {
      case None => Right(default)
      case Some(s) => s.toDoubleOption match {
        case None => Left(ParamError(name, "value is not a valid float"))
        case Some(v) if v < ge || v > le =>
          Left(ParamError(name, s"ensure this value is in [$ge, $le]"))
        case Some(v) => Right(v)
      }
    }

  /** FastAPI bool coercion: true/false/1/0/yes/no/on/off (case-insensitive). */
  private def boolParam(q: Map[String, String], name: String,
      default: Boolean): Either[ParamError, Boolean] =
    q.get(name) match {
      case None => Right(default)
      case Some(s) => s.toLowerCase match {
        case "true" | "1" | "yes" | "on" => Right(true)
        case "false" | "0" | "no" | "off" => Right(false)
        case _ => Left(ParamError(name, "value could not be parsed to a boolean"))
      }
    }

  /** Unknown strings intentionally fall through to AllTransactions — the
    * reference builds zero WHERE conditions for them. */
  def viewMode(s: Option[String]): Serving.ViewMode = s match {
    case Some("unvalidated_predicted") => Serving.UnvalidatedPredicted
    case Some("unvalidated_unpredicted") => Serving.UnvalidatedUnpredicted
    case Some("validated") => Serving.Validated
    case _ => Serving.AllTransactions
  }

  private def collect2[A](es: Seq[Either[ParamError, _]], build: => A): Either[Seq[ParamError], A] = {
    val errs = es.collect { case Left(e) => e }
    if (errs.nonEmpty) Left(errs) else Right(build)
  }

  def transactionQuery(q: Map[String, String]): Either[Seq[ParamError], TransactionQuery] = {
    val limit = intParam(q, "limit", 100, ge = 1, le = 1000)
    val offset = intParam(q, "offset", 0, ge = 0, le = Int.MaxValue)
    val excl = boolParam(q, "exclude_low_confidence", default = false)
    val thr = doubleParam(q, "low_confidence_threshold", LowConfidenceThreshold, 0.0, 1.0)
    collect2(Seq(limit, offset, excl, thr), TransactionQuery(
      limit = limit.toOption.get,
      offset = offset.toOption.get,
      mode = viewMode(q.get("view_mode")),
      descriptionSearch = q.get("description_search").filter(_.nonEmpty),
      excludeLowConfidence = excl.toOption.get,
      lowConfidenceThreshold = thr.toOption.get,
      sortBy = q.getOrElse("sort_by", "transacted_date"),
      ascending = q.getOrElse("sort_order", "desc").toLowerCase == "asc"))
  }

  def validatedQuery(q: Map[String, String]): Either[Seq[ParamError], ValidatedQuery] = {
    val limit = intParam(q, "limit", 100, ge = 1, le = 10000)
    val offset = intParam(q, "offset", 0, ge = 0, le = Int.MaxValue)
    collect2(Seq(limit, offset), ValidatedQuery(
      limit = limit.toOption.get,
      offset = offset.toOption.get,
      sortBy = q.getOrElse("sort_by", "transacted_date"),
      ascending = q.getOrElse("sort_order", "desc").toLowerCase == "asc",
      category = q.get("category").filter(_.nonEmpty),
      accountNameFilter = q.get("account_name_filter").filter(_.nonEmpty),
      descriptionSearch = q.get("description_search").filter(_.nonEmpty)))
  }

  /** FastAPI's 422 body shape: {"detail":[{"loc":["query",p],"msg":m}]}. */
  /** GET /api/control-center/simplefin-warnings: `limit: int = 50`
    * (`control_center.py:177`) — FastAPI validates only int-ness here, no
    * range constraint. */
  def warningsQuery(q: Map[String, String]): Either[Seq[ParamError], Int] =
    intParam(q, "limit", 50, Int.MinValue, Int.MaxValue).left.map(Seq(_))

  def errorBody(errs: Seq[ParamError]): String =
    ApiJson.obj(Seq("detail" -> errs.map(e =>
      ApiJson.obj(Seq(
        "loc" -> ApiJson.strings(Seq("query", e.param)),
        "msg" -> ApiJson.str(e.msg)))).mkString("[", ",", "]")))
}
