package graft.finance.connector

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Job-launch client for a GraphQL orchestrator — the control-plane twin of
  * the reference's single shared launch implementation
  * (`ui/backend/services/dagster_client.py:21-141`): one launch-run
  * mutation, one response-dispatch, an error hierarchy that carries the
  * HTTP status the API layer should answer with.
  *
  * Like [[SimplefinConnector]], the transport is injectable so the client
  * is fully testable with zero egress; launching is one tiny HTTP call,
  * driver-side by design — the jobs it launches (`graft.finance.JobsMain`
  * names) are where the distributed work happens.
  */
object JobLaunchClient {

  /** One HTTP POST of a JSON body: status code + response body, or throws
    * on transport failure. */
  trait Transport {
    def post(url: String, jsonBody: String, timeoutMs: Int): (Int, String)
  }

  /** Launch failure; `httpStatus` maps to the HTTP code an API layer
    * should return (reference `DagsterClientError.status_code`). */
  sealed abstract class LaunchError(val httpStatus: Int, val message: String)
  final case class GraphQlError(override val message: String) extends LaunchError(500, message)
  final case class ConnectionError(override val message: String) extends LaunchError(503, message)
  final case class JobNotFound(override val message: String) extends LaunchError(404, message)
  final case class ConfigInvalid(override val message: String) extends LaunchError(400, message)

  /** The launch-run mutation (selector + typed error fragments). */
  val LaunchRunMutation: String =
    """mutation LaunchRun(
      |  $repositoryLocationName: String!
      |  $repositoryName: String!
      |  $jobName: String!
      |) {
      |  launchRun(
      |    executionParams: {
      |      selector: {
      |        repositoryLocationName: $repositoryLocationName
      |        repositoryName: $repositoryName
      |        jobName: $jobName
      |      }
      |    }
      |  ) {
      |    __typename
      |    ... on LaunchRunSuccess { run { runId status } }
      |    ... on PythonError { message stack }
      |    ... on PipelineNotFoundError { message }
      |    ... on RunConfigValidationInvalid { errors { message reason } }
      |  }
      |}""".stripMargin

  /** The POST body: {"query": mutation, "variables": {...}}. */
  def buildRequest(jobName: String, locationName: String, repositoryName: String): String =
    JsonMethods.compact(JsonMethods.render(
      JObject(
        "query" -> JString(LaunchRunMutation),
        "variables" -> JObject(
          "repositoryLocationName" -> JString(locationName),
          "repositoryName" -> JString(repositoryName),
          "jobName" -> JString(jobName)))))

  /** Dispatch one GraphQL response body to a run id or a typed error —
    * mirrors the reference's branch order exactly: top-level `errors`
    * first, then `__typename`: success → runId (or legacy `id`),
    * PythonError → 500, PipelineNotFoundError → 404,
    * RunConfigValidationInvalid → 400 with the first validation message,
    * anything else → unexpected-response 500. */
  def parseResponse(jobName: String, body: String): Either[LaunchError, String] = {
    val json =
      try JsonMethods.parse(body)
      catch { case e: Exception => return Left(GraphQlError(s"Unparseable response: ${e.getMessage}")) }
    (json \ "errors") match {
      case JArray(errs) if errs.nonEmpty =>
        val msg = (errs.head \ "message") match {
          case JString(m) => m
          case _ => "Unknown error"
        }
        return Left(GraphQlError(s"GraphQL error: $msg"))
      case _ => ()
    }
    val launch = json \ "data" \ "launchRun"
    (launch \ "__typename") match {
      case JString("LaunchRunSuccess") =>
        (launch \ "run" \ "runId", launch \ "run" \ "id") match {
          case (JString(runId), _) => Right(runId)
          case (_, JString(id)) => Right(id)
          case _ => Left(GraphQlError("Launch succeeded but no run id in response"))
        }
      case JString("PythonError") =>
        val msg = (launch \ "message") match { case JString(m) => m; case _ => "Unknown error" }
        Left(GraphQlError(s"Orchestrator error: $msg"))
      case JString("PipelineNotFoundError") =>
        Left(JobNotFound(s"Job '$jobName' not found. Make sure the job is registered."))
      case JString("RunConfigValidationInvalid") =>
        val msg = (launch \ "errors") match {
          case JArray(e :: _) => (e \ "message") match {
            case JString(m) => m
            case _ => "Invalid run config"
          }
          case _ => "Invalid run config"
        }
        Left(ConfigInvalid(s"Run config validation failed: $msg"))
      case other =>
        val t = other match { case JString(s) => s; case _ => "null" }
        Left(GraphQlError(s"Unexpected response: $t"))
    }
  }

  // ---- run-log warnings (`ui/backend/api/control_center.py:176-341`) ----

  /** One surfaced warning — the reference's `WarningInfo` model
    * (`control_center.py:25-29`). */
  final case class WarningInfo(
      message: String, timestamp: Option[String], runId: Option[String])

  /** The reference's `WarningsResponse` (`control_center.py:32-35`):
    * `total_count` counts every matching warning, `warnings` is the
    * limit-capped, newest-first slice. */
  final case class WarningsResult(warnings: Seq[WarningInfo], totalCount: Int)

  /** The step/asset whose run logs the control-center warning panel reads. */
  val SimplefinStepKey = "simplefin_financial_data"

  /** Messages surfaced to the panel — the reference's SimpleFIN-content
    * filter (`control_center.py:240-245`). */
  private val WarningMarkers =
    Seq("SimpleFIN", "may need attention", "not provided in time", "Connection to")

  /** `GetAssetRuns` (`control_center.py:198-213`): the most recent run that
    * materialized the asset — more reliable than querying by job name. */
  val AssetRunsQuery: String =
    """query GetAssetRuns($assetKey: AssetKeyInput!, $limit: Int!) {
      |  assetOrError(assetKey: $assetKey) {
      |    __typename
      |    ... on Asset {
      |      assetMaterializations(limit: $limit) { runId timestamp }
      |    }
      |    ... on AssetNotFoundError { message }
      |  }
      |}""".stripMargin

  /** `GetRunLogs` (`control_center.py:215-235`). */
  val RunLogsQuery: String =
    """query GetRunLogs($runId: ID!) {
      |  runOrError(runId: $runId) {
      |    __typename
      |    ... on Run {
      |      runId
      |      eventConnection {
      |        events {
      |          ... on LogMessageEvent { message level timestamp stepKey }
      |        }
      |      }
      |    }
      |    ... on RunNotFoundError { message }
      |  }
      |}""".stripMargin

  def buildAssetRunsRequest(stepKey: String): String =
    JsonMethods.compact(JsonMethods.render(
      JObject(
        "query" -> JString(AssetRunsQuery),
        "variables" -> JObject(
          "assetKey" -> JObject("path" -> JArray(List(JString(stepKey)))),
          // only the most recent materialization, as the reference
          "limit" -> JInt(1)))))

  def buildRunLogsRequest(runId: String): String =
    JsonMethods.compact(JsonMethods.render(
      JObject(
        "query" -> JString(RunLogsQuery),
        "variables" -> JObject("runId" -> JString(runId)))))

  private def asString(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case JInt(i) => Some(i.toString)
    case JLong(l) => Some(l.toString)
    case JDouble(d) => Some(d.toString)
    case JDecimal(d) => Some(d.toString)
    case _ => None
  }

  /** Most-recent materialization's run id, or None on any error shape —
    * every failure branch in the reference degrades to the empty response
    * (`control_center.py:249-275`). */
  def parseLatestRunId(body: String): Option[String] =
    try {
      val json = JsonMethods.parse(body)
      (json \ "errors") match {
        case JArray(errs) if errs.nonEmpty => return None
        case _ => ()
      }
      val asset = json \ "data" \ "assetOrError"
      (asset \ "__typename") match {
        case JString("AssetNotFoundError") => None
        case _ =>
          (asset \ "assetMaterializations") match {
            case JArray(m :: _) => asString(m \ "runId")
            case _ => None
          }
      }
    } catch { case _: Exception => None }

  /** WARN/WARNING/ERROR `LogMessageEvent`s of the simplefin step (or with
    * no stepKey) whose message carries SimpleFIN-related content
    * (`control_center.py:296-332`). Unparseable bodies and error shapes →
    * empty, as the reference logs-and-continues. */
  def parseRunWarnings(runId: String, body: String,
      stepKey: String = SimplefinStepKey): Seq[WarningInfo] =
    try {
      val json = JsonMethods.parse(body)
      val run = json \ "data" \ "runOrError"
      (run \ "__typename") match {
        case JString("RunNotFoundError") => return Nil
        case _ => ()
      }
      (run \ "eventConnection" \ "events") match {
        case JArray(events) =>
          events.flatMap { ev =>
            val msg = asString(ev \ "message").getOrElse("")
            val level = asString(ev \ "level").getOrElse("").toUpperCase
            val evStep = asString(ev \ "stepKey").getOrElse("")
            val levelOk = Seq("WARN", "WARNING", "ERROR").contains(level)
            val stepOk = evStep == stepKey || evStep.isEmpty
            val contentOk = msg.nonEmpty && WarningMarkers.exists(msg.contains)
            if (levelOk && stepOk && contentOk)
              Some(WarningInfo(msg, asString(ev \ "timestamp"), Some(runId)))
            else None
          }
        case _ => Nil
      }
    } catch { case _: Exception => Nil }

  /** GET /api/control-center/simplefin-warnings backend: two GraphQL round
    * trips (latest materialization → its run logs), newest-first, capped at
    * `limit` with the uncapped count in `totalCount`. EVERY failure path —
    * transport, HTTP, GraphQL errors, missing shapes — returns the empty
    * result, exactly like the reference's catch-all branches. */
  def simplefinWarnings(
      transport: Transport,
      baseUrl: String,
      limit: Int = 50,
      timeoutMs: Int = 30000): WarningsResult = {
    val empty = WarningsResult(Nil, 0)
    try {
      val url = s"$baseUrl/graphql"
      val (st1, b1) = transport.post(url, buildAssetRunsRequest(SimplefinStepKey), timeoutMs)
      if (st1 >= 400) return empty
      parseLatestRunId(b1) match {
        case None => empty
        case Some(runId) =>
          val (st2, b2) = transport.post(url, buildRunLogsRequest(runId), timeoutMs)
          if (st2 != 200) return empty
          val all = parseRunWarnings(runId, b2)
            .sortBy(_.timestamp.getOrElse(""))(Ordering[String].reverse)
          WarningsResult(all.take(limit), all.size)
      }
    } catch { case _: Exception => empty }
  }

  /** Launch `jobName` and return its run id. Transport failures and plain
    * HTTP errors → [[ConnectionError]] (503), except an HTTP-error body
    * that itself carries GraphQL `errors` — surfaced as the GraphQL
    * message (reference behavior). */
  def launch(
      transport: Transport,
      baseUrl: String,
      jobName: String,
      locationName: String,
      repositoryName: String,
      timeoutMs: Int = 30000): Either[LaunchError, String] = {
    val url = s"$baseUrl/graphql"
    val request = buildRequest(jobName, locationName, repositoryName)
    val (status, body) =
      try transport.post(url, request, timeoutMs)
      catch {
        case e: Exception =>
          return Left(ConnectionError(s"Failed to connect to orchestrator at $url: ${e.getMessage}"))
      }
    if (status >= 400) {
      val hasGraphQlErrors =
        try (JsonMethods.parse(body) \ "errors") match {
          case JArray(errs) => errs.nonEmpty
          case _ => false
        } catch { case _: Exception => false }
      if (hasGraphQlErrors) parseResponse(jobName, body)
      else Left(ConnectionError(s"Orchestrator returned HTTP $status: $body"))
    } else parseResponse(jobName, body)
  }
}
