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
