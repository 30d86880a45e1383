package graft.finance.connector

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JobLaunchClient against a fake transport — every reference dispatch
  * branch (`dagster_client.py:21-141`), zero egress. */
class JobLaunchClientSpec extends AnyFunSuite {
  import JobLaunchClient._

  private def fake(status: Int, body: String): Transport =
    (_: String, _: String, _: Int) => (status, body)

  test("request body carries the mutation and the full selector variables") {
    val body = buildRequest("3_refresh_validated_full", "finance_location", "finance_repo")
    val json = JsonMethods.parse(body)
    val query = (json \ "query").asInstanceOf[JString].s
    assert(query.contains("mutation LaunchRun"))
    assert(query.contains("LaunchRunSuccess { run { runId status } }"))
    assert(query.contains("PipelineNotFoundError"))
    assert(query.contains("RunConfigValidationInvalid"))
    assert((json \ "variables" \ "jobName") == JString("3_refresh_validated_full"))
    assert((json \ "variables" \ "repositoryLocationName") == JString("finance_location"))
    assert((json \ "variables" \ "repositoryName") == JString("finance_repo"))
  }

  test("LaunchRunSuccess returns the run id (and falls back to legacy id)") {
    val ok = """{"data":{"launchRun":{"__typename":"LaunchRunSuccess",
      "run":{"runId":"run-123","status":"STARTED"}}}}"""
    assert(launch(fake(200, ok), "http://orch:3000", "job", "loc", "repo") == Right("run-123"))
    val legacy = """{"data":{"launchRun":{"__typename":"LaunchRunSuccess",
      "run":{"id":"run-456"}}}}"""
    assert(parseResponse("job", legacy) == Right("run-456"))
  }

  test("typed errors map to the reference's HTTP statuses") {
    val notFound = """{"data":{"launchRun":{"__typename":"PipelineNotFoundError",
      "message":"nope"}}}"""
    parseResponse("ghost_job", notFound) match {
      case Left(e: JobNotFound) =>
        assert(e.httpStatus == 404 && e.message.contains("ghost_job"))
      case other => fail(s"expected JobNotFound, got $other")
    }
    val invalid = """{"data":{"launchRun":{"__typename":"RunConfigValidationInvalid",
      "errors":[{"message":"missing key x","reason":"MISSING"}]}}}"""
    parseResponse("job", invalid) match {
      case Left(e: ConfigInvalid) =>
        assert(e.httpStatus == 400 && e.message.contains("missing key x"))
      case other => fail(s"expected ConfigInvalid, got $other")
    }
    val py = """{"data":{"launchRun":{"__typename":"PythonError",
      "message":"boom","stack":["l1"]}}}"""
    parseResponse("job", py) match {
      case Left(e: GraphQlError) => assert(e.httpStatus == 500 && e.message.contains("boom"))
      case other => fail(s"expected GraphQlError, got $other")
    }
  }

  test("top-level GraphQL errors win over data, as in the reference") {
    val errs = """{"errors":[{"message":"schema drift"}],
      "data":{"launchRun":{"__typename":"LaunchRunSuccess","run":{"runId":"x"}}}}"""
    parseResponse("job", errs) match {
      case Left(e: GraphQlError) => assert(e.message.contains("schema drift"))
      case other => fail(s"expected GraphQlError, got $other")
    }
  }

  test("transport failure and plain HTTP errors map to 503; GraphQL-carrying HTTP errors keep their message") {
    val boom: Transport = (_, _, _) => throw new java.io.IOException("refused")
    launch(boom, "http://down:3000", "job", "loc", "repo") match {
      case Left(e: ConnectionError) =>
        assert(e.httpStatus == 503 && e.message.contains("http://down:3000/graphql"))
      case other => fail(s"expected ConnectionError, got $other")
    }
    launch(fake(502, "bad gateway"), "http://orch", "job", "loc", "repo") match {
      case Left(e: ConnectionError) => assert(e.message.contains("HTTP 502"))
      case other => fail(s"expected ConnectionError, got $other")
    }
    val httpWithErrors = """{"errors":[{"message":"not allowed"}]}"""
    launch(fake(400, httpWithErrors), "http://orch", "job", "loc", "repo") match {
      case Left(e: GraphQlError) => assert(e.message.contains("not allowed"))
      case other => fail(s"expected GraphQlError, got $other")
    }
  }

  test("unexpected typename and unparseable bodies fail loudly, not silently") {
    parseResponse("job", """{"data":{"launchRun":{"__typename":"Surprise"}}}""") match {
      case Left(e: GraphQlError) => assert(e.message.contains("Surprise"))
      case other => fail(s"expected GraphQlError, got $other")
    }
    assert(parseResponse("job", "<html>oops</html>").isLeft)
  }

  // ---- simplefin-warnings GraphQL pair (`control_center.py:176-341`) ----

  test("warnings requests mirror the reference's two queries and variables") {
    val assetReq = JsonMethods.parse(buildAssetRunsRequest(SimplefinStepKey))
    assert((assetReq \ "query").asInstanceOf[JString].s.contains("query GetAssetRuns"))
    assert((assetReq \ "variables" \ "assetKey" \ "path") ==
      JArray(List(JString("simplefin_financial_data"))))
    // the reference always asks for ONE materialization (the most recent)
    assert((assetReq \ "variables" \ "limit") == JInt(1))
    val logsReq = JsonMethods.parse(buildRunLogsRequest("run-9"))
    assert((logsReq \ "query").asInstanceOf[JString].s.contains("query GetRunLogs"))
    assert((logsReq \ "variables" \ "runId") == JString("run-9"))
  }

  test("latest-run-id parse degrades to None on every reference error branch") {
    assert(parseLatestRunId(
      """{"data":{"assetOrError":{"assetMaterializations":[
        {"runId":"r2","timestamp":"200"},{"runId":"r1","timestamp":"100"}]}}}""")
      .contains("r2"))
    assert(parseLatestRunId(
      """{"data":{"assetOrError":{"__typename":"AssetNotFoundError","message":"no"}}}""").isEmpty)
    assert(parseLatestRunId(
      """{"data":{"assetOrError":{"assetMaterializations":[]}}}""").isEmpty)
    assert(parseLatestRunId("""{"errors":[{"message":"boom"}]}""").isEmpty)
    assert(parseLatestRunId("<html>oops</html>").isEmpty)
  }

  test("run-log warnings apply the level, stepKey, and SimpleFIN-content filters") {
    val body =
      """{"data":{"runOrError":{"__typename":"Run","runId":"r2","eventConnection":{"events":[
        {"message":"Connection to Chase may need attention","level":"WARNING","timestamp":"3","stepKey":"simplefin_financial_data"},
        {"message":"SimpleFIN token expired","level":"ERROR","timestamp":"5","stepKey":""},
        {"message":"SimpleFIN poll ok","level":"INFO","timestamp":"4","stepKey":"simplefin_financial_data"},
        {"message":"unrelated warning","level":"WARNING","timestamp":"6","stepKey":"simplefin_financial_data"},
        {"message":"SimpleFIN data not provided in time","level":"WARN","timestamp":"1","stepKey":"other_step"},
        {}]}}}}"""
    val ws = parseRunWarnings("r2", body)
    // INFO level, non-SimpleFIN content, and foreign stepKey all drop;
    // empty stepKey passes (the reference's `or not step_key_in_log`)
    assert(ws.map(_.message) == Seq(
      "Connection to Chase may need attention", "SimpleFIN token expired"))
    assert(ws.forall(_.runId.contains("r2")))
    assert(parseRunWarnings("r2",
      """{"data":{"runOrError":{"__typename":"RunNotFoundError","message":"no"}}}""").isEmpty)
  }

  test("simplefinWarnings chains the queries, sorts newest-first, caps at limit") {
    val assetBody =
      """{"data":{"assetOrError":{"assetMaterializations":[{"runId":"r7","timestamp":"9"}]}}}"""
    val logsBody =
      """{"data":{"runOrError":{"runId":"r7","eventConnection":{"events":[
        {"message":"SimpleFIN a","level":"WARNING","timestamp":"1"},
        {"message":"SimpleFIN b","level":"WARNING","timestamp":"3"},
        {"message":"SimpleFIN c","level":"ERROR","timestamp":"2"}]}}}}"""
    val transport: Transport = (_: String, req: String, _: Int) =>
      if (req.contains("GetAssetRuns")) (200, assetBody) else (200, logsBody)
    val r = simplefinWarnings(transport, "http://orch", limit = 2)
    assert(r.totalCount == 3) // uncapped count, like the reference
    assert(r.warnings.map(_.message) == Seq("SimpleFIN b", "SimpleFIN c"))
    // every failure path is the empty response, never an exception
    val dead: Transport = (_, _, _) => throw new RuntimeException("down")
    assert(simplefinWarnings(dead, "http://orch") == WarningsResult(Nil, 0))
    assert(simplefinWarnings(fake(500, "oops"), "http://orch") == WarningsResult(Nil, 0))
  }
}
