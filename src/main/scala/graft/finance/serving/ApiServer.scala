package graft.finance.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.LocalDate

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame

import graft.finance.{CategoryCatalog, ConnectionHealth, Serving}

/** The HTTP serving boundary: the reference's browser→API→engine hop
  * (`ui/backend/api/transactions.py:38-62`,
  * `api/validated_transactions.py:53-75`, `api/control_center.py:66-152`)
  * re-expressed as a thin JSON façade over [[Serving]]'s DataFrame
  * functions. Built on the JDK's `com.sun.net.httpserver` because the
  * build is dependency-frozen; the façade's job is ONLY param validation
  * (422 on FastAPI `Query` constraint violations — see [[ApiParams]]),
  * dispatch to the already-oracle-gated query functions, and JSON
  * rendering of LIMIT-capped pages. No query logic lives here.
  *
  * Data access is via suppliers (`() => DataFrame`) so every request reads
  * the tables' current state, matching the per-request DB session of the
  * reference. The Spark driver hosts the server; executors never see it.
  */
final class ApiServer(
    joined: () => DataFrame,
    validated: () => DataFrame,
    simplefinRaw: () => DataFrame,
    today: () => LocalDate = () => LocalDate.now(java.time.ZoneOffset.UTC),
    port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  // HttpServer matches the longest context prefix; the exact-path check in
  // `exchange` turns unknown subpaths into 404s as FastAPI's router would.
  server.createContext("/api/transactions/categories/list",
    exchange("/api/transactions/categories/list", categoriesList))
  server.createContext("/api/transactions", exchange("/api/transactions", transactions))
  server.createContext("/api/validated-transactions",
    exchange("/api/validated-transactions", validatedTransactions))
  server.createContext("/api/control-center/connections",
    exchange("/api/control-center/connections", connections))

  def start(): ApiServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
  def boundPort: Int = server.getAddress.getPort

  private def exchange(
      exactPath: String,
      route: Map[String, String] => (Int, String))(ex: HttpExchange): Unit = {
    val (status, body) =
      if (ex.getRequestURI.getPath != exactPath) (404, notFound)
      else if (ex.getRequestMethod != "GET") (405, methodNotAllowed)
      else try route(ApiParams.parseQueryString(ex.getRequestURI.getRawQuery))
      catch { case e: Exception => (500, serverError(e)) }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private val methodNotAllowed =
    ApiJson.obj(Seq("detail" -> ApiJson.str("Method Not Allowed")))

  private val notFound = ApiJson.obj(Seq("detail" -> ApiJson.str("Not Found")))

  /** The api routes' blanket 500 path: HTTPException(500, detail=str(e)). */
  private def serverError(e: Exception): String =
    ApiJson.obj(Seq("detail" -> ApiJson.str(
      s"Internal error: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")))

  /** GET /api/transactions (`api/transactions.py:38-62`). */
  private def transactions(q: Map[String, String]): (Int, String) =
    ApiParams.transactionQuery(q) match {
      case Left(errs) => (422, ApiParams.errorBody(errs))
      case Right(p) =>
        val page = Serving.transactionPage(
          joined(), p.mode, p.descriptionSearch, p.excludeLowConfidence,
          p.lowConfidenceThreshold, p.sortBy, p.ascending, p.limit, p.offset)
        (200, ApiJson.obj(Seq(
          "transactions" -> ApiJson.rows(page.rows),
          "total_count" -> page.totalCount.toString)))
    }

  /** GET /api/transactions/categories/list (`api/transactions.py:91-100`):
    * distinct in-use categories; on ANY read failure fall back to the
    * sorted default catalog so the UI dropdown never breaks. */
  private def categoriesList(q: Map[String, String]): (Int, String) = {
    val names =
      try Serving.distinctCategories(joined())
        .collect().map(_.getString(0)).toSeq
      catch { case _: Exception => CategoryCatalog.DefaultCategories.sorted }
    (200, ApiJson.strings(names))
  }

  /** GET /api/validated-transactions (`api/validated_transactions.py:53-75`). */
  private def validatedTransactions(q: Map[String, String]): (Int, String) =
    ApiParams.validatedQuery(q) match {
      case Left(errs) => (422, ApiParams.errorBody(errs))
      case Right(p) =>
        val page = Serving.validatedTransactionPage(
          validated(), p.category, p.accountNameFilter, p.descriptionSearch,
          p.sortBy, p.ascending, p.limit, p.offset)
        (200, ApiJson.obj(Seq(
          "transactions" -> ApiJson.rows(page.rows),
          "total_count" -> page.totalCount.toString)))
    }

  /** GET /api/control-center/connections (`api/control_center.py:66-152`):
    * the accountHealth rollup, each row annotated with the pure
    * [[ConnectionHealth]] inference, as the reference's ConnectionInfo. */
  private def connections(q: Map[String, String]): (Int, String) = {
    val rows = Serving.accountHealth(simplefinRaw()).collect()
    val asOf = today()
    def strOpt(v: Any): Option[String] = Option(v).map(_.toString)
    val infos = rows.iterator.map { r =>
      def f(name: String): Any = r.get(r.fieldIndex(name))
      val h = ConnectionHealth.compute(
        lastSuccessfulLoad = strOpt(f("last_successful_load")),
        pollEarliestTransactionDate = strOpt(f("poll_earliest_transaction_date")),
        pollLatestTransactionDate = strOpt(f("poll_latest_transaction_date")),
        oldestStoredTransactionDate = strOpt(f("oldest_stored_transaction_date")),
        today = asOf)
      ApiJson.obj(Seq(
        "account_id" -> ApiJson.value(f("account_id")),
        "account_name" -> ApiJson.value(f("account_name")),
        "institution_name" -> ApiJson.value(f("institution_name")),
        "last_successful_load" -> ApiJson.value(f("last_successful_load")),
        "latest_transaction_date" -> ApiJson.value(f("poll_latest_transaction_date")),
        "transaction_count" -> ApiJson.value(f("transaction_count")),
        "lookback_days" -> ApiJson.value(h.lookbackDays.map(Int.box).orNull),
        "buffer_days" -> ApiJson.value(h.bufferDays.map(Int.box).orNull),
        "days_since_last_load" -> ApiJson.value(h.daysSinceLastLoad.map(Int.box).orNull),
        "days_since_latest_transaction" ->
          ApiJson.value(h.daysSinceLatestTransaction.map(Int.box).orNull),
        "health_status" -> ApiJson.str(h.healthStatus),
        "health_message" -> ApiJson.str(h.healthMessage)))
    }.mkString("[", ",", "]")
    (200, ApiJson.obj(Seq(
      "connections" -> infos,
      "total_count" -> rows.length.toString)))
  }
}
