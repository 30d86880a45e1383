package graft.finance

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDate

/** Port-fidelity tests for the connection-health inference
  * (`connection_health.py:27-123`) — pure logic, no Spark session. */
class ConnectionHealthSpec extends AnyFunSuite {
  private val today = LocalDate.parse("2026-08-12")

  test("healthy: wide buffer before history loss") {
    val h = ConnectionHealth.compute(
      lastSuccessfulLoad = Some("2026-08-11"),
      pollEarliestTransactionDate = Some("2026-05-13"), // 90-day poll span
      pollLatestTransactionDate = Some("2026-08-11"),
      oldestStoredTransactionDate = Some("2026-01-01"),
      today = today)
    assert(h.lookbackDays.contains(90))
    // window edge = 2026-05-14; oldest stored 2026-01-01 → -133 (already safe)
    assert(h.bufferDays.exists(_ <= 0))
    assert(h.healthStatus == "healthy")
    assert(h.healthMessage.contains("already stored locally"))
  }

  test("unhealthy: history about to fall off the window") {
    val h = ConnectionHealth.compute(
      Some("2026-08-11"), Some("2026-06-12"), Some("2026-08-11"),
      oldestStoredTransactionDate = Some("2026-06-20"), today = today)
    // lookback 60 → edge 2026-06-13; oldest 2026-06-20 → buffer 7 ≤ 14
    assert(h.bufferDays.contains(7))
    assert(h.healthStatus == "unhealthy")
    assert(h.healthMessage.startsWith("Only 7 days before"))
  }

  test("warning band between 14 and 30 days of buffer") {
    val h = ConnectionHealth.compute(
      Some("2026-08-11"), Some("2026-06-12"), Some("2026-08-11"),
      Some("2026-07-03"), today)
    assert(h.bufferDays.contains(20))
    assert(h.healthStatus == "warning")
  }

  test("warning: no lookback inferable; warning: stale latest transaction") {
    val none = ConnectionHealth.compute(None, None, None, None, today)
    assert(none.healthStatus == "warning")
    assert(none.healthMessage.contains("Could not infer lookback"))

    val stale = ConnectionHealth.compute(
      Some("2026-08-11"), Some("2026-05-13"), Some("2026-06-01"),
      oldestStoredTransactionDate = None, today = today)
    assert(stale.daysSinceLatestTransaction.contains(72))
    assert(stale.healthStatus == "warning")
    assert(stale.healthMessage.contains("Account may be inactive"))
  }

  test("lenient date parsing accepts timestamp serializations") {
    assert(ConnectionHealth.parseDate(Some("2026-08-11T10:30:00"))
      .contains(LocalDate.parse("2026-08-11")))
    assert(ConnectionHealth.parseDate(Some("2026-08-11 10:30:00.123"))
      .contains(LocalDate.parse("2026-08-11")))
    assert(ConnectionHealth.parseDate(Some("  ")).isEmpty)
    assert(ConnectionHealth.parseDate(None).isEmpty)
  }

  test("lookback falls back to poll-date minus earliest when latest missing") {
    val h = ConnectionHealth.compute(
      Some("2026-08-11"), Some("2026-07-12"), None, None, today)
    assert(h.lookbackDays.contains(30))
  }
}
