package graft.catalog

import graft.SparkSpec

/** Scan-efficiency lint: filters must reach the parquet scan and the scan
  * must read only the columns the query needs. At 100 TB the scan IS the
  * query cost for selective workloads — a plan that filters after reading,
  * or reads all 11 lineitem columns for a 4-column aggregate, is wrong even
  * when its results are green. PlanLintSpec guards join shapes; this spec
  * guards the leaf.
  *
  * Assertions are on the executedPlan's FileScan line: `PushedFilters:
  * [...]` (non-empty, containing the named predicates) and `ReadSchema:`
  * (not containing named unused columns). Representative selective queries
  * only — map-only full-scan queries legitimately push nothing.
  */
class PushdownLintSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** query -> (substring that must appear in PushedFilters,
    *           column that must NOT appear in ReadSchema) */
  private val cases: Seq[(String, String, String)] = Seq(
    // q6: lineitem date+discount+quantity filters, 2-column product
    ("q6_forecast_revenue", "l_shipdate", "l_returnflag"),
    // q1: shipdate upper bound pushed; partkey/suppkey unused
    ("q1_pricing_summary", "l_shipdate", "l_partkey"),
    // o4 keyset pagination: the keyset predicate is the whole point —
    // it must prune at the scan, not after
    ("o4_keyset_page", "o_orderkey", "o_orderdate"),
    // p16: confidence gate derives from props JSON + event_type;
    // user_id/value/ts are unused and must be pruned
    ("p16_confidence_gate", "event_id", "user_id"))

  private def scanLines(name: String): String = {
    val plan = Catalog.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("FileScan")).mkString("\n")
  }

  for ((name, pushed, unread) <- cases) test(s"$name: pushdown + pruning reach the scan") {
    val scans = scanLines(name)
    assert(scans.nonEmpty, s"$name: no FileScan found in executedPlan")
    assert(scans.contains("PushedFilters: [") && !scans.contains("PushedFilters: []"),
      s"$name: expected non-empty PushedFilters on the scan:\n$scans")
    assert(scans.contains(pushed),
      s"$name: predicate on '$pushed' not pushed to the scan:\n$scans")
    val readSchemas = scans.linesIterator
      .flatMap(_.split("ReadSchema:").drop(1)).mkString("\n")
    assert(readSchemas.nonEmpty, s"$name: no ReadSchema on the scan:\n$scans")
    assert(!readSchemas.contains(unread),
      s"$name: scan reads unused column '$unread' — column pruning failed:\n$scans")
  }
}
