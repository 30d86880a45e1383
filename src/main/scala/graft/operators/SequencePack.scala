package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training batches: assign each document to a
  * bin so that no bin exceeds `budget` tokens — the step between "clean
  * corpus" and "fixed-length training batches" in a pretraining pipeline.
  *
  * Distributed shape: bins never span partitions (a bin must ultimately be
  * materialized by ONE writer), so packing is per-partition imperative
  * logic — a legitimate `mapPartitions` case per the custom-operator
  * ladder. Documents land in their partition by a stable hash of the doc
  * id (content-independent, reproducible across runs and cluster sizes for
  * a fixed `numGroups`), are sorted (tokens desc, id asc) within the
  * partition, then packed next-fit-decreasing: one open bin, close it when
  * the next doc doesn't fit. That is O(n) time and O(1) state per
  * partition — the predictable-cost choice at 100 TB; first-fit-decreasing
  * packs a few percent tighter but holds every open bin in memory and its
  * search cost grows with bin count. The decreasing sort recovers most of
  * the gap (big docs first, small docs fill the tails).
  *
  * A document larger than the budget still gets its own (oversized) bin —
  * dropping data silently is never the engine's decision; callers can
  * filter `bin_tokens > budget` to quarantine afterward.
  *
  * Output: (doc_id, tokens, bin_id, bin_tokens) — bin_id is globally
  * unique ((partition << 32) | local bin index), bin_tokens the bin's
  * total (every member row carries it, so downstream writers need no
  * second aggregation).
  */
object SequencePack {

  final case class PackedDoc(doc_id: Long, tokens: Int, bin_id: Long, bin_tokens: Int)

  /** In-engine invariant assertion over a [[pack]] output: returns a
    * single-row guard frame whose `invariants_ok` column is `true` when
    * every invariant holds and a `raise_error` otherwise — cross-join
    * (broadcast) it onto the packed rows so a violated invariant kills the
    * job instead of silently passing a rows-only check. Invariants:
    * (1) every `source` doc appears exactly once; (2) `bin_tokens` equals
    * the member token sum and is identical on every member; (3) no bin
    * exceeds `budget` unless it is a single oversize doc. */
  def checkInvariants(packed: DataFrame, source: DataFrame, budget: Int): DataFrame = {
    val perBin = packed.groupBy(col("bin_id")).agg(
      sum(col("tokens")).as("tok_sum"),
      min(col("bin_tokens")).as("bt_min"),
      max(col("bin_tokens")).as("bt_max"),
      count(lit(1)).as("members"))
    val binViolations = perBin.agg(
      sum(when(col("tok_sum") =!= col("bt_min") || col("bt_min") =!= col("bt_max"),
        1L).otherwise(0L)).as("bad_totals"),
      sum(when(col("bt_max") > budget && col("members") > 1, 1L).otherwise(0L))
        .as("oversize_shared"))
    val docViolations = packed.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("appearances"))
      .join(source.select(col("doc_id")), Seq("doc_id"), "full_outer")
      .agg(sum(when(col("appearances").isNull || col("appearances") =!= 1, 1L)
        .otherwise(0L)).as("bad_docs"))
    binViolations.crossJoin(docViolations)
      .select(
        when(col("bad_totals") + col("oversize_shared") + col("bad_docs") > 0,
          raise_error(concat(lit("SequencePack invariant violation: bad_totals="),
            col("bad_totals"), lit(" oversize_shared="), col("oversize_shared"),
            lit(" bad_docs="), col("bad_docs"))))
          .otherwise(lit(true)).as("invariants_ok"))
  }

  def pack(
      docs: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Int,
      numGroups: Int = 32): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(numGroups > 0, "numGroups must be positive")
    // A null (or, under non-ANSI casts, uncastable) id/token count would
    // otherwise surface as an opaque NullPointerException inside
    // mapPartitions; the docstring's "dropping data silently is never the
    // engine's decision" cuts both ways — bad rows fail loudly, up front.
    def required(c: org.apache.spark.sql.Column, what: String) =
      when(c.isNull,
        raise_error(lit(s"SequencePack: null or uncastable $what — " +
          "clean or filter these rows before packing"))).otherwise(c)
    val grouped = docs
      .select(required(col(idCol).cast("long"), s"doc id ($idCol)").as("doc_id"),
        required(col(tokenCol).cast("int"), s"token count ($tokenCol)").as("tokens"))
      .repartition(numGroups, pmod(xxhash64(col("doc_id")), lit(numGroups)))
      .sortWithinPartitions(col("tokens").desc, col("doc_id").asc)
    grouped.mapPartitions { rows =>
      val pid = TaskContext.getPartitionId().toLong
      // buffer one bin's members, emit them stamped with the bin total
      val bin = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      var used = 0
      var nextBin = 0L
      def flush(): Iterator[PackedDoc] = {
        if (bin.isEmpty) Iterator.empty
        else {
          val id = (pid << 32) | nextBin
          val total = used
          val out = bin.toList.map { case (d, t) => PackedDoc(d, t, id, total) }
          bin.clear(); used = 0; nextBin += 1
          out.iterator
        }
      }
      val packed = rows.flatMap { r =>
        val d = r.getLong(0)
        val t = r.getInt(1)
        val emitted = if (bin.nonEmpty && used + t > budget) flush() else Iterator.empty
        bin += ((d, t)); used += t
        emitted
      }
      packed ++ new Iterator[PackedDoc] {
        private var tail: Iterator[PackedDoc] = null
        def hasNext: Boolean = { if (tail == null) tail = flush(); tail.hasNext }
        def next(): PackedDoc = { if (tail == null) tail = flush(); tail.next() }
      }
    }(Encoders.product[PackedDoc]).toDF()
  }
}
