package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k as a typed partial aggregation.
  *
  * The window formulation (`row_number over (partition by q order by score
  * desc)` + filter) shuffles EVERY scored row to its query's reducer and
  * sorts the lot. This Aggregator keeps a bounded k-element heap per group
  * on the map side, so only `k × partitions` candidates cross the wire —
  * the shape that survives a 100 TB corpus with millions of candidates per
  * query. Use via
  * `ds.groupByKey(_._1).agg(TopK.topK(k).toColumn)` over
  * `(groupKey, score, candidateId)` rows.
  */
object TopK {

  /** Input row: (group key, score, candidate id). */
  type Row = (Long, Double, Long)
  /** Result element: (score, candidate id), descending by score, id tiebreak. */
  type Scored = (Double, Long)

  /** Bounded binary min-heap over parallel primitive arrays: root = the
    * worst kept element under "score desc, id asc", so a candidate that
    * beats the root replaces it in O(log k). Plain arrays + an int make the
    * shuffle representation an ExpressionEncoder product (two primitive
    * ARRAY columns and an INT) instead of round-4's
    * `Encoders.javaSerialization[PriorityQueue]`, which paid Java
    * object-graph ser/deser on every partial merge. In-memory mutation is
    * in place; only the shuffle boundary pays the (now columnar) encode. */
  final case class Heap(scores: Array[Double], ids: Array[Long], var size: Int) {

    /** a strictly worse than b under (score desc, id asc)? Total ordering
      * via Double.compare — raw IEEE `<` would make every comparison with a
      * NaN false, silently breaking the heap invariant once a NaN score
      * (e.g. cosine of a zero-norm vector) enters during the fill phase.
      * Like the previous PriorityQueue's Ordering.Double.TotalOrdering,
      * NaN compares above every real score. */
    @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
      val c = java.lang.Double.compare(sa, sb)
      c < 0 || (c == 0 && ia > ib)
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          swap(i, p); i = p
        } else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

    @inline private def swap(i: Int, j: Int): Unit = {
      val s = scores(i); scores(i) = scores(j); scores(j) = s
      val d = ids(i); ids(i) = ids(j); ids(j) = d
    }

    def push(s: Double, id: Long): Unit =
      if (size < scores.length) {
        scores(size) = s; ids(size) = id; size += 1; siftUp(size - 1)
      } else if (worse(scores(0), ids(0), s, id)) {
        scores(0) = s; ids(0) = id; siftDown(0)
      }
  }

  final class TopKAggregator(k: Int) extends Aggregator[Row, Heap, Seq[Scored]] {
    require(k > 0, s"k must be positive, got $k")

    override def zero: Heap = Heap(new Array[Double](k), new Array[Long](k), 0)

    override def reduce(h: Heap, row: Row): Heap = { h.push(row._2, row._3); h }

    override def merge(a: Heap, b: Heap): Heap = {
      var i = 0
      while (i < b.size) { a.push(b.scores(i), b.ids(i)); i += 1 }
      a
    }

    override def finish(h: Heap): Seq[Scored] =
      (0 until h.size).map(i => (h.scores(i), h.ids(i)))
        .sortBy { case (s, id) => (-s, id) }

    override def bufferEncoder: Encoder[Heap] = ExpressionEncoder[Heap]()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  }

  def topK(k: Int): TopKAggregator = new TopKAggregator(k)
}
