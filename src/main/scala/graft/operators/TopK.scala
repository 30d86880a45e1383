package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

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

  private val scoreOrd: Ordering[Scored] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  final class TopKAggregator(k: Int)
      extends Aggregator[Row, mutable.PriorityQueue[Scored], Seq[Scored]] {

    // PriorityQueue dequeues the ordering's maximum, so "worst survivor on
    // top" = max of (-score, id): lowest score first, and among ties the
    // LARGEST id — matching `ORDER BY score DESC, id` where smaller id wins.
    private def heapOrder: Ordering[Scored] =
      Ordering.by[Scored, (Double, Long)] { case (s, id) => (-s, id) }

    override def zero: mutable.PriorityQueue[Scored] =
      mutable.PriorityQueue.empty[Scored](heapOrder)

    private def push(h: mutable.PriorityQueue[Scored], v: Scored): mutable.PriorityQueue[Scored] = {
      if (h.size < k) h.enqueue(v)
      else if (scoreOrd.compare((v._1, -v._2), (h.head._1, -h.head._2)) > 0) {
        h.dequeue(); h.enqueue(v)
      }
      h
    }

    override def reduce(h: mutable.PriorityQueue[Scored], row: Row): mutable.PriorityQueue[Scored] =
      push(h, (row._2, row._3))

    override def merge(a: mutable.PriorityQueue[Scored], b: mutable.PriorityQueue[Scored]): mutable.PriorityQueue[Scored] = {
      b.foreach(v => push(a, v))
      a
    }

    override def finish(h: mutable.PriorityQueue[Scored]): Seq[Scored] =
      h.toSeq.sortBy { case (s, id) => (-s, id) }

    override def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
      Encoders.javaSerialization[mutable.PriorityQueue[Scored]]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  def topK(k: Int): TopKAggregator = new TopKAggregator(k)
}
