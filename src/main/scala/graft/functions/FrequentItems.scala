package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitters summary: per group, at most `k`
  * (item, weight) slots; evaluates to a map of item → lower-bound count.
  *
  * Guarantees (Misra-Gries '82; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS'12): for a group of n rows, every stored weight w(x)
  * satisfies `true(x) − n/(k+1) ≤ w(x) ≤ true(x)`, and any item with
  * true(x) > n/(k+1) is guaranteed a slot. When the group has ≤ k distinct
  * items the summary is EXACT — which is what makes the catalog entry
  * oracle-checkable against a plain GROUP BY count while the operator
  * itself stays a fixed-size mergeable sketch: at corpus scale the same
  * aggregate finds the dominant domains/languages/templates of a column
  * with k slots of state per group, map-side combined before the shuffle,
  * merged without rescanning — the k3 HLL posture, for top-k instead of
  * cardinality.
  *
  * State is structurally bounded at k entries no matter the cardinality of
  * the input (the decrement step evicts), so a hot group costs O(k), never
  * a spill. Null inputs are skipped, matching count/collect semantics.
  *
  * Determinism: outside the exact regime (distinct items > k, eviction
  * triggers) the stored WEIGHTS depend on merge order and therefore on
  * partitioning — only the error bound holds, not the exact values. Do not
  * use evicting configurations in hash-compared queries; entry order alone
  * (sorted by item at eval) is always deterministic.
  */
case class FrequentItems(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FrequentItems.Buffer]
    with UnaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def prettyName: String = "frequent_items"
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): FrequentItems.Buffer =
    new FrequentItems.Buffer(k)

  override def update(
      buf: FrequentItems.Buffer, input: InternalRow): FrequentItems.Buffer = {
    val v = child.eval(input)
    // copy out of Spark's reused row buffer before storing
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(
      buf: FrequentItems.Buffer, other: FrequentItems.Buffer): FrequentItems.Buffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: FrequentItems.Buffer): Any = {
    // deterministic entry ORDER (by item). The VALUES are only
    // partitioning-independent in the exact regime (distinct items <= k,
    // no eviction ever triggers); once Misra-Gries evicts, counts depend
    // on merge order — don't hash-compare results past that regime.
    val entries = buf.entries.toArray.sortBy(_._1)
    ArrayBasedMapData(
      entries.map(e => UTF8String.fromString(e._1): Any),
      entries.map(_._2: Any))
  }

  override def serialize(buf: FrequentItems.Buffer): Array[Byte] = {
    val entries = buf.entries.toArray
    val items = entries.map(_._1.getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.allocate(
      4 + items.map(_.length + 4 + 8).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(items(i).length).put(items(i)).putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FrequentItems.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new FrequentItems.Buffer(k)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val item = new Array[Byte](bb.getInt()); bb.get(item)
      buf.add(new String(item, "UTF-8"), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FrequentItems =
    copy(child = newChild)
}

object FrequentItems {

  /** Mutable Misra-Gries state: at most k weighted slots. `add` with a
    * weight subsumes both the classic +1 update and the weighted merge
    * insert; overflow past k slots subtracts the smallest involved weight
    * from every slot and evicts non-positives (the PODS'12 merge rule,
    * which preserves the n/(k+1) error bound under arbitrary merge trees).
    */
  final class Buffer(k: Int) {
    private val slots = new java.util.HashMap[String, Long](k * 2)

    def entries: Iterator[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      slots.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue.longValue()))
    }

    def add(item: String, w: Long): Unit = {
      val cur: Long = slots.getOrDefault(item, 0L) // stored weights are always > 0
      if (cur > 0L) slots.put(item, cur + w)
      else if (slots.size < k) slots.put(item, w)
      else {
        // no slot: absorb by decrementing everyone by min(w, smallest slot)
        // repeatedly — equivalently, insert then subtract the (k+1)-th
        // largest weight from all and drop non-positives
        var remaining = w
        while (remaining > 0 && !slots.containsKey(item)) {
          var minW = Long.MaxValue
          val it0 = slots.values().iterator()
          while (it0.hasNext) minW = math.min(minW, it0.next())
          val dec = math.min(remaining, minW)
          remaining -= dec
          val it = slots.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val nw = e.getValue - dec
            if (nw <= 0) it.remove() else e.setValue(nw)
          }
          if (remaining > 0 && slots.size < k) {
            slots.put(item, remaining)
            remaining = 0
          }
        }
      }
    }

    def mergeFrom(other: Buffer): Unit =
      other.entries.foreach { case (item, w) => add(item, w) }
  }

  /** Column-API entry: map of item → lower-bound count, at most k entries,
    * exact when the group has ≤ k distinct items. */
  def apply(item: Column, k: Int): Column =
    ColumnBridge.column(new FrequentItems(ColumnBridge.expression(item), k)
      .toAggregateExpression())
}
