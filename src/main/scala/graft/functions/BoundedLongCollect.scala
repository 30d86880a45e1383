package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Doc-frequency-bounded list aggregate: collects at most `cap` long values
  * per group while counting ALL of them, and evaluates to the sorted value
  * array when the group's total count is in [2, cap] — NULL otherwise.
  *
  * This is the hot-bucket guard of dedup candidate generation
  * ([[graft.operators.Dedup.boundedDocLists]]) collapsed into ONE hash
  * aggregate. The previous shape needed a windowed per-key count over the
  * key exchange, a filter, and then a separate `collect_list` aggregate —
  * WindowExec buffers (and at skew, spills) every row of a hot key before
  * the filter can drop it. Here the buffer is structurally bounded: once a
  * group passes `cap` occurrences it degenerates to a bare counter and the
  * stored prefix is garbage by contract (eval returns NULL for it), so a
  * million-document boilerplate shingle costs 8 bytes of state, not a
  * spill. Map-side partial aggregation also now combines hot keys BEFORE
  * the shuffle, which the window formulation could not.
  *
  * Oracle mirror (unchanged): `GROUP BY key HAVING COUNT(*) BETWEEN 2 AND
  * cap` with a sorted list aggregate. Null inputs are skipped, matching
  * `collect_list`; callers pass non-null doc ids by construction.
  */
case class BoundedLongCollect(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedLongCollect.Buffer]
    with UnaryLike[Expression] {

  require(cap >= 2, s"cap must be >= 2, got $cap")

  override def prettyName: String = "bounded_long_collect"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): BoundedLongCollect.Buffer =
    new BoundedLongCollect.Buffer(cap)

  override def update(
      buf: BoundedLongCollect.Buffer, input: InternalRow): BoundedLongCollect.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: BoundedLongCollect.Buffer,
      other: BoundedLongCollect.Buffer): BoundedLongCollect.Buffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: BoundedLongCollect.Buffer): Any =
    if (buf.count < 2 || buf.count > cap) null
    else {
      val out = java.util.Arrays.copyOf(buf.values, buf.stored)
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }

  override def serialize(buf: BoundedLongCollect.Buffer): Array[Byte] = {
    // Past the cap only the count matters — ship 8 bytes, not the prefix.
    val n = if (buf.count > cap) 0 else buf.stored
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 8 * n)
    bb.putLong(buf.count).putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedLongCollect.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new BoundedLongCollect.Buffer(cap)
    val count = bb.getLong()
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf.count = count
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedLongCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedLongCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedLongCollect =
    copy(child = newChild)
}

object BoundedLongCollect {

  /** Mutable per-group state: total occurrence count plus at most `cap`
    * stored values. `add` stops storing (but keeps counting) past the cap. */
  final class Buffer(cap: Int) {
    var count: Long = 0L
    var stored: Int = 0
    var values: Array[Long] = new Array[Long](math.min(cap, 8))

    def add(v: Long): Unit = {
      count += 1
      if (count <= cap) {
        if (stored == values.length) {
          values = java.util.Arrays.copyOf(values, math.min(cap, values.length * 2))
        }
        values(stored) = v
        stored += 1
      }
    }

    def mergeFrom(other: Buffer): Unit = {
      val total = count + other.count
      var i = 0
      while (i < other.stored && count < cap) { add(other.values(i)); i += 1 }
      count = total
    }
  }

  /** Column-API entry: sorted list of `payload` per group, NULL when the
    * group has <2 or >cap members. */
  def apply(payload: Column, cap: Int): Column =
    ColumnBridge.column(new BoundedLongCollect(ColumnBridge.expression(payload), cap)
      .toAggregateExpression())
}
