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
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Count-Min sketch (Cormode & Muthukrishnan '05): `depth` rows of
  * `width` counters; an item increments one cell per row at
  * `(a_j·h + b_j) mod width`, where h is the item's 60-bit md5 prefix.
  * Evaluates to the flat cell array (row-major, length depth×width).
  *
  * Guarantees: est(x) = min_j cell[j][h_j(x)] NEVER underestimates — every
  * occurrence of x lands in all of x's cells — and overestimates only by
  * colliding mass (≤ εN with ε = e/width at the usual confidence, but the
  * lower bound is deterministic, not probabilistic). Point queries need no
  * per-item state: the frequency table of ANY probe set comes out of
  * depth×width longs per group, where a plain GROUP BY count holds a slot
  * per distinct item — the fixed-state frequency path next to k4's
  * Misra-Gries top-k (which keeps identities but only k of them).
  *
  * Determinism: cells are plain sums, so the sketch — unlike an evicting
  * Misra-Gries summary — is EXACTLY partitioning/merge-order independent:
  * counter addition commutes. That is what lets the catalog hash-compare
  * cm estimates themselves against a DuckDB reconstruction (the k5 entry
  * unrolls the identical hash arithmetic in SQL), not just an error-bound
  * boolean.
  *
  * The hash family is the minhash affine trick (see DedupCatalog d2): base
  * h < 2^60 from md5, a_j ≤ 7 keeps a_j·h + b_j < 2^63 — overflow-free on
  * both engines. Null inputs are skipped (count/collect semantics).
  */
case class CountMinSketch(
    child: Expression,
    width: Int,
    depth: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(width >= 2, s"width must be >= 2, got $width")
  require(depth >= 1 && depth <= CountMinSketch.A.length,
    s"depth must be in [1, ${CountMinSketch.A.length}], got $depth")

  override def prettyName: String = "count_min_sketch_cells"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  // one digest per task thread, reset per item — allocation-free updates
  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = CountMinSketch.base60(md5, v.asInstanceOf[UTF8String].getBytes)
      var j = 0
      while (j < depth) {
        buf(j * width + CountMinSketch.bucket(h, j, width)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketch =
    copy(child = newChild)
}

object CountMinSketch {

  /** Per-row affine coefficients, shared verbatim by the SQL oracle and the
    * DataFrame probe arithmetic. a ≤ 7 bounds a·h < 2^63 for h < 2^60. */
  val A: Array[Long] = Array(2L, 3L, 5L, 7L)
  val B: Array[Long] = Array(12345L, 54321L, 98765L, 13579L)

  /** The universal-hash modulus interposed before the width reduction.
    * `(a·h + b) mod width` alone depends only on `h mod width` (for the
    * power-of-two widths the sketch wants), so ALL rows would collide
    * together and depth would buy nothing; reducing mod a large prime
    * first mixes the high bits, making the rows behave independently —
    * the same P as the minhash affine family. */
  val P: Long = GraftExtensions.DefaultModulus

  /** Row j's bucket for base hash h — the single definition the update
    * path, the spec's reference estimator, and (textually) the SQL oracle
    * all share: `((a_j·h + b_j) mod P) mod width`. */
  def bucket(h: Long, j: Int, width: Int): Int =
    (((A(j) * h + B(j)) % P) % width).toInt

  /** First 15 md5 hex chars as a positive long (< 2^60) — byte-identical to
    * Spark SQL `conv(substring(md5(x),1,15),16,10)` and DuckDB
    * `('0x'||substr(md5(x),1,15))::BIGINT` (DedupCatalog.shingleHash). */
  private[functions] def base60(
      md: java.security.MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    // 15 hex chars = 7.5 bytes: bytes 0..6 fully, high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Column-API entry: flat row-major cell array, length depth×width. */
  def apply(item: Column, width: Int, depth: Int): Column =
    ColumnBridge.column(new CountMinSketch(ColumnBridge.expression(item), width, depth)
      .toAggregateExpression())
}
