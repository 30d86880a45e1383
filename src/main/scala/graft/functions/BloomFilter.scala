package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Shared bit-level mechanics of the graft bloom filter, used identically by
  * the build aggregate and the membership probe (and callable from generated
  * Java — Scala emits static forwarders for object methods).
  *
  * Layout of a serialized filter: byte 0 = number of hash functions k
  * (1..64), bytes 1..end = the bit array, LSB-first within each byte. A
  * filter is self-describing, so a probe can never run with a k that
  * disagrees with the build side.
  *
  * Probing uses standard double hashing (Kirsch–Mitzenstein: the i-th index
  * is `h1 + i·h2 mod m`), with two splitmix64 finalizers decorrelating the
  * caller-provided 64-bit key. Deterministic — no RNG, no seed state — so a
  * filter built from the same key set is byte-identical whatever the
  * partitioning, and plans embedding one as a literal are reproducible.
  */
object BloomBits {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set the k probe bits of `key` in `filter` (header byte at 0). */
  def set(filter: Array[Byte], key: Long): Unit = {
    val k = filter(0) & 0xFF
    val m = (filter.length - 1).toLong << 3
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x5851F42D4C957F2DL) | 1L // odd → full period
    var i = 0
    while (i < k) {
      val idx = ((h1 + i * h2) & Long.MaxValue) % m
      val byteIdx = 1 + (idx >>> 3).toInt
      filter(byteIdx) = (filter(byteIdx) | (1 << (idx & 7L).toInt)).toByte
      i += 1
    }
  }

  /** True iff every probe bit of `key` is set — may false-positive, never
    * false-negative for a key that was `set`. */
  def mightContain(filter: Array[Byte], key: Long): Boolean = {
    val k = filter(0) & 0xFF
    val m = (filter.length - 1).toLong << 3
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x5851F42D4C957F2DL) | 1L
    var i = 0
    while (i < k) {
      val idx = ((h1 + i * h2) & Long.MaxValue) % m
      if ((filter(1 + (idx >>> 3).toInt) & (1 << (idx & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** Column API: aggregate a LONG hash column into a serialized filter. */
  def bloomBuild(c: Column, numBits: Long = 1L << 22, numHashes: Int = 5): Column =
    ColumnBridge.column(
      BloomBuildAgg(ColumnBridge.expression(c), numBits, numHashes)
        .toAggregateExpression())

  /** Column API: probe a serialized filter (usually a literal) with a LONG
    * hash column. */
  def bloomMightContain(filter: Column, c: Column): Column =
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(filter), ColumnBridge.expression(c)))
}

/** Mergeable bloom-filter build aggregate over 64-bit keys: fixed
  * `numBits/8 + 1` bytes of state per group regardless of input cardinality,
  * map-side combined before the shuffle, merged by bitwise OR — the
  * runtime-filter primitive. At corpus scale this is how a membership set of
  * any size (eval-set shingles, a blocklist, seen URLs) ships to every task
  * as a few hundred KB instead of a shuffled join side: build here, embed
  * the result as a literal (or broadcast), probe with [[BloomMightContain]],
  * and confirm the survivors exactly — no false negatives means the
  * bloom-prefiltered plan returns byte-identical results to the exact one.
  *
  * Re-expresses (Spark-first) the runtime bloom pruning the reference's
  * native engine applies inside its joins; same construction as
  * `spark.util.sketch.BloomFilter` / Guava (public designs), with a
  * self-describing header so build and probe can never disagree on k.
  */
case class BloomBuildAgg(
    child: Expression,
    numBits: Long,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  require(numBits >= 8 && numBits % 8 == 0 && numBits <= (1L << 33),
    s"numBits must be a positive multiple of 8 (≤ 2^33), got $numBits")
  require(numHashes >= 1 && numHashes <= 64, s"numHashes must be in [1,64], got $numHashes")

  override def prettyName: String = "bloom_build"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT key (pre-hash with xxhash64), got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Array[Byte] = {
    val buf = new Array[Byte](1 + (numBits / 8).toInt)
    buf(0) = numHashes.toByte
    buf
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomBits.set(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    require(buf.length == other.length && buf(0) == other(0),
      s"cannot merge bloom filters with different geometry: " +
        s"(${buf.length} B, k=${buf(0)}) vs (${other.length} B, k=${other(0)})")
    var i = 1
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

/** `might_contain(filter, key)` — codegen'd probe of a [[BloomBuildAgg]]
  * filter. Stays inside whole-stage codegen so a bloom prefilter adds no
  * interpretation overhead to the scan it guards. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with BinaryLike[Expression] {

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(filter: Any, key: Any): Any =
    BloomBits.mightContain(filter.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, k) =>
      s"${ev.value} = graft.functions.BloomBits.mightContain($f, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
