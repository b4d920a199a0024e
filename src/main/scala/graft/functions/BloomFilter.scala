package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter semi-join reduction — the standard way to prune a 100 TB
  * probe side before a shuffle join when the build side is too large to
  * broadcast as an exact set but its KEY SIGNATURE fits in a few MB.
  *
  * Two pieces:
  *   - [[BloomAgg]] (`bloom_agg(key, numBits, numHashes)`): a mergeable
  *     `TypedImperativeAggregate` building a fixed-size bitset. Partial
  *     aggregation ORs per-partition bitsets, so the build is one pass +
  *     a numBits/8-byte shuffle per partition — never a row shuffle.
  *   - [[BloomMightContain]] (`bloom_might_contain(bf, key)`): probe-side
  *     membership test against the broadcast bitset. No false negatives,
  *     so `prune → exact join` returns exactly the rows of the exact
  *     join; false positives only cost wasted join work (rate set by
  *     numBits/numHashes).
  *
  * The reference has no join layer at all (its host engine supplies it,
  * reference/README.md:15-16); this is part of the engine's own scale
  * surface. Hashing is XXH64 double-hashing (Kirsch–Mitzenmacher:
  * g_i = h1 + i·h2), the construction used by the classic partitioned
  * Bloom-join literature; both sides share [[BloomUtil]] so the agg and
  * the probe can never drift.
  */
private[functions] object BloomUtil {
  private final val SEED1 = 0L
  private final val SEED2 = 0x9e3779b97f4a7c15L

  /** (h1, h2) for any supported key value (long or UTF8String bytes). */
  def hashes(v: Any): (Long, Long) = v match {
    case l: Long => (XXH64.hashLong(l, SEED1), XXH64.hashLong(l, SEED2))
    case i: Integer => (XXH64.hashLong(i.longValue, SEED1), XXH64.hashLong(i.longValue, SEED2))
    case s: UTF8String =>
      (XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, SEED1),
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, SEED2))
    case other => throw new IllegalStateException(s"unsupported bloom key: ${other.getClass}")
  }

  def setBits(words: Array[Long], numBits: Int, numHashes: Int, v: Any): Unit = {
    val (h1, h2) = hashes(v)
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  def testBits(words: Array[Long], numBits: Int, numHashes: Int, v: Any): Boolean = {
    val (h1, h2) = hashes(v)
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Header: numBits (int LE), numHashes (int LE), then the words LE. */
  def toBytes(words: Array[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(numBits).putInt(numHashes)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  /** (numBits, numHashes, words) from the serialized form. A clear
    * error on non-bloom bytes (user SQL can pass anything) beats an
    * index crash mid-probe. */
  def fromBytes(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    if (bytes.length < 8 || (bytes.length - 8) % 8 != 0)
      throw new IllegalArgumentException(
        s"not a bloom_agg bitset: ${bytes.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val numBits = bb.getInt()
    val numHashes = bb.getInt()
    val words = new Array[Long]((bytes.length - 8) / 8)
    if (numBits <= 0 || numHashes <= 0 || numHashes > 16 || words.length.toLong * 64 != numBits)
      throw new IllegalArgumentException(
        s"not a bloom_agg bitset: header ($numBits bits, $numHashes hashes) " +
          s"does not match ${words.length} words")
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    (numBits, numHashes, words)
  }
}

/** `bloom_agg(key, numBits, numHashes)` → binary bitset (see file doc). */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(numBits > 0 && numBits % 64 == 0 && numBits <= (1 << 30),
    s"numBits must be a positive multiple of 64 (≤2^30): $numBits")
  require(numHashes > 0 && numHashes <= 16, s"numHashes out of range: $numHashes")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects bigint/int/string key, got: ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.setBits(buf, numBits, numHashes, v)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.toBytes(buf, numBits, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomUtil.toBytes(buf, numBits, numHashes)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomUtil.fromBytes(bytes)._3

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bloom_might_contain(bf, key)` — see file doc. Null key → false (an
  * inner join can never match a null key, so pruning it is exact).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with GraftBinaryCodegen {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType | IntegerType | StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects (binary, bigint/int/string), got: " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  // The filter bytes are the same broadcast value for every row of a
  // partition; decode them once per thread, keyed by reference identity
  // (same pattern as the JSON parse memo — no per-row allocation).
  @transient private lazy val decoded =
    new ThreadLocal[(AnyRef, (Int, Int, Array[Long]))]

  override def eval(input: InternalRow): Any = {
    val bf = left.eval(input)
    val v = right.eval(input)
    if (bf == null || v == null) false else evalChildValuesImpl(bf, v)
  }

  private def evalChildValuesImpl(bfAny: Any, v: Any): Any = {
    val bytes = bfAny.asInstanceOf[Array[Byte]]
    var memo = decoded.get()
    if (memo == null || (memo._1 ne bytes)) {
      memo = (bytes, BloomUtil.fromBytes(bytes))
      decoded.set(memo)
    }
    val (numBits, numHashes, words) = memo._2
    java.lang.Boolean.valueOf(BloomUtil.testBits(words, numBits, numHashes, v))
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = evalChildValuesImpl(l, r)

  // Non-nullable with null-in → false: bypass nullSafeCodeGen's skip.
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this, getClass.getName)
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.value} = false;
        if (!(${leftGen.isNull}) && !(${rightGen.isNull})) {
          ${ev.value} = ((java.lang.Boolean) $ref.evalChildValues(
            ${leftGen.value}, ${rightGen.value})).booleanValue();
        }
      """
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
