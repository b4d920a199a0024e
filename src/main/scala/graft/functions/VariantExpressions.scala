package graft.functions

import graft.variant._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Spark-facing variant column type: a plain struct of two binary
  * buffers, mirroring the reference's Arrow layout
  * (/root/reference/arrow-open-variant/src/json.rs:67-80) minus the
  * dictionary-encoding (SURVEY §1.6 — Spark has no DataFrame-level
  * dictionary type; rows are self-contained instead, SURVEY §7.3).
  */
object VariantSchema {
  val TYPE: StructType = StructType(Seq(
    StructField("metadata", BinaryType, nullable = false),
    StructField("value", BinaryType, nullable = false)))

  def isVariantStruct(dt: DataType): Boolean = dt match {
    case s: StructType =>
      s.length == 2 && s(0).name == "metadata" && s(0).dataType == BinaryType &&
        s(1).name == "value" && s(1).dataType == BinaryType
    case _ => false
  }
}

/** `variant_from_json(jsonStr)` / `try_variant_from_json(jsonStr)`:
  * parse a JSON string/binary column into a variant struct.
  * Semantics follow the reference kernel (json.rs:38-81): top-level JSON
  * `null` → SQL NULL; malformed JSON → error (or NULL in `try` mode);
  * non-string input rejected at analysis (json.rs:108-112).
  */
case class VariantFromJson(child: Expression, failOnError: Boolean = true)
    extends UnaryExpression with GraftUnaryCodegen {

  override def dataType: DataType = VariantSchema.TYPE
  override def nullable: Boolean = true
  override def prettyName: String =
    if (failOnError) "variant_from_json" else "try_variant_from_json"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"Input data type not supported in variant_from_json: ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes: Array[Byte] = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    val memo = VariantFromJson.lastParse.get()
    if (memo(0) != null &&
      java.util.Arrays.equals(memo(0).asInstanceOf[Array[Byte]], bytes)) {
      val pair = memo(1).asInstanceOf[(Array[Byte], Array[Byte])]
      return if (pair == null) null
      else new GenericInternalRow(Array[Any](pair._1, pair._2))
    }
    try {
      val pair = VariantJsonCodec.fromJsonBytes(bytes, 0, bytes.length)
      // defensive copy: getBytes may expose a reused backing buffer, and
      // a stale reference would make the equality probe compare a buffer
      // against itself
      memo(0) = bytes.clone()
      memo(1) = pair
      if (pair == null) null
      else new GenericInternalRow(Array[Any](pair._1, pair._2))
    } catch {
      case e: Exception if !failOnError => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VariantFromJson {
  /** Catalyst duplicates expressions across Filter/Project boundaries
    * (predicate pushdown re-substitutes the parse under the filter, so a
    * `filter(variant_get(v,…) > x).select(variant_get(v,…))` plan parses
    * each row twice — SURVEY §4.2). Both copies evaluate on the same
    * thread back-to-back per row, so a process-wide, thread-local
    * last-input memo collapses the duplicate work. Also de-dupes
    * repeated identical JSON payloads across adjacent rows.
    */
  private[functions] val lastParse: ThreadLocal[Array[AnyRef]] =
    ThreadLocal.withInitial(() => new Array[AnyRef](2))
}

/** Shared eval helpers for variant extraction expressions. */
object VariantExtract {

  /** Cast an extracted variant view to a Spark internal value of
    * `target`; null when the variant value cannot represent the target
    * (lenient mode) or throws (strict).
    */
  def cast(meta: MetadataView, v: VariantView, target: DataType, failOnError: Boolean): Any = {
    if (v == null) return null
    // A variant-null VALUE stays a variant null when the target is
    // variant (is_variant_null must see it); it becomes SQL NULL for
    // every scalar target.
    target match {
      case s: StructType if VariantSchema.isVariantStruct(s) =>
        return new GenericInternalRow(Array[Any](meta.bytes, v.copyBytes))
      case _ => ()
    }
    if (v.isNull) return null
    try {
      target match {
        case LongType =>
          if (v.isLong) v.getLong
          // non-integral numerics TRUNCATE toward zero — parity with
          // Spark's builtin VariantGet Cast semantics (probe: 3.7 ->
          // bigint = 3), pinned by NativeDispatchDivergenceSpec
          else if (v.isDecimal)
            v.getDecimal.setScale(0, java.math.RoundingMode.DOWN).longValueExact()
          else if (v.isDouble) doubleToLongExact(v.getDouble)
          else if (v.isBoolean) (if (v.getBoolean) 1L else 0L)
          else if (v.isString) v.getString.trim.toLong
          else if (v.isDictString) v.getDictKey(meta).trim.toLong
          else fail(v, target)
        case IntegerType =>
          val l = cast(meta, v, LongType, failOnError)
          if (l == null) null else Math.toIntExact(l.asInstanceOf[Long])
        case ShortType =>
          val l = cast(meta, v, LongType, failOnError)
          if (l == null) null
          else {
            val x = l.asInstanceOf[Long]
            if (x == x.toShort.toLong) x.toShort else fail(v, target)
          }
        case ByteType =>
          val l = cast(meta, v, LongType, failOnError)
          if (l == null) null
          else {
            val x = l.asInstanceOf[Long]
            if (x == x.toByte.toLong) x.toByte else fail(v, target)
          }
        case FloatType =>
          val d = cast(meta, v, DoubleType, failOnError)
          if (d == null) null else d.asInstanceOf[Double].toFloat
        case DoubleType =>
          if (v.isDouble) v.getDouble
          else if (v.isLong) v.getLong.toDouble
          else if (v.isDecimal) v.getDecimal.doubleValue()
          else if (v.isString) v.getString.trim.toDouble
          else if (v.isDictString) v.getDictKey(meta).trim.toDouble
          else fail(v, target)
        case BooleanType =>
          if (v.isBoolean) v.getBoolean
          else if (v.isString) v.getString.trim.toBoolean
          else if (v.isDictString) v.getDictKey(meta).trim.toBoolean
          else fail(v, target)
        case _: StringType =>
          UTF8String.fromString(asString(meta, v))
        case d: DecimalType =>
          val bd =
            if (v.isDecimal) v.getDecimal
            else if (v.isLong) java.math.BigDecimal.valueOf(v.getLong)
            else if (v.isDouble) java.math.BigDecimal.valueOf(v.getDouble)
            else if (v.isString) new java.math.BigDecimal(v.getString.trim)
            else if (v.isDictString) new java.math.BigDecimal(v.getDictKey(meta).trim)
            else return fail(v, target)
          val dec = org.apache.spark.sql.types.Decimal(bd)
          if (dec.changePrecision(d.precision, d.scale)) dec else fail(v, target)
        case BinaryType =>
          if (v.isBinary) v.getBinary
          else if (v.isString) v.getString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          else if (v.isDictString || v.isDictBinary)
            v.getDictKey(meta).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          else fail(v, target)
        case DateType =>
          if (v.basicType == VariantConst.BASIC_PRIMITIVE && v.typeInfo == VariantConst.P_DATE)
            v.getDateDays
          else fail(v, target)
        case TimestampType | TimestampNTZType =>
          if (v.basicType == VariantConst.BASIC_PRIMITIVE &&
            (v.typeInfo == VariantConst.P_TIMESTAMP || v.typeInfo == VariantConst.P_TIMESTAMP_NTZ))
            v.getTimestampMicros
          else fail(v, target)
        case ArrayType(elem, _) =>
          // element-wise recursive cast — parity with Spark's builtin
          // VariantGet array targets (NativeDispatchDivergenceSpec)
          if (!v.isArray) fail(v, target)
          else {
            val a = v.getArray
            val n = a.numElements
            val out = new Array[Any](n)
            var i = 0
            while (i < n) { out(i) = cast(meta, a.elementAt(i), elem, failOnError); i += 1 }
            new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
          }
        case MapType(_: StringType, valueType, _) =>
          if (!v.isObject) fail(v, target)
          else {
            val o = v.getObject
            val n = o.numElements
            val ks = new Array[Any](n)
            val vs = new Array[Any](n)
            var i = 0
            while (i < n) {
              ks(i) = UTF8String.fromString(meta.getKey(o.fieldIdAt(i)))
              vs(i) = cast(meta, o.valueAt(i), valueType, failOnError)
              i += 1
            }
            org.apache.spark.sql.catalyst.util.ArrayBasedMapData(ks, vs)
          }
        case st: StructType => // non-variant struct target: match by name
          if (!v.isObject) fail(v, target)
          else {
            val o = v.getObject
            val out = new Array[Any](st.length)
            var i = 0
            while (i < st.length) {
              val id = meta.findKey(st(i).name)
              val fv = if (id < 0) null else o.getField(id)
              out(i) =
                if (fv == null) null
                else cast(meta, fv, st(i).dataType, failOnError)
              i += 1
            }
            new GenericInternalRow(out)
          }
        case other =>
          throw new UnsupportedOperationException(
            s"variant_get target type not supported: ${other.simpleString}")
      }
    } catch {
      case e: UnsupportedOperationException => throw e
      case e: Exception if !failOnError => null
    }
  }

  private def fail(v: VariantView, target: DataType): Any =
    throw new IllegalArgumentException(
      s"Cannot cast variant ${v.typeName} to ${target.simpleString}")

  /** Scala's `.toLong` SATURATES out-of-range doubles (1e300 ->
    * Long.MaxValue) and maps NaN -> 0, while Spark's builtin VariantGet
    * errors in strict mode / NULLs under try_variant_get (probed:
    * INVALID_VARIANT_CAST for 1e300, NaN, Infinity -> bigint/int).
    * Throwing here routes through the enclosing lenient-mode catch, so
    * both dispatch routes agree (NativeDispatchDivergenceSpec).
    */
  private[functions] def doubleToLongExact(d: Double): Long = {
    if (d.isNaN || d < Long.MinValue.toDouble || d > Long.MaxValue.toDouble)
      throw new ArithmeticException(s"double $d out of bigint range")
    d.toLong
  }

  /** Scalar → bare string; object/array → compact JSON. */
  def asString(meta: MetadataView, v: VariantView): String = {
    import VariantConst._
    v.basicType match {
      case BASIC_SHORT_STR => v.getString
      case BASIC_OBJECT | BASIC_ARRAY =>
        VariantJsonCodec.toJsonString(meta.bytes, v.copyBytes)
      case _ =>
        v.typeInfo match {
          case P_TRUE => "true"
          case P_FALSE => "false"
          case P_INT8 | P_INT16 | P_INT32 | P_INT64 => v.getLong.toString
          case P_DOUBLE | P_FLOAT => v.getDouble.toString
          case P_DECIMAL4 | P_DECIMAL8 | P_DECIMAL16 => v.getDecimal.toPlainString
          case P_LONG_STR => v.getString
          case P_STRING_FROM_DICT => v.getDictKey(meta)
          case P_BINARY => java.util.Base64.getEncoder.encodeToString(v.getBinary)
          case P_BINARY_FROM_DICT => java.util.Base64.getEncoder.encodeToString(
            v.getDictKey(meta).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          case P_DATE => java.time.LocalDate.ofEpochDay(v.getDateDays.toLong).toString
          case P_TIMESTAMP | P_TIMESTAMP_NTZ =>
            val m = v.getTimestampMicros
            java.time.Instant.ofEpochSecond(
              Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L).toString
          case t => throw new IllegalStateException(s"unknown type id $t")
        }
    }
  }
}

/** `to_spark_variant(v)`: reinterpret our variant struct as Spark 4.1's
  * native `VariantType`. No re-encoding happens — both sides implement
  * the same Open Variant binary spec (SURVEY §1.3), so the two buffers
  * pass through verbatim and Spark's builtin variant functions read our
  * bytes directly (DifferentialSpec proves extraction parity). This is
  * the interop bridge a user migrating between the builtin and this
  * library needs.
  */
case class ToSparkVariant(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = VariantType
  override def nullable: Boolean = true
  override def prettyName: String = "to_spark_variant"
  override def checkInputDataTypes(): TypeCheckResult =
    if (VariantSchema.isVariantStruct(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"to_spark_variant expects a variant struct, got: ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    new org.apache.spark.unsafe.types.VariantVal(row.getBinary(1), row.getBinary(0))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `from_spark_variant(v)`: the inverse bridge — Spark's native variant
  * value as our (metadata, value) struct, again byte-verbatim.
  */
case class FromSparkVariant(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = VariantSchema.TYPE
  override def nullable: Boolean = true
  override def prettyName: String = "from_spark_variant"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case VariantType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"from_spark_variant expects variant, got: ${other.simpleString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.unsafe.types.VariantVal]
    new GenericInternalRow(Array[Any](v.getMetadata, v.getValue))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `variant_get(v, '$.path'[, 'type'])`: walk a pre-parsed path through
  * the variant and cast to the target type. Path resolution per step is
  * the reference's `find_string` binary search + `get_field` binary
  * search (metadata.rs:162-184, read.rs:156-171); a miss at any step
  * yields SQL NULL.
  */
case class VariantGet(
    child: Expression,
    path: String,
    targetType: DataType,
    failOnError: Boolean = false) extends UnaryExpression with GraftUnaryCodegen {

  @transient private lazy val steps: Array[PathStep] = VariantPath.parse(path)

  /** Decoded-metadata amortization (SURVEY §4.2.3): rows read back from
    * parquet/shuffle repeat the same metadata bytes file- or
    * partition-wide, so the key→id binary searches resolve once and
    * reuse until the bytes change — the Spark-native restoration of the
    * reference's batch-shared dictionary
    * (/root/reference/arrow-open-variant/src/json.rs:51-63).
    * Slots: 0 = metadata bytes, 1 = resolved ids.
    */
  @transient private lazy val idCache: ThreadLocal[Array[AnyRef]] =
    ThreadLocal.withInitial(() => new Array[AnyRef](2))

  override def dataType: DataType = targetType
  override def nullable: Boolean = true
  override def prettyName: String = if (failOnError) "variant_get" else "try_variant_get"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VariantSchema.isVariantStruct(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"variant_get expects a variant struct, got: ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val metaBytes = row.getBinary(0)
    val valBytes = row.getBinary(1)
    if (valBytes == null) return null
    val meta = new MetadataView(metaBytes, 0)
    val cache = idCache.get()
    val ids: Array[Int] =
      if (cache(0) != null &&
          java.util.Arrays.equals(cache(0).asInstanceOf[Array[Byte]], metaBytes))
        cache(1).asInstanceOf[Array[Int]]
      else {
        val r = VariantPath.resolveIds(meta, steps)
        // getBinary returns a fresh copy per call — safe to hold
        cache(0) = metaBytes
        cache(1) = r
        r
      }
    val v = VariantPath.walkWithIds(new VariantView(valBytes, 0), steps, ids)
    if (v == null) null else VariantExtract.cast(meta, v, targetType, failOnError)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `variant_get_all(v, '$.path'[, 'type'])`: like variant_get but the
  * path may contain `[*]` array wildcards — returns EVERY match as an
  * array (document order: array indices ascending, depth-first across
  * wildcard branches). The multi-valued extraction Snowflake/Databricks
  * users reach for with FLATTEN-then-aggregate, done in one walk with
  * no row explosion: `$.items[*].qty` over an order document yields the
  * quantity array directly. Misses prune their branch (an element
  * without the key contributes nothing); zero matches yield an EMPTY
  * array — SQL NULL is reserved for NULL input. Element casts use try
  * semantics (uncastable match → NULL element), matching
  * try_variant_get. A wildcard-free path degenerates to a 0/1-element
  * array.
  */
case class VariantGetAll(
    child: Expression,
    path: String,
    elemType: DataType) extends UnaryExpression with GraftUnaryCodegen {

  @transient private lazy val steps: Array[PathStep] = VariantPath.parse(path)

  /** Same decoded-metadata id cache as VariantGet (SURVEY §4.2.3). */
  @transient private lazy val idCache: ThreadLocal[Array[AnyRef]] =
    ThreadLocal.withInitial(() => new Array[AnyRef](2))

  override def dataType: DataType = ArrayType(elemType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "variant_get_all"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VariantSchema.isVariantStruct(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"variant_get_all expects a variant struct, got: ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val metaBytes = row.getBinary(0)
    val valBytes = row.getBinary(1)
    if (valBytes == null) return null
    val meta = new MetadataView(metaBytes, 0)
    val cache = idCache.get()
    val ids: Array[Int] =
      if (cache(0) != null &&
          java.util.Arrays.equals(cache(0).asInstanceOf[Array[Byte]], metaBytes))
        cache(1).asInstanceOf[Array[Int]]
      else {
        val r = VariantPath.resolveIds(meta, steps)
        cache(0) = metaBytes
        cache(1) = r
        r
      }
    val hits = new scala.collection.mutable.ArrayBuffer[graft.variant.VariantView](8)
    VariantPath.walkAll(meta, new VariantView(valBytes, 0), steps, ids, hits)
    val out = new Array[Any](hits.length)
    var i = 0
    while (i < hits.length) {
      out(i) = VariantExtract.cast(meta, hits(i), elemType, failOnError = false)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `variant_typeof(v)`: human-readable type of the variant root. */
case class VariantTypeOf(child: Expression) extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (VariantSchema.isVariantStruct(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"variant_typeof expects a variant struct, got: ${child.dataType.simpleString}")
  override def prettyName: String = "variant_typeof"
  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    UTF8String.fromString(new VariantView(row.getBinary(1), 0).typeName)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `is_variant_null(v)`: true iff the variant encodes the JSON `null`
  * primitive (distinct from SQL NULL — SURVEY §1.4).
  */
case class IsVariantNull(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "is_variant_null"
  override def checkInputDataTypes(): TypeCheckResult =
    if (VariantSchema.isVariantStruct(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"is_variant_null expects a variant struct, got: ${child.dataType.simpleString}")
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else new VariantView(v.asInstanceOf[InternalRow].getBinary(1), 0).isNull
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `variant_to_json(v)`: compact JSON text of the whole variant (parity
  * extension — inverse of the reference's only kernel).
  */
case class VariantToJson(child: Expression) extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "variant_to_json"
  override def checkInputDataTypes(): TypeCheckResult =
    if (VariantSchema.isVariantStruct(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"variant_to_json expects a variant struct, got: ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    UTF8String.fromString(
      VariantJsonCodec.toJsonString(row.getBinary(0), row.getBinary(1)))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `to_variant(anyCol)`: encode a typed Spark value (scalar, struct,
  * array, map<string,_>) as a variant — parity extension enabling
  * variant creation from relational data (SURVEY §3.2 "writer path").
  */
case class ToVariant(child: Expression) extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = VariantSchema.TYPE
  override def prettyName: String = "to_variant"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case NullType | BooleanType | ByteType | ShortType | IntegerType | LongType |
          FloatType | DoubleType | _: DecimalType | StringType | BinaryType |
          DateType | TimestampType | TimestampNTZType => true
      case ArrayType(et, _) => ok(et)
      case MapType(StringType, vt, _) => ok(vt)
      case s: StructType => s.fields.forall(f => ok(f.dataType))
      case _ => false
    }
    if (ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"to_variant does not support type: ${child.dataType.simpleString}")
  }

  private def collectKeys(value: Any, dt: DataType, out: java.util.ArrayList[String]): Unit = {
    if (value == null) return
    dt match {
      case s: StructType =>
        val row = value.asInstanceOf[InternalRow]
        var i = 0
        while (i < s.length) {
          out.add(s(i).name)
          if (!row.isNullAt(i)) collectKeys(row.get(i, s(i).dataType), s(i).dataType, out)
          i += 1
        }
      case ArrayType(et, _) =>
        val arr = value.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i)) collectKeys(arr.get(i, et), et, out)
          i += 1
        }
      case MapType(StringType, vt, _) =>
        val map = value.asInstanceOf[MapData]
        val keys = map.keyArray()
        val vals = map.valueArray()
        var i = 0
        while (i < map.numElements()) {
          out.add(keys.getUTF8String(i).toString)
          if (!vals.isNullAt(i)) collectKeys(vals.get(i, vt), vt, out)
          i += 1
        }
      case _ => ()
    }
  }

  private def convert(value: Any, dt: DataType, buf: ByteBuf,
                      ids: java.util.HashMap[String, Integer]): Unit = {
    if (value == null) { VariantWriter.writeNull(buf); return }
    dt match {
      case NullType => VariantWriter.writeNull(buf)
      case BooleanType => VariantWriter.writeBoolean(buf, value.asInstanceOf[Boolean])
      case ByteType => VariantWriter.writeLong(buf, value.asInstanceOf[Byte].toLong)
      case ShortType => VariantWriter.writeLong(buf, value.asInstanceOf[Short].toLong)
      case IntegerType => VariantWriter.writeLong(buf, value.asInstanceOf[Int].toLong)
      case LongType => VariantWriter.writeLong(buf, value.asInstanceOf[Long])
      case FloatType => VariantWriter.writeFloat(buf, value.asInstanceOf[Float])
      case DoubleType => VariantWriter.writeDouble(buf, value.asInstanceOf[Double])
      case d: DecimalType =>
        val dec = value.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
        VariantWriter.writeDecimal(buf, dec.unscaledValue(), dec.scale())
      case StringType => VariantWriter.writeStringBytes(buf, value.asInstanceOf[UTF8String].getBytes)
      case BinaryType => VariantWriter.writeBinary(buf, value.asInstanceOf[Array[Byte]])
      case DateType => VariantWriter.writeDate(buf, value.asInstanceOf[Int])
      case TimestampType => VariantWriter.writeTimestamp(buf, value.asInstanceOf[Long])
      case TimestampNTZType => VariantWriter.writeTimestampNtz(buf, value.asInstanceOf[Long])
      case s: StructType =>
        val row = value.asInstanceOf[InternalRow]
        val ob = new VariantObjectBuilder(buf)
        var i = 0
        while (i < s.length) {
          val id = ids.get(s(i).name)
          convert(if (row.isNullAt(i)) null else row.get(i, s(i).dataType),
            s(i).dataType, ob.fieldBuffer(id), ids)
          i += 1
        }
        ob.finish()
      case ArrayType(et, _) =>
        val arr = value.asInstanceOf[ArrayData]
        val ab = new VariantArrayBuilder(buf)
        var i = 0
        while (i < arr.numElements()) {
          convert(if (arr.isNullAt(i)) null else arr.get(i, et), et, ab.elementBuffer(), ids)
          i += 1
        }
        ab.finish()
      case MapType(StringType, vt, _) =>
        val map = value.asInstanceOf[MapData]
        val keys = map.keyArray()
        val vals = map.valueArray()
        val ob = new VariantObjectBuilder(buf)
        var i = 0
        while (i < map.numElements()) {
          val id = ids.get(keys.getUTF8String(i).toString)
          convert(if (vals.isNullAt(i)) null else vals.get(i, vt), vt, ob.fieldBuffer(id), ids)
          i += 1
        }
        ob.finish()
      case other =>
        throw new UnsupportedOperationException(s"to_variant: ${other.simpleString}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val keys = new java.util.ArrayList[String]()
    collectKeys(input, child.dataType, keys)
    val (metaBytes, ids) = VariantMetadata.build(keys)
    val buf = new ByteBuf(64)
    convert(input, child.dataType, buf, ids)
    new GenericInternalRow(Array[Any](metaBytes, buf.result()))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
