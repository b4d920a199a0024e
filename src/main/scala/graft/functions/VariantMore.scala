package graft.functions

import graft.variant._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `variant_explode(v)`: one output row per object field (pos, key,
  * value) or array element (pos, NULL, value); scalars and SQL NULL
  * produce no rows. The per-step primitive is the reference's
  * polymorphic `VariantRef::field`
  * (/root/reference/open-variant/src/values/read.rs:87-93), lifted to a
  * Spark Generator — the natural UDTF parity extension (SURVEY §2.2).
  */
case class VariantExplode(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", VariantSchema.TYPE, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (VariantSchema.isVariantStruct(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"variant_explode expects a variant struct, got: ${child.dataType.simpleString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val row = v.asInstanceOf[InternalRow]
    val metaBytes = row.getBinary(0)
    val valBytes = row.getBinary(1)
    val meta = new MetadataView(metaBytes, 0)
    val view = new VariantView(valBytes, 0)
    if (view.isObject) {
      val o = view.getObject
      (0 until o.numElements).map { i =>
        new GenericInternalRow(Array[Any](
          i,
          UTF8String.fromString(meta.getKey(o.fieldIdAt(i))),
          new GenericInternalRow(Array[Any](metaBytes, o.valueAt(i).copyBytes))))
      }
    } else if (view.isArray) {
      val a = view.getArray
      (0 until a.numElements).map { i =>
        new GenericInternalRow(Array[Any](
          i, null,
          new GenericInternalRow(Array[Any](metaBytes, a.elementAt(i).copyBytes))))
      }
    } else Nil
  }

  override def prettyName: String = "variant_explode"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `variant_flatten(v)` — recursive introspection table (the
  * SQLite-json_tree shape): one row per NODE, depth-first in document
  * order, as (path, typ, leaf). Containers carry a SQL-NULL leaf;
  * scalars render through the canonical JSON printer (numbers plain,
  * strings quoted+escaped, JSON null as `null` text — distinct from
  * the container SQL NULL). Paths use the variant_get language:
  * identifier-like keys (`[A-Za-z0-9_]+`) as `.key`, anything else
  * quoted `['k ey']`, array elements `[i]` — so every emitted path is
  * directly replayable through `variant_get`/`variant_get_all`. The
  * `typ` column exposes the writer's narrowest-int choice (tinyint/
  * smallint/int/bigint), which the driver oracle derives from value
  * ranges — an encoding-rule gate, not just an introspection one.
  */
case class VariantFlatten(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("typ", StringType, nullable = false),
    StructField("leaf", StringType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (VariantSchema.isVariantStruct(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"variant_flatten expects a variant struct, got: ${child.dataType.simpleString}")

  private val identKey = "[A-Za-z0-9_]+".r

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val row = v.asInstanceOf[InternalRow]
    val metaBytes = row.getBinary(0)
    val valBytes = row.getBinary(1)
    if (valBytes == null) return Nil
    val meta = new MetadataView(metaBytes, 0)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    def emit(path: String, typ: String, leaf: String): Unit =
      out += new GenericInternalRow(Array[Any](
        UTF8String.fromString(path), UTF8String.fromString(typ),
        if (leaf == null) null else UTF8String.fromString(leaf)))
    def rec(view: VariantView, path: String): Unit =
      if (view.isObject) {
        emit(path, "object", null)
        val o = view.getObject
        var i = 0
        while (i < o.numElements) {
          val key = meta.getKey(o.fieldIdAt(i))
          // backslash then quote: both escapes replay through
          // VariantPath.parse's quoted-key branch (escape-aware)
          val step =
            if (identKey.pattern.matcher(key).matches()) s".$key"
            else s"['${key.replace("\\", "\\\\").replace("'", "\\'")}']"
          rec(o.valueAt(i), path + step)
          i += 1
        }
      } else if (view.isArray) {
        emit(path, "array", null)
        val a = view.getArray
        var i = 0
        while (i < a.numElements) {
          rec(a.elementAt(i), s"$path[$i]")
          i += 1
        }
      } else {
        emit(path, view.typeName,
          VariantJsonCodec.toJsonString(metaBytes, view.copyBytes))
      }
    rec(new VariantView(valBytes, 0), "$")
    out
  }

  override def prettyName: String = "variant_flatten"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `variant_get_multi(v, fields)`: extract MANY paths in one evaluation —
  * the metadata dictionary is decoded and each frame walked once per
  * row, not once per field. This is the shredding workhorse: projecting
  * k fields through k separate `variant_get`s costs k header decodes +
  * k binary searches per shared path prefix; this costs one.
  */
/** Multi-path extraction in one decode. Deliberately NOT rewritten by
  * the fusion rule over `variant_from_json`: a fused
  * struct-of-token-walks cannot produce the NULL STRUCT this returns
  * when the parse itself is null (CreateNamedStruct is never null), and
  * guarding with an extra validating walk costs the fusion's margin.
  * The thread-local parse memo already dedups the parse across
  * optimizer copies, and the id cache amortizes key resolution.
  */
case class VariantGetMulti(
    child: Expression,
    fields: Seq[(String, DataType, String)]) extends UnaryExpression with GraftUnaryCodegen {
  require(fields.nonEmpty, "variant_get_multi needs at least one field")

  @transient private lazy val steps: Array[Array[graft.variant.PathStep]] =
    fields.map(f => graft.variant.VariantPath.parse(f._1)).toArray

  /** Same decoded-metadata amortization as VariantGet, across the whole
    * field set: one id resolution per distinct metadata, not per row.
    */
  @transient private lazy val idCache: ThreadLocal[Array[AnyRef]] =
    ThreadLocal.withInitial(() => new Array[AnyRef](2))

  override def dataType: DataType =
    StructType(fields.map { case (_, dt, name) => StructField(name, dt, nullable = true) })
  override def nullable: Boolean = true
  override def prettyName: String = "variant_get_multi"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VariantSchema.isVariantStruct(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"variant_get_multi expects a variant struct, got: ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val metaBytes = row.getBinary(0)
    val meta = new MetadataView(metaBytes, 0)
    val root = new VariantView(row.getBinary(1), 0)
    val cache = idCache.get()
    val allIds: Array[Array[Int]] =
      if (cache(0) != null &&
          java.util.Arrays.equals(cache(0).asInstanceOf[Array[Byte]], metaBytes))
        cache(1).asInstanceOf[Array[Array[Int]]]
      else {
        val r = steps.map(graft.variant.VariantPath.resolveIds(meta, _))
        cache(0) = metaBytes
        cache(1) = r
        r
      }
    val out = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      val v = graft.variant.VariantPath.walkWithIds(root, steps(i), allIds(i))
      out(i) =
        if (v == null) null
        else VariantExtract.cast(meta, v, fields(i)._2, failOnError = false)
      i += 1
    }
    new GenericInternalRow(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `variant_keys(v)`: the root object's key names in dictionary (sorted
  * UTF-8) order; NULL for non-objects.
  */
case class VariantKeys(child: Expression) extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // non-objects yield NULL
  override def prettyName: String = "variant_keys"
  override def checkInputDataTypes(): TypeCheckResult =
    if (VariantSchema.isVariantStruct(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"variant_keys expects a variant struct, got: ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val meta = new MetadataView(row.getBinary(0), 0)
    val v = new VariantView(row.getBinary(1), 0)
    if (!v.isObject) return null
    val o = v.getObject
    val out = new Array[Any](o.numElements)
    var i = 0
    while (i < o.numElements) {
      out(i) = UTF8String.fromString(meta.getKey(o.fieldIdAt(i)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `variant_size(v)`: field count for objects, element count for arrays,
  * NULL for scalars.
  */
case class VariantSize(child: Expression) extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // scalars yield NULL
  override def prettyName: String = "variant_size"
  override def checkInputDataTypes(): TypeCheckResult =
    if (VariantSchema.isVariantStruct(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"variant_size expects a variant struct, got: ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val v = new VariantView(row.getBinary(1), 0)
    if (v.isObject) v.getObject.numElements
    else if (v.isArray) v.getArray.numElements
    else null
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `schema_of_variant(v)`: render the inferred type of one variant value
  * (e.g. `object<k: bigint>`).
  */
case class SchemaOfVariant(child: Expression) extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "schema_of_variant"
  override def checkInputDataTypes(): TypeCheckResult =
    if (VariantSchema.isVariantStruct(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"schema_of_variant expects a variant struct, got: ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val meta = new MetadataView(row.getBinary(0), 0)
    val v = new VariantView(row.getBinary(1), 0)
    UTF8String.fromString(SchemaInfer.infer(meta, v).render)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bottomk_by_hash(s, k)`: deterministic uniform sample — the k values
  * with the smallest md5 digests. A mergeable sketch (union then trim),
  * so partial aggregation works and the result is independent of row
  * order, partitioning, and cluster size: the property that makes a
  * sample reproducible across runs of a 100 TB pipeline. md5 (not our
  * fnv) so an external SQL engine can replay the selection exactly.
  */
case class BottomKByHash(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[String, String]] with UnaryLike[Expression] {
  require(k > 0 && k <= 100000, s"sample size out of range: $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottomk_by_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bottomk_by_hash expects string, got: ${other.simpleString}")
  }

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  // buffer key "md5hex value" keeps equal-hash distinct values apart
  override def createAggregationBuffer(): java.util.TreeMap[String, String] =
    new java.util.TreeMap[String, String]()

  private def trim(buf: java.util.TreeMap[String, String]): Unit =
    while (buf.size() > k) buf.remove(buf.lastKey())

  override def update(buf: java.util.TreeMap[String, String], input: InternalRow): java.util.TreeMap[String, String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.put(md5hex(s) + " " + s, s)
      trim(buf)
    }
    buf
  }

  override def merge(a: java.util.TreeMap[String, String], b: java.util.TreeMap[String, String]): java.util.TreeMap[String, String] = {
    a.putAll(b)
    trim(a)
    a
  }

  override def eval(buf: java.util.TreeMap[String, String]): Any = {
    val out = new Array[Any](buf.size())
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[String, String]): Array[Byte] = {
    val sb = new java.lang.StringBuilder()
    val it = buf.values().iterator()
    while (it.hasNext) {
      val s = it.next()
      sb.append(s.length).append(':').append(s)
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[String, String] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < s.length) {
      val colon = s.indexOf(':', i)
      val len = s.substring(i, colon).toInt
      val v = s.substring(colon + 1, colon + 1 + len)
      buf.put(md5hex(v) + " " + v, v)
      i = colon + 1 + len
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `schema_of_variant_agg(v)`: least-upper-bound schema across all rows
  * of a group — a TypedImperativeAggregate whose buffer is the SType
  * lattice value; partial aggregation (map-side combine) works because
  * the merge is associative and commutative.
  */
case class SchemaOfVariantAgg(
    child: Expression,
    renderOutput: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SchemaInfer.SType] with UnaryLike[Expression] {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "schema_of_variant_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VariantSchema.isVariantStruct(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"schema_of_variant_agg expects a variant struct, got: ${child.dataType.simpleString}")

  override def createAggregationBuffer(): SchemaInfer.SType = SchemaInfer.SNull

  override def update(buffer: SchemaInfer.SType, input: InternalRow): SchemaInfer.SType = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val row = v.asInstanceOf[InternalRow]
      val inferred = SchemaInfer.infer(
        new MetadataView(row.getBinary(0), 0),
        new VariantView(row.getBinary(1), 0))
      SchemaInfer.merge(buffer, inferred)
    }
  }

  override def merge(a: SchemaInfer.SType, b: SchemaInfer.SType): SchemaInfer.SType =
    SchemaInfer.merge(a, b)

  override def eval(buffer: SchemaInfer.SType): Any =
    UTF8String.fromString(
      if (renderOutput) buffer.render else SchemaInfer.serialize(buffer))

  override def serialize(buffer: SchemaInfer.SType): Array[Byte] =
    SchemaInfer.serialize(buffer).getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def deserialize(bytes: Array[Byte]): SchemaInfer.SType =
    SchemaInfer.deserialize(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))

  override def withNewMutableAggBufferOffset(newOffset: Int): SchemaOfVariantAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SchemaOfVariantAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `misra_gries(s, k)`: mergeable frequent-items sketch with k counters
  * (Misra-Gries; merge rule per Agarwal et al., "Mergeable Summaries":
  * sum counters, subtract the (k+1)-largest count, drop non-positive).
  * Guarantee: every item with true frequency > n/(k+1) survives with a
  * positive (under)count, independent of row order and partitioning —
  * so a second EXACT pass over the (≤k) candidates yields the exact,
  * deterministic heavy-hitter set: the standard two-pass pattern that
  * turns an approximate sketch into an oracle-checkable operator at
  * 100 TB (candidate generation reads everything once; verification
  * touches only candidate rows).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
    with UnaryLike[Expression] {
  require(k > 0 && k <= 100000, s"counter count out of range: $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects string, got: ${other.simpleString}")
  }

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(buf: java.util.HashMap[String, java.lang.Long],
                      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val s = v.asInstanceOf[UTF8String].toString
    val cur = buf.get(s)
    if (cur != null) buf.put(s, cur + 1L)
    else if (buf.size() < k) buf.put(s, 1L)
    else {
      // decrement-all eviction: drop zeros, the arriving item is absorbed
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, java.lang.Long],
                     b: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (a.size() > k) {
      // subtract the (k+1)-largest count, drop non-positive
      val counts = new Array[Long](a.size())
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - k - 1)
      val eit = a.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= sub) eit.remove() else e.setValue(e.getValue - sub)
      }
    }
    a
  }

  /** Candidate ITEMS only (sorted for determinism of the array shape);
    * counts are undercounts and stay internal — consumers re-count
    * candidates exactly.
    */
  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val keys = new java.util.ArrayList[String](buf.keySet())
    java.util.Collections.sort(keys)
    val out = new Array[Any](keys.size())
    var i = 0
    while (i < out.length) { out(i) = UTF8String.fromString(keys.get(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    val sb = new java.lang.StringBuilder()
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      sb.append(e.getKey.length).append(':').append(e.getKey).append('=')
        .append(e.getValue.longValue()).append(';')
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < s.length) {
      val colon = s.indexOf(':', i)
      val len = s.substring(i, colon).toInt
      val key = s.substring(colon + 1, colon + 1 + len)
      val eq = colon + 1 + len
      val semi = s.indexOf(';', eq)
      buf.put(key, java.lang.Long.parseLong(s.substring(eq + 1, semi)))
      i = semi + 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
