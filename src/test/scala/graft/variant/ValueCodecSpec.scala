package graft.variant

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Mirrors the reference's value writer/reader tests
  * (/root/reference/open-variant/src/values/write.rs:276-407), plus
  * boundary cases at the is_large and width switches (FIXTURES §A.5).
  */
class ValueCodecSpec extends AnyFunSuite {

  private def write(f: ByteBuf => Unit): VariantView = {
    val b = new ByteBuf()
    f(b)
    new VariantView(b.result(), 0)
  }

  test("bool round-trip (write.rs:283-301)") {
    assert(write(VariantWriter.writeBoolean(_, true)).getBoolean)
    assert(!write(VariantWriter.writeBoolean(_, false)).getBoolean)
  }

  test("integer round-trip incl. extremes (write.rs:303-319)") {
    for (v <- Seq(0L, -100L, 100L, Long.MaxValue, Long.MinValue,
        127L, 128L, -128L, -129L, 32767L, 32768L,
        Int.MaxValue.toLong, Int.MaxValue + 1L)) {
      val view = write(VariantWriter.writeLong(_, v))
      assert(view.isLong && view.getLong == v, s"for $v")
    }
  }

  test("narrowest int encoding chosen") {
    assert(write(VariantWriter.writeLong(_, 7L)).typeInfo == VariantConst.P_INT8)
    assert(write(VariantWriter.writeLong(_, 300L)).typeInfo == VariantConst.P_INT16)
    assert(write(VariantWriter.writeLong(_, 70000L)).typeInfo == VariantConst.P_INT32)
    assert(write(VariantWriter.writeLong(_, 1L << 40)).typeInfo == VariantConst.P_INT64)
  }

  test("double round-trip (write.rs:343)") {
    for (v <- Seq(23.0, 32.0, -1.5e300, 0.1, Double.MinPositiveValue)) {
      assert(write(VariantWriter.writeDouble(_, v)).getDouble == v)
    }
  }

  test("decimal round-trip incl. large negatives (SURVEY §2.1 row 35)") {
    import java.math.BigInteger
    val cases = Seq(
      (BigInteger.valueOf(12345), 2),
      (BigInteger.valueOf(-12345), 2),
      (BigInteger.valueOf(Long.MaxValue), 0),
      (BigInteger.valueOf(Long.MinValue), 0), // reference truncates this one
      (new BigInteger("170141183460469231731687303715884105727"), 10), // i128 max
      (new BigInteger("-170141183460469231731687303715884105728"), 10)) // i128 min
    for ((unscaled, scale) <- cases) {
      val view = write(VariantWriter.writeDecimal(_, unscaled, scale))
      val d = view.getDecimal
      assert(d.unscaledValue() == unscaled && d.scale() == scale, s"for $unscaled/$scale")
    }
  }

  test("decimal scale bounds") {
    intercept[IllegalArgumentException] {
      write(VariantWriter.writeDecimal(_, java.math.BigInteger.ONE, 39))
    }
    intercept[IllegalArgumentException] {
      write(VariantWriter.writeDecimal(_,
        new java.math.BigInteger("170141183460469231731687303715884105728"), 0)) // 2^127
    }
  }

  test("string round-trip: short and long forms") {
    val short = "hello world"
    val v1 = write(VariantWriter.writeString(_, short))
    assert(v1.basicType == VariantConst.BASIC_SHORT_STR && v1.getString == short)
    val exactly63 = "x" * 63
    assert(write(VariantWriter.writeString(_, exactly63)).getString == exactly63)
    val long = "y" * 64
    val v2 = write(VariantWriter.writeString(_, long))
    assert(v2.basicType == VariantConst.BASIC_PRIMITIVE &&
      v2.typeInfo == VariantConst.P_LONG_STR && v2.getString == long)
    val unicode = "héllo wörld ≠ ascii 🎉"
    assert(write(VariantWriter.writeString(_, unicode)).getString == unicode)
  }

  test("binary / date / timestamp round-trip (ids the reference declares but never implements)") {
    val bytes = Array[Byte](1, 2, 3, -1, 0)
    assert(write(VariantWriter.writeBinary(_, bytes)).getBinary.toSeq == bytes.toSeq)
    assert(write(VariantWriter.writeDate(_, 19723)).getDateDays == 19723)
    assert(write(VariantWriter.writeDate(_, -100)).getDateDays == -100)
    assert(write(VariantWriter.writeTimestamp(_, 1700000000123456L)).getTimestampMicros == 1700000000123456L)
    assert(write(VariantWriter.writeFloat(_, 1.5f)).getDouble == 1.5)
  }

  test("object build with out-of-lexical-order appends (write.rs:321-368)") {
    val (metaBytes, ids) = VariantMetadata.build(Seq("user_id", "date", "score").asJava)
    val meta = new MetadataView(metaBytes, 0)
    val buf = new ByteBuf()
    val ob = new VariantObjectBuilder(buf)
    VariantWriter.writeLong(ob.fieldBuffer(ids.get("user_id")), 42L)
    VariantWriter.writeString(ob.fieldBuffer(ids.get("date")), "2024-01-01")
    VariantWriter.writeDouble(ob.fieldBuffer(ids.get("score")), 98.6)
    ob.finish()
    val view = new VariantView(buf.result(), 0)
    assert(view.isObject)
    val o = view.getObject
    assert(o.numElements == 3)
    // field ids stored sorted ascending = lexical key order
    assert((0 until 3).map(o.fieldIdAt).toSeq.sorted == (0 until 3).map(o.fieldIdAt).toSeq)
    assert(o.getField(meta.findKey("user_id")).getLong == 42L)
    assert(o.getField(meta.findKey("date")).getString == "2024-01-01")
    assert(o.getField(meta.findKey("score")).getDouble == 98.6)
    assert(o.getField(999) == null)
  }

  test("array of mixed types (write.rs:370-406)") {
    val buf = new ByteBuf()
    val ab = new VariantArrayBuilder(buf)
    VariantWriter.writeLong(ab.elementBuffer(), 1L)
    VariantWriter.writeString(ab.elementBuffer(), "b")
    VariantWriter.writeDouble(ab.elementBuffer(), 3.0)
    ab.finish()
    val a = new VariantView(buf.result(), 0).getArray
    assert(a.numElements == 3)
    assert(a.elementAt(0).getLong == 1L)
    assert(a.elementAt(1).getString == "b")
    assert(a.elementAt(2).getDouble == 3.0)
    assert(a.elementAt(3) == null)
    assert(a.elementAt(-1) == null)
  }

  test("is_large switch: arrays of 255 and 256 elements") {
    for (n <- Seq(255, 256, 300)) {
      val buf = new ByteBuf()
      val ab = new VariantArrayBuilder(buf)
      (0 until n).foreach(i => VariantWriter.writeLong(ab.elementBuffer(), i.toLong))
      ab.finish()
      val a = new VariantView(buf.result(), 0).getArray
      assert(a.isLarge == (n > 255))
      assert(a.numElements == n)
      (0 until n).foreach(i => assert(a.elementAt(i).getLong == i.toLong))
    }
  }

  test("object with >255 fields and wide field ids stays self-consistent (SURVEY §1.3 header bug)") {
    val keys = (0 until 300).map(i => f"k$i%04d")
    val (metaBytes, ids) = VariantMetadata.build(keys.asJava)
    val meta = new MetadataView(metaBytes, 0)
    val buf = new ByteBuf()
    val ob = new VariantObjectBuilder(buf)
    keys.foreach(k => VariantWriter.writeLong(ob.fieldBuffer(ids.get(k)), ids.get(k).toLong))
    ob.finish()
    val o = new VariantView(buf.result(), 0).getObject
    assert(o.isLarge && o.numElements == 300 && o.fieldIdSize == 2)
    keys.foreach { k =>
      val id = meta.findKey(k)
      assert(o.getField(id).getLong == id.toLong)
    }
  }

  test("few fields but large field ids → wide ids, small count (the reference's unpatched-header case)") {
    val keys = (0 until 200).map(i => f"k$i%04d")
    val (metaBytes, ids) = VariantMetadata.build(keys.asJava)
    val buf = new ByteBuf()
    val ob = new VariantObjectBuilder(buf)
    // two fields whose ids exceed 127 → field_id_size must be 2
    VariantWriter.writeLong(ob.fieldBuffer(ids.get("k0190")), 1L)
    VariantWriter.writeLong(ob.fieldBuffer(ids.get("k0199")), 2L)
    ob.finish()
    val o = new VariantView(buf.result(), 0).getObject
    assert(!o.isLarge && o.numElements == 2 && o.fieldIdSize == 2)
    val meta = new MetadataView(metaBytes, 0)
    assert(o.getField(meta.findKey("k0190")).getLong == 1L)
    assert(o.getField(meta.findKey("k0199")).getLong == 2L)
  }

  test("reader accepts reference-style encodings our writer never emits") {
    // The reference writer always uses Int64 for integers and the long
    // string form (write.rs:29-33, 60-65); our writer picks narrower
    // encodings. The reader must accept both. Hand-craft the reference
    // forms byte-by-byte:
    import VariantConst._
    val b = new ByteBuf()
    // int64-encoded 5: header (6<<2|0), 8 LE bytes
    b.addByte(primitiveHeader(P_INT64)); b.addIntLE(5L, 8)
    val i64 = new VariantView(b.result(), 0)
    assert(i64.isLong && i64.getLong == 5L)

    val s = new ByteBuf()
    // long-string-encoded "hi": header (16<<2|0), 4-byte LE len, bytes
    s.addByte(primitiveHeader(P_LONG_STR)); s.addIntLE(2, 4)
    s.addBytes("hi".getBytes("UTF-8"))
    val str = new VariantView(s.result(), 0)
    assert(str.isString && str.getString == "hi")

    // object with one int64 field, 1-byte ids/offsets (reference frame):
    // header bits: is_large=0, id_size=1, offset_size=1 → value_header 0
    val o = new ByteBuf()
    o.addByte(header(0, BASIC_OBJECT))
    o.addByte(1) // count
    o.addByte(0) // field id 0
    o.addByte(0); o.addByte(9) // offsets 0, 9 (int64 value = 9 bytes)
    o.addByte(primitiveHeader(P_INT64)); o.addIntLE(42L, 8)
    val (metaBytes, _) = VariantMetadata.build(java.util.List.of("answer"))
    val meta = new MetadataView(metaBytes, 0)
    val obj = new VariantView(o.result(), 0).getObject
    assert(obj.numElements == 1 && obj.getField(meta.findKey("answer")).getLong == 42L)
    // trailing junk after the value buffer is tolerated (reference
    // read-path property, metadata.rs:95-96)
    val padded = o.result() ++ Array.fill[Byte](7)(0x55)
    assert(new VariantView(padded, 0).getObject.getField(0).getLong == 42L)
  }

  test("dictionary-reference ids 17/18 round-trip through all readers") {
    val (metaBytes, ids) = VariantMetadata.build(java.util.List.of("alpha", "beta", "42"))
    val meta = new MetadataView(metaBytes, 0)

    val sb = new ByteBuf()
    VariantWriter.writeStringFromDict(sb, meta.findKey("beta"))
    val sv = new VariantView(sb.result(), 0)
    assert(sv.isDictString && !sv.isString)
    assert(sv.sizeInBytes == 5 && sv.typeName == "string")
    assert(sv.getDictKey(meta) == "beta")
    // consumer surfaces: cast-to-string, JSON printer, schema inference
    assert(graft.functions.VariantExtract.asString(meta, sv) == "beta")
    assert(VariantJsonCodec.toJsonString(metaBytes, sb.result()) == "\"beta\"")
    assert(SchemaInfer.infer(meta, sv) == SchemaInfer.SString)
    // numeric dictionary payloads cast like strings
    val nb = new ByteBuf()
    VariantWriter.writeStringFromDict(nb, meta.findKey("42"))
    val nv = new VariantView(nb.result(), 0)
    assert(graft.functions.VariantExtract.cast(meta, nv,
      org.apache.spark.sql.types.LongType, failOnError = true) == 42L)

    val bb = new ByteBuf()
    VariantWriter.writeBinaryFromDict(bb, meta.findKey("alpha"))
    val bv = new VariantView(bb.result(), 0)
    assert(bv.isDictBinary && bv.typeName == "binary")
    val asBin = graft.functions.VariantExtract.cast(meta, bv,
      org.apache.spark.sql.types.BinaryType, failOnError = true)
    assert(java.util.Arrays.equals(asBin.asInstanceOf[Array[Byte]],
      "alpha".getBytes("UTF-8")))
    assert(SchemaInfer.infer(meta, bv) == SchemaInfer.SBinary)

    // out-of-range id is an error, not silent garbage
    val ob = new ByteBuf()
    VariantWriter.writeStringFromDict(ob, 99)
    intercept[IllegalStateException] {
      new VariantView(ob.result(), 0).getDictKey(meta)
    }
  }

  test("sizeInBytes matches encoded extent for nested values") {
    val buf = new ByteBuf()
    val ab = new VariantArrayBuilder(buf)
    VariantWriter.writeLong(ab.elementBuffer(), 1L)
    val inner = ab.elementBuffer()
    val ob = new VariantObjectBuilder(inner)
    val (_, ids) = VariantMetadata.build(Seq("a").asJava)
    VariantWriter.writeString(ob.fieldBuffer(ids.get("a")), "zzz")
    ob.finish()
    VariantWriter.writeDouble(ab.elementBuffer(), 2.5)
    ab.finish()
    val bytes = buf.result()
    val root = new VariantView(bytes, 0)
    assert(root.sizeInBytes == bytes.length)
    val copied = root.getArray.elementAt(1).copyBytes
    val obj = new VariantView(copied, 0)
    assert(obj.isObject && obj.getObject.numElements == 1)
  }
}
