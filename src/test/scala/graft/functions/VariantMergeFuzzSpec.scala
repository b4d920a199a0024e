package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Differential fuzz for `variant_merge_patch`: 300 seeded random
  * document pairs merged by our variant-tree implementation vs an
  * INDEPENDENT model built on Jackson JSON trees (no shared code with
  * VariantMerge) — the two only agree if the RFC semantics, the
  * decode, and the canonical re-encode are all right.
  */
class VariantMergeFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.{ObjectNode, NullNode}
  private val mapper = new ObjectMapper()

  /** RFC 7386 on Jackson trees — the reference model. */
  private def modelMerge(target: JsonNode, patch: JsonNode): JsonNode =
    if (!patch.isObject) patch.deepCopy[JsonNode]()
    else {
      val out = (if (target.isObject) target.deepCopy[JsonNode]().asInstanceOf[ObjectNode]
                 else mapper.createObjectNode())
      val it = patch.fields()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNull) out.remove(e.getKey)
        else out.set[JsonNode](e.getKey, modelMerge(
          Option(out.get(e.getKey)).getOrElse(NullNode.getInstance()), e.getValue))
      }
      out
    }

  /** Canonical text of a Jackson tree: keys sorted, compact — matches
    * our printer's formatting for the value space the generator emits
    * (ints, booleans, strings, arrays, objects, nulls). */
  private def canonical(n: JsonNode): String =
    if (n.isObject) {
      import scala.jdk.CollectionConverters._
      n.asInstanceOf[ObjectNode].fields().asScala.toSeq
        .sortBy(_.getKey)
        .map(e => "\"" + e.getKey + "\":" + canonical(e.getValue))
        .mkString("{", ",", "}")
    } else if (n.isArray) {
      (0 until n.size()).map(i => canonical(n.get(i))).mkString("[", ",", "]")
    } else n.toString

  /** Random JSON value; keys drawn from a small pool so target/patch
    * collide often (collisions are where merge semantics live). */
  private def gen(rnd: scala.util.Random, depth: Int): String = {
    val keys = Seq("a", "b", "c", "d", "e")
    rnd.nextInt(if (depth >= 3) 4 else 6) match {
      case 0 => rnd.nextInt(200).toString
      case 1 => "\"s" + rnd.nextInt(10) + "\""
      case 2 => if (rnd.nextBoolean()) "true" else "false"
      case 3 => "null"
      case 4 => // array
        (0 until rnd.nextInt(3)).map(_ => gen(rnd, depth + 1)).mkString("[", ",", "]")
      case _ => // object
        rnd.shuffle(keys).take(rnd.nextInt(4))
          .map(k => "\"" + k + "\":" + gen(rnd, depth + 1)).mkString("{", ",", "}")
    }
  }

  test("300 random pairs agree with an independent Jackson model") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    // targets/patches biased toward objects so recursion gets exercised
    val pairs = (1 to 300).map { i =>
      val t = "{" + Seq("a", "b", "c").map(k => "\"" + k + "\":" + gen(rnd, 1)).mkString(",") + "}"
      val p = "{" + rnd.shuffle(Seq("a", "b", "c", "d")).take(rnd.nextInt(4) + 1)
        .map(k => "\"" + k + "\":" + gen(rnd, 1)).mkString(",") + "}"
      (i, t, p)
    }
    val got = pairs.toDF("i", "t", "p")
      .selectExpr("i", "variant_to_json(variant_merge_patch(" +
        "variant_from_json(t), variant_from_json(p))) AS j")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    pairs.foreach { case (i, t, p) =>
      val expected = canonical(modelMerge(mapper.readTree(t), mapper.readTree(p)))
      assert(got(i) === expected, s"pair $i: target=$t patch=$p")
    }
  }

  // -------------------------------------------------------------------
  // Fusion parity: the optimizer rewrites the SQL surface to
  // JsonMergePatchFused, so the suite above now exercises the FUSED
  // plan; this block pins fused ≡ unfused byte-for-byte by direct
  // expression eval (no optimizer), keeping the unfused path tested.
  // -------------------------------------------------------------------
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.StringType

  private def evalPair(t: String, p: String): (Any, Any) = {
    val lt = Literal.create(t, StringType)
    val lp = Literal.create(p, StringType)
    val unfused = VariantMergePatch(VariantFromJson(lt), VariantFromJson(lp)).eval(InternalRow.empty)
    val fused = JsonMergePatchFused(lt, lp, failLeft = true, failRight = true).eval(InternalRow.empty)
    (unfused, fused)
  }

  private def assertSameBytes(t: String, p: String): Unit = {
    val (u, f) = evalPair(t, p)
    if (u == null || f == null) {
      assert(u == null && f == null, s"null mismatch: target=$t patch=$p unfused=$u fused=$f")
    } else {
      val ur = u.asInstanceOf[InternalRow]; val fr = f.asInstanceOf[InternalRow]
      assert(java.util.Arrays.equals(ur.getBinary(0), fr.getBinary(0)),
        s"metadata bytes differ: target=$t patch=$p")
      assert(java.util.Arrays.equals(ur.getBinary(1), fr.getBinary(1)),
        s"value bytes differ: target=$t patch=$p")
    }
  }

  test("fused and unfused merge agree byte-for-byte on 300 random pairs") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 300).foreach { _ =>
      val t = gen(rnd, 0)
      val p = gen(rnd, 0)
      assertSameBytes(t, p)
    }
  }

  test("fused parity on edge documents: top-level null, scalars, numbers, dup keys") {
    // SQL-null rule: a top-level JSON null on either side nulls the merge
    assertSameBytes("null", """{"a":1}""")
    assertSameBytes("""{"a":1}""", "null")
    // non-object patches replace wholesale
    assertSameBytes("""{"a":1}""", "3.5")
    assertSameBytes("42", """{"a":1}""")
    // number coercions: big int → decimal scale 0, float → double
    assertSameBytes("""{"a": 99999999999999999999999999}""", """{"b": 1e3}""")
    assertSameBytes("""{"a": 1.25}""", """{"a": 170141183460469231731687303715884105727}""")
    // duplicate keys collapse identically (last value, first position)
    assertSameBytes("""{"a":1,"b":2,"a":3}""", """{"b":{"x":1,"x":2}}""")
  }

  test("fused parity on errors: malformed, trailing tokens, i128 overflow, try_ semantics") {
    def unfusedFails(t: String, p: String): Boolean =
      try { VariantMergePatch(VariantFromJson(Literal.create(t, StringType)),
        VariantFromJson(Literal.create(p, StringType))).eval(InternalRow.empty); false }
      catch { case _: graft.variant.VariantJsonCodec.JsonParseException => true }
    def fusedFails(t: String, p: String): Boolean =
      try { JsonMergePatchFused(Literal.create(t, StringType), Literal.create(p, StringType),
        failLeft = true, failRight = true).eval(InternalRow.empty); false }
      catch { case _: graft.variant.VariantJsonCodec.JsonParseException => true }
    for ((t, p) <- Seq(
        ("""{"a":}""", """{"b":1}"""),            // malformed target
        ("""{"a":1}""", """{"b":"""),             // malformed patch
        ("""{"a":1} 2""", """{"b":1}"""),         // trailing tokens
        ("""{"a":1}""", "null null"),             // trailing after top null
        ("""{"a": 340282366920938463463374607431768211456}""", "{}"))) { // ≥ i128
      assert(unfusedFails(t, p) && fusedFails(t, p), s"error parity: target=$t patch=$p")
    }
    // try_ form: a failed side nulls the result instead of throwing
    val tryFused = JsonMergePatchFused(
      Literal.create("""{"a":}""", StringType), Literal.create("""{"b":1}""", StringType),
      failLeft = false, failRight = true).eval(InternalRow.empty)
    assert(tryFused == null)
  }

  // -------------------------------------------------------------------
  // Strip-keys fusion parity (round 8): same contract as the merge
  // fusion — fused ≡ unfused byte-for-byte, same SQL-null and error
  // semantics.
  // -------------------------------------------------------------------
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private def stripPair(j: String, keys: Seq[String]): (Any, Any) = {
    val lj = Literal.create(j, StringType)
    val lk = Literal(new GenericArrayData(keys.map(UTF8String.fromString).toArray),
      org.apache.spark.sql.types.ArrayType(StringType))
    val unfused = VariantStripKeys(VariantFromJson(lj), lk).eval(InternalRow.empty)
    val fused = JsonStripKeysFused(lj, lk, failFast = true).eval(InternalRow.empty)
    (unfused, fused)
  }

  private def assertStripSame(j: String, keys: Seq[String]): Unit = {
    val (u, f) = stripPair(j, keys)
    if (u == null || f == null) {
      assert(u == null && f == null, s"null mismatch: j=$j keys=$keys")
    } else {
      val ur = u.asInstanceOf[InternalRow]; val fr = f.asInstanceOf[InternalRow]
      assert(java.util.Arrays.equals(ur.getBinary(0), fr.getBinary(0)),
        s"metadata bytes differ: j=$j keys=$keys")
      assert(java.util.Arrays.equals(ur.getBinary(1), fr.getBinary(1)),
        s"value bytes differ: j=$j keys=$keys")
    }
  }

  test("fused and unfused strip_keys agree byte-for-byte on 300 random docs") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 300).foreach { _ =>
      val j = gen(rnd, 0)
      // strip a mix of hit-or-miss keys (the generator draws keys k0..k9)
      val keys = Seq("k" + rnd.nextInt(10), "k" + rnd.nextInt(10), "absent")
      assertStripSame(j, keys)
    }
  }

  test("strip_keys fusion parity on edges: top-level null, non-objects, all-keys, errors") {
    assertStripSame("null", Seq("a"))
    assertStripSame("42", Seq("a"))
    assertStripSame("[1,2]", Seq("a"))
    assertStripSame("""{"a":1,"b":{"a":2}}""", Seq("a")) // nested "a" survives
    assertStripSame("""{"a":1,"b":2}""", Seq("a", "b")) // empty object result
    assertStripSame("""{"a":1}""", Seq()) // no-op strip
    def fusedStripFails(j: String): Boolean =
      try { JsonStripKeysFused(Literal.create(j, StringType),
        Literal(new GenericArrayData(Array(UTF8String.fromString("a"))),
          org.apache.spark.sql.types.ArrayType(StringType)),
        failFast = true).eval(InternalRow.empty); false }
      catch { case _: graft.variant.VariantJsonCodec.JsonParseException => true }
    assert(fusedStripFails("""{"a":}"""))
    assert(fusedStripFails("""{"a":1} 2"""))
    val tryFused = JsonStripKeysFused(Literal.create("""{"a":}""", StringType),
      Literal(new GenericArrayData(Array(UTF8String.fromString("a"))),
        org.apache.spark.sql.types.ArrayType(StringType)),
      failFast = false).eval(InternalRow.empty)
    assert(tryFused == null)
  }

  // -------------------------------------------------------------------
  // Diff fusion parity (round 8): mirror of the merge block.
  // -------------------------------------------------------------------
  private def diffPair(a: String, b: String): (Any, Any) = {
    val la = Literal.create(a, StringType)
    val lb = Literal.create(b, StringType)
    val unfused = VariantDiff(VariantFromJson(la), VariantFromJson(lb)).eval(InternalRow.empty)
    val fused = JsonDiffFused(la, lb, failLeft = true, failRight = true).eval(InternalRow.empty)
    (unfused, fused)
  }

  test("fused and unfused diff agree byte-for-byte on 300 random pairs") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 300).foreach { _ =>
      val a = gen(rnd, 0)
      val b = gen(rnd, 0)
      val (u, f) = diffPair(a, b)
      if (u == null || f == null) assert(u == null && f == null, s"null mismatch: a=$a b=$b")
      else {
        val ur = u.asInstanceOf[InternalRow]; val fr = f.asInstanceOf[InternalRow]
        assert(java.util.Arrays.equals(ur.getBinary(0), fr.getBinary(0)), s"metadata differ: a=$a b=$b")
        assert(java.util.Arrays.equals(ur.getBinary(1), fr.getBinary(1)), s"value differ: a=$a b=$b")
      }
    }
    // edges: top-level nulls, identical docs (empty patch), wholesale replace
    for ((a, b) <- Seq(("null", """{"x":1}"""), ("""{"x":1}""", "null"),
        ("""{"x":1,"y":2}""", """{"x":1,"y":2}"""), ("""{"x":1}""", "[1,2]"))) {
      val (u, f) = diffPair(a, b)
      if (u == null || f == null) assert(u == null && f == null, s"null mismatch: a=$a b=$b")
      else {
        val ur = u.asInstanceOf[InternalRow]; val fr = f.asInstanceOf[InternalRow]
        assert(java.util.Arrays.equals(ur.getBinary(1), fr.getBinary(1)), s"value differ: a=$a b=$b")
      }
    }
  }
}
