package graft.variant

import com.fasterxml.jackson.core.JsonFactory
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeType

/** JSON ⇄ variant conversion.
  *
  * JSON → variant mirrors the reference kernel `variant_from_json`
  * (/root/reference/arrow-open-variant/src/json.rs:38-81) per row:
  * parse → collect all object keys (json.rs:115-163) → build metadata →
  * recursively convert (json.rs:202-246). Coercions match the reference:
  * JSON int → integer; big int → Decimal16 scale 0, error beyond 128 bits
  * (json.rs:213-218); JSON float → Float64; top-level JSON `null` → SQL
  * null (json.rs:184-196) while nested nulls stay variant Null
  * (json.rs:27-29).
  *
  * Metadata is built per ROW, not per batch — the deliberate Spark-native
  * divergence (SURVEY §7.3): rows stay self-contained across shuffles,
  * persistence, and streaming.
  */
object VariantJsonCodec {
  private val mapper = new ObjectMapper()
  private val factory = new JsonFactory()

  final val VARIANT_NULL: Array[Byte] = {
    val b = new ByteBuf(1); VariantWriter.writeNull(b); b.result()
  }

  /** Parse error wrapper — same trigger condition as the reference's
    * whole-batch ComputeError (json.rs:43-47), scoped to the row.
    */
  final class JsonParseException(msg: String, cause: Throwable)
      extends RuntimeException(msg, cause)

  def parseTree(utf8: Array[Byte], off: Int, len: Int): JsonNode =
    try mapper.readTree(factory.createParser(utf8, off, len))
    catch {
      case e: Exception =>
        throw new JsonParseException(s"Failed to parse JSON: ${e.getMessage}", e)
    }

  /** First-seen key interner for the single-pass encoder: keys get
    * temporary ids in arrival order; `remapTo` translates them to the
    * final sorted-dictionary ids.
    */
  private final class KeyInterner {
    val keys = new java.util.ArrayList[String]()
    private val map = new java.util.HashMap[String, Integer]()
    def intern(k: String): Int = {
      val existing = map.get(k)
      if (existing != null) existing.intValue()
      else {
        val id = keys.size()
        map.put(k, id)
        keys.add(k)
        id
      }
    }
    def remapTo(finalIds: java.util.HashMap[String, Integer]): Array[Int] = {
      val remap = new Array[Int](keys.size())
      var i = 0
      while (i < keys.size()) { remap(i) = finalIds.get(keys.get(i)); i += 1 }
      remap
    }
  }

  /** Per-thread prediction of the NEXT row's first-seen key sequence:
    * real scans are runs of structurally-identical rows, so the previous
    * row's (arrival keys → final dictionary ids, metadata bytes) almost
    * always applies verbatim. A hit skips the dictionary build (sort +
    * hash map + byte emission) AND the sorted-order re-encode — keys
    * intern straight to final ids and `VariantObjectBuilder.finish()`
    * id-sorts fields, so one token pass emits the canonical binary.
    * This recovers the reference's per-batch shared-metadata
    * amortization (arrow-open-variant/src/json.rs:51-63) without giving
    * up self-contained rows (SURVEY §7.3): the metadata BYTES are shared
    * by reference thread-locally, each row still carries them. Measured
    * 0.30 → ~1 M rows/s single-thread on small homogeneous objects
    * (CodecBench); a miss costs one extra tokenize of that row only.
    */
  private final class Speculation {
    var keys: Array[String] = new Array[String](0) // first-seen arrival order
    var keyBytes: Array[Array[Byte]] = new Array[Array[Byte]](0) // same, as UTF-8
    var finalIds: Array[Int] = new Array[Int](0) // their sorted-dictionary ids
    var meta: Array[Byte] = VariantMetadata.EMPTY

    def adopt(arrival: java.util.ArrayList[String], remap: Array[Int],
              metaBytes: Array[Byte]): Unit = {
      keys = new Array[String](arrival.size())
      keyBytes = new Array[Array[Byte]](arrival.size())
      var i = 0
      while (i < keys.length) {
        keys(i) = arrival.get(i)
        keyBytes(i) = keys(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        i += 1
      }
      finalIds = remap
      meta = metaBytes
    }
  }
  private val lastRowShape: ThreadLocal[Speculation] =
    ThreadLocal.withInitial(() => new Speculation)

  /** Mutable first-seen counter for the speculative walk. */
  private final class SpecState { var n = 0 }

  /** JSON text → (metadata, value); returns null for a top-level JSON
    * `null` (the SQL-null rule, json.rs:184-196).
    *
    * SINGLE streaming pass over the raw bytes. Fast path: the
    * speculative walk above (per-thread predicted key sequence → final
    * ids immediately). Fallback: keys intern with first-seen temporary
    * ids while values encode, then the dictionary is built and, only
    * when arrival order was not already the sorted order, the compact
    * binary is re-encoded with final ids (a memcpy-heavy walk over our
    * own buffer — far cheaper than the second Jackson tokenize the
    * two-pass scheme paid; json.rs:115-163 does two passes). No JsonNode
    * tree is materialized. The hot path of `variant_from_json`: at
    * 100 TB the parse IS the workload.
    */
  def fromJsonBytes(utf8: Array[Byte], off: Int, len: Int): (Array[Byte], Array[Byte]) = {
    // Byte-level lexer first (no Jackson tokenizer, no UTF-16 round
    // trip); parses the strict JSON subset == what Jackson's defaults
    // accept, and bails to the Jackson paths below on ANYTHING doubtful
    // (syntax error, >18-digit int, lone surrogate, invalid UTF-8) so
    // error behavior and edge semantics stay Jackson-defined.
    if (fastJsonEnabled) {
      try return fastFromJsonBytes(utf8, off, off + len, lastRowShape.get())
      catch { case FastJsonLex.Miss => () }
    }
    jacksonFromJsonBytes(utf8, off, len)
  }

  /** The Jackson tokenizer path (speculative + plain) — the fallback for
    * every row the byte lexer declines, and the semantics reference the
    * lexer is differential-fuzzed against (FastJsonSpec).
    */
  private[graft] def jacksonFromJsonBytes(
      utf8: Array[Byte], off: Int, len: Int): (Array[Byte], Array[Byte]) = {
    import com.fasterxml.jackson.core.JsonToken
    try {
      // --- speculative single-pass attempt against the last row's shape
      val spec = lastRowShape.get()
      locally {
        val p = factory.createParser(utf8, off, len)
        val tok = p.nextToken()
        if (tok == null) throw new JsonParseException("Failed to parse JSON: empty input", null)
        if (tok == JsonToken.VALUE_NULL) {
          if (p.nextToken() != null)
            throw new JsonParseException("Failed to parse JSON: trailing tokens", null)
          return null
        }
        val buf = new ByteBuf(64)
        val st = new SpecState
        if (convertSpec(p, buf, spec, st) && st.n == spec.keys.length) {
          if (p.nextToken() != null)
            throw new JsonParseException("Failed to parse JSON: trailing tokens", null)
          p.close()
          return (spec.meta, buf.result())
        }
        p.close() // speculation missed: discard and re-tokenize plainly
      }

      val p = factory.createParser(utf8, off, len)
      p.nextToken()
      val interner = new KeyInterner
      val buf = new ByteBuf(64)
      convertStream(p, buf, interner)
      if (p.nextToken() != null)
        throw new JsonParseException("Failed to parse JSON: trailing tokens", null)
      p.close()
      val (metaBytes, finalIds) = VariantMetadata.build(interner.keys)
      val remap = interner.remapTo(finalIds)
      var identity = true
      var i = 0
      while (identity && i < remap.length) { identity = remap(i) == i; i += 1 }
      // adopt this row's shape as the next prediction
      spec.adopt(interner.keys, remap, metaBytes)
      if (identity) (metaBytes, buf.result())
      else {
        // arrival order ≠ dictionary order: re-encode from our own
        // binary so frame id widths and field sort reflect final ids
        // (in-place id rewriting could change a frame's id byte width —
        // the builders re-derive widths, keeping the encoding canonical)
        val out = new ByteBuf(buf.length + 16)
        reencode(buf.rawBytes, 0, out, remap)
        (metaBytes, out.result())
      }
    } catch {
      case e: JsonParseException => throw e
      case e: IllegalArgumentException => throw e
      case e: Exception =>
        throw new JsonParseException(s"Failed to parse JSON: ${e.getMessage}", e)
    }
  }

  /** Speculative token → variant writer: like `convertStream`, but keys
    * resolve against the predicted first-seen sequence `spec.keys` with
    * already-final dictionary ids. Returns false the moment the row's
    * key arrival deviates from the prediction (caller discards the
    * buffer and re-runs the plain path). A key seen EARLIER in this row
    * resolves by linear scan over the seen prefix — the prefix is small
    * and this matches first-seen interning exactly.
    */
  private def convertSpec(p: com.fasterxml.jackson.core.JsonParser, buf: ByteBuf,
                          spec: Speculation, st: SpecState): Boolean = {
    import com.fasterxml.jackson.core.{JsonToken => T}
    p.currentToken() match {
      case T.VALUE_NULL => VariantWriter.writeNull(buf); true
      case T.VALUE_TRUE => VariantWriter.writeBoolean(buf, true); true
      case T.VALUE_FALSE => VariantWriter.writeBoolean(buf, false); true
      case T.VALUE_NUMBER_INT =>
        p.getNumberType match {
          case com.fasterxml.jackson.core.JsonParser.NumberType.BIG_INTEGER =>
            val bi = p.getBigIntegerValue
            if (bi.bitLength() >= 128)
              throw new JsonParseException(s"Could not fit value $bi into an i128", null)
            VariantWriter.writeDecimal(buf, bi, 0)
          case _ => VariantWriter.writeLong(buf, p.getLongValue)
        }
        true
      case T.VALUE_NUMBER_FLOAT => VariantWriter.writeDouble(buf, p.getDoubleValue); true
      case T.VALUE_STRING => VariantWriter.writeString(buf, p.getText); true
      case T.START_ARRAY =>
        val ab = new VariantArrayBuilder(buf)
        while (p.nextToken() != T.END_ARRAY) {
          if (!convertSpec(p, ab.elementBuffer(), spec, st)) return false
        }
        ab.finish()
        true
      case T.START_OBJECT =>
        val ob = new VariantObjectBuilder(buf)
        while (p.nextToken() != T.END_OBJECT) {
          val name = p.currentName()
          var id = -1
          var i = 0
          while (id < 0 && i < st.n) {
            if (spec.keys(i) == name) id = spec.finalIds(i)
            i += 1
          }
          if (id < 0) {
            // next first-seen key must match the prediction's next key
            if (st.n >= spec.keys.length || spec.keys(st.n) != name) return false
            id = spec.finalIds(st.n)
            st.n += 1
          }
          p.nextToken()
          if (!convertSpec(p, ob.fieldBuffer(id), spec, st)) return false
        }
        ob.finish()
        true
      case other =>
        throw new JsonParseException(s"Unsupported JSON token: $other", null)
    }
  }

  /** Re-emit a temp-id-encoded value with final dictionary ids. Scalars
    * copy verbatim; object/array frames rebuild through the canonical
    * builders (sorted fields, minimal widths).
    */
  private def reencode(src: Array[Byte], pos: Int, out: ByteBuf, remap: Array[Int]): Unit = {
    val v = new VariantView(src, pos)
    v.basicType match {
      case VariantConst.BASIC_OBJECT =>
        val o = v.getObject
        val ob = new VariantObjectBuilder(out)
        var i = 0
        while (i < o.numElements) {
          reencode(src, o.valueAt(i).pos, ob.fieldBuffer(remap(o.fieldIdAt(i))), remap)
          i += 1
        }
        ob.finish()
      case VariantConst.BASIC_ARRAY =>
        val a = v.getArray
        val ab = new VariantArrayBuilder(out)
        var i = 0
        while (i < a.numElements) {
          reencode(src, a.elementAt(i).pos, ab.elementBuffer(), remap)
          i += 1
        }
        ab.finish()
      case _ => out.addBytes(src, pos, v.sizeInBytes)
    }
  }

  /** Recursive-descent token → variant writer; parser is positioned ON
    * the value's first token when called. Object keys intern to
    * first-seen temp ids (remapped by the caller when necessary).
    */
  private def convertStream(p: com.fasterxml.jackson.core.JsonParser, buf: ByteBuf,
                            interner: KeyInterner): Unit = {
    import com.fasterxml.jackson.core.{JsonToken => T}
    p.currentToken() match {
      case T.VALUE_NULL => VariantWriter.writeNull(buf)
      case T.VALUE_TRUE => VariantWriter.writeBoolean(buf, true)
      case T.VALUE_FALSE => VariantWriter.writeBoolean(buf, false)
      case T.VALUE_NUMBER_INT =>
        p.getNumberType match {
          case com.fasterxml.jackson.core.JsonParser.NumberType.BIG_INTEGER =>
            val bi = p.getBigIntegerValue
            if (bi.bitLength() >= 128)
              throw new JsonParseException(s"Could not fit value $bi into an i128", null)
            VariantWriter.writeDecimal(buf, bi, 0)
          case _ => VariantWriter.writeLong(buf, p.getLongValue)
        }
      case T.VALUE_NUMBER_FLOAT => VariantWriter.writeDouble(buf, p.getDoubleValue)
      case T.VALUE_STRING => VariantWriter.writeString(buf, p.getText)
      case T.START_ARRAY =>
        val ab = new VariantArrayBuilder(buf)
        while (p.nextToken() != T.END_ARRAY) {
          convertStream(p, ab.elementBuffer(), interner)
        }
        ab.finish()
      case T.START_OBJECT =>
        val ob = new VariantObjectBuilder(buf)
        while (p.nextToken() != T.END_OBJECT) {
          // currentToken == FIELD_NAME
          val id = interner.intern(p.currentName())
          p.nextToken()
          convertStream(p, ob.fieldBuffer(id), interner)
        }
        ob.finish()
      case other =>
        throw new JsonParseException(s"Unsupported JSON token: $other", null)
    }
  }

  /** Encode the single JSON value the parser is positioned ON into a
    * self-contained (metadata, value) pair, consuming exactly that value.
    * Scalars skip metadata collection (empty dictionary); objects/arrays
    * go through the tree builder so key collection and canonical sorted
    * emission match `fromJsonBytes` byte-for-byte. Used by the fused
    * extraction/explode expressions to materialize sub-variants without
    * re-parsing the full row. Known divergence: Jackson's tree keeps the
    * LAST of duplicate keys within a nested object, where the streaming
    * encoder keeps both fields — content with duplicate JSON keys is
    * undefined behavior in every variant implementation.
    */
  def valueFromParser(p: com.fasterxml.jackson.core.JsonParser): (Array[Byte], Array[Byte]) = {
    import com.fasterxml.jackson.core.{JsonParser => JP, JsonToken => T}
    p.currentToken() match {
      case T.START_OBJECT | T.START_ARRAY => fromTree(mapper.readTree(p))
      case T.VALUE_NULL => (VariantMetadata.EMPTY, VARIANT_NULL)
      case tok =>
        val buf = new ByteBuf(16)
        tok match {
          case T.VALUE_TRUE => VariantWriter.writeBoolean(buf, true)
          case T.VALUE_FALSE => VariantWriter.writeBoolean(buf, false)
          case T.VALUE_NUMBER_INT =>
            if (p.getNumberType == JP.NumberType.BIG_INTEGER) {
              val bi = p.getBigIntegerValue
              if (bi.bitLength() >= 128)
                throw new JsonParseException(s"Could not fit value $bi into an i128", null)
              VariantWriter.writeDecimal(buf, bi, 0)
            } else VariantWriter.writeLong(buf, p.getLongValue)
          case T.VALUE_NUMBER_FLOAT => VariantWriter.writeDouble(buf, p.getDoubleValue)
          case T.VALUE_STRING => VariantWriter.writeString(buf, p.getText)
          case other => throw new JsonParseException(s"Unsupported JSON token: $other", null)
        }
        (VariantMetadata.EMPTY, buf.result())
    }
  }

  def fromJson(json: String): (Array[Byte], Array[Byte]) = {
    val b = json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    fromJsonBytes(b, 0, b.length)
  }

  // ===================================================================
  // Byte-level JSON fast path (round 7). The reference's kernel is
  // json→variant; with the plan fused and the encoder single-pass, the
  // remaining cost was Jackson's tokenizer (UTF-8→UTF-16 decode, token
  // objects, feature checks). This lexer works directly on the UTF-8
  // input: escape-free strings become one byte-slice copy, small ints
  // parse inline, and object keys match the speculative shape by BYTE
  // comparison. Contract: it accepts a strict SUBSET of what Jackson's
  // default feature set accepts; anything outside (malformed JSON,
  // >18-digit integers, escapes with lone surrogates, invalid UTF-8,
  // leading zeros) throws the stackless FastMiss and the row re-runs
  // through the Jackson paths above, which own all error semantics.
  // Differential-fuzzed byte-for-byte against the Jackson path in
  // FastJsonSpec; flag off via GRAFT_DISABLE_FAST_JSON=1.
  // ===================================================================

  private[graft] val fastJsonEnabled: Boolean =
    !sys.env.get("GRAFT_DISABLE_FAST_JSON").contains("1")

  /** Test hook: run ONLY the byte lexer (production speculation state),
    * Left(()) when it declines the row. */
  private[graft] def fastOnlyForTest(
      utf8: Array[Byte]): Either[Unit, (Array[Byte], Array[Byte])] =
    try Right(fastFromJsonBytes(utf8, 0, utf8.length, lastRowShape.get()))
    catch { case FastJsonLex.Miss => Left(()) }

  /** Shared byte-level lexing core lives in [[FastJsonLex]] (also used
    * by the fused extraction fast path). Aliases keep this file's walk
    * code readable. */
  private def FastMiss = FastJsonLex.Miss
  private type FastCursor = FastJsonLex.Cursor

  /** Emit one JSON number through the writer. Integers over 18 digits
    * miss to Jackson (BigInteger/i128 rules live there). */
  private def fastNumber(c: FastCursor, buf: ByteBuf): Unit = {
    val b = c.b
    val start = c.i
    val neg = c.peek == '-'
    val isInt = FastJsonLex.scanNumber(c)
    if (isInt) {
      val dStart = c.numStart
      val nd = c.i - dStart
      if (nd > 18) throw FastJsonLex.Miss // could exceed long; Jackson owns BigInteger
      var v = 0L
      var k = dStart
      while (k < c.i) { v = v * 10 + (b(k) - '0'); k += 1 }
      VariantWriter.writeLong(buf, if (neg) -v else v)
    } else {
      // IEEE-correct, identical to Jackson's double conversion
      VariantWriter.writeDouble(buf, java.lang.Double.parseDouble(
        new String(b, start, c.i - start, java.nio.charset.StandardCharsets.US_ASCII)))
    }
  }

  /** Fast-path entry: speculation attempt, then fast-plain. Throws
    * FastMiss to route the row to the Jackson paths. */
  private def fastFromJsonBytes(b: Array[Byte], off: Int, end: Int,
                                spec: Speculation): (Array[Byte], Array[Byte]) = {
    val c = new FastJsonLex.Cursor(b, off, end)
    c.skipWs()
    if (c.i >= end) throw FastMiss // empty → Jackson's "empty input" error
    if (b(c.i) == 'n') { // top-level null → SQL NULL (json.rs:184-196)
      FastJsonLex.literal(c, "null")
      c.skipWs()
      if (c.i != end) throw FastMiss // trailing → Jackson's error
      return null
    }
    val valueStart = c.i
    // --- speculative attempt against the predicted key sequence
    locally {
      val buf = new ByteBuf(64)
      val st = new SpecState
      if (fastConvertSpec(c, buf, spec, st) && st.n == spec.keys.length) {
        c.skipWs()
        if (c.i != end) throw FastMiss
        return (spec.meta, buf.result())
      }
    }
    // --- plain single pass with first-seen interning
    c.i = valueStart
    val interner = new KeyInterner
    val buf = new ByteBuf(64)
    fastConvertStream(c, buf, interner)
    c.skipWs()
    if (c.i != end) throw FastMiss
    val (metaBytes, finalIds) = VariantMetadata.build(interner.keys)
    val remap = interner.remapTo(finalIds)
    var identity = true
    var i = 0
    while (identity && i < remap.length) { identity = remap(i) == i; i += 1 }
    spec.adopt(interner.keys, remap, metaBytes)
    if (identity) (metaBytes, buf.result())
    else {
      val out = new ByteBuf(buf.length + 16)
      reencode(buf.rawBytes, 0, out, remap)
      (metaBytes, out.result())
    }
  }

  /** Speculative fast walk (mirror of convertSpec on bytes): false on a
    * key-shape mismatch (caller re-runs plain), FastMiss on syntax. */
  private def fastConvertSpec(c: FastCursor, buf: ByteBuf,
                              spec: Speculation, st: SpecState,
                              depth: Int = 0): Boolean = {
    if (depth > FastJsonLex.MAX_DEPTH) throw FastMiss // Jackson accepts depth MAX, rejects MAX+1
    val b = c.b
    (c.peek & 0xff) match {
      case 'n' => FastJsonLex.literal(c, "null"); VariantWriter.writeNull(buf); true
      case 't' => FastJsonLex.literal(c, "true"); VariantWriter.writeBoolean(buf, true); true
      case 'f' => FastJsonLex.literal(c, "false"); VariantWriter.writeBoolean(buf, false); true
      case '"' =>
        c.i += 1
        val close = FastJsonLex.scanSimpleString(c)
        if (close >= 0) {
          VariantWriter.writeStringSlice(buf, b, c.i, close - c.i)
          c.i = close + 1
        } else {
          val scratch = new ByteBuf(32)
          FastJsonLex.unescapeString(c, scratch)
          VariantWriter.writeStringSlice(buf, scratch.rawBytes, 0, scratch.length)
        }
        true
      case '[' =>
        c.i += 1
        val ab = new VariantArrayBuilder(buf)
        c.skipWs()
        if (c.i < c.end && b(c.i) == ']') c.i += 1
        else {
          var more = true
          while (more) {
            c.skipWs()
            if (!fastConvertSpec(c, ab.elementBuffer(), spec, st, depth + 1)) return false
            c.skipWs()
            (c.peek & 0xff) match {
              case ',' => c.i += 1
              case ']' => c.i += 1; more = false
              case _ => throw FastMiss
            }
          }
        }
        ab.finish()
        true
      case '{' =>
        c.i += 1
        val ob = new VariantObjectBuilder(buf)
        c.skipWs()
        if (c.i < c.end && b(c.i) == '}') c.i += 1
        else {
          var more = true
          while (more) {
            c.skipWs()
            c.expect('"')
            val close = FastJsonLex.scanSimpleString(c)
            if (close < 0) throw FastMiss // escaped keys: rare, Jackson path
            val kOff = c.i
            val kLen = close - c.i
            FastJsonLex.checkName(kLen)
            c.i = close + 1
            var id = -1
            var k = 0
            while (id < 0 && k < st.n) {
              if (FastJsonLex.sliceEq(b, kOff, kLen, spec.keyBytes(k))) id = spec.finalIds(k)
              k += 1
            }
            if (id < 0) {
              if (st.n >= spec.keyBytes.length ||
                !FastJsonLex.sliceEq(b, kOff, kLen, spec.keyBytes(st.n))) return false
              id = spec.finalIds(st.n)
              st.n += 1
            }
            c.skipWs()
            c.expect(':')
            c.skipWs()
            if (!fastConvertSpec(c, ob.fieldBuffer(id), spec, st, depth + 1)) return false
            c.skipWs()
            (c.peek & 0xff) match {
              case ',' => c.i += 1
              case '}' => c.i += 1; more = false
              case _ => throw FastMiss
            }
          }
        }
        ob.finish()
        true
      case x if x == '-' || (x >= '0' && x <= '9') => fastNumber(c, buf); true
      case _ => throw FastMiss
    }
  }

  /** Plain fast walk with first-seen interning (mirror of convertStream
    * on bytes). */
  private def fastConvertStream(c: FastCursor, buf: ByteBuf, interner: KeyInterner,
                                depth: Int = 0): Unit = {
    if (depth > FastJsonLex.MAX_DEPTH) throw FastMiss // Jackson accepts depth MAX, rejects MAX+1
    val b = c.b
    (c.peek & 0xff) match {
      case 'n' => FastJsonLex.literal(c, "null"); VariantWriter.writeNull(buf)
      case 't' => FastJsonLex.literal(c, "true"); VariantWriter.writeBoolean(buf, true)
      case 'f' => FastJsonLex.literal(c, "false"); VariantWriter.writeBoolean(buf, false)
      case '"' =>
        c.i += 1
        val close = FastJsonLex.scanSimpleString(c)
        if (close >= 0) {
          VariantWriter.writeStringSlice(buf, b, c.i, close - c.i)
          c.i = close + 1
        } else {
          val scratch = new ByteBuf(32)
          FastJsonLex.unescapeString(c, scratch)
          VariantWriter.writeStringSlice(buf, scratch.rawBytes, 0, scratch.length)
        }
      case '[' =>
        c.i += 1
        val ab = new VariantArrayBuilder(buf)
        c.skipWs()
        if (c.i < c.end && b(c.i) == ']') c.i += 1
        else {
          var more = true
          while (more) {
            c.skipWs()
            fastConvertStream(c, ab.elementBuffer(), interner, depth + 1)
            c.skipWs()
            (c.peek & 0xff) match {
              case ',' => c.i += 1
              case ']' => c.i += 1; more = false
              case _ => throw FastMiss
            }
          }
        }
        ab.finish()
      case '{' =>
        c.i += 1
        val ob = new VariantObjectBuilder(buf)
        c.skipWs()
        if (c.i < c.end && b(c.i) == '}') c.i += 1
        else {
          var more = true
          while (more) {
            c.skipWs()
            c.expect('"')
            val close = FastJsonLex.scanSimpleString(c)
            if (close < 0) throw FastMiss // escaped keys: Jackson path
            FastJsonLex.checkName(close - c.i)
            val key = new String(c.b, c.i, close - c.i,
              java.nio.charset.StandardCharsets.UTF_8)
            c.i = close + 1
            val id = interner.intern(key)
            c.skipWs()
            c.expect(':')
            c.skipWs()
            fastConvertStream(c, ob.fieldBuffer(id), interner, depth + 1)
            c.skipWs()
            (c.peek & 0xff) match {
              case ',' => c.i += 1
              case '}' => c.i += 1; more = false
              case _ => throw FastMiss
            }
          }
        }
        ob.finish()
      case x if x == '-' || (x >= '0' && x <= '9') => fastNumber(c, buf)
      case _ => throw FastMiss
    }
  }

  def fromTree(tree: JsonNode): (Array[Byte], Array[Byte]) = {
    val keys = new java.util.ArrayList[String]()
    collectKeys(tree, keys)
    val (metaBytes, ids) = VariantMetadata.build(keys)
    val buf = new ByteBuf(64)
    convert(tree, buf, ids)
    (metaBytes, buf.result())
  }

  /** Gather every object key at every nesting depth (json.rs:115-163). */
  private def collectKeys(node: JsonNode, out: java.util.ArrayList[String]): Unit = {
    node.getNodeType match {
      case JsonNodeType.OBJECT =>
        val it = node.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          out.add(e.getKey)
          collectKeys(e.getValue, out)
        }
      case JsonNodeType.ARRAY =>
        val it = node.elements()
        while (it.hasNext) collectKeys(it.next(), out)
      case _ => ()
    }
  }

  /** Recursive JSON→variant conversion (json.rs:202-246). */
  private def convert(node: JsonNode, buf: ByteBuf, ids: java.util.HashMap[String, Integer]): Unit = {
    node.getNodeType match {
      case JsonNodeType.NULL | JsonNodeType.MISSING => VariantWriter.writeNull(buf)
      case JsonNodeType.BOOLEAN => VariantWriter.writeBoolean(buf, node.booleanValue())
      case JsonNodeType.NUMBER =>
        if (node.isIntegralNumber) {
          if (node.canConvertToLong) VariantWriter.writeLong(buf, node.longValue())
          else {
            val bi = node.bigIntegerValue()
            if (bi.bitLength() >= 128)
              throw new JsonParseException(
                s"Could not fit value $bi into an i128", null)
            VariantWriter.writeDecimal(buf, bi, 0)
          }
        } else VariantWriter.writeDouble(buf, node.doubleValue())
      case JsonNodeType.STRING => VariantWriter.writeString(buf, node.textValue())
      case JsonNodeType.ARRAY =>
        val ab = new VariantArrayBuilder(buf)
        val it = node.elements()
        while (it.hasNext) {
          val el = it.next()
          convert(el, ab.elementBuffer(), ids)
        }
        ab.finish()
      case JsonNodeType.OBJECT =>
        val ob = new VariantObjectBuilder(buf)
        val it = node.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          val id = ids.get(e.getKey)
          if (id == null)
            throw new IllegalStateException(
              s"Key '${e.getKey}' not present in metadata dictionary")
          convert(e.getValue, ob.fieldBuffer(id), ids)
        }
        ob.finish()
      case other =>
        throw new JsonParseException(s"Unsupported JSON node type: $other", null)
    }
  }

  /** Variant → compact JSON text (parity extension; the reference has no
    * inverse printer). Uses a Jackson generator so output formatting is
    * canonical.
    */
  def toJsonString(metaBytes: Array[Byte], valueBytes: Array[Byte]): String = {
    val sw = new java.io.StringWriter()
    val gen = factory.createGenerator(sw)
    writeJson(new MetadataView(metaBytes, 0), new VariantView(valueBytes, 0), gen)
    gen.close()
    sw.toString
  }

  private def writeJson(meta: MetadataView, v: VariantView,
                        gen: com.fasterxml.jackson.core.JsonGenerator): Unit = {
    import VariantConst._
    v.basicType match {
      case BASIC_SHORT_STR => gen.writeString(v.getString)
      case BASIC_OBJECT =>
        val o = v.getObject
        gen.writeStartObject()
        var i = 0
        while (i < o.numElements) {
          gen.writeFieldName(meta.getKey(o.fieldIdAt(i)))
          writeJson(meta, o.valueAt(i), gen)
          i += 1
        }
        gen.writeEndObject()
      case BASIC_ARRAY =>
        val a = v.getArray
        gen.writeStartArray()
        var i = 0
        while (i < a.numElements) {
          writeJson(meta, a.elementAt(i), gen)
          i += 1
        }
        gen.writeEndArray()
      case _ =>
        v.typeInfo match {
          case P_NULL => gen.writeNull()
          case P_TRUE => gen.writeBoolean(true)
          case P_FALSE => gen.writeBoolean(false)
          case P_INT8 | P_INT16 | P_INT32 | P_INT64 => gen.writeNumber(v.getLong)
          case P_DOUBLE | P_FLOAT => gen.writeNumber(v.getDouble)
          case P_DECIMAL4 | P_DECIMAL8 | P_DECIMAL16 =>
            val d = v.getDecimal
            if (d.scale() == 0) gen.writeNumber(d.unscaledValue()) else gen.writeNumber(d)
          case P_LONG_STR => gen.writeString(v.getString)
          case P_STRING_FROM_DICT => gen.writeString(v.getDictKey(meta))
          case P_BINARY =>
            gen.writeString(java.util.Base64.getEncoder.encodeToString(v.getBinary))
          case P_BINARY_FROM_DICT =>
            gen.writeString(java.util.Base64.getEncoder.encodeToString(
              v.getDictKey(meta).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          case P_DATE =>
            gen.writeString(java.time.LocalDate.ofEpochDay(v.getDateDays.toLong).toString)
          case P_TIMESTAMP | P_TIMESTAMP_NTZ =>
            val micros = v.getTimestampMicros
            val inst = java.time.Instant.ofEpochSecond(
              Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
            gen.writeString(inst.toString)
          case t => throw new IllegalStateException(s"unknown type id $t")
        }
    }
  }
}
