package graft.operators

/** Lossless WebP (VP8L) codec in pure byte/bit arithmetic — zero codec
  * dependencies; the round-8 sibling of [[Jpeg]] and the PNG/BMP/WAV
  * decoders in [[Multimodal]]. Follows the public "WebP Lossless
  * Bitstream Specification" (RIFF container, LSB-first bit packing,
  * canonical prefix codes, green/red/blue/alpha/distance code quintet,
  * color cache, LZ77 backward references).
  *
  * Scope — honestly partial, like the JPEG baseline-only support:
  * the DECODER accepts any no-transform VP8L stream (simple 1-2-symbol
  * codes, full normal codes with the 16/17/18 RLE and single-symbol
  * code-length codes, color cache, LZ77 with plain distances) and
  * throws a clear error on the four pixel transforms
  * (predictor/color/subtract-green/palette), meta prefix images, and
  * the 120 neighbor-mapped short distance codes. The ENCODER emits a
  * minimal legal stream: no transforms, no LZ77, fixed complete
  * length-8/9 literal codes, 1-symbol codes for the constant alpha and
  * the unused distance alphabet. Lossless: decode(encode(x)) == x
  * bit-exactly for EVERY image — the `mm_webp_decode` oracle contract
  * (no exactness corner needed, unlike JPEG).
  */
object Webp {
  /** Decoded image: pixels top-down row-major 0xRRGGBB (alpha dropped;
    * encoder writes alpha = 255).
    */
  case class WebpImage(width: Int, height: Int, pixels: Array[Int])

  // ---------------------------------------------------------------
  // LSB-first bit IO (VP8L convention, unlike JPEG's MSB-first)
  // ---------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream(1024)
    private var acc = 0L
    private var nBits = 0
    /** Write `len` bits of `v`, LSB first. */
    def writeBits(v: Int, len: Int): Unit = {
      acc |= (v.toLong & ((1L << len) - 1)) << nBits
      nBits += len
      while (nBits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nBits -= 8 }
    }
    /** Write a prefix CODE: its bits MSB-first into the LSB-first stream
      * (the decoder reads bit-by-bit, appending at the LSB of the code).
      * Equivalent to writing the bit-reversed code in one writeBits call.
      */
    def writeCode(code: Int, len: Int): Unit = {
      var rev = 0
      var c = code
      var i = 0
      while (i < len) { rev = (rev << 1) | (c & 1); c >>= 1; i += 1 }
      writeBits(rev, len)
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { out.write((acc & 0xff).toInt); acc = 0; nBits = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int, val end: Int) {
    private var acc = 0L
    private var nBits = 0
    def readBits(len: Int): Int = {
      while (nBits < len) {
        if (pos >= end) throw new IllegalArgumentException("webp: truncated bitstream")
        acc |= (bytes(pos) & 0xffL) << nBits
        pos += 1; nBits += 8
      }
      val v = (acc & ((1L << len) - 1)).toInt
      acc >>>= len; nBits -= len
      v
    }
  }

  // ---------------------------------------------------------------
  // Canonical prefix codes (deflate-style: codes increase with
  // (length, symbol); read MSB-of-code first)
  // ---------------------------------------------------------------

  /** codes+lengths per symbol from a lengths array (0 = absent). */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxLen = lengths.max
    val codes = new Array[Int](lengths.length)
    if (maxLen == 0) return codes
    val blCount = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    var l = 1
    while (l <= maxLen) { code = (code + blCount(l - 1)) << 1; nextCode(l) = code; l += 1 }
    var s = 0
    while (s < lengths.length) {
      if (lengths(s) > 0) { codes(s) = nextCode(lengths(s)); nextCode(lengths(s)) += 1 }
      s += 1
    }
    codes
  }

  /** Prefix decoder over a lengths array; single-symbol codes cost 0
    * bits (the VP8L trivial-code rule). Canonical min/max/valPtr
    * arithmetic per length — O(1) per consumed bit, no allocation.
    */
  private final class PrefixDecoder(lengths: Array[Int]) {
    private var nPresent = 0
    private var singleSym = -1
    private var maxLen = 0
    locally {
      var s = 0
      while (s < lengths.length) {
        if (lengths(s) > 0) {
          nPresent += 1; singleSym = s
          if (lengths(s) > maxLen) maxLen = lengths(s)
        }
        s += 1
      }
      require(nPresent > 0, "webp: empty prefix code")
      if (nPresent > 1) singleSym = -1
    }
    private val minCode = new Array[Int](maxLen + 1)
    private val maxCode = new Array[Int](maxLen + 1)
    private val valPtr = new Array[Int](maxLen + 1)
    private val sorted = new Array[Int](nPresent) // symbols by (len, symbol)
    locally {
      if (singleSym < 0) {
        val blCount = new Array[Int](maxLen + 1)
        lengths.foreach(l => if (l > 0) blCount(l) += 1)
        var code = 0
        var k = 0
        var l = 1
        while (l <= maxLen) {
          if (blCount(l) == 0) { maxCode(l) = -1 }
          else {
            valPtr(l) = k
            minCode(l) = code
            code += blCount(l); k += blCount(l)
            maxCode(l) = code - 1
          }
          code <<= 1
          l += 1
        }
        var i = 0
        var s = 0
        val next = valPtr.clone()
        while (s < lengths.length) {
          if (lengths(s) > 0) { sorted(next(lengths(s))) = s; next(lengths(s)) += 1; i += 1 }
          s += 1
        }
      }
    }
    def decode(br: BitReader): Int = {
      if (singleSym >= 0) return singleSym
      var code = br.readBits(1)
      var len = 1
      while (maxCode(len) < 0 || code > maxCode(len)) {
        if (len >= maxLen) throw new IllegalArgumentException("webp: invalid prefix code")
        code = (code << 1) | br.readBits(1)
        len += 1
      }
      sorted(valPtr(len) + code - minCode(len))
    }
  }

  private def singleSymbolDecoder(sym: Int, alphabet: Int): PrefixDecoder = {
    val l = new Array[Int](alphabet); l(sym) = 1
    new PrefixDecoder(l) // the 1-present-symbol rule makes it 0-bit
  }

  /** kCodeLengthCodeOrder (VP8L spec). */
  private val ClcOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  // ---------------------------------------------------------------
  // Encoder
  // ---------------------------------------------------------------

  /** Fixed complete code for the green alphabet (256 literals + 24
    * length prefixes, no cache): symbols 0..231 get 8 bits, 232..279
    * get 9 bits (232/256 + 48/512 = 1 — exactly complete).
    */
  private val GreenLengths: Array[Int] =
    Array.tabulate(280)(s => if (s < 232) 8 else 9)
  private val GreenCodes: Array[Int] = canonicalCodes(GreenLengths)
  /** All-256-at-8-bits code for red/blue (256/256 = complete). */
  private val ByteLengths: Array[Int] = Array.fill(256)(8)
  private val ByteCodes: Array[Int] = canonicalCodes(ByteLengths)

  /** Write one normal (non-simple) code whose lengths use at most the
    * two values 8 and 9: code-length code gives 8→"0" and 9→"1" (or a
    * 0-bit single-symbol code when only 8 occurs).
    */
  private def writeCodeLengths(bw: BitWriter, lengths: Array[Int]): Unit = {
    val has9 = lengths.exists(_ == 9)
    bw.writeBits(0, 1) // not simple
    // cl-code lengths in ClcOrder; symbol 8 at index 13, 9 at index 14
    val num = if (has9) 15 else 14
    bw.writeBits(num - 4, 4)
    var i = 0
    while (i < num) {
      val clLen = ClcOrder(i) match {
        case 8 => 1
        case 9 => if (has9) 1 else 0
        case _ => 0
      }
      bw.writeBits(clLen, 3)
      i += 1
    }
    bw.writeBits(0, 1) // no max_symbol shortcut
    if (has9) {
      // canonical over {8→0, 9→1}, 1 bit per symbol
      lengths.foreach(l => bw.writeBits(if (l == 9) 1 else 0, 1))
    } // else single-symbol cl-code: 0 bits per length, nothing to write
  }

  /** Write a simple 1-symbol code (0 bits per decoded symbol). */
  private def writeSingleSymbol(bw: BitWriter, sym: Int): Unit = {
    bw.writeBits(1, 1) // simple
    bw.writeBits(0, 1) // num symbols - 1 = 0
    if (sym < 2) { bw.writeBits(0, 1); bw.writeBits(sym, 1) }
    else { bw.writeBits(1, 1); bw.writeBits(sym, 8) }
  }

  /** Encode an RGB image as lossless WebP (VP8L), alpha = 255.
    * Constant-color images take 1-symbol simple codes for every
    * alphabet — 0 bits per pixel, the format's minimal legal encoding
    * of a flat image (a production encoder would reach for LZ77; the
    * 1-symbol form is smaller still and exercises the decoder's
    * trivial-code rule).
    */
  def encodeWebpLossless(width: Int, height: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 16384 && height <= 16384)
    val pixels = new Array[Int](width * height)
    var constant = true
    locally {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val p = px(x, y) & 0xffffff
          pixels(y * width + x) = p
          if (p != pixels(0)) constant = false
          x += 1
        }
        y += 1
      }
    }
    val bw = new BitWriter
    bw.writeBits(width - 1, 14)
    bw.writeBits(height - 1, 14)
    bw.writeBits(0, 1) // no alpha hint
    bw.writeBits(0, 3) // version 0
    bw.writeBits(0, 1) // no transforms
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(0, 1) // no meta prefix image
    if (constant) {
      val p0 = pixels(0)
      writeSingleSymbol(bw, (p0 >> 8) & 0xff) // green
      writeSingleSymbol(bw, (p0 >> 16) & 0xff) // red
      writeSingleSymbol(bw, p0 & 0xff) // blue
      writeSingleSymbol(bw, 255) // alpha
      writeSingleSymbol(bw, 0) // distance
      // every per-pixel symbol is a 0-bit trivial code: no scan bits
    } else {
      writeCodeLengths(bw, GreenLengths) // green+length alphabet
      writeCodeLengths(bw, ByteLengths) // red
      writeCodeLengths(bw, ByteLengths) // blue
      writeSingleSymbol(bw, 255) // alpha: constant 255, 0 bits/pixel
      writeSingleSymbol(bw, 0) // distance: unused (no LZ77)
      var i = 0
      val n = width * height
      while (i < n) {
        val p = pixels(i)
        val g = (p >> 8) & 0xff
        bw.writeCode(GreenCodes(g), GreenLengths(g))
        bw.writeCode(ByteCodes((p >> 16) & 0xff), 8)
        bw.writeCode(ByteCodes(p & 0xff), 8)
        i += 1
      }
    }
    val payload = bw.toBytes
    // RIFF container: VP8L chunk = signature byte + bitstream
    val vp8l = 1 + payload.length
    val padded = vp8l + (vp8l & 1)
    val riffSize = 4 + 8 + padded // "WEBP" + VP8L header + padded chunk
    val out = new Array[Byte](8 + riffSize)
    def put4(off: Int, s: String): Unit = (0 until 4).foreach(i => out(off + i) = s(i).toByte)
    def putU32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    put4(0, "RIFF"); putU32(4, riffSize); put4(8, "WEBP")
    put4(12, "VP8L"); putU32(16, vp8l)
    out(20) = 0x2f // VP8L signature
    System.arraycopy(payload, 0, out, 21, payload.length)
    out
  }

  // ---------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------

  private def readPrefixCode(br: BitReader, alphabet: Int): PrefixDecoder = {
    if (br.readBits(1) == 1) { // simple code: 1 or 2 symbols
      val nSym = br.readBits(1) + 1
      val first8 = br.readBits(1)
      val sym0 = if (first8 == 1) br.readBits(8) else br.readBits(1)
      val lengths = new Array[Int](alphabet)
      require(sym0 < alphabet, "webp: simple-code symbol out of range")
      if (nSym == 1) { lengths(sym0) = 1; return new PrefixDecoder(lengths) }
      val sym1 = br.readBits(8)
      require(sym1 < alphabet, "webp: simple-code symbol out of range")
      lengths(sym0) = 1; lengths(sym1) = 1
      return new PrefixDecoder(lengths)
    }
    // normal code: code-length code first
    val numClc = br.readBits(4) + 4
    require(numClc <= ClcOrder.length, "webp: bad code-length-code count")
    val clLengths = new Array[Int](19)
    var i = 0
    while (i < numClc) { clLengths(ClcOrder(i)) = br.readBits(3); i += 1 }
    val clDec = new PrefixDecoder(clLengths)
    // optional max_symbol shortcut
    var maxSymbol = alphabet
    if (br.readBits(1) == 1) {
      val nbits = 2 + 2 * br.readBits(3)
      maxSymbol = 2 + br.readBits(nbits)
      require(maxSymbol <= alphabet, "webp: max_symbol out of range")
    }
    val lengths = new Array[Int](alphabet)
    var sym = 0
    var prev = 8
    while (sym < alphabet && maxSymbol > 0) {
      maxSymbol -= 1
      val cl = clDec.decode(br)
      cl match {
        case c if c < 16 =>
          lengths(sym) = c; sym += 1
          if (c != 0) prev = c
        case 16 =>
          val n = 3 + br.readBits(2)
          var j = 0
          while (j < n && sym < alphabet) { lengths(sym) = prev; sym += 1; j += 1 }
        case 17 =>
          sym += 3 + br.readBits(3)
        case 18 =>
          sym += 11 + br.readBits(7)
      }
    }
    require(sym <= alphabet, "webp: code lengths overflow alphabet")
    new PrefixDecoder(lengths)
  }

  private def lz77Value(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      ((2 + (code & 1)) << extra) + br.readBits(extra) + 1
    }

  /** Decode a lossless WebP (VP8L) stream within the documented scope. */
  def decodeWebpLossless(bytes: Array[Byte]): WebpImage =
    try decodeWebp0(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("webp: truncated stream")
    }

  /** Decode either WebP flavor: VP8L chunks through the lossless path,
    * lossy VP8 key frames through [[Vp8]] (bit-exact RFC 6386 YUV
    * reconstruction + the shared BT.601 fixed-point RGB conversion). */
  def decodeWebp(bytes: Array[Byte]): WebpImage = {
    require(bytes.length >= 16, "webp: too short")
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (bytes.length > 15 && tag(12) == "VP8 ") {
      val img = Vp8.decodeWebpLossy(bytes)
      WebpImage(img.width, img.height, img.toRgb)
    } else decodeWebpLossless(bytes)
  }

  private def decodeWebp0(bytes: Array[Byte]): WebpImage = {
    require(bytes.length >= 21, "webp: too short")
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    require(tag(0) == "RIFF" && tag(8) == "WEBP", "webp: not a RIFF/WEBP file")
    // walk chunks to VP8L (tolerates leading metadata chunks)
    var off = 12
    var vp8lOff = -1
    var vp8lLen = 0
    while (vp8lOff < 0) {
      require(off + 8 <= bytes.length, "webp: no VP8L chunk")
      val t = tag(off)
      val len = u32(off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length, "webp: bad chunk length")
      if (t == "VP8L") { vp8lOff = off + 8; vp8lLen = len }
      else if (t == "VP8 " || t == "VP8X")
        throw new IllegalArgumentException(s"webp: $t (lossy/extended) unsupported, VP8L only")
      else off += 8 + len + (len & 1)
    }
    require((bytes(vp8lOff) & 0xff) == 0x2f, "webp: bad VP8L signature")
    val br = new BitReader(bytes, vp8lOff + 1, vp8lOff + vp8lLen)
    val width = br.readBits(14) + 1
    val height = br.readBits(14) + 1
    br.readBits(1) // alpha hint
    require(br.readBits(3) == 0, "webp: unsupported VP8L version")
    if (br.readBits(1) == 1) {
      val t = br.readBits(2)
      val name = Seq("predictor", "color", "subtract-green", "palette")(t)
      throw new IllegalArgumentException(s"webp: $name transform unsupported")
    }
    val cacheBits = if (br.readBits(1) == 1) br.readBits(4) else 0
    require(cacheBits <= 11, "webp: bad color-cache size")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = new Array[Int](math.max(cacheSize, 1))
    if (br.readBits(1) == 1)
      throw new IllegalArgumentException("webp: meta prefix image unsupported")
    val greenDec = readPrefixCode(br, 256 + 24 + cacheSize)
    val redDec = readPrefixCode(br, 256)
    val blueDec = readPrefixCode(br, 256)
    val alphaDec = readPrefixCode(br, 256)
    val distDec = readPrefixCode(br, 40)

    val n = width * height
    val argb = new Array[Int](n)
    var i = 0
    def cachePut(p: Int): Unit = if (cacheBits > 0)
      cache(((p * 0x1e35a7bd) >>> (32 - cacheBits)) & (cacheSize - 1)) = p
    while (i < n) {
      val g = greenDec.decode(br)
      if (g < 256) {
        val r = redDec.decode(br)
        val b = blueDec.decode(br)
        val a = alphaDec.decode(br)
        val p = (a << 24) | (r << 16) | (g << 8) | b
        argb(i) = p; cachePut(p); i += 1
      } else if (g < 256 + 24) {
        val len = lz77Value(g - 256, br)
        val distCode = lz77Value(distDec.decode(br), br)
        if (distCode <= 120)
          throw new IllegalArgumentException("webp: neighbor-mapped distances unsupported")
        val dist = distCode - 120
        require(dist <= i && i + len <= n, "webp: LZ77 reference out of range")
        var j = 0
        while (j < len) { val p = argb(i - dist); argb(i) = p; cachePut(p); i += 1; j += 1 }
      } else {
        require(cacheBits > 0, "webp: cache reference without cache")
        val p = cache(g - 256 - 24)
        argb(i) = p; i += 1
      }
    }
    val px = new Array[Int](n)
    i = 0
    while (i < n) { px(i) = argb(i) & 0xffffff; i += 1 }
    WebpImage(width, height, px)
  }
}
