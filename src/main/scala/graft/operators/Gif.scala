package graft.operators

/** GIF decoder (GIF87a/GIF89a) — the remaining ubiquitous web-corpus
  * image format: logical screen descriptor, global and local color
  * tables, variable-width LSB-first LZW decompression (clear/EOI
  * codes, 12-bit cap), four-pass interlacing, Graphic Control
  * Extension transparency, and multi-frame files (the first frame's
  * raster is decoded fully; later frames are entropy-decoded for
  * validation and counted). Pure integer/byte arithmetic, zero codec
  * dependencies, verified byte-for-byte against the system giflib's
  * decode of real giflib encodes (GifRealStreamSpec,
  * tools/gif_crosscheck.py).
  */
object Gif {

  /** First frame of the file: palette-mapped 0xRRGGBB pixels at the
    * frame's own dimensions; alpha is null unless a GCE transparent
    * index applies; frames counts every image block in the file. */
  final case class GifImage(width: Int, height: Int, pixels: Array[Int],
      alpha: Array[Int], frames: Int)

  private val InterlaceOffsets = Array(0, 4, 2, 1)
  private val InterlaceJumps = Array(8, 8, 4, 2)

  /** Write a single-frame GIF89a with a global palette, encoding the
    * raster as ALL-LITERAL LZW codes (the encoder mirrors the
    * decoder's dictionary growth so code widths stay in sync, emitting
    * a clear code only at the 4096-entry cap) — a valid, deliberately
    * compression-free stream any GIF decoder reads; the mm_gif_decode
    * oracle stays analytic because pixel index = f(x, y) exactly. */
  def encodeGifLiteral(width: Int, height: Int, palette: Array[Int],
      idx: (Int, Int) => Int): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256, "palette size")
    var tableBits = 1
    while ((1 << tableBits) < palette.length) tableBits += 1
    if (tableBits < 2) tableBits = 2 // LZW min code >= 2
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(width); le16(height)
    out.write(0x80 | (tableBits - 1)) // global table, 2^tableBits entries
    out.write(0); out.write(0)        // background, aspect
    var i = 0
    while (i < (1 << tableBits)) {
      val c = if (i < palette.length) palette(i) else 0
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
      i += 1
    }
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(width); le16(height)
    out.write(0) // no local table, no interlace
    val minCode = tableBits
    out.write(minCode)
    val clear = 1 << minCode
    val eoi = clear + 1
    val data = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    def putCode(code: Int, size: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += size
      while (accBits >= 8) { data.write((acc & 0xff).toInt); acc >>= 8; accBits -= 8 }
    }
    var codeSize = minCode + 1
    var free = eoi + 1
    var prevSeen = false
    putCode(clear, codeSize)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = idx(x, y)
        require(v >= 0 && v < palette.length, "pixel index out of palette")
        if (free == 4096) { // cap: reset before the decoder would stall
          putCode(clear, codeSize)
          codeSize = minCode + 1
          free = eoi + 1
          prevSeen = false
        }
        putCode(v, codeSize)
        if (prevSeen) { // the decoder adds one entry per non-first code
          free += 1
          if (free == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prevSeen = true
        x += 1
      }
      y += 1
    }
    putCode(eoi, codeSize)
    if (accBits > 0) data.write((acc & 0xff).toInt)
    val lzw = data.toByteArray
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  def decodeGif(bytes: Array[Byte]): GifImage =
    try decodeGif0(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("gif: truncated stream")
    }

  private def decodeGif0(bytes: Array[Byte]): GifImage = {
    require(bytes.length >= 13, "gif: too short")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"gif: bad signature '$sig'")
    var pos = 6
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8); pos += 2; v }
    def colorTable(n: Int): Array[Int] = {
      val t = Array.tabulate(n)(i =>
        ((bytes(pos + 3 * i) & 0xff) << 16) | ((bytes(pos + 3 * i + 1) & 0xff) << 8) |
          (bytes(pos + 3 * i + 2) & 0xff))
      pos += 3 * n
      t
    }

    val sw = u16(); val sh = u16()
    require(sw > 0 && sh > 0, "gif: bad screen dims")
    val lsdFlags = u8()
    u8() // background color index
    u8() // pixel aspect ratio
    val globalTable =
      if ((lsdFlags & 0x80) != 0) colorTable(1 << ((lsdFlags & 7) + 1))
      else null

    var frames = 0
    var transIdx = -1 // from the GCE preceding the next image
    var first: GifImage = null
    var done = false

    // --- GIF-variant LZW over the image sub-blocks at `pos` ---
    def lzwDecode(nPixels: Int): Array[Int] = {
      val minCode = u8()
      require(minCode >= 2 && minCode <= 11, s"gif: bad LZW min code $minCode")
      // concatenate the data sub-blocks
      val data = new java.io.ByteArrayOutputStream()
      var len = u8()
      while (len != 0) { data.write(bytes, pos, len); pos += len; len = u8() }
      val d = data.toByteArray
      var bitPos = 0
      def read(nBits: Int): Int = {
        var v = 0
        var got = 0
        while (got < nBits) {
          require(bitPos < d.length * 8, "gif: LZW data exhausted")
          val b = (d(bitPos >> 3) >> (bitPos & 7)) & 1
          v |= b << got
          got += 1
          bitPos += 1
        }
        v
      }
      val clear = 1 << minCode
      val eoi = clear + 1
      val prefix = new Array[Int](4096)
      val suffix = new Array[Int](4096)
      val out = new Array[Int](nPixels)
      var outN = 0
      val stack = new Array[Int](4096)
      var codeSize = minCode + 1
      var free = eoi + 1
      var prev = -1
      def emit(code: Int): Int = { // push string, return its first index
        var sp = 0
        var c = code
        while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        val firstIdx = c
        require(outN + sp + 1 <= nPixels, "gif: LZW output overflow")
        out(outN) = c; outN += 1
        while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
        firstIdx
      }
      var ended = false
      while (outN < nPixels && !ended) {
        val code = read(codeSize)
        if (code == clear) {
          codeSize = minCode + 1
          free = eoi + 1
          prev = -1
        } else if (code == eoi) {
          ended = true
        } else if (prev < 0) {
          require(code < clear, "gif: first LZW code not a literal")
          out(outN) = code; outN += 1
          prev = code
        } else {
          require(code <= free, s"gif: LZW code $code out of range")
          val firstIdx =
            if (code < free) emit(code)
            else { // the (K w K) case: string(prev) + first(prev)
              var sp = 0
              var c = prev
              while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
              val f0 = c
              require(outN + sp + 2 <= nPixels, "gif: LZW output overflow")
              out(outN) = c; outN += 1
              while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
              out(outN) = f0; outN += 1
              f0
            }
          if (free < 4096) {
            prefix(free) = prev
            suffix(free) = firstIdx
            free += 1
            if (free == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        }
      }
      require(outN == nPixels, s"gif: LZW produced $outN of $nPixels pixels")
      out
    }
    while (!done) {
      u8() match {
        case 0x3b => done = true
        case 0x21 => // extension: label + sub-blocks
          val label = u8()
          var len = u8()
          if (label == 0xf9 && len == 4) {
            val flags = bytes(pos) & 0xff
            transIdx = if ((flags & 1) != 0) bytes(pos + 3) & 0xff else -1
            pos += 4
            len = u8()
          }
          while (len != 0) { pos += len; len = u8() }
        case 0x2c => // image descriptor
          u16(); u16() // left, top
          val w = u16(); val h = u16()
          require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue, "gif: bad frame dims")
          val flags = u8()
          val table =
            if ((flags & 0x80) != 0) colorTable(1 << ((flags & 7) + 1))
            else globalTable
          require(table != null, "gif: image without any color table")
          val interlaced = (flags & 0x40) != 0
          val indices = lzwDecode(w * h)
          if (first == null) {
            val ordered =
              if (!interlaced) indices
              else {
                val out = new Array[Int](w * h)
                var rank = 0
                var p = 0
                while (p < 4) {
                  var y = InterlaceOffsets(p)
                  while (y < h) {
                    System.arraycopy(indices, rank * w, out, y * w, w)
                    rank += 1
                    y += InterlaceJumps(p)
                  }
                  p += 1
                }
                out
              }
            val px = new Array[Int](w * h)
            val al = if (transIdx >= 0) new Array[Int](w * h) else null
            var i = 0
            while (i < w * h) {
              val idx = ordered(i)
              require(idx < table.length, s"gif: palette index $idx out of range")
              px(i) = table(idx)
              if (al != null) al(i) = if (idx == transIdx) 0 else 255
              i += 1
            }
            first = GifImage(w, h, px, al, 0)
          }
          transIdx = -1 // a GCE applies to one image only
          frames += 1
        case other =>
          throw new IllegalArgumentException(f"gif: unknown block 0x$other%02X")
      }
    }
    require(first != null, "gif: no image block")
    first.copy(frames = frames)
  }
}
