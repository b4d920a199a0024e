package graft.operators

/** GIF decoder (GIF87a/GIF89a) — the remaining ubiquitous web-corpus
  * image format: logical screen descriptor, global and local color
  * tables, variable-width LSB-first LZW decompression (clear/EOI
  * codes, 12-bit cap), four-pass interlacing, Graphic Control
  * Extension transparency, and FULL multi-frame animation — every
  * image block is decoded and the frames are composited per the GIF89a
  * disposal semantics (do-not-dispose, restore-to-background,
  * restore-to-previous). Pure integer/byte arithmetic, zero codec
  * dependencies, verified byte-for-byte — per frame — against the
  * system giflib's decode of real giflib encodes (GifRealStreamSpec,
  * tools/gif_crosscheck.py).
  */
object Gif {

  /** First frame of the file: palette-mapped 0xRRGGBB pixels at the
    * frame's own dimensions; alpha is null unless a GCE transparent
    * index applies; frames counts every image block in the file. */
  final case class GifImage(width: Int, height: Int, pixels: Array[Int],
      alpha: Array[Int], frames: Int)

  /** One parsed image block: screen-order (deinterlaced) palette
    * indices at the frame's own dims, placed at (left, top) on the
    * logical screen, plus the GCE state that applied to it
    * (transIdx < 0 = opaque; disposal 0/1 keep, 2 restore-background,
    * 3 restore-previous; delay in centiseconds). */
  final case class GifFrame(left: Int, top: Int, width: Int, height: Int,
      indices: Array[Int], palette: Array[Int], transIdx: Int,
      disposal: Int, delayCs: Int)

  /** A fully parsed GIF: logical-screen dims + every frame. */
  final case class GifAnim(width: Int, height: Int, frames: Vector[GifFrame]) {

    /** Composite the animation per GIF89a semantics into one canvas
      * snapshot PER FRAME — pixels 0xAARGGBB-packed ints where 0 means
      * fully transparent (never-painted or disposed-to-background) and
      * opaque pixels carry alpha 0xFF in bits 24-31. The canvas starts
      * fully transparent; transparent-index pixels leave the canvas
      * unchanged; disposal 2 clears the frame's own rect back to
      * transparent (the modern renderer rule — the LSD background
      * color index is ignored, as browsers and giflib-based viewers
      * do); disposal 3 restores the canvas to its pre-frame state. */
    def composite: Vector[Array[Int]] = {
      val n = width * height
      val canvas = new Array[Int](n)
      val out = Vector.newBuilder[Array[Int]]
      frames.foreach { f =>
        val saved =
          if (f.disposal == 3) java.util.Arrays.copyOf(canvas, n) else null
        var fy = 0
        while (fy < f.height) {
          val row = (f.top + fy) * width
          var fx = 0
          while (fx < f.width) {
            val idx = f.indices(fy * f.width + fx)
            if (idx != f.transIdx)
              canvas(row + f.left + fx) = 0xff000000 | f.palette(idx)
            fx += 1
          }
          fy += 1
        }
        out += java.util.Arrays.copyOf(canvas, n)
        f.disposal match {
          case 2 =>
            var y = 0
            while (y < f.height) {
              java.util.Arrays.fill(canvas, (f.top + y) * width + f.left,
                (f.top + y) * width + f.left + f.width, 0)
              y += 1
            }
          case 3 => System.arraycopy(saved, 0, canvas, 0, n)
          case _ => ()
        }
      }
      out.result()
    }
  }

  private val InterlaceOffsets = Array(0, 4, 2, 1)
  private val InterlaceJumps = Array(8, 8, 4, 2)

  // -----------------------------------------------------------------
  // Encoders (fixture generators for the analytic oracles)
  // -----------------------------------------------------------------

  /** One frame of [[encodeGifAnimation]]: raster placed at
    * (left, top); palette == null uses the global table, else a local
    * color table is written; transIdx >= 0 writes a GCE transparency
    * flag; disposal 0-3 per GIF89a. */
  final case class GifFrameSpec(left: Int, top: Int, width: Int, height: Int,
      palette: Array[Int], transIdx: Int, disposal: Int,
      idx: (Int, Int) => Int)

  /** Write a single-frame GIF89a with a global palette, encoding the
    * raster as ALL-LITERAL LZW codes (the encoder mirrors the
    * decoder's dictionary growth so code widths stay in sync, emitting
    * a clear code only at the 4096-entry cap) — a valid, deliberately
    * compression-free stream any GIF decoder reads; the mm_gif_decode
    * oracle stays analytic because pixel index = f(x, y) exactly. */
  def encodeGifLiteral(width: Int, height: Int, palette: Array[Int],
      idx: (Int, Int) => Int): Array[Byte] =
    encodeGifAnimation(width, height, palette,
      Seq(GifFrameSpec(0, 0, width, height, null, -1, -1, idx)))

  /** Write a multi-frame GIF89a animation: global palette, per-frame
    * GCE (disposal + transparency; emitted only when the frame sets
    * either, so single opaque frames stay GCE-free like the round-11
    * encoder), per-frame offsets and optional local color tables —
    * every raster all-literal LZW (see [[encodeGifLiteral]]) so
    * composited pixels stay an analytic f(x, y, frame) for the
    * mm_gif_frames oracle. */
  def encodeGifAnimation(sw: Int, sh: Int, globalPalette: Array[Int],
      frames: Seq[GifFrameSpec]): Array[Byte] = {
    require(globalPalette.nonEmpty && globalPalette.length <= 256, "palette size")
    require(frames.nonEmpty, "at least one frame")
    def bitsFor(n: Int): Int = {
      var b = 1
      while ((1 << b) < n) b += 1
      math.max(b, 2) // LZW min code >= 2
    }
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def writeTable(palette: Array[Int], bits: Int): Unit = {
      var i = 0
      while (i < (1 << bits)) {
        val c = if (i < palette.length) palette(i) else 0
        out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
        i += 1
      }
    }
    val gBits = bitsFor(globalPalette.length)
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(sw); le16(sh)
    out.write(0x80 | (gBits - 1)) // global table, 2^gBits entries
    out.write(0); out.write(0)    // background, aspect
    writeTable(globalPalette, gBits)
    frames.foreach { f =>
      require(f.left >= 0 && f.top >= 0 && f.width > 0 && f.height > 0 &&
        f.left + f.width <= sw && f.top + f.height <= sh, "frame rect off-canvas")
      val pal = if (f.palette != null) f.palette else globalPalette
      require(pal.nonEmpty && pal.length <= 256, "frame palette size")
      if (f.transIdx >= 0 || f.disposal >= 0) {
        require(f.transIdx < pal.length, "transparent index out of palette")
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write((math.max(f.disposal, 0) << 2) | (if (f.transIdx >= 0) 1 else 0))
        le16(5) // delay 5cs
        out.write(math.max(f.transIdx, 0))
        out.write(0)
      }
      out.write(0x2c) // image descriptor
      le16(f.left); le16(f.top); le16(f.width); le16(f.height)
      val pBits = bitsFor(pal.length)
      if (f.palette != null) {
        out.write(0x80 | (pBits - 1)) // local table, no interlace
        writeTable(pal, pBits)
      } else out.write(0)
      writeLiteralLzw(out, f.width, f.height, pal.length, pBits, f.idx)
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** The all-literal LZW raster writer shared by both encoders: emit
    * each pixel index as its own code, mirroring the decoder's
    * dictionary growth so code widths stay in sync, with a clear code
    * only at the 4096-entry cap. */
  private def writeLiteralLzw(out: java.io.ByteArrayOutputStream, width: Int,
      height: Int, paletteLen: Int, tableBits: Int,
      idx: (Int, Int) => Int): Unit = {
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
        require(v >= 0 && v < paletteLen, "pixel index out of palette")
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
    out.write(0) // sub-block terminator
  }

  // -----------------------------------------------------------------
  // Decoder
  // -----------------------------------------------------------------

  def decodeGif(bytes: Array[Byte]): GifImage = {
    val anim = decodeGifFrames(bytes)
    val f = anim.frames.head
    val n = f.width * f.height
    val px = new Array[Int](n)
    val al = if (f.transIdx >= 0) new Array[Int](n) else null
    var i = 0
    while (i < n) {
      val idx = f.indices(i)
      px(i) = f.palette(idx)
      if (al != null) al(i) = if (idx == f.transIdx) 0 else 255
      i += 1
    }
    GifImage(f.width, f.height, px, al, anim.frames.length)
  }

  /** Parse the WHOLE file: every image block fully decoded
    * (deinterlaced, palette-resolved, GCE state attached). Compose
    * with [[GifAnim.composite]]. */
  def decodeGifFrames(bytes: Array[Byte]): GifAnim =
    try decodeGif0(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("gif: truncated stream")
    }

  private def decodeGif0(bytes: Array[Byte]): GifAnim = {
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

    val frames = Vector.newBuilder[GifFrame]
    var nFrames = 0
    var transIdx = -1 // from the GCE preceding the next image
    var disposal = 0
    var delayCs = 0
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
            disposal = (flags >> 2) & 7
            delayCs = (bytes(pos + 1) & 0xff) | ((bytes(pos + 2) & 0xff) << 8)
            transIdx = if ((flags & 1) != 0) bytes(pos + 3) & 0xff else -1
            pos += 4
            len = u8()
          }
          while (len != 0) { pos += len; len = u8() }
        case 0x2c => // image descriptor
          val left = u16(); val top = u16()
          val w = u16(); val h = u16()
          require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue, "gif: bad frame dims")
          require(left + w <= sw && top + h <= sh, "gif: frame rect off-canvas")
          val flags = u8()
          val table =
            if ((flags & 0x80) != 0) colorTable(1 << ((flags & 7) + 1))
            else globalTable
          require(table != null, "gif: image without any color table")
          val interlaced = (flags & 0x40) != 0
          val indices = lzwDecode(w * h)
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
          var i = 0
          while (i < w * h) {
            require(ordered(i) < table.length,
              s"gif: palette index ${ordered(i)} out of range")
            i += 1
          }
          frames += GifFrame(left, top, w, h, ordered, table, transIdx,
            disposal, delayCs)
          nFrames += 1
          transIdx = -1 // a GCE applies to one image only
          disposal = 0
          delayCs = 0
        case other =>
          throw new IllegalArgumentException(f"gif: unknown block 0x$other%02X")
      }
    }
    require(nFrames > 0, "gif: no image block")
    GifAnim(sw, sh, frames.result())
  }
}
