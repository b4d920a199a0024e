package graft.operators

/** FLAC codec (RFC 9639) in pure integer/byte arithmetic — the audio
  * sibling of the VP8/PNG/GIF decoders: FLAC is lossless and bit-exact
  * by specification, so the same "deterministic integer decode,
  * hash-exact oracle" discipline applies. The DECODER covers the full
  * frame surface: metadata block walk (STREAMINFO + skip), frame
  * headers with UTF-8-style coded numbers, every block-size and
  * sample-rate code, CRC-8 header and CRC-16 frame verification, all
  * four channel assignments (independent, left-side, right-side,
  * mid-side with the bps+1-bit difference channel), subframe types
  * CONSTANT / VERBATIM / FIXED 0-4 / LPC 1-32 (quantized coefficients,
  * 64-bit accumulator, arithmetic shift), Rice residual partitions in
  * both 4- and 5-bit parameter widths including escape partitions, and
  * wasted bits. Decoded PCM is verified against the STREAMINFO MD5 of
  * the unencoded stream — an end-to-end integrity check independent of
  * the subframe math.
  *
  * No libFLAC exists in this container (no independent verifier), so
  * correctness rests on: (a) decode(encode(x)) == x bit-exact for
  * every PCM input across every subframe/stereo/partition plan
  * (FlacSpec property tests + the mm_flac_decode lane reusing the WAV
  * lane's exact PCM), (b) the decoder verifying real CRC-8/CRC-16/MD5
  * — any encoder bit slip fails three independent checksums, and
  * (c) the ENCODER emitting only spec-shaped streams that any FLAC
  * decoder reads.
  */
object Flac {

  /** Decoded stream: per-channel samples, plus whether the STREAMINFO
    * MD5 matched the decoded PCM (true when the header carried one). */
  final case class FlacAudio(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long, samples: Array[Array[Int]],
      md5Ok: Boolean)

  // -----------------------------------------------------------------
  // CRCs (RFC 9639 §9.1/§9.2): CRC-8 poly 0x07, CRC-16 poly 0x8005,
  // both initialized to 0, MSB-first.
  // -----------------------------------------------------------------
  private val Crc8Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i
    var k = 0
    while (k < 8) { c = if ((c & 0x80) != 0) (c << 1) ^ 0x07 else c << 1; k += 1 }
    c & 0xff
  }
  private val Crc16Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 8
    var k = 0
    while (k < 8) { c = if ((c & 0x8000) != 0) (c << 1) ^ 0x8005 else c << 1; k += 1 }
    c & 0xffff
  }
  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Table(c ^ (bytes(i) & 0xff)); i += 1 }
    c
  }
  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc16Table(((c >> 8) ^ (bytes(i) & 0xff)) & 0xff) ^ ((c << 8) & 0xffff); i += 1 }
    c
  }

  // -----------------------------------------------------------------
  // MSB-first bit IO (FLAC convention — opposite of VP8L/GIF)
  // -----------------------------------------------------------------
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nAcc = 0
    def writeBits(v: Long, n: Int): Unit = {
      require(n >= 0 && n <= 57, s"writeBits width $n")
      if (n == 0) return
      acc = (acc << n) | (v & ((1L << n) - 1))
      nAcc += n
      while (nAcc >= 8) {
        buf.write(((acc >>> (nAcc - 8)) & 0xff).toInt)
        nAcc -= 8
      }
    }
    def writeUnary(q: Int): Unit = { // q zeros then a one
      var r = q
      while (r >= 32) { writeBits(0, 32); r -= 32 }
      writeBits(1L, r + 1)
    }
    def alignByte(): Unit = if (nAcc > 0) writeBits(0, 8 - nAcc)
    def isAligned: Boolean = nAcc == 0
    def size: Int = buf.size()
    def toArray: Array[Byte] = { require(nAcc == 0, "unaligned"); buf.toByteArray }
  }

  private final class BitReader(val bytes: Array[Byte], start: Int) {
    private var pos = start // byte position
    private var bit = 0     // bits consumed of bytes(pos), from MSB
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def readBit(): Int = {
      require(pos < bytes.length, "flac: truncated stream")
      val v = (bytes(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      require(n >= 0 && n <= 32, s"readBits width $n")
      var v = 0L
      var got = 0
      while (got < n) { v = (v << 1) | readBit(); got += 1 }
      v.toInt
    }
    def readBitsLong(n: Int): Long = {
      var v = 0L
      var got = 0
      while (got < n) { v = (v << 1) | readBit(); got += 1 }
      v
    }
    def readSigned(n: Int): Int =
      if (n == 0) 0
      else {
        val v = readBits(n)
        (v << (32 - n)) >> (32 - n) // sign-extend
      }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        require(q < (1 << 24), "flac: runaway unary")
      }
      q
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def atEnd: Boolean = pos >= bytes.length && bit == 0
  }

  // -----------------------------------------------------------------
  // UTF-8-style coded numbers (RFC 9639 §9.1.5) — up to 36 bits
  // -----------------------------------------------------------------
  private def writeCodedNumber(bw: BitWriter, v0: Long): Unit = {
    require(v0 >= 0 && v0 < (1L << 36), "coded number range")
    if (v0 < 0x80) { bw.writeBits(v0, 8); return }
    var nBytes = 2
    while (nBytes < 7 && v0 >= (1L << (nBytes * 5 + 1))) nBytes += 1
    // leading byte: nBytes ones, a zero, then the top data bits
    val topBits = 7 - nBytes // 0 when nBytes == 7
    bw.writeBits((1L << (nBytes + 1)) - 2, nBytes + 1)
    if (topBits > 0) bw.writeBits(v0 >>> ((nBytes - 1) * 6), topBits)
    var k = nBytes - 2
    while (k >= 0) {
      bw.writeBits(0x2L, 2) // continuation '10'
      bw.writeBits(v0 >>> (k * 6), 6)
      k -= 1
    }
  }
  private def readCodedNumber(br: BitReader): Long = {
    val first = br.readBits(8)
    if ((first & 0x80) == 0) return first
    var ones = 0
    while (ones < 8 && ((first << ones) & 0x80) != 0) ones += 1
    require(ones >= 2 && ones <= 7, s"flac: bad coded-number lead byte $first")
    var v: Long = if (ones == 7) 0 else first & ((1 << (7 - ones)) - 1)
    var k = 1
    while (k < ones) {
      val c = br.readBits(8)
      require((c & 0xc0) == 0x80, "flac: bad coded-number continuation")
      v = (v << 6) | (c & 0x3f)
      k += 1
    }
    v
  }

  // sample-rate table (code 0-11); 12-14 are explicit forms
  private val RateTable = Array(-1, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000)

  // -----------------------------------------------------------------
  // Encoder (fixture generator): legal spec-shaped streams whose
  // subframe/stereo/partition choices cycle deterministically by seed
  // so the fixtures sweep the whole decoder surface.
  // -----------------------------------------------------------------

  /** Encode PCM losslessly. channels: per-channel samples (1-8, equal
    * lengths), each within the signed bps range. Fixed block-size
    * strategy; the seed cycles stereo decorrelation per frame and
    * subframe type (verbatim / fixed 0-4 / LPC, constant when a frame
    * channel is flat), Rice partition order, 4- vs 5-bit parameters
    * and escape partitions per (frame, channel); wasted bits are
    * detected and coded whenever present. */
  def encodeFlac(sampleRate: Int, bps: Int, channels: Array[Array[Int]],
      blockSize: Int, seed: Long): Array[Byte] = {
    val nCh = channels.length
    require(nCh >= 1 && nCh <= 8, "flac: 1-8 channels")
    require(bps >= 4 && bps <= 32, "flac: bps 4-32")
    require(blockSize >= 16 && blockSize <= 65535, "flac: block size")
    val total = channels(0).length.toLong
    require(channels.forall(_.length == total.toInt), "flac: unequal channels")
    require(total > 0, "flac: empty stream")
    val lim = 1L << (bps - 1)
    channels.foreach(_.foreach(v =>
      require(v >= -lim && v < lim, "flac: sample out of bps range")))

    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last-metadata flag set, type 0, 34 bytes)
    val si = new BitWriter
    si.writeBits(blockSize, 16); si.writeBits(blockSize, 16)
    si.writeBits(0, 24); si.writeBits(0, 24) // frame sizes unknown
    si.writeBits(sampleRate, 20)
    si.writeBits(nCh - 1, 3)
    si.writeBits(bps - 1, 5)
    si.writeBits(total >>> 32, 4); si.writeBits(total & 0xffffffffL, 32)
    val md5 =
      if (bps % 8 == 0) pcmMd5(channels, bps) else new Array[Byte](16)
    val siBytes = si.toArray
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(siBytes, 0, siBytes.length)
    out.write(md5, 0, 16)

    var frameIdx = 0
    var off = 0
    val n = total.toInt
    while (off < n) {
      val bs = math.min(blockSize, n - off)
      val frame = encodeFrame(sampleRate, bps, channels, off, bs, frameIdx, seed)
      out.write(frame, 0, frame.length)
      off += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  private def pcmMd5(channels: Array[Array[Int]], bps: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytesPer = bps / 8
    val n = channels(0).length
    val row = new Array[Byte](channels.length * bytesPer)
    var i = 0
    while (i < n) {
      var c = 0
      var k = 0
      while (c < channels.length) {
        val v = channels(c)(i)
        var b = 0
        while (b < bytesPer) { row(k) = ((v >> (8 * b)) & 0xff).toByte; k += 1; b += 1 }
        c += 1
      }
      md.update(row)
      i += 1
    }
    md.digest()
  }

  private def encodeFrame(sampleRate: Int, bps: Int,
      channels: Array[Array[Int]], off: Int, bs: Int, frameIdx: Int,
      seed: Long): Array[Byte] = {
    val nCh = channels.length
    // stereo decorrelation cycles per frame (2ch only; side channel
    // needs bps+1 bits, so Int-backed samples cap decorrelation at 31)
    val stereo =
      if (nCh == 2 && bps <= 31) java.lang.Math.floorMod(seed + frameIdx, 4L).toInt
      else 0
    val sub: Array[Array[Int]] = // per-subframe samples + bit widths
      if (nCh == 2 && stereo > 0) {
        val l = java.util.Arrays.copyOfRange(channels(0), off, off + bs)
        val r = java.util.Arrays.copyOfRange(channels(1), off, off + bs)
        val side = Array.tabulate(bs)(i => l(i) - r(i))
        stereo match {
          case 1 => Array(l, side) // left-side
          case 2 => Array(side, r) // right-side
          case _ => // mid-side
            val mid = Array.tabulate(bs)(i => (l(i) + r(i)) >> 1)
            Array(mid, side)
        }
      } else Array.tabulate(nCh)(c =>
        java.util.Arrays.copyOfRange(channels(c), off, off + bs))
    val subBps = Array.tabulate(sub.length) { c =>
      stereo match {
        case 1 => if (c == 1) bps + 1 else bps
        case 2 => if (c == 0) bps + 1 else bps
        case 3 => if (c == 1) bps + 1 else bps
        case _ => bps
      }
    }

    val bw = new BitWriter
    bw.writeBits(0x3ffe, 14) // sync
    bw.writeBits(0, 1)       // reserved
    bw.writeBits(0, 1)       // fixed block-size strategy
    // block-size code: canonical when it matches, else explicit
    val (bsCode, bsExplicit) =
      if (bs == 192) (1, -1)
      else {
        var c = -1
        var k = 2
        while (c < 0 && k <= 5) { if (bs == 576 << (k - 2)) c = k; k += 1 }
        k = 8
        while (c < 0 && k <= 15) { if (bs == 256 << (k - 8)) c = k; k += 1 }
        if (c > 0) (c, -1)
        else if (bs <= 256) (6, bs - 1)
        else (7, bs - 1)
      }
    bw.writeBits(bsCode, 4)
    val rateCode = {
      val t = RateTable.indexOf(sampleRate)
      if (t > 0) t
      else if (sampleRate < 65536) 13 // 16-bit Hz follows
      else 0                          // from STREAMINFO
    }
    bw.writeBits(rateCode, 4)
    val chAssign = if (nCh == 2 && stereo > 0) 7 + stereo else nCh - 1
    bw.writeBits(chAssign, 4)
    val ssCode = bps match {
      case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
      case 32 => 7; case _ => 0
    }
    bw.writeBits(ssCode, 3)
    bw.writeBits(0, 1) // reserved
    writeCodedNumber(bw, frameIdx.toLong)
    if (bsCode == 6) bw.writeBits(bsExplicit, 8)
    else if (bsCode == 7) bw.writeBits(bsExplicit, 16)
    if (rateCode == 13) bw.writeBits(sampleRate, 16)
    // the header fields above are a whole number of bytes; reserve the
    // CRC-8 slot, then append subframes and patch both checksums over
    // the materialized array (the header length is re-derived from the
    // frame bytes themselves — its layout is self-describing)
    require(bw.isAligned, "flac: internal header misalignment")
    bw.writeBits(0, 8) // CRC-8 placeholder
    var c = 0
    while (c < sub.length) {
      encodeSubframe(bw, sub(c), subBps(c), frameIdx, c, seed)
      c += 1
    }
    bw.alignByte()
    val a0 = bw.toArray
    val hdrLen = headerLengthOf(a0)
    a0(hdrLen - 1) = crc8(a0, 0, hdrLen - 1).toByte
    val c16 = crc16(a0, 0, a0.length)
    val outB = java.util.Arrays.copyOf(a0, a0.length + 2)
    outB(a0.length) = ((c16 >> 8) & 0xff).toByte
    outB(a0.length + 1) = (c16 & 0xff).toByte
    outB
  }
  /** Length in bytes of a frame header INCLUDING its CRC-8 byte,
    * derived by re-parsing the fixed-layout fields. */
  private def headerLengthOf(frame: Array[Byte]): Int = {
    val br = new BitReader(frame, 0)
    require(br.readBits(14) == 0x3ffe, "flac: internal sync")
    br.readBits(2)
    val bsCode = br.readBits(4)
    val rCode = br.readBits(4)
    br.readBits(4); br.readBits(3); br.readBits(1)
    readCodedNumber(br)
    if (bsCode == 6) br.readBits(8) else if (bsCode == 7) br.readBits(16)
    if (rCode == 12) br.readBits(8)
    else if (rCode == 13 || rCode == 14) br.readBits(16)
    br.bytePos + 1 // + CRC-8 byte
  }

  private def encodeSubframe(bw: BitWriter, data0: Array[Int], bps: Int,
      frameIdx: Int, ch: Int, seed: Long): Unit = {
    val n = data0.length
    // wasted bits: largest w such that every sample has w low zero bits
    var wasted = 0
    if (data0.exists(_ != 0)) {
      var w = 32
      var i = 0
      while (i < n && w > 0) {
        if (data0(i) != 0) w = math.min(w, Integer.numberOfTrailingZeros(data0(i)))
        i += 1
      }
      wasted = w
    }
    val data = if (wasted > 0) data0.map(_ >> wasted) else data0
    val ebps = bps - wasted
    val allEqual = data.forall(_ == data(0))

    def writeHeader(typeBits: Int): Unit = {
      bw.writeBits(0, 1) // reserved
      bw.writeBits(typeBits, 6)
      if (wasted > 0) { bw.writeBits(1, 1); bw.writeUnary(wasted - 1) }
      else bw.writeBits(0, 1)
    }

    if (allEqual) {
      writeHeader(0)
      bw.writeBits(data(0).toLong & ((1L << ebps) - 1), ebps)
      return
    }
    val pick = java.lang.Math.floorMod(seed + 3L * frameIdx + ch, 7L)
    if (pick == 0 || n < 8) {
      writeHeader(1) // verbatim
      var i = 0
      while (i < n) { bw.writeBits(data(i).toLong & ((1L << ebps) - 1), ebps); i += 1 }
      return
    }
    if (pick <= 5) {
      val order = math.min((pick - 1).toInt, n - 1) // fixed 0-4
      writeHeader(8 + order)
      var i = 0
      while (i < order) { bw.writeBits(data(i).toLong & ((1L << ebps) - 1), ebps); i += 1 }
      val resid = fixedResidual(data, order)
      writeResidual(bw, resid, order, n, frameIdx, ch, seed)
      return
    }
    // LPC: small integer coefficients derived from the seed; shift 3
    val order = math.min(
      2 + java.lang.Math.floorMod(seed + frameIdx + ch, 6L).toInt, n - 1)
    val shift = 3
    val coefs = Array.tabulate(order) { j =>
      val c0 = java.lang.Math.floorMod((seed >> (j % 5)) + j, 9L).toInt - 4
      if (j == 0 && c0 == 0) 1 else c0 // avoid the all-zero predictor
    }
    val precision = 5 // covers -16..15 ⊇ coefs
    writeHeader(0x20 + (order - 1))
    var i = 0
    while (i < order) { bw.writeBits(data(i).toLong & ((1L << ebps) - 1), ebps); i += 1 }
    bw.writeBits(precision - 1, 4)
    bw.writeBits(shift, 5)
    var j = 0
    while (j < order) { bw.writeBits(coefs(j).toLong & 0x1f, precision); j += 1 }
    val resid = new Array[Int](n - order)
    i = order
    while (i < n) {
      var acc = 0L
      var k = 0
      while (k < order) { acc += coefs(k).toLong * data(i - 1 - k); k += 1 }
      resid(i - order) = data(i) - (acc >> shift).toInt
      i += 1
    }
    writeResidual(bw, resid, order, n, frameIdx, ch, seed)
  }

  private def fixedResidual(data: Array[Int], order: Int): Array[Int] = {
    val n = data.length
    val r = new Array[Int](n - order)
    var i = order
    while (i < n) {
      r(i - order) = order match {
        case 0 => data(i)
        case 1 => data(i) - data(i - 1)
        case 2 => data(i) - 2 * data(i - 1) + data(i - 2)
        case 3 => data(i) - 3 * data(i - 1) + 3 * data(i - 2) - data(i - 3)
        case _ => data(i) - 4 * data(i - 1) + 6 * data(i - 2) -
          4 * data(i - 3) + data(i - 4)
      }
      i += 1
    }
    r
  }

  private def writeResidual(bw: BitWriter, resid: Array[Int], predOrder: Int,
      blockSize: Int, frameIdx: Int, ch: Int, seed: Long): Unit = {
    val mix = java.lang.Math.floorMod(seed + frameIdx + 2L * ch, 5L)
    val method = if (mix == 3) 1 else 0 // 4-bit vs 5-bit parameters
    val escape = mix == 4
    // partition order: largest po <= want with blockSize divisible and
    // first partition non-empty
    val want = java.lang.Math.floorMod(seed + 2L * frameIdx + ch, 3L)
    var po = want.toInt
    while (po > 0 && (blockSize % (1 << po) != 0 ||
      (blockSize >> po) <= predOrder)) po -= 1
    bw.writeBits(method, 2)
    bw.writeBits(po, 4)
    val nParts = 1 << po
    val maxParam = if (method == 0) 14 else 30
    val escParam = if (method == 0) 15 else 31
    val pBits = if (method == 0) 4 else 5
    var p = 0
    var idx = 0
    while (p < nParts) {
      val cnt = (blockSize >> po) - (if (p == 0) predOrder else 0)
      // The 5-bit raw-width field cannot express 32; a residual needing
      // 32 bits (possible for fixed-order differences of near-full-range
      // samples) must fall back to Rice for this partition rather than
      // have its top bit clamped off (which would break losslessness).
      var escNeed = 0
      if (escape) {
        var i = 0
        while (i < cnt) {
          val v = resid(idx + i)
          val w = 33 - Integer.numberOfLeadingZeros(if (v < 0) ~v else v)
          if (w > escNeed) escNeed = w
          i += 1
        }
      }
      if (escape && escNeed <= 31) {
        val need = escNeed
        bw.writeBits(escParam, pBits)
        bw.writeBits(need, 5)
        var i = 0
        while (i < cnt) {
          if (need > 0)
            bw.writeBits(resid(idx + i).toLong & ((1L << need) - 1), need)
          i += 1
        }
      } else {
        // pick the Rice parameter by halving the folded sum
        var sum = 0L
        var i = 0
        while (i < cnt) {
          val e = resid(idx + i)
          sum += ((e << 1) ^ (e >> 31)).toLong & 0xffffffffL
          i += 1
        }
        var r = 0
        while (r < maxParam && (sum >> r) > 2L * math.max(cnt, 1)) r += 1
        bw.writeBits(r, pBits)
        i = 0
        while (i < cnt) {
          val e = resid(idx + i)
          val folded = ((e << 1) ^ (e >> 31)).toLong & 0xffffffffL
          bw.writeUnary((folded >>> r).toInt)
          if (r > 0) bw.writeBits(folded & ((1L << r) - 1), r)
          i += 1
        }
      }
      idx += cnt
      p += 1
    }
  }

  // -----------------------------------------------------------------
  // Decoder
  // -----------------------------------------------------------------
  def decodeFlac(bytes: Array[Byte]): FlacAudio =
    try decodeFlac0(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("flac: truncated stream")
    }

  private def decodeFlac0(bytes: Array[Byte]): FlacAudio = {
    require(bytes.length >= 42, "flac: too short")
    require(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
      bytes(3) == 'C', "flac: bad marker")
    var pos = 4
    var sampleRate = 0
    var nCh = 0
    var bps = 0
    var total = 0L
    var md5: Array[Byte] = null
    var sawStreamInfo = false
    var last = false
    while (!last) {
      require(pos + 4 <= bytes.length, "flac: truncated metadata")
      val h = bytes(pos) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      pos += 4
      require(pos + len <= bytes.length, "flac: metadata overruns stream")
      if (btype == 0) {
        require(len == 34, "flac: bad STREAMINFO length")
        require(!sawStreamInfo, "flac: duplicate STREAMINFO")
        sawStreamInfo = true
        val br = new BitReader(bytes, pos)
        br.readBits(16); br.readBits(16) // min/max block size
        br.readBits(24); br.readBits(24) // min/max frame size
        sampleRate = br.readBits(20)
        nCh = br.readBits(3) + 1
        bps = br.readBits(5) + 1
        total = (br.readBitsLong(4) << 32) | br.readBitsLong(32)
        md5 = java.util.Arrays.copyOfRange(bytes, pos + 18, pos + 34)
      } else require(btype != 127, "flac: invalid metadata type")
      pos += len
    }
    require(sawStreamInfo, "flac: no STREAMINFO")
    require(sampleRate > 0, "flac: zero sample rate")
    require(total > 0 && total <= Int.MaxValue, "flac: unsupported total")

    val chans = Array.fill(nCh)(new Array[Int](total.toInt))
    var got = 0
    while (got < total) {
      val frameStart = pos
      val br = new BitReader(bytes, pos)
      require(br.readBits(14) == 0x3ffe, "flac: lost frame sync")
      require(br.readBits(1) == 0, "flac: reserved bit set")
      br.readBits(1) // blocking strategy (number semantics only)
      val bsCode = br.readBits(4)
      val rCode = br.readBits(4)
      val chAssign = br.readBits(4)
      val ssCode = br.readBits(3)
      require(br.readBits(1) == 0, "flac: reserved bit set")
      readCodedNumber(br)
      val bs = bsCode match {
        case 0 => throw new IllegalArgumentException("flac: reserved block size")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => br.readBits(8) + 1
        case 7 => br.readBits(16) + 1
        case c => 256 << (c - 8)
      }
      rCode match {
        case 12 => br.readBits(8)
        case 13 | 14 => br.readBits(16)
        case 15 => throw new IllegalArgumentException("flac: invalid rate code")
        case _ => ()
      }
      val hdrEnd = br.bytePos
      val wantCrc8 = br.readBits(8)
      require(crc8(bytes, frameStart, hdrEnd) == wantCrc8, "flac: header CRC-8 mismatch")
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8; case 2 => 12; case 4 => 16; case 5 => 20; case 6 => 24
        case 7 => 32
        case _ => throw new IllegalArgumentException("flac: reserved sample size")
      }
      require(chAssign <= 10, s"flac: reserved channel assignment $chAssign")
      val frameCh = if (chAssign <= 7) chAssign + 1 else 2
      require(frameCh == nCh, "flac: channel count changed mid-stream")
      require(got + bs <= total, "flac: frames exceed total samples")

      val sub = Array.ofDim[Array[Int]](frameCh)
      var c = 0
      while (c < frameCh) {
        val sbps = chAssign match {
          case 8 => if (c == 1) frameBps + 1 else frameBps  // left-side
          case 9 => if (c == 0) frameBps + 1 else frameBps  // right-side
          case 10 => if (c == 1) frameBps + 1 else frameBps // mid-side
          case _ => frameBps
        }
        sub(c) = decodeSubframe(br, bs, sbps)
        c += 1
      }
      br.alignByte()
      val bodyEnd = br.bytePos
      val wantCrc16 = br.readBits(16)
      require(crc16(bytes, frameStart, bodyEnd) == wantCrc16, "flac: frame CRC-16 mismatch")
      pos = br.bytePos

      // undo stereo decorrelation
      chAssign match {
        case 8 => // left-side: right = left - side
          var i = 0
          while (i < bs) {
            chans(0)(got + i) = sub(0)(i)
            chans(1)(got + i) = sub(0)(i) - sub(1)(i)
            i += 1
          }
        case 9 => // right-side: left = right + side
          var i = 0
          while (i < bs) {
            chans(0)(got + i) = sub(1)(i) + sub(0)(i)
            chans(1)(got + i) = sub(1)(i)
            i += 1
          }
        case 10 => // mid-side
          var i = 0
          while (i < bs) {
            val side = sub(1)(i)
            val mid2 = (sub(0)(i) << 1) | (side & 1)
            chans(0)(got + i) = (mid2 + side) >> 1
            chans(1)(got + i) = (mid2 - side) >> 1
            i += 1
          }
        case _ =>
          var cc = 0
          while (cc < frameCh) {
            System.arraycopy(sub(cc), 0, chans(cc), got, bs)
            cc += 1
          }
      }
      got += bs
    }
    val md5Ok =
      if (bps % 8 == 0 && md5.exists(_ != 0))
        java.util.Arrays.equals(pcmMd5(chans, bps), md5)
      else true
    FlacAudio(sampleRate, nCh, bps, total, chans, md5Ok)
  }

  private def decodeSubframe(br: BitReader, bs: Int, bps: Int): Array[Int] = {
    require(br.readBits(1) == 0, "flac: subframe reserved bit")
    val t = br.readBits(6)
    val wasted =
      if (br.readBits(1) == 1) br.readUnary() + 1
      else 0
    val ebps = bps - wasted
    require(ebps > 0, "flac: wasted bits exceed sample size")
    val out = new Array[Int](bs)
    if (t == 0) { // constant
      val v = br.readSigned(ebps)
      java.util.Arrays.fill(out, v)
    } else if (t == 1) { // verbatim
      var i = 0
      while (i < bs) { out(i) = br.readSigned(ebps); i += 1 }
    } else if (t >= 8 && t <= 12) { // fixed
      val order = t - 8
      require(order <= bs, "flac: fixed order exceeds block")
      var i = 0
      while (i < order) { out(i) = br.readSigned(ebps); i += 1 }
      val resid = readResidual(br, bs, order)
      i = order
      while (i < bs) {
        val r = resid(i - order)
        out(i) = order match {
          case 0 => r
          case 1 => r + out(i - 1)
          case 2 => r + 2 * out(i - 1) - out(i - 2)
          case 3 => r + 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
          case _ => r + 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) -
            out(i - 4)
        }
        i += 1
      }
    } else if (t >= 0x20) { // LPC
      val order = (t - 0x20) + 1
      require(order <= bs, "flac: LPC order exceeds block")
      var i = 0
      while (i < order) { out(i) = br.readSigned(ebps); i += 1 }
      val precision = br.readBits(4) + 1
      require(precision <= 15, "flac: invalid LPC precision")
      val shift = br.readBits(5)
      require(shift < 32, "flac: LPC shift")
      val coefs = new Array[Int](order)
      var j = 0
      while (j < order) { coefs(j) = br.readSigned(precision); j += 1 }
      val resid = readResidual(br, bs, order)
      i = order
      while (i < bs) {
        var acc = 0L
        j = 0
        while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = resid(i - order) + (acc >> shift).toInt
        i += 1
      }
    } else throw new IllegalArgumentException(s"flac: reserved subframe type $t")
    if (wasted > 0) {
      var i = 0
      while (i < bs) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  private def readResidual(br: BitReader, bs: Int, predOrder: Int): Array[Int] = {
    val method = br.readBits(2)
    require(method <= 1, s"flac: reserved residual method $method")
    val po = br.readBits(4)
    require(bs % (1 << po) == 0, "flac: partition order does not divide block")
    val pBits = if (method == 0) 4 else 5
    val escParam = if (method == 0) 15 else 31
    val out = new Array[Int](bs - predOrder)
    var idx = 0
    var p = 0
    val nParts = 1 << po
    require((bs >> po) > predOrder, "flac: first partition not larger than predictor order")
    while (p < nParts) {
      val cnt = (bs >> po) - (if (p == 0) predOrder else 0)
      require(cnt >= 0, "flac: negative partition size")
      val param = br.readBits(pBits)
      if (param == escParam) {
        val raw = br.readBits(5)
        var i = 0
        while (i < cnt) { out(idx + i) = br.readSigned(raw); i += 1 }
      } else {
        var i = 0
        while (i < cnt) {
          val q = br.readUnary()
          val folded = (q.toLong << param) |
            (if (param > 0) br.readBits(param).toLong & ((1L << param) - 1) else 0L)
          out(idx + i) = ((folded >>> 1) ^ -(folded & 1L)).toInt
          i += 1
        }
      }
      idx += cnt
      p += 1
    }
    out
  }
}
