package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FLAC (RFC 9639) codec: decode(encode(x)) == x bit-exactly for every
  * PCM input across the whole subframe surface — the seed cycles
  * verbatim / fixed 0-4 / LPC subframes, all four stereo
  * decorrelations, Rice 4/5-bit parameters, escape partitions and
  * partition orders per (frame, channel), so a multi-frame stream
  * traverses every decoder path. The decoder's CRC-8/CRC-16/MD5
  * verification doubles as an independent integrity gate: any encoder
  * bit slip fails three checksums before the sample comparison runs.
  * (No libFLAC exists in this container; see Flac.scala's scope note.)
  */
class FlacSpec extends AnyFunSuite {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed * 6364136223846793005L + 1442695040888963407L)(
      _ * 6364136223846793005L + 1442695040888963407L)

  private def pcm(seed: Long, n: Int, bps: Int): Array[Int] = {
    val lim = 1 << (bps - 1)
    lcg(seed).take(n).map(v => (v % lim).toInt).toArray
  }

  private def roundtrip(rate: Int, bps: Int, chans: Array[Array[Int]],
      block: Int, seed: Long): Flac.FlacAudio = {
    val enc = Flac.encodeFlac(rate, bps, chans, block, seed)
    val dec = Flac.decodeFlac(enc)
    assert(dec.sampleRate == rate && dec.channels == chans.length &&
      dec.bitsPerSample == bps && dec.totalSamples == chans(0).length)
    assert(dec.md5Ok === (bps % 8 == 0 || dec.md5Ok),
      "md5 must verify when bps is byte-aligned")
    for (c <- chans.indices)
      assert(java.util.Arrays.equals(dec.samples(c), chans(c)),
        s"channel $c differs (seed=$seed bps=$bps block=$block)")
    dec
  }

  test("mono 16-bit roundtrips across seeds, block sizes and ragged tails") {
    for (seed <- 0L until 12L; block <- Seq(32, 192, 256, 576)) {
      val n = block * 2 + (seed % (block - 1)).toInt + 1 // short last frame
      roundtrip(16000, 16, Array(pcm(seed * 7 + 1, n, 16)), block, seed)
    }
  }

  test("stereo roundtrips through all four decorrelation modes") {
    // 4+ frames so floorMod(seed+frame, 4) visits independent, L/S,
    // R/S and M/S within one stream
    for (seed <- 0L until 8L) {
      val n = 32 * 4 + 11
      val l = pcm(seed * 13 + 3, n, 16)
      val r = pcm(seed * 17 + 5, n, 16)
      roundtrip(44100, 16, Array(l, r), 32, seed)
    }
  }

  test("8-bit, 24-bit and multichannel roundtrips") {
    for (seed <- 0L until 4L) {
      roundtrip(8000, 8, Array(pcm(seed + 21, 100, 8)), 48, seed)
      roundtrip(96000, 24, Array(pcm(seed + 31, 100, 24),
        pcm(seed + 41, 100, 24)), 48, seed)
      roundtrip(48000, 16, Array(pcm(seed + 51, 90, 16),
        pcm(seed + 61, 90, 16), pcm(seed + 71, 90, 16)), 32, seed)
    }
  }

  test("32-bit residuals fall back to Rice when escape width can't hold them") {
    // bps=32 samples alternating Int.MinValue and 1: fixed-order
    // differences wrap to values needing the FULL 32 bits (e.g.
    // 1 - MinValue ≡ 0x80000001), which the escape partition's 5-bit
    // raw-width field cannot express (max 31). The encoder must fall
    // back to Rice for such partitions instead of clamping the width
    // and truncating the top bit. Seeds 0-9 over 6+ frames sweep every
    // (subframe-type, residual-method) combination including the
    // escape-selecting mix and all fixed orders.
    val n = 32 * 6 + 7
    val data = Array.tabulate(n)(i => if (i % 2 == 0) Int.MinValue else 1)
    for (seed <- 0L until 10L) roundtrip(44100, 32, Array(data), 32, seed)
  }

  test("wasted bits: low-zero PCM roundtrips and stays lossless") {
    for (w <- 1 to 4) {
      val base = pcm(99 + w, 120, 12).map(_ << w)
      roundtrip(32000, 16, Array(base), 40, w.toLong)
    }
  }

  test("constant channels take the CONSTANT subframe and stay exact") {
    for (v <- Seq(0, 1, -1, 12345, -32768, 32767)) {
      val enc = Flac.encodeFlac(16000, 16, Array(Array.fill(64)(v)), 32, 5L)
      val dec = Flac.decodeFlac(enc)
      assert(dec.samples(0).forall(_ == v))
      // constant frames are tiny: two frames of 64 samples ≪ verbatim size
      assert(enc.length < 100, s"constant stream should be small, got ${enc.length}")
    }
  }

  test("multi-byte UTF-8-coded frame numbers (>= 128 frames)") {
    val n = 16 * 131 // frame numbers 0..130: 2-byte coded numbers
    roundtrip(22050, 16, Array(pcm(777L, n, 16)), 16, 2L)
  }

  test("corruption is caught: CRC-8, CRC-16, MD5, marker, truncation") {
    val chans = Array(pcm(1234L, 150, 16))
    val enc = Flac.encodeFlac(16000, 16, chans, 64, 9L)
    def expectMsg(sub: String)(body: => Any): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains(sub), s"got: ${e.getMessage}")
    }
    expectMsg("bad marker") {
      val bad = enc.clone(); bad(0) = 'g'.toByte; Flac.decodeFlac(bad)
    }
    // find the first frame: fLaC(4) + metadata header(4) + 34 bytes
    val frame0 = 42
    assert(((enc(frame0) & 0xff) << 6 | (enc(frame0 + 1) & 0xff) >> 2) == 0x3ffe,
      "fixture layout: frame must start at 42")
    expectMsg("CRC-8") {
      val bad = enc.clone()
      bad(frame0 + 4) = (bad(frame0 + 4) ^ 0x01).toByte // coded number byte
      Flac.decodeFlac(bad)
    }
    intercept[IllegalArgumentException] { // body corruption → CRC-16 (or
      val bad = enc.clone()               // an earlier structural error)
      bad(frame0 + 12) = (bad(frame0 + 12) ^ 0x40).toByte
      Flac.decodeFlac(bad)
    }
    expectMsg("too short")(Flac.decodeFlac(java.util.Arrays.copyOf(enc, 30)))
    intercept[IllegalArgumentException](
      Flac.decodeFlac(java.util.Arrays.copyOf(enc, enc.length - 3)))
    // tampered STREAMINFO MD5: decode succeeds, md5Ok goes false
    val badMd5 = enc.clone()
    badMd5(8 + 18) = (badMd5(8 + 18) ^ 0x55).toByte
    val dec = Flac.decodeFlac(badMd5)
    assert(!dec.md5Ok, "tampered MD5 must be reported")
    assert(java.util.Arrays.equals(dec.samples(0), chans(0)))
  }

  test("FLAC PCM equals the WAV lane's PCM for the same doc formula") {
    // the mm_flac_decode contract: both containers carry identical PCM
    for (id <- Seq(0L, 7L, 63L, 199L)) {
      val n = (50 + id % 50).toInt
      val samples = Array.tabulate(n)(i =>
        (((id * 31 + i * 17) % 65536) - 32768).toInt)
      val wav = Multimodal.decodeWav(
        Multimodal.encodeWavPcm16(16000, samples.map(_.toShort)))
      val flac = Flac.decodeFlac(
        Flac.encodeFlac(16000, 16, Array(samples), 32, id))
      assert(flac.samples(0).length == wav.samples.length)
      assert(flac.samples(0).sameElements(wav.samples.map(_.toInt)),
        s"doc $id: FLAC and WAV PCM diverge")
      assert(flac.md5Ok)
    }
  }
}
