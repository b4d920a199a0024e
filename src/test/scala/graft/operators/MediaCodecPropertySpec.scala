package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property fuzz over the five media codecs: random dims + random
  * per-pixel/sample functions. Lossless codecs (BMP/WAV/PNG/WebP) must
  * round-trip bit-exactly; JPEG must stay inside its documented error
  * envelope on arbitrary images and be EXACT on block-constant gray.
  */
class MediaCodecPropertySpec extends AnyFunSuite {

  /** Deterministic manual property driver (same pattern as
    * CodecPropertySpec — scalatestplus is not on the dependency list).
    */
  private def forAllSamples[A](gen: Gen[A], n: Int = 60)(check: A => Unit): Unit = {
    var seed = Seed(1234L)
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => check(a)
        case None => fail(s"gen failed at sample $i")
      }
      seed = seed.next
    }
  }

  private case class Img(w: Int, h: Int, a1: Int, a2: Int, a3: Int)
  private val imgGen: Gen[Img] = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 30)
    a1 <- Gen.choose(0, 255)
    a2 <- Gen.choose(0, 255)
    a3 <- Gen.choose(0, 255)
  } yield Img(w, h, a1, a2, a3)

  private def pxFn(im: Img): (Int, Int) => Int = (x, y) =>
    (((x * im.a1 + y * 13 + im.a2) % 256) << 16) |
      (((x * 11 + y * im.a3 + 7) % 256) << 8) | ((x * 3 + y * im.a1 + im.a3) % 256)

  test("PNG: arbitrary images round-trip bit-exactly") {
    forAllSamples(imgGen) { im =>
      val px = pxFn(im)
      val img = Multimodal.decodePng(Multimodal.encodePngRgb(im.w, im.h, px))
      assert(img.width == im.w && img.height == im.h)
      for (y <- 0 until im.h; x <- 0 until im.w)
        assert(img.pixels(y * im.w + x) == px(x, y))
    }
  }

  test("WebP: arbitrary images round-trip bit-exactly") {
    forAllSamples(imgGen) { im =>
      val px = pxFn(im)
      val img = Webp.decodeWebpLossless(Webp.encodeWebpLossless(im.w, im.h, px))
      assert(img.width == im.w && img.height == im.h)
      for (y <- 0 until im.h; x <- 0 until im.w)
        assert(img.pixels(y * im.w + x) == px(x, y))
    }
  }

  test("BMP: arbitrary images round-trip bit-exactly") {
    forAllSamples(imgGen) { im =>
      val px = pxFn(im)
      val img = Multimodal.decodeBmp24(Multimodal.encodeBmp24(im.w, im.h, px))
      assert(img.width == im.w && img.height == im.h)
      for (y <- 0 until im.h; x <- 0 until im.w)
        assert(img.pixels(y * im.w + x) == px(x, y))
    }
  }

  test("JPEG: arbitrary images inside the error envelope; block-constant gray exact") {
    forAllSamples(imgGen, n = 40) { im =>
      val px = pxFn(im)
      val img = Jpeg.decodeJpeg(Jpeg.encodeJpegRgb(im.w, im.h, px))
      assert(img.width == im.w && img.height == im.h)
      for (y <- 0 until im.h; x <- 0 until im.w; sh <- Seq(0, 8, 16)) {
        val err = math.abs(((px(x, y) >> sh) & 0xff) - ((img.pixels(y * im.w + x) >> sh) & 0xff))
        assert(err <= 12, s"err $err at ($x,$y) sh $sh ${im.w}x${im.h}")
      }
    }
    forAllSamples(imgGen, n = 40) { im =>
      val w = 8 * (1 + im.w % 4); val h = 8 * (1 + im.h % 3)
      def px(x: Int, y: Int): Int = {
        val g = ((x / 8) * im.a1 + (y / 8) * im.a2 + im.a3) % 256
        (g << 16) | (g << 8) | g
      }
      val img = Jpeg.decodeJpeg(Jpeg.encodeJpegRgb(w, h, px))
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y * w + x) == px(x, y), s"($x,$y) in ${w}x$h")
    }
  }

  test("JPEG: coefficient-domain files decode to the exact fixed-point IDCT; " +
      "integer IDCT within ±1 of the real IDCT") {
    // independent double-precision IDCT reference (textbook formula,
    // written here, NOT the decoder's code path)
    def realIdct(f: Array[Int]): Array[Double] = {
      val out = new Array[Double](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        var s = 0.0
        for (u <- 0 until 8; v <- 0 until 8) {
          val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
          s += cu * cv * f(u * 8 + v) *
            math.cos((2 * y + 1) * u * math.Pi / 16) *
            math.cos((2 * x + 1) * v * math.Pi / 16)
        }
        out(y * 8 + x) = 0.25 * s
      }
      out
    }
    // decoder-formula replica (the same arithmetic the DuckDB oracle
    // replays from Jpeg.IdctTab)
    def intIdct(f: Array[Int]): Array[Int] = {
      val t = Jpeg.IdctTab
      Array.tabulate(64) { i =>
        val y = i / 8; val x = i % 8
        var s = 0L
        for (u <- 0 until 8; v <- 0 until 8)
          s += f(u * 8 + v).toLong * t(y * 8 + u) * t(x * 8 + v)
        ((s + (1L << 29)) >> 30).toInt
      }
    }
    // table pins: DC column constant 11585 = round(2^15/2/sqrt(2))
    for (y <- 0 until 8) assert(Jpeg.IdctTab(y * 8) == 11585)
    val coefGen = for {
      seed <- Gen.choose(1, 1000000)
      nz <- Gen.choose(1, 12)
    } yield (seed, nz)
    forAllSamples(coefGen, n = 60) { case (seed, nz) =>
      val rnd = new scala.util.Random(seed)
      val f = new Array[Int](64)
      f(0) = rnd.nextInt(257) - 128 // DC keeps pixels near mid-range
      for (_ <- 0 until nz) f(1 + rnd.nextInt(63)) = rnd.nextInt(61) - 30
      // (a) integer IDCT within ±1 of the real-valued IDCT: the table
      // quantization bound the Jpeg scaladoc claims
      val ri = realIdct(f); val ii = intIdct(f)
      for (i <- 0 until 64)
        assert(math.abs(ii(i) - ri(i)) <= 1.0,
          s"idct drift ${ii(i)} vs ${ri(i)} at $i")
      // (b) entropy coding is exactly invertible: a 2x1-block file of
      // these coefficients decodes to precisely the formula's pixels
      val f2 = f.clone(); f2(0) = f(0) - 16 // second block: DC diff path
      val blocks = Array(f, f2)
      val img = Jpeg.decodeJpeg(
        Jpeg.encodeJpegGrayCoeffs(16, 8, (bx, _) => blocks(bx)))
      assert(img.width == 16 && img.height == 8)
      for ((blk, bx) <- blocks.zipWithIndex) {
        val expect = intIdct(blk)
        for (y <- 0 until 8; x <- 0 until 8) {
          val e = math.max(0, math.min(255, expect(y * 8 + x) + 128))
          val got = img.pixels(y * 16 + bx * 8 + x) & 0xff
          assert(got == e, s"block $bx ($x,$y): $got != $e")
        }
      }
    }
  }

  test("JPEG 4:2:0: zero-chroma color decode equals the grayscale decoder " +
      "pixel-for-pixel (MCU interleave + Y geometry cross-check)") {
    // Same Y coefficients through two INDEPENDENT paths: the 3-component
    // 4:2:0 interleaved-MCU decode with all-zero chroma (cb=cr=128 ->
    // zero offsets -> r=g=b=y) must equal the 1-component raster-order
    // decode. Any MCU-ordering / plane-stride / upsampling-index bug
    // breaks this.
    forAllSamples(Gen.choose(1, 1000000), n = 25) { seed =>
      val rnd = new scala.util.Random(seed)
      val w = 16 * (1 + rnd.nextInt(2)); val h = 16 * (1 + rnd.nextInt(2))
      val coefs = Array.fill(h / 8, w / 8) {
        val f = new Array[Int](64)
        f(0) = rnd.nextInt(201) - 100
        for (_ <- 0 until 6) f(1 + rnd.nextInt(63)) = rnd.nextInt(41) - 20
        f
      }
      val zero = (_: Int, _: Int) => new Array[Int](64)
      val color = Jpeg.decodeJpeg(Jpeg.encodeJpeg420Coeffs(w, h,
        (bx, by) => coefs(by)(bx), zero, zero))
      val gray = Jpeg.decodeJpeg(Jpeg.encodeJpegGrayCoeffs(w, h,
        (bx, by) => coefs(by)(bx)))
      assert(color.width == w && color.height == h)
      for (i <- 0 until w * h)
        assert(color.pixels(i) == gray.pixels(i),
          s"seed $seed pixel $i: ${color.pixels(i)}%06x vs ${gray.pixels(i)}%06x")
    }
  }

  test("JPEG 4:2:0: full decode equals the fixed-point replica " +
      "(per-plane integer IDCT + box upsample + fixed-point YCbCr->RGB)") {
    // term-for-term replica of the documented arithmetic — the same
    // formulas the mm_jpeg_color DuckDB oracle replays
    def intIdct(f: Array[Int]): Array[Int] = {
      val t = Jpeg.IdctTab
      Array.tabulate(64) { i =>
        val y = i / 8; val x = i % 8
        var s = 0L
        for (u <- 0 until 8; v <- 0 until 8)
          s += f(u * 8 + v).toLong * t(y * 8 + u) * t(x * 8 + v)
        ((s + (1L << 29)) >> 30).toInt
      }
    }
    def clamp(v: Int) = math.max(0, math.min(255, v))
    forAllSamples(Gen.choose(1, 1000000), n = 25) { seed =>
      val rnd = new scala.util.Random(seed)
      val mw = 1 + rnd.nextInt(2); val mh = 1 + rnd.nextInt(2)
      val w = 16 * mw; val h = 16 * mh
      def randBlock(): Array[Int] = {
        val f = new Array[Int](64)
        f(0) = rnd.nextInt(201) - 100
        for (_ <- 0 until 5) f(1 + rnd.nextInt(63)) = rnd.nextInt(31) - 15
        f
      }
      val cy = Array.fill(2 * mh, 2 * mw)(randBlock())
      val ccb = Array.fill(mh, mw)(randBlock())
      val ccr = Array.fill(mh, mw)(randBlock())
      val img = Jpeg.decodeJpeg(Jpeg.encodeJpeg420Coeffs(w, h,
        (bx, by) => cy(by)(bx), (bx, by) => ccb(by)(bx), (bx, by) => ccr(by)(bx)))
      // plane replicas, stored clamped to 0..255 like the decoder
      def plane(blocks: Array[Array[Array[Int]]]): (Int, Int) => Int = {
        val cache = blocks.map(_.map(intIdct))
        (x, y) => clamp(cache(y / 8)(x / 8)((y % 8) * 8 + (x % 8)) + 128)
      }
      val yP = plane(cy); val cbP = plane(ccb); val crP = plane(ccr)
      for (y <- 0 until h; x <- 0 until w) {
        val yv = yP(x, y)
        val cb = cbP(x / 2, y / 2) - 128
        val cr = crP(x / 2, y / 2) - 128
        val e = (clamp(yv + ((91881 * cr + 32768) >> 16)) << 16) |
          (clamp(yv - ((22554 * cb + 46802 * cr + 32768) >> 16)) << 8) |
          clamp(yv + ((116130 * cb + 32768) >> 16))
        assert(img.pixels(y * w + x) == e,
          f"seed $seed ($x,$y): ${img.pixels(y * w + x)}%06x vs $e%06x")
      }
    }
  }

  test("JPEG progressive: decode equals baseline decode of the same coefficients " +
    "(gray non-interleaved + 4:2:0 interleaved scans, random fixtures)") {
    // Progressive entropy coding (T.81 G: spectral selection,
    // successive approximation with EOB runs and correction bits) is
    // exactly invertible, so the accumulated coefficients — and hence
    // every decoded pixel — must match the baseline encoding of the
    // SAME blocks bit for bit. Random sparse coefficient fixtures
    // exercise EOBn runs across blocks, ZRL in both scan kinds, sign
    // bits and correction-bit buffering.
    val gen = for {
      bw <- Gen.choose(1, 5)
      bh <- Gen.choose(1, 4)
      seed <- Gen.choose(0, 1000000)
    } yield (bw, bh, seed)
    forAllSamples(gen, n = 25) { case (bw, bh, seed) =>
      val rnd = new scala.util.Random(seed)
      val blocks = Array.fill(bw * bh) {
        val f = new Array[Int](64)
        f(0) = rnd.nextInt(401) - 200
        for (_ <- 0 until rnd.nextInt(12)) f(rnd.nextInt(63) + 1) = rnd.nextInt(19) - 9
        f
      }
      def coef(bx: Int, by: Int) = blocks(by * bw + bx)
      val base = Jpeg.decodeJpeg(Jpeg.encodeJpegGrayCoeffs(bw * 8, bh * 8, coef))
      val prog = Jpeg.decodeJpeg(Jpeg.encodeJpegGrayProgCoeffs(bw * 8, bh * 8, coef))
      assert(java.util.Arrays.equals(base.pixels, prog.pixels),
        s"gray progressive != baseline at ${bw}x$bh seed=$seed")
    }
    forAllSamples(gen, n = 15) { case (mw0, mh0, seed) =>
      val mw = 1 + mw0 % 3; val mh = 1 + mh0 % 3
      val rnd = new scala.util.Random(seed + 7)
      def mk(n: Int): Array[Array[Int]] = Array.fill(n) {
        val f = new Array[Int](64)
        f(0) = rnd.nextInt(401) - 200
        for (_ <- 0 until rnd.nextInt(10)) f(rnd.nextInt(63) + 1) = rnd.nextInt(19) - 9
        f
      }
      val yB = mk(mw * 2 * mh * 2); val cbB = mk(mw * mh); val crB = mk(mw * mh)
      def cy(bx: Int, by: Int) = yB(by * mw * 2 + bx)
      def ccb(mx: Int, my: Int) = cbB(my * mw + mx)
      def ccr(mx: Int, my: Int) = crB(my * mw + mx)
      val base = Jpeg.decodeJpeg(Jpeg.encodeJpeg420Coeffs(mw * 16, mh * 16, cy, ccb, ccr))
      val prog = Jpeg.decodeJpeg(Jpeg.encodeJpeg420ProgCoeffs(mw * 16, mh * 16, cy, ccb, ccr))
      assert(java.util.Arrays.equals(base.pixels, prog.pixels),
        s"4:2:0 progressive != baseline at ${mw}x$mh MCUs seed=$seed")
    }
  }

  test("WAV: arbitrary PCM16 sample runs round-trip bit-exactly") {
    val wavGen = for {
      n <- Gen.choose(1, 400)
      a <- Gen.choose(1, 9999)
      b <- Gen.choose(0, 65535)
      rate <- Gen.oneOf(8000, 16000, 44100)
    } yield (n, a, b, rate)
    forAllSamples(wavGen) { case (n, a, b, rate) =>
      val samples = Array.tabulate(n)(i => (((i.toLong * a + b) % 65536L) - 32768L).toShort)
      val wav = Multimodal.decodeWav(Multimodal.encodeWavPcm16(rate, samples))
      assert(wav.sampleRate == rate && wav.samples.toSeq == samples.toSeq)
    }
  }
}
