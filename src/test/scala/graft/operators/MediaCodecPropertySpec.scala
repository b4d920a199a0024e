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
