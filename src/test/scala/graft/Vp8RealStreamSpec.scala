package graft

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Vp8

/** Bit-exactness of the VP8 decoder against REAL encoder output, in
  * both directions, using the system libwebp as the independent
  * implementation (via the committed python harnesses — ctypes over
  * libwebp.so.7, present in this container; the spec self-skips when
  * the library or python3 is unavailable so `sbt test` stays portable):
  *
  *  1. libwebp encodes 112 images (sizes 1x1..256x256 incl. partial
  *     macroblocks, qualities 0-100, simple/normal/off loop filter,
  *     sharpness, 1-8 token partitions, 1-4 segments, autofilter) —
  *     graft's decode of every stream must equal libwebp's own
  *     reconstruction byte-for-byte on all three planes.
  *  2. graft's fixture encoder writes coefficient-domain VP8 streams —
  *     libwebp's decode of them must equal graft's (proves the
  *     mm_webp_lossy fixtures are genuine VP8, not a private dialect).
  */
class Vp8RealStreamSpec extends AnyFunSuite {

  private def run(cmd: String*): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes, "UTF-8")
    p.waitFor()
    (p.exitValue(), out)
  }

  private lazy val libwebpAvailable: Boolean =
    try run("python3", "-c", "import ctypes; ctypes.CDLL('libwebp.so.7')")._1 == 0
    catch { case _: Throwable => false }

  private def tmpDir(tag: String): Path = {
    val d = Paths.get(System.getProperty("java.io.tmpdir"),
      s"vp8spec_${ProcessHandle.current().pid()}_$tag")
    Files.createDirectories(d)
    d
  }

  private def checkDir(dir: Path): Unit = {
    val manifest = Files.readAllLines(dir.resolve("manifest.txt"))
    var n = 0
    manifest.forEach { line =>
      if (line.trim.nonEmpty) {
        val parts = line.trim.split("\\s+")
        val name = parts(0); val w = parts(1).toInt; val h = parts(2).toInt
        val webp = Files.readAllBytes(dir.resolve(name + ".webp"))
        val want = Files.readAllBytes(dir.resolve(name + ".yuv"))
        val img = Vp8.decodeWebpLossy(webp)
        assert(img.width == w && img.height == h, s"$name dims")
        val cw = img.cw; val ch = img.ch
        val got = new Array[Byte](w * h + 2 * cw * ch)
        var i = 0
        img.y.foreach { p => got(i) = p.toByte; i += 1 }
        img.u.foreach { p => got(i) = p.toByte; i += 1 }
        img.v.foreach { p => got(i) = p.toByte; i += 1 }
        assert(java.util.Arrays.equals(got, want),
          s"$name (${w}x$h): decode differs from libwebp")
        n += 1
      }
    }
    assert(n > 0, "no cases generated")
  }

  test("decodes every real libwebp-encoded stream bit-exactly (simple API)") {
    assume(libwebpAvailable, "libwebp/python3 not available")
    val dir = tmpDir("simple")
    val (rc, out) = run("python3", "tools/vp8_crosscheck.py", dir.toString)
    assert(rc == 0, s"generator failed: $out")
    checkDir(dir)
  }

  test("decodes advanced-config streams bit-exactly (filters, segments, partitions)") {
    assume(libwebpAvailable, "libwebp/python3 not available")
    val dir = tmpDir("adv")
    val (rc, out) = run("python3", "tools/vp8_crosscheck_adv.py", dir.toString)
    assert(rc == 0, s"generator failed: $out")
    checkDir(dir)
  }

  test("alpha sidecars: raw and VP8L-compressed ALPH payloads both " +
      "decode bit-exactly against libwebp") {
    assume(libwebpAvailable, "libwebp/python3 not available")
    val dir = tmpDir("alpha")
    val (rc, out) = run("python3", "tools/vp8_alpha_check.py", dir.toString)
    assert(rc == 0, s"generator failed: $out")
    val manifest = Files.readAllLines(dir.resolve("manifest.txt"))
    var rawN = 0
    var vp8lN = 0
    manifest.forEach { line =>
      if (line.trim.nonEmpty) {
        val Array(name, wS, hS, compS) = line.trim.split("\\s+")
        val w = wS.toInt; val h = hS.toInt
        val webp = Files.readAllBytes(dir.resolve(name + ".webp"))
        val want = Files.readAllBytes(dir.resolve(name + ".alpha"))
        // every alpha payload decodes: raw directly, VP8L-compressed
        // through the full lossless decoder (transforms included) —
        // and the plane must equal libwebp's bit-for-bit
        val img = graft.operators.Webp.decodeWebp(webp)
        assert(img.width == w && img.height == h)
        val got = img.pixels.map(p => ((p >>> 24) & 0xff).toByte)
        assert(java.util.Arrays.equals(got, want),
          s"$name (ALPH comp=$compS): alpha plane differs from libwebp")
        if (compS == "0") rawN += 1 else vp8lN += 1
      }
    }
    assert(rawN > 0, "no raw-alpha case generated")
    assert(vp8lN > 0, "no VP8L-compressed alpha case generated")
  }

  test("decodes real LOSSLESS (VP8L) encoder streams bit-exactly — " +
      "all transforms, bundled palettes, meta prefix, methods 0-6") {
    assume(libwebpAvailable, "libwebp/python3 not available")
    val dir = tmpDir("vp8l")
    val (rc, out) = run("python3", "tools/vp8l_crosscheck.py", dir.toString)
    assert(rc == 0, s"generator failed: $out")
    var n = 0
    Files.readAllLines(dir.resolve("manifest.txt")).forEach { line =>
      if (line.trim.nonEmpty) {
        val Array(name, wS, hS, desc) = line.trim.split("\\s+")
        val w = wS.toInt; val h = hS.toInt
        val webp = Files.readAllBytes(dir.resolve(name + ".webp"))
        val want = Files.readAllBytes(dir.resolve(name + ".rgb"))
        val img = graft.operators.Webp.decodeWebp(webp)
        assert(img.width == w && img.height == h, s"$name dims")
        val got = new Array[Byte](w * h * 3)
        var i = 0
        img.pixels.foreach { p =>
          got(i) = ((p >> 16) & 0xff).toByte
          got(i + 1) = ((p >> 8) & 0xff).toByte
          got(i + 2) = (p & 0xff).toByte
          i += 3
        }
        assert(java.util.Arrays.equals(got, want),
          s"$name ($desc): lossless decode differs from libwebp")
        n += 1
      }
    }
    assert(n >= 20, s"only $n lossless cases generated")
  }

  test("graft fixture streams decode identically through libwebp") {
    assume(libwebpAvailable, "libwebp/python3 not available")
    val dir = tmpDir("fix")
    graft.tools.Vp8FixtureProbe.main(Array(dir.toString))
    val (rc, out) = run("python3", "tools/vp8_fixture_check.py", dir.toString)
    assert(rc == 0, s"libwebp disagrees with graft on graft-encoded streams: $out")
  }
}
