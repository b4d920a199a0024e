package graft

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Bit-exactness of the PNG decoder against REAL libpng encoder output
  * across the full format surface: every color type at each legal bit
  * depth (gray 1/2/4/8/16, truecolor 8/16, palette 1/2/4/8,
  * gray+alpha and RGBA 8/16), non-interlaced and Adam7, with tRNS
  * color keys and palette alphas. The comparison target is libpng's
  * canonical RGBA8 expansion (png_set_expand + strip_16 + gray_to_rgb
  * + opaque filler) — exactly the semantics decodePng implements.
  * Corpus from tools/png_crosscheck.py + tools/png_harness.c, compiled
  * on demand; self-skips without gcc/libpng.
  */
class PngRealStreamSpec extends AnyFunSuite {

  private def run(cmd: String*): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes, "UTF-8")
    p.waitFor()
    (p.exitValue(), out)
  }

  private lazy val toolchainAvailable: Boolean =
    try run("gcc", "--version")._1 == 0 &&
      Files.exists(Paths.get("/usr/include/png.h"))
    catch { case _: Throwable => false }

  private def tmpDir(tag: String): Path = {
    val d = Paths.get(System.getProperty("java.io.tmpdir"),
      s"pngspec_${ProcessHandle.current().pid()}_$tag")
    Files.createDirectories(d)
    d
  }

  test("decodes every color type / depth / interlace / tRNS combination " +
      "to libpng's exact RGBA8 expansion") {
    assume(toolchainAvailable, "gcc/libpng not available")
    val dir = tmpDir("rgba")
    val (rc, out) = run("python3", "tools/png_crosscheck.py", dir.toString)
    assert(rc == 0, s"generator failed: $out")
    var n = 0
    Files.readAllLines(dir.resolve("manifest.txt")).forEach { line =>
      if (line.trim.nonEmpty) {
        val Array(name, wS, hS, desc) = line.trim.split("\\s+")
        val w = wS.toInt; val h = hS.toInt
        val png = Files.readAllBytes(dir.resolve(name + ".png"))
        val want = Files.readAllBytes(dir.resolve(name + ".rgba"))
        val img = Multimodal.decodePng(png)
        assert(img.width == w && img.height == h, s"$name dims")
        val got = new Array[Byte](w * h * 4)
        var i = 0
        var p = 0
        while (p < w * h) {
          val v = img.pixels(p)
          got(i) = ((v >> 16) & 0xff).toByte
          got(i + 1) = ((v >> 8) & 0xff).toByte
          got(i + 2) = (v & 0xff).toByte
          got(i + 3) = (if (img.alpha == null) 255 else img.alpha(p)).toByte
          i += 4; p += 1
        }
        assert(java.util.Arrays.equals(got, want),
          s"$name ($desc): decode differs from libpng")
        n += 1
      }
    }
    assert(n >= 24, s"only $n png cases generated")
  }
}
