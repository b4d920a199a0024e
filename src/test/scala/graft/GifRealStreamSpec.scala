package graft

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Gif

/** Bit-exactness of the GIF decoder against the system giflib: real
  * giflib encodes across global/local palettes (2/16/64/256 colors),
  * interlaced and sequential rasters, GCE transparency, and
  * multi-frame files, decoded by both giflib (DGifSlurp, which
  * deinterlaces into screen order) and graft — first-frame RGBA and
  * frame counts must match exactly. Corpus via ctypes over
  * libgif.so.7 (tools/gif_crosscheck.py); self-skips without it.
  */
class GifRealStreamSpec extends AnyFunSuite {

  private def run(cmd: String*): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes, "UTF-8")
    p.waitFor()
    (p.exitValue(), out)
  }

  private lazy val giflibAvailable: Boolean =
    try run("python3", "-c", "import ctypes; ctypes.CDLL('libgif.so.7')")._1 == 0
    catch { case _: Throwable => false }

  private def tmpDir(tag: String): Path = {
    val d = Paths.get(System.getProperty("java.io.tmpdir"),
      s"gifspec_${ProcessHandle.current().pid()}_$tag")
    Files.createDirectories(d)
    d
  }

  test("decodes real giflib streams bit-exactly: palettes, interlace, " +
      "transparency, multi-frame") {
    assume(giflibAvailable, "giflib/python3 not available")
    val dir = tmpDir("rgba")
    val (rc, out) = run("python3", "tools/gif_crosscheck.py", dir.toString)
    assert(rc == 0, s"generator failed: $out")
    var n = 0
    Files.readAllLines(dir.resolve("manifest.txt")).forEach { line =>
      if (line.trim.nonEmpty) {
        val Array(name, wS, hS, fS, desc) = line.trim.split("\\s+")
        val w = wS.toInt; val h = hS.toInt; val nf = fS.toInt
        val gif = Files.readAllBytes(dir.resolve(name + ".gif"))
        val want = Files.readAllBytes(dir.resolve(name + ".rgba"))
        val img = Gif.decodeGif(gif)
        assert(img.width == w && img.height == h, s"$name dims")
        assert(img.frames == nf, s"$name frames ${img.frames} want $nf")
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
          s"$name ($desc): decode differs from giflib")
        n += 1
      }
    }
    assert(n >= 15, s"only $n gif cases generated")
  }

  test("malformed inputs fail with clear errors") {
    def expectMsg(sub: String)(body: => Any): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains(sub), s"got: ${e.getMessage}")
    }
    expectMsg("too short")(Gif.decodeGif(Array[Byte](1, 2, 3)))
    expectMsg("bad signature")(Gif.decodeGif(("GIF99a" + "x" * 20).getBytes))
    // a valid file truncated mid-LZW must fail, never loop or AIOOBE
    assume(giflibAvailable, "giflib/python3 not available")
    val dir = tmpDir("trunc")
    assert(run("python3", "tools/gif_crosscheck.py", dir.toString)._1 == 0)
    val good = Files.readAllBytes(dir.resolve("gif_0.gif"))
    Seq(14, 20, good.length / 2, good.length - 2).foreach { k =>
      intercept[IllegalArgumentException](
        Gif.decodeGif(java.util.Arrays.copyOf(good, k)))
    }
  }
}
