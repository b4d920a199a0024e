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

  test("multi-frame animations composite bit-exactly against giflib: " +
      "all disposal modes, offsets, transparency, local palettes, interlace") {
    assume(giflibAvailable, "giflib/python3 not available")
    val dir = tmpDir("frames")
    val (rc, out) = run("python3", "tools/gif_crosscheck.py", dir.toString)
    assert(rc == 0, s"generator failed: $out")
    var n = 0
    Files.readAllLines(dir.resolve("manifest_frames.txt")).forEach { line =>
      if (line.trim.nonEmpty) {
        val Array(name, wS, hS, fS, desc) = line.trim.split("\\s+")
        val sw = wS.toInt; val sh = hS.toInt; val nf = fS.toInt
        val gif = Files.readAllBytes(dir.resolve(name + ".gif"))
        val anim = Gif.decodeGifFrames(gif)
        assert(anim.width == sw && anim.height == sh, s"$name dims")
        assert(anim.frames.length == nf, s"$name frame count")
        val canvases = anim.composite
        for (k <- 0 until nf) {
          val want = Files.readAllBytes(dir.resolve(s"$name.f$k.rgba"))
          val cv = canvases(k)
          val got = new Array[Byte](sw * sh * 4)
          var i = 0
          var p = 0
          while (p < sw * sh) {
            val v = cv(p)
            val a = (v >>> 24) & 0xff
            got(i) = (if (a == 0) 0 else (v >> 16) & 0xff).toByte
            got(i + 1) = (if (a == 0) 0 else (v >> 8) & 0xff).toByte
            got(i + 2) = (if (a == 0) 0 else v & 0xff).toByte
            got(i + 3) = a.toByte
            i += 4; p += 1
          }
          assert(java.util.Arrays.equals(got, want),
            s"$name ($desc) frame $k: composite differs from giflib")
        }
        n += 1
      }
    }
    assert(n >= 10, s"only $n animation cases generated")
  }

  test("disposal semantics pinned on hand-built fixtures (no giflib needed)") {
    import Gif.GifFrameSpec
    val pal = Array(0xff0000, 0x00ff00, 0x0000ff, 0x123456)
    // base all-red; a 2x2 rect at (1,1) green with one transparent px,
    // disposal 2; then a 1x1 blue px at the origin
    val bytes = Gif.encodeGifAnimation(4, 3, pal, Seq(
      GifFrameSpec(0, 0, 4, 3, null, -1, 1, (_, _) => 0),
      GifFrameSpec(1, 1, 2, 2, null, 3, 2,
        (x, y) => if (x == 0 && y == 0) 3 else 1),
      GifFrameSpec(0, 0, 1, 1, null, -1, 0, (_, _) => 2)))
    val anim = Gif.decodeGifFrames(bytes)
    assert(anim.width == 4 && anim.height == 3 && anim.frames.length == 3)
    assert(anim.frames(1).disposal == 2 && anim.frames(1).transIdx == 3)
    val cv = anim.composite
    assert(cv(0).forall(_ == 0xffff0000), "frame 0: opaque base everywhere")
    assert(cv(1)(1 * 4 + 1) == 0xffff0000, "transparent px shows base")
    assert(cv(1)(1 * 4 + 2) == 0xff00ff00 && cv(1)(2 * 4 + 1) == 0xff00ff00)
    // disposal 2 cleared the WHOLE rect (including the transparent px)
    for (i <- Seq(5, 6, 9, 10)) assert(cv(2)(i) == 0, s"rect px $i not cleared")
    assert(cv(2)(0) == 0xff0000ff && cv(2)(1) == 0xffff0000)
    // disposal 3: the middle frame's full overwrite is reverted
    val b2 = Gif.encodeGifAnimation(3, 2, pal, Seq(
      GifFrameSpec(0, 0, 3, 2, null, -1, 1, (x, _) => x % 3),
      GifFrameSpec(0, 0, 3, 2, null, -1, 3, (_, _) => 3),
      GifFrameSpec(0, 0, 1, 1, null, -1, 0, (_, _) => 2)))
    val cv2 = Gif.decodeGifFrames(b2).composite
    assert(cv2(1).forall(_ == 0xff123456), "frame 1 overwrites all")
    assert(cv2(2)(0) == 0xff0000ff && cv2(2)(1) == 0xff00ff00 &&
      cv2(2)(2) == 0xff0000ff, "frame 2 sees the RESTORED base")
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
