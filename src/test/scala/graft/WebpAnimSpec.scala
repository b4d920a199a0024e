package graft

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Webp

/** Animated WebP: ANMF/ANIM/VP8X container walk + spec compositing.
  * libwebpdemux is absent, so verification splits in two (see
  * tools/webp_anim_check.py): frame payloads are REAL libwebp encodes
  * whose pixel truth comes from WebPDecodeRGBA (the still decoders are
  * already bit-exact against libwebp), and the container is assembled
  * + composited by the independent Python harness — graft's decoder
  * must reproduce every composited canvas byte-for-byte: blend vs
  * overwrite, dispose-to-background (zero and nonzero), a lossy VP8
  * frame among lossless ones, and the documented integer
  * fractional-alpha formula. Self-skips without libwebp.
  */
class WebpAnimSpec extends AnyFunSuite {

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
      s"webpanim_${ProcessHandle.current().pid()}_$tag")
    Files.createDirectories(d)
    d
  }

  test("animations composite bit-exactly: real libwebp frame payloads, " +
      "blend/overwrite, dispose modes, lossy frame, fractional alpha") {
    assume(libwebpAvailable, "libwebp/python3 not available")
    val dir = tmpDir("cases")
    val (rc, out) = run("python3", "tools/webp_anim_check.py", dir.toString)
    assert(rc == 0, s"generator failed: $out")
    var n = 0
    Files.readAllLines(dir.resolve("manifest.txt")).forEach { line =>
      if (line.trim.nonEmpty) {
        val Array(name, wS, hS, fS, bgS, loopS, desc) = line.trim.split("\\s+")
        val cw = wS.toInt; val ch = hS.toInt; val nf = fS.toInt
        val bytes = Files.readAllBytes(dir.resolve(name + ".webp"))
        val anim = Webp.decodeWebpAnim(bytes)
        assert(anim.width == cw && anim.height == ch, s"$name canvas dims")
        assert(anim.frames.length == nf, s"$name frame count")
        assert(anim.loopCount == loopS.toInt, s"$name loop count")
        assert((anim.background.toLong & 0xffffffffL) ==
          java.lang.Long.parseLong(bgS, 16), s"$name background")
        val canvases = anim.composite
        for (k <- 0 until nf) {
          val want = Files.readAllBytes(dir.resolve(s"$name.f$k.rgba"))
          val cv = canvases(k)
          val got = new Array[Byte](cw * ch * 4)
          var i = 0
          var p = 0
          while (p < cw * ch) {
            val v = cv(p)
            got(i) = ((v >> 16) & 0xff).toByte
            got(i + 1) = ((v >> 8) & 0xff).toByte
            got(i + 2) = (v & 0xff).toByte
            got(i + 3) = ((v >>> 24) & 0xff).toByte
            i += 4; p += 1
          }
          assert(java.util.Arrays.equals(got, want),
            s"$name ($desc) frame $k: composite differs")
        }
        n += 1
      }
    }
    assert(n >= 5, s"only $n animation cases generated")
  }

  test("pure-JVM roundtrip: our assembler + lossless frames, dispose fill") {
    // no libwebp needed: frames from our own encoder (opaque RGB), the
    // dispose rect must show the ANIM background color afterwards
    val bg = 0xff102030
    val f0 = Webp.encodeWebpLossless(20, 12, (x, y) => (x * 9 + y) % 0x1000000)
    val f1 = Webp.encodeWebpLossless(8, 6, (x, y) => 0x00ff00 + x + y * 16)
    val f2 = Webp.encodeWebpLossless(4, 4, (_, _) => 0x0000ff)
    val data = Webp.encodeWebpAnim(20, 12, bg, 5, Seq(
      (0, 0, 100, true, false, f0),
      (6, 4, 100, true, true, f1), // disposed to bg after its snapshot
      (0, 0, 100, true, false, f2)))
    val anim = Webp.decodeWebpAnim(data)
    assert(anim.width == 20 && anim.height == 12 && anim.loopCount == 5)
    assert(anim.background == bg && anim.frames.length == 3)
    assert(anim.frames(1).disposeToBackground && !anim.frames(0).disposeToBackground)
    assert(anim.frames(1).durationMs == 100)
    val cv = anim.composite
    // frame 0 canvas = base everywhere, opaque
    assert(cv(0)(0) == (0xff000000 | 0), "base top-left")
    assert(cv(0)(5 * 20 + 7) == (0xff000000 | ((7 * 9 + 5) % 0x1000000)))
    // frame 1: rect overwritten with f1 colors
    assert(cv(1)(4 * 20 + 6) == 0xff00ff00)
    // frame 2: the disposed rect shows the BACKGROUND color except
    // where f2 (drawn at origin, outside the rect) — pick (7,5) inside
    // the disposed rect [6..14)x[4..10)
    assert(cv(2)(5 * 20 + 7) == bg, "disposed rect must be background")
    assert(cv(2)(0) == 0xff0000ff, "frame 2 pixel")
    assert(cv(2)(11 * 20 + 19) == (0xff000000 | ((19 * 9 + 11) % 0x1000000)),
      "outside both rects keeps base")
  }

  test("malformed animations fail with clear errors") {
    def expectMsg(sub: String)(body: => Any): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains(sub), s"got: ${e.getMessage}")
    }
    val f0 = Webp.encodeWebpLossless(6, 4, (x, y) => x + y)
    val good = Webp.encodeWebpAnim(6, 4, 0, 0, Seq((0, 0, 10, true, false, f0)))
    expectMsg("not a RIFF")(Webp.decodeWebpAnim("garbage".getBytes ++ good))
    expectMsg("no ANMF")(Webp.decodeWebpAnim(f0)) // a plain still
    expectMsg("animated file")(Webp.decodeWebp(good)) // wrong entry point
    intercept[IllegalArgumentException](
      Webp.decodeWebpAnim(java.util.Arrays.copyOf(good, good.length / 2)))
  }
}
