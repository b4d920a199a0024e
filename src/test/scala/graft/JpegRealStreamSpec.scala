package graft

import java.nio.file.{Files, Path, Paths}
import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Jpeg

/** Exactness of the JPEG entropy layer against REAL libjpeg encoder
  * output. T.81 specifies entropy coding exactly but leaves the IDCT
  * implementation-defined, so the cross-implementation-comparable
  * representation is the QUANTIZED coefficient plane: libjpeg's
  * jpeg_read_coefficients and graft's decodeJpegCoefficients must
  * agree byte-for-byte. The corpus (tools/jpeg_crosscheck.py +
  * tools/jpeg_harness.c, compiled on demand) sweeps quality,
  * gray/color, baseline/progressive (libjpeg's own scan scripts, not
  * graft's fixture scripts), restart intervals 0/1/2/5, 4:2:0 vs
  * 4:4:4, and optimized (custom) vs default Huffman tables. Self-skips
  * when gcc or libjpeg headers are unavailable.
  */
class JpegRealStreamSpec extends AnyFunSuite {

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
      Files.exists(Paths.get("/usr/include/jpeglib.h"))
    catch { case _: Throwable => false }

  private def tmpDir(tag: String): Path = {
    val d = Paths.get(System.getProperty("java.io.tmpdir"),
      s"jpegspec_${ProcessHandle.current().pid()}_$tag")
    Files.createDirectories(d)
    d
  }

  test("quantized coefficients equal libjpeg's on real encoder streams " +
      "(baseline+progressive, DRI 0/1/2/5, custom tables, 4:2:0)") {
    assume(toolchainAvailable, "gcc/libjpeg not available")
    val dir = tmpDir("coef")
    val (rc, out) = run("python3", "tools/jpeg_crosscheck.py", dir.toString)
    assert(rc == 0, s"generator failed: $out")
    var n = 0
    Files.readAllLines(dir.resolve("manifest.txt")).forEach { line =>
      if (line.trim.nonEmpty) {
        val Array(name, desc) = line.trim.split("\\s+")
        val jpg = Files.readAllBytes(dir.resolve(name + ".jpg"))
        val bin = ByteBuffer.wrap(Files.readAllBytes(dir.resolve(name + ".bin")))
          .order(ByteOrder.LITTLE_ENDIAN)
        val got = Jpeg.decodeJpegCoefficients(jpg)
        val ncomp = bin.getInt()
        assert(ncomp == got.planes.length, s"$name: component count")
        var ci = 0
        while (ci < ncomp) {
          val wb = bin.getInt(); val hb = bin.getInt()
          assert(wb == got.blocksW(ci) && hb == got.blocksH(ci),
            s"$name ($desc) comp $ci: grid ${wb}x$hb vs " +
              s"${got.blocksW(ci)}x${got.blocksH(ci)}")
          val plane = got.planes(ci)
          var k = 0
          val total = wb * hb * 64
          while (k < total) {
            val want = bin.getShort().toInt
            assert(plane(k) == want,
              s"$name ($desc) comp $ci offset $k: ${plane(k)} vs $want")
            k += 1
          }
          ci += 1
        }
        n += 1
      }
    }
    assert(n >= 12, s"only $n jpeg cases generated")
  }

  test("pixel decode of DRI streams matches the same stream without " +
      "restarts (restart markers are entropy-layer-only)") {
    assume(toolchainAvailable, "gcc/libjpeg not available")
    val dir = tmpDir("dri")
    val exe = dir.resolve("jpeg_harness").toString
    assert(run("gcc", "-O2", "-o", exe, "tools/jpeg_harness.c", "-ljpeg")._1 == 0)
    // same image, restart 0 vs 3: identical quantized coefficients
    // imply identical pixels through graft's one IDCT
    Seq(("gray", "base"), ("color", "base"), ("gray", "prog"),
      ("color", "prog")).zipWithIndex.foreach { case ((c, p), i) =>
      val a = dir.resolve(s"a$i.jpg").toString
      val b = dir.resolve(s"b$i.jpg").toString
      // seed parity controls optimize_coding; keep it equal across the
      // pair so only the restart interval differs
      assert(run(exe, "gen", a, "41", "29", "photo", s"${20 + 2 * i}", "70",
        c, p, "0", "444")._1 == 0)
      assert(run(exe, "gen", b, "41", "29", "photo", s"${20 + 2 * i}", "70",
        c, p, "3", "444")._1 == 0)
      val ia = Jpeg.decodeJpeg(Files.readAllBytes(Paths.get(a)))
      val ib = Jpeg.decodeJpeg(Files.readAllBytes(Paths.get(b)))
      assert(ia.width == ib.width && ia.height == ib.height)
      assert(ia.pixels.sameElements(ib.pixels),
        s"$c/$p: DRI changed decoded pixels")
    }
  }
}
