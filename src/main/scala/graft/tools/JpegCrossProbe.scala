package graft.tools

import java.nio.file.{Files, Paths}
import java.nio.{ByteBuffer, ByteOrder}
import graft.operators.Jpeg

/** Dev probe: compare graft's quantized-coefficient JPEG decode
  * against libjpeg's jpeg_read_coefficients on real encoder output
  * (corpus from tools/jpeg_crosscheck.py). The coefficient layer is
  * exactly specified by T.81 (the IDCT is not), so the planes must be
  * IDENTICAL across implementations.
  *
  * Usage: runMain graft.tools.JpegCrossProbe /tmp/jpegx
  */
object JpegCrossProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/jpegx")
    var pass = 0
    var fail = 0
    Files.readAllLines(Paths.get(dir, "manifest.txt")).forEach { line =>
      if (line.trim.nonEmpty) {
        val Array(name, desc) = line.trim.split("\\s+")
        val jpg = Files.readAllBytes(Paths.get(dir, name + ".jpg"))
        val bin = ByteBuffer.wrap(Files.readAllBytes(Paths.get(dir, name + ".bin")))
          .order(ByteOrder.LITTLE_ENDIAN)
        try {
          val got = Jpeg.decodeJpegCoefficients(jpg)
          val ncomp = bin.getInt()
          require(ncomp == got.planes.length, s"ncomp $ncomp vs ${got.planes.length}")
          var ok = true
          var diag = ""
          var ci = 0
          while (ci < ncomp && ok) {
            val wb = bin.getInt(); val hb = bin.getInt()
            if (wb != got.blocksW(ci) || hb != got.blocksH(ci)) {
              ok = false
              diag = s"comp $ci grid ${wb}x$hb vs ${got.blocksW(ci)}x${got.blocksH(ci)}"
            } else {
              val plane = got.planes(ci)
              var k = 0
              val n = wb * hb * 64
              while (k < n && ok) {
                val want = bin.getShort().toInt
                if (plane(k) != want) {
                  ok = false
                  diag = s"comp $ci block ${(k / 64) % wb},${k / 64 / wb} " +
                    s"pos ${k % 64}: got ${plane(k)} want $want"
                }
                k += 1
              }
            }
            ci += 1
          }
          if (ok) { pass += 1; println(s"OK   $name $desc") }
          else { fail += 1; println(s"DIFF $name $desc: $diag") }
        } catch {
          case e: Throwable =>
            fail += 1
            println(s"ERR  $name $desc: ${e.getMessage}")
        }
      }
    }
    println(s"pass=$pass fail=$fail")
    if (fail > 0) sys.exit(1)
  }
}
