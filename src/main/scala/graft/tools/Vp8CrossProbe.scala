package graft.tools

import java.nio.file.{Files, Paths}
import graft.operators.Vp8

/** Dev probe: verify the graft VP8 decoder byte-for-byte against the
  * system libwebp's reconstruction of REAL encoder output (fixtures
  * written by tools/vp8_crosscheck.py). Prints per-case OK or the
  * first differing sample with coordinates — mismatch positions
  * localize which predictor/filter path is wrong.
  *
  * Usage: runMain graft.tools.Vp8CrossProbe /tmp/vp8x
  */
object Vp8CrossProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/vp8x")
    val manifest = Files.readAllLines(Paths.get(dir, "manifest.txt"))
    var pass = 0
    var fail = 0
    manifest.forEach { line =>
      if (line.trim.nonEmpty) {
        val Array(name, wS, hS, qS) = line.trim.split("\\s+")
        val w = wS.toInt; val h = hS.toInt
        val webp = Files.readAllBytes(Paths.get(dir, name + ".webp"))
        val want = Files.readAllBytes(Paths.get(dir, name + ".yuv"))
        try {
          Vp8.debugCapture.set(true)
          val img = Vp8.decodeWebpLossy(webp)
          require(img.width == w && img.height == h,
            s"dims ${img.width}x${img.height} want ${w}x$h")
          val cw = img.cw; val ch = img.ch
          val got = new Array[Byte](w * h + 2 * cw * ch)
          var i = 0
          while (i < w * h) { got(i) = img.y(i).toByte; i += 1 }
          var j = 0
          while (j < cw * ch) { got(i) = img.u(j).toByte; i += 1; j += 1 }
          j = 0
          while (j < cw * ch) { got(i) = img.v(j).toByte; i += 1; j += 1 }
          if (java.util.Arrays.equals(got, want)) {
            pass += 1
            println(s"OK   $name ${w}x$h q$qS")
          } else {
            fail += 1
            var d = 0
            while (got(d) == want(d)) d += 1
            val (plane, px, py) =
              if (d < w * h) ("Y", d % w, d / w)
              else if (d < w * h + cw * ch) ("U", (d - w * h) % cw, (d - w * h) / cw)
              else ("V", (d - w * h - cw * ch) % cw, (d - w * h - cw * ch) / cw)
            val n = got.indices.count(k => got(k) != want(k))
            val mbW = (w + 15) / 16
            val (mbx, mby) =
              if (plane == "Y") (px / 16, py / 16) else (px / 8, py / 8)
            val info = Vp8.debugMbs.get()(mby * mbW + mbx)
            val sb =
              if (plane == "Y") ((py % 16) / 4) * 4 + (px % 16) / 4 else -1
            val modeS =
              s"yMode=${info._1} uvMode=${info._2} skip=${info._3}" +
                (if (info._1 == 4 && sb >= 0)
                  s" bmode(sb=$sb)=${info._4(sb)} all=${info._4.mkString(",")}"
                else "")
            println(s"DIFF $name ${w}x$h q$qS: first at $plane($px,$py) " +
              s"mb($mbx,$mby) got ${got(d) & 0xff} want ${want(d) & 0xff}; " +
              s"$n/${got.length} differ; $modeS")
          }
        } catch {
          case e: Throwable =>
            fail += 1
            println(s"ERR  $name ${w}x$h q$qS: ${e.getMessage}")
        }
      }
    }
    println(s"pass=$pass fail=$fail")
    if (fail > 0) sys.exit(1)
  }
}
