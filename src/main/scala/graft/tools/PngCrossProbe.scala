package graft.tools

import java.nio.file.{Files, Paths}
import graft.operators.Multimodal

/** Dev probe: compare graft's PNG decode against libpng's canonical
  * RGBA8 expansion of real encoder output (tools/png_crosscheck.py).
  *
  * Usage: runMain graft.tools.PngCrossProbe /tmp/pngx
  */
object PngCrossProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/pngx")
    var pass = 0
    var fail = 0
    Files.readAllLines(Paths.get(dir, "manifest.txt")).forEach { line =>
      if (line.trim.nonEmpty) {
        val Array(name, wS, hS, desc) = line.trim.split("\\s+")
        val w = wS.toInt; val h = hS.toInt
        val png = Files.readAllBytes(Paths.get(dir, name + ".png"))
        val want = Files.readAllBytes(Paths.get(dir, name + ".rgba"))
        try {
          val img = Multimodal.decodePng(png)
          require(img.width == w && img.height == h, "dims")
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
          if (java.util.Arrays.equals(got, want)) {
            pass += 1
            println(s"OK   $name ${w}x$h $desc")
          } else {
            fail += 1
            var d = 0
            while (got(d) == want(d)) d += 1
            println(s"DIFF $name ${w}x$h $desc: first at px ${d / 4} ch ${d % 4} " +
              s"got ${got(d) & 0xff} want ${want(d) & 0xff}; " +
              s"${got.indices.count(k => got(k) != want(k))}/${got.length} differ")
          }
        } catch {
          case e: Throwable =>
            fail += 1
            println(s"ERR  $name ${w}x$h $desc: ${e.getMessage}")
        }
      }
    }
    println(s"pass=$pass fail=$fail")
    if (fail > 0) sys.exit(1)
  }
}
