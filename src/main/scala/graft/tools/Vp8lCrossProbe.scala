package graft.tools

import java.nio.file.{Files, Paths}
import graft.operators.Webp

/** Dev probe: verify the VP8L lossless decoder byte-for-byte against
  * real libwebp lossless encoder output (tools/vp8l_crosscheck.py).
  *
  * Usage: runMain graft.tools.Vp8lCrossProbe /tmp/vp8l
  */
object Vp8lCrossProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/vp8l")
    var pass = 0
    var fail = 0
    Files.readAllLines(Paths.get(dir, "manifest.txt")).forEach { line =>
      if (line.trim.nonEmpty) {
        val Array(name, wS, hS, desc) = line.trim.split("\\s+")
        val w = wS.toInt; val h = hS.toInt
        val webp = Files.readAllBytes(Paths.get(dir, name + ".webp"))
        val want = Files.readAllBytes(Paths.get(dir, name + ".rgb"))
        try {
          val img = Webp.decodeWebp(webp)
          require(img.width == w && img.height == h, "dims")
          val got = new Array[Byte](w * h * 3)
          var i = 0
          img.pixels.foreach { p =>
            got(i) = ((p >> 16) & 0xff).toByte
            got(i + 1) = ((p >> 8) & 0xff).toByte
            got(i + 2) = (p & 0xff).toByte
            i += 3
          }
          if (java.util.Arrays.equals(got, want)) {
            pass += 1
            println(s"OK   $name ${w}x$h $desc")
          } else {
            fail += 1
            var d = 0
            while (got(d) == want(d)) d += 1
            val px = d / 3
            println(s"DIFF $name ${w}x$h $desc: first at (${px % w},${px / w}) " +
              s"ch${d % 3} got ${got(d) & 0xff} want ${want(d) & 0xff}; " +
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
