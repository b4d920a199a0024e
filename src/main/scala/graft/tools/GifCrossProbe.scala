package graft.tools

import java.nio.file.{Files, Paths}
import graft.operators.Gif

/** Dev probe: compare graft's GIF decode against giflib's decode of
  * real giflib encodes (tools/gif_crosscheck.py): first frame RGBA +
  * frame count.
  *
  * Usage: runMain graft.tools.GifCrossProbe /tmp/gifx
  */
object GifCrossProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/gifx")
    var pass = 0
    var fail = 0
    Files.readAllLines(Paths.get(dir, "manifest.txt")).forEach { line =>
      if (line.trim.nonEmpty) {
        val Array(name, wS, hS, fS, desc) = line.trim.split("\\s+")
        val w = wS.toInt; val h = hS.toInt; val nf = fS.toInt
        val gif = Files.readAllBytes(Paths.get(dir, name + ".gif"))
        val want = Files.readAllBytes(Paths.get(dir, name + ".rgba"))
        try {
          val img = Gif.decodeGif(gif)
          require(img.width == w && img.height == h, "dims")
          require(img.frames == nf, s"frames ${img.frames} want $nf")
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
              s"got ${got(d) & 0xff} want ${want(d) & 0xff}")
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
