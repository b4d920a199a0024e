package graft.tools

import java.nio.file.{Files, Paths}
import graft.operators.Vp8

/** Dev probe for the REVERSE cross-check direction: write coefficient-
  * domain VP8 fixtures with graft's encoder plus graft's own decode of
  * them; tools/vp8_fixture_check.py then decodes the same .webp files
  * through libwebp and diffs the planes — proving the fixture encoder
  * emits genuine VP8, not merely something this repo's decoder accepts.
  *
  * Usage: runMain graft.tools.Vp8FixtureProbe /tmp/vp8fix
  */
object Vp8FixtureProbe {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(args.headOption.getOrElse("/tmp/vp8fix"))
    Files.createDirectories(dir)
    val lines = new StringBuilder
    var i = 0L
    while (i < 40) {
      val id = i
      // the mm_webp_lossy coefficient script (single MB per doc) plus
      // a handful of multi-MB cases to exercise cross-MB contexts
      val (w, h) = if (id % 5 == 4) (48, 32) else (16, 16)
      val bytes = Vp8.encodeVp8Fixture(w, h,
        qi = (id % 128).toInt,
        yDcDelta = (id % 7).toInt - 3,
        y2DcDelta = ((id / 2) % 7).toInt - 3,
        y2AcDelta = ((id / 3) % 5).toInt - 2,
        uvDcDelta = ((id / 4) % 7).toInt - 3,
        uvAcDelta = ((id / 5) % 5).toInt - 2,
        levels = (mbx, mby) => {
          val blk = Array.fill(25)(new Array[Int](16))
          blk(24)(0) = ((id + 7 * mbx + 11 * mby) % 21).toInt - 10
          blk(24)(1) = (((id / 3) + mbx + mby) % 9).toInt - 4
          var sb = 0
          while (sb < 16) {
            blk(sb)(1) = ((id + 5 * sb + mbx) % 9).toInt - 4
            blk(sb)(2) = ((id + 3 * sb + mby) % 5).toInt - 2
            sb += 1
          }
          var cb = 0
          while (cb < 4) {
            blk(16 + cb)(0) = ((id + cb + mbx) % 17).toInt - 8
            blk(16 + cb)(1) = (((id / 2) + cb) % 5).toInt - 2
            blk(20 + cb)(0) = ((2 * id + cb + mby) % 17).toInt - 8
            blk(20 + cb)(1) = (((id / 4) + cb) % 5).toInt - 2
            cb += 1
          }
          blk
        })
      val img = Vp8.decodeWebpLossy(bytes)
      val cw = img.cw; val ch = img.ch
      val yuv = new Array[Byte](w * h + 2 * cw * ch)
      var o = 0
      img.y.foreach { p => yuv(o) = p.toByte; o += 1 }
      img.u.foreach { p => yuv(o) = p.toByte; o += 1 }
      img.v.foreach { p => yuv(o) = p.toByte; o += 1 }
      Files.write(dir.resolve(s"fixture_$id.webp"), bytes)
      Files.write(dir.resolve(s"fixture_$id.yuv"), yuv)
      lines.append(s"fixture_$id $w $h\n")
      i += 1
    }
    Files.write(dir.resolve("manifest.txt"),
      lines.toString.getBytes("US-ASCII"))
    println(s"wrote 40 fixtures to $dir")
  }
}
