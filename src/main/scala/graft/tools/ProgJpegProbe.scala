package graft.tools

import graft.operators.Jpeg

/** Dev probe: progressive decode must equal baseline decode of the
  * same coefficient fixtures, pixel for pixel, across random sizes and
  * coefficient patterns. Run: sbt "runMain graft.tools.ProgJpegProbe"
  */
object ProgJpegProbe {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    var fails = 0
    // grayscale: random dims (8-multiples), random sparse coefficients
    for (trial <- 0 until 60) {
      val bw = 1 + rnd.nextInt(5)
      val bh = 1 + rnd.nextInt(4)
      val blocks = Array.fill(bw * bh) {
        val f = new Array[Int](64)
        f(0) = rnd.nextInt(401) - 200
        for (_ <- 0 until rnd.nextInt(12)) f(rnd.nextInt(63) + 1) = rnd.nextInt(19) - 9
        f
      }
      def coef(bx: Int, by: Int) = blocks(by * bw + bx)
      val base = Jpeg.decodeJpeg(Jpeg.encodeJpegGrayCoeffs(bw * 8, bh * 8, coef))
      val prog = Jpeg.decodeJpeg(Jpeg.encodeJpegGrayProgCoeffs(bw * 8, bh * 8, coef))
      if (!java.util.Arrays.equals(base.pixels, prog.pixels)) {
        fails += 1
        println(s"GRAY MISMATCH trial=$trial ${bw}x$bh: " +
          base.pixels.zip(prog.pixels).zipWithIndex.filter(p => p._1._1 != p._1._2)
            .take(5).map { case ((a, b), i) => s"px$i $a!=$b" }.mkString(", "))
      }
    }
    // 4:2:0 color
    for (trial <- 0 until 40) {
      val mw = 1 + rnd.nextInt(3)
      val mh = 1 + rnd.nextInt(3)
      def mk(n: Int): Array[Array[Int]] = Array.fill(n) {
        val f = new Array[Int](64)
        f(0) = rnd.nextInt(401) - 200
        for (_ <- 0 until rnd.nextInt(10)) f(rnd.nextInt(63) + 1) = rnd.nextInt(19) - 9
        f
      }
      val yB = mk(mw * 2 * mh * 2); val cbB = mk(mw * mh); val crB = mk(mw * mh)
      def cy(bx: Int, by: Int) = yB(by * mw * 2 + bx)
      def ccb(mx: Int, my: Int) = cbB(my * mw + mx)
      def ccr(mx: Int, my: Int) = crB(my * mw + mx)
      val base = Jpeg.decodeJpeg(Jpeg.encodeJpeg420Coeffs(mw * 16, mh * 16, cy, ccb, ccr))
      val prog = Jpeg.decodeJpeg(Jpeg.encodeJpeg420ProgCoeffs(mw * 16, mh * 16, cy, ccb, ccr))
      if (!java.util.Arrays.equals(base.pixels, prog.pixels)) {
        fails += 1
        println(s"COLOR MISMATCH trial=$trial ${mw}x$mh MCUs: " +
          base.pixels.zip(prog.pixels).zipWithIndex.filter(p => p._1._1 != p._1._2)
            .take(5).map { case ((a, b), i) => s"px$i ${a.toHexString}!=${b.toHexString}" }.mkString(", "))
      }
    }
    println(if (fails == 0) "ProgJpegProbe: ALL EQUAL (100 trials)" else s"FAILS: $fails")
  }
}
