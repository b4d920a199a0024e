package graft.tools

/** Dev probe for the baseline JPEG codec: bit-exactness on
  * block-constant gray images, bounded error on arbitrary RGB noise,
  * edge-replication padding on non-multiple-of-8 dims.
  * Run: `sbt "runMain graft.tools.JpegProbe"`.
  */
object JpegProbe {
  def main(args: Array[String]): Unit = {
    import graft.operators.Jpeg
    // 1. block-constant gray → bit-exact
    var worstExact = 0
    (0 until 50).foreach { id =>
      val w = 8 * (1 + id % 4)
      val h = 8 * (1 + id % 3)
      def gv(bx: Int, by: Int) = ((bx * 37 + by * 59 + id) % 256)
      def px(x: Int, y: Int) = { val g = gv(x / 8, y / 8); (g << 16) | (g << 8) | g }
      val img = Jpeg.decodeJpeg(Jpeg.encodeJpegRgb(w, h, px))
      assert(img.width == w && img.height == h)
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w) {
        val want = px(x, y); val got = img.pixels(y * w + x)
        for (sh <- Seq(0, 8, 16))
          maxErr = math.max(maxErr, math.abs(((want >> sh) & 0xff) - ((got >> sh) & 0xff)))
      }
      worstExact = math.max(worstExact, maxErr)
    }
    println(s"block-constant gray max |err| = $worstExact (want 0)")

    // 2. arbitrary RGB noise, non-multiple-of-8 dims → bounded error
    var worstNoise = 0
    (0 until 20).foreach { id =>
      val w = 13 + id % 7
      val h = 10 + id % 5
      def px(x: Int, y: Int) =
        (((x * 7 + y * 13 + id) % 256) << 16) |
          (((x * 11 + y * 5 + 2 * id) % 256) << 8) | ((x * 3 + y * 17 + 3 * id) % 256)
      val img = Jpeg.decodeJpeg(Jpeg.encodeJpegRgb(w, h, px))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val want = px(x, y); val got = img.pixels(y * w + x)
        for (sh <- Seq(0, 8, 16))
          worstNoise = math.max(worstNoise, math.abs(((want >> sh) & 0xff) - ((got >> sh) & 0xff)))
      }
    }
    println(s"rgb noise max |err| = $worstNoise (want <= 12)")

    // 3. size sanity
    val bytes = Jpeg.encodeJpegRgb(64, 64, (x, y) => ((x ^ y) & 0xff) * 0x010101)
    println(s"64x64 xor image: ${bytes.length} bytes")
  }
}
