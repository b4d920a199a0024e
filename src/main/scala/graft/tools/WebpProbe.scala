package graft.tools

/** Dev probe for the VP8L codec: lossless roundtrip on arbitrary RGB,
  * container structure, malformed rejection.
  * Run: `sbt "runMain graft.tools.WebpProbe"`.
  */
object WebpProbe {
  def main(args: Array[String]): Unit = {
    import graft.operators.Webp
    var worst = 0
    var total = 0L
    (0 until 40).foreach { id =>
      val w = 1 + id % 37
      val h = 1 + (id * 7) % 23
      def px(x: Int, y: Int): Int =
        (((x * 7 + y * 13 + id) % 256) << 16) |
          (((x * 11 + y * 5 + 2 * id) % 256) << 8) | ((x * 3 + y * 17 + 3 * id) % 256)
      val enc = Webp.encodeWebpLossless(w, h, px)
      total += enc.length
      val img = Webp.decodeWebpLossless(enc)
      assert(img.width == w && img.height == h, s"dims ${img.width}x${img.height} want ${w}x$h")
      for (y <- 0 until h; x <- 0 until w)
        worst = math.max(worst, if (img.pixels(y * w + x) == px(x, y)) 0 else 1)
    }
    println(s"lossless roundtrip mismatches: $worst (want 0); total bytes $total")
    val enc = Webp.encodeWebpLossless(16, 16, (x, y) => (x ^ y) * 0x010101)
    println(s"16x16 xor: ${enc.length} bytes")
    def expectThrow(label: String)(f: => Any): Unit =
      try { f; println(s"$label: NO THROW (bad)") }
      catch { case _: IllegalArgumentException => println(s"$label: thrown (good)") }
    expectThrow("not webp")(Webp.decodeWebpLossless("plainly not a webp".getBytes))
    expectThrow("truncated")(Webp.decodeWebpLossless(java.util.Arrays.copyOf(enc, enc.length / 2)))
  }
}
