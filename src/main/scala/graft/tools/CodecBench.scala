package graft.tools

import graft.variant.VariantJsonCodec

/** Pure-JVM micro-benchmark of the JSON→variant kernel, no Spark: how
  * much of the pipeline's parse cost is the codec itself vs executor
  * plumbing. Run: sbt "runMain graft.tools.CodecBench"
  *
  * Findings driving the round-3 work: tokenization alone is ~4M rows/s
  * on these docs (isolated JIT profile), the pre-speculation encoder was
  * 0.30M — 12× spent in per-row dictionary builds and re-encodes, now
  * amortized by the speculative path (0.6-0.8M, ahead of Spark's builtin
  * parseJson at ~0.5M). With tokenize+accessor floor measured at ~1M
  * rows/s under a realistic mixed JIT profile, the remaining encoder
  * overhead is ~35% — the kernel is Jackson-bound, so further pooling
  * micro-optimization was measured and declined.
  */
object CodecBench {
  def main(args: Array[String]): Unit = {
    // shape matches the events.props corpus: small objects, one int key
    val rnd = new java.util.Random(42)
    val docs: Array[Array[Byte]] = Array.tabulate(100000) { i =>
      val k = rnd.nextInt(200)
      s"""{"k": $k, "s": "ev$i", "f": ${k / 7.0}}""".getBytes("UTF-8")
    }
    val bytes = docs.map(_.length.toLong).sum
    var blackhole = 0L
    def bench(label: String)(f: Array[Byte] => Long): Unit =
      (1 to 4).foreach { round =>
        val t0 = System.nanoTime()
        var i = 0
        while (i < docs.length) { blackhole += f(docs(i)); i += 1 }
        val s = (System.nanoTime() - t0) / 1e9
        if (round >= 3)
          println(f"[codec] $label%-28s ${docs.length / s / 1e6}%.2f M rows/s, ${bytes / s / 1e6}%.1f MB/s")
      }

    bench("ours fromJsonBytes") { d =>
      VariantJsonCodec.fromJsonBytes(d, 0, d.length)._2.length.toLong
    }
    val factory = new com.fasterxml.jackson.core.JsonFactory()
    bench("jackson tokenize only") { d =>
      val p = factory.createParser(d, 0, d.length)
      var n = 0L
      while (p.nextToken() != null) n += 1
      p.close()
      n
    }
    bench("tokenize + value accessors") { d =>
      import com.fasterxml.jackson.core.JsonToken._
      val p = factory.createParser(d, 0, d.length)
      var n = 0L
      var t = p.nextToken()
      while (t != null) {
        t match {
          case VALUE_NUMBER_INT => n += p.getLongValue
          case VALUE_NUMBER_FLOAT => n += p.getDoubleValue.toLong
          case VALUE_STRING => n += p.getText.length
          case FIELD_NAME => n += p.currentName().length
          case _ => ()
        }
        t = p.nextToken()
      }
      p.close()
      n
    }
    bench("spark builtin parseJson") { d =>
      org.apache.spark.types.variant.VariantBuilder
        .parseJson(new String(d, "UTF-8"), false).getValue.length.toLong
    }
    println(s"[codec] blackhole $blackhole")
  }
}
