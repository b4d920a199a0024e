package graft.tools

import java.nio.file.{Files, Paths}

/** Dev probe: per-case outcome of the alpha cross-check corpus
  * (tools/vp8_alpha_check.py) — DECODED EXACT / DECODED MISMATCH /
  * scope ERR — so the coverage of each ALPH shape (raw, subset-VP8L,
  * filtered, transform-compressed) is visible at a glance.
  *
  * Usage: runMain graft.tools.Vp8AlphaProbe /tmp/vp8alpha
  */
object Vp8AlphaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/vp8alpha")
    Files.readAllLines(Paths.get(dir, "manifest.txt")).forEach { line =>
      if (line.trim.nonEmpty) {
        val Array(name, _, _, comp) = line.trim.split("\\s+")
        val bytes = Files.readAllBytes(Paths.get(dir, name + ".webp"))
        val want = Files.readAllBytes(Paths.get(dir, name + ".alpha"))
        try {
          val img = graft.operators.Webp.decodeWebp(bytes)
          val got = img.pixels.map(p => ((p >>> 24) & 0xff).toByte)
          val ok = java.util.Arrays.equals(got, want)
          println(s"$name comp=$comp -> DECODED ${if (ok) "EXACT" else "MISMATCH"}")
        } catch {
          case e: Exception => println(s"$name comp=$comp -> ERR ${e.getMessage}")
        }
      }
    }
  }
}
