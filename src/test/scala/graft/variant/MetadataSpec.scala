package graft.variant

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Mirrors the reference's metadata tests
  * (/root/reference/open-variant/src/metadata.rs:187-224) plus the
  * underflow case the reference misses (probe sorting before all keys).
  */
class MetadataSpec extends AnyFunSuite {

  private def build(keys: String*): (Array[Byte], MetadataView) = {
    val (bytes, _) = VariantMetadata.build(keys.asJava)
    (bytes, new MetadataView(bytes, 0))
  }

  test("empty dictionary") {
    val (_, m) = build()
    assert(m.version == 1)
    assert(m.sortedStrings)
    assert(m.dictionarySize == 0)
    assert(m.getKey(0) == null)
    assert(m.findKey("a") == -1)
  }

  test("basic build + sorted lookup (metadata.rs:203-223)") {
    val (_, m) = build("apple", "carrot", "brussel sprouts")
    assert(m.dictionarySize == 3)
    assert(m.findKey("apple") == 0)
    assert(m.findKey("brussel sprouts") == 1)
    assert(m.findKey("carrot") == 2)
    assert(m.getKey(0) == "apple")
    assert(m.getKey(1) == "brussel sprouts")
    assert(m.getKey(2) == "carrot")
    assert(m.findKey("daikon radish") == -1)
  }

  test("probe before all keys does not underflow (SURVEY §1.3)") {
    val (_, m) = build("m", "z")
    assert(m.findKey("a") == -1)
  }

  test("oversized buffer tolerated (metadata.rs:206-207)") {
    val (bytes, _) = build("apple", "carrot")
    val padded = bytes ++ Array.fill[Byte](20)(0x7f)
    val m = new MetadataView(padded, 0)
    assert(m.findKey("carrot") == 1)
    assert(m.getKey(0) == "apple")
  }

  test("dedup + insertion order independence") {
    val (b1, _) = build("b", "a", "b", "c")
    val (b2, _) = build("c", "a", "b")
    assert(java.util.Arrays.equals(b1, b2))
  }

  test("utf8 byte-order sort, not UTF-16 order") {
    // U+FF21 (ＦＵＬＬＷＩＤＴＨ A) vs U+10000 (𐀀, surrogate pair in UTF-16):
    // UTF-8 byte order puts U+FF21 (ef bc a1) before U+10000 (f0 90 80 80);
    // UTF-16 code-unit order would reverse them (surrogate D800 < FF21).
    val hi = new String(Character.toChars(0x10000))
    val (_, m) = build("Ａ", hi)
    assert(m.getKey(0) == "Ａ")
    assert(m.getKey(1) == hi)
    assert(m.findKey(hi) == 1)
  }

  test("offset width scales with data size") {
    // > 127 bytes of strings → 2-byte offsets
    val keys = (0 until 40).map(i => f"key_$i%04d")
    val (bytes, _) = VariantMetadata.build(keys.asJava)
    val m = new MetadataView(bytes, 0)
    assert(m.offsetSize == 2)
    keys.foreach(k => assert(m.getKey(m.findKey(k)) == k))
  }
}
