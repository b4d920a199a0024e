package graft.variant

import java.nio.charset.StandardCharsets.UTF_8

/** Variant metadata buffer: builder + zero-copy view.
  *
  * Layout (reference: /root/reference/open-variant/src/metadata.rs:37-80):
  * {{{
  *   <header:1B> <dict_size:w> <N+1 offsets:w each> <utf8 string data>
  * }}}
  * header = offset_size_minus_one << 6 | sorted_strings(1) << 4 | version(1).
  * Strings are deduplicated and sorted by UTF-8 byte order (the reference
  * uses Rust's `BTreeSet<&str>`, which compares UTF-8 bytes — NOT Java's
  * UTF-16 `String.compareTo`), enabling binary-search lookup.
  */
object VariantMetadata {

  /** Unsigned lexicographic comparison of UTF-8 byte arrays — the sort
    * order of the metadata dictionary (metadata.rs:32).
    */
  def compareUtf8(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val cmp = (a(i) & 0xff) - (b(i) & 0xff)
      if (cmp != 0) return cmp
      i += 1
    }
    a.length - b.length
  }

  /** Build a metadata buffer from a set of keys. Returns the buffer and a
    * key→id map for O(1) resolution during value writing (the reference
    * re-finds each key by binary search, metadata.rs:162-184; a hash map
    * is strictly faster for the write path).
    */
  def build(keys: java.util.Collection[String]): (Array[Byte], java.util.HashMap[String, Integer]) = {
    import scala.jdk.CollectionConverters._
    val distinct = new java.util.HashSet[String](keys).asScala.toArray
    val utf8 = distinct.map(_.getBytes(UTF_8))
    val order = utf8.indices.toArray
      .sortWith((x, y) => compareUtf8(utf8(x), utf8(y)) < 0)
    val sorted = order.map(utf8(_))
    val ids = new java.util.HashMap[String, Integer](distinct.length * 2)
    var i = 0
    while (i < order.length) {
      ids.put(distinct(order(i)), i)
      i += 1
    }
    (buildFromSorted(sorted), ids)
  }

  /** Build from already-sorted, deduplicated UTF-8 key bytes. */
  def buildFromSorted(sorted: Array[Array[Byte]]): Array[Byte] = {
    var totalBytes = 0L
    sorted.foreach(b => totalBytes += b.length)
    val n = sorted.length
    // Offset width must hold both the data size and the dict size.
    val w = ByteUtil.byteWidth(math.max(totalBytes, n))
    val buf = new ByteBuf(1 + w * (n + 2) + totalBytes.toInt)
    buf.addByte(((w - 1) << 6) | (1 << 4) | VariantConst.VERSION)
    buf.addIntLE(n, w)
    var off = 0L
    buf.addIntLE(0, w)
    sorted.foreach { b =>
      off += b.length
      buf.addIntLE(off, w)
    }
    sorted.foreach(buf.addBytes(_))
    buf.result()
  }

  val EMPTY: Array[Byte] = buildFromSorted(Array.empty)
}

/** Zero-copy view over a metadata buffer.
  * (reference: MetadataRef, metadata.rs:97-184). Tolerates trailing bytes
  * after the string data, like the reference (metadata.rs:95-96).
  */
final class MetadataView(val bytes: Array[Byte], val start: Int) {
  private val hdr: Int = bytes(start) & 0xff
  val offsetSize: Int = ((hdr >> 6) & 0x3) + 1
  val dictionarySize: Int =
    ByteUtil.readUnsignedLE(bytes, start + 1, offsetSize).toInt
  private val offsetsStart: Int = start + 1 + offsetSize
  private val dataStart: Int = offsetsStart + (dictionarySize + 1) * offsetSize

  def version: Int = hdr & 0x0f
  def sortedStrings: Boolean = ((hdr >> 4) & 1) == 1

  private def offsetAt(i: Int): Int =
    ByteUtil.readUnsignedLE(bytes, offsetsStart + i * offsetSize, offsetSize).toInt

  /** Dictionary id → key string; null if out of range. */
  def getKey(id: Int): String = {
    if (id < 0 || id >= dictionarySize) return null
    val a = offsetAt(id)
    val b = offsetAt(id + 1)
    new String(bytes, dataStart + a, b - a, UTF_8)
  }

  /** Compare key bytes `k` with dictionary entry `id` (UTF-8 order). */
  private def compareEntry(k: Array[Byte], id: Int): Int = {
    val a = dataStart + offsetAt(id)
    val b = dataStart + offsetAt(id + 1)
    val entryLen = b - a
    val n = math.min(k.length, entryLen)
    var i = 0
    while (i < n) {
      val cmp = (k(i) & 0xff) - (bytes(a + i) & 0xff)
      if (cmp != 0) return cmp
      i += 1
    }
    k.length - entryLen
  }

  /** Key → dictionary id; -1 if absent. Binary search (half-open form —
    * the reference's closed-interval version underflows when the probe
    * sorts before the whole dictionary, metadata.rs:172-183, fixed per
    * SURVEY §1.3) when the header's sorted_strings flag is set; LINEAR
    * scan otherwise — foreign writers (Spark's builtin parse_json among
    * them) emit first-seen-order dictionaries with sorted=false, and
    * binary-searching those returns wrong misses.
    */
  def findKey(keyUtf8: Array[Byte]): Int = {
    if (!sortedStrings) {
      var i = 0
      while (i < dictionarySize) {
        if (compareEntry(keyUtf8, i) == 0) return i
        i += 1
      }
      return -1
    }
    var lo = 0
    var hi = dictionarySize
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val cmp = compareEntry(keyUtf8, mid)
      if (cmp == 0) return mid
      else if (cmp < 0) hi = mid
      else lo = mid + 1
    }
    -1
  }

  def findKey(key: String): Int = findKey(key.getBytes(UTF_8))
}
