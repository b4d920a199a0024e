package graft.variant

/** Little-endian integer + byte-width utilities for the variant codec.
  *
  * Mirrors the semantics of the reference's width selection and LE
  * encoding (/root/reference/open-variant/src/utils.rs:2-23,
  * open-variant/src/metadata.rs:127-137) but re-implemented for the JVM.
  * Widths are chosen against the *signed* per-width maxima, matching the
  * reference's thresholds (utils.rs:4-11).
  */
object ByteUtil {

  /** Minimum byte width (1/2/4/8) able to hold `maxValue` (non-negative). */
  def byteWidth(maxValue: Long): Int =
    if (maxValue <= Byte.MaxValue) 1
    else if (maxValue <= Short.MaxValue) 2
    else if (maxValue <= Int.MaxValue) 4
    else 8

  /** Read an unsigned little-endian integer of `width` bytes at `off`.
    * Widths written by this codec never exceed signed range, so the
    * unsigned read is exact for all values we produce.
    */
  def readUnsignedLE(bytes: Array[Byte], off: Int, width: Int): Long = {
    var v = 0L
    var i = 0
    while (i < width) {
      v |= (bytes(off + i) & 0xffL) << (8 * i)
      i += 1
    }
    v
  }

  /** Read a signed little-endian integer of `width` bytes at `off`. */
  def readSignedLE(bytes: Array[Byte], off: Int, width: Int): Long = {
    val v = readUnsignedLE(bytes, off, width)
    val shift = 64 - 8 * width
    (v << shift) >> shift
  }
}

/** Growable byte buffer used by all variant writers. Append-only with
  * explicit little-endian helpers; avoids java.io overhead in the
  * per-row hot path of `variant_from_json`.
  */
final class ByteBuf(initialCapacity: Int = 64) {
  private var buf: Array[Byte] = new Array[Byte](math.max(initialCapacity, 16))
  private var _len: Int = 0

  def length: Int = _len

  private def ensure(extra: Int): Unit = {
    val need = _len + extra
    if (need > buf.length) {
      var cap = buf.length * 2
      while (cap < need) cap *= 2
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  }

  def addByte(b: Int): Unit = {
    ensure(1)
    buf(_len) = b.toByte
    _len += 1
  }

  def addBytes(src: Array[Byte]): Unit = addBytes(src, 0, src.length)

  def addBytes(src: Array[Byte], off: Int, n: Int): Unit = {
    ensure(n)
    System.arraycopy(src, off, buf, _len, n)
    _len += n
  }

  def addBuf(other: ByteBuf): Unit = addBytes(other.rawBytes, 0, other.length)

  /** Append a little-endian integer of `width` bytes. */
  def addIntLE(value: Long, width: Int): Unit = {
    ensure(width)
    var i = 0
    while (i < width) {
      buf(_len + i) = ((value >> (8 * i)) & 0xff).toByte
      i += 1
    }
    _len += width
  }

  /** Internal array (may be longer than `length`). */
  def rawBytes: Array[Byte] = buf

  def result(): Array[Byte] = java.util.Arrays.copyOf(buf, _len)

  def reset(): Unit = { _len = 0 }
}
