package graft.variant

/** Variant binary format constants.
  *
  * Basic types (low 2 bits of the value header byte) and primitive type
  * ids (upper 6 bits) as specified by the Open Variant format; same id
  * space as /root/reference/open-variant/src/values/mod.rs:11-60. We
  * implement the FULL id space (the reference leaves ShortString, the
  * narrow ints, Float32, Date/Timestamp, Binary with no writer/reader —
  * declared-only, see values/mod.rs:36-60).
  */
object VariantConst {
  // Basic types (2 bits)
  final val BASIC_PRIMITIVE = 0
  final val BASIC_SHORT_STR = 1
  final val BASIC_OBJECT = 2
  final val BASIC_ARRAY = 3

  // Primitive type ids (6 bits)
  final val P_NULL = 0
  final val P_TRUE = 1
  final val P_FALSE = 2
  final val P_INT8 = 3
  final val P_INT16 = 4
  final val P_INT32 = 5
  final val P_INT64 = 6
  final val P_DOUBLE = 7
  final val P_DECIMAL4 = 8
  final val P_DECIMAL8 = 9
  final val P_DECIMAL16 = 10
  final val P_DATE = 11
  final val P_TIMESTAMP = 12 // micros, with timezone
  final val P_TIMESTAMP_NTZ = 13 // micros, no timezone
  final val P_FLOAT = 14
  final val P_BINARY = 15
  final val P_LONG_STR = 16
  final val P_BINARY_FROM_DICT = 17
  final val P_STRING_FROM_DICT = 18

  /** Compose the value header byte: `type_info << 2 | basic_type`
    * (reference: values/write.rs:5-12).
    */
  @inline def header(typeInfo: Int, basicType: Int): Int =
    (typeInfo << 2) | basicType

  @inline def primitiveHeader(typeId: Int): Int = header(typeId, BASIC_PRIMITIVE)

  /** Max string length encodable as a short string (6-bit length). */
  final val MAX_SHORT_STR = 63

  /** Metadata header: version (low 4 bits) — always 1. */
  final val VERSION = 1
}
