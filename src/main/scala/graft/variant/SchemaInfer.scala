package graft.variant

/** Schema inference over variant values: a small type lattice with a
  * least-upper-bound merge, powering `schema_of_variant` and the
  * `schema_of_variant_agg` aggregate (the reference defers this layer
  * with its unbuilt DataFusion crate, /root/reference/README.md:13-16 —
  * parity extension per SURVEY §7.5).
  *
  * Merge rules: equal types join to themselves; variant-null joins to
  * anything (nullability is implicit); integers widen to double when
  * mixed with floating point; decimals absorb integers; everything else
  * joins to the top type `variant`.
  */
object SchemaInfer {

  sealed trait SType { def render: String }
  case object SNull extends SType { def render = "void" }
  case object SBool extends SType { def render = "boolean" }
  case object SLong extends SType { def render = "bigint" }
  case object SDouble extends SType { def render = "double" }
  final case class SDecimal(scale: Int) extends SType { def render = s"decimal(38,$scale)" }
  case object SString extends SType { def render = "string" }
  case object SBinary extends SType { def render = "binary" }
  case object SDate extends SType { def render = "date" }
  case object STimestamp extends SType { def render = "timestamp" }
  case object STop extends SType { def render = "variant" }
  final case class SArray(elem: SType) extends SType {
    def render = s"array<${elem.render}>"
  }
  final case class SObject(fields: scala.collection.immutable.TreeMap[String, SType]) extends SType {
    def render =
      fields.map { case (k, v) => s"$k: ${v.render}" }.mkString("object<", ", ", ">")
  }

  def merge(a: SType, b: SType): SType = (a, b) match {
    case (x, y) if x == y => x
    case (SNull, x) => x
    case (x, SNull) => x
    case (SLong, SDouble) | (SDouble, SLong) => SDouble
    case (SLong, d: SDecimal) => d
    case (d: SDecimal, SLong) => d
    case (SDecimal(s1), SDecimal(s2)) => SDecimal(math.max(s1, s2))
    case (SDecimal(_), SDouble) | (SDouble, SDecimal(_)) => SDouble
    case (SArray(e1), SArray(e2)) => SArray(merge(e1, e2))
    case (SObject(f1), SObject(f2)) =>
      val keys: Set[String] = f1.keySet.unsorted ++ f2.keySet.unsorted
      SObject(scala.collection.immutable.TreeMap.from(keys.toSeq.map { k =>
        (f1.get(k), f2.get(k)) match {
          case (Some(x), Some(y)) => k -> merge(x, y)
          case (Some(x), None) => k -> x
          case (None, Some(y)) => k -> y
          case _ => throw new IllegalStateException("unreachable")
        }
      }))
    case _ => STop
  }

  /** Infer the schema of one variant value. */
  def infer(meta: MetadataView, v: VariantView): SType = {
    import VariantConst._
    v.basicType match {
      case BASIC_SHORT_STR => SString
      case BASIC_OBJECT =>
        val o = v.getObject
        var fields = scala.collection.immutable.TreeMap.empty[String, SType]
        var i = 0
        while (i < o.numElements) {
          fields += (meta.getKey(o.fieldIdAt(i)) -> infer(meta, o.valueAt(i)))
          i += 1
        }
        SObject(fields)
      case BASIC_ARRAY =>
        val arr = v.getArray
        var elem: SType = SNull
        var i = 0
        while (i < arr.numElements) {
          elem = merge(elem, infer(meta, arr.elementAt(i)))
          i += 1
        }
        SArray(elem)
      case _ =>
        v.typeInfo match {
          case P_NULL => SNull
          case P_TRUE | P_FALSE => SBool
          case P_INT8 | P_INT16 | P_INT32 | P_INT64 => SLong
          case P_DOUBLE | P_FLOAT => SDouble
          case P_DECIMAL4 | P_DECIMAL8 | P_DECIMAL16 => SDecimal(v.decimalScale)
          case P_LONG_STR | P_STRING_FROM_DICT => SString
          case P_BINARY | P_BINARY_FROM_DICT => SBinary
          case P_DATE => SDate
          case P_TIMESTAMP | P_TIMESTAMP_NTZ => STimestamp
          case t => throw new IllegalStateException(s"unknown type id $t")
        }
    }
  }

  // --- compact wire form for aggregation buffers -----------------------

  def serialize(t: SType): String = t match {
    case SArray(e) => s"A<${serialize(e)}>"
    case SObject(f) =>
      f.map { case (k, v) =>
        s"${k.length}:$k=${serialize(v)}"
      }.mkString("O<", ",", ">")
    case SNull => "0"
    case SBool => "b"
    case SLong => "l"
    case SDouble => "d"
    case SDecimal(s) => s"D$s"
    case SString => "s"
    case SBinary => "x"
    case SDate => "t"
    case STimestamp => "T"
    case STop => "V"
  }

  def deserialize(s: String): SType = {
    val (t, rest) = parse(s)
    require(rest.isEmpty, s"trailing schema bytes: $rest")
    t
  }

  private def parse(s: String): (SType, String) = {
    if (s.startsWith("A<")) {
      val (e, rest) = parse(s.drop(2))
      require(rest.startsWith(">"))
      (SArray(e), rest.drop(1))
    } else if (s.startsWith("O<")) {
      var rest = s.drop(2)
      var fields = scala.collection.immutable.TreeMap.empty[String, SType]
      while (!rest.startsWith(">")) {
        if (rest.startsWith(",")) rest = rest.drop(1)
        val colon = rest.indexOf(':')
        val klen = rest.substring(0, colon).toInt
        val key = rest.substring(colon + 1, colon + 1 + klen)
        require(rest.charAt(colon + 1 + klen) == '=')
        val (v, r2) = parse(rest.substring(colon + 2 + klen))
        fields += (key -> v)
        rest = r2
      }
      (SObject(fields), rest.drop(1))
    } else s.head match {
      case '0' => (SNull, s.tail)
      case 'b' => (SBool, s.tail)
      case 'l' => (SLong, s.tail)
      case 'd' => (SDouble, s.tail)
      case 'D' =>
        val digits = s.tail.takeWhile(_.isDigit)
        (SDecimal(digits.toInt), s.drop(1 + digits.length))
      case 's' => (SString, s.tail)
      case 'x' => (SBinary, s.tail)
      case 't' => (SDate, s.tail)
      case 'T' => (STimestamp, s.tail)
      case 'V' => (STop, s.tail)
      case c => throw new IllegalArgumentException(s"bad schema byte '$c' in: $s")
    }
  }
}
