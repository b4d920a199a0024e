package graft.functions

import graft.variant.{PathStep, VariantJsonCodec, VariantPath}
import com.fasterxml.jackson.core.{JsonParser, JsonToken}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused `variant_get(variant_from_json(s), path, primitiveType)`:
  * a single streaming pass that navigates the JSON tokens directly to
  * the path and casts the scalar — no metadata dictionary, no variant
  * buffer, no intermediate struct. Installed by [[VariantGetFusionRule]]
  * (the optimization sketched in SURVEY §4.2.2); the unfused pipeline is
  * the semantic reference and the fusion is only applied for scalar
  * target types whose cast rules it reproduces exactly.
  */
case class JsonPathExtract(
    child: Expression,
    path: String,
    targetType: DataType,
    parseFailOnError: Boolean,
    castFailOnError: Boolean)
    extends UnaryExpression with GraftUnaryCodegen {

  @transient private lazy val steps: Array[PathStep] = VariantPath.parse(path)

  override def dataType: DataType = targetType
  override def nullable: Boolean = true
  override def prettyName: String = "json_path_extract"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"json_path_extract expects string/binary, got: ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes: Array[Byte] = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    try {
      val p = JsonPathExtract.factory.createParser(bytes, 0, bytes.length)
      try {
        var tok = p.nextToken()
        if (tok == null)
          throw new VariantJsonCodec.JsonParseException("Failed to parse JSON: empty input", null)
        // walk the path on the token stream
        var si = 0
        var found = true
        while (found && si < steps.length) {
          steps(si) match {
            case k: PathStep.Key =>
              if (tok != JsonToken.START_OBJECT) found = false
              else {
                var hit = false
                var t = p.nextToken()
                while (!hit && t == JsonToken.FIELD_NAME) {
                  val name = p.currentName()
                  t = p.nextToken() // value token
                  if (name == k.name) hit = true
                  else { p.skipChildren(); t = p.nextToken() }
                }
                if (hit) tok = p.currentToken()
                else found = false
              }
            case PathStep.Index(idx) =>
              if (tok != JsonToken.START_ARRAY || idx < 0) found = false
              else {
                var i = 0
                var t = p.nextToken()
                while (i < idx && t != JsonToken.END_ARRAY) {
                  p.skipChildren(); t = p.nextToken(); i += 1
                }
                if (t == JsonToken.END_ARRAY) found = false
                else tok = t
              }
          }
          si += 1
        }
        if (!found) null else castToken(p, tok)
      } finally p.close()
    } catch {
      case e: VariantJsonCodec.JsonParseException =>
        if (parseFailOnError) throw e else null
      case e: com.fasterxml.jackson.core.JacksonException =>
        if (parseFailOnError)
          throw new VariantJsonCodec.JsonParseException(s"Failed to parse JSON: ${e.getMessage}", e)
        else null
    }
  }

  /** Cast rules mirror VariantExtract.cast for the scalar targets the
    * fusion rule admits.
    */
  private def castToken(p: JsonParser, tok: JsonToken): Any = {
    try {
      tok match {
        case JsonToken.VALUE_NULL => null
        case JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE =>
          val b = tok == JsonToken.VALUE_TRUE
          targetType match {
            case BooleanType => b
            case LongType => if (b) 1L else 0L
            case IntegerType => if (b) 1 else 0
            case _ => mismatch("boolean")
          }
        case JsonToken.VALUE_NUMBER_INT =>
          val isBig = p.getNumberType == JsonParser.NumberType.BIG_INTEGER
          targetType match {
            case LongType =>
              if (isBig) new java.math.BigDecimal(p.getBigIntegerValue).longValueExact() else p.getLongValue
            case IntegerType =>
              Math.toIntExact(if (isBig) new java.math.BigDecimal(p.getBigIntegerValue).longValueExact() else p.getLongValue)
            case DoubleType =>
              if (isBig) new java.math.BigDecimal(p.getBigIntegerValue).doubleValue() else p.getLongValue.toDouble
            case d: DecimalType =>
              val bd = if (isBig) new java.math.BigDecimal(p.getBigIntegerValue)
                else java.math.BigDecimal.valueOf(p.getLongValue)
              toDecimal(bd, d)
            case _ => mismatch("bigint")
          }
        case JsonToken.VALUE_NUMBER_FLOAT =>
          targetType match {
            case DoubleType => p.getDoubleValue
            case d: DecimalType => toDecimal(java.math.BigDecimal.valueOf(p.getDoubleValue), d)
            case _ => mismatch("double")
          }
        case JsonToken.VALUE_STRING =>
          val s = p.getText
          targetType match {
            case LongType => s.trim.toLong
            case IntegerType => Math.toIntExact(s.trim.toLong)
            case DoubleType => s.trim.toDouble
            case BooleanType => s.trim.toBoolean
            case d: DecimalType => toDecimal(new java.math.BigDecimal(s.trim), d)
            case _ => mismatch("string")
          }
        case JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
          mismatch(if (tok == JsonToken.START_OBJECT) "object" else "array")
        case other => mismatch(other.toString)
      }
    } catch {
      case e: VariantJsonCodec.JsonParseException => throw e
      case e: Exception if !castFailOnError => null
    }
  }

  private def toDecimal(bd: java.math.BigDecimal, d: DecimalType): Any = {
    val dec = org.apache.spark.sql.types.Decimal(bd)
    if (dec.changePrecision(d.precision, d.scale)) dec else mismatch("decimal")
  }

  private def mismatch(from: String): Any =
    throw new IllegalArgumentException(
      s"Cannot cast variant $from to ${targetType.simpleString}")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonPathExtract {
  private[functions] val factory = new com.fasterxml.jackson.core.JsonFactory()

  /** Targets whose cast semantics the fused path replicates exactly.
    * String/variant/binary targets keep the unfused pipeline (they need
    * canonical sub-tree printing).
    */
  def fusableTarget(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | BooleanType | _: DecimalType => true
    case _ => false
  }
}

/** Optimizer rule: collapse `VariantGet(VariantFromJson(s), path, t)`
  * into the single-pass [[JsonPathExtract]] when `t` is a scalar target.
  * Runs in the operator-optimization batch via
  * `injectOptimizerRule(GraftExtensions)`; the rewrite is a pure
  * expression-local transformation, so it composes with pushdown — a
  * pushed-down filter containing the fused form stays fused.
  */
object VariantGetFusionRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case VariantGet(VariantFromJson(src, parseFail), path, t, castFail)
        if JsonPathExtract.fusableTarget(t) =>
      JsonPathExtract(src, path, t, parseFail, castFail)
  }
}
