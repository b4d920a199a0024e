package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.VariantType

/** Resolution-time dispatch (round 9): one `variant_get` name over BOTH
  * variant representations. Our SQL registration shadows Spark's
  * builtin session-wide (even `functions.variant_get` resolves by
  * name), so without this rule a native `VariantType` column — e.g.
  * read back from a parquet file Spark 4.1 wrote SHREDDED, which is
  * its default — could no longer be extracted by name. The dispatch:
  *
  *  - concrete target type → Spark's builtin
  *    [[org.apache.spark.sql.catalyst.expressions.variant.VariantGet]],
  *    which keeps Spark's `PushVariantIntoScan` applicable: the scan
  *    is rewritten to read ONLY the requested typed_value subcolumn of
  *    a shredded file (`v_shredded_interop` + PlanSpec pin the plan).
  *  - our-variant target (the no-type default) → our VariantGet over
  *    `from_spark_variant(child)`, staying in our codec.
  *
  * Runs at resolution so Spark's optimizer sees its own expression
  * before scan planning.
  */
object NativeVariantDispatch extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveExpressions {
    case VariantGet(child, path, t, fail) if child.resolved &&
        child.dataType.isInstanceOf[VariantType] =>
      if (VariantSchema.isVariantStruct(t))
        VariantGet(FromSparkVariant(child), path, t, fail)
      else
        new org.apache.spark.sql.catalyst.expressions.variant.VariantGet(
          child, Literal(path), t, fail, None)
  }
}
