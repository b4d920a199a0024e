package graft.operators

import graft.functions.{SchemaOfVariantAgg, VariantFunctions => vf}
import graft.variant.SchemaInfer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Shredding-lite: materialize variant fields as real typed columns so
  * parquet gets native column statistics and filter pushdown for them —
  * the Dremel-lineage pattern (PAPERS.md: "Dremel: A Decade of
  * Interactive SQL Analysis"). A variant column is opaque binary to the
  * scanner; a shredded copy turns `variant_get` probes into plain column
  * scans with `PushedFilters`. At 100 TB this is the difference between
  * reading every byte of every JSON blob and skipping row groups on
  * min/max stats.
  */
object Shred {

  /** Explicit shredding: add a typed column per (path, type, name).
    * All fields extract through ONE variant_get_multi evaluation —
    * metadata decode and frame walk are shared across the field set.
    */
  def shred(df: DataFrame, variantCol: String,
            fields: Seq[(String, DataType, String)]): DataFrame = {
    if (fields.isEmpty) return df
    val multi = Bridge.column(
      graft.functions.VariantGetMulti(Bridge.expression(col(variantCol)), fields))
    val shredded = df.withColumn("_shred", multi)
    fields.foldLeft(shredded) { case (d, (_, _, name)) =>
      d.withColumn(name, col(s"_shred.$name"))
    }.drop("_shred")
  }

  /** Infer the shreddable top-level fields by aggregating the variant
    * schema lattice over the data (one tiny driver-side value — the
    * merged schema — not a data collect).
    */
  def inferFields(df: DataFrame, variantCol: String): Seq[(String, DataType, String)] = {
    val serialized = df
      .agg(Bridge.column(
        SchemaOfVariantAgg(Bridge.expression(col(variantCol)), renderOutput = false)
          .toAggregateExpression()).as("s"))
      .collect()(0).getString(0)
    SchemaInfer.deserialize(serialized) match {
      case SchemaInfer.SObject(fieldMap) =>
        fieldMap.toSeq.flatMap { case (key, t) =>
          toSparkType(t).map(dt => (s"$$.${key}", dt, s"v_$key"))
        }
      case _ => Seq.empty
    }
  }

  private def toSparkType(t: SchemaInfer.SType): Option[DataType] = t match {
    case SchemaInfer.SBool => Some(BooleanType)
    case SchemaInfer.SLong => Some(LongType)
    case SchemaInfer.SDouble => Some(DoubleType)
    case SchemaInfer.SDecimal(s) => Some(DecimalType(38, s))
    case SchemaInfer.SString => Some(StringType)
    case SchemaInfer.SDate => Some(DateType)
    case SchemaInfer.STimestamp => Some(TimestampType)
    case _ => None // nested/variant-typed fields stay in the variant column
  }

  /** Auto-shred: infer top-level scalar fields and materialize them. */
  def autoShred(df: DataFrame, variantCol: String): DataFrame =
    shred(df, variantCol, inferFields(df, variantCol))
}
