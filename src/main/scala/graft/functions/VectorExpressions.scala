package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop vector/set kernels for the similarity and dedup operators.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`)
  * evaluate a lambda expression tree per element — fine for one column,
  * ruinous inside an O(candidate-pairs) join. These expressions do the
  * same math in a primitive loop. Accumulation is left-to-right in
  * double precision, bit-identical to the higher-order formulation they
  * replace (and to the DuckDB list-reduction oracle).
  */
case class CosineSimFloat(left: Expression, right: Expression)
    extends BinaryExpression with GraftBinaryCodegen {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // zero-norm vectors yield NULL
  override def prettyName: String = "vec_cosine"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_cosine expects two array<float> or two array<double>, got: $other")
  }

  @transient private lazy val isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    } else {
      while (i < n) {
        val x = a.getDouble(i)
        val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `hyperplane_bucket(vec, bits)`: random-hyperplane LSH bucket id of a
  * float/double vector — bit j is the sign of ⟨vec, h_j⟩ where h_j is a
  * deterministic Rademacher (±1) vector derived from Hash64. Vectors
  * with small angle agree on most bits, so equal bucket ids (or ids
  * within small Hamming distance, see multiprobe in Similarity.lshTopK)
  * are the candidate filter for approximate nearest-neighbor search at
  * scale: the corpus shuffles once on bucket id instead of crossing
  * with every probe.
  */
case class HyperplaneBucket(child: Expression, bits: Int)
    extends UnaryExpression with GraftUnaryCodegen {
  require(bits > 0 && bits <= 30, s"bits out of range: $bits")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket expects array<float|double>, got: ${other.simpleString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bucket = 0
    var j = 0
    while (j < bits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        // Rademacher entry: deterministic ±1 from (plane j, dim i)
        val sign = if ((Hash64.mix(j.toLong * 1000003L + i) & 1L) == 0L) 1.0 else -1.0
        dot += x * sign
        i += 1
      }
      if (dot >= 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaccard similarity of two SORTED, DISTINCT string arrays via a single
  * merge pass — |A ∩ B| / |A ∪ B| with no per-pair hash sets. Callers
  * sort upstream once per document (`array_sort(array_distinct(...))`),
  * not once per pair.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with GraftBinaryCodegen {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // two empty sets yield NULL
  override def prettyName: String = "jaccard_sorted"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jaccard_sorted expects two array<string>, got: $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) null else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
