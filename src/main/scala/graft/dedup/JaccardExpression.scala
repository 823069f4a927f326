package graft.dedup

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Allocation-free kernel shared by interpreted eval and generated code.
  * Reads the two sorted int arrays straight out of Tungsten `ArrayData`
  * (no boxing, no scala collection conversion — the two costs a ScalaUDF
  * pays on every row). */
object JaccardKernel {
  def sim(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val inter = count(a, b)
    if (inter == 0) 0.0
    else Jaccard.round6(inter.toDouble / (na + nb - inter).toDouble)
  }

  /** Two-pointer sorted intersection count on Tungsten arrays. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getInt(i); val y = b.getInt(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }
}

/** Codegen'd exact set-Jaccard over two sorted int arrays — the custom
  * Catalyst `Expression` upgrade over the v0 ScalaUDF (SURVEY.md §2.6, §7.3).
  * Stays inside whole-stage codegen: the generated code calls the static
  * kernel directly on Tungsten arrays.
  *
  * Semantics identical to [[Jaccard.jaccard6]] (reference inner loop,
  * code/Stage05ComputeSimilarity.py:113-132, CPython HALF_EVEN 6-dp) —
  * asserted equal property-style in the test suite.
  */
case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType match {
        case ArrayType(IntegerType, _) => true
        case _                         => false
      }
    )
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sorted expects two array<int> args, got (${left.dataType}, ${right.dataType})"
    )
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.sim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.dedup.JaccardKernel.sim($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "jaccard_sorted"
}

object JaccardSorted {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(JaccardSorted(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Codegen'd sorted-int-array intersection COUNT — the raw |A n B| the
  * oracle-facing queries emit next to union_cnt and the unrounded quotient
  * ([[Jaccard.verifyCounts]]), and the verification kernel of the
  * prefix-filtered exact pair join (SparkEntry.docPairsBy). Replaces the
  * round-2 boxed interUdf on the q23/q24/q25 hot path. */
case class IntersectCountSorted(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType match {
        case ArrayType(IntegerType, _) => true
        case _                         => false
      }
    )
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"intersect_count_sorted expects two array<int> args, got (${left.dataType}, ${right.dataType})"
    )
  }
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.dedup.JaccardKernel.count($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "intersect_count_sorted"
}

object IntersectCountSorted {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(IntersectCountSorted(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Cosine over two equal-length float arrays, accumulated in INDEX ORDER
  * exactly like the Column-level `Similarity.cosine` (zip_with + left-fold
  * aggregate) and the oracles' `cosineSql` — same doubles bit-for-bit, but
  * evaluated as one tight JVM loop on Tungsten arrays inside whole-stage
  * codegen. Returns NaN for a zero-norm side (callers filter). */
object CosineKernel {
  def cos(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // UnsafeArrayData.getFloat does no bounds checking — a shorter right
    // side would read garbage Tungsten memory instead of failing (ADVICE)
    if (b.numElements() != n) return Double.NaN
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // A null element makes the zip_with/aggregate twin's whole sum null;
      // getFloat would instead NPE (GenericArrayData) or read the zeroed
      // slot (UnsafeArrayData). NaN keeps the "callers filter" contract —
      // every call site drops null and NaN alike.
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

case class CosineFloat(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType match {
        case ArrayType(FloatType, _) => true
        case _                       => false
      }
    )
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_float expects two array<float> args, got (${left.dataType}, ${right.dataType})"
    )
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.dedup.CosineKernel.cos($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "cosine_float"
}

object CosineFloat {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(CosineFloat(GraftBridge.expression(a), GraftBridge.expression(b)))
}
