package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Signed-random-projection LSH bucket id in ONE pass over the vector —
  * the codegen'd replacement for the per-plane
  * `aggregate(zip_with(vec, planeLit, ...))` composition, which evaluates
  * numPlanes interpreted HOF folds per row (each re-walking all dims).
  *
  * `signs` is the flattened ±1 plane matrix, `signs(j * numDims + d)` =
  * component d of plane j (precomputed driver-side — the deterministic
  * hash-parity family of graft.ops.Similarity.planeSign). Bit j of the
  * result is set iff <vec, plane_j> > 0.
  *
  * Bit-identical to the composed form: each plane's dot still accumulates
  * its terms in dimension order (the outer loop is over dims, the inner
  * over planes — per-plane accumulation order is unchanged), and the
  * float→double widening matches `x.cast("double") * p`.
  *
  * A vector whose length differs from numDims throws (the composed form's
  * raise_error guard): zip_with would silently null-pad and zero every bit.
  */
case class SignedProjectionBucket(
    child: Expression,
    signs: Array[Double],
    numPlanes: Int,
    numDims: Int)
    extends UnaryExpression {

  require(numPlanes >= 1 && numPlanes <= 63, "1..63 planes fit a long bucket id")
  require(signs.length == numPlanes * numDims, "signs must be numPlanes x numDims")

  override def dataType: DataType = LongType
  override def prettyName: String = "signed_projection_bucket"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"signed_projection_bucket requires ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SignedProjectionBucket.compute(
      input.asInstanceOf[ArrayData], signs, numPlanes, numDims, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SignedProjectionBucket.compute($c, $signsRef, $numPlanes, $numDims, $elemIsFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): SignedProjectionBucket =
    copy(child = newChild)

  // Array[Double] equality is reference-based; compare contents so two
  // instances built from the same plane family are semantically equal
  // (canonicalization / subexpression elimination).
  override def equals(other: Any): Boolean = other match {
    case s: SignedProjectionBucket =>
      child == s.child && numPlanes == s.numPlanes && numDims == s.numDims &&
        java.util.Arrays.equals(signs, s.signs)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(numPlanes), Int.box(numDims),
      Int.box(java.util.Arrays.hashCode(signs)))
}

object SignedProjectionBucket {
  def compute(
      arr: ArrayData,
      signs: Array[Double],
      numPlanes: Int,
      numDims: Int,
      isFloat: Boolean): Long = {
    if (arr.numElements() != numDims) {
      throw new IllegalArgumentException(
        s"lshBucket: expected $numDims-dim vector, got ${arr.numElements()}")
    }
    val dots = new Array[Double](numPlanes)
    var d = 0
    while (d < numDims) {
      val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      var j = 0
      while (j < numPlanes) {
        dots(j) += x * signs(j * numDims + d)
        j += 1
      }
      d += 1
    }
    var bucket = 0L
    var j = 0
    while (j < numPlanes) {
      if (dots(j) > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }
}
