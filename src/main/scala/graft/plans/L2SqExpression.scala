package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared L2 distance between two numeric arrays as a single codegen'd
  * fold — the replacement for `aggregate(zip_with(a, b, (x,y) => (x-y)²))`,
  * which runs an interpreted lambda per element on the hottest ANN path
  * (the n×k vector-to-centroid distance rows of IVF assign/search/train).
  *
  * Bit-identical to the composed form: terms accumulate in dimension order
  * with the same float→double widening. Length mismatch → null (zip_with
  * null-pads, making the composed aggregate null — preserved here so the
  * swap is observationally identical).
  */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2sq"

  // Null even for non-null children (length mismatch → null); without this
  // the non-nullable codegen branch would emit `false = true` (Janino error).
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"l2sq requires two ARRAY<FLOAT|DOUBLE>, got ${l.catalogString}, ${r.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    L2Sq.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left)
    val rf = isFloat(right)
    val r = ctx.freshName("l2sqRes")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""Object $r = graft.plans.L2Sq.compute($a, $b, $lf, $rf);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = (Double) $r; }
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

object L2Sq {
  /** Boxed Double, or null on length mismatch (composed-form parity). */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Object = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val diff = x - y
      acc += diff * diff
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
