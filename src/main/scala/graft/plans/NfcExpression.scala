package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization as a native codegen
  * expression — Spark SQL has no normalization built-in, yet exact dedup,
  * shingle hashing and every other byte-keyed operator silently treats a
  * composed "é" (U+00E9) and its decomposed twin "e"+U+0301 as different
  * documents. Normalizing before hashing closes that hole.
  *
  * The common case (already-NFC ASCII/Latin text) is handled by
  * `Normalizer.isNormalized`, which is a cheap scan that avoids allocating
  * for ~all real rows; only rows that actually contain decomposed sequences
  * pay the compose. Cross-engine twin: DuckDB's `nfc_normalize()`
  * (NfcExpressionSpec pins a fixture matrix; the q166 oracle pins the
  * corpus path).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "nfc takes exactly one argument")
      NfcNormalize(children.head)
    })
}
