package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native order-sensitive document fingerprint — the codegen'd replacement
  * for the composed `aggregate(transform(split(text), tok ->
  * hash60(tok) % 131072), 0, (acc, h) -> (acc*131071 + h) % 2^43)` in
  * graft.ops.Text (see [[graft.ops.Text.fingerprintComposed]] for the exact
  * constants rationale — all intermediates stay below 2^61).
  *
  * One pass per row: regex split, per-token md5 via the shared thread-local
  * digest, modular fold — no array materialization, no interpreted lambdas.
  * Bit-identical to the composed form (TokenFingerprintExpressionSpec).
  */
case class TokenFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "token_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_fingerprint requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TokenFingerprint.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenFingerprint.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenFingerprint =
    copy(child = newChild)
}

object TokenFingerprint {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def fingerprint(s: UTF8String): Long = {
    val toks = ws.split(s.toString, -1)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      val h = Hash60.hash(UTF8String.fromString(toks(i))) % 131072L
      acc = (acc * 131071L + h) % 8796093022208L // 2^43
      i += 1
    }
    acc
  }
}
