package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of non-overlapping regex matches — the allocation-free twin of
  * `size(regexp_extract_all(text, pattern, 0))`, which materializes every
  * match as a string only to take the array's length (round-2 verdict: the
  * BPE-ish token count spent most of its time here). Spark's own
  * `regexp_count` is RuntimeReplaceable sugar for exactly that composed form,
  * so it inherits the same allocation cost; this expression walks the matcher
  * and allocates nothing per match.
  *
  * The pattern is a plan-time constant (compiled once per task via the
  * codegen reference object). Null input → null, matching ANSI
  * `size(null) = NULL` over `regexp_extract_all(null) = NULL`.
  */
case class RegexpMatchCount(child: Expression, pattern: String)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "regexp_match_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"regexp_match_count requires STRING input, got ${child.dataType.catalogString}")

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)

  override protected def nullSafeEval(input: Any): Any =
    RegexpMatchCount.count(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("pattern", compiled, "java.util.regex.Pattern")
    defineCodeGen(ctx, ev, c => s"graft.plans.RegexpMatchCount.count($c, $patRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): RegexpMatchCount =
    copy(child = newChild)
}

object RegexpMatchCount {
  def count(s: UTF8String, p: java.util.regex.Pattern): Int = {
    val m = p.matcher(s.toString)
    var c = 0
    while (m.find()) c += 1
    c
  }
}
