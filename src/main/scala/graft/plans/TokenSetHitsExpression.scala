package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of whitespace-run tokens of lower(input) that belong to a fixed
  * marker set (occurrences, not distinct) — the codegen'd replacement for
  * `size(filter(split(lower(text), "\\s+"), t => t.isin(markers)))`, whose
  * filter lambda runs interpreted per token and which the language-ID CASE
  * tree evaluates many times per row.
  *
  * Matches the composed form exactly (TokenSetHitsExpressionSpec): Spark's
  * locale-independent UTF8String.toLowerCase, Java regex split with trailing
  * empties, null input → null.
  */
case class TokenSetHits(child: Expression, markers: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_set_hits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_set_hits requires STRING input, got ${child.dataType.catalogString}")

  @transient private lazy val markerSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    markers.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenSetHits.count(input.asInstanceOf[UTF8String], markerSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("markerSet", markerSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenSetHits.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetHits =
    copy(child = newChild)
}

object TokenSetHits {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def count(s: UTF8String, markers: java.util.HashSet[_]): Int = {
    // same lowercase as Spark's Lower expression (locale-independent)
    val toks = ws.split(s.toLowerCase.toString, -1)
    var hits = 0
    var i = 0
    while (i < toks.length) {
      if (markers.contains(toks(i))) hits += 1
      i += 1
    }
    hits
  }
}
