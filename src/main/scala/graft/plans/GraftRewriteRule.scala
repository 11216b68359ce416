package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpExtractAll, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: `size(regexp_extract_all(x, <lit>, 0))` →
  * [[RegexpMatchCount]] — count the matches without materializing them.
  *
  * Spark's own `regexp_count` is RuntimeReplaceable sugar for exactly this
  * composed form (expanded by ReplaceExpressions before the operator-
  * optimization batch where injected rules run), so with GraftExtensions
  * loaded, SQL users writing `regexp_count(text, '...')` get the
  * allocation-free native path automatically. Only fires when:
  *  - the pattern is a foldable non-null string literal (the native
  *    expression compiles it once per task);
  *  - the group index is literal 0 (whole-match counting);
  *  - ANSI size semantics (`legacySizeOfNull = false`): both sides then map
  *    null input → null. Legacy `size(null) = -1` is NOT reproduced, so the
  *    rewrite is skipped there.
  */
object GraftRewriteRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.REGEXP_EXTRACT_FAMILY)) {
      case Size(RegExpExtractAll(subject, Literal(p: UTF8String, StringType), Literal(0, _)), false)
          if p != null && subject.dataType.isInstanceOf[StringType] =>
        RegexpMatchCount(subject, p.toString)
    }
}
