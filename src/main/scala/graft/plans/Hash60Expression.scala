package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's cross-engine 60-bit hash
  * (first 15 hex chars of md5, base 16 — see graft.ops.Hashing).
  *
  * The composed form `conv(substring(md5(c), 1, 15), 16, 10)` evaluates three
  * expressions and materializes a 32-char hex UTF8String plus a 15-char
  * slice per row; this expression computes the value straight from the digest
  * bytes (top 60 bits of the first 8 bytes) in one codegen'd static call —
  * no intermediate strings. It is the hot inner operation of every
  * minhash/simhash/fingerprint pipeline.
  *
  * Semantics are bit-identical to the composed form (asserted in
  * Hash60ExpressionSpec over generated inputs, and transitively by every
  * hash-dependent oracle query).
  */
case class Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash60 requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of the md5 == value of its first 15 hex chars in base 16. */
  def hash(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    val top = java.nio.ByteBuffer.wrap(bytes, 0, 8).getLong // big-endian
    top >>> 4
  }

  /** FunctionRegistry entry: (identifier, info, builder) — used by
    * [[graft.GraftExtensions]] and directly registrable in tests.
    */
  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hash60"),
    new ExpressionInfo(classOf[Hash60].getName, "hash60"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "hash60 takes exactly one argument")
      Hash60(children.head)
    })
}
