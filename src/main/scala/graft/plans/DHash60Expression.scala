package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit perceptual difference hash (dHash) of a binary payload's
  * hex encoding — the content-defined analog of the classic image dHash
  * (resize to a (w+1)×h grayscale grid, set one bit per horizontally
  * adjacent cell pair with increasing brightness; see e.g. the
  * widely-documented pHash/dHash family). Here the "pixels" of an opaque
  * payload are content-region hashes: the hex string is cut into 66
  * CONTENT-SCALED regions (region i covers bytes ⌊i·L/66⌋..⌊(i+1)·L/66⌋ of
  * the L-byte payload — the analog of resizing the image to the grid, so a
  * short payload still fills all 66 cells instead of sharing empty tail
  * cells with every other short payload) laid out on an 11×6 grid. Each
  * region's "brightness" is `hash60(i ++ "-" ++ region) mod 256`, and the
  * 60 output bits compare horizontally adjacent region brightnesses (10
  * comparisons × 6 rows). A same-length local edit changes one or two
  * regions and flips at most ~4 bits, so near-identical payloads land
  * within a small Hamming radius — the property the pigeonhole-blocked
  * pair join (`Dedup.simhashComboKeys`) exploits — while unrelated
  * payloads differ in ~30 bits. Length-CHANGING edits shift every region
  * boundary (as cropping shifts every pixel for the image dHash); catching
  * those is the shingle operators' job (q52/q107), not this code's. For
  * ACTUAL decodable images, [[graft.ops.Media.dhashOf]] computes the real
  * pixel-brightness dHash with the same bit layout.
  *
  * One pass per row, 66 md5 invocations over ≤132-char slices via the
  * shared thread-local digest — no per-row string explosion, no UDF. The
  * DuckDB oracle reproduces the grid bit for bit from `md5`/`substring`
  * (MediaQueries q134).
  */
case class DHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "dhash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dhash60 requires STRING (hex) input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    DHash60.ofHex(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DHash60.ofHex($c)")

  override protected def withNewChildInternal(newChild: Expression): DHash60 =
    copy(child = newChild)
}

object DHash60 {
  /** Grid geometry: 11 columns × 6 rows of content-scaled regions;
    * 10 horizontal comparisons per row × 6 rows = 60 bits.
    */
  val Cols = 11
  val Rows = 6
  val Cells: Int = Cols * Rows

  /** The dHash of an UPPERCASE hex string (the output of Spark/DuckDB
    * `hex(payload)` — both engines uppercase, the `Media.contentHash`
    * invariant). Cell i's region is bytes ⌊i·L/66⌋ until ⌊(i+1)·L/66⌋
    * (2 hex chars per byte); gray = `hash60(i ++ "-" ++ region) mod 256`.
    */
  def ofHex(hexStr: UTF8String): Long = {
    val s = hexStr.toString
    // the grid/oracle semantics are only defined over hex(payload) output
    // (even-length uppercase hex); anything else must error, not silently
    // drop the odd trailing char or hash lowercase into different grays
    if (s.length % 2 != 0)
      throw new IllegalArgumentException(
        s"dhash60: odd-length hex input (${s.length} chars); expected hex(payload)")
    var v = 0
    while (v < s.length) {
      val ch = s.charAt(v)
      if (!((ch >= '0' && ch <= '9') || (ch >= 'A' && ch <= 'F')))
        throw new IllegalArgumentException(
          s"dhash60: non-uppercase-hex char '$ch' at $v; expected hex(payload)")
      v += 1
    }
    val nBytes = s.length / 2
    val gray = new Array[Long](Cells)
    var i = 0
    while (i < Cells) {
      val from = 2 * ((i.toLong * nBytes) / Cells).toInt
      val until = 2 * (((i + 1).toLong * nBytes) / Cells).toInt
      gray(i) = Hash60.hash(
        UTF8String.fromString(i.toString + "-" + s.substring(from, until))) % 256L
      i += 1
    }
    var out = 0L
    var r = 0
    while (r < Rows) {
      var c = 0
      while (c < Cols - 1) {
        if (gray(r * Cols + c) < gray(r * Cols + c + 1)) out |= 1L << (r * 10 + c)
        c += 1
      }
      r += 1
    }
    out
  }
}
