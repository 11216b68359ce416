package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a native Catalyst aggregate — the engine's second
  * `TypedImperativeAggregate` beside [[FreqItemsSketch]] (Cormode &
  * Muthukrishnan, "An Improved Data Stream Summary: The Count-Min Sketch
  * and its Applications").
  *
  * The buffer is a `depth × width` counter matrix (flat `Array[Long]`,
  * row-major). update: for each row r, increment cell
  * `hash_r(key) mod width` with `hash_r(key) = hash60("cm<r>-" ++ key)` —
  * the engine's cross-engine md5 hash, so every cell value is reproducible
  * in the DuckDB oracle as a plain relational GROUP BY over the same hash.
  * merge: element-wise add.
  *
  * Unlike Misra-Gries (whose counter VALUES are partitioning-dependent and
  * only the guarantee is deterministic), CMS cell values are SUMS of
  * per-row increments — fully deterministic on ANY partitioning and any
  * merge tree, so point estimates `min_r cell(r, hash_r(k))` are
  * hash-comparable cross-engine, not merely bounded. Estimates never
  * undercount; overcount is bounded by n/width per row w.h.p. across the
  * independent rows.
  *
  * Scale shape: one `depth·width`-long buffer per group rides partial
  * aggregation — the vocabulary never crosses the shuffle; the sketch is
  * mergeable state, so it composes with streaming aggregation and with
  * sketch-table storage (sum the arrays element-wise to roll up).
  */
case class CountMinSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")
  require(width >= 2, "width must be >= 2")

  override def prettyName: String = "count_min_sketch60"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min_sketch60 requires STRING input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val key = v.asInstanceOf[UTF8String].toString
    var r = 0
    while (r < depth) {
      val h = Hash60.hash(UTF8String.fromString("cm" + r + "-" + key))
      buffer(r * width + (h % width).toInt) += 1L
      r += 1
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.map(java.lang.Long.valueOf): Array[Any])

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buffer.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buffer.length) { out.writeLong(buffer(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val a = new Array[Long](depth * width)
    var i = 0
    while (i < a.length) { a(i) = in.readLong(); i += 1 }
    a
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketch =
    copy(child = newChild)
}
