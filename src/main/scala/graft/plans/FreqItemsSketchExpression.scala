package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a native Catalyst aggregate
  * (`TypedImperativeAggregate` — the engine's one custom AGGREGATE beside its
  * scalar codegen expressions).
  *
  * The sketch keeps at most `capacity` (key, counter) pairs per buffer:
  *  - update: increment a present key; insert if there is room; otherwise
  *    decrement ALL counters by one (dropping zeros) — the classic
  *    Misra-Gries step, O(1) amortized (each batch decrement cancels
  *    `capacity` earlier increments);
  *  - merge: sum counters keyed, then subtract the (capacity+1)-th largest
  *    counter from every entry and drop non-positives — the mergeable-summary
  *    form (Agarwal et al., "Mergeable Summaries", PODS'12), whose
  *    total-undercount bound n/(capacity+1) holds under ARBITRARY merge
  *    trees, i.e. under any Spark partitioning of partial buffers.
  *
  * Guarantee: every item with true frequency > n/(capacity+1) survives to the
  * final buffer, regardless of how the data was partitioned. Counter VALUES
  * are partitioning-dependent (only the bound is deterministic), so the
  * aggregate evals to the candidate KEY SET only (sorted array<string>) — the
  * intended use is candidate generation for an exact second verification pass
  * ([[graft.ops.Text.heavyHitterTokens]]), whose output IS deterministic and
  * oracle-checkable whenever the selection threshold exceeds the bound.
  *
  * Scale shape: a full heavy-hitter count over 100 TB of tokens shuffles the
  * whole vocabulary (billions of distinct tokens); the sketch pass shuffles
  * `capacity` rows per partition, and the verify pass shuffles only the
  * <= `capacity` candidates' counts (map-side filtered via a broadcast
  * semi-join).
  */
case class FreqItemsSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(capacity >= 1, "sketch capacity must be >= 1")

  override def prettyName: String = "freq_items_sketch"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_items_sketch requires STRING input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buffer: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val key = v.asInstanceOf[UTF8String].toString
    // a counter is never stored as 0, so getOrDefault==0 <=> absent (avoids
    // Scala's null-unboxing pitfall on java.util.HashMap[_, Long])
    val cur = buffer.getOrDefault(key, 0L)
    if (cur != 0L) buffer.put(key, cur + 1L)
    else if (buffer.size < capacity) buffer.put(key, 1L)
    else {
      // Misra-Gries decrement step: all counters down one, zeros evicted
      val it = buffer.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    buffer
  }

  override def merge(
      buffer: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    other.forEach { (k, v) =>
      buffer.put(k, buffer.getOrDefault(k, 0L) + v)
    }
    if (buffer.size > capacity) {
      // subtract the (capacity+1)-th largest counter, drop non-positives
      val counts = new Array[Long](buffer.size)
      var i = 0
      val vit = buffer.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(buffer.size - capacity - 1) // (capacity+1)-th largest
      val it = buffer.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[String](buffer.size)
    buffer.keySet().toArray(keys)
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString): Array[Any])
  }

  override def serialize(buffer: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.forEach { (k, v) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      m.put(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsSketch =
    copy(child = newChild)
}
