package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Datasketches KLL quantile sketch of a DOUBLE column as a native Catalyst
  * aggregate, evaluating to the serialized sketch bytes — the MERGEABLE
  * quantile summary that completes the durable sketch-table family beside
  * HLL (distinct counts, q125), theta (set ops, q136), CMS (frequencies,
  * q49), and exact moment shards (q144): per-shard sketches stored as
  * bytes; any later quantile — a shard, a shard subset, the corpus — is a
  * UNION over stored bytes, never a rescan or a sort (Karnin, Lang,
  * Liberty, "Optimal Quantile Approximation in Streams", FOCS 2016; the
  * Apache DataSketches KLL documentation).
  *
  * DETERMINISM CAVEAT — and why the catalog surface is verdicts, not raw
  * estimates: unlike HLL (register max), theta (k smallest hashes) and CMS
  * (cell sums), KLL compaction flips a COIN (a JVM-global `Random` shared
  * by every aggregation task) to decide which half of a full level
  * survives, so the sketch BYTES — and estimates derived from them — are
  * not a pure function of the input multiset under parallel aggregation.
  * What IS exact and deterministic: `getN` (a counter, additive under
  * merge) and the rank-error CONTRACT — every estimate's true rank lies
  * within ±ε(k) of the requested rank with overwhelming probability
  * (ε ≈ 1.33% at 1σ for k=256; the verdict columns use a 5% rank
  * tolerance, leaving > 3σ of margin). Catalog queries therefore expose
  * exact quantiles (computed relationally, cross-engine reproducible) plus
  * `within_bound`/`n_match` verdicts — the q26/q125 sketch discipline.
  *
  * Scale: one sketch is O(k·log(n/k)) doubles (a few KB); the aggregation
  * combines map-side, so only #tasks × #keys partial sketches cross the
  * exchange regardless of the sketched row volume.
  */
case class KllDoublesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def prettyName: String = "kll_sketch"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[DoubleType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch requires DOUBLE input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val s = createAggregationBuffer()
    s.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllDoublesAgg =
    copy(child = newChild)
}

/** Union of STORED KLL sketches (a binary column of serialized sketches) —
  * the re-aggregation layer: fold shard sketches into coarser rollups
  * (per-key → corpus, daily → monthly) from stored bytes alone. KLL merge
  * preserves the rank-error contract of the result k; `getN` adds exactly.
  * Same determinism caveat as [[KllDoublesAgg]].
  */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def prettyName: String = "kll_union"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[BinaryType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_union requires BINARY (sketch) input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val s = createAggregationBuffer()
    s.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllUnionAgg =
    copy(child = newChild)
}

/** Quantile estimate at rank `q` (a runtime DOUBLE, so a quantile frame can
  * cross-join the sketch table) from a stored KLL sketch — INCLUSIVE search
  * criterion: the estimate is an actual input item whose inclusive rank is
  * ≥ q, within the sketch's rank error. NULL for an empty sketch.
  *
  * SKETCH-TABLE-ROW expression, not a corpus-column expression: every eval
  * heapifies the sketch bytes, which is fine on the frames it is built for
  * (#keys × #qs rows above an aggregate/stored table) and wrong mapped over
  * a corpus column — aggregate first ([[KllDoublesAgg]]/[[KllUnionAgg]]),
  * then evaluate this on the aggregate's output (PlanSpec pins q386's plan
  * shape).
  */
case class KllQuantile(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[BinaryType] && right.dataType.isInstanceOf[DoubleType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile requires (BINARY, DOUBLE) inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(sketch: Any, q: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(q.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** Exact count of values absorbed by a stored KLL sketch — `getN` is a
  * plain counter (NOT DataSketches' getNumRetained, the post-compaction
  * item count), additive under merge, so unlike the estimates it IS
  * deterministic and joins the hash-checked surface directly (the n_match
  * verdict: sketch saw every row the exact side counted).
  *
  * Same sketch-table-row contract as [[KllQuantile]]: heapifies per eval,
  * so it belongs above an aggregate/stored table, never mapped over a
  * corpus column.
  */
case class KllN(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "kll_n"
  override def dataType: DataType = LongType
  // NULL in → NULL out (nullSafeEval): a sketch column arriving through an
  // outer join is legitimately NULL, and claiming non-null here would let
  // Catalyst miscompile around it.
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[BinaryType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_n requires BINARY input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]])).getN

  override protected def withNewChildInternal(newChild: Expression): KllN =
    copy(child = newChild)
}
