package graft.plans

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Datasketches THETA sketch of a LONG column as a native Catalyst aggregate,
  * evaluating to the serialized ordered CompactSketch bytes — the durable,
  * MERGEABLE distinct-set summary that, unlike HLL (q125), supports SET
  * OPERATIONS on stored sketches: intersections and differences of shards
  * that were sketched independently (Dasgupta et al., "Theta-Sketch
  * Framework", and the Apache DataSketches theta documentation).
  *
  * Determinism: a theta sketch retains the k smallest transformed hash
  * values of the DISTINCT input items — insertion is idempotent and
  * retention depends only on the item SET, so the resulting bytes and every
  * estimate derived from them are identical under any Spark partitioning,
  * update order, or union tree (the q125/q26 requirement for appearing in a
  * hash-checked catalog query). lgK=12 ⇒ 4096 retained entries ⇒ RSE
  * ≈ 1/√(k−1) ≈ 1.6% per sketch in estimation mode; sets smaller than k
  * are EXACT.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")

  override def prettyName: String = "theta_sketch"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[LongType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_sketch requires BIGINT input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult(false, null))
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult(true, null).toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult(true, null).toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

object ThetaSketchOps {
  def wrap(bytes: Array[Byte]): Sketch = Sketches.wrapSketch(Memory.wrap(bytes))
}

/** Union of STORED theta sketches (a binary column of serialized
  * CompactSketches) — the re-aggregation layer: fold shard sketches into
  * coarser rollups (daily → monthly, per-source → corpus) without touching
  * raw data. Same determinism argument as [[ThetaSketchAgg]]; `lgK` bounds
  * the RESULT sketch (inputs keep their own k).
  */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")

  // prints as the SQL registration name (theta_merge), NOT theta_union:
  // Spark 4.1's builtin scalar theta_union must stay unambiguous in plans
  // and error text
  override def prettyName: String = "theta_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[BinaryType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_merge requires BINARY (sketch) input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(ThetaSketchOps.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult(false, null))
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult(true, null).toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult(true, null).toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** |A \ B| estimate from two stored theta sketches (set difference — with
  * [[ThetaIntersectEstimate]] the full set algebra HLL lacks). Shard-table
  * rows only, interpreted eval.
  */
case class ThetaAnotBEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "theta_anotb_estimate"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[BinaryType] && right.dataType.isInstanceOf[BinaryType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_anotb_estimate requires BINARY inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaSketchOps.wrap(a.asInstanceOf[Array[Byte]]),
        ThetaSketchOps.wrap(b.asInstanceOf[Array[Byte]]))
      .getEstimate

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaAnotBEstimate =
    copy(left = newLeft, right = newRight)
}

/** Distinct-count estimate of a stored theta sketch (binary column). Not a
  * hot-path expression — it reads model/shard-table rows (#shards, never
  * corpus rows), so interpreted eval is fine.
  */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[BinaryType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate requires BINARY input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    ThetaSketchOps.wrap(input.asInstanceOf[Array[Byte]]).getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** |A ∩ B| estimate from two STORED theta sketches — the operation HLL
  * cannot provide (inclusion-exclusion on HLL estimates compounds error;
  * theta intersects the retained hash SAMPLES directly). Shard-table rows
  * only (#shards² at most), interpreted eval.
  */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "theta_intersect_estimate"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[BinaryType] && right.dataType.isInstanceOf[BinaryType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_intersect_estimate requires BINARY inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(ThetaSketchOps.wrap(a.asInstanceOf[Array[Byte]]))
    i.intersect(ThetaSketchOps.wrap(b.asInstanceOf[Array[Byte]]))
    i.getResult.getEstimate
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}
