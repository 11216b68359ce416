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

/** Bloom filter as a native Catalyst aggregate — the engine's third
  * `TypedImperativeAggregate` beside [[FreqItemsSketch]] and
  * [[CountMinSketch]] (Bloom, "Space/Time Trade-offs in Hash Coding with
  * Allowable Errors", CACM 1970).
  *
  * The buffer is a `numBits`-bit set packed into `numBits / 64` longs.
  * update: for each hash row j < numHashes, set bit
  * `hash_j(key) mod numBits` with `hash_j(key) = hash60("bf<j>-" ++ key)` —
  * the engine's cross-engine md5 hash, so membership probes are expressible
  * as plain column arithmetic over the evaluated array (and, when an oracle
  * needs it, in DuckDB over the same hash). merge: bitwise OR.
  *
  * Like [[CountMinSketch]] cells (sums) and unlike Misra-Gries counters,
  * the bit values are ORs of per-row contributions — commutative,
  * associative, idempotent — so the evaluated bit array is fully
  * deterministic under ANY partitioning and merge tree.
  *
  * Membership has NO false negatives; false positives occur at rate
  * ≈ (1 − e^(−kn/m))^k for n inserted keys, m bits, k hashes. That makes
  * the filter a lossless PRE-filter for any exact downstream verify (see
  * `Dedup.contaminationPairsBloom`): the exact stage only ever removes
  * false positives, so bloom + verify ≡ exact.
  *
  * Scale shape: the aggregate collapses an arbitrarily large key set into a
  * fixed `m/8`-byte buffer that rides partial aggregation (per-partition
  * bits OR-merge at the exchange), and the evaluated array broadcasts where
  * the raw key set could not — the standard way to ship a 10^9-key
  * membership test to every executor in a few megabytes.
  */
case class BloomFilter60(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0 && numBits <= (1 << 26),
    "numBits must be a positive multiple of 64, at most 2^26 (8 MiB)")
  require(numHashes >= 1 && numHashes <= 16, "numHashes must be in [1, 16]")

  override def prettyName: String = "bloom_filter60"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_filter60 requires STRING input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val key = v.asInstanceOf[UTF8String].toString
    var j = 0
    while (j < numHashes) {
      // hash60 is 60-bit non-negative, so the mod is already non-negative
      val b = (Hash60.hash(UTF8String.fromString("bf" + j + "-" + key)) % numBits).toInt
      buffer(b >>> 6) |= 1L << (b & 63)
      j += 1
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
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
    val a = new Array[Long](numBits / 64)
    var i = 0
    while (i < a.length) { a(i) = in.readLong(); i += 1 }
    a
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilter60 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilter60 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilter60 =
    copy(child = newChild)
}
