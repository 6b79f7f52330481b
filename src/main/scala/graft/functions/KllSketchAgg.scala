package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL quantile sketches (Karnin, Lang, Liberty 2016 — the Datasketches
  * library Spark already ships for its `hll_sketch_agg` family) as typed
  * imperative aggregates: the PERSISTED, MERGEABLE percentile summary
  * beside the HLL distinct-count shards. A KLL sketch is a one-pass,
  * bounded-size (O(k·log n)) summary whose merge is associative and
  * commutative, so per-wave artifacts union to answer "p99 so far"
  * without rescanning profiled data — the quantile sibling of the HLL
  * shards' contract. Normalized rank error for the default k=200 is
  * ~1.65% at 99% confidence (single-sided), so a ±4-rank-point exact
  * band is far outside the error model.
  *
  * Unlike HLL registers (order-insensitive maxima — union ≡ rebuild
  * byte-for-byte), KLL compaction is randomized, so byte equality
  * between a shard union and a one-pass rebuild is NOT a property of
  * the sketch. What IS exact and order-insensitive is the sketch's
  * total update count `getN` — the mergeability pin the checked reader
  * uses (union N ≡ rebuild N ≡ exact row count) alongside rank-band
  * checks on both paths. */
private[graft] trait KllAggLike
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  def k: Int

  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // heapify copies into a mutable heap sketch, so the buffer stays
    // updatable after a shuffle round-trip
    val s = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (s.getK == k) s
    else {
      // normalize to this aggregate's k (merge handles the downsample)
      val fresh = KllDoublesSketch.newHeapInstance(k)
      fresh.merge(s)
      fresh
    }
  }
}

/** Build one serialized KLL sketch over a DOUBLE column — the shard
  * writer's aggregate (`Sketches.writeQuantileShard`). NULLs skip. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KllAggLike {

  require(k >= 8 && k <= 65535, s"kll k must be in [8, 65535], got $k")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch expects a double column, got ${other.simpleString}")
  }

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_sketch"
}

/** Union serialized KLL shard sketches back into ONE serialized sketch
  * — the shard COMPACTION aggregate (`Sketches.compactQuantileShards`):
  * merge is associative and commutative and EXACT in the update count
  * N, so a compacted shard answers every later union identically to the
  * waves it replaced (modulo the randomized compaction the rank bands
  * absorb); the binary output keeps the artifact appendable — later
  * waves union against it like any other shard. */
case class KllMergeSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KllAggLike {

  require(k >= 8 && k <= 65535, s"kll k must be in [8, 65535], got $k")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_sketch expects a binary sketch column, got ${other.simpleString}")
  }

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_merge_sketch"
}

/** Shared eval shape of the two summary aggregates: (n, quantiles at
  * the requested ranks) — `n` is the sketch's EXACT total update count
  * (order-insensitive under merge), quantiles are INCLUSIVE-rank reads. */
private[graft] trait KllSummaryLike extends KllAggLike {
  def ranks: Seq[Double]

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("quantiles", ArrayType(DoubleType, containsNull = false),
      nullable = true)))

  final override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) InternalRow(0L, null)
    else InternalRow(buffer.getN, new GenericArrayData(
      ranks.map(r =>
        buffer.getQuantile(r, QuantileSearchCriteria.INCLUSIVE)).toArray))
}

/** Union serialized KLL shard sketches and read quantiles — the
  * artifact reader's aggregate (`Sketches.quantilesFromShards`). */
case class KllMergeSummaryAgg(
    child: Expression,
    ranks: Seq[Double],
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KllSummaryLike {

  require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
    s"ranks must be non-empty fractions in [0, 1], got $ranks")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_summary expects a binary sketch column, got ${other.simpleString}")
  }

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeSummaryAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeSummaryAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeSummaryAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_merge_summary"
}

/** One-pass rebuild over raw DOUBLE values with the same summary shape —
  * the checked reader's rebuild arm (union ≡ rebuild on exact N). */
case class KllValuesSummaryAgg(
    child: Expression,
    ranks: Seq[Double],
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KllSummaryLike {

  require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
    s"ranks must be non-empty fractions in [0, 1], got $ranks")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_values_summary expects a double column, got ${other.simpleString}")
  }

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllValuesSummaryAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllValuesSummaryAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllValuesSummaryAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_values_summary"
}
