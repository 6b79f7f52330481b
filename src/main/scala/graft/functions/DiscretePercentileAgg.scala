package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** DISCRETE_PERCENTILE as a typed imperative aggregate — the faithful
  * re-expression of the reference UDAF (DiscretePercentile.java:40-168):
  *
  *  - buffer is a value → occurrence-count map (HashMap while accumulating,
  *    exactly like the reference's `update`/`merge`);
  *  - NULL inputs are skipped (`DiscretePercentile.update:104-107`), so they
  *    never inflate the cumulative-distribution denominator;
  *  - eval sorts the distinct values ascending and returns the smallest value
  *    whose cumulative distribution reaches the percentile
  *    (`DiscretePercentile.evaluate:142-167`);
  *  - output type = input type (`DiscretePercentile.dataType`), restricted to
  *    INT / LONG / FLOAT / DOUBLE (`DiscretePercentile.convertType:57-78`).
  *
  * Applied `.over(spec)` with the spec's ORDER BY — like the reference
  * (WindowsAggregationUtil.java:119-124) — Spark gives it the default running
  * RANGE frame, so each row sees the discrete percentile of its prefix (peers
  * included). Spark's expanding-frame processor updates the buffer
  * incrementally per row; only eval's sort is per-row work, O(distinct) —
  * same complexity as the reference UDAF, with the same caveat for
  * high-cardinality value columns.
  */
case class DiscretePercentileAgg(
    child: Expression,
    percentile: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, java.lang.Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"discrete_percentile supports int/long/float/double input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): java.util.HashMap[Any, java.lang.Long] =
    new java.util.HashMap[Any, java.lang.Long]()

  override def update(
      buffer: java.util.HashMap[Any, java.lang.Long],
      input: InternalRow): java.util.HashMap[Any, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val prev = buffer.get(v)
      buffer.put(v, if (prev == null) 1L else prev + 1L)
    }
    buffer
  }

  override def merge(
      buffer: java.util.HashMap[Any, java.lang.Long],
      other: java.util.HashMap[Any, java.lang.Long]): java.util.HashMap[Any, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = buffer.get(e.getKey)
      buffer.put(e.getKey, if (prev == null) e.getValue else prev + e.getValue)
    }
    buffer
  }

  /** Natural ascending order of the input type (the reference's TreeMap uses
    * the boxed types' Comparable — for float/double that is the total order
    * of Float/Double.compareTo, NaN greatest). */
  private lazy val ordering: Ordering[Any] = (child.dataType match {
    case IntegerType => Ordering.Int.on((x: Any) => x.asInstanceOf[Int])
    case LongType    => Ordering.Long.on((x: Any) => x.asInstanceOf[Long])
    case FloatType   => Ordering.Float.TotalOrdering.on((x: Any) => x.asInstanceOf[Float])
    case DoubleType  => Ordering.Double.TotalOrdering.on((x: Any) => x.asInstanceOf[Double])
    case other => throw new IllegalStateException(s"unsupported input type $other")
  }): Ordering[Any]

  override def eval(buffer: java.util.HashMap[Any, java.lang.Long]): Any = {
    if (buffer.isEmpty) return null
    val keys = buffer.keySet().toArray
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]], ordering.asInstanceOf[java.util.Comparator[AnyRef]])
    var total = 0L
    val vs = buffer.values().iterator()
    while (vs.hasNext) total += vs.next()
    var running = 0L
    var i = 0
    while (i < keys.length) {
      running += buffer.get(keys(i))
      if (running / total.toDouble >= percentile) return keys(i)
      i += 1
    }
    keys(keys.length - 1) // p <= 1.0 always resolves inside the loop; guard anyway
  }

  override def serialize(buffer: java.util.HashMap[Any, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(buffer)
    oos.close()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): java.util.HashMap[Any, java.lang.Long] = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(storageFormat))
    val m = ois.readObject().asInstanceOf[java.util.HashMap[Any, java.lang.Long]]
    ois.close()
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DiscretePercentileAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): DiscretePercentileAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): DiscretePercentileAgg =
    copy(child = newChild)

  override def prettyName: String = "discrete_percentile"
}
