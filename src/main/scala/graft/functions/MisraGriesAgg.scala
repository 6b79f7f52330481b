package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch (Misra & Gries 1982; mergeable form
  * after Agarwal et al. 2012, "Mergeable Summaries") as a typed imperative
  * aggregate: at most `capacity` counters survive at any moment, whatever
  * the input cardinality — the bounded-memory frequent-items summary the
  * exact `topNgrams` groupBy is NOT when the key space explodes (URL
  * domains, user ids, raw shingles at 100 TB).
  *
  * Guarantees, independent of partitioning and merge order (what makes the
  * within-bound contract deterministic even though the surviving counter
  * SET for near-threshold items is not):
  *
  *  - undercount only: `true(x) − n/(capacity+1) ≤ est(x) ≤ true(x)`;
  *  - every x with `true(x) > n/(capacity+1)` is present in the summary.
  *
  * update: hit → increment; miss with room → insert at 1; miss when full →
  * decrement ALL counters (dropping zeros) — one "charge" against every
  * survivor. merge: add counters pairwise, then if over capacity subtract
  * the (capacity+1)-th largest count from all and drop non-positives (the
  * mergeable-summaries reduction, preserving the additive error bound).
  * eval: (item, est) structs sorted (est desc, item asc) — deterministic
  * given the surviving set. */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, s"misra_gries capacity must be positive, got $capacity")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a string item column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(
      buffer: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      val prev = buffer.get(key)
      if (prev != null) buffer.put(key, prev + 1L)
      else if (buffer.size() < capacity) buffer.put(key, 1L)
      else {
        // full and unseen: charge one against every survivor
        val it = buffer.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buffer
  }

  override def merge(
      buffer: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long])
      : java.util.HashMap[String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = buffer.get(e.getKey)
      buffer.put(e.getKey, if (prev == null) e.getValue else prev + e.getValue)
    }
    if (buffer.size() > capacity) {
      // subtract the (capacity+1)-th largest count from everything
      val counts = new Array[Long](buffer.size())
      var i = 0
      val vs = buffer.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val es = buffer.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue <= cut) es.remove() else e.setValue(e.getValue - cut)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.HashMap[String, java.lang.Long]): Any = {
    val entries = new Array[(String, Long)](buffer.size())
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue.longValue()); i += 1
    }
    val sorted = entries.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(buffer)
    oos.close()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte])
      : java.util.HashMap[String, java.lang.Long] = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(storageFormat))
    val m = ois.readObject().asInstanceOf[java.util.HashMap[String, java.lang.Long]]
    ois.close()
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)

  override def prettyName: String = "misra_gries"
}
