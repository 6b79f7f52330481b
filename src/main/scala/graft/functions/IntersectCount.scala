package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `size(array_intersect(a, b))` for two BIGINT arrays, without
  * materializing the intersection: the count of DISTINCT common elements
  * (a shared null counts once, exactly like array_intersect's null
  * handling — null ∈ both sides contributes one element).
  *
  * Why custom: the Jaccard verifiers (the candidates→verify stage of every
  * near-dup pipeline) only need the SIZE of the intersection, but
  * `array_intersect` allocates and fills a result array per candidate
  * PAIR — at 10× amplification the verify stage is pure per-pair hash-set
  * work, so the allocation, copy, and result-array traversal are a large
  * constant factor on the hottest loop. This probes an open-addressed
  * primitive long table (no boxing) and counts, inside whole-stage
  * codegen. ExpressionsSpec pins the equality against
  * `size(array_intersect(a, b))` on duplicates, nulls, and empties. */
case class IntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count expects two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  /** Shared by interpreted eval and generated code. Open-addressed table
    * over the SMALLER side; matched slots are tombstoned so duplicates on
    * the probe side count once — the result is |set(a) ∩ set(b)|, plus one
    * if both sides contain a null element (array_intersect semantics). */
  def compute(aIn: ArrayData, bIn: ArrayData): Int = {
    // build the table from the smaller array: the probe loop is the cheap
    // side (one hash + scan per element)
    val (build, probe) =
      if (aIn.numElements() <= bIn.numElements()) (aIn, bIn) else (bIn, aIn)
    val n = build.numElements()
    var cap = 8
    while (cap < n * 2) cap <<= 1
    val table = new Array[Long](cap)
    val state = new Array[Byte](cap) // 0 empty, 1 filled, 2 matched
    val mask = cap - 1
    var buildHasNull = false
    var i = 0
    while (i < n) {
      if (build.isNullAt(i)) buildHasNull = true
      else {
        val v = build.getLong(i)
        var s = (scramble(v) & mask).toInt
        while (state(s) != 0 && table(s) != v) s = (s + 1) & mask
        if (state(s) == 0) { table(s) = v; state(s) = 1 }
      }
      i += 1
    }
    var count = 0
    var probeHasNull = false
    val m = probe.numElements()
    i = 0
    while (i < m) {
      if (probe.isNullAt(i)) probeHasNull = true
      else {
        val v = probe.getLong(i)
        var s = (scramble(v) & mask).toInt
        while (state(s) != 0 && table(s) != v) s = (s + 1) & mask
        if (state(s) == 1) { state(s) = 2; count += 1 } // first match only
      }
      i += 1
    }
    if (buildHasNull && probeHasNull) count + 1 else count
  }

  /** Finalizer-style mix so clustered gram hashes spread over the table. */
  private def scramble(v: Long): Long = {
    var h = v * -7046029254386353131L // Murmur3 fmix64 constant
    h ^= h >>> 32
    h
  }
}
