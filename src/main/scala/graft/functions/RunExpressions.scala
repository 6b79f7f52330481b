package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}

/** Sorted-run scans as REAL codegen'd expressions (r21).
  *
  * Why custom: Catalyst higher-order functions (`aggregate`, `transform`,
  * `filter`) never participate in whole-stage codegen — each element
  * re-enters the interpreted expression evaluator, and a struct-accumulator
  * fold costs on the order of a microsecond per element. The quality-rules
  * bigram-run fold and the entropy n·ln(n) folds ran those interpreted
  * loops over every document's bigram/char/word arrays (≈ 50–300 elements,
  * several chains per scorecard pass), which the r21 probes measured as the
  * dominant single-task cost of the scorer family. These two expressions
  * compile the sort + scan into tight JVM loops — the same rationale (and
  * code pattern: codegen calls the shared static compute) as
  * [[SimHashSignature]] / [[CharGramRank]].
  *
  * Value contract (oracle-critical): outputs are BIT-IDENTICAL to the HOF
  * formulations they replace — integer run lengths are exact, and
  * [[SortedRunNLnN]] replays the fold's per-element accumulation verbatim
  * (same `StrictMath.log` as Catalyst's Log expression, same left-associated `s + r·ln r − prevTerm`
  * order over the same binary-sorted element order), so even last-ulp float
  * behaviour matches. ExpressionsSpec pins parity against the HOF forms.
  */

/** Longest equal run in `child` (array<long>) AFTER sorting — i.e. the
  * maximum element multiplicity. Replaces `array_sort` + the interpreted
  * max-run fold in [[graft.operators.TextAnalysis.qualityRules]]. Empty
  * array → 0. Elements must be non-null (gram-hash arrays are). */
case class MaxSortedRunLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_sorted_run_length expects array<bigint>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MaxSortedRunLength.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MaxSortedRunLength.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): MaxSortedRunLength =
    copy(child = newChild)
}

object MaxSortedRunLength {
  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Int = {
    val a = arr.toLongArray()
    java.util.Arrays.sort(a)
    var mx = 0
    var run = 0
    var i = 0
    while (i < a.length) {
      run = if (i == 0 || a(i) != a(i - 1)) 1 else run + 1
      if (run > mx) mx = run
      i += 1
    }
    mx
  }
}

/** Σ over the runs of the SORTED `child` (array<string>) of n·ln(n),
  * accumulated exactly like the entropy fold it replaces
  * ([[graft.operators.TextAnalysis.entropyStats]]'s `runNLnN`): elements
  * sort in binary UTF8 order (Spark's default string ordering — what
  * `array_sort` produced), and each element at run position r contributes
  * `s = s + r·ln(r) − (r−1)·ln(r−1)` (second term 0 for r = 1) in that
  * exact left-associated order, so the returned double is bit-identical
  * to the fold's. Empty array → 0.0. Elements must be non-null (split()
  * output never is). */
case class SortedRunNLnN(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_run_nlnn expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SortedRunNLnN.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SortedRunNLnN.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SortedRunNLnN =
    copy(child = newChild)
}

object SortedRunNLnN {
  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Double = {
    val n = arr.numElements()
    val a = new Array[AnyRef](n)
    var i = 0
    while (i < n) { a(i) = arr.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(a) // UTF8String.compareTo = binary = array_sort order
    var s = 0.0
    var r = 0L
    i = 0
    while (i < n) {
      r = if (i == 0 || !a(i).equals(a(i - 1))) 1L else r + 1L
      val rd = r.toDouble
      s = s + rd * java.lang.StrictMath.log(rd) -
        (if (r == 1L) 0.0 else (rd - 1.0) * java.lang.StrictMath.log(rd - 1.0))
      i += 1
    }
    s
  }
}

object RunFunctions {
  /** Longest equal run of the sorted array<long> — max element multiplicity. */
  def max_sorted_run_length(arr: Column): Column =
    GraftColumnBridge.column(MaxSortedRunLength(GraftColumnBridge.expression(arr)))

  /** Entropy fold Σ n·ln(n) over the sorted array<string>'s runs. */
  def sorted_run_nlnn(arr: Column): Column =
    GraftColumnBridge.column(SortedRunNLnN(GraftColumnBridge.expression(arr)))
}
