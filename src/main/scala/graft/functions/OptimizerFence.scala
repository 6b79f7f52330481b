package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that the optimizer must treat as opaque — the
  * re-evaluation fence for EXPENSIVE computed columns that downstream
  * plans FILTER on (r21, optimization guide §4.4 applied to built-in
  * expression chains).
  *
  * The problem it solves: predicate pushdown substitutes a filtered
  * column's defining expression into the predicate and pushes it below
  * the projection that computes it — all the way to the scan. For a gate
  * like `quality_pass` (whitespace split + gram hashing + sorted-run
  * folds + regexp counts per document), that re-inlines the WHOLE chain
  * into a scan-level Filter while the projection above still computes the
  * very same expressions for its output columns: every surviving row pays
  * the chain twice, and every row pays the conjunction once more inside
  * the Filter (observed on the r21 q159/q103 plans — the pushed Filter
  * node carried three copies of split(text) and two of the bigram-fold).
  * None of that pushdown ever reached parquet anyway: complex predicates
  * are not data filters (`PushedFilters` stays IsNotNull-only), so the
  * "pushdown" bought row-dropping one operator early at the price of
  * evaluating the heavy chain per row per copy.
  *
  * Marking the gate expression non-deterministic is the documented
  * remedy (the guide's `asNondeterministic()` for UDFs): the optimizer
  * may not duplicate, reorder past, or constant-fold it, so a filter on
  * the column stays immediately ABOVE the projection that computes it —
  * the chain evaluates exactly once per row. Unlike a UDF the wrapped
  * child still participates in whole-stage codegen (this node emits the
  * child's code verbatim), so the zero-fallback tripwire holds.
  *
  * What is deliberately given up: filters on OTHER (unfenced) columns
  * still push past the projection (the substitution rule only blocks
  * predicates that would inline a non-deterministic alias), and join-side
  * conjunct pushdown still prunes rows before joins — the fence sits on
  * map-side projections directly above their scans, so nothing that
  * mattered at scale is lost. Apply ONLY to expensive gate columns; a
  * blanket fence would block legitimate pushdown (the guide's own
  * caveat). */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  // the whole point: the optimizer may not clone or move this expression
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OptimizerFence =
    copy(child = newChild)
}

object OptimizerFence {
  /** Column-level entry point: `fence(expensiveGate)`. */
  def fence(c: Column): Column =
    GraftColumnBridge.column(OptimizerFence(GraftColumnBridge.expression(c)))
}
