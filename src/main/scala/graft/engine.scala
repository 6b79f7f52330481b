package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The window-aggregation engine: WindowQuerySpec → DataFrame transform.
  *
  * Spark-first re-expression of the reference's execution path
  * (WindowsAggregationUtil.java:49-91): one WindowSpec shared by every
  * aggregate, one `withColumn(alias, fn.over(spec))` per aggregate — Catalyst
  * collapses the chain into a single physical Window node (one
  * `Exchange hashpartitioning(partitionFields)` + one intra-partition sort),
  * so N aggregates over the same clause cost one shuffle, not N.
  *
  * Scale notes (100 TB design):
  *  - The only shuffle is the hash partition on `partitionFields`; AQE
  *    (`spark.sql.adaptive.enabled`, default on in Spark 4) re-splits skewed
  *    partitions at runtime. For pathologically hot keys, pre-salt the
  *    partition key upstream — rank-family functions are salt-incompatible
  *    (they need the whole partition), but ACCUMULATE/frame aggregates can be
  *    two-phase salted.
  *  - Spark's WindowExec sorts within partitions via UnsafeExternalSorter and
  *    spills; frames are evaluated incrementally (no per-row re-scan).
  *  - DISCRETE_PERCENTILE is composed from cume_dist + a whole-partition min
  *    (two window passes over the SAME exchange — the second reuses the
  *    shuffle, adding only a sort), rather than a value→count map UDAF like
  *    the reference (DiscretePercentile.java:98-168), whose O(distinct)
  *    driver-side-style buffer would not survive high-cardinality columns.
  */
object WindowEngine {

  /** Validate then apply `spec` to `df`. Throws GraftValidationException with
    * ALL accumulated failures (reference: WindowAggregation.java:130-131). */
  def run(df: DataFrame, spec: WindowQuerySpec): DataFrame = {
    val failures = Validator.validate(spec, df.schema)
    if (failures.nonEmpty) throw new GraftValidationException(failures)
    applyUnchecked(df, spec)
  }

  /** Parse config-style strings, validate, and run — the full reference
    * lifecycle (configure → validate → transform) in one call. */
  def runDsl(
      df: DataFrame,
      partitionFields: String,
      partitionOrder: String = "",
      aggregates: String = "",
      windowFrameType: String = "NONE",
      preceding: Option[Long] = None,
      following: Option[Long] = None,
      unboundedPreceding: Boolean = false,
      unboundedFollowing: Boolean = false,
      numberOfPartitions: Option[Int] = None): DataFrame =
    DslParser.parseSpec(partitionFields, partitionOrder, aggregates, windowFrameType,
        preceding, following, unboundedPreceding, unboundedFollowing, numberOfPartitions) match {
      case Left(failures) => throw new GraftValidationException(failures)
      case Right(spec)    => run(df, spec)
    }

  /** Field-level lineage for a spec: one record per aggregate describing the
    * generated output field, its source field, and the operation — the
    * engine-side equivalent of the reference's prepareRun lineage recording
    * (WindowAggregation.java:374-460). Pipeline frameworks consume this to
    * publish provenance; it is derived purely from the spec, no execution. */
  case class FieldLineage(outputField: String, inputField: String, description: String)

  def lineage(spec: WindowQuerySpec): Seq[FieldLineage] =
    spec.aggregates.map { agg =>
      val clause =
        s"partitioned by ${spec.partitionFields.mkString(", ")}" +
          (if (spec.order.nonEmpty)
            s", ordered by ${spec.order.map(o => s"${o.field} ${o.direction}").mkString(", ")}"
          else "")
      FieldLineage(agg.alias, agg.field,
        s"Generated field '${agg.alias}' from field '${agg.field}' via ${agg.fn.fnName}" +
          (if (agg.args.nonEmpty) s"(${agg.args.mkString(", ")})" else "") + s", $clause")
    }

  /** Output schema = input fields ++ one appended field per aggregate alias
    * (reference: WindowAggregation.java:361-371); an alias matching an input
    * field replaces it in place (the e2e pipeline relies on this,
    * WindowAggregation.feature:32-36). */
  def outputSchema(input: StructType, spec: WindowQuerySpec): StructType = {
    val inputNames = input.fieldNames.toSet
    val appended = spec.aggregates.filterNot(a => inputNames.contains(a.alias)).map { agg =>
      StructField(agg.alias, aggregateOutputType(agg, input), nullable = true)
    }
    val replaced = input.fields.map { f =>
      spec.aggregates.find(_.alias == f.name) match {
        case Some(agg) => StructField(f.name, aggregateOutputType(agg, input), nullable = true)
        case None      => f
      }
    }
    StructType(replaced ++ appended)
  }

  private def aggregateOutputType(agg: AggregateSpec, input: StructType): DataType =
    agg.fn.declaredOutput.getOrElse(
      input.fields.find(_.name == agg.field).map(_.dataType).getOrElse(NullType))

  private def applyUnchecked(df: DataFrame, spec: WindowQuerySpec): DataFrame = {
    val shared = buildWindowSpec(spec)
    var out = df
    for (agg <- spec.aggregates) {
      out = agg.fn match {
        case WindowFn.DiscretePercentile => applyDiscretePercentile(out, agg, spec)
        case _ =>
          // Cast AFTER .over(): wrapping the aggregate in a Cast before
          // .over() would hide it from Spark's window-expression extraction.
          val overCol = column(agg).over(shared)
          out.withColumn(agg.alias, postCast(agg, df.schema).fold(overCol)(overCol.cast))
      }
    }
    spec.numberOfPartitions match {
      case Some(n) => out.repartition(n) // reference knob: WindowsAggregationUtil.java:84-90
      case None    => out
    }
  }

  /** partition + order + frame → WindowSpec. Unbounded sentinels
    * (Long.MinValue/MaxValue) pass through verbatim — they ARE Spark's
    * Window.unboundedPreceding/unboundedFollowing. */
  private[graft] def buildWindowSpec(spec: WindowQuerySpec): WindowSpec = {
    val partitioned = Window.partitionBy(spec.partitionFields.map(col): _*)
    val ordered =
      if (spec.order.isEmpty) partitioned
      else partitioned.orderBy(spec.order.map(orderColumn): _*)
    spec.frame.frameType match {
      case FrameType.NoFrame => ordered
      case FrameType.Row     => ordered.rowsBetween(spec.frame.startBound, spec.frame.endBound)
      case FrameType.Range   => ordered.rangeBetween(spec.frame.startBound, spec.frame.endBound)
    }
  }

  private def orderColumn(o: OrderSpec): Column = o.direction match {
    case SortDirection.Ascending  => col(o.field).asc
    case SortDirection.Descending => col(o.field).desc
  }

  /** Function → Column (reference dispatch: WindowsAggregationUtil.java:126-179). */
  private def column(agg: AggregateSpec): Column = agg.fn match {
    case WindowFn.Rank        => rank()
    case WindowFn.DenseRank   => dense_rank()
    case WindowFn.PercentRank => percent_rank()
    case WindowFn.NTile       => ntile(agg.args.head.toInt)
    case WindowFn.RowNumber   => row_number()
    // Exact percentile (Hive-style interpolation), NOT approx_percentile —
    // reference uses callUDF("percentile", ...) (WindowsAggregationUtil.java:140-147).
    case WindowFn.Median                => percentile(col(agg.field), lit(0.5))
    case WindowFn.ContinuousPercentile  => percentile(col(agg.field), lit(agg.args.head.toDouble))
    case WindowFn.Lead        => lead(agg.field, agg.args.head.toInt)
    case WindowFn.Lag         => lag(agg.field, agg.args.head.toInt)
    case WindowFn.First       => first(agg.field, firstLastIgnoreNulls(agg))
    case WindowFn.Last        => last(agg.field, firstLastIgnoreNulls(agg))
    case WindowFn.CumulativeDistribution => cume_dist()
    case WindowFn.Accumulate  => sum(agg.field)
    case WindowFn.DiscretePercentile =>
      throw new IllegalStateException("DISCRETE_PERCENTILE handled separately")
  }

  /** Post-.over() cast honoring the reference's declared output types:
    * PERCENT_RANK is declared FLOAT (WindowAggregationConfig.java:333) though
    * Spark computes DOUBLE; ACCUMULATE's output = input type
    * (WindowAggregationConfig.java:398) though Spark's sum widens (int→long). */
  private def postCast(agg: AggregateSpec, schema: StructType): Option[DataType] = agg.fn match {
    case WindowFn.PercentRank => Some(FloatType)
    case WindowFn.Accumulate  => schema.fields.find(_.name == agg.field).map(_.dataType)
    case _                    => None
  }

  /** FIRST/LAST ignoreNulls: config flag OR'd with an optional boolean arg
    * (reference: WindowsAggregationUtil.java:158-171). Parsed like Java's
    * Boolean.parseBoolean — true iff the literal "true", never throws (the
    * e2e fixture passes "1" here). */
  private def firstLastIgnoreNulls(agg: AggregateSpec): Boolean =
    agg.ignoreNulls || agg.args.headOption.exists(_.equalsIgnoreCase("true"))

  /** DISCRETE_PERCENTILE: smallest value v in the partition with
    * cume_dist(v) >= p — the reference UDAF's semantics
    * (DiscretePercentile.java:148-167), composed from built-ins:
    * cume_dist over (partition ORDER BY field) feeding a whole-partition min.
    * Both windows share the hash partitioning, so this costs one shuffle.
    * Output type = input field type (min(when(...)) preserves it). */
  private def applyDiscretePercentile(df: DataFrame, agg: AggregateSpec, spec: WindowQuerySpec): DataFrame = {
    val p = agg.args.head.toDouble
    val parts = spec.partitionFields.map(col)
    val byValue = Window.partitionBy(parts: _*).orderBy(col(agg.field).asc)
    val whole = Window.partitionBy(parts: _*)
    val tmp = s"__graft_cd_${agg.alias}"
    df.withColumn(tmp, cume_dist().over(byValue))
      .withColumn(agg.alias, min(when(col(tmp) >= lit(p), col(agg.field))).over(whole))
      .drop(tmp)
  }
}
