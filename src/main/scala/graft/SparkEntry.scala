package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query runs through the graft library (WindowEngine / operators), not
  * raw ad-hoc Spark, and has a DuckDB-equivalent oracle in [[oracleSql]].
  * Column aliases match between the Spark result and the oracle SQL (the
  * driver's compare sorts columns by name before hashing).
  *
  * Determinism rules applied throughout (SURVEY.md §7 hard parts):
  *  - order-dependent functions (lead/lag/first/last/rank/row_number) always
  *    use a tie-free ORDER BY ending in the unique key (l_orderkey,
  *    l_linenumber);
  *  - float-sensitive aggregations run on integer-valued columns
  *    (l_quantity) or decimal casts so Spark's and DuckDB's different
  *    floating-point accumulation orders cannot diverge;
  *  - rank-family INT outputs are CAST in the oracle (DuckDB returns BIGINT,
  *    Spark IntegerType).
  */
object SparkEntry {

  /** Tie-free order for order-sensitive functions: price desc, then the
    * table's unique key. */
  private val tieFreeOrder = Seq(
    OrderSpec("l_extendedprice", SortDirection.Descending),
    OrderSpec("l_orderkey"),
    OrderSpec("l_linenumber"))

  private val tieFreeOrderSql =
    "l_extendedprice DESC, l_orderkey, l_linenumber"

  private def li(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      "l_orderkey", "l_linenumber", "l_returnflag", "l_suppkey",
      "l_extendedprice", "l_quantity", "l_shipdate")

  private val liOutCols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")

  /** One window query over lineitem partitioned by l_returnflag with the
    * tie-free order; selects the key columns + the aggregate aliases. */
  private def flagWindow(s: SparkSession, dir: String, aggs: Seq[AggregateSpec],
      frame: FrameSpec = FrameSpec(), order: Seq[OrderSpec] = tieFreeOrder,
      extraCols: Seq[String] = Seq.empty): DataFrame = {
    val spec = WindowQuerySpec(Seq("l_returnflag"), order, frame, aggs)
    WindowEngine.run(li(s, dir), spec)
      .select((liOutCols ++ extraCols ++ aggs.map(_.alias)).map(org.apache.spark.sql.functions.col): _*)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the full reference lifecycle: DSL parse → validate → window. */
  def entry(spark: SparkSession): DataFrame =
    queries("q17_dsl")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7 extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.2 the 14 window functions -------------------------------------
    "q01_rank" -> ((s, dir) => flagWindow(s, dir,
      Seq(AggregateSpec("rnk", WindowFn.Rank, "l_extendedprice")))),

    "q02_dense_rank" -> ((s, dir) => flagWindow(s, dir,
      Seq(AggregateSpec("dns_rnk", WindowFn.DenseRank, "l_extendedprice")))),

    "q03_percent_rank" -> ((s, dir) => flagWindow(s, dir,
      Seq(AggregateSpec("pct_rnk", WindowFn.PercentRank, "l_extendedprice")))),

    "q04_ntile" -> ((s, dir) => flagWindow(s, dir,
      Seq(AggregateSpec("tile", WindowFn.NTile, "l_quantity", Seq("4"))))),

    "q05_row_number" -> ((s, dir) => flagWindow(s, dir,
      Seq(AggregateSpec("rn", WindowFn.RowNumber, "l_extendedprice")))),

    "q06_median" -> ((s, dir) => flagWindow(s, dir,
      Seq(AggregateSpec("med", WindowFn.Median, "l_quantity")),
      extraCols = Seq("l_quantity"))),

    "q07_continuous_percentile" -> ((s, dir) => flagWindow(s, dir,
      Seq(AggregateSpec("cont_pct", WindowFn.ContinuousPercentile, "l_quantity", Seq("0.25"))),
      order = Seq.empty, // order NOT supported for CONTINUOUS_PERCENTILE (ref constraint)
      extraCols = Seq("l_quantity"))),

    "q08_discrete_percentile" -> ((s, dir) => flagWindow(s, dir,
      Seq(AggregateSpec("disc_pct", WindowFn.DiscretePercentile, "l_quantity", Seq("0.5"))),
      order = Seq(OrderSpec("l_quantity")),
      extraCols = Seq("l_quantity"))),

    "q09_lead" -> ((s, dir) => flagWindow(s, dir,
      Seq(AggregateSpec("next_price", WindowFn.Lead, "l_extendedprice", Seq("1"))))),

    "q10_lag" -> ((s, dir) => flagWindow(s, dir,
      Seq(AggregateSpec("prev_price", WindowFn.Lag, "l_extendedprice", Seq("2"))))),

    "q11_first" -> ((s, dir) => {
      val spec = WindowQuerySpec(Seq("l_suppkey"), tieFreeOrder,
        aggregates = Seq(AggregateSpec("frst", WindowFn.First, "l_extendedprice")))
      WindowEngine.run(li(s, dir), spec)
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice", "frst")
    }),

    "q12_last" -> ((s, dir) => {
      val spec = WindowQuerySpec(Seq("l_suppkey"), tieFreeOrder,
        frame = FrameSpec(FrameType.Row, unboundedPreceding = true, unboundedFollowing = true),
        aggregates = Seq(AggregateSpec("lst", WindowFn.Last, "l_extendedprice")))
      WindowEngine.run(li(s, dir), spec)
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice", "lst")
    }),

    "q13_cume_dist" -> ((s, dir) => flagWindow(s, dir,
      Seq(AggregateSpec("cume", WindowFn.CumulativeDistribution, "l_quantity")),
      order = Seq(OrderSpec("l_quantity")),
      extraCols = Seq("l_quantity"))),

    "q14_accumulate" -> ((s, dir) => {
      val spec = WindowQuerySpec(Seq("l_suppkey"),
        Seq(OrderSpec("l_shipdate"), OrderSpec("l_orderkey"), OrderSpec("l_linenumber")),
        aggregates = Seq(AggregateSpec("run_qty", WindowFn.Accumulate, "l_quantity")))
      WindowEngine.run(li(s, dir), spec)
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity", "run_qty")
    }),

    // ---- §2.1 frame clauses (ROW / RANGE, bounded + unbounded) ------------
    "q15_frame_rows" -> ((s, dir) => flagWindow(s, dir,
      Seq(AggregateSpec("qty_3row", WindowFn.Accumulate, "l_quantity")),
      frame = FrameSpec(FrameType.Row, preceding = Some(-2L), following = Some(0L)),
      extraCols = Seq("l_quantity"))),

    "q16_frame_range" -> ((s, dir) => flagWindow(s, dir,
      Seq(AggregateSpec("qty_range", WindowFn.Accumulate, "l_quantity")),
      frame = FrameSpec(FrameType.Range, preceding = Some(-5L), following = Some(0L)),
      order = Seq(OrderSpec("l_quantity")),
      extraCols = Seq("l_quantity"))),

    // ---- §2.3 the aggregate-spec DSL end to end ---------------------------
    "q17_dsl" -> ((s, dir) => {
      val out = WindowEngine.runDsl(li(s, dir),
        partitionFields = "l_returnflag",
        partitionOrder = "l_extendedprice:Descending,l_orderkey:Ascending,l_linenumber:Ascending",
        aggregates = "rnk:rank(l_extendedprice,,)\n" +
          "next_price:lead(l_extendedprice,1,)\n" +
          "run_qty:accumulate(l_quantity,,)")
      out.select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice",
        "l_quantity", "rnk", "next_price", "run_qty")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] = {
    val over = s"OVER (PARTITION BY l_returnflag ORDER BY $tieFreeOrderSql)"
    Map(
      "q01_rank" ->
        s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
           |CAST(rank() $over AS INT) AS rnk FROM lineitem""".stripMargin,

      "q02_dense_rank" ->
        s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
           |CAST(dense_rank() $over AS INT) AS dns_rnk FROM lineitem""".stripMargin,

      "q03_percent_rank" ->
        s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
           |CAST(percent_rank() $over AS REAL) AS pct_rnk FROM lineitem""".stripMargin,

      "q04_ntile" ->
        s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
           |CAST(ntile(4) $over AS INT) AS tile FROM lineitem""".stripMargin,

      "q05_row_number" ->
        s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
           |CAST(row_number() $over AS INT) AS rn FROM lineitem""".stripMargin,

      "q06_median" ->
        s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice, l_quantity,
           |quantile_cont(l_quantity, 0.5) $over AS med FROM lineitem""".stripMargin,

      "q07_continuous_percentile" ->
        """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice, l_quantity,
          |quantile_cont(l_quantity, 0.25) OVER (PARTITION BY l_returnflag) AS cont_pct
          |FROM lineitem""".stripMargin,

      "q08_discrete_percentile" ->
        """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice, l_quantity,
          |quantile_disc(l_quantity, 0.5) OVER (PARTITION BY l_returnflag) AS disc_pct
          |FROM lineitem""".stripMargin,

      "q09_lead" ->
        s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
           |lead(l_extendedprice, 1) $over AS next_price FROM lineitem""".stripMargin,

      "q10_lag" ->
        s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
           |lag(l_extendedprice, 2) $over AS prev_price FROM lineitem""".stripMargin,

      "q11_first" ->
        s"""SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
           |first_value(l_extendedprice) OVER
           |(PARTITION BY l_suppkey ORDER BY $tieFreeOrderSql) AS frst FROM lineitem""".stripMargin,

      "q12_last" ->
        s"""SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
           |last_value(l_extendedprice) OVER
           |(PARTITION BY l_suppkey ORDER BY $tieFreeOrderSql
           | ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lst
           |FROM lineitem""".stripMargin,

      "q13_cume_dist" ->
        """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice, l_quantity,
          |cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cume
          |FROM lineitem""".stripMargin,

      "q14_accumulate" ->
        """SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity,
          |sum(l_quantity) OVER
          |(PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS run_qty
          |FROM lineitem""".stripMargin,

      "q15_frame_rows" ->
        s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice, l_quantity,
           |sum(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY $tieFreeOrderSql
           | ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS qty_3row FROM lineitem""".stripMargin,

      "q16_frame_range" ->
        """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice, l_quantity,
          |sum(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
          | RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS qty_range FROM lineitem""".stripMargin,

      "q17_dsl" ->
        s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice, l_quantity,
           |CAST(rank() $over AS INT) AS rnk,
           |lead(l_extendedprice, 1) $over AS next_price,
           |sum(l_quantity) $over AS run_qty
           |FROM lineitem""".stripMargin,
    )
  }
}
