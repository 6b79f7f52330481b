package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Bucketed

/** The property that makes bucketing worth a write: joins on the bucket key
  * plan with NO Exchange on either side — the shuffle was paid once at write
  * time. Asserted on the physical plan, with results cross-checked against
  * the plain (shuffling) join. */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitioned layout prunes non-matching partitions at planning time") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
    val path = "/tmp/graft_part_docs"
    Bucketed.writePartitioned(docs, path, Seq("lang"))
    val filtered = spark.read.parquet(path).filter(col("lang") === "en")
    val p = filtered.queryExecution.executedPlan.toString
    // the lang predicate must land in PartitionFilters (directory pruning,
    // zero I/O for other languages), not in PushedFilters/post-scan Filter
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(p).isDefined, p.linesIterator.filter(_.contains("Filters")).mkString("\n"))
    val expected = docs.filter(col("lang") === "en").count()
    assert(filtered.count() == expected && expected > 0)
  }

  test("join of two tables bucketed on the key plans without any Exchange") {
    val dir = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$dir/orders.parquet").select("o_orderkey", "o_totalprice")
    val l = spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_quantity")
    Bucketed.writeBucketed(o, "bk_orders", Seq("o_orderkey"), 4, sortCols = Seq("o_orderkey"))
    Bucketed.writeBucketed(l, "bk_lineitem", Seq("l_orderkey"), 4, sortCols = Seq("l_orderkey"))
    // sf0.001 tables are broadcast-small, which would sidestep the layout
    // under test; at the 100 TB operating point neither fact side broadcasts
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.readBucketed(spark, "bk_orders")
        .join(Bucketed.readBucketed(spark, "bk_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"), first("o_totalprice"))
      val p = joined.queryExecution.executedPlan.toString
      // the join itself must consume the bucketed layout: no Exchange below
      // the SortMergeJoin (the groupBy also reuses the bucket partitioning,
      // so the WHOLE plan is exchange-free)
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), "bucketed join must not shuffle either side")
      // and the result equals the plain shuffling join
      val expected = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_orders")
      spark.sql("DROP TABLE IF EXISTS bk_lineitem")
    }
  }
}
