package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Bucketed

/** The z-order layout's value proposition, measured: after writing, every
  * file's min/max span must be SMALL on BOTH z-columns (that's what lets
  * parquet row-group stats skip I/O for predicates on either column), where
  * a plain single-column sort leaves the trailing column's per-file span at
  * ~the full range. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def avgSpan(dir: String, col0: String): Double = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length >= 4, s"expected several output files, got ${files.length}")
    val global = spark.read.parquet(dir)
      .agg(min(col0).cast("double"), max(col0).cast("double")).head()
    val width = global.getDouble(1) - global.getDouble(0)
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col0).cast("double"), max(col0).cast("double")).head()
      (r.getDouble(1) - r.getDouble(0)) / width
    }
    spans.sum / spans.length
  }

  test("z-order clusters BOTH columns; a plain sort leaves the trailing one unclustered") {
    val li = sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    // fresh dirs per run — fixed shared paths let stale part- files from an
    // aborted run inflate the avgSpan file list
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toFile.getAbsolutePath
    val sDir = java.nio.file.Files.createTempDirectory("graft_sorted").toFile.getAbsolutePath
    Bucketed.writeZOrdered(li, zDir, Seq("l_partkey", "l_suppkey"), bits = 8, outFiles = 8)
    li.repartitionByRange(8, col("l_partkey")).sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(sDir)

    // identical content, different layout
    assert(spark.read.parquet(zDir).count() == li.count())

    val zPart = avgSpan(zDir, "l_partkey"); val zSupp = avgSpan(zDir, "l_suppkey")
    val sPart = avgSpan(sDir, "l_partkey"); val sSupp = avgSpan(sDir, "l_suppkey")
    // the single-column sort nails its leading column...
    assert(sPart < 0.35, s"sorted layout should cluster l_partkey, span $sPart")
    // ...but leaves the trailing column at ~full range per file
    assert(sSupp > 0.85, s"sorted layout can't cluster l_suppkey, span $sSupp")
    // z-order clusters BOTH well below the unclustered baseline
    assert(zPart < 0.75, s"z-order span on l_partkey: $zPart")
    assert(zSupp < 0.75, s"z-order span on l_suppkey: $zSupp")
    assert(zSupp < sSupp - 0.1, "z-order must beat the sort on the trailing column")

    // THE SKIP, measured: a range predicate on the TRAILING column must be
    // answered from a fraction of the z-ordered row groups (parquet min/max
    // pruning against the pushed filter), while the plain sort — which left
    // l_suppkey at ~full range per file — surfaces every row group.
    val stats = li.agg(min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val (lo, hi) = (stats.getLong(0), stats.getLong(1))
    val (wLo, wHi) = (lo + (hi - lo) * 7 / 16, lo + (hi - lo) * 9 / 16) // central 1/8
    def pred(dir: String) = spark.read.parquet(dir)
      .filter(col("l_suppkey") >= wLo && col("l_suppkey") <= wHi)
      .select("l_quantity")
    // pushed-filter pin: the predicate must reach the parquet scan
    val explained = pred(zDir).queryExecution.executedPlan.toString
    assert(explained.contains("PushedFilters") &&
      explained.contains("GreaterThanOrEqual(l_suppkey") &&
      explained.contains("LessThanOrEqual(l_suppkey"),
      s"range predicate not pushed to the parquet scan:\n$explained")
    val total = li.count()
    val (zRows, zFiles) = Bucketed.scanStats(pred(zDir))
    val (sRows, sFiles) = Bucketed.scanStats(pred(sDir))
    assert(zFiles == 8 && sFiles == 8, s"both layouts list all files ($zFiles/$sFiles)")
    assert(sRows == total,
      s"sorted layout cannot skip on the trailing column: scanned $sRows of $total")
    // 0.6: file-boundary placement wobbles a row group's worth between runs
    // (range sampling); the contract is "roughly half skipped vs NONE skipped"
    assert(zRows <= total * 6 / 10,
      s"z-ordered layout must skip most row groups: scanned $zRows of $total")
  }
}
