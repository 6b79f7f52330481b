package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Orc, Tables}

/** ORC corpus round-trip plus the scale properties that justify the format:
  * column pruning and predicate pushdown must reach the ORC scan exactly as
  * they do for parquet. */
class OrcPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("orc sink → source round-trips a corpus bit-for-bit with bloom-indexed keys") {
    val dir = Files.createTempDirectory("graft_orc").toFile
    val docs = Tables.documents(spark, sfDir)
    Orc.write(docs, s"$dir/docs", bloomFilterColumns = Seq("doc_id"))
    val back = Orc.read(spark, s"$dir/docs")
    assert(back.schema == docs.schema) // self-describing: types survive exactly
    val a = docs.collect().map(_.toSeq).sortBy(_.toString())
    val b = back.collect().map(_.toSeq).sortBy(_.toString())
    assert(a.sameElements(b))
  }

  test("filters and projections push down to the ORC scan") {
    val dir = Files.createTempDirectory("graft_orc_pd").toFile
    Orc.write(Tables.documents(spark, sfDir), s"$dir/docs")
    val q = Orc.read(spark, s"$dir/docs")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 100)
      .select("doc_id", "lang")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]"),
      p.linesIterator.filter(_.contains("Pushed")).mkString)
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read == "doc_id:bigint,lang:string", s"scan must prune to the projection, got: $read")
    assert(q.count() == 100)
  }

  test("an operator runs over the ORC source unchanged (format-agnostic plans)") {
    val dir = Files.createTempDirectory("graft_orc_op").toFile
    Orc.write(Tables.documents(spark, sfDir), s"$dir/docs")
    val viaOrc = operators.TextAnalysis.vocabulary(Orc.read(spark, s"$dir/docs"), minCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val viaParquet = operators.TextAnalysis.vocabulary(Tables.documents(spark, sfDir), minCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(viaOrc == viaParquet)
  }
}
