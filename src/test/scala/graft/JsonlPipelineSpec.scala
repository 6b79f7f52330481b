package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Jsonl

/** JSONL corpus round-trip: source → text-pipeline operator → sink → read
  * back, plus the corrupt-line quarantine contract (the property that makes
  * PERMISSIVE the right default for crawled corpora). */
class JsonlPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("jsonl source → redaction → jsonl sink round-trips; corrupt lines quarantine") {
    val dir = Files.createTempDirectory("graft_jsonl").toFile
    val in = s"$dir/in.jsonl"
    Files.writeString(java.nio.file.Path.of(in),
      """{"doc_id": 1, "text": "mail alice@corp.io now"}
        |{"doc_id": 2, "text": "clean document"}
        |{"doc_id": 3, "text": "truncated
        |not json at all
        |{"doc_id": 4, "text": "last one"}
        |""".stripMargin)

    // quarantine view: clean rows null _corrupt_record, bad lines keep it
    val all = Jsonl.readWithCorrupt(spark, in, schema).collect()
    assert(all.length == 5)
    val corrupt = all.filter(r => r.getAs[String](Jsonl.corruptCol) != null)
    assert(corrupt.length == 2)
    assert(corrupt.map(_.getAs[String](Jsonl.corruptCol)).toSet ==
      Set("""{"doc_id": 3, "text": "truncated""", "not json at all"))

    // clean read drops the bad lines and the quarantine column
    val clean = Jsonl.read(spark, in, schema)
    assert(clean.columns.toSeq == Seq("doc_id", "text"))
    assert(clean.count() == 3)

    // operator over the source, sink, read back
    Jsonl.write(operators.TextAnalysis.redactPii(clean), s"$dir/out")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text_redacted", StringType),
      StructField("n_redactions", IntegerType)))
    val back = Jsonl.read(spark, s"$dir/out", outSchema).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(back == Map(
      1L -> ("mail <EMAIL> now", 1),
      2L -> ("clean document", 0),
      4L -> ("last one", 0)))

    // a declared schema may not claim the quarantine column
    val e = intercept[IllegalArgumentException] {
      Jsonl.readWithCorrupt(spark, in, schema.add(StructField(Jsonl.corruptCol, StringType)))
    }
    assert(e.getMessage.contains(Jsonl.corruptCol))
  }
}
