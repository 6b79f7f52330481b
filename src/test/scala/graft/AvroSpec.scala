package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.Avro

class AvroSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): java.io.File =
    java.nio.file.Files.createTempDirectory("avro_spec").toFile

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  test("round trip: every supported type incl. nulls and binary, both codecs") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("n", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("ok", BooleanType), StructField("s", StringType),
      StructField("b", BinaryType)))
    val rows = Seq(
      Row(1L, 2, 3.5, 4.5f, true, "hello", Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    for (codec <- Seq("deflate", "null")) {
      val dir = tmpDir()
      try {
        Avro.write(df, dir.getAbsolutePath, codec)
        val back = Avro.read(spark, dir.getAbsolutePath, schema)
          .collect().sortBy(_.getLong(0))
        assert(back.length == 2)
        assert(back(0).getLong(0) == 1L && back(0).getInt(1) == 2 &&
          back(0).getDouble(2) == 3.5 && back(0).getFloat(3) == 4.5f &&
          back(0).getBoolean(4) && back(0).getString(5) == "hello" &&
          back(0).getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
        assert((1 to 6).forall(back(1).isNullAt))
      } finally rm(dir)
    }
  }

  test("read resolves by name: missing expected fields null, extra container fields ignored") {
    val dir = tmpDir()
    try {
      Avro.write(Seq((1L, "x", 9L)).toDF("doc_id", "text", "extra"),
        dir.getAbsolutePath)
      val expected = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("absent", StringType)))
      val got = Avro.read(spark, dir.getAbsolutePath, expected).collect().head
      assert(got.getLong(0) == 1L && got.getString(1) == "x" && got.isNullAt(2))
    } finally rm(dir)
  }

  test("corrupt container quarantines: garbage bytes contribute zero rows") {
    val dir = tmpDir()
    try {
      Avro.write(Seq((1L, "x")).toDF("doc_id", "text"), dir.getAbsolutePath)
      java.nio.file.Files.write(
        new java.io.File(dir, "part-99999.avro").toPath,
        "Obj not really avro".getBytes("UTF-8"))
      val got = Avro.read(spark, dir.getAbsolutePath, StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType))))
      assert(got.count() == 1) // only the valid container's row
    } finally rm(dir)
  }

  test("type-mismatched container quarantines whole-file; lossless promotions resolve") {
    val dir = tmpDir()
    try {
      // container A: text is a STRING where the reader expects LONG —
      // a valid Avro file with a disagreeing field type must contribute
      // zero rows (quarantine), not crash the job at the encoder
      Avro.write(Seq((1L, "not-a-long")).toDF("doc_id", "text"),
        new java.io.File(dir, "bad").getAbsolutePath)
      // container B: n is INT where the reader expects LONG/DOUBLE —
      // the lossless promotions must resolve
      Avro.write(Seq((2L, 7)).toDF("doc_id", "n"),
        new java.io.File(dir, "good").getAbsolutePath)
      val expectMismatch = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", LongType)))
      assert(Avro.read(spark,
        new java.io.File(dir, "bad").getAbsolutePath, expectMismatch).count() == 0)
      val expectWide = StructType(Seq(
        StructField("doc_id", LongType), StructField("n", LongType)))
      val wide = Avro.read(spark,
        new java.io.File(dir, "good").getAbsolutePath, expectWide).collect().head
      assert(wide.getLong(0) == 2L && wide.getLong(1) == 7L)
      val expectDouble = StructType(Seq(
        StructField("doc_id", LongType), StructField("n", DoubleType)))
      val dbl = Avro.read(spark,
        new java.io.File(dir, "good").getAbsolutePath, expectDouble).collect().head
      assert(dbl.getDouble(1) == 7.0)
    } finally rm(dir)
  }

  test("write commits via temp-and-rename: _SUCCESS stamped, no temp litter, read ignores markers") {
    val dir = tmpDir()
    try {
      Avro.write(Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text").repartition(2),
        dir.getAbsolutePath)
      val names = dir.listFiles().map(_.getName).toSet
      assert(names.contains("_SUCCESS"))
      assert(!names.exists(_.endsWith(".tmp")), s"temp litter left behind: $names")
      assert(names.count(_.matches("part-\\d{5}\\.avro")) >= 1)
      // hidden temp litter from a hypothetical failed attempt is invisible
      // to the reader (Spark's file index skips dot-files), as is _SUCCESS
      java.nio.file.Files.write(
        new java.io.File(dir, ".part-00007.avro.42.tmp").toPath,
        Array[Byte](1, 2, 3))
      val got = Avro.read(spark, dir.getAbsolutePath, StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType))))
      assert(got.count() == 2)
    } finally rm(dir)
  }

  test("unsupported column types are refused up front") {
    intercept[IllegalArgumentException] {
      Avro.avroSchemaJson(StructType(Seq(
        StructField("a", ArrayType(LongType)))))
    }
  }

  test("documents round trip is lossless on the real corpus slice") {
    val dir = tmpDir()
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      Avro.write(docs, dir.getAbsolutePath)
      val back = Avro.read(spark, dir.getAbsolutePath, docs.schema)
      assert(back.count() == docs.count())
      assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    } finally rm(dir)
  }
}
