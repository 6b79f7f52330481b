package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Evolution

/** The generation reader must reproduce a table format's schema-evolution
  * read semantics on plain parquet: renames from the explicit map, NULL
  * backfill for columns history predates, type widening to the current
  * schema, and silent discard of columns the current schema dropped. */
class EvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rename, null backfill, widen, and dropped columns compose") {
    val root = java.nio.file.Files.createTempDirectory("graft_evo").toFile
    try {
      val p = root.getAbsolutePath
      // gen0: the original era — `old_name`, an int id, and a `legacy`
      // column the current schema no longer carries
      Seq((1, "a", 9)).toDF("id", "old_name", "legacy")
        .write.parquet(s"$p/gen0")
      // gen1: renamed column arrives natively; score added as FLOAT
      Seq((2L, "b", 1.5f)).toDF("id", "name", "score")
        .write.parquet(s"$p/gen1")
      // gen2 (current): score widened to DOUBLE
      Seq((3L, "c", 2.5)).toDF("id", "name", "score")
        .write.parquet(s"$p/gen2")
      val out = Evolution.readEvolved(spark, Seq(
        s"$p/gen0" -> Map("old_name" -> "name"),
        s"$p/gen1" -> Map.empty[String, String],
        s"$p/gen2" -> Map.empty[String, String]))
      assert(out.columns.toSeq == Seq("id", "name", "score"),
        "current schema only — legacy dropped, nothing else reordered")
      assert(out.schema("id").dataType.typeName == "long" &&
        out.schema("score").dataType.typeName == "double",
        "every generation widens to the newest generation's types")
      val rows = out.collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).sortBy(_._1)
      assert(rows(0)._1 == 1L && rows(0)._2 == "a" && rows(0)._3.isNaN,
        "pre-score history NULL-backfills")
      assert(rows(1) == ((2L, "b", 1.5)) && rows(2) == ((3L, "c", 2.5)))
      // a single generation is just that generation
      assert(Evolution.readEvolved(spark,
        Seq(s"$p/gen2" -> Map.empty[String, String])).count() == 1)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }

  test("narrowing or incompatible casts fail loudly instead of corrupting history") {
    val root = java.nio.file.Files.createTempDirectory("graft_evo_narrow").toFile
    try {
      val p = root.getAbsolutePath
      // gen0 carries DOUBLE scores; the "current" schema narrowed to FLOAT
      Seq((1L, 2.5)).toDF("id", "score").write.parquet(s"$p/n0")
      Seq((2L, 1.5f)).toDF("id", "score").write.parquet(s"$p/n1")
      val e = intercept[IllegalArgumentException] {
        Evolution.readEvolved(spark, Seq(
          s"$p/n0" -> Map.empty[String, String],
          s"$p/n1" -> Map.empty[String, String])).collect()
      }
      assert(e.getMessage.contains("cannot widen"), e.getMessage)
      // incompatible: string history under an int current column
      Seq((1L, "abc")).toDF("id", "v").write.parquet(s"$p/i0")
      Seq((2L, 7)).toDF("id", "v").write.parquet(s"$p/i1")
      intercept[IllegalArgumentException] {
        Evolution.readEvolved(spark, Seq(
          s"$p/i0" -> Map.empty[String, String],
          s"$p/i1" -> Map.empty[String, String])).collect()
      }
      // the WIDENING direction (float history, double current) still reads
      assert(Evolution.readEvolved(spark, Seq(
        s"$p/n1" -> Map.empty[String, String],
        s"$p/n0" -> Map.empty[String, String])).count() == 2)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }
}
