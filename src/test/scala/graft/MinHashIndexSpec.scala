package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class MinHashIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): java.io.File =
    java.nio.file.Files.createTempDirectory("graft_mh_spec").toFile
  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog today"),
    (1L, "an entirely different sentence about spark window engines"),
    (2L, "yet another unrelated document mentioning parquet files")
  ).toDF("doc_id", "text")
  private val batch = Seq(
    (10L, "the quick brown fox jumps over the lazy dog today"), // exact dup → drop
    (11L, "completely novel content that matches nothing at all")
  ).toDF("doc_id", "text")

  test("index-backed probe matches the direct corpus path bit for bit") {
    val dir = tmp()
    try {
      Dedup.writeMinHashIndex(corpus, dir.getAbsolutePath,
        n = 3, numHashes = 16, bands = 16)
      val direct = Dedup.nearDupAgainstCorpus(batch, corpus,
        n = 3, numHashes = 16, bands = 16, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val viaIndex = Dedup.nearDupAgainstIndex(batch, dir.getAbsolutePath,
        threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(viaIndex == direct)
      assert(viaIndex.map(_._1) == Set(11L), "the exact dup must drop either way")
    } finally rm(dir)
  }

  test("the probe's parameters come from the manifest, not caller guesses") {
    val dir = tmp()
    try {
      // 4-gram index: the probe must verify with 4-grams too, or Jaccard
      // values (and thus the drop set near the threshold) diverge
      Dedup.writeMinHashIndex(corpus, dir.getAbsolutePath,
        n = 4, numHashes = 8, bands = 8)
      val direct = Dedup.nearDupAgainstCorpus(batch, corpus,
        n = 4, numHashes = 8, bands = 8, threshold = 0.5)
        .collect().map(_.getLong(0)).toSet
      val viaIndex = Dedup.nearDupAgainstIndex(batch, dir.getAbsolutePath,
        threshold = 0.5).collect().map(_.getLong(0)).toSet
      assert(viaIndex == direct)
    } finally rm(dir)
  }

  test("the probe reads persisted band keys and grams — corpus never re-signs") {
    val dir = tmp()
    try {
      Dedup.writeMinHashIndex(corpus, dir.getAbsolutePath)
      val plan = Dedup.nearDupAgainstIndex(batch, dir.getAbsolutePath)
        .queryExecution.executedPlan.toString
      assert(plan.contains("bands") && plan.contains("grams"),
        "probe must scan the index layout")
    } finally rm(dir)
  }
}
