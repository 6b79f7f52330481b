package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import org.apache.spark.sql.functions.col

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

  private val batch2 = Seq(
    (20L, "a second wave of documents arrives for continuous ingest"),
    (21L, "short doc"), // too short for 3-grams → grams row, no bands row
    (21L, "short doc")  // duplicate row — must collapse within the append
  ).toDF("doc_id", "text")

  test("two-batch append equals a one-shot rebuild, row for row") {
    val inc = tmp(); val full = tmp()
    try {
      Dedup.writeMinHashIndex(corpus, inc.getAbsolutePath,
        n = 3, numHashes = 16, bands = 16)
      Dedup.appendToMinHashIndex(batch, inc.getAbsolutePath)
      Dedup.appendToMinHashIndex(batch2, inc.getAbsolutePath)
      Dedup.writeMinHashIndex(
        corpus.unionAll(batch).unionAll(batch2.dropDuplicates("doc_id")),
        full.getAbsolutePath, n = 3, numHashes = 16, bands = 16)
      def bandRows(d: java.io.File) = {
        val df = spark.read.parquet(d.getAbsolutePath + "/bands")
        df.select(df.columns.sorted.map(col): _*).collect().map(_.toSeq).toSet
      }
      def gramRows(d: java.io.File) =
        spark.read.parquet(d.getAbsolutePath + "/grams")
          .collect().map(r => (r.getLong(0), r.getSeq[Long](1).sorted)).toSet
      assert(bandRows(inc) == bandRows(full))
      assert(gramRows(inc) == gramRows(full))
      // and a probe cannot tell the two layouts apart
      val probe = Seq((30L, "the quick brown fox jumps over the lazy dog today"),
        (31L, "a second wave of documents arrives for continuous ingest"),
        (32L, "nothing like anything indexed before now")).toDF("doc_id", "text")
      val a = Dedup.nearDupAgainstIndex(probe, inc.getAbsolutePath, 0.5)
        .collect().map(_.getLong(0)).toSet
      val b = Dedup.nearDupAgainstIndex(probe, full.getAbsolutePath, 0.5)
        .collect().map(_.getLong(0)).toSet
      assert(a == b && a == Set(32L),
        "both dups (one from the base corpus, one appended) must drop")

      // COMPACTION: the two appends fragmented bands/ and grams/ into
      // several files; compacting collapses each to the target count
      // with rows and probe results untouched
      def files(sub: String): Int = new java.io.File(inc, sub)
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(files("bands") > 2 && files("grams") > 2,
        s"appends should have fragmented the tables, got ${files("bands")}/${files("grams")}")
      Dedup.compactMinHashIndex(spark, inc.getAbsolutePath, outFiles = 2)
      assert(files("bands") == 2 && files("grams") == 2,
        s"expected 2 files per table after compaction, got ${files("bands")}/${files("grams")}")
      assert(bandRows(inc) == bandRows(full))
      assert(gramRows(inc) == gramRows(full))
      val aAfter = Dedup.nearDupAgainstIndex(probe, inc.getAbsolutePath, 0.5)
        .collect().map(_.getLong(0)).toSet
      assert(aAfter == Set(32L))
    } finally { rm(inc); rm(full) }
  }

  test("re-appending an already-indexed batch is a no-op") {
    val dir = tmp()
    try {
      Dedup.writeMinHashIndex(corpus, dir.getAbsolutePath,
        n = 3, numHashes = 16, bands = 16)
      Dedup.appendToMinHashIndex(batch2, dir.getAbsolutePath)
      def counts() = (
        spark.read.parquet(dir.getAbsolutePath + "/bands").count(),
        spark.read.parquet(dir.getAbsolutePath + "/grams").count())
      val before = counts()
      Dedup.appendToMinHashIndex(batch2, dir.getAbsolutePath)
      assert(counts() == before,
        "already-present doc_ids (including the bands-less short doc) must skip")
    } finally rm(dir)
  }

  test("append derives its parameters from the manifest") {
    val dir = tmp()
    try {
      // non-default geometry: an append that guessed the defaults would
      // band with 16/16 and the probe would diverge from the direct path
      Dedup.writeMinHashIndex(corpus, dir.getAbsolutePath,
        n = 4, numHashes = 8, bands = 8)
      Dedup.appendToMinHashIndex(batch2, dir.getAbsolutePath)
      val direct = Dedup.nearDupAgainstCorpus(batch,
        corpus.unionAll(batch2.dropDuplicates("doc_id")),
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

  test("delete == rebuild without the deleted docs; the vacated screen opens") {
    val dir = tmp()
    val rebuilt = tmp()
    try {
      // batch doc 10 is an exact dup of corpus doc 0 — its ONLY screen.
      // Retracting doc 0 must let it survive the probe.
      Dedup.writeMinHashIndex(corpus, dir.getAbsolutePath,
        n = 3, numHashes = 16, bands = 16)
      Dedup.deleteFromMinHashIndex(spark, dir.getAbsolutePath,
        Seq(0L).toDF("doc_id"), outFiles = 2)
      Dedup.writeMinHashIndex(corpus.filter(col("doc_id") =!= 0L),
        rebuilt.getAbsolutePath, n = 3, numHashes = 16, bands = 16)
      def bands(d: java.io.File) = spark.read
        .parquet(s"${d.getAbsolutePath}/bands").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.toSeq.mkString("|"))).toSet
      def grams(d: java.io.File) = spark.read
        .parquet(s"${d.getAbsolutePath}/grams").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.toSeq.mkString("|"))).toSet
      assert(bands(dir) == bands(rebuilt) && grams(dir) == grams(rebuilt))
      val survivors = Dedup.nearDupAgainstIndex(batch, dir.getAbsolutePath,
        threshold = 0.5).collect().map(_.getLong(0)).toSet
      assert(survivors == Set(10L, 11L),
        s"doc 10's only screen was retracted — it must survive, got $survivors")
      // deleting an absent id is a no-op
      Dedup.deleteFromMinHashIndex(spark, dir.getAbsolutePath,
        Seq(999L).toDF("doc_id"))
      assert(bands(dir) == bands(rebuilt) && grams(dir) == grams(rebuilt))
    } finally { rm(dir); rm(rebuilt) }
  }

  test("a delete that empties the whole index leaves it readable") {
    val dir = tmp()
    try {
      // retracting EVERY indexed doc must not strand a data-file-less
      // directory that later reads fail to schema-infer — the emptied
      // index stays readable (schema-carrying empty file) and appendable
      Dedup.writeMinHashIndex(corpus, dir.getAbsolutePath,
        n = 3, numHashes = 16, bands = 16)
      Dedup.deleteFromMinHashIndex(spark, dir.getAbsolutePath,
        corpus.select("doc_id"), outFiles = 2)
      assert(spark.read.parquet(s"${dir.getAbsolutePath}/bands").count() == 0)
      assert(spark.read.parquet(s"${dir.getAbsolutePath}/grams").count() == 0)
      // the emptied index screens nothing and still serves probes
      val survivors = Dedup.nearDupAgainstIndex(batch, dir.getAbsolutePath,
        threshold = 0.5).collect().map(_.getLong(0)).toSet
      assert(survivors == Set(10L, 11L))
      // and the lifecycle continues: an append repopulates it
      Dedup.appendToMinHashIndex(corpus.filter(col("doc_id") === 0L),
        dir.getAbsolutePath)
      val after = Dedup.nearDupAgainstIndex(batch, dir.getAbsolutePath,
        threshold = 0.5).collect().map(_.getLong(0)).toSet
      assert(after == Set(11L), "doc 10's screen is back after the append")
    } finally rm(dir)
  }

  test("minhash over the DISTINCT gram array is bit-identical to the raw one") {
    // the r22 single-tokenization probe derives band keys from the same
    // array_distinct'd gram-hash array the verifier joins on; that is sound
    // only because the signature is a per-seed MIN over gram hashes —
    // duplicates and order cannot change a minimum. Pin it on texts with
    // heavy gram repetition (so raw and distinct arrays genuinely differ).
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "a b c a b c a b c a b c"),          // every gram repeats 4x
      (1L, "x y z x y z w x y z"),
      (2L, "one two three four five six seven")  // all grams unique
    ).toDF("doc_id", "text")
    val words = split(col("text"), " ")
    val raw = graft.functions.HashFunctions.word_gram_hashes(words, 3)
    val sigs = docs.select(
      graft.functions.HashFunctions.minhash_signature(raw, 16).as("from_raw"),
      graft.functions.HashFunctions.minhash_signature(
        array_distinct(raw), 16).as("from_distinct"),
      reverse(array_distinct(raw)).as("rev"))
    val shuffled = sigs.select(col("from_raw"), col("from_distinct"),
      graft.functions.HashFunctions.minhash_signature(col("rev"), 16)
        .as("from_reversed"))
    shuffled.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        "distinct'd gram array must give the identical signature")
      assert(r.getSeq[Long](0) == r.getSeq[Long](2),
        "gram order must not matter either")
    }
  }
}
