package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** The persisted IVF index must (1) answer probes identically to a fresh
  * ivfTopK run — same seeding, same tie-breaks — and (2) actually prune:
  * the cells scan lists only the probed cell directories, which is the
  * planning-time I/O contract the layout exists for. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("index probe == fresh ivfTopK, and unprobed cell directories are pruned") {
    val emb = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toFile.getAbsolutePath
    Similarity.writeIvfIndex(emb, dir, nCells = 16)

    val queryIds = (0L until 10L)
    val fresh = Similarity.ivfTopK(emb, queryIds, k = 5, nCells = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    val viaIndex = Similarity.ivfTopKFromIndex(spark, dir,
      emb.filter(col("vec_id").isin(queryIds: _*)), k = 5, nProbe = 4)
    val got = viaIndex.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    assert(got.nonEmpty && got.toSeq == fresh.toSeq)

    // pruning pin: the cells scan carries a partition filter on `cell` and
    // the scanned file set excludes at least one of the 16 directories
    // (10 queries × 4 probes can touch at most 40 cells, typically far
    // fewer distinct ones)
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition filter on the cells scan:\n$plan")
    val allCells = new java.io.File(s"$dir/cells").listFiles()
      .count(_.getName.startsWith("cell="))
    val probed = Similarity.ivfTopKFromIndex(spark, dir,
      emb.filter(col("vec_id") === 0L), k = 5, nProbe = 2)
    // files counts BOTH scans (1 centroid file + probed cell files): a
    // one-query nProbe=2 probe must still touch far fewer than 16 dirs
    val (_, files) = sources.Bucketed.scanStats(probed)
    assert(allCells == 16, s"expected 16 cell dirs, found $allCells")
    assert(files < allCells,
      s"single-query nProbe=2 probe should read fewer than all $allCells cells, read $files")
  }

  test("append: probe-all equals brute force over the union; re-append is idempotent") {
    val emb = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toFile.getAbsolutePath
    val base = emb.filter(col("vec_id") % 4 =!= 1)
    val batch = emb.filter(col("vec_id") % 4 === 1)
    Similarity.writeIvfIndex(base, dir, nCells = 16)
    val baseRows = spark.read.parquet(s"$dir/cells").count()
    Similarity.appendToIvfIndex(batch, dir)
    val total = spark.read.parquet(s"$dir/cells").count()
    assert(baseRows == base.count() && total == emb.count())

    // probe-all over the appended layout == exhaustive search over the
    // UNION — the append lost no vector and assigned each to a scannable
    // cell of the frozen-centroid layout
    val qids = 0L until 10L
    val brute = Similarity.bruteForceTopK(emb, qids, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val probed = Similarity.ivfTopKFromIndex(spark, dir,
      emb.filter(col("vec_id").isin(qids: _*)), k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(probed.nonEmpty && probed.toSeq == brute.toSeq)

    // re-appending the same batch adds nothing (id-keyed anti-join)
    Similarity.appendToIvfIndex(batch, dir)
    assert(spark.read.parquet(s"$dir/cells").count() == total)

    // COMPACTION: the append fragmented at least one cell into several
    // files; compacting collapses every cell to exactly ONE file while
    // rows and probe results are untouched
    def cellFiles: Map[String, Int] = new java.io.File(s"$dir/cells")
      .listFiles().filter(_.getName.startsWith("cell=")).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(cellFiles.values.exists(_ > 1),
      s"append should have fragmented some cell, got $cellFiles")
    Similarity.compactIvfIndex(spark, dir)
    val after = cellFiles
    assert(after.values.forall(_ == 1), s"expected one file per cell, got $after")
    assert(spark.read.parquet(s"$dir/cells").count() == total)
    val probedAfter = Similarity.ivfTopKFromIndex(spark, dir,
      emb.filter(col("vec_id").isin(qids: _*)), k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(probedAfter.toSeq == brute.toSeq)
  }

  test("delete: probe-all equals brute force over survivors; touched cells only") {
    val emb = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_del").toFile.getAbsolutePath
    Similarity.writeIvfIndex(emb, dir, nCells = 16)
    val doomed = emb.filter(col("vec_id") % 9 === 4).select("vec_id")
    val keep = emb.filter(col("vec_id") % 9 =!= 4)
    // which cells hold a doomed vector — the only dirs allowed to change
    val cells = spark.read.parquet(s"$dir/cells")
    val doomedCells = cells.join(doomed, Seq("vec_id"), "left_semi")
      .select(col("cell").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    def fileNames(c: Long): Set[String] =
      new java.io.File(s"$dir/cells/cell=$c").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val allCellIds = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
      .map(_.getName.stripPrefix("cell=").toLong)
    val untouchedCell = allCellIds.find(!doomedCells.contains(_))
    val before = untouchedCell.map(fileNames)
    Similarity.deleteFromIvfIndex(spark, dir, doomed)
    // rows: exactly the survivors; untouched cell dirs kept their files
    assert(spark.read.parquet(s"$dir/cells").count() == keep.count())
    assert(spark.read.parquet(s"$dir/cells")
      .join(doomed, Seq("vec_id"), "left_semi").count() == 0)
    untouchedCell.foreach(c => assert(fileNames(c) == before.get,
      s"untouched cell $c must keep its files"))
    // probe-all == brute force over ONLY the survivors; a deleted id
    // queries fine but never appears as a neighbor
    val qids = 0L until 10L
    val brute = Similarity.bruteForceTopK(keep, qids.filter(_ % 9 != 4), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val deletedQ = Similarity.ivfTopKFromIndex(spark, dir,
      emb.filter(col("vec_id").isin(qids: _*)), k = 5, nProbe = 16)
    val probed = deletedQ.filter(col("q_id") % 9 =!= 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(probed.nonEmpty && probed.toSeq == brute.toSeq)
    assert(deletedQ.filter(col("n_id") % 9 === 4).count() == 0,
      "a deleted vector must never appear as a neighbor")
    // deleting absent ids is a no-op
    import spark.implicits._
    Similarity.deleteFromIvfIndex(spark, dir, Seq(999999L).toDF("vec_id"))
    assert(spark.read.parquet(s"$dir/cells").count() == keep.count())
  }

  test("PQ: deterministic, recovers every planted duplicate, exact-integer ordering") {
    // the raw synthetic embeddings carry no neighborhood structure (max
    // pairwise cosine 0.48 at sf0.001 — top-k there is noise, which no
    // quantizer can rank), so recall is pinned on the derived fixture's
    // PLANTED structure: an exact copy quantizes to the SAME m codes as
    // its original, giving the minimal possible ADC distance — PQ must
    // surface every planted twin
    val emb = SparkEntry.derivedEmbeddings(spark, "/root/testdata/sf0.001")
    val qids = (0L until 50L by 5) // originals whose +10M exact copies exist
    def run() = Similarity.pqTopKSeeded(emb, qids, k = 5, m = 4, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val a = run()
    assert(a.toSeq == run().toSeq, "PQ ranking must be run-deterministic")
    assert(a.length == qids.size * 5)
    val top = a.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    qids.foreach(q =>
      assert(top(q).contains(q + 10000000L), s"query $q lost its planted twin"))
    // ADC distances are integer micro-units: ties and sums are exact, so
    // ranks within a query are strictly ordered by (dist, n_id)
    a.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(t => (t._3, t._2)).toSeq == rows.map(t => (t._3, t._2)).sorted.toSeq)
    }
  }

  test("IVF-PQ: probe-all degenerates to plain PQ; pruning never loses a planted twin") {
    val emb = SparkEntry.derivedEmbeddings(spark, "/root/testdata/sf0.001")
    val qids = (0L until 50L by 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted.toSeq
    // nProbe = nCells: every cell probed → every candidate scored → the
    // composition is provably plain PQ, bit-for-bit
    val plain = rows(Similarity.pqTopKSeeded(emb, qids, k = 5, m = 4, ksub = 16))
    val all = rows(Similarity.ivfPqTopKSeeded(emb, qids, k = 5,
      nCells = 16, nProbe = 16, m = 4, ksub = 16))
    assert(all.nonEmpty && all == plain, "probe-all IVF-PQ must equal plain PQ exactly")
    // nProbe ≪ nCells: an exact copy lands in the SAME cell as its original
    // (identical vector → identical centroid argmax), and the original's own
    // cell is always among its probes (cos(q, cell(q)) is maximal), so the
    // planted twin is never pruned at any nProbe ≥ 1
    val pruned = Similarity.ivfPqTopKSeeded(emb, qids, k = 5,
      nCells = 16, nProbe = 2, m = 4, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val top = pruned.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    qids.foreach(q =>
      assert(top(q).contains(q + 10000000L), s"nProbe=2 pruned query $q's planted twin"))
  }
}
