package graft

import org.apache.spark.sql.SparkSession

/** Checkpoint-RECOVERY cost per mode, measured (r16 verdict #6): every
  * two-run restart fixture rebuilds from scratch under RocksDB CHANGELOG
  * checkpointing and again under snapshot-per-batch mode (the
  * [[SparkEntry.restartChangelogMode]] switch), and each fixture's own
  * `run_times.jsonl` yields the (run-1 ingest, run-2 resume) wall times —
  * run 2 is the restart: state recovery (changelog replay vs SST
  * download) plus the remaining batches, identical work in both modes
  * except the recovery path itself. Prints one JSON line per
  * (fixture, mode) and a combined array at the end; the BENCH_NOTES r17
  * recovery table is regenerated from it. Run on a QUIET box:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.RecoveryProbe /root/testdata/sf0.01"`.
  * Correctness is mode-independent (the oracles gate both paths); this
  * probe only prices them. */
object RecoveryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fixtures = Seq(
      "q207_streaming_pack_restart" -> "stream_q207",
      "q208_streaming_minhash_restart" -> "stream_q208",
      "q210_streaming_chat_restart" -> "stream_q210",
      "q211_streaming_funnel_restart" -> "stream_q211",
      "q213_streaming_join_restart" -> "stream_q213",
      "q215_streaming_upsert_restart" -> "stream_q215",
      "q250_streaming_full_outer_restart" -> "stream_q250")
    val wallRe = "\"wall_ms\":(\\d+)".r
    val out = Seq.newBuilder[String]
    try {
      // untimed warm-up: the first fixture of the first mode otherwise
      // pays whole-JVM JIT/codegen spin-up (measured: q207 run-1 read
      // 3.0 s cold vs 1.4 s warm — larger than any mode delta at this
      // scale), which would bias the first-run mode systematically
      SparkEntry.dropFixture(fixtures.head._2, dir)
      SparkEntry.queries(fixtures.head._1)(spark, dir).count()
      for (changelog <- Seq(true, false); (q, kind) <- fixtures) {
        SparkEntry.restartChangelogMode = changelog
        SparkEntry.dropFixture(kind, dir) // a cached fixture times nothing
        SparkEntry.queries(q)(spark, dir).count()
        val p = SparkEntry.fixturePath(kind, dir).getOrElse(
          sys.error(s"$kind did not build under $dir"))
        val src = scala.io.Source.fromFile(s"$p/run_times.jsonl")
        val ms = try src.getLines().toSeq.map(l =>
          wallRe.findFirstMatchIn(l).get.group(1).toLong) finally src.close()
        require(ms.length == 2,
          s"$kind: expected exactly 2 runs in run_times.jsonl, got ${ms.length}")
        val line = s"""{"fixture":"$kind","changelog":$changelog,""" +
          s""""run1_ingest_ms":${ms.head},"run2_resume_ms":${ms.last}}"""
        System.err.println(s"[recovery] $line")
        out += line
      }
    } finally SparkEntry.restartChangelogMode = true
    spark.stop()
    println(out.result().mkString("[", ",", "]"))
  }
}
