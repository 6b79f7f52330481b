package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: timed passes over every SparkEntry query at the
  * scale factor in SPARK_GRAFT_SF_DIR, emitting ONE JSON line. A small
  * untimed warmup first (parquet-reader + codegen infra init) so the first
  * query isn't charged for session spin-up.
  *
  * Per query: THREE timed passes, min reported (the steady-state number a
  * repeatedly-run production query would see; pass 1 pays one-off
  * JIT/codegen compilation) plus the max in "spread" — the sandbox's
  * documented 2–4× timing noise makes a single sample unattributable, and
  * the min-vs-max spread is the evidence line for calling a per-round delta
  * noise rather than a regression.
  *
  * Extra sections beyond the driver's required keys:
  *  - "lsh_prod": measured candidate volume of the q52 production LSH
  *    operating point as a fraction of n(n-1)/2, at b=16 and (for the
  *    corpus-dependence story) b=8 — the number that decides whether the
  *    equi-join LSH shape is winning; and
  *  - "heavy_tail": the shuffle-heavy queries re-run at a 10× smaller SF so
  *    constant-vs-linear cost (CC per-round overhead vs data volume) is a
  *    measurement, not an assertion.
  */
object Bench {
  private val heavyTail = Seq(
    "q21_dedup_ngram_jaccard", "q41_dedup_clusters", "q46_dedup_lsh_clusters",
    "q47_embed_neardup_lsh", "q52_embed_neardup_lsh_prod", "q53_dedup_minhash_prod",
    "q61_pipeline_e2e")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch the parquet reader, shuffle machinery, and codegen once
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    val errors = Seq.newBuilder[String]
    def time(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String, passes: Int): Seq[Double] =
      (1 to passes).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, dir).count(); Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          errors += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }

    // A query that crashes on every pass reports the sentinel -1 and
    // contributes nothing to the total, so failures can't masquerade as fast.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = time(name, fn, sfDir, passes = 3)
      (name, times.minOption.getOrElse(-1.0), times.maxOption.getOrElse(-1.0))
    }
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (k, v, _) => k -> v })
    val spread = jmap(results.map { case (k, _, mx) => k -> mx })
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum

    // candidate-volume instrumentation for the production LSH point (q52) —
    // the fixture derivation is cached across its three actions (count +
    // two candidate probes) so instrumentation doesn't re-run the
    // union/self-join derivation per action
    val lshProd = try {
      val demb = SparkEntry.derivedEmbeddings(spark, sfDir).cache()
      try {
        val n = demb.count().toDouble
        val possible = n * (n - 1) / 2
        val c16 = operators.Similarity.lshNearDupCandidates(demb, 16, 14).count()
        val c8 = operators.Similarity.lshNearDupCandidates(demb, 8, 14).count()
        f"""{"n":${n.toLong},"candidates_b16":$c16,"ratio_b16":${c16 / possible}%.6f,""" +
          f""""candidates_b8":$c8,"ratio_b8":${c8 / possible}%.6f}"""
      } finally demb.unpersist(blocking = false)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] lsh_prod instrumentation failed: ${e.getMessage}")
      "{}"
    }

    // heavy tail at the sibling 10×-smaller SF for scale-growth attribution.
    // Error labels carry the sibling dir suffix: a failure HERE must not
    // read as a crashed main-SF query (the top-level "queries" contract).
    val smallDir = sfDir.replaceAll("sf0\\.1/?$", "sf0.01")
    val heavy = if (smallDir != sfDir && new java.io.File(smallDir).isDirectory) {
      val hq = heavyTail.flatMap(n => SparkEntry.queries.get(n).map(n -> _)).map {
        case (name, fn) =>
          name -> time(s"$name@sf0.01", fn, smallDir, passes = 3).minOption.getOrElse(-1.0)
      }
      s"""{"dir":"$smallDir","queries":${jmap(hq)}}"""
    } else "{}"

    val errJson = errors.result().distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""spread":$spread,"lsh_prod":$lshProd,"heavy_tail":$heavy,""" +
      s""""errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
