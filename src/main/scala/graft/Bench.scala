package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one timed pass over every SparkEntry query at the
  * scale factor in SPARK_GRAFT_SF_DIR, emitting ONE JSON line. A small
  * untimed warmup first (parquet-reader + codegen infra init) so the first
  * query isn't charged for session spin-up. */
object Bench {
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
    // Two timed passes per query, min reported: the first pass pays one-off
    // JIT/codegen-compilation cost, the min is the steady-state number a
    // repeatedly-run production query would see. A pass that throws yields no
    // measurement — a crashed query reports the sentinel -1 and contributes
    // nothing to the total, so failures can't masquerade as fast runs.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          errors += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      name -> times.minOption.getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.result().distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
