package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    try {
      val rules = Seq(
        ("a.com", Seq(("/a/1%", 10L), ("/a/1!%x%", 13L))),
        ("b.com", Seq.empty[(String, Long)])
      ).toDF("domain", "rules0")
        .select(col("domain"), expr(
          "transform(rules0, r -> named_struct('lp', r._1, 'rank', r._2)) AS rules"))
      val pages = Seq((1L, "a.com", "/a/1?id=1"), (2L, "a.com", "/a/1%xyz"),
        (3L, "b.com", "/z"), (4L, "c.com", "/q")).toDF("doc_id", "domain", "path")
      val j = pages.join(rules, Seq("domain"), "left")
        .withColumn("mr", expr(
          "array_max(transform(filter(rules, q -> path LIKE q.lp ESCAPE '!'), q -> q.rank))"))
        .withColumn("allowed", coalesce(col("mr") % 2 === 1, lit(true)))
      j.orderBy("doc_id").collect().foreach(r => println("PROBE " + r.mkString("|")))
    } catch { case e: Throwable => println("PROBE ERR " + e.toString.take(500)) }
    spark.stop()
  }
}
