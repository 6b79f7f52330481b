package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated testdata star schema
  * (TESTDATA.md). Plain `spark.read.parquet` — Catalyst handles column
  * pruning and predicate pushdown into the scan, so callers should
  * `.select(...)`/`.filter(...)` as early as possible and let the optimizer
  * push it down (verify with `.explain`: PushedFilters / ReadSchema).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  /** events.parquet stores TIMESTAMP(NANOS), which Spark 4 rejects outright;
    * read `ts` as epoch-nanos longs instead (lossless — the data is
    * µs-resolution). The legacy flag is scoped to this one read via a cloned
    * session so no global session state mutates as a query side effect. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(scoped, dir, "events")
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
