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
    * µs-resolution). The legacy flag is scoped to a cloned session so no
    * global session state mutates as a query side effect. A set-then-restore
    * on the caller's conf would NOT work: the scan resolves the flag lazily
    * at execution, after the restore. The clone is built once per caller
    * session (SessionState construction isn't free) with the caller's
    * runtime confs copied at that moment — later runtime conf changes on the
    * caller intentionally don't propagate. */
  private val scopedSessions =
    new java.util.WeakHashMap[SparkSession, SparkSession]() // weak KEYS: a
  // retired caller session (and its clone — the clone refs the shared
  // SparkContext, not the caller) becomes collectable instead of pinned for
  // the JVM lifetime in a many-session process. Guarded by its own monitor:
  // WeakHashMap is not thread-safe and Map.computeIfAbsent's default impl
  // is not atomic on a synchronized wrapper either.

  /** NOTE on plan mixing: frames from the scoped clone are joined with
    * caller-session frames (q38). That is safe here — both sessions share
    * one SparkContext/SharedState, and a parquet relation captures its own
    * session at resolution — but it is not a supported Spark contract;
    * callers composing events() output with other sources should keep the
    * composition to relational operators as q38 does. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val scoped = scopedSessions.synchronized {
      val existing = scopedSessions.get(spark)
      if (existing != null) existing
      else {
        val x = spark.newSession()
        spark.conf.getAll.foreach { case (k, v) =>
          try x.conf.set(k, v) catch { case _: Exception => () } // static confs refuse runtime set
        }
        x.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        scopedSessions.put(spark, x)
        x
      }
    }
    // `ts` contract: epoch-NANOS BIGINT, whatever the file's physical type.
    // Generations of the testdata have shipped TIMESTAMP(NANOS) (read as
    // longs via the legacy flag above) and TIMESTAMP(MICROS,
    // isAdjustedToUTC=false) (read as TIMESTAMP_NTZ — the legacy flag only
    // covers NANOS). Normalizing here keeps every downstream query on the
    // long contract and matches the oracle's `epoch_ns(ts)`, which treats
    // the file's naive timestamps as UTC. The NTZ branch computes
    // epoch-of-wall-as-UTC from the WALL FIELDS alone (date diff + hour/
    // minute/second) — an NTZ value has no instant, and every wall-field
    // extraction is timezone-free, so the result is exact for ANY session
    // tz. (The previous cast-to-Timestamp → from_utc_timestamp roundtrip
    // was off by an hour for wall times inside a DST spring-forward gap
    // of the session zone: the cast resolves the nonexistent time by
    // shifting. Harmless under the pinned UTC sessions, but this form is
    // correct unconditionally.)
    val raw = table(scoped, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampNTZType =>
        // extract(SECOND) carries the fractional micros as DECIMAL(8,6)
        raw.withColumn("ts",
          (datediff(col("ts").cast(DateType), to_date(lit("1970-01-01")))
              .cast("long") * 86400000000L
            + hour(col("ts")).cast("long") * 3600000000L
            + minute(col("ts")).cast("long") * 60000000L
            + (expr("extract(SECOND FROM ts)") * lit(1000000)).cast("long"))
            * 1000L)
      case TimestampType =>
        raw.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case other =>
        throw new IllegalStateException(s"unsupported events.ts type: $other")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
