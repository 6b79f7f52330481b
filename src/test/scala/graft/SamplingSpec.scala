package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (0L until 2000L).map(i => (i, if (i % 4 == 0) "a" else "b"))
    .toDF("id", "grp")

  test("hash split is deterministic, stable, and near the requested fractions") {
    val s1 = Sampling.hashSplit(df, col("id")).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Sampling.hashSplit(df, col("id")).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
    assert(s1("train") > 1500 && s1("train") < 1700) // ~80% of 2000
    assert(s1.values.sum == 2000)
    // per-row assignment is a pure function of the key: subsetting can't move rows
    val subset = Sampling.hashSplit(df.filter($"id" < 100), col("id"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val full = Sampling.hashSplit(df, col("id"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(subset.forall { case (id, split) => full(id) == split })
  }

  test("stratified sample takes exactly k per stratum, deterministically") {
    val out = Sampling.stratifiedSample(df, "grp", col("id"), 7)
    val counts = out.groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 7, "b" -> 7))
    val again = Sampling.stratifiedSample(df, "grp", col("id"), 7)
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == again.collect().map(_.getLong(0)).sorted.toSeq)
    // pushes the limit below the shuffle
    assert(out.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }
}
