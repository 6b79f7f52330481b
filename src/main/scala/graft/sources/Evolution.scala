package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution reads over parquet GENERATIONS — the reality of a
  * 100 TB table written continuously for years: early partitions carry
  * the original schema, later ones add columns, rename them, or widen
  * types, and a consumer must read the whole history as ONE frame with
  * the CURRENT schema. Spark's `mergeSchema` only unions column sets;
  * it cannot rename (parquet stores no alias metadata) and widens only
  * a few numeric pairs — so the generation map here is the explicit,
  * reviewable contract a production table keeps next to its data
  * (exactly what a table format's schema-evolution log records; this
  * reproduces the read semantics on plain parquet directories).
  *
  * Semantics, per generation, in order:
  *  1. RENAMES apply (old name → current name) — the one operation the
  *     files cannot express;
  *  2. columns missing from the generation NULL-fill (added-column
  *     evolution: history has no values, and NULL is the only honest
  *     backfill);
  *  3. every column CASTS to the target type (type widening — float →
  *     double, int → long; the target is the LAST generation's schema,
  *     i.e. the table's current shape);
  *  4. columns the current schema dropped are discarded.
  *
  * 100 TB shape: each generation is one parquet scan with its own
  * pushdown/pruning; the union is plan-level (no shuffle, no
  * materialization), so reading N generations costs exactly N scans of
  * the projected columns. */
object Evolution {

  /** Read `generations` (path, renames) oldest-to-newest as one frame
    * under the NEWEST generation's schema. */
  def readEvolved(spark: SparkSession,
      generations: Seq[(String, Map[String, String])]): DataFrame = {
    require(generations.nonEmpty, "readEvolved needs at least one generation")
    val renamed = generations.map { case (path, renames) =>
      renames.foldLeft(spark.read.parquet(path)) {
        case (df, (from, to)) => df.withColumnRenamed(from, to)
      }
    }
    val target = renamed.last.schema
    renamed.zip(generations).map { case (df, (path, _)) =>
      val have = df.schema.map(f => f.name -> f.dataType).toMap
      df.select(target.map { f =>
        have.get(f.name) match {
          case Some(dt) =>
            // widening-only: evolution may ADD information (float →
            // double, int → long), never silently truncate or null it
            // (double → float, string → int). canUpCast is Spark's own
            // loss-free-cast judgment — the same rule its
            // store-assignment ANSI policy applies.
            require(dt == f.dataType ||
              org.apache.spark.sql.catalyst.expressions.Cast
                .canUpCast(dt, f.dataType),
              s"generation $path column ${f.name}: $dt cannot widen to " +
                s"${f.dataType} — a narrowing/incompatible cast would " +
                "silently corrupt history; fix the generation map")
            col(f.name).cast(f.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }.toSeq: _*)
    }.reduce(_ unionByName _)
  }
}
