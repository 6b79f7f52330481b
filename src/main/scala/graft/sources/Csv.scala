package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink matching the reference pipelines' file stages (the e2e
  * pipeline is CSV File source → WindowAggregation → CSV File sink,
  * WindowAggregation.feature:22-54; the example pipeline reads
  * semicolon-delimited CSV). Schema is declared, not inferred — inference
  * double-reads the data, which is wrong at scale and wrong for fidelity
  * (the reference's schemas are declared by the pipeline). */
object Csv {

  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def write(df: DataFrame, path: String, header: Boolean = true, delimiter: String = ","): Unit =
    df.write
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .mode("overwrite")
      .csv(path)
}
