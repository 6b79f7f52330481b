package graft.sources

import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Apache Avro OBJECT-CONTAINER source/sink (Avro spec §"Object Container
  * Files") built directly on the avro-core library the Spark distribution
  * ships — the spark-avro CONNECTOR is not on this classpath, so this is
  * the [[Warc]] posture: a real interchange container handled a FILE per
  * task. Avro is the de-facto row-interchange format of Kafka/ingest
  * land, so a crawl pipeline meets it at the front door.
  *
  * Supported column types (both directions): LONG, INT, DOUBLE, FLOAT,
  * BOOLEAN, STRING, BINARY — nullable via Avro's union-with-null, the
  * same convention the reference's schema system uses
  * (WindowAggregation.java:178-179). The reader takes the EXPECTED Spark
  * schema and resolves container fields BY NAME (extra container fields
  * ignored, missing ones null, wider-but-lossless container types
  * promoted — int→long, int→double, float→double); a file that is not a
  * valid Avro container, OR whose field types don't resolve to the
  * expected schema, contributes ZERO rows — the corrupt-input quarantine
  * posture every source here shares (JSONL bad lines, WARC resync).
  *
  * Scale notes: one container per task on both paths (binaryFile read —
  * no record splitting, the WARC trade: container formats parallelize
  * across FILES); the deflate codec's Deflaters live inside avro's
  * writer and are released by `close()` in the finally. Schemas travel
  * as JSON strings (avro Schema objects are not serialization-friendly
  * across executors).
  */
object Avro {

  private def avroType(dt: DataType): org.apache.avro.Schema = {
    import org.apache.avro.Schema.{create, Type => AT}
    dt match {
      case LongType => create(AT.LONG)
      case IntegerType => create(AT.INT)
      case DoubleType => create(AT.DOUBLE)
      case FloatType => create(AT.FLOAT)
      case BooleanType => create(AT.BOOLEAN)
      case StringType => create(AT.STRING)
      case BinaryType => create(AT.BYTES)
      case other =>
        throw new IllegalArgumentException(s"unsupported Avro column type: $other")
    }
  }

  /** Avro record schema for a Spark struct: every field nullable via
    * union(null, T) — the Avro spelling of Spark's nullable columns. */
  private[graft] def avroSchemaJson(schema: StructType): String = {
    import org.apache.avro.Schema.{create, createRecord, createUnion, Field, Type => AT}
    val fields = new java.util.ArrayList[Field]()
    schema.fields.foreach { f =>
      val u = createUnion(java.util.Arrays.asList(
        create(AT.NULL), avroType(f.dataType)))
      fields.add(new Field(f.name, u, null, Field.NULL_DEFAULT_VALUE))
    }
    createRecord("GraftRecord", null, "graft", false, fields).toString
  }

  /** Write `df` as one `part-NNNNN.avro` container per partition.
    * `codec`: "deflate" (level 6) or "null".
    *
    * Commit protocol (task-level, the classic temp-and-rename): each task
    * streams into a HIDDEN `.part-NNNNN.avro.<attemptId>.tmp` and renames
    * to the final name only after its container closed cleanly, so a
    * failed/interrupted attempt leaves only hidden temp litter (which
    * Spark's file index ignores on read) and a speculative or zombie
    * second attempt loses the rename race and deletes its own temp
    * instead of corrupting the winner's bytes. The driver stamps
    * `_SUCCESS` after the action returns — a directory without the marker
    * is an incomplete write, distinguishable from complete output. */
  def write(df: DataFrame, path: String, codec: String = "deflate"): Unit = {
    require(codec == "deflate" || codec == "null",
      s"codec must be 'deflate' or 'null', got $codec")
    val spark = df.sparkSession
    val schemaJson = avroSchemaJson(df.schema)
    val nFields = df.schema.length
    val outDir = new org.apache.hadoop.fs.Path(path)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs0 = outDir.getFileSystem(conf.value)
    if (fs0.exists(outDir)) fs0.delete(outDir, true)
    fs0.mkdirs(outDir)
    val dirStr = outDir.toString
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        val pid = TaskContext.getPartitionId()
        val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
        val fs = new org.apache.hadoop.fs.Path(dirStr)
          .getFileSystem(conf.value)
        val tmp = new org.apache.hadoop.fs.Path(dirStr,
          f".part-$pid%05d.avro.$attempt.tmp")
        val fin = new org.apache.hadoop.fs.Path(dirStr, f"part-$pid%05d.avro")
        val fsOut = fs.create(tmp, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        if (codec == "deflate") w.setCodec(CodecFactory.deflateCodec(6))
        w.create(schema, fsOut) // w.close() closes fsOut too
        var completed = false
        try {
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < nFields) {
              rec.put(i, row.get(i) match {
                case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
                case v => v
              })
              i += 1
            }
            w.append(rec)
          }
          completed = true
        } finally {
          w.close()
          // commit only a cleanly-closed container; on rename-race loss
          // (another attempt already published) drop this attempt's bytes
          if (!completed || !fs.rename(tmp, fin)) fs.delete(tmp, false)
          ()
        }
      }
    }
    fs0.create(new org.apache.hadoop.fs.Path(outDir, "_SUCCESS"), true).close()
  }

  /** Read `.avro` containers under `path` into rows of `schema` —
    * container fields resolve BY NAME; unreadable containers contribute
    * zero rows (quarantine). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import spark.implicits._
    val schemaFields = schema.fields.map(f => (f.name, f.dataType))
    val rows = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        try {
          val in = new DataFileStream[GenericRecord](
            new java.io.ByteArrayInputStream(bytes),
            new GenericDatumReader[GenericRecord]())
          try {
            val out = Seq.newBuilder[Row]
            while (in.hasNext) {
              val rec = in.next()
              out += Row.fromSeq(schemaFields.toSeq.map { case (name, dt) =>
                val f = rec.getSchema.getField(name)
                if (f == null) null
                else fromAvro(rec.get(f.pos()), dt)
              })
            }
            out.result()
          } finally in.close()
        } catch { case _: Exception => Seq.empty[Row] }
      }(Encoders.row(schema))
    rows.toDF()
  }

  /** Expected-type-driven decode: every (DataType, container value) pair is
    * either the exact type, one of the LOSSLESS Avro schema-resolution
    * promotions (int→long, int→double, float→double — the subset of the
    * spec's promotion table that loses no bits), or a container-type
    * mismatch that THROWS — inside read()'s per-file try, so a valid Avro
    * file whose field types disagree with the expected schema quarantines
    * to zero rows like a corrupt container, instead of smuggling a
    * mistyped Row past the encoder and failing the whole job. */
  private def fromAvro(v: AnyRef, dt: DataType): Any = (dt, v) match {
    case (_, null) => null
    case (StringType, u: org.apache.avro.util.Utf8) => u.toString
    case (StringType, s: java.lang.String) => s
    case (BinaryType, b: java.nio.ByteBuffer) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (BinaryType, a: Array[Byte]) => a
    case (LongType, l: java.lang.Long) => l
    case (LongType, i: java.lang.Integer) => i.longValue()
    case (IntegerType, i: java.lang.Integer) => i
    case (DoubleType, d: java.lang.Double) => d
    case (DoubleType, i: java.lang.Integer) => i.doubleValue()
    case (DoubleType, f: java.lang.Float) => f.doubleValue()
    case (FloatType, f: java.lang.Float) => f
    case (BooleanType, b: java.lang.Boolean) => b
    case (edt, other) => throw new IllegalArgumentException(
      s"container type ${other.getClass.getSimpleName} does not resolve to $edt")
  }
}
