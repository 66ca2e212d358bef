package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** O-1..O-4: validated CSV ingestion into an append-only raw layer with
  * lineage columns.
  *
  * Reference: dags/file_ingestion_pipeline.py:35-94 +
  * operators/file_validation.py:14-36. Spark-first: validation inspects the
  * header/size up front (driver-side, cheap); the scan itself is a single
  * schema'd CSV read in PERMISSIVE mode with corrupt records preserved — the
  * batch analogue of the streaming DLQ (ST-7).
  */
object Ingest {

  final case class ValidationError(msg: String) extends RuntimeException(msg)

  /** O-1: probe an ordered list of candidate directories for each expected
    * file, returning the first hit per name (the reference's INPUT_DIR ->
    * bundled-assignment fallback, file_ingestion_pipeline.py:26-43).
    * Driver-side by nature: it inspects a handful of paths, not data. */
  def detectFiles(spark: SparkSession, dirs: Seq[String],
                  names: Seq[String]): Map[String, String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    names.flatMap { n =>
      dirs.iterator
        .map(d => new org.apache.hadoop.fs.Path(s"$d/$n"))
        .find(p => p.getFileSystem(conf).exists(p))
        .map(p => n -> p.toString)
    }.toMap
  }

  /** O-2: reject missing/oversized/header-broken files before reading data.
    * Returns unit or throws — mirrors FileValidationOperator's hard error.
    *
    * Single-line-header assumption: the probe reads exactly one PHYSICAL
    * line, so an RFC-4180 header with a quoted embedded newline would be
    * truncated mid-field and rejected here ([[splitCsvLine]] is quote-aware
    * only within a line). Fine for every known fixture; if such headers
    * appear, fall back to a spark.read.csv header parse when the probed
    * line ends inside an unterminated quote. */
  def validateFile(spark: SparkSession, path: String, requiredColumns: Seq[String],
                   maxSizeMb: Int = 25): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) throw ValidationError(s"missing file: $path")
    val len = fs.getFileStatus(p).getLen
    if (len > maxSizeMb.toLong * 1024 * 1024)
      throw ValidationError(s"file too large: $path ($len bytes > $maxSizeMb MB)")
    // header check reads ONE line via spark.read.text (a schema-inferring
    // spark.read.csv here costs a full type-inference scan per file; text +
    // head reads the first line only and still handles compression codecs
    // and directory paths)
    val headerLine = spark.read.text(path).head(1).headOption
      .map(_.getString(0)).getOrElse("")
    if (headerLine.trim.isEmpty) throw ValidationError(s"no header: $path")
    val header = splitCsvLine(stripBom(headerLine))
    val missing = requiredColumns.filterNot(header.contains)
    if (missing.nonEmpty)
      throw ValidationError(s"missing required columns in $path: ${missing.mkString(",")}")
  }

  private def stripBom(s: String): String =
    if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s

  /** Quote-aware split of one CSV line (RFC-4180 double-quote escaping). */
  private[graft] def splitCsvLine(line: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQ = false
        } else cur.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result().trim; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.result().trim
    out.toSeq
  }

  /** O-3: schema'd CSV scan; literal "NULL" strings become nulls (the
    * progress fixture uses them), corrupt rows land in _corrupt_record. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "NULL")
      .option("mode", "PERMISSIVE")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)
      .drop("_corrupt_record")

  /** O-3 + ST-7's batch analogue: split the scan into (good, dlq) — rows
    * whose raw line could not be parsed against the schema go to the DLQ
    * frame with their raw text, mirroring the streaming dlq.failed.events
    * topic. The parsed frame is cached because Spark disallows filtering a
    * CSV scan on only its internal corrupt-record column. */
  def readCsvWithDlq(spark: SparkSession, path: String,
                     schema: StructType): (DataFrame, DataFrame) = {
    val parsed = spark.read
      .option("header", "true")
      .option("nullValue", "NULL")
      .option("mode", "PERMISSIVE")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)
      .cache()
    val good = parsed.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val dlq = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_record"),
        lit(path).as("source_file"))
    (good, dlq)
  }

  /** JSON-lines scan with the same contract as [[readCsvWithDlq]]: explicit
    * schema, PERMISSIVE parse, (good, dlq) split. JSON is the other wire
    * format the reference handles (Kafka event payloads) — this is its
    * batch-file form. */
  def readJsonWithDlq(spark: SparkSession, path: String,
                      schema: StructType): (DataFrame, DataFrame) = {
    val parsed = spark.read
      .option("mode", "PERMISSIVE")
      .schema(schema.add("_corrupt_record", "string"))
      .json(path)
      .cache()
    val good = parsed.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val dlq = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_record"), lit(path).as("source_file"))
    (good, dlq)
  }

  /** O-4: lineage columns for the raw layer. file_row_number is a
    * per-file ordinal (used by D-1/D-2 as the deterministic "file order" —
    * orderless DataFrames need an explicit tiebreak, SURVEY §4.3). At scale
    * the window is per input file, so parallelism is bounded by file count;
    * CSV ingest order is only meaningful within a file anyway.
    */
  def withLineage(df: DataFrame, batchId: String): DataFrame = {
    val byFile = Window.partitionBy(input_file_name())
      .orderBy(monotonically_increasing_id())
    df.withColumn("file_name", regexp_extract(input_file_name(), "[^/]+$", 0))
      .withColumn("file_row_number", row_number().over(byFile))
      .withColumn("batch_id", lit(batchId))
  }

  /** Validated read + lineage in one go. */
  def ingest(spark: SparkSession, path: String, schema: StructType,
             required: Seq[String], batchId: String): DataFrame = {
    validateFile(spark, path, required)
    withLineage(readCsv(spark, path, schema), batchId)
  }
}
