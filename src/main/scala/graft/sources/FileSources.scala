package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format interchange (SURVEY §2.1 surface beyond the parquet
  * fixtures): JSONL, CSV and ORC readers/writers, so a reference user's
  * data can enter and leave the engine in the common exchange formats
  * without a separate conversion step.
  *
  * Scale rules baked in, not left to the caller:
  *  - readers REQUIRE an explicit schema: CSV `inferSchema` / JSON schema
  *    sampling scan the whole input once BEFORE the real job — a full
  *    extra pass over 100 TB that also locks in whatever the sample
  *    guessed. Schemas are code, not inference.
  *  - `mode = FAILFAST`: the default PERMISSIVE mode nulls malformed
  *    rows silently — an analytics result quietly computed over a
  *    partially-parsed corpus is worse than a loud failure. Callers who
  *    want quarantine semantics opt in explicitly via
  *    `columnNameOfCorruptRecord` on their own reader.
  *  - text formats are splittable UNCOMPRESSED (and under bzip2); gzip
  *    input is one-task-per-file — at 100 TB that is a cluster of idle
  *    executors behind a handful of stuck tasks. Prefer many medium
  *    files or a splittable codec.
  *  - CSV is for FLAT scalar tables only: no nested/array columns, and
  *    embedded newlines force `multiLine`, which kills splittability.
  *    Text-bearing or nested tables (documents, embeddings) belong in
  *    JSONL/ORC/parquet.
  */
object FileSources {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("mode", "FAILFAST").csv(path)

  /** Streaming landing-zone ingest: JSONL files appearing under `path`
    * become micro-batches — the standard continuous-ingestion pattern
    * for a training-data pipeline (upstream jobs drop files; the
    * curation stream — e.g. [[graft.streaming.StreamCurate]] — consumes
    * them). Same schema/FAILFAST rules as the batch reader;
    * `maxFilesPerTrigger` bounds micro-batch size so one giant drop
    * cannot stall the trigger cadence.
    */
  def readJsonlStream(spark: SparkSession, path: String, schema: StructType,
                      maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream.schema(schema)
      .option("mode", "FAILFAST")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Parquet with an optional hive-style directory layout
    * (`layoutCols`) — the columnar interchange for sharded delivery
    * ([[graft.ext.TrainSet.exportShards]]): consumers prune whole
    * shard directories from the path alone, no footer reads.
    */
  def writeParquet(df: DataFrame, path: String,
                   layoutCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (layoutCols.nonEmpty) w.partitionBy(layoutCols: _*) else w)
      .parquet(path)
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC files carry their schema; passing one pins the expected shape
    * so drift fails AT READ TIME instead of downstream. Spark's ORC
    * reader supports schema evolution — a pinned column absent from the
    * files comes back silently all-null, the exact
    * quietly-computed-over-missing-data failure this module exists to
    * prevent — so the pin is enforced against EVERY file's own footer
    * (metadata-only reads), field names and types both. Per-file, not
    * per-dataset: a single inferred schema comes from one file's footer,
    * so a dataset where only SOME files dropped or retyped a column
    * would pass the check and the drifted files would still come back
    * all-null. Cost: one footer read per file on the driver — metadata
    * only, and opt-in via the schema pin.
    */
  def readOrc(spark: SparkSession, path: String,
              schema: Option[StructType] = None): DataFrame = {
    schema.foreach { s =>
      val files = spark.read.orc(path).inputFiles
      val drifted = files.flatMap { f =>
        val fileFields = spark.read.orc(f).schema.fields
          .map(x => x.name -> x.dataType).toMap
        val missing = s.fields.filter(x =>
          !fileFields.get(x.name).contains(x.dataType))
        if (missing.isEmpty) None
        else Some(f -> missing.map(x =>
          s"${x.name}: ${x.dataType.simpleString}").mkString(", "))
      }
      require(drifted.isEmpty,
        s"ORC schema drift at $path: expected fields absent or retyped in " +
          s"${drifted.length}/${files.length} files: " +
          drifted.take(5).map { case (f, m) => s"$f [$m]" }.mkString("; "))
    }
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).orc(path)
  }
}
