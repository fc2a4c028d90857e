package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  /** WARC record boundary: CRLF CRLF then the next record's version
    * line (ISO 28500 frames records with two CRLFs; every record opens
    * `WARC/1.0`).
    */
  private[sources] val WarcRecSep = "\r\n\r\nWARC/1.0\r\n"

  /** WARC/WET container ingest (r16 — the step-0 source gap: CCNet, C4
    * and RefinedWeb start from WARC/WET *files*, whose headers — URL,
    * date, MIME — are themselves curation inputs for the domain-cap /
    * compaction stages).
    *
    * Record split: the reader hands the boundary byte sequence
    * ("\r\n\r\nWARC/1.0\r\n") to the text datasource as a custom
    * `lineSep` — Hadoop's line reader handles arbitrary delimiters
    * ACROSS input-split boundaries, so a multi-GB WARC fans out to
    * normal splits instead of one task per file (what makes this a
    * container READER, not a whole-file slurp; per-record-gzip
    * `.warc.gz` crawls split too via [[readWarcGz]] — r17; only
    * WHOLE-FILE-gzip legacy containers stay one-task-per-file, and
    * [[writeWarcGz]] is the recompression step that fixes them). A
    * payload that itself
    * contains the boundary sequence would false-split — the parser
    * DETECTS that instead of corrupting silently: the record's declared
    * Content-Length no longer matches its payload (`len_ok=false` →
    * `malformed=true` → quarantine row, never a crash).
    *
    * Output (one row per record, NOTHING dropped):
    * `rec_type` (WARC-Type), `url` (WARC-Target-URI), `warc_date`,
    * `mime` (Content-Type), `content_length` (declared), `len_ok`,
    * `malformed`, `payload` (raw record body — HTTP block for response
    * records, plain text for WET conversion records). All parsing is
    * built-in expressions: map-only, codegen'd, scan parallelism.
    */
  def readWarc(spark: SparkSession, path: String): DataFrame =
    parseWarcRecords(spark.read.option("lineSep", WarcRecSep).text(path))

  /** Streaming landing-zone WARC ingest (r16): crawl shards dropped
    * under `path` become micro-batches — [[readJsonlStream]]'s pattern
    * for the container format. The record split rides the SAME custom
    * `lineSep` and the parse is the SAME expressions as the batch
    * reader ([[parseWarcRecords]]), so a batch backfill and the
    * continuous ingest produce identical rows by construction
    * (SourcesSpec proves the parity). `maxFilesPerTrigger` bounds
    * micro-batch size — one giant crawl drop cannot stall the trigger
    * cadence.
    */
  def readWarcStream(spark: SparkSession, path: String,
                     maxFilesPerTrigger: Int = 100): DataFrame =
    parseWarcRecords(spark.readStream
      .option("lineSep", WarcRecSep)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(path))

  /** The per-record parse shared by the batch and streaming readers:
    * pure built-in expressions over the raw record column — map-only,
    * codegen'd, applies unchanged per micro-batch.
    */
  private def parseWarcRecords(raw: DataFrame): DataFrame = {
    // the first record of each file keeps its own magic (no preceding
    // separator to consume it); the file's last record keeps the
    // trailing frame CRLFs — normalize both
    val rec = regexp_replace(
      regexp_replace(col("value"), lit("^WARC/1\\.0\r\n"), lit("")),
      lit("(\r\n)+$"), lit(""))
    def hdr(rc: org.apache.spark.sql.Column, name: String) =
      regexp_extract(rc, s"(?im)^$name: ([^\r\n]*)", 1)
    raw.select(rec.as("_rec"))
      .withColumn("_hdr", substring_index(col("_rec"), "\r\n\r\n", 1))
      .withColumn("payload",
        col("_rec").substr(length(col("_hdr")) + lit(5), length(col("_rec"))))
      .withColumn("rec_type", hdr(col("_hdr"), "WARC-Type"))
      .withColumn("url", hdr(col("_hdr"), "WARC-Target-URI"))
      .withColumn("record_id", hdr(col("_hdr"), "WARC-Record-ID"))
      .withColumn("warc_date", hdr(col("_hdr"), "WARC-Date"))
      .withColumn("mime", hdr(col("_hdr"), "Content-Type"))
      .withColumn("_cl_raw",
        regexp_extract(col("_hdr"), "(?im)^Content-Length: ([0-9]+)", 1))
      .withColumn("content_length",
        when(col("_cl_raw") === "", lit(null).cast("long"))
          .otherwise(col("_cl_raw").cast("long")))
      .withColumn("len_ok", col("content_length") === length(col("payload")))
      .withColumn("malformed",
        col("rec_type") === "" || col("content_length").isNull ||
          !coalesce(col("len_ok"), lit(false)))
      .select("rec_type", "url", "record_id", "warc_date", "mime",
        "content_length", "len_ok", "malformed", "payload")
  }

  /** Per-record-gzip container ingest (r17 — the format Common Crawl
    * actually ships: `.warc.gz`, one gzip MEMBER per record, members
    * concatenated): [[GzipMemberInputFormat]] restores SPLIT
    * parallelism to gzip crawls — any split scans to the next member
    * magic, validates by full decompress + RFC 1952 trailer, and reads
    * its members independently — so a multi-GB `.warc.gz` fans out
    * across tasks instead of decompressing single-threaded (the
    * one-task-per-file penalty this module's header note documents for
    * plain gzip). Truncated members surface their partial plaintext
    * and quarantine through the same `len_ok` gate as every other
    * malformed record. The per-record parse is [[readWarc]]'s,
    * verbatim — the two paths produce identical rows on identical
    * content (SourcesSpec round-trips; the declared x132 row pins it
    * against x120's oracle).
    *
    * `maxSplitBytes` bounds split size (the knob tests use to force
    * many splits over one file; production leaves the 128 MB default).
    */
  def readWarcGz(spark: SparkSession, path: String,
                 maxSplitBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.setLong(
      org.apache.hadoop.mapreduce.lib.input.FileInputFormat.SPLIT_MAXSIZE,
      maxSplitBytes)
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path, classOf[GzipMemberInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text], conf)
      .map(_._2.toString) // materialize: Hadoop reuses the Text object
    parseWarcRecords(rdd.toDF("value"))
  }

  /** The write side of [[readWarcGz]]: each record string becomes its
    * own gzip member (record + the inter-record CRLF CRLF frame,
    * compressed independently), members concatenated per task file —
    * the Common Crawl delivery layout, and the recompression step that
    * turns a legacy whole-file-gzip crawl into splittable shards. Runs
    * distributed: one container file per partition, written through
    * the Hadoop filesystem API against the SESSION's Hadoop
    * configuration (shipped to the executors, so `spark.hadoop.*`
    * object-store credentials/fs.defaultFS resolve the same
    * filesystem the driver-side cleanup just touched), under a
    * task-commit protocol: each attempt writes an attempt-unique
    * dotfile (invisible to FileInputFormat's hidden-file filter) and
    * renames into place, so a speculative or retried attempt can
    * never interleave bytes into the destination container.
    */
  def writeWarcGz(records: DataFrame, path: String): Unit = {
    val sc = records.sparkSession.sparkContext
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(sc.hadoopConfiguration)
    if (fs.exists(target)) fs.delete(target, true)
    fs.mkdirs(target)
    val confB = sc.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        sc.hadoopConfiguration))
    val colName = records.columns.head
    records.select(col(colName).cast("string")).rdd
      .mapPartitionsWithIndex { (i, it) =>
        val conf = confB.value.value
        val part = new org.apache.hadoop.fs.Path(
          path, f"part-$i%05d.warc.gz")
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new org.apache.hadoop.fs.Path(
          path, f".part-$i%05d-attempt-$attempt.warc.gz.inprogress")
        val taskFs = part.getFileSystem(conf)
        val out = taskFs.create(tmp, true)
        var n = 0L
        it.foreach { row =>
          val bytes = (row.getString(0) + "\r\n\r\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val bos = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write(bytes)
          gz.close()
          out.write(bos.toByteArray)
          n += 1
        }
        out.close()
        // Commit: first attempt to rename wins; a loser (its rename
        // refused because the destination exists) discards its temp.
        if (!taskFs.rename(tmp, part) && taskFs.exists(tmp))
          taskFs.delete(tmp, false): Unit
        Iterator(n)
      }.count(): Unit
  }

  /** Well-formed document bodies from a [[readWarc]] frame: `response`
    * records must be HTTP 200 and have their HTTP header block stripped
    * (the body is what follows the first blank line); WET `conversion`
    * records ARE the body. warcinfo/request/metadata records and
    * quarantined (`malformed`) rows drop here — after the caller has
    * had the chance to count/inspect them.
    */
  def warcDocs(warc: DataFrame): DataFrame =
    warc.filter(!col("malformed"))
      .withColumn("http_status",
        when(col("rec_type") === "response",
          regexp_extract(col("payload"), "^HTTP/1\\.[01] ([0-9]{3})", 1))
          .otherwise(lit("")))
      .withColumn("body",
        when(col("rec_type") === "conversion", col("payload"))
          .otherwise(col("payload").substr(
            length(substring_index(col("payload"), "\r\n\r\n", 1)) + lit(5),
            length(col("payload")))))
      .filter(col("rec_type") === "conversion" ||
        (col("rec_type") === "response" && col("http_status") === "200"))
      .select("rec_type", "url", "record_id", "warc_date", "mime",
        "content_length", "body")

  /** Frame one WARC record (version line, headers, blank line, payload)
    * as a single string column — the write side of [[readWarc]]'s
    * round trip. `Content-Length` is computed from the payload, so the
    * reader's `len_ok` integrity bit holds by construction. (Char
    * length, not bytes: the engine's string columns are char-addressed
    * on both the Spark and oracle sides; a byte-exact exporter would
    * measure the encoded payload instead.)
    */
  def warcRecord(recType: org.apache.spark.sql.Column,
                 url: org.apache.spark.sql.Column,
                 date: org.apache.spark.sql.Column,
                 mime: org.apache.spark.sql.Column,
                 payload: org.apache.spark.sql.Column,
                 recordId: Option[org.apache.spark.sql.Column] = None): org.apache.spark.sql.Column =
    concat(
      lit("WARC/1.0\r\nWARC-Type: "), recType,
      lit("\r\nWARC-Target-URI: "), url,
      // WARC-Record-ID is MANDATORY per ISO 28500 §5.2; older fixture
      // stores omit it (the parser nulls the column), new stores pass
      // a `<urn:...>` id — the identity the crawl pipeline's URL-index
      // stage keys fetches by
      recordId.map(r => concat(lit("\r\nWARC-Record-ID: "), r))
        .getOrElse(lit("")),
      lit("\r\nWARC-Date: "), date,
      lit("\r\nContent-Type: "), mime,
      lit("\r\nContent-Length: "), length(payload).cast("string"),
      lit("\r\n\r\n"), payload)

  /** Write a frame of [[warcRecord]] strings (single column) as WARC
    * container files: the text sink's custom `lineSep` supplies the
    * inter-record CRLF CRLF frame that [[WarcRecSep]] splits on.
    */
  def writeWarc(records: DataFrame, path: String): Unit =
    records.write.mode("overwrite").option("lineSep", "\r\n\r\n").text(path)

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
