package graft

import graft.sources.FileSources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File-format interchange round-trips: every format must reproduce the
  * parquet fixture content bit-for-bit (hash compare over all columns),
  * including the hard cases — arbitrary text in JSONL/ORC, float arrays
  * in JSONL, flat scalars in CSV.
  */
class SourcesSpec extends SparkSuite {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-src-$name")
    d.toFile.deleteOnExit()
    d.resolve("out").toString
  }

  /** Order-insensitive full-content signature (the bench drain's
    * bit_xor(xxhash64(struct(*))) — any value or row diff flips it). */
  private def sig(df: DataFrame): Long =
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      .agg(expr("bit_xor(h)")).collect()(0).getLong(0)

  test("JSONL round-trip: documents (arbitrary text) content-identical") {
    val docs = Tables.load(spark, sf(), "documents")
    val path = tmp("docs-jsonl")
    FileSources.writeJsonl(docs, path)
    val back = FileSources.readJsonl(spark, path, docs.schema)
      .select(docs.columns.map(col): _*) // column order as written
    assert(back.count() == docs.count())
    assert(sig(back) == sig(docs))
  }

  test("JSONL round-trip: embeddings (float arrays) exact") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val path = tmp("emb-jsonl")
    FileSources.writeJsonl(emb, path)
    val back = FileSources.readJsonl(spark, path, emb.schema)
      .select(emb.columns.map(col): _*)
    // float -> JSON decimal -> float must be value-exact (shortest
    // round-trip representation), not approximately equal
    assert(sig(back) == sig(emb))
  }

  test("CSV round-trip: lineitem (flat scalars) content-identical") {
    val li = Tables.load(spark, sf(), "lineitem")
    val path = tmp("li-csv")
    FileSources.writeCsv(li, path)
    val back = FileSources.readCsv(spark, path, li.schema)
      .select(li.columns.map(col): _*)
    assert(back.count() == li.count())
    assert(sig(back) == sig(li))
  }

  test("ORC round-trip: documents content-identical, schema pinned") {
    val docs = Tables.load(spark, sf(), "documents")
    val path = tmp("docs-orc")
    FileSources.writeOrc(docs, path)
    val back = FileSources.readOrc(spark, path, Some(docs.schema))
      .select(docs.columns.map(col): _*)
    assert(back.schema == docs.schema)
    assert(sig(back) == sig(docs))
  }

  test("ORC pinned-schema drift fails loudly instead of returning all-null columns") {
    val docs = Tables.load(spark, sf(), "documents").select("doc_id", "lang")
    val dir = tmp("orcdrift")
    FileSources.writeOrc(docs, dir)
    // matching pin reads fine
    assert(FileSources.readOrc(spark, dir, Some(docs.schema)).count() == docs.count())
    // a pinned column the files don't have must throw, not null-fill
    val drifted = org.apache.spark.sql.types.StructType(docs.schema.fields :+
      org.apache.spark.sql.types.StructField("dropped_upstream",
        org.apache.spark.sql.types.StringType))
    intercept[IllegalArgumentException] {
      FileSources.readOrc(spark, dir, Some(drifted))
    }
  }

  test("ORC drift in only SOME files still fails loudly (per-file footer check)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    // a mixed directory: one file with (doc_id, lang), one where lang
    // was dropped upstream. Single-schema inference reads ONE footer and
    // can land on the good file — the per-file check must still throw.
    val good = Tables.load(spark, sf(), "documents")
      .select("doc_id", "lang").limit(10).coalesce(1)
    val bad = Tables.load(spark, sf(), "documents")
      .select("doc_id").limit(10).coalesce(1)
    val dir = tmp("orcpartial"); val badDir = tmp("orcpartial-bad")
    FileSources.writeOrc(good, dir)
    FileSources.writeOrc(bad, badDir)
    val badPart = Files.list(Paths.get(badDir)).iterator().asScala
      .find(p => p.getFileName.toString.endsWith(".orc")).get
    Files.copy(badPart, Paths.get(dir, "part-drifted.orc"),
      StandardCopyOption.REPLACE_EXISTING)
    val e = intercept[IllegalArgumentException] {
      FileSources.readOrc(spark, dir, Some(good.schema))
    }
    assert(e.getMessage.contains("1/2 files"),
      s"expected exactly the drifted file flagged, got: ${e.getMessage}")
  }

  test("ANN banded index: partitioned write probes with partition pruning, results unchanged") {
    import graft.streaming.StreamSimilarity
    import graft.ext.Similarity
    // the 100 TB claim behind lshTopKBanded/StreamSimilarity: the corpus
    // index is a ONE-OFF partitionBy(band, bucket) write, and a probe
    // touches only its colliding partitions — assert the scan actually
    // partition-prunes AND the pruned read reproduces the in-memory result
    val emb = Tables.load(spark, sf(), "embeddings")
    val dir = tmp("annindex")
    StreamSimilarity.bandedIndex(emb, bands = 16, bitsPerBand = 4, dim = 64)
      .write.partitionBy("band", "bucket").parquet(dir)
    val index = spark.read.parquet(dir)
      .select("neighbor_id", "cv", "band", "bucket") // partition cols move last on write
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val expected = Similarity.lshTopKBanded(queries, emb, k = 5,
        bands = 16, bitsPerBand = 4, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val got = StreamSimilarity.topKPerBatch(
        StreamSimilarity.probeCandidates(queries, index,
          bands = 16, bitsPerBand = 4, dim = 64), k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected, "pruned on-disk index drifted from the in-memory result")
    // a single-bucket probe must reach the scan as a partition filter
    val one = index.filter(col("band") === 3 && col("bucket") === 7L)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      "PartitionFilters: \\[\\]".r.findFirstIn(plan).isEmpty,
      s"no partition pruning on the banded index scan:\n$plan")
  }

  test("streaming JSONL ingest: files arriving between triggers become micro-batches") {
    val docs = Tables.load(spark, sf(), "documents").select("doc_id", "lang")
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val dir = java.nio.file.Files.createTempDirectory("graft-src-stream")
    dir.toFile.deleteOnExit()
    def drop(name: String, batch: Seq[(Long, String)]): Unit = {
      val tmpF = java.nio.file.Files.createTempFile("graft-drop", ".json")
      java.nio.file.Files.writeString(tmpF, batch
        .map { case (id, l) => s"""{"doc_id": $id, "lang": "$l"}""" }
        .mkString("", "\n", "\n"))
      // atomic move INTO the watched dir — the file-source pattern for
      // avoiding half-written files becoming micro-batches
      java.nio.file.Files.move(tmpF, dir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val stream = FileSources.readJsonlStream(spark, dir.toString, docs.schema)
    val q = stream.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName("sjsonl").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      drop("b1.json", b1.toSeq); q.processAllAvailable()
      val afterB1 = spark.table("sjsonl").count()
      assert(afterB1 == b1.length, s"first drop: $afterB1 of ${b1.length}")
      drop("b2.json", b2.toSeq); q.processAllAvailable()
      val streamed = spark.table("sjsonl").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == rows.toSet)
    } finally q.stop()
  }

  test("streaming WARC ingest: container drops parse identically to the batch reader") {
    val docs = Tables.load(spark, sf(), "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id").isNotNull)
      .limit(40)
    import org.apache.spark.sql.functions._
    val recs = docs.select(FileSources.warcRecord(
      lit("response"),
      concat(lit("https://fixture.graft/doc/"), col("doc_id").cast("string")),
      lit("2026-01-01T00:00:00Z"),
      lit("application/http; msgtype=response"),
      concat(lit("HTTP/1.1 200 OK\r\n\r\n"),
        coalesce(col("text"), lit("")))).as("value"))
      .collect().map(_.getString(0))
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-stream")
    dir.toFile.deleteOnExit()
    def drop(name: String, batch: Seq[String]): Unit = {
      val tmpF = java.nio.file.Files.createTempFile("graft-wdrop", ".warc")
      // record + terminator after every row — the writeWarc sink frame
      java.nio.file.Files.writeString(tmpF,
        batch.mkString("", "\r\n\r\n", "\r\n\r\n"))
      java.nio.file.Files.move(tmpF, dir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val stream = FileSources.warcDocs(
      FileSources.readWarcStream(spark, dir.toString))
    val q = stream.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName("swarc").start()
    try {
      val (b1, b2) = recs.splitAt(recs.length / 2)
      drop("b1.warc", b1.toSeq); q.processAllAvailable()
      assert(spark.table("swarc").count() == b1.length)
      drop("b2.warc", b2.toSeq); q.processAllAvailable()
      val streamed = spark.table("swarc")
        .select("url", "content_length", "body").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      val batch = FileSources.warcDocs(FileSources.readWarc(spark, dir.toString))
        .select("url", "content_length", "body").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(streamed == batch, "stream and batch WARC parses must agree")
      assert(streamed.size == recs.length)
    } finally q.stop()
  }

  test("FAILFAST: malformed JSONL fails loudly instead of nulling rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-src-bad")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"doc_id": 1, "n_chars": 10}
        |{"doc_id": "not-a-number", "n_chars": []}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))
    val err = intercept[Exception] {
      FileSources.readJsonl(spark, dir.toString, schema).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(m => m.contains("Malformed") || m.contains("FAILFAST")),
      s"unexpected error chain: ${msgs(err)}")
  }

  // --- WARC/WET container ingest (r16) ---

  private def writeWarcFile(name: String, content: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-warc-$name")
    d.toFile.deleteOnExit()
    java.nio.file.Files.writeString(d.resolve("part-0.warc"), content)
    d.toString
  }

  private val crlf = "\r\n"
  private def rec(headers: Seq[(String, String)], payload: String): String =
    "WARC/1.0" + crlf +
      headers.map { case (k, v) => s"$k: $v$crlf" }.mkString +
      s"Content-Length: ${payload.length}$crlf" + crlf + payload

  test("WARC: multi-record file parses every record, headers intact") {
    val http = s"HTTP/1.1 200 OK${crlf}Content-Type: text/html$crlf$crlf" +
      "<html><body><p>hello world one two three four five six</p></body></html>"
    val content = Seq(
      rec(Seq("WARC-Type" -> "warcinfo"), "software: graft-fixture"),
      rec(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://example.org/a",
        "WARC-Date" -> "2026-01-02T00:00:03Z",
        "Content-Type" -> "application/http; msgtype=response"), http),
      rec(Seq("WARC-Type" -> "conversion",
        "WARC-Target-URI" -> "https://example.org/b",
        "WARC-Date" -> "2026-01-02T00:00:04Z",
        "Content-Type" -> "text/plain"), "already clean wet text")
    ).mkString(crlf + crlf) + crlf + crlf
    val got = FileSources.readWarc(spark, writeWarcFile("multi", content))
      .orderBy("url").collect()
    assert(got.length == 3)
    assert(got.map(_.getAs[String]("rec_type")).toSet ==
      Set("warcinfo", "response", "conversion"))
    assert(got.forall(_.getAs[Boolean]("len_ok")), "Content-Length mismatch")
    assert(got.forall(!_.getAs[Boolean]("malformed")))
    val resp = got.find(_.getAs[String]("rec_type") == "response").get
    assert(resp.getAs[String]("url") == "https://example.org/a")
    assert(resp.getAs[String]("warc_date") == "2026-01-02T00:00:03Z")
    assert(resp.getAs[String]("payload") == http,
      "payload (incl. its interior blank line) not preserved")
  }

  test("WARC: warcDocs keeps 200 responses + conversions, strips HTTP headers, skips the rest") {
    val body = "<html><body><p>kept body</p></body></html>"
    val content = Seq(
      rec(Seq("WARC-Type" -> "warcinfo"), "software: graft-fixture"),
      rec(Seq("WARC-Type" -> "request",
        "WARC-Target-URI" -> "https://example.org/a"),
        s"GET /a HTTP/1.1${crlf}Host: example.org$crlf"),
      rec(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://example.org/a",
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "Content-Type" -> "application/http; msgtype=response"),
        s"HTTP/1.1 200 OK${crlf}Content-Type: text/html$crlf$crlf$body"),
      rec(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://example.org/gone",
        "Content-Type" -> "application/http; msgtype=response"),
        s"HTTP/1.1 404 Not Found$crlf$crlf<html>nope</html>"),
      rec(Seq("WARC-Type" -> "conversion",
        "WARC-Target-URI" -> "https://example.org/wet",
        "Content-Type" -> "text/plain"), "wet text body")
    ).mkString(crlf + crlf) + crlf + crlf
    val docs = FileSources.warcDocs(
        FileSources.readWarc(spark, writeWarcFile("docs", content)))
      .orderBy("url").collect()
    assert(docs.length == 2, s"expected 200-response + conversion only: ${docs.toSeq}")
    assert(docs(0).getAs[String]("url") == "https://example.org/a")
    assert(docs(0).getAs[String]("body") == body, "HTTP header block not stripped")
    assert(docs(1).getAs[String]("body") == "wet text body")
  }

  test("WARC: malformed records quarantine (flag), never crash, never reach warcDocs") {
    val content = Seq(
      // missing Content-Length entirely (hand-built, not via rec())
      "WARC/1.0" + crlf + "WARC-Type: response" + crlf +
        "WARC-Target-URI: https://example.org/nolen" + crlf + crlf + "body",
      // declared length disagrees with actual payload (truncation /
      // false-split shape)
      "WARC/1.0" + crlf + "WARC-Type: response" + crlf +
        "WARC-Target-URI: https://example.org/short" + crlf +
        "Content-Length: 9999" + crlf + crlf + "tiny",
      rec(Seq("WARC-Type" -> "conversion",
        "WARC-Target-URI" -> "https://example.org/ok",
        "Content-Type" -> "text/plain"), "good record")
    ).mkString(crlf + crlf) + crlf + crlf
    val all = FileSources.readWarc(spark, writeWarcFile("bad", content))
    assert(all.count() == 3, "malformed rows must be kept (quarantined), not dropped")
    val bad = all.filter(col("malformed")).collect()
    assert(bad.length == 2)
    assert(bad.map(_.getAs[String]("url")).toSet ==
      Set("https://example.org/nolen", "https://example.org/short"))
    val kept = FileSources.warcDocs(all).collect()
    assert(kept.length == 1 && kept(0).getAs[String]("body") == "good record")
  }

  test("WARC: writeWarc/readWarc round-trip across multiple files") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha body one"), (2L, "beta body two"), (3L, "gamma body three"),
      (4L, "delta body four"), (5L, "epsilon body five"))
      .toDF("doc_id", "text")
    val recs = docs.select(FileSources.warcRecord(
      lit("conversion"),
      concat(lit("https://fixture.graft/doc/"), col("doc_id")),
      lit("2026-01-01T00:00:00Z"), lit("text/plain"),
      col("text")).as("value")).repartition(3)
    val path = tmp("warc-rt")
    FileSources.writeWarc(recs, path)
    val back = FileSources.warcDocs(FileSources.readWarc(spark, path))
      .select(regexp_extract(col("url"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("body").as("text"))
    assert(sig(back) == sig(docs), "container round-trip lost content")
  }

  // --- per-record-gzip containers (r17) ---

  private def gzFixture(n: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"body text number $i with some words"))
      .toDF("doc_id", "text")
  }

  private def gzRecs(docs: org.apache.spark.sql.DataFrame) =
    docs.select(FileSources.warcRecord(
      lit("conversion"),
      concat(lit("https://fixture.graft/doc/"), col("doc_id")),
      lit("2026-01-01T00:00:00Z"), lit("text/plain"), col("text"),
      recordId = Some(concat(lit("<urn:graft:"), col("doc_id"), lit(">")))
    ).as("value"))

  test("WARC-gz: member round-trip matches the uncompressed reader row for row") {
    val docs = gzFixture(60)
    val recs = gzRecs(docs).repartition(3)
    val gzPath = tmp("warcgz-rt")
    val plainPath = tmp("warc-plain-rt")
    FileSources.writeWarcGz(recs, gzPath)
    FileSources.writeWarc(recs, plainPath)
    val cols = Seq("rec_type", "url", "record_id", "warc_date", "mime",
      "content_length", "len_ok", "malformed", "payload")
    val gz = FileSources.readWarcGz(spark, gzPath)
      .select(cols.map(col): _*)
    val plain = FileSources.readWarc(spark, plainPath)
      .select(cols.map(col): _*)
    assert(sig(gz) == sig(plain), "gz and plain container parses differ")
    assert(gz.filter(col("malformed")).count() == 0)
    assert(gz.count() == 60)
  }

  test("WARC-gz: a forced multi-split read resyncs on member boundaries") {
    val docs = gzFixture(200)
    val gzPath = tmp("warcgz-split")
    FileSources.writeWarcGz(gzRecs(docs).coalesce(1), gzPath)
    val whole = FileSources.readWarcGz(spark, gzPath)
    // ~40 KB of members forced into ~1 KB splits: many tasks, same rows
    val split = FileSources.readWarcGz(spark, gzPath, maxSplitBytes = 1024)
    assert(split.rdd.getNumPartitions > 4,
      s"split knob did not fan out (got ${split.rdd.getNumPartitions} partitions)")
    assert(sig(split.select("url", "payload")) == sig(whole.select("url", "payload")),
      "member-boundary resync lost or duplicated records across splits")
    assert(split.count() == 200)
  }

  test("WARC-gz: a truncated final member quarantines via len_ok, never crashes") {
    val docs = gzFixture(10)
    val gzPath = tmp("warcgz-trunc")
    FileSources.writeWarcGz(gzRecs(docs).coalesce(1), gzPath)
    // chop the tail off the single part file: the last member loses
    // its trailer (and likely part of its deflate stream)
    val dir = new java.io.File(gzPath)
    val part = dir.listFiles().filter(_.getName.endsWith(".warc.gz")).head
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    java.nio.file.Files.write(part.toPath,
      java.util.Arrays.copyOf(bytes, bytes.length - 12))
    // the truncation happened behind Hadoop's back: drop the local
    // checksum sidecar so the read exercises OUR quarantine path, not
    // the local filesystem's
    new java.io.File(dir, "." + part.getName + ".crc").delete()
    val all = FileSources.readWarcGz(spark, gzPath)
    assert(all.count() == 10, "truncation must not drop whole-file reads")
    val bad = all.filter(col("malformed"))
    assert(bad.count() == 1, "the cut member must surface quarantined")
    assert(FileSources.warcDocs(all).count() == 9)
  }

  test("WARC-gz: a false sync that inflates to EOF is refuted by a later valid member") {
    // r18 (the r17 advice): a `1f 8b 08` triple inside garbage bytes
    // whose "deflate stream" is a stored block with a length that
    // swallows the rest of the file parses as Truncated (EOF, no
    // DataFormatException) — exactly like a genuinely cut member. The
    // reader must hold it back and, on finding a later VALID member,
    // refute it: emit only the real records, no spurious partial row.
    val docs = gzFixture(8)
    val gzPath = tmp("warcgz-falsesync")
    FileSources.writeWarcGz(gzRecs(docs).coalesce(1), gzPath)
    val dir = new java.io.File(gzPath)
    val part = dir.listFiles().filter(_.getName.endsWith(".warc.gz")).head
    val real = java.nio.file.Files.readAllBytes(part.toPath)
    // prepend: gzip header (magic, deflate, no flags, zero MTIME,
    // XFL 0, OS 3) + a BFINAL=0 stored block claiming 0xFFFF bytes —
    // far more than the file holds, so inflate runs to EOF unfinished
    val garbage = Array[Byte](0x1f, 0x8b.toByte, 0x08, 0x00,
      0x00, 0x00, 0x00, 0x00, 0x00, 0x03,
      0x00, 0xff.toByte, 0xff.toByte, 0x00, 0x00) ++
      "not a member".getBytes("UTF-8")
    java.nio.file.Files.write(part.toPath, garbage ++ real)
    new java.io.File(dir, "." + part.getName + ".crc").delete()
    val all = FileSources.readWarcGz(spark, gzPath)
    assert(all.count() == 8, "false sync must not add or drop rows")
    assert(all.filter(col("malformed")).count() == 0,
      "the run-to-EOF false sync must be refuted by the real members")
    assert(FileSources.warcDocs(all).count() == 8)
  }

  test("WARC record ids parse and flow through warcDocs") {
    val docs = gzFixture(5)
    val path = tmp("warc-recid")
    FileSources.writeWarc(gzRecs(docs), path)
    val got = FileSources.warcDocs(FileSources.readWarc(spark, path))
      .select("record_id", "url").collect()
    assert(got.forall(r => r.getString(0) ==
      "<urn:graft:" + r.getString(1).split("/").last + ">"))
  }
}
