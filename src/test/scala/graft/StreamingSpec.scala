package graft

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("S1 rate waveform: virtual wave reproduces 10/110/210/310/410 steps") {
    // 50 virtual seconds = one full period
    val perSec = RateShape.virtualWave(spark, 50)
      .groupBy("sec").count().orderBy("sec").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // each 10s step admits the step rate
    val expected = (0 until 50).map(s => s.toLong -> (100L * ((s / 10) % 5) + 10L))
    assert(perSec.toSeq == expected)
    // mean rate = 210/s (reference BASELINE: mean producer rate)
    assert(perSec.map(_._2).sum / 50 == 210)
  }

  test("A1 streaming running counts via MemoryStream, update mode") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Int)]
    val counts = StreamCounters.runningCounts(
      input.toDF().toDF("cluster", "topic", "partition"))
    val q = counts.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("rc").start()
    try {
      input.addData(("c1", "t1", 0), ("c1", "t1", 0), ("c1", "t2", 1))
      q.processAllAvailable()
      input.addData(("c1", "t1", 0))
      q.processAllAvailable()
      val got = spark.table("rc")
        .groupBy("cluster", "topic", "partition").agg(max("count").as("count"))
        .collect().map(r => (r.getString(1), r.getLong(3))).toMap
      assert(got == Map("t1" -> 3L, "t2" -> 1L))
    } finally q.stop()
  }

  test("streaming latest-per-key compaction equals the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val cols = Seq("user_id", "ts", "event_id", "event_type", "value")
    val latest = graft.operators.Compaction.latestByKey(
      input.toDF().toDF(cols: _*), "user_id", "ts", "event_id",
      Seq("event_type", "value"))
    val q = latest.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("lpk").start()
    val b1 = Seq((1L, ts(10), 5L, "a", 1.0), (2L, ts(20), 6L, "b", 2.0))
    // batch 2 arrives out of order: an OLDER row for key 2 (must not
    // regress the state), a ts-tie for key 1 (max id wins), a new key
    val b2 = Seq((2L, ts(15), 7L, "c", 3.0), (1L, ts(10), 9L, "d", 4.0),
      (3L, ts(1), 8L, "e", 5.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // the memory sink accumulates per-batch updates; state is monotone
      // in the greatest-row order, so the final state per key is the max
      val got = spark.table("lpk")
        .groupBy("k").agg(max(struct(col("last_ts"), col("last_event_id"),
          col("last_event_type"), col("last_value"))).as("m"))
        .select(col("k"), col("m.last_ts"), col("m.last_event_id"),
          col("m.last_event_type"), col("m.last_value"))
        .orderBy("k").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
          r.getLong(2), r.getString(3), r.getDouble(4)))
      val batch = graft.operators.Compaction.latestByKey(
        (b1 ++ b2).toDF(cols: _*), "user_id", "ts", "event_id",
        Seq("event_type", "value")).orderBy("k").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
          r.getLong(2), r.getString(3), r.getDouble(4)))
      assert(got.toSeq == batch.toSeq, s"stream $got vs batch $batch")
      assert(got.toSeq == Seq((1L, 10L, 9L, "d", 4.0),
        (2L, 20L, 6L, "b", 2.0), (3L, 1L, 8L, "e", 5.0)))
    } finally q.stop()
  }

  test("streaming negative sampling: stream-static slot probe equals batch draws") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = (1L to 100L).toDF("doc_id")
    val idx = graft.ext.TrainSet.corpusSlotIndex(corpus, "doc_id")
      .persist()
    try {
      val input = MemoryStream[Long]
      val negs = graft.ext.TrainSet.negativeSampleIndexed(
        input.toDF().toDF("doc_id"), "doc_id", idx, k = 4)
      val q = negs.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("negs").start()
      try {
        input.addData(10L, 20L); q.processAllAvailable()
        input.addData(30L); q.processAllAvailable()
        val got = spark.table("negs").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val batch = graft.ext.TrainSet.negativeSample(
          Seq(10L, 20L, 30L).toDF("doc_id"), "doc_id", corpus, "doc_id", 4)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == batch, s"stream $got vs batch $batch")
        assert(got.nonEmpty)
      } finally q.stop()
    } finally idx.unpersist()
  }

  test("J1/F5 progressMonitor: snapshot deltas carried across batches") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamCounters.CounterEvent]
    val t0 = 1704067200000L
    val monitor = StreamCounters.progressMonitor(input.toDS(), nowMs = () => t0 + 1000, enableTimeout = false)
    val q = monitor.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("pm").start()
    try {
      input.addData(
        StreamCounters.CounterEvent("c1", "t1", 0, 5L, t0),
        StreamCounters.CounterEvent("c1", "t1", 0, 3L, t0 + 500))
      q.processAllAvailable()
      input.addData(StreamCounters.CounterEvent("c1", "t1", 0, 4L, t0 + 900))
      q.processAllAvailable()
      val rows = spark.table("pm").orderBy("count").collect()
      // batch 1: count 8 delta 8; batch 2: count 12 delta 4
      assert(rows.map(r => (r.getLong(3), r.getLong(4))).toSeq ==
        Seq((8L, 8L), (12L, 4L)))
      assert(rows.forall(!_.getBoolean(6))) // fresh activity -> not stale
    } finally q.stop()
  }

  test("F5 staleness: events older than 5 min flag stale") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamCounters.CounterEvent]
    val t0 = 1704067200000L
    // "now" is 6 minutes after the event time
    val monitor = StreamCounters.progressMonitor(input.toDS(),
      nowMs = () => t0 + 6 * 60 * 1000, enableTimeout = false)
    val q = monitor.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("pm2").start()
    try {
      input.addData(StreamCounters.CounterEvent("c1", "t1", 0, 5L, t0))
      q.processAllAvailable()
      assert(spark.table("pm2").collect().head.getBoolean(6))
    } finally q.stop()
  }

  test("producer pipeline e2e: batch form generates valid wire records") {
    val wire = Pipelines.producerBatch(spark, seconds = 5)
    val parsed = gen.RecordGen.parseWire(wire)
    val n = parsed.count()
    // 5 virtual seconds at 10 r/s (first step of the wave) = 50 records
    assert(n == 50L)
    assert(parsed.filter(col("key.storeId").isNull).count() == 0)
    assert(parsed.filter(col("value.user.firstName").isNull).count() == 0)
  }

  test("producer streaming pipeline runs on the rate source") {
    val q = Pipelines.producer(spark, rowsPerSecond = RateShape.peakRate)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("prod").start()
    try {
      q.processAllAvailable()
      Thread.sleep(1500)
      q.processAllAvailable()
      val got = spark.table("prod")
      assert(got.columns.toSeq == Seq("topic", "partition", "key", "value", "headers"))
    } finally q.stop()
  }

  test("S1 waveform guard: source rate below the 410 r/s peak is rejected") {
    // a sub-peak source rate would silently clip the 210/310/410 steps to
    // the source rate, distorting the reference waveform — reject instead
    val e = intercept[IllegalArgumentException] {
      RateShape.virtualWave(spark, 10, peak = 100)
    }
    assert(e.getMessage.contains("410"))
    intercept[IllegalArgumentException] {
      Pipelines.producer(spark, rowsPerSecond = 50)
    }
  }

  test("K5 truncation plan: depth trigger + consumer-offset keying") {
    val offsets = Seq(
      ("t1", 0, 0L, 6000L, 5500L),   // depth 6000 -> truncate before 5500
      ("t1", 1, 1000L, 5500L, 5200L), // depth 4500 -> keep
      ("t2", 0, 0L, 5000L, 4800L))   // depth 5000 -> truncate (>=)
      .toDF("topic", "partition", "earliest", "latest", "currentOffset")
    val plan = Truncation.plan(offsets).orderBy("topic").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(plan.toSeq == Seq(("t1", 0, 5500L), ("t2", 0, 4800L)))
    var recorded = Vector.empty[(String, Int, Long)]
    Truncation.execute(Truncation.plan(offsets), new Truncation.TruncateAction {
      def deleteRecords(t: String, p: Int, o: Long): Unit =
        recorded :+= ((t, p, o))
    })
    assert(recorded.toSet == Set(("t1", 0, 5500L), ("t2", 0, 4800L)))
  }

  test("F3 sampling trigger: every 5000th record only") {
    val df = Seq(4999L, 5000L, 5001L, 10000L, 12500L).toDF("cnt")
    val got = Truncation.sampled(df).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(5000L, 10000L))
  }

  test("file-transport e2e: streamed wire records round-trip through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wire").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    // producer -> file sink (the no-broker stand-in for the Kafka sink)
    val q = Pipelines.producer(spark, rowsPerSecond = RateShape.peakRate)
      .writeStream.format("parquet")
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable(); Thread.sleep(1200); q.processAllAvailable()
    } finally q.stop()
    // consumer side reads the same wire schema back and parses it
    val wire = spark.read.parquet(dir)
    if (wire.count() > 0) {
      val parsed = gen.RecordGen.parseWire(wire)
      assert(parsed.filter(col("key.storeId").isNull).count() == 0)
      assert(parsed.select("topic").distinct().count() <= 3)
    }
    assert(wire.columns.toSeq == Seq("topic", "partition", "key", "value", "headers"))
  }

  test("watermarked windowed counts: append mode emits closed windows only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val counts = StreamCounters.windowedCounts(
      input.toDF().toDF("ts", "v"), "ts", window = "1 minute", lateness = "0 seconds")
    val q = counts.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wc").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData((t("2024-01-01 00:00:10"), "a"), (t("2024-01-01 00:00:50"), "b"))
      q.processAllAvailable()
      // advance event time past the first window -> it closes and emits
      input.addData((t("2024-01-01 00:02:05"), "c"))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(rows == Map("2024-01-01 00:00:00.0" -> 2L))
    } finally q.stop()
  }

  test("streaming dedup: replayed (topic, partition, offset) dropped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int, Long, Long)]
    val records = input.toDF().toDF("topic", "partition", "offset", "secs")
      .withColumn("timestamp", timestamp_seconds(col("secs")))
    val q = StreamDedup.exactlyOnce(records)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sdedup").start()
    try {
      // batch 1: in-batch duplicate of offset 0
      input.addData(("t1", 0, 0L, 10L), ("t1", 0, 0L, 10L), ("t1", 0, 1L, 11L))
      q.processAllAvailable()
      // batch 2: cross-batch replay of offset 1 (at-least-once rewind)
      input.addData(("t1", 0, 1L, 12L), ("t1", 0, 2L, 13L), ("t2", 0, 1L, 13L))
      q.processAllAvailable()
      val got = spark.table("sdedup").select("topic", "offset").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      // offset 1 survives once on t1, and separately on t2 (identity is
      // the full (topic, partition, offset) triple)
      assert(got == Set(("t1", 0L), ("t1", 1L), ("t1", 2L), ("t2", 1L)))
      assert(spark.table("sdedup").count() == 4)
    } finally q.stop()
  }

  test("streaming content dedup: first doc per content hash survives") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "secs")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val q = StreamDedup.firstPerContent(docs, "text", "ts")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("cdedup").start()
    try {
      input.addData((1L, "same body", 10L), (2L, "other body", 11L))
      q.processAllAvailable()
      input.addData((3L, "same body", 12L))
      q.processAllAvailable()
      val ids = spark.table("cdedup").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L))
    } finally q.stop()
  }

  test("streaming url dedup: canonical twins drop in arrival order, batch keepers match") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "url", "secs")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val q = StreamDedup.firstPerCanonicalUrl(docs, "url", "ts")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("udedup").start()
    try {
      val rows = Seq(
        (1L, "https://WWW.h.com/a?utm_source=x", 10L),
        (2L, "https://h.com/a/", 11L),       // canonical twin of 1
        (3L, "http://h.com/a", 12L),          // scheme differs: survives
        (4L, "https://h.com/a#frag", 13L),    // canonical twin of 1
        (5L, "https://news.h.co.uk/b", 14L))
      val (b1, b2) = rows.splitAt(3)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("udedup")
        .select("doc_id", "canonical_url", "reg_domain").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got == Set(
        (1L, "https://h.com/a", "h.com"),
        (3L, "http://h.com/a", "h.com"),
        (5L, "https://news.h.co.uk/b", "h.co.uk")))
      // ids follow arrival order here, so the stream's keep-first equals
      // the batch rule (keeper = smallest id)
      val batchKeepers = graft.ext.Urls.urlDedup(
        rows.toDF("doc_id", "url", "secs"), "url", "doc_id")
        .select("keeper_id").collect().map(_.getLong(0)).toSet
      assert(got.map(_._1) == batchKeepers)
    } finally q.stop()
  }

  test("streaming crawl front door: container drops match the batch front door") {
    // x130's front door as a landing-zone stream: containers with 3
    // canonicalization-variant fetches per page (the crawlUrl rule),
    // fetch ids in arrival order, event time monotone in fetch id —
    // the declared keep-first == batch-min-id contract
    val docs = (1 to 12).map(i =>
      (i.toLong, s"crawl body number $i alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val recs = docs.select(graft.sources.FileSources.warcRecord(
      lit("conversion"),
      graft.queries.Declared.crawlUrl(col("doc_id")),
      concat(lit("2026-03-01T00:00:"),
        lpad(col("doc_id").cast("string"), 2, "0"), lit("Z")),
      lit("text/plain"),
      graft.ext.Extract.htmlWrap(col("doc_id"), col("text")),
      recordId = Some(concat(lit("<urn:graft:"),
        col("doc_id").cast("string"), lit(">")))).as("value"))
      .orderBy(col("value")).collect().map(_.getString(0))
      .sortBy(s => "urn:graft:([0-9]+)".r.findFirstMatchIn(s).get.group(1).toInt)
    val dir = java.nio.file.Files.createTempDirectory("graft-crawl-stream")
    dir.toFile.deleteOnExit()
    def drop(name: String, batch: Seq[String]): Unit = {
      val tmpF = java.nio.file.Files.createTempFile("graft-cdrop", ".warc")
      java.nio.file.Files.writeString(tmpF,
        batch.mkString("", "\r\n\r\n", "\r\n\r\n"))
      java.nio.file.Files.move(tmpF, dir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val q = graft.streaming.StreamDedup.crawlFrontDoor(
        graft.sources.FileSources.readWarcStream(spark, dir.toString))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("scrawl").start()
    try {
      val (b1, b2) = recs.splitAt(6)
      drop("b1.warc", b1.toSeq); q.processAllAvailable()
      drop("b2.warc", b2.toSeq); q.processAllAvailable()
      val streamed = spark.table("scrawl").select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      // batch: same containers through the x130 front door
      val pages = graft.queries.Declared.crawlPages(
        graft.sources.FileSources.readWarc(spark, dir.toString))
      val keepers = graft.ext.Urls.urlDedup(
          pages.select(col("url"), col("fetch_id")), "url", "fetch_id")
        .select(col("keeper_id").as("fetch_id"))
      val batch = graft.queries.Declared.crawlKeeperCorpus(pages, keepers)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == batch,
        s"stream front door != batch front door\n s: $streamed\n b: $batch")
      // crawlUrl groups ids by (d - d % 3): pages {0, 3, 6, 9, 12},
      // keeper = min fetch id of each group
      assert(streamed.map(_._1) == Set(1L, 3L, 6L, 9L, 12L))
    } finally q.stop()
  }

  test("streaming normalized dedup: variant twins drop, different text survives") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "secs")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val q = StreamDedup.firstPerNormalizedContent(docs, "text", "ts")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ndedup").start()
    try {
      input.addData((1L, "the same body", 10L), (2L, "a different text", 11L))
      q.processAllAvailable()
      // 3 is a byte-different variant twin of 1 (case/punctuation/
      // spacing — all erased by normalization); 4 is genuinely new
      input.addData((3L, "  THE  same, body!! ", 12L),
        (4L, "the same body indeed", 13L))
      q.processAllAvailable()
      val ids = spark.table("ndedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 4L), s"kept: $ids")
    } finally q.stop()
  }

  test("streaming DSIR gate: stream kept set equals the batch filter exactly") {
    implicit val sqlCtx = spark.sqlContext
    // train on the batch fixture (raw = all docs, target = en)
    val docsB = Tables.load(spark, sf(), "documents")
    val (ratio, dflt) = graft.ext.TrainSet.dsirRatioMap(
      docsB, docsB.filter(col("lang") === "en"), "text", "doc_id", 1024)
    // median-ish threshold so both outcomes are populated
    val thr = 0.0
    val batchKept = StreamCurate.applyDsir(docsB, ratio, dflt, 1024, thr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.nonEmpty && batchKept.size < docsB.count(),
      s"degenerate threshold: ${batchKept.size} kept")
    // replay the fixture + one out-of-corpus doc (unseen grams -> the
    // Laplace floor default decides it) in 2 micro-batches
    val fixture = docsB.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val docsS = input.toDF().toDF("doc_id", "text")
    val q = StreamCurate.applyDsir(docsS, ratio, dflt, 1024, thr)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sdsir").start()
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.toSeq)
      q.processAllAvailable()
      input.addData(b2.toSeq :+ ((9999999L, "zzqx9 qqzv8 vvqk7")))
      q.processAllAvailable()
      val streamKept = spark.table("sdsir").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // the out-of-corpus doc's fate comes from the SAME expression on
      // the batch plane (its unseen grams take trained buckets on
      // collision, the Laplace floor otherwise) — stream == batch
      // either way
      val novelKept = StreamCurate.applyDsir(
        Seq((9999999L, "zzqx9 qqzv8 vvqk7")).toDF("doc_id", "text"),
        ratio, dflt, 1024, thr).count() == 1L
      val want = if (novelKept) batchKept + 9999999L else batchKept
      assert(streamKept == want,
        s"stream/batch divergence: ${streamKept.diff(want)} extra, ${want.diff(streamKept)} missing")
    } finally q.stop()
  }

  test("streaming OOV gate + CDC chunks: stream output equals the batch plane") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docsB = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    val vocab = graft.ext.TextStats.topVocab(docsB, "text", 16).toSeq
    // median-ish threshold so both outcomes are populated on the fixture
    // (sf0.001 OOV-rate quartiles with the top-16 vocab: 0.41/0.45/0.50)
    val thr = 0.45
    val batchKept = StreamCurate.applyOovGate(docsB, vocab, thr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.nonEmpty && batchKept.size < docsB.count(),
      s"degenerate OOV threshold: ${batchKept.size} kept")
    val batchChunks = StreamCurate.chunkCdc(docsB, modulus = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
    val fixture = docsB.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val docsS = input.toDF().toDF("doc_id", "text")
    val qa = StreamCurate.applyOovGate(docsS, vocab, thr)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("soov").start()
    val qb = StreamCurate.chunkCdc(docsS, modulus = 8)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("scdc").start()
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.toSeq); qa.processAllAvailable(); qb.processAllAvailable()
      input.addData(b2.toSeq); qa.processAllAvailable(); qb.processAllAvailable()
      val streamKept = spark.table("soov").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(streamKept == batchKept,
        s"OOV stream/batch divergence: ${streamKept.diff(batchKept)} / ${batchKept.diff(streamKept)}")
      val streamChunks = spark.table("scdc")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
      assert(streamChunks == batchChunks, "CDC stream/batch chunk divergence")
    } finally { qa.stop(); qb.stop() }
  }

  test("streaming PMI count journal: fold-on-read equals the batch report exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docsB = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id").isNotNull)
    val batchReport = graft.ext.TextStats.pmiCollocations(
        docsB, "text", minCount = 3L, k = 30)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(batchReport.size == 30, s"degenerate batch report: $batchReport")
    val dir = java.nio.file.Files.createTempDirectory("pmi_journal").toString
    val fixture = docsB.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = StreamCollocations.journal(
      input.toDF().toDF("doc_id", "text"), dir, "text")
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val journalReport = StreamCollocations.pmiFromJournal(
          spark, dir, minCount = 3L, k = 30)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq
      assert(journalReport == batchReport,
        s"journal/batch PMI divergence: ${journalReport.diff(batchReport)}")
      // at-least-once: re-append batch 0's delta verbatim (a retried
      // micro-batch) — the first-per-key fold must leave the report
      // unchanged
      StreamCollocations.countsDelta(
          b1.toSeq.toDF("doc_id", "text"), "text")
        .withColumn("batch_id", lit(0L))
        .write.mode("append").parquet(dir)
      val afterRetry = StreamCollocations.pmiFromJournal(
          spark, dir, minCount = 3L, k = 30)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq
      assert(afterRetry == batchReport,
        s"retry-duplicated journal broke the PMI fold")
    } finally q.stop()
  }

  test("streaming gate-funnel journal: fold-on-read equals the batch funnel exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docsB = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id").isNotNull)
    val batchFunnel = graft.ext.Curation.gateFunnel(docsB)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(batchFunnel.map(_._2).toSet.contains("kept"),
      s"degenerate batch funnel: $batchFunnel")
    val dir = java.nio.file.Files.createTempDirectory("funnel_journal").toString
    val fixture = docsB.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = StreamCurate.funnelJournal(
      input.toDF().toDF("doc_id", "text"), dir)
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val journalFunnel = StreamCurate.funnelFromJournal(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
      assert(journalFunnel == batchFunnel,
        s"journal/batch funnel divergence: $journalFunnel vs $batchFunnel")
      // at-least-once: a retried micro-batch's delta re-appends
      // verbatim — the first-per-(batch_id, stage) fold must leave the
      // report unchanged
      graft.ext.Curation.funnelCounts(b1.toSeq.toDF("doc_id", "text"))
        .withColumn("batch_id", lit(0L))
        .write.mode("append").parquet(dir)
      val afterRetry = StreamCurate.funnelFromJournal(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
      assert(afterRetry == batchFunnel,
        "retry-duplicated journal broke the funnel fold")
    } finally q.stop()
  }

  test("streaming BPE segmentation: stream output equals the batch plane") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docsB = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    // batch-trained merge list (the x79 artifact shape)
    val merges = graft.ext.TextStats.bpeTrain(docsB, "text", numMerges = 6)
      .map(m => (m._1, m._2)).toSeq
    assert(merges.size == 6, s"fixture yielded ${merges.size} merges")
    val batchSeg = StreamCurate.segmentBpe(docsB, merges)
      .select(col("doc_id"), col("seg.n_words"), col("seg.n_subwords"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fixture = docsB.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = StreamCurate.segmentBpe(input.toDF().toDF("doc_id", "text"), merges)
      .select(col("doc_id"), col("seg.n_words"), col("seg.n_subwords"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sbpe").start()
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val streamSeg = spark.table("sbpe")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamSeg == batchSeg,
        s"BPE stream/batch divergence: ${streamSeg.diff(batchSeg).take(3)} / " +
          s"${batchSeg.diff(streamSeg).take(3)}")
    } finally q.stop()
  }

  test("streaming curation e2e: replayed fixture batches match the batch gates") {
    implicit val sqlCtx = spark.sqlContext
    // replay the real documents fixture in 3 micro-batches, plus an
    // exact duplicate of a known-surviving doc injected in a later batch
    // (fresh id so it passes the hash sample independently)
    val fixture = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val batchKept = graft.ext.Curation.standardGates(
      Tables.load(spark, sf(), "documents"))
      .select("doc_id", "quality", "rep_ratio").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(batchKept.nonEmpty, "fixture produced no gate survivors")
    val survivorText = fixture.toMap.apply(batchKept.keys.min)
    // an id whose hash gate also keeps it, carrying duplicate content
    val dupId = (1000000L to 1001000L).find { id =>
      spark.range(1).select(
        graft.ext.Curation.hashKeep(lit(id), lit("c0"))).collect()(0).getBoolean(0)
    }.get
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "secs")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val q = StreamCurate.curate(docs, "ts")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("scurate").start()
    try {
      val (b1, rest) = fixture.splitAt(fixture.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 3)
      input.addData(b1.map { case (id, t) => (id, t, 10L) }.toSeq)
      q.processAllAvailable()
      input.addData(b2.map { case (id, t) => (id, t, 20L) }.toSeq)
      q.processAllAvailable()
      input.addData(b3.map { case (id, t) => (id, t, 30L) } :+ ((dupId, survivorText, 30L)))
      q.processAllAvailable()
      val streamed = spark.table("scurate")
        .select("doc_id", "quality", "rep_ratio").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      // the duplicate content arrived after its original -> dropped, so
      // the streamed survivor set is EXACTLY the batch gate output
      // (fixture texts are unique, so content dedup drops nothing else)
      assert(streamed == batchKept,
        s"streamed=${streamed.keys.toSeq.sorted} batch=${batchKept.keys.toSeq.sorted}")
      assert(!streamed.contains(dupId))
    } finally q.stop()
  }

  test("streaming temperature apply: kept set equals batch temperatureSample (x31)") {
    import graft.ext.Curation
    implicit val sqlCtx = spark.sqlContext
    // batch-train the per-lang rate table on the corpus snapshot, and the
    // batch kept set it implies (exactly the x31 declared query)
    val docsB = Tables.load(spark, sf(), "documents").select("lang", "doc_id")
    val rates = Curation.temperatureRates(docsB, "lang")
    val batchKept = Curation.temperatureSample(docsB, "lang", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.nonEmpty)
    // replay the same corpus through the stream in 2 micro-batches
    val fixture = docsB.collect().map(r => (r.getString(0), r.getLong(1)))
    val input = MemoryStream[(String, Long)]
    val stream = input.toDF().toDF("lang", "doc_id")
    val q = StreamCurate.applyTemperature(stream, rates, "lang", "doc_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stemp").start()
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val streamed = spark.table("stemp").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // the md5 gate is deterministic and stateless: the stream keeps
      // exactly the batch sample, regardless of batching
      assert(streamed == batchKept,
        s"stream/batch diff: ${(streamed diff batchKept) ++ (batchKept diff streamed)}")
      // thr column is dropped, payload columns survive
      assert(spark.table("stemp").columns.toSeq == Seq("lang", "doc_id"))
    } finally q.stop()
  }

  test("streaming e2e: curate + applyTemperature == batch gates + temperature sample") {
    import graft.ext.Curation
    implicit val sqlCtx = spark.sqlContext
    // the docstring's "ingest-time gating" deployment: one streaming
    // pipeline of standardGates + content dedup + batch-trained
    // temperature gate, vs the same composition run in batch
    val docsB = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text", "lang")
    val curatedB = Curation.standardGates(docsB)
    val rates = Curation.temperatureRates(curatedB, "lang")
    val batchKept = StreamCurate.applyTemperature(curatedB, rates, "lang", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.nonEmpty, "batch composition kept nothing")
    val fixture = docsB.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String, Long)]
    val stream = input.toDF().toDF("doc_id", "text", "lang", "secs")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val q = StreamCurate.applyTemperature(
        StreamCurate.curate(stream, "ts"), rates, "lang", "doc_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stempe2e").start()
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.map { case (id, t, l) => (id, t, l, 10L) }.toSeq)
      q.processAllAvailable()
      input.addData(b2.map { case (id, t, l) => (id, t, l, 20L) }.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("stempe2e").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // unique fixture texts -> dedup drops nothing; every gate and the
      // temperature hash-gate are deterministic column expressions, so
      // the streamed kept set is exactly the batch composition's
      assert(streamed == batchKept,
        s"stream/batch diff: ${(streamed diff batchKept) ++ (batchKept diff streamed)}")
    } finally q.stop()
  }

  test("streaming decontam apply: stream drops exactly the batch-flagged ids") {
    import graft.ext.Curation
    implicit val sqlCtx = spark.sqlContext
    // batch-train the contaminated set against a benchmark slice, then
    // replay the corpus through the stream gate in 2 micro-batches
    val emb = Tables.load(spark, sf(), "embeddings")
    val corpusB = emb.filter(col("vec_id") % 37 =!= 0)
    val flagged = Curation.semanticDecontam(
      corpusB, emb.filter(col("vec_id") % 37 === 0), threshold = 0.35)
    val flaggedIds = flagged.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(flaggedIds.nonEmpty, "fixture produced no contaminated ids")
    val fixture = corpusB.select("vec_id").collect().map(_.getLong(0))
    val input = MemoryStream[Long]
    val stream = input.toDF().toDF("vec_id")
    val q = StreamCurate.applyDecontam(stream, flagged, "vec_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sdecontam").start()
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val streamed = spark.table("sdecontam").collect().map(_.getLong(0)).toSet
      // kept set = corpus minus the batch-flagged leaks, batching-invariant
      assert(streamed == fixture.toSet.diff(flaggedIds))
      // an id the batch pass never saw passes through (not an allow-list)
      input.addData(Seq(999999999L)); q.processAllAvailable()
      assert(spark.table("sdecontam").collect().map(_.getLong(0))
        .contains(999999999L))
    } finally q.stop()
  }

  test("streaming chunk + split: per-row curation ops stream unchanged") {
    import graft.ext.Curation
    implicit val sqlCtx = spark.sqlContext
    // chunkWithOverlap and splitAssign are pure per-row plans — the same
    // call works on a streaming frame and must emit exactly the batch
    // rows regardless of micro-batching
    val docsB = Tables.load(spark, sf(), "documents").select("doc_id", "text")
    val batch = Curation.splitAssign(
      Curation.chunkWithOverlap(docsB, "text", "doc_id", 80, 40), "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getString(4))).toSet
    val fixture = docsB.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = Curation.splitAssign(
        Curation.chunkWithOverlap(stream, "text", "doc_id", 80, 40), "doc_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("schunk").start()
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val streamed = spark.table("schunk").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getInt(3), r.getString(4))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming boilerplate gate: bloom-trained stream drop equals the batch df gate") {
    import graft.ext.Curation
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf(), "documents").select("doc_id", "text")
    val batchKept = Curation.boilerplateFraction(docs, "text", "doc_id", k = 3, minDf = 3)
      .filter(col("boiler_frac") < 0.5)
      .collect().map(_.getLong(0)).toSet
    val bloom = Curation.commonShingleBloom(docs, "text", k = 3, minDf = 3)
    // no-false-negative direction, batch-checked per doc on the RAW
    // counts (boiler_frac itself is rounded to 6dp — comparing
    // fractions would trip on the rounding): the bloom common count can
    // only inflate the exact df count
    val counts = Curation.boilerplateFraction(docs, "text", "doc_id", k = 3, minDf = 3)
      .join(docs.select(col("doc_id"),
        size(filter(graft.ext.Dedup.shingles(col("text"), 3), s =>
          graft.functions.BloomGate.might_contain(lit(bloom), xxhash64(s))))
          .cast("long").as("bloom_common")), "doc_id")
    assert(counts.filter(col("bloom_common") < col("n_common")).count() == 0,
      "bloom common count below the exact df count (false negative)")
    // a trained set past Spark's silent bloom sizing clamp must fail
    // loudly (undersized filter => fp rate explodes => gate mass-drops)
    val capKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val prev = spark.conf.getOption(capKey)
    spark.conf.set(capKey, "2")
    try intercept[IllegalArgumentException] {
      Curation.commonShingleBloom(docs, "text", k = 3, minDf = 3)
    } finally prev match {
      case Some(v) => spark.conf.set(capKey, v)
      case None => spark.conf.unset(capKey)
    }
    val fixture = docs.as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = StreamCurate.applyBoilerplateGate(
        input.toDF().toDF("doc_id", "text"), bloom, maxFrac = 0.5)
      .select("doc_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sboiler").start()
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val streamKept = spark.table("sboiler").collect().map(_.getLong(0)).toSet
      assert(streamKept == batchKept)
    } finally q.stop()
  }

  test("streaming ANN: batch-indexed LSH probe equals the batch lshTopKBanded") {
    import graft.ext.Similarity
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, sf(), "embeddings")
    val queriesB = emb.filter(col("vec_id") % 50 === 0)
    val batch = Similarity.lshTopKBanded(queriesB, emb, k = 5,
        bands = 16, bitsPerBand = 4, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // index built once from the batch snapshot; queries stream in two
    // micro-batches — each query answers within its own batch, so the
    // union of per-batch top-k must equal the batch operator exactly
    val index = StreamSimilarity.bandedIndex(emb, bands = 16, bitsPerBand = 4, dim = 64)
    val fixture = queriesB
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val input = MemoryStream[(Long, Seq[Double])]
    val cands = StreamSimilarity.probeCandidates(
      input.toDF().toDF("vec_id", "embedding"), index,
      bands = 16, bitsPerBand = 4, dim = 64)
    val buf = scala.collection.mutable.Set[(Long, Long, Long, Double)]()
    val q = cands.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = StreamSimilarity.topKPerBatch(b, 5).collect()
        buf.synchronized {
          rows.foreach(r => buf +=
            ((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))))
        }
      }.start()
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      assert(buf.toSet == batch)
    } finally q.stop()
  }

  test("streaming cross-corpus dedup: per-batch index probe equals batch crossDupPairs") {
    import graft.ext.Dedup
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf(), "documents")
    val incoming = docs.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L) // disjoint id spaces
    val existing = docs.filter(col("doc_id") % 5 =!= 0)
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = canon(Dedup.crossDupPairs(incoming, existing,
      "text", "doc_id", k = 3, threshold = 0.2).collect())
    // corpus index + shingle table built once; incoming docs stream in
    // two micro-batches — each batch probes independently, so the
    // union of per-batch pairs must equal the batch operator exactly
    val index = Dedup.minhashBandIndex(existing, "text", "doc_id", k = 3).persist()
    val shingles = Dedup.shingleFrame(existing, "text", "doc_id", k = 3).persist()
    try {
      val fixture = incoming.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect()
      val input = MemoryStream[(Long, String)]
      val buf = scala.collection.mutable.Set[(Long, Long, Double)]()
      val q = input.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = StreamDedup.crossDupProbe(b, index, shingles,
            "text", "doc_id", k = 3, threshold = 0.2).collect()
          buf.synchronized {
            rows.foreach(r => buf += ((r.getLong(0), r.getLong(1), r.getDouble(2))))
          }
        }.start()
      try {
        val (b1, b2) = fixture.splitAt(fixture.length / 2)
        input.addData(b1.toSeq); q.processAllAvailable()
        input.addData(b2.toSeq); q.processAllAvailable()
        assert(batch.nonEmpty && buf.toSet == batch)
      } finally q.stop()
    } finally { index.unpersist(); shingles.unpersist() }
  }

  test("streaming as-of: stream-static interval probe equals the batch asofJoin") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.load(spark, sf(), "events").filter(col("ts").isNotNull)
    val l = ev.filter(col("event_id") % 7 === 0)
    val r = ev.filter(col("event_id") % 7 =!= 0)
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(x => (x.getLong(0),
        if (x.isNullAt(3)) None else Some(x.getLong(3)),
        if (x.isNullAt(4)) None else Some(x.getTimestamp(4).getTime))).toSet
    val batch = canon(graft.operators.AsofJoin.asofJoin(
      l, r, "user_id", "ts", "event_id", "event_id").collect())
    // index built once from the static series; events stream in two
    // micro-batches — each event answers within its own batch (the
    // probe is stateless), so the union must equal the batch operator
    val index = StreamAsof.intervalIndex(r, "user_id", "ts", "event_id")
      .persist()
    try {
      val fixture = l.select(col("user_id"), col("ts"), col("event_id"))
        .as[(Long, java.sql.Timestamp, Long)].collect()
      val input = MemoryStream[(Long, java.sql.Timestamp, Long)]
      val probed = StreamAsof.asofProbe(
        input.toDF().toDF("user_id", "ts", "event_id"),
        index, "user_id", "ts", "event_id")
      val q = probed.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("sasof").start()
      try {
        val (b1, b2) = fixture.splitAt(fixture.length / 2)
        input.addData(b1.toSeq); q.processAllAvailable()
        input.addData(b2.toSeq); q.processAllAvailable()
        val streamed = canon(spark.table("sasof").collect())
        assert(batch.nonEmpty && streamed == batch)
      } finally q.stop()
    } finally index.unpersist()
  }

  test("streaming session_window: replayed fixture sessions equal the batch operator") {
    import graft.operators.SessionWindows
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.load(spark, sf(), "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
    val batch = SessionWindows.sessionCounts(ev, "user_id", "ts", "30 minutes")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // same groupBy, streaming: two in-order micro-batches, then a
    // far-future sentinel (key -1) advances the watermark past every
    // session end so append mode emits them all
    val fixture = ev.select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)].collect().sortBy(_._2.getTime)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = SessionWindows.sessionCounts(
      input.toDF().toDF("user_id", "ts").withWatermark("ts", "1 second"),
      "user_id", "ts", "30 minutes")
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssess").start()
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val maxTs = fixture.last._2.getTime
      input.addData(Seq((-1L, new java.sql.Timestamp(maxTs + 86400L * 1000L))))
      q.processAllAvailable()
      val streamed = spark.table("ssess").filter(col("k") =!= -1L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(batch.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("streaming quantization: map-only int8 op streams unchanged") {
    import graft.ext.Similarity
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, sf(), "embeddings")
    val batch = Similarity.quantizeInt8(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2))).toSet
    val fixture = emb
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val input = MemoryStream[(Long, Seq[Double])]
    val q = Similarity.quantizeInt8(input.toDF().toDF("vec_id", "embedding"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("squant").start()
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val streamed = spark.table("squant").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("health e2e: MemoryStream -> progressMonitor -> bridge -> HTTP /health/live") {
    import graft.health.{Liveness, ProgressBridge}
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamCounters.CounterEvent]
    val t0 = 1704067200000L
    val monitor = StreamCounters.progressMonitor(input.toDS(), nowMs = () => t0 + 1000,
      enableTimeout = false)
    val bridge = new ProgressBridge
    val q = monitor.writeStream.outputMode(OutputMode.Update())
      .foreachBatch((b: org.apache.spark.sql.Dataset[StreamCounters.ProgressStatus],
                     _: Long) => bridge.update(b.collect().toSeq))
      .start()
    val server = new Liveness.Server(0, () => Seq(bridge.check("consumer-progress")))
    try {
      input.addData(
        StreamCounters.CounterEvent("c1", "t1", 0, 5L, t0),
        StreamCounters.CounterEvent("c1", "t1", 1, 7L, t0))
      q.processAllAvailable()
      val url = new java.net.URL(s"http://127.0.0.1:${server.boundPort}/health/live")
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val body = scala.io.Source.fromInputStream(conn.getInputStream).mkString
      assert(body.contains("\"status\":\"UP\""))
      assert(body.contains("\"records\":\"12\""))
      assert(body.contains("\"partitions\":\"2\""))
      assert(body.contains("\"inactivePartitions\":\"0\""))
    } finally { server.stop(); q.stop() }
  }

  test("health e2e DOWN transition: liveness flips 200 -> 503 -> 200 across the 5-min threshold") {
    // the reference's CounterProgressCheck DOWN path
    // (CounterProgressCheck.java:80-121): a partition whose last activity
    // is >= 5 min before "now" turns the whole probe DOWN. Driven here
    // with a VIRTUAL clock: same monitor, the clock advances past the
    // threshold between micro-batches (no wall-clock sleeping).
    import graft.health.{Liveness, ProgressBridge}
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamCounters.CounterEvent]
    val t0 = 1704067200000L
    @volatile var now = t0 + 1000L
    val monitor = StreamCounters.progressMonitor(input.toDS(), nowMs = () => now,
      enableTimeout = false)
    val bridge = new ProgressBridge
    val q = monitor.writeStream.outputMode(OutputMode.Update())
      .foreachBatch((b: org.apache.spark.sql.Dataset[StreamCounters.ProgressStatus],
                     _: Long) => bridge.update(b.collect().toSeq))
      .start()
    val server = new Liveness.Server(0, () => Seq(bridge.check("consumer-progress")))
    def probe(): (Int, String) = {
      val url = new java.net.URL(s"http://127.0.0.1:${server.boundPort}/health/live")
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      val code = conn.getResponseCode
      val stream = if (code == 200) conn.getInputStream else conn.getErrorStream
      (code, scala.io.Source.fromInputStream(stream).mkString)
    }
    try {
      // 1. fresh activity -> UP
      input.addData(StreamCounters.CounterEvent("c1", "t1", 0, 5L, t0))
      q.processAllAvailable()
      val (codeUp, bodyUp) = probe()
      assert(codeUp == 200 && bodyUp.contains("\"status\":\"UP\""))
      // 2a. at EXACTLY the 5-minute mark the partition is still UP —
      //     the reference's isBefore(now - 5min) is strict
      //     (CounterProgressCheck.java:87)
      now = t0 + StreamCounters.inactivityMs
      input.addData(StreamCounters.CounterEvent("c1", "t1", 0, 0L, t0))
      q.processAllAvailable()
      val (codeEdge, bodyEdge) = probe()
      assert(codeEdge == 200 && bodyEdge.contains("\"status\":\"UP\""),
        s"exactly 5 min must still be UP, got $codeEdge")
      // 2b. one tick past the threshold, still no new activity -> DOWN
      now = t0 + StreamCounters.inactivityMs + 1
      input.addData(StreamCounters.CounterEvent("c1", "t1", 0, 0L, t0))
      q.processAllAvailable()
      val (codeDown, bodyDown) = probe()
      assert(codeDown == 503, s"expected 503 at the staleness threshold, got $codeDown")
      assert(bodyDown.contains("\"status\":\"DOWN\""))
      assert(bodyDown.contains("\"inactivePartitions\":\"1\""))
      // counter survives the stale period (reference keeps counts)
      assert(bodyDown.contains("\"records\":\"5\""))
      // 3. activity resumes -> UP again, count accumulated
      input.addData(StreamCounters.CounterEvent("c1", "t1", 0, 2L, now))
      q.processAllAvailable()
      val (codeBack, bodyBack) = probe()
      assert(codeBack == 200 && bodyBack.contains("\"status\":\"UP\""))
      assert(bodyBack.contains("\"records\":\"7\""))
    } finally { server.stop(); q.stop() }
  }

  test("X5e streaming drift journal: multi-batch fold equals the batch report exactly") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("drift_journal").toString
    val docsB = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id").isNotNull && col("source").isNotNull)
    val batchReport = graft.ext.TextStats
      .sourceDrift(docsB, "text", "source", numBuckets = 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // replay the fixture in 2 micro-batches; integer histograms fold
    // exactly, so the journal report must equal the batch report —
    // including n_docs and n_grams, not just the rounded KL
    val fixture = docsB.select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)]
    val stream = input.toDF().toDF("doc_id", "text", "source")
    val q = StreamDrift.journal(stream, dir, "text", "source", numBuckets = 256)
    try {
      val (b1, b2) = fixture.splitAt(fixture.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    // two batches of deltas landed (doc-count rows present in both)
    val nBatches = spark.read.parquet(dir)
      .select("batch_id").distinct().count()
    assert(nBatches == 2, s"expected 2 journal batches, got $nBatches")
    val journalReport = StreamDrift.driftFromJournal(spark, dir, numBuckets = 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(journalReport == batchReport,
      s"journal/batch drift divergence: ${journalReport.diff(batchReport)}")

    // at-least-once retry: foreachBatch may replay a micro-batch, landing
    // its delta rows a second time with the SAME batch_id. Simulate by
    // re-appending one batch's rows verbatim — the fold collapses retry
    // copies per (batch_id, grp, bucket) before summing, so the report
    // must be unchanged
    val replayed = spark.read.parquet(dir).filter(col("batch_id") === 0L)
    replayed.write.mode("append").parquet(dir)
    val afterRetry = StreamDrift.driftFromJournal(spark, dir, numBuckets = 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(afterRetry == batchReport,
      s"retry-duplicated journal broke the fold: ${afterRetry.diff(batchReport)}")
  }

  test("X5h streaming twin: HLL vocab journal tracks the exact growth curve") {
    implicit val sqlCtx = spark.sqlContext
    // micro-batches = x82's id-ordered checkpoint slices, so journal
    // prefix k corresponds exactly to checkpoint k+1 of the batch
    // curve; token mass is exact on both planes, vocab/doc counts are
    // HLL estimates that must land within the lgK=12 bound (and are
    // exact here — the fixture vocabulary is far below the sparse
    // threshold)
    val dir = java.nio.file.Files.createTempDirectory("vocab_journal").toString
    val docs = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id").isNotNull).select("doc_id", "text")
    val exact = graft.ext.TextStats.vocabGrowth(docs, "text", "doc_id", steps = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val cutoffs = exact.map(_._2)
    val slices = cutoffs.zip(Long.MinValue +: cutoffs.dropRight(1)).map {
      case (hi, lo) => docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .collect().map(r => (r.getLong(0), r.getString(1)))
    }
    val input = MemoryStream[(Long, String)]
    val q = StreamSketches.vocabJournal(
      input.toDF().toDF("doc_id", "text"), dir, "text", "doc_id")
    try {
      slices.foreach { s => input.addData(s.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    // at-least-once retry: re-append batch 0's row — the curve fold
    // must collapse the copy
    val replay = spark.read.parquet(dir).filter(col("batch_id") === 0L)
    replay.write.mode("append").parquet(dir)
    val curve = StreamSketches.vocabCurveFromJournal(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(curve.length == exact.length, s"${curve.length} journal prefixes")
    curve.zip(exact).foreach { case ((k, vEst, nTok, dEst), (ek, _, vocab, nTokens, nDocs)) =>
      assert(k + 1 == ek)
      assert(nTok == nTokens, s"checkpoint $ek: token mass $nTok != exact $nTokens")
      assert(math.abs(vEst - vocab).toDouble / vocab <= 0.02,
        s"checkpoint $ek: vocab estimate $vEst vs exact $vocab")
      assert(math.abs(dEst - nDocs).toDouble / nDocs <= 0.02,
        s"checkpoint $ek: doc estimate $dEst vs exact $nDocs")
    }
  }

  test("X17 streaming sketch journal: multi-batch fold equals the one-shot delta") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.FreqSketch._
    val dir = java.nio.file.Files.createTempDirectory("sketch_journal").toString
    // 3 micro-batches of 1500 rows each: 3000 distinct ids (each id
    // seen twice across batches — the re-ingest scenario), uniform
    // values 0..4499, 3 hot terms in a unique tail. 3000 distinct at
    // lgK=12 is the DENSE regime, so the HLL fold must equal the
    // one-shot union EXACTLY; 4500 < 16384 keeps theta exact.
    def batch(i: Int) = (0 until 1500).map { j =>
      val row = i * 1500 + j
      (row.toLong % 3000, row.toDouble,
        if (j % 3 < 2) s"hot${j % 3}" else s"u$row")
    }
    val input = MemoryStream[(Long, Double, String)]
    val stream = input.toDF().toDF("id", "v", "term")
    val q = StreamSketches.journal(stream, dir, "id", "v", "term")
    try {
      (0 until 3).foreach { i => input.addData(batch(i): _*); q.processAllAvailable() }
    } finally q.stop()
    val journal = spark.read.parquet(dir)
    assert(journal.count() == 3, s"expected 3 journal rows, got ${journal.count()}")
    val folded = StreamSketches.fold(spark, dir).collect()(0)
    // exact row total rides the journal
    assert(folded.getLong(0) == 4500L)
    // HLL fold == one-shot delta over the union of all batches (dense
    // regime: associativity is exact)
    val all = (0 until 3).flatMap(batch).toDF("id", "v", "term")
    val oneShot = StreamSketches.sketchDelta(all, "id", "v", "term")
    val oneHll = oneShot.select(hll_sketch_estimate(col("hll"))).collect()(0).getLong(0)
    assert(folded.getLong(1) == oneHll,
      s"streamed HLL fold ${folded.getLong(1)} != one-shot $oneHll")
    // KLL median of uniform 0..4499 within the k=200 rank bound
    assert(math.abs(folded.getDouble(2) / 4499.0 - 0.5) <= 0.02,
      s"journal median ${folded.getDouble(2)}")
    // theta set algebra across journals: the folded blob intersects a
    // fresh batch-side sketch exactly (both in the exact regime)
    val inter = spark.range(2000, 5000).agg(
        theta_sketch_agg(col("id"), 14).as("skb"))
      .crossJoin(StreamSketches.fold(spark, dir))
      .select(theta_sketch_estimate(
        theta_intersection(col("theta"), col("skb")))).collect()(0).getLong(0)
    assert(inter == 1000L, s"journal-vs-batch theta intersection $inter != 1000")
    // freq contract on the folded blob: hot terms (1000 each) found,
    // estimates bounded
    val fr = StreamSketches.fold(spark, dir)
      .select(freq_estimate(col("freq"), lit("hot0")).as("est"),
        freq_max_error(col("freq")).as("me"),
        freq_items(col("freq")).getField("item").as("items")).collect()(0)
    assert(fr.getLong(0) <= 1500L && 1500L <= fr.getLong(0) + fr.getLong(1),
      s"freq bound: est=${fr.getLong(0)} me=${fr.getLong(1)}")
    assert(fr.getSeq[String](2).exists(_.startsWith("hot")),
      "hot terms missing from folded frequent set")
  }

  test("X7j distilled gate: stream kept set == batch kept set under the frozen student") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // two separable populations (the X7j CurationSpec fixture shape):
    // stopword-rich English prose (teacher keep) vs German-marker noise
    val keepWords = Seq("the", "and", "of", "river", "water", "stone",
      "light", "garden", "winter", "morning")
    val dropWords = Seq("der", "und", "das", "haus", "baum", "katze",
      "hund", "nicht", "mit", "ein")
    // every 4th token a class marker, the rest unique — keeps the
    // repetition ratio low so the keep population actually clears the
    // teacher's repetition gate (an all-marker doc is ~0.7 repetitive
    // and the teacher drops BOTH classes, making the claim vacuous)
    def doc(i: Long, ws: Seq[String]): String =
      (0 until 40).map(j =>
        if (j % 4 == 0) ws(((i + j) % ws.size).toInt) else s"tok${i}x$j")
        .mkString(" ")
    val rows = (0L until 120L).map(i =>
      (i, if (i % 2 == 0) doc(i, keepWords) else doc(i, dropWords)))
    val docsDf = rows.toDF("doc_id", "text")
    val student = graft.ext.TextStats.nbTrain(
      docsDf.withColumn("teacher",
        graft.ext.Curation.teacherLabel(col("text"))),
      "text", "teacher", "doc_id", 256)
    val batchKept = StreamCurate.applyDistilledGate(docsDf, student)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.nonEmpty && batchKept.size < rows.size,
      s"degenerate fixture: ${batchKept.size} of ${rows.size} kept")
    val input = MemoryStream[(Long, String)]
    val gated = StreamCurate.applyDistilledGate(
      input.toDF().toDF("doc_id", "text"), student)
    val q = gated.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dsg").start()
    try {
      rows.grouped(40).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamKept = spark.table("dsg")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamKept == batchKept,
        s"stream kept ${streamKept.size} != batch kept ${batchKept.size}; " +
          s"diff=${(streamKept diff batchKept) ++ (batchKept diff streamKept)}")
    } finally q.stop()
  }

  test("X1e line journal: folded drops == batch lineDrops over the union; replays collapse") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // cross-doc boilerplate spread ACROSS batches: 7 recurring header
    // lines + a shared footer on every 4th doc; the rest unique
    val rows = (0L until 90L).map { i =>
      val tail = if (i % 4 == 0) "footer shared" else s"solo $i"
      (i, s"boiler ${i % 7}\nunique token $i\n$tail")
    }
    val docsDf = rows.toDF("doc_id", "text")
    val lines = split(col("text"), "\n")
    val dir = java.nio.file.Files.createTempDirectory("graft-linejournal")
      .toString + "/j"
    val input = MemoryStream[(Long, String)]
    val q = StreamDedup.lineJournal(
      input.toDF().toDF("doc_id", "text"), dir, "doc_id", lines)
    try {
      rows.grouped(30).foreach { b =>
        input.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
        .sortBy(_._1).toSeq
    val batchDrops = canon(graft.ext.Dedup.lineDrops(docsDf, "doc_id", lines))
    assert(batchDrops.nonEmpty, "vacuous fixture: no cross-doc duplicates")
    assert(canon(StreamDedup.lineDropsFromJournal(
      spark, dir, docsDf, "doc_id", lines)) == batchDrops,
      "journal-folded drops differ from the batch election")
    // at-least-once replay: byte-identical rows re-appended for batch 0
    // must collapse in the fold, not double the counts
    spark.read.parquet(dir).filter(col("batch_id") === 0L)
      .write.mode("append").parquet(dir)
    assert(canon(StreamDedup.lineDropsFromJournal(
      spark, dir, docsDf, "doc_id", lines)) == batchDrops,
      "replayed journal rows changed the fold")
  }

  test("X5k perplexity gate: stream kept set == batch head+middle tiers under the frozen LM") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.TextStats
    val docs = Tables.load(spark, sf(), "documents")
    val m = TextStats.refLmTrain(docs, "text", "lang",
      col("source").isin("src0", "src1"), numBuckets = 256)
    val tiers = TextStats.perplexityTiers(docs, "text", "lang", "doc_id", m)
      .collect()
    val thrMap = tiers.map(r => r.getString(0) -> r.getDouble(2)).toMap
    // batch non-tail membership per lang: counts sum, doc-xor folds
    val want = tiers.filter(_.getString(1) != "tail")
      .groupBy(_.getString(0)).map { case (l, rs) =>
        l -> ((rs.map(_.getLong(4)).sum, rs.map(_.getLong(7)).reduce(_ ^ _)))
      }
    val rows = docs.select("doc_id", "lang", "text").collect()
      .filter(r => !r.isNullAt(0))
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)]
    val gated = StreamCurate.applyPerplexityGate(
      input.toDF().toDF("doc_id", "lang", "text"), m, thrMap)
    val q = gated.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ppxg").start()
    try {
      rows.grouped(rows.length / 3 + 1).foreach { b =>
        input.addData(b.toSeq: _*); q.processAllAvailable() }
      val got = spark.table("ppxg").groupBy("lang")
        .agg(count(lit(1)).as("n"),
          bit_xor(conv(substring(md5(col("doc_id").cast("string")), 1, 15),
            16, 10).cast("long")).as("x"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got == want, s"stream $got vs batch $want")
    } finally q.stop()
  }

  test("X7k epoch gate: stream instance multiset == batch epochUpsample under frozen rates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.Curation
    val docs = Tables.load(spark, sf(), "documents")
    val targets = Seq("en" -> 0.5, "zh" -> 0.25, "de" -> 0.15,
      "fr" -> 0.07, "es" -> 0.03)
    val rates = Curation.epochRates(docs, "lang", "text", targets, 60000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(5), r.getString(6))))
      .toMap
    def instAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("lang").agg(count(lit(1)).as("n"),
        bit_xor(conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":"), col("copy").cast("string"))), 1, 15), 16, 10)
          .cast("long")).as("x"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val want = instAgg(Curation.epochUpsample(
      docs, "lang", "doc_id", "text", targets, 60000L))
    val rows = docs.select("doc_id", "lang").collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val gated = StreamCurate.applyEpochGate(
      input.toDF().toDF("doc_id", "lang"), rates)
    val q = gated.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("epochg").start()
    try {
      rows.grouped(rows.length / 3 + 1).foreach { b =>
        input.addData(b.toSeq: _*); q.processAllAvailable() }
      val got = instAgg(spark.table("epochg"))
      assert(got == want, s"stream $got vs batch $want")
    } finally q.stop()
  }

  test("X22b streaming packer == batch packChunks over monotone multi-batch arrival") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // (group, order_id, tok): two groups, 2 shards, token counts chosen
    // so chunks straddle batch boundaries (a partial tail chunk must
    // carry across micro-batches) and one doc (tok=13 > capacity=8)
    // overflows a whole chunk by itself
    val rows = (0L until 60L).map { i =>
      val grp = if (i % 3 == 0) "en" else "de"
      val tok = (i * 7 % 11) + 1 + (if (i == 17) 12L else 0L)
      (grp, i, tok)
    }
    val batches = rows.grouped(20).toSeq // monotone in order_id per shard
    val input = MemoryStream[(String, Long, Long)]
    val packed = StreamPack.packStream(
      input.toDF().toDF("grp", "doc_id", "tok"),
      "grp", "doc_id", col("tok"), capacity = 8, nShards = 2)
    val q = packed.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("spk").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("spk")
        .select("group", "shard", "order_id", "tok", "cum", "chunk_id")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      val batchSide = graft.ext.Curation.packChunks(
          rows.toDF("grp", "doc_id", "tok"), "grp", "doc_id", col("tok"),
          capacity = 8, nShards = 2)
        .select(col("grp"), col("shard"), col("doc_id"), col("tok"),
          col("cum"), col("chunk_id"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      assert(got.size == rows.size, s"stream emitted ${got.size} rows")
      assert(got == batchSide,
        s"stream != batch; stream-only=${(got -- batchSide).take(3)} " +
          s"batch-only=${(batchSide -- got).take(3)}")
    } finally q.stop()
  }

  test("X26 streaming extraction == batch Extract over micro-batch arrival") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.Extract
    val docs = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        Extract.htmlWrap(col("doc_id"), col("text")).as("html"))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .agg(count(lit(1)),
        sum(col("n_blocks")), sum(col("n_kept")),
        bit_xor(conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":"), col("clean_text"))), 1, 15), 16, 10).cast("long")))
      .head().toSeq
    val want = agg(StreamCurate.applyExtract(docs))
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = StreamCurate.applyExtract(
        input.toDF().toDF("doc_id", "html"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("xtr").start()
    try {
      rows.grouped(rows.length / 3 + 1).foreach { b =>
        input.addData(b.toSeq: _*); q.processAllAvailable() }
      val got = agg(spark.table("xtr"))
      assert(got == want, s"stream $got vs batch $want")
    } finally q.stop()
  }

  test("X5f-c streaming unigram encode == batch over micro-batch arrival") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.TextStats
    val docs = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id").isNotNull).select("doc_id", "text")
    val table = TextStats.unigramTrain(docs, "text",
      maxPieceLen = 4, minCount = 2, rounds = 2)
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        concat_ws(" ", col("ids").cast("array<string>")).as("istr"))
      .agg(count(lit(1)),
        bit_xor(conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":"), col("istr"))), 1, 15), 16, 10).cast("long")))
      .head().toSeq
    val want = agg(StreamCurate.applyUnigramEncode(docs, table))
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = StreamCurate.applyUnigramEncode(
        input.toDF().toDF("doc_id", "text"), table)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("uenc").start()
    try {
      rows.grouped(rows.length / 3 + 1).foreach { b =>
        input.addData(b.toSeq: _*); q.processAllAvailable() }
      val got = agg(spark.table("uenc"))
      assert(got == want, s"stream $got vs batch $want")
    } finally q.stop()
  }

  test("X5f-e streaming wordpiece encode == batch over micro-batch arrival") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.TextStats
    val docs = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id").isNotNull).select("doc_id", "text")
    val merges = TextStats.wordPieceTrain(docs, "text", numMerges = 8)
    val vocab = TextStats.wordPieceVocab(docs, "text", merges.toSeq)
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        concat_ws(" ", col("ids").cast("array<string>")).as("istr"))
      .agg(count(lit(1)),
        bit_xor(conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":"), col("istr"))), 1, 15), 16, 10).cast("long")))
      .head().toSeq
    val want = agg(StreamCurate.applyWordPieceEncode(docs, vocab))
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = StreamCurate.applyWordPieceEncode(
        input.toDF().toDF("doc_id", "text"), vocab)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wpenc").start()
    try {
      rows.grouped(rows.length / 3 + 1).foreach { b =>
        input.addData(b.toSeq: _*); q.processAllAvailable() }
      val got = agg(spark.table("wpenc"))
      assert(got == want, s"stream $got vs batch $want")
    } finally q.stop()
  }
}
