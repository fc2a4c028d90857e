package graft

import graft.ext.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSuite {
  import spark.implicits._

  test("PII redaction replaces email, SSN and phone with typed placeholders") {
    val df = Seq("mail a.b+c@test.org or call 555-123-4567; ssn 123-45-6789 stays out")
      .toDF("text")
    val got = df.select(Curation.redactPii(col("text"))).collect()(0).getString(0)
    assert(got == "mail <EMAIL> or call <PHONE>; ssn <SSN> stays out")
  }

  test("PII counts per class, zero when clean") {
    val df = Seq(
      "a@b.co and c@d.io, ssn 111-22-3333",
      "no pii at all").toDF("text")
    val got = df
      .select(Curation.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()
    assert(got(0).getInt(0) == 2 && got(0).getInt(1) == 1 && got(0).getInt(2) == 0)
    assert(got(1).getInt(0) == 0 && got(1).getInt(1) == 0 && got(1).getInt(2) == 0)
  }

  test("X7i gate funnel: crafted one-doc-per-stage attribution + fixture reconciliation") {
    // md5('graft'||id) prefixes: 1->27, 2->61, 3->9f pass thr c0;
    // 4->c8 fails the sample gate. 7->11 passes and survives all gates.
    val docs = Seq(
      (4L, "whatever text this is"), // sample (hash >= c0)
      (1L, "der die das und ist nicht mit ein " * 4), // langid: de
      (2L, "the and xyzq"), // en but 12 chars -> quality 0.5 < 0.8
      (3L, "the " * 50), // quality 1.0 but rep 0.98 > 0.6
      (7L, "the quick brown fox jumps over the lazy dog and it is " +
        "that good for all of them to see what comes next in the story")
    ).toDF("doc_id", "text")
    val rows = Curation.gateFunnel(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(4)))
    assert(rows.toSeq == Seq((0L, "sample", 1L, 0.2), (1L, "langid", 1L, 0.2),
      (2L, "quality", 1L, 0.2), (3L, "repetition", 1L, 0.2),
      (4L, "kept", 1L, 0.2)), rows.mkString(";"))
    // fixture reconciliation: the funnel partitions the corpus exactly —
    // docs and token mass fold back to corpus totals, and the kept row
    // equals standardGates' survivor count (the e2e rows additionally
    // drop near-dup non-survivors, which is corpus-relative, not a gate)
    val corpus = Tables.load(spark, sf(), "documents")
    val fx = Curation.gateFunnel(corpus).collect()
    assert(fx.map(_.getLong(2)).sum == corpus.count())
    val totToks = corpus.select(sum(graft.ext.TextStats.tokenCount(col("text"))
      .cast("long"))).collect()(0).getLong(0)
    assert(fx.map(_.getLong(3)).sum == totToks)
    val kept = fx.find(_.getString(1) == "kept").get.getLong(2)
    assert(kept == Curation.standardGates(corpus).count())
  }

  test("repetition ratio: degenerate doc scores high, varied doc low") {
    val df = Seq(
      (1L, "spam spam spam spam spam"),        // 5 tokens, 1 distinct -> 0.8
      (2L, "all words here are different")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Curation.repetitionRatio(col("text")))
      .orderBy("doc_id").collect()
    assert(got(0).getDouble(1) == 0.8)
    assert(got(1).getDouble(1) == 0.0)
  }

  test("dup-ngram coverage: repeated phrase caught where distinct-ratio is blind") {
    val docs = Seq(
      (1L, "one two three four five six one two three"), // phrase repeated
      (2L, "a b c d e f g"),                             // no duplicate 3-gram
      (3L, "spam spam spam spam"),                       // degenerate
      (4L, "x y"),                                       // < n tokens
      // SAME token multiset as doc 1 (identical repetitionRatio) but no
      // repeated 3-gram — the two metrics must separate
      (5L, "one one two two three three four five six")).toDF("doc_id", "text")
    val got = ext.Curation.dupNgramCoverage(docs, "text", "doc_id", n = 3)
      .orderBy("doc_id").collect()
    // doc 1: "one two three" at pos 0 and 6 -> covered {0,1,2,6,7,8} = 6/9
    assert(got(0).getInt(1) == 9 && got(0).getLong(2) == 6L)
    assert(math.abs(got(0).getDouble(3) - 0.666667) < 1e-6)
    assert(got(1).getLong(2) == 0L && got(1).getDouble(3) == 0.0)
    // "spam spam spam" at pos 0 and 1 covers all 4 positions
    assert(got(2).getLong(2) == 4L && got(2).getDouble(3) == 1.0)
    assert(got(3).getInt(1) == 2 && got(3).getLong(2) == 0L)
    assert(got(4).getLong(2) == 0L && got(4).getDouble(3) == 0.0)
    val rep = docs.select(col("doc_id"),
        ext.Curation.repetitionRatio(col("text")).as("r"))
      .orderBy("doc_id").collect().map(_.getDouble(1))
    assert(rep(0) == rep(4), "same multiset must tie repetitionRatio")
    assert(got(0).getDouble(3) > 0.6 && got(4).getDouble(3) == 0.0,
      "dup-ngram coverage must separate what distinct-ratio cannot")
  }

  test("dup-ngram coverage: null text reports zero tokens, not size(null) = -1") {
    val docs = Seq((1L, Option("a b c a b c")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = ext.Curation.dupNgramCoverage(docs, "text", "doc_id", n = 3)
      .orderBy("doc_id").collect()
    assert(got(1).getInt(1) == 0 && got(1).getLong(2) == 0L &&
      got(1).getDouble(3) == 0.0,
      s"null text leaked through size(null): ${got(1)}")
  }

  test("boilerplate fraction: cross-doc common shingles counted, within-doc invisible") {
    val docs = Seq(
      (1L, "unique one alpha the common footer"),
      (2L, "unique two beta the common footer"),
      (3L, "unique three gamma the common footer"),
      (4L, "tiny doc")).toDF("doc_id", "text") // < k tokens -> no shingles
    val got = ext.Curation.boilerplateFraction(docs, "text", "doc_id", k = 3, minDf = 3)
      .orderBy("doc_id").collect()
    // docs 1-3: 4 shingles each, exactly "the common footer" has df = 3
    got.take(3).foreach { r =>
      assert(r.getLong(1) == 4L && r.getLong(2) == 1L)
      assert(math.abs(r.getDouble(3) - 0.25) < 1e-9)
    }
    // shingle-less doc surfaces with zeros instead of dropping out
    assert(got(3).getLong(1) == 0L && got(3).getLong(2) == 0L &&
      got(3).getDouble(3) == 0.0)
    // a doc REPEATING its own shingle doesn't reach minDf: df counts
    // distinct docs (shingles() is per-doc distinct), cross-doc only
    val selfRep = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "clean words only here")).toDF("doc_id", "text")
    val sr = ext.Curation.boilerplateFraction(selfRep, "text", "doc_id", k = 3, minDf = 2)
      .orderBy("doc_id").collect()
    assert(sr.forall(_.getLong(2) == 0L), "within-doc repetition must not count")
  }

  test("contamination overlap: only docs sharing >= minOverlap shingles flagged") {
    val bench = Seq((100L, "one two three four five six seven")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "one two three four five six seven extra"),   // shares 5 shingles
      (2L, "one two three only"),                        // shares 2
      (3L, "nothing in common at all here")).toDF("doc_id", "text")
    val got = Curation.contaminationOverlap(corpus, bench, "text", "doc_id",
      k = 3, minOverlap = 5).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 5L)
  }

  test("hash sampling is deterministic and rate tracks threshold") {
    val df = spark.range(2000).toDF("id")
    val kept = df.filter(Curation.hashKeep(col("id"), lit("40"))).count()
    // threshold 0x40/0x100 = 25%; md5 is uniform -> expect ~500 of 2000
    assert(kept > 380 && kept < 620, s"kept=$kept")
    val kept2 = df.filter(Curation.hashKeep(col("id"), lit("40"))).count()
    assert(kept == kept2) // deterministic, unlike rand()
    assert(df.filter(Curation.hashKeep(col("id"), lit("ff"))).count() > kept)
    // uppercase threshold means the same rate as its lowercase form —
    // without lower() 'C0' sorted below all a-f hex and skewed the rate
    val lo = df.filter(Curation.hashKeep(col("id"), lit("c0"))).count()
    val up = df.filter(Curation.hashKeep(col("id"), lit("C0"))).count()
    assert(lo == up, s"lowercase kept $lo but uppercase kept $up")
  }

  test("hash gate: threshold/width mismatch fails loudly instead of skewing the rate") {
    val df = spark.range(100).toDF("id")
    // a 2-char threshold under width=4 would silently read as c0/65536
    // instead of c0/256 — it must raise instead
    val e = intercept[Throwable] {
      df.filter(Curation.hashKeep(col("id"), lit("c0"), width = 4)).count()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("width mismatch"), s"got: $chain")
    // null thresholds still flow through as null comparisons (keep-all
    // under the callers' `thr.isNull || hashKeep(...)` gate)
    val withNullThr = df.withColumn("thr", lit(null).cast("string"))
    val kept = withNullThr
      .filter(col("thr").isNull || Curation.hashKeep(col("id"), col("thr"), width = 4))
      .count()
    assert(kept == 100)
  }

  test("sequence packing: chunk boundaries respect capacity per shard") {
    val docs = Seq(
      ("en", 1L, 1000L), ("en", 2L, 1000L), ("en", 3L, 500L),
      ("de", 1L, 2000L), ("de", 2L, 100L)).toDF("lang", "doc_id", "n")
    val got = Curation.packChunks(docs, "lang", "doc_id", col("n"), capacity = 2048)
      .select("lang", "doc_id", "chunk_id").orderBy("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // en: cum-before = 0, 1000, 2000 -> chunks 0, 0, 0 (2000 < 2048)
    // de: cum-before = 0, 2000 -> chunks 0, 0
    assert(got.toSeq == Seq(("de", 1L, 0L), ("de", 2L, 0L),
      ("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 0L)))
    val got2 = Curation.packChunks(docs, "lang", "doc_id", col("n"), capacity = 1024)
      .select("lang", "doc_id", "chunk_id").orderBy("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // capacity 1024 -> en: 0, 0 (cum-before 1000 < 1024), 1 (cum-before 2000)
    assert(got2.toSeq == Seq(("de", 1L, 0L), ("de", 2L, 1L),
      ("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 1L)))
  }

  test("X22c pack efficiency: crafted waste arithmetic; one-window form == per-capacity packChunks") {
    // one shard, docs n = 3,4,2,6 (cum 3,7,9,15; starts 0,3,7,9):
    //  cap 5:  chunks {0: docs1+2 = 7 toks, 1: docs3+4 = 8} -> overflow 5
    //  cap 10: one chunk of 15 -> overflow 5, fill 1.5
    //  cap 20: one chunk of 15 -> padding 5, fill 0.75
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 6L))
      .toDF("doc_id", "n").withColumn("grp", lit(0L))
    val rows = Curation.packEfficiency(docs, "grp", "doc_id", col("n"),
      capacities = Seq(5, 10, 20)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.toSeq == Seq(
      (5L, 2L, 15L, 0L, 5L, 2L, 1.5),
      (10L, 1L, 15L, 0L, 5L, 1L, 1.5),
      (20L, 1L, 15L, 5L, 0L, 0L, 0.75)), rows.mkString(";"))
    // fixture claim: the single-window multi-capacity form reports
    // exactly what one packChunks pass per capacity would
    val fx = Tables.load(spark, sf(), "documents")
      .select(col("doc_id"),
        graft.ext.TextStats.tokenCount(col("text")).cast("long").as("n"))
      .filter(col("n") > 0).withColumn("grp", lit(0L))
    val eff = Curation.packEfficiency(fx, "grp", "doc_id", col("n"),
      capacities = Seq(128, 512), nShards = 4).collect()
    for (cap <- Seq(128, 512)) {
      val chunks = Curation.packChunks(fx, "grp", "doc_id", col("n"),
          capacity = cap, nShards = 4)
        .groupBy("shard", "chunk_id").agg(sum("tok").as("ct"))
        .agg(count(lit(1)), sum("ct"),
          sum(greatest(lit(0L), lit(cap.toLong) - col("ct"))),
          sum(greatest(lit(0L), col("ct") - lit(cap.toLong)))).collect()(0)
      val e = eff.find(_.getLong(0) == cap.toLong).get
      assert((e.getLong(1), e.getLong(2), e.getLong(3), e.getLong(4)) ==
        (chunks.getLong(0), chunks.getLong(1), chunks.getLong(2),
          chunks.getLong(3)), s"capacity $cap drifted from packChunks")
    }
  }

  test("sub-sharded packing: every doc packed once, capacity held per shard") {
    val docs = Tables.load(spark, sf(), "documents")
      .select(col("lang"), col("doc_id"),
        graft.ext.TextStats.tokenCount(col("text")).as("n"))
    val packed = Curation.packChunks(docs, "lang", "doc_id", col("n"),
      capacity = 2048, nShards = 4)
    // partition-preserving: same docs, one row each, shard in range
    assert(packed.count() == docs.count())
    assert(packed.filter(col("shard") < 0 || col("shard") >= 4).count() == 0)
    // shard assignment is the portable hash — content-independent of lang
    val perKey = packed.groupBy("lang", "shard").count().count()
    assert(perKey > 5, s"expected > 5 (lang, shard) windows, got $perKey")
    // capacity bound: a chunk's preceding-docs total never reaches
    // capacity + its own tok (i.e. every doc starts before the boundary)
    val bad = packed.filter(col("cum") - col("tok") >= (col("chunk_id") + 1) * 2048)
      .count()
    assert(bad == 0)
    // nShards = 1 degenerates to the unsharded form exactly
    val one = Curation.packChunks(docs, "lang", "doc_id", col("n"),
      capacity = 2048, nShards = 1)
      .select("lang", "doc_id", "chunk_id").collect().toSet
    val base = Curation.packChunks(docs, "lang", "doc_id", col("n"),
      capacity = 2048)
      .select("lang", "doc_id", "chunk_id").collect().toSet
    assert(one == base)
  }

  test("chunkWithOverlap: null text behaves exactly like empty text") {
    val got = Curation.chunkWithOverlap(
      Seq((1L, null: String), (2L, "")).toDF("doc_id", "text"),
      "text", "doc_id", 4, 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(got.toSeq == Seq((1L, 0, "", 0), (2L, 0, "", 0)),
      s"null text must not leak n_tok = -1: ${got.toSeq}")
  }

  test("salt discipline: hash gates compose without skewing each other") {
    // regression for the shared-salt collision: a "graft"-salted 2-hex
    // sample gate (thr c0) composed with same-salt downstream decisions
    // would (a) leave val/test EMPTY in splitAssign (every survivor
    // bucket < 0xc000 < 64225) and (b) skew a 4-hex temperature gate's
    // realized rate to thr/0xc000. With per-purpose salts the
    // downstream decisions are independent of the gate.
    val ids = spark.range(40000).toDF("doc_id")
    val survivors = ids.filter(Curation.hashKeep(col("doc_id"), lit("c0")))
    val n = survivors.count().toDouble
    assert(n > 20000, s"gate kept $n of 40000")
    val splits = Curation.splitAssign(survivors, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.getOrElse("val", 0L) > 0 && splits.getOrElse("test", 0L) > 0,
      s"val/test empty after an upstream hash gate: $splits")
    // 4-hex "8000" temperature-family gate must keep ~50% of the gated
    // population (same-salt skew would give ~67% = 0x8000/0xc000)
    val kept = survivors.filter(Curation.hashKeep(
      col("doc_id"), lit("8000"), salt = "graft-temp", width = 4)).count() / n
    assert(kept > 0.47 && kept < 0.53, s"realized rate $kept, want ~0.5")
  }

  test("packChunksAuto: shard fan-out covers the cluster on a skewed fixture") {
    // one dominant group + one tiny group: the nShards=1 trap would run
    // TWO window tasks total; the derived shard count must fan the
    // window stage out to >= defaultParallelism concurrent units
    val par = spark.sparkContext.defaultParallelism
    val docs = spark.range(20000).select(
      when(col("id") < 19900, "en").otherwise("xx").as("lang"),
      col("id").as("doc_id"), lit(100L).as("n"))
    val packed = Curation.packChunksAuto(docs, "lang", "doc_id", col("n"),
      capacity = 2048)
    val windows = packed.select("lang", "shard").distinct().count()
    assert(windows >= par, s"only $windows window units for $par cores")
    // packing invariants survive the auto fan-out: every doc exactly
    // once, capacity respected within each (group, shard) window
    assert(packed.count() == docs.count())
    assert(packed.filter(col("cum") - col("tok") >= (col("chunk_id") + 1) * 2048)
      .count() == 0)
    // memory bound: a group larger than targetRowsPerShard splits even
    // when parallelism alone wouldn't ask for it (many groups, tiny target)
    val many = spark.range(5000).select(
      (col("id") % 100).cast("string").as("g"), col("id").as("doc_id"),
      lit(1L).as("n"))
    val shards = Curation.packChunksAuto(many, "g", "doc_id", col("n"),
      capacity = 10, targetRowsPerShard = 10L)
      .select("shard").distinct().count()
    assert(shards >= 5, s"size bound ignored: $shards shards for 50-row groups / 10-row target")
  }

  test("temperature rates: budget adherence, flattening, rate-1 cap") {
    // skewed corpus: 9000 'en', 900 'de', 10 'xx' — alpha=0.5 boosts the
    // tail; the tiny group caps at rate 1 (thr null = keep everything)
    val docs = spark.range(9910).select(col("id").as("doc_id"),
      when(col("id") < 9000, "en").when(col("id") < 9900, "de")
        .otherwise("xx").as("lang"))
    val rates = Curation.temperatureRates(docs, "lang", alpha = 0.5, budgetFrac = 0.3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), Option(r.getString(3)))).toMap
    // flattening: keep-rate strictly increases as group size shrinks
    assert(rates("en")._2 < rates("de")._2 && rates("de")._2 < rates("xx")._2)
    // the tiny group is capped at exactly 1 and gated by nothing
    assert(rates("xx")._2 == 1.0 && rates("xx")._3.isEmpty)
    // sampled groups carry a 4-hex threshold realizing the rate (floored
    // to 1/65536 granularity)
    for (g <- Seq("en", "de")) {
      val (_, rate, thr) = rates(g)
      assert(thr.get.length == 4)
      assert(Integer.parseInt(thr.get, 16) == math.floor(rate * 65536).toInt)
    }
    // budget adherence: expected kept volume = sum(n_g * rate_g) targets
    // budgetFrac * N minus the cap surplus (the capped group wanted more
    // than its size); md5 uniformity keeps the realized sample within a
    // few percent of that expectation
    val expectedKept = rates.values.map { case (n, r, _) => n * r }.sum
    assert(expectedKept >= 0.3 * 9910 * 0.95, s"expectedKept=$expectedKept")
    val kept = Curation.temperatureSample(docs, "lang", "doc_id",
      alpha = 0.5, budgetFrac = 0.3)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("xx") == 10L) // capped group fully kept
    val total = byLang.values.sum
    assert(math.abs(total - expectedKept) < 0.05 * (0.3 * 9910),
      s"kept=$total expected=$expectedKept")
    // deterministic: same plan, same kept set
    assert(kept.collect().toSet ==
      Curation.temperatureSample(docs, "lang", "doc_id",
        alpha = 0.5, budgetFrac = 0.3).collect().toSet)
  }

  test("URL count and strip") {
    val df = Seq(
      "read https://a.example.com/x?q=1 or http://b.org/p nothing else",
      "no links").toDF("text")
    val got = df.select(Curation.urlCount(col("text")).as("n"),
      Curation.stripUrls(col("text")).as("s")).collect()
    assert(got(0).getInt(0) == 2)
    assert(got(0).getString(1) == "read <URL> or <URL> nothing else")
    assert(got(1).getInt(0) == 0 && got(1).getString(1) == "no links")
  }

  test("unigram log-prob: common-token doc outscores rare-token doc") {
    val df = Seq(
      (1L, "common common common words"),
      (2L, "common words"),
      (3L, "zyx qwv unique singleton")).toDF("doc_id", "text")
    val rows = Curation.unigramLogProb(df, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(rows(1L)._1 > rows(3L)._1 && rows(2L)._1 > rows(3L)._1)
    // n_tok matches token counts
    assert(rows.view.mapValues(_._2).toMap == Map(1L -> 4L, 2L -> 2L, 3L -> 4L))
  }

  test("chunk overlap: windows cover every token, stride overlap, tail kept") {
    // 10 tokens, chunk 4, stride 2 -> starts 0,2,4,6: 4 chunks
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Curation.chunkWithOverlap(df, "text", "doc_id", 4, 2)
      .orderBy("doc_id", "chunk_no").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val doc1 = got.filter(_._1 == 1L)
    assert(doc1.map(_._3).toSeq == Seq(
      "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9"))
    assert(doc1.forall(_._4 == 4))
    // short doc: one (partial) chunk; empty doc: one empty chunk
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b", 2)))
    assert(got.filter(_._1 == 3L).toSeq == Seq((3L, 0, "", 0)))
    // an 11th token produces a 5th (tail) window, not silent truncation
    val tail = Curation.chunkWithOverlap(
      Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text"),
      "text", "doc_id", 4, 2).orderBy("chunk_no").collect()
    assert(tail.length == 5 && tail.last.getString(2) == "t8 t9 t10")
  }

  test("semantic decontam: leaked vector flagged, orthogonal not") {
    val bench = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),   // exact leak: sim 1.0
      (2L, Array(0.9f, 0.1f, 0.0f)),   // near-paraphrase: sim ~0.994
      (3L, Array(0.0f, 1.0f, 0.0f)))   // orthogonal: sim 0
      .toDF("vec_id", "embedding")
    val got = Curation.semanticDecontam(corpus, bench, threshold = 0.9)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == 1.0 && got(2L) > 0.99)
  }

  test("bigram log-prob scores word order; unigram provably cannot") {
    // 10 copies of an ordered phrase + 1 doc with the SAME token multiset
    // scrambled: identical unigram score by construction, lower bigram
    // score for the scrambled order
    val docs = ((1L to 10L).map(i => (i, "the quick brown fox")) :+
      (11L, "fox the brown quick")).toDF("doc_id", "text")
    val bi = Curation.bigramLogProb(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bi(1L) > bi(11L),
      s"ordered ${bi(1L)} should beat scrambled ${bi(11L)}")
    val uni = Curation.unigramLogProb(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni(1L) == uni(11L)) // same multiset -> unigram is blind
    // fewer than 2 tokens -> no bigrams -> no row (both engines)
    val short = Curation.bigramLogProb(
      Seq((1L, "single"), (2L, "")).toDF("doc_id", "text"), "text", "doc_id")
    assert(short.count() == 0)
  }

  test("cell-blocked decontam: full probe equals exact; declared budget bounds hold") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val corpus = emb.filter(col("vec_id") % 37 =!= 0)
    val bench = emb.filter(col("vec_id") % 37 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = rows(Curation.semanticDecontam(corpus, bench, threshold = 0.35))
    // nprobe == nlist probes every cell -> must reproduce exact output
    val full = rows(Curation.semanticDecontamBlocked(
      corpus, bench, threshold = 0.35, nlist = 8, nprobe = 8))
    assert(full == exact)
    // declared x36_blocked budget: no false flags, sims never above
    // exact, recall >= 0.9 (the property-oracle row's claims)
    val blocked = rows(Curation.semanticDecontamBlocked(
      corpus, bench, threshold = 0.35, nlist = 16, nprobe = 8))
    assert(blocked.keySet.subsetOf(exact.keySet),
      s"false flags: ${blocked.keySet.diff(exact.keySet)}")
    assert(blocked.forall { case (id, s) => s <= exact(id) })
    assert(blocked.size >= exact.size * 0.9,
      s"recall ${blocked.size.toDouble / exact.size} < 0.9")
  }

  test("decontam attribution: argmax benchmark id, deterministic on ties") {
    val bench = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(1.0f, 0.0f, 0.0f)),   // exact duplicate of 100: tie
      (102L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),     // leaks 100/101 (tie -> min id 100)
      (2L, Array(0.1f, 1.0f, 0.0f)),     // leaks 102
      (3L, Array(0.0f, 0.0f, 1.0f)))     // orthogonal to all: not flagged
      .toDF("vec_id", "embedding")
    val got = Curation.decontamAttribution(corpus, bench, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._2 == 100L, s"tie must break to min id, got ${got(1L)}")
    assert(got(2L)._2 == 102L && got(2L)._1 > 0.99)
  }

  test("cell-blocked decontam: benchmark smaller than nlist trains safely") {
    // kmeansCentroids must clamp to the row count (every benchmark
    // vector its own cell), not index past the sample
    val bench = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f)),
      (102L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(1.0f, 0.05f, 0.0f)),  // leak of 100
      (2L, Array(0.0f, 0.0f, -1.0f)))  // anti-parallel to 102: sim -1
      .toDF("vec_id", "embedding")
    val got = Curation.semanticDecontamBlocked(
      corpus, bench, threshold = 0.9, nlist = 8, nprobe = 8)
      .collect().map(r => r.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("split assignment: deterministic, proportional, growth-stable") {
    val df = spark.range(20000).toDF("id")
    val counts = Curation.splitAssign(df, "id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // 98/1/1 within sampling tolerance on 20k uniform md5 buckets
    assert(counts("train") > 19400 && counts("train") < 19800, counts)
    assert(counts("val") > 100 && counts("val") < 320, counts)
    assert(counts("test") > 100 && counts("test") < 320, counts)
    // growth-stable: the first 1000 ids keep their split when the corpus
    // is 20x larger (no dependence on corpus contents)
    val small = Curation.splitAssign(spark.range(1000).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val large = Curation.splitAssign(df, "id")
      .filter(col("id") < 1000)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small == large)
    // fractions must sum to 1
    intercept[IllegalArgumentException] {
      Curation.splitAssign(df, "id", Seq("a" -> 0.5, "b" -> 0.1))
    }
  }

  test("mixture rates: token-mass accounting, supply cap, off-recipe drop") {
    // group a: 3 docs x 4 tokens = 12 tokens; group b: 1 doc x 2 tokens;
    // group c: not in the recipe at all
    val docs = Seq(
      (1L, "a", "w x y z"), (2L, "a", "p q r s"), (3L, "a", "k l m n"),
      (4L, "b", "u v"),
      (5L, "c", "o1 o2 o3")).toDF("doc_id", "lang", "text")
    val targets = Seq("a" -> 0.5, "b" -> 0.5)
    // budget 8: a wants 4 of its 12 tokens -> rate 1/3; b wants 4 but
    // supplies only 2 -> capped at 1 (thr null); c -> rate 0, thr 0000
    val got = Curation.mixtureRates(docs, "lang", "text", targets, 8L)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(4), Option(r.getString(5))))
    assert(got(0) == ("a", 3L, 12L, 4.0 / 12.0, Some("5555")), got.toSeq)
    assert(got(1) == ("b", 1L, 2L, 1.0, None), got.toSeq)
    assert(got(2) == ("c", 1L, 3L, 0.0, Some("0000")), got.toSeq)
    intercept[IllegalArgumentException] {
      Curation.mixtureRates(docs, "lang", "text", Seq("a" -> 0.7), 8L)
    }
  }

  test("mixture sample: kept set equals a plain-JVM md5 gate replay") {
    val docs = (1L to 400L).map { i =>
      val lang = if (i % 4 == 0) "b" else "a"
      (i, lang, "tok " * (1 + (i % 3).toInt))
    }.toDF("doc_id", "lang", "text")
    val targets = Seq("a" -> 0.5, "b" -> 0.5)
    val kept = Curation.mixtureSample(
        docs, "lang", "text", "doc_id", targets, 300L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // independent replay: thresholds from the rates frame, gate via
    // java.security MessageDigest — no Spark expression reuse
    val thr = Curation.mixtureRates(docs, "lang", "text", targets, 300L)
      .collect().map(r => r.getString(0) -> Option(r.getString(5))).toMap
    def gate(id: Long, lang: String): Boolean = thr(lang) match {
      case None => true
      case Some(t) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"graft-mix$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        hex.substring(0, 4) < t
    }
    val want = (1L to 400L).filter(i =>
      gate(i, if (i % 4 == 0) "b" else "a")).toSet
    assert(kept == want,
      s"diff: ${(kept diff want).take(5)} / ${(want diff kept).take(5)}")
    assert(kept.nonEmpty && kept.size < 400, kept.size)
  }

  test("X7k epoch rates: uncapped repeats, fractional gate, off-recipe zero") {
    val docs = Seq(
      (1L, "a", "t1 t2 t3 t4 t5"), (2L, "a", "u1 u2 u3 u4 u5"),
      (3L, "b", "v1 v2 v3 v4 v5"),
      (4L, "c", "w1 w2")).toDF("doc_id", "lang", "text")
    // budget 50: a (10 tokens) wants 25 -> repeats 2.5 (2 full copies +
    // a 0.5 gate = thr 8000); b (5 tokens) wants 25 -> repeats 5.0
    // (five full copies, thr 0000); c off-recipe -> zero everywhere
    val got = Curation.epochRates(docs, "lang", "text",
        Seq("a" -> 0.5, "b" -> 0.5), 50L)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getString(6)))
    assert(got(0) == (("a", 2L, 10L, 0.5, 2.5, 2L, "8000")), got.toSeq)
    assert(got(1) == (("b", 1L, 5L, 0.5, 5.0, 5L, "0000")), got.toSeq)
    assert(got(2) == (("c", 1L, 2L, 0.0, 0.0, 0L, "0000")), got.toSeq)
    intercept[IllegalArgumentException] {
      Curation.epochRates(docs, "lang", "text", Seq("a" -> 0.6), 50L)
    }
  }

  test("X7k epoch upsample: instance multiset equals a plain-JVM md5 replay") {
    val docs = (1L to 300L).map { i =>
      val lang = if (i % 3 == 0) "b" else "a"
      (i, lang, ("tok " * (1 + (i % 4).toInt)).trim)
    }.toDF("doc_id", "lang", "text")
    val targets = Seq("a" -> 0.7, "b" -> 0.3)
    val budget = 2000L
    val inst = Curation.epochUpsample(docs, "lang", "doc_id", "text",
        targets, budget)
      .select("doc_id", "copy").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val rates = Curation.epochRates(docs, "lang", "text", targets, budget)
      .collect().map(r => r.getString(0) -> ((r.getLong(5), r.getString(6))))
      .toMap
    def gate(id: Long, thr: String): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"graft-epoch$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      hex.substring(0, 4) < thr
    }
    val want = (1L to 300L).flatMap { i =>
      val (nFull, thr) = rates(if (i % 3 == 0) "b" else "a")
      val n = nFull + (if (gate(i, thr)) 1L else 0L)
      (0L until n).map(c => (i, c.toInt))
    }.sorted.toSeq
    assert(inst == want, s"sizes ${inst.size} vs ${want.size}")
    // the fixture really exercises the UNCAPPED regime
    assert(rates.values.exists(_._1 >= 1L), rates.toString)
  }

  test("X7k epoch report: dropped group reports zeros, emitted mass reconciles") {
    val docs = Seq(
      (1L, "a", "x y z"), (2L, "a", "p q"), (3L, "b", "m n o p")
    ).toDF("doc_id", "lang", "text")
    val rep = Curation.epochUpsampleReport(docs, "lang", "doc_id", "text",
        Seq("a" -> 1.0), 10L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // a: 5 tokens under budget 10 -> repeats 2.0 -> every doc exactly twice
    assert(rep(0) == (("a", 2L, 5L, 2.0, 2L, 4L, 10L)), rep.toSeq)
    // b off-recipe: present with zero emission, never silently dropped
    assert(rep(1) == (("b", 1L, 4L, 0.0, 0L, 0L, 0L)), rep.toSeq)
  }

  test("X7m embedding outlier gate: outlier dropped at the group's own cutoff, ties kept") {
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def x60(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 15), 16)
    // label 0: five vectors on one axis + one orthogonal outlier — the
    // p10 cutoff interpolates between the outlier and the cluster, so
    // exactly the outlier drops; label 9: two orthogonal vectors tie at
    // the cutoff (sim == thr keeps — the >= boundary)
    val rows = (1L to 5L).map(i => (i, 0, Array(1.0f, 0.0f))) ++ Seq(
      (6L, 0, Array(0.0f, 1.0f)),
      (7L, 9, Array(1.0f, 0.0f)), (8L, 9, Array(0.0f, 1.0f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Curation.embeddingOutlierGate(df, "label", "vec_id",
        "embedding", frac = 0.10)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4)))
    assert(got.length == 2, got.toSeq)
    val (l0, l9) = (got(0), got(1))
    assert(l0._1 == 0 && l0._2 == 6L && l0._4 == 5L, l0.toString)
    assert(l0._5 == (1L to 5L).map(x60).reduce(_ ^ _),
      "label-0 kept set is not exactly the cluster")
    assert(l9._1 == 9 && l9._2 == 2L && l9._4 == 2L, l9.toString)
    // both label-9 sims equal cos(v, centroid) of orthogonal unit pair
    assert(math.abs(l9._3 - 0.7071) < 1e-9, l9._3.toString)
    assert(l9._5 == (7L to 8L).map(x60).reduce(_ ^ _))
  }

  test("domain cap: kept set is the cap smallest md5 uniforms per group") {
    val docs = (1L to 300L).map { i =>
      (i, s"src${i % 3}", s"text $i")
    }.toDF("doc_id", "source", "text")
    val got = Curation.capPerGroup(docs, "source", "doc_id", cap = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // independent replay via java.security MessageDigest
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"graft-cap:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) + 1) / 4294967296.0
    }
    val want = (1L to 300L).groupBy(i => s"src${i % 3}").flatMap {
      case (src, ids) =>
        ids.sortBy(i => (u(i), i)).take(10).zipWithIndex
          .map { case (id, r) => (src, r + 1L, id) }
    }.toSet
    assert(got.toSet == want,
      s"diff: ${(got.toSet diff want).take(3)} / ${(want diff got.toSet).take(3)}")
    // per-group output exactly cap, ranks contiguous from 1
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length == 10 && rows.map(_._2).sorted.toSeq == (1L to 10L))
    }
  }

  test("dup spans: cross-doc shared passage yields merged maximal spans") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "x y alpha beta gamma delta q r"),   // shares a 4-token run with d1
      (3L, "p q r s"),                          // no shared 3-gram anywhere
      (4L, "one two"),                          // < n tokens
      (5L, "m n o m n o m n o")                 // within-doc triple repeat
    ).toDF("doc_id", "text")
    val got = Curation.dupSpans(docs, "text", "doc_id", n = 3)
      .orderBy("doc_id", "span_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // d1: anchors {0,1} ("alpha beta gamma", "beta gamma delta" both also
    // in d2) -> one merged span [0,3]; d2: anchors {2,3} -> [2,5];
    // d5: every anchor 0..6 duplicated within-doc -> whole doc [0,8]
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 3L, 4L),
      (2L, 1L, 2L, 5L, 4L),
      (5L, 1L, 0L, 8L, 9L)), got.toSeq)
  }

  test("dup spans: disjoint islands stay separate, contiguous coverage merges") {
    // "u v w" occurs in both docs at two sites each; the gap token in d1
    // (pos 3 uncovered) splits islands, while d2's back-to-back copies
    // produce contiguous coverage -> ONE span
    val docs = Seq(
      (1L, "u v w gap u v w"),       // anchors 0 and 4 -> [0,2], [4,6]
      (2L, "u v w u v w")            // anchors 0,1(within),3 -> [0,5]
    ).toDF("doc_id", "text")
    val got = Curation.dupSpans(docs, "text", "doc_id", n = 3)
      .orderBy("doc_id", "span_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 2L), (1L, 2L, 4L, 6L),
      (2L, 1L, 0L, 5L)), got.toSeq)
  }

  test("X9b CDC chunks: plain-JVM replay on the fixture, short/empty/tail cases") {
    import spark.implicits._
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def replay(id: Long, text: String, window: Int, modulus: Int) = {
      val w = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val bnds = (window to w.length).filter { i =>
        java.lang.Long.parseLong(
          md5hex(w.slice(i - window, i).mkString(" ")).take(8), 16) % modulus == 0
      }
      val starts = 1 +: bnds.map(_ + 1)
      val ends = bnds :+ w.length
      starts.zip(ends).filter { case (s, e) => s <= e }.zipWithIndex.map {
        case ((s, e), k) => (id, (k + 1).toLong, (s - 1).toLong,
          (e - s + 1).toLong, md5hex(w.slice(s - 1, e).mkString(" ")))
      }
    }
    // fixture corpus, small modulus so every doc has real boundaries
    val docs = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    val got = Curation.cdcChunks(docs, "text", "doc_id", window = 4, modulus = 8)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val exp = docs.select("doc_id", "text").collect()
      .flatMap(r => replay(r.getLong(0), r.getString(1), 4, 8))
      .sortBy(t => (t._1, t._2))
    assert(got.length > docs.count(), "modulus 8 should split at least some docs")
    assert(got.toSeq == exp.toSeq, s"CDC replay mismatch: ${got.take(3).toSeq}")
    // short doc = one unbroken chunk; tokenless doc = no rows
    val tiny = Seq((1L, "one two"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val t = Curation.cdcChunks(tiny, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(t.toSeq == Seq((1L, 1L, 0L, 2L)), t.toSeq)
  }

  test("X9b CDC chunks: chunks tile every document exactly (no gap, no overlap)") {
    // strong partition invariant, fixture-wide at two modulus settings:
    // per doc, chunks start at 0, each begins where the previous ended,
    // and token counts sum to the doc's token count
    val docs = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    val tokCounts = docs.select(col("doc_id"),
        graft.ext.TextStats.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (m <- Seq(8, 64)) {
      val byDoc = Curation.cdcChunks(docs, "text", "doc_id", modulus = m)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      byDoc.foreach { case (id, rows) =>
        val sorted = rows.sortBy(_._2)
        assert(sorted.head._3 == 0L, s"doc $id (mod $m): first chunk not at 0")
        sorted.sliding(2).foreach {
          case Array((_, _, s1, n1), (_, _, s2, _)) =>
            assert(s2 == s1 + n1, s"doc $id (mod $m): gap/overlap at $s2")
          case _ =>
        }
        assert(sorted.map(_._4).sum == tokCounts(id),
          s"doc $id (mod $m): chunk tokens don't sum to doc tokens")
      }
      // every tokenful doc is covered
      assert(byDoc.keySet == tokCounts.filter(_._2 > 0).keySet)
    }
  }

  test("X9b CDC chunks: boundaries are content-anchored (edit-stable)") {
    import spark.implicits._
    // one long fixture doc, then the SAME doc with one token prepended:
    // every chunk after the first boundary must survive the edit (the
    // property fixed windows provably lack)
    val base = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .orderBy(desc("n_chars")).select("text").head.getString(0)
    val pair = Seq((1L, base), (2L, "zzz " + base)).toDF("doc_id", "text")
    val chunks = Curation.cdcChunks(pair, "text", "doc_id", window = 4, modulus = 8)
      .collect().map(r => (r.getLong(0), r.getString(4)))
    val a = chunks.filter(_._1 == 1L).map(_._2)
    val b = chunks.filter(_._1 == 2L).map(_._2).toSet
    assert(a.length >= 3, s"need boundaries for the property (got ${a.length} chunks)")
    // all of A's chunks except the first (which absorbs the edit) recur in B
    assert(a.drop(1).forall(b.contains),
      s"edit moved non-neighboring chunk boundaries: ${a.toSeq} vs $b")
  }

  test("cut dup spans: rebuilds text minus spans, clean docs pass through") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "x y alpha beta gamma delta q r"),
      (3L, "p q r s"),
      (4L, Option.empty[String].orNull),
      (5L, "m n o m n o m n o")
    ).toDF("doc_id", "text")
    val got = Curation.cutDupSpans(docs, "text", "doc_id", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 7L, 4L, "epsilon zeta eta"),
      (2L, 8L, 4L, "x y q r"),
      (3L, 4L, 0L, "p q r s"),
      (4L, 0L, 0L, ""),
      (5L, 9L, 9L, "")), got.toSeq)
  }

  test("X7e-b xdoc substr spans: keeper occurrence survives, all others marked") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "x y alpha beta gamma delta q r"),    // repeats d1's 4-token run
      (3L, "p q r s"),                           // no shared 3-gram
      (5L, "m n o m n o m n o")                  // within-doc triple repeat
    ).toDF("doc_id", "text")
    val got = Curation.xdocSubstrSpans(docs, "text", "doc_id", n = 3)
      .orderBy("doc_id", "span_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // d1 holds the (min doc, min pos) keeper of both shared grams ->
    // NO span in d1 (the x63 report would flag it); d2's copies mark
    // [2,5]; d5's first window triple (positions 0..2) are keepers,
    // repeats at 3..6 merge to [3,8]
    assert(got.toSeq == Seq(
      (2L, 1L, 2L, 5L, 4L),
      (5L, 1L, 3L, 8L, 6L)), got.toSeq)
  }

  test("X7e-b cut: one copy of every repeated substring remains in the corpus") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "x y alpha beta gamma delta q r"),
      (3L, "p q r s"),
      (4L, Option.empty[String].orNull),
      (5L, "m n o m n o m n o")
    ).toDF("doc_id", "text")
    val got = Curation.cutXdocSubstr(docs, "text", "doc_id", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // vs cutDupSpans on the same corpus: d1 passes through WHOLE (it
    // owns the keepers) and d5 keeps exactly one "m n o" — the Lee et
    // al. contract; the no-keeper cut left d1 truncated and d5 empty
    assert(got.toSeq == Seq(
      (1L, 7L, 0L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, 8L, 4L, "x y q r"),
      (3L, 4L, 0L, "p q r s"),
      (4L, 0L, 0L, ""),
      (5L, 9L, 6L, "m n o")), got.toSeq)
  }

  test("X7e-c xdocRefresh: every delta class — keeper vanishes, fresh keeper below standing, changed, carry-forward") {
    // disjoint vocabularies isolate four delta behaviors; n = 3
    val v1 = Seq(
      (10L, "a1 a2 a3 a4"),            // A: keeper owner, REMOVED in v2
      (11L, "a9 a8 a1 a2 a3 a4"),      // A: marked [2,5] in v1
      (20L, "b1 b2 b3 b4"),            // B: keeper owner in v1
      (21L, "b9 b8 b1 b2 b3 b4"),      // B: marked [2,5] in v1 AND v2
      (30L, "c1 c2 c3 c1 c2 c3"),      // C: within-doc repeat, CHANGED
      (40L, "d1 d2 d3 d4")             // D: untouched
    ).toDF("doc_id", "text")
    val v2 = Seq(
      (11L, "a9 a8 a1 a2 a3 a4"),      // dup partner gone -> unmark flip
      (15L, "b7 b1 b2 b3 b4 b6"),      // FRESH below keeper 20 -> keeper moves
      (20L, "b1 b2 b3 b4"),            // was keeper, now marked -> flip
      (21L, "b9 b8 b1 b2 b3 b4"),      // still marked (new keeper 15): carry
      (30L, "c1 c2 c3 c4 c5 c6"),      // changed: repeat removed
      (40L, "d1 d2 d3 d4")
    ).toDF("doc_id", "text")
    val st = graft.ext.Refresh.xdocBuildState(v1, "text", "doc_id", n = 3)
    val d = graft.ext.Refresh.xdocRefresh(st, v2, "text", "doc_id", n = 3)
    val got = d.state2.cut.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (11L, 6L, 0L, "a9 a8 a1 a2 a3 a4"),
      (15L, 6L, 0L, "b7 b1 b2 b3 b4 b6"),
      (20L, 4L, 4L, ""),
      (21L, 6L, 4L, "b9 b8"),
      (30L, 6L, 0L, "c1 c2 c3 c4 c5 c6"),
      (40L, 4L, 0L, "d1 d2 d3 d4")), got.toSeq)
    // delta-boundedness: exactly flip ∪ fresh ∪ changed re-cut; the
    // still-marked (21) and untouched (40) rows carried forward
    val recut = d.recut.collect().map(_.getLong(0)).toSet
    assert(recut == Set(11L, 15L, 20L, 30L), recut)
    // refresh == rebuild bit-for-bit, and the refreshed window index
    // matches a from-scratch v2 state row-for-row
    val full = Curation.cutXdocSubstr(v2, "text", "doc_id", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(full.toSeq == got.toSeq, "refresh != rebuild")
    val v2st = graft.ext.Refresh.xdocBuildState(v2, "text", "doc_id", n = 3)
    assert(d.state2.pos.count() == v2st.pos.count() &&
      d.state2.pos.unionByName(v2st.pos).distinct().count() ==
        d.state2.pos.count(), "pos2 != posFrame(v2)")
    assert(d.state2.sig.count() == v2st.sig.count() &&
      d.state2.sig.unionByName(v2st.sig).distinct().count() ==
        d.state2.sig.count(), "sig2 != sig(v2)")
  }

  test("X22d packBoundaries: hand-computed offsets; every offset inside [0, capacity)") {
    import spark.implicits._
    // capacity 5: cum = 3,7,9,14 -> chunks 0,0,1,1; offsets 0,3 and 2,4
    // (doc 3 starts at stream position 7 = chunk 1 offset 2)
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 5L))
      .toDF("doc_id", "tok").withColumn("g", lit("a"))
    val got = Curation.packBoundaries(docs, "g", "doc_id", col("tok"), 5)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5)))
    assert(got.toSeq == Seq((0L, 2L, 7L, "0 3"), (1L, 2L, 7L, "2 4")),
      got.toSeq)
    // fixture-scale invariant: offsets always land inside the chunk
    val fx = Tables.load(spark, sf(), "documents")
      .select(col("doc_id"),
        graft.ext.TextStats.tokenCount(col("text")).cast("long").as("n"))
      .filter(col("n") > 0).withColumn("g", lit(0L))
    val bad = Curation.packBoundaries(fx, "g", "doc_id", col("n"), 128,
        nShards = 4)
      .select(explode(split(col("bounds_str"), " ")).as("os"))
      .select(col("os").cast("long").as("o"))
      .filter(col("o") < 0 || col("o") >= 128).count()
    assert(bad == 0L, s"$bad offsets escaped [0, 128)")
  }

  test("X7l quantileGate: crafted distribution hits the interpolated cutoff and seals membership") {
    import spark.implicits._
    import java.security.MessageDigest
    // group a: scores 1..10 -> p10 interpolates to 1.9, keeps ids with
    // score >= 1.9 (9 docs); group b: all-equal scores -> thr = value,
    // everything kept
    val docs = ((1L to 10L).map(i => ("a", i, i.toDouble, 10L)) ++
      (11L to 13L).map(i => ("b", i, 5.0, 7L))).toDF("g", "id", "s", "tok")
    val got = Curation.quantileGate(docs, "g", "id", col("s"), col("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    def h(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(id.toString.getBytes)
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val xorA = (2L to 10L).map(h).reduce(_ ^ _)
    val xorB = (11L to 13L).map(h).reduce(_ ^ _)
    assert(got.toSeq == Seq(
      ("a", 10L, 1.9, 9L, 90L, xorA),
      ("b", 3L, 5.0, 3L, 21L, xorB)), got.toSeq)
  }

  test("quantile-gate family: approx_percentile deployment twin bounds kept-set drift") {
    // the r13 verdict's "swap approx_percentile at 100 TB, gate
    // unchanged" claim, witnessed: run x99/x105/x109 with approx = true
    // and bound the kept-set drift vs the exact estimator on the
    // fixture. Kept sets are nested in the threshold (gate rule is
    // score >= thr in all three), so |n_kept_a - n_kept_e| IS the
    // membership drift. Bounds chosen from BoundProbe measurements at
    // all 3 SFs WITH margin (BASELINE.md provenance, run 2026-08-15):
    // x99 drifts 0.0000 everywhere (coarse score steps — both
    // estimators land on the same data value); x105/x109 drift up to
    // 0.0197 thr / 0.027 kept at sf0.001 — NOT sketch error (accuracy
    // 10000 >= every fixture group, ranks are exact) but exact
    // percentile INTERPOLATING between order stats where
    // approx_percentile returns a data value; the gap shrinks with
    // group size (sf0.1: <= 0.0049/0.0061). Bounds: ~2x margin over
    // the worst measurement.
    import graft.ext.TextStats
    val docs = Tables.load(spark, sf(), "documents")
    def check(tag: String, exact: Map[Any, (Double, Long)],
              approxM: Map[Any, (Double, Long)]): Unit = {
      assert(exact.keySet == approxM.keySet, s"$tag: group domains differ")
      exact.foreach { case (k, (te, ne)) =>
        val (ta, na) = approxM(k)
        assert(math.abs(ta - te) <= 0.05,
          s"$tag/$k: thr drifted $te -> $ta")
        assert(math.abs(na - ne).toDouble / math.max(ne, 1L) <= 0.05,
          s"$tag/$k: kept drifted $ne -> $na")
      }
    }
    def q99(a: Boolean) = Curation.quantileGate(
        docs.filter(col("lang").isNotNull), "lang", "doc_id",
        TextStats.qualityScore(col("text")),
        TextStats.tokenCount(col("text")), frac = 0.10, approx = a)
      .collect().map(r => (r.get(0), (r.getDouble(2), r.getLong(3)))).toMap
    check("x99", q99(false), q99(true))
    val lm = TextStats.refLmTrain(docs, "text", "lang",
      col("source").isin("src0", "src1") && col("doc_id").isNotNull,
      numBuckets = 256)
    def t105(a: Boolean) = TextStats.perplexityTiers(
        docs, "text", "lang", "doc_id", lm, approx = a)
      .filter(col("tier") =!= "tail")
      .groupBy("lang").agg(min("thr_lo").as("thr"), sum("n_docs").as("n"))
      .collect().map(r => (r.get(0), (r.getDouble(1), r.getLong(2)))).toMap
    check("x105", t105(false), t105(true))
    val emb = Tables.load(spark, sf(), "embeddings")
    def g109(a: Boolean) = Curation.embeddingOutlierGate(emb, "label",
        "vec_id", "embedding", frac = 0.10, approx = a)
      .collect().map(r => (r.get(0), (r.getDouble(2), r.getLong(3)))).toMap
    check("x109", g109(false), g109(true))
  }

  test("X7j teacherLabel: content gates only — crafted docs land on the declared side") {
    import spark.implicits._
    // doc 1: English, in the 100..20000 length band, stopword-rich, low
    // repetition -> keep. doc 2: German markers -> langid drop. doc 3:
    // degenerate repetition (one token over and over) -> repetition
    // drop. doc 4: too short for the quality band -> quality drop.
    val en = ("the quick brown fox jumps over the lazy dog and then " +
      "walks to the river for a drink of cold water with friends ") * 2
    val docs = Seq(
      (1L, en),
      (2L, "der hund und die katze ist nicht mit ein haus und der baum"),
      (3L, ("spam " * 60).trim + " the and of to is that for with a an or in it on",
      ),
      (4L, "the cat")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Curation.teacherLabel(col("text")).as("t"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "keep"), (2L, "drop"), (3L, "drop"),
      (4L, "drop")), got.toSeq)
  }

  test("X7j distillation: NB student trained on teacher labels recovers them on clean fixtures") {
    import spark.implicits._
    // two clearly-separated populations: stopword-rich English prose
    // (teacher keep) vs non-English/degenerate noise (teacher drop).
    // The student must (a) train without error on the split's labels,
    // (b) agree with the teacher on a large majority of held-out docs,
    // and (c) be deterministic across two full train+score runs.
    val keepWords = Seq("the", "and", "of", "river", "water", "stone",
      "light", "garden", "winter", "morning")
    val dropWords = Seq("der", "und", "das", "haus", "baum", "katze",
      "hund", "nicht", "mit", "ein")
    // every 4th token a class marker, the rest unique — low repetition,
    // so the keep population clears the teacher's repetition gate and
    // BOTH teacher labels occur (an all-marker doc is ~0.7 repetitive:
    // the teacher would drop both classes and agreement would be vacuous)
    def doc(i: Long, ws: Seq[String]): String =
      (0 until 40).map(j =>
        if (j % 4 == 0) ws(((i + j) % ws.size).toInt) else s"tok${i}x$j")
        .mkString(" ")
    val docs = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) doc(i, keepWords) else doc(i, dropWords)))
      .toDF("doc_id", "text")
    val teacherLabels = docs.select(
        graft.ext.Curation.teacherLabel(col("text")).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(teacherLabels.keySet == Set("keep", "drop"),
      s"fixture must produce both teacher labels: $teacherLabels")
    def run(): Seq[(String, String, Long)] = {
      val labeled = Curation.splitAssign(
        docs.withColumn("teacher", Curation.teacherLabel(col("text"))),
        "doc_id", Seq("train" -> 0.8, "test" -> 0.2))
      val model = graft.ext.TextStats.nbTrain(
        labeled.filter(col("split") === "train"), "text", "teacher",
        "doc_id", numBuckets = 256)
      labeled.filter(col("split") === "test")
        .select(col("teacher"),
          graft.ext.TextStats.nbPredict(
            graft.ext.TextStats.nbGramBuckets(col("text"), 256), model)
            .getField("lang").as("student"))
        .groupBy("teacher", "student").count()
        .orderBy("teacher", "student").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    }
    val a = run()
    assert(a == run(), s"distillation not deterministic: $a vs rerun")
    val agree = a.collect { case (t, s, n) if t == s => n }.sum.toDouble
    val total = a.map(_._3).sum.toDouble
    assert(total > 20, s"held-out split too small: $a")
    assert(agree / total >= 0.9,
      s"student agrees on ${agree / total} of held-out docs: $a")
  }
}
