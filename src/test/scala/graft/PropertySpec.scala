package graft

import graft.ext.{Dedup, Similarity}
import graft.operators.Snapshots
import graft.streaming.RateShape
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.2 item 2) using scalacheck Gen
  * directly (the scalatest bridge isn't in the offline cache). Each
  * property samples N generated cases with a fixed base seed so failures
  * reproduce; Spark-facing properties keep N small (a job per case).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("generator determinism: any (seed, n) produces identical runs") {
    samples(Gen.zip(Gen.choose(0L, 10000L), Gen.choose(1L, 50L)), 6)
      .foreach { case (seed, n) =>
        val a = gen.RecordGen.records(spark, n, seed = seed).collect()
        val b = gen.RecordGen.records(spark, n, seed = seed).collect()
        assert(a.sameElements(b), s"seed=$seed n=$n")
      }
  }

  test("rate waveform invariants: rate in steps, 50s periodic") {
    val secs = samples(Gen.choose(0, 500), 20)
    val df = secs.map(_.toLong).toDF("sec")
    val rates = df.select(col("sec"), RateShape.rateFor(col("sec")),
        RateShape.rateFor(col("sec") + 50)).collect()
    rates.foreach { r =>
      assert(Set(10L, 110L, 210L, 310L, 410L).contains(r.getLong(1)), s"sec=${r.getLong(0)}")
      assert(r.getLong(1) == r.getLong(2), "not 50s-periodic")
    }
  }

  test("snapshot deltas reconstruct the counter series (J1 inverse)") {
    samples(Gen.nonEmptyListOf(Gen.choose(0L, 100L)), 6).foreach { deltas =>
      val series = deltas.scanLeft(0L)(_ + _).tail.zipWithIndex
        .map { case (cnt, i) => ("k", i, cnt) }
      val df = series.toDF("k", "snap", "cnt")
      val got = Snapshots.snapshotDelta(df, Seq("k"), "snap", "cnt")
        .orderBy("snap").collect().map(_.getLong(3))
      assert(got.toSeq == deltas, s"deltas=$deltas")
    }
  }

  test("jaccard bounds: all emitted pairs have 0 < j <= 1 and id_a < id_b") {
    val pairs = Dedup.jaccardPairs(
      Tables.load(spark, sf(), "documents"), "text", "doc_id", 3, 0.01).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("cosine is symmetric, bounded, and 1 on itself") {
    val vecGen = Gen.listOfN(8, Gen.choose(-5.0, 5.0))
      .suchThat(_.exists(_ != 0.0))
    val cases = samples(Gen.zip(vecGen, vecGen), 10)
    val df = cases.toDF("a", "b")
    df.select(
      Similarity.cosine(col("a"), col("b")).as("ab"),
      Similarity.cosine(col("b"), col("a")).as("ba"),
      Similarity.cosine(col("a"), col("a")).as("aa")).collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
      assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)
    }
  }

  test("base-36 topic suffix round-trips through Integer.parseInt") {
    samples(Gen.choose(0, 1000), 50).foreach { t =>
      val suffix = java.lang.Integer.toString(t + 10, 36)
      assert(java.lang.Integer.parseInt(suffix, 36) - 10 == t)
    }
  }

  test("config quote stripping is idempotent and only touches edges") {
    samples(Gen.alphaNumStr, 50).foreach { s =>
      val q = "\"" + s + "\""
      val once = graft.config.ClusterConfigs.stripQuotes(q)
      assert(once == s)
      assert(graft.config.ClusterConfigs.stripQuotes(once) == once)
    }
  }

  test("simhash: hamming distance to a 1-token-edit is below random baseline") {
    val base = "spark engine query filter join group window shuffle partition broadcast"
    val edited = base.replace("broadcast", "alignment")
    val unrelated = "completely different vocabulary about cooking pasta sauce tomato basil"
    val df = Seq(base, edited, unrelated).toDF("text")
      .select(Dedup.simhash(col("text"))).collect().map(_.getLong(0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(df(0), df(1)) < ham(df(0), df(2)))
  }

  test("dupClusters equals brute-force union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 5) {
      val n = 2 + rnd.nextInt(30)
      val edges = (0 until (1 + rnd.nextInt(40)))
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      if (edges.nonEmpty) {
        // driver-side union-find ground truth
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        // normalize: min member id per component
        val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        val expect = nodes.groupBy(find).flatMap { case (_, ms) =>
          val root = ms.min; ms.map(_ -> root)
        }.toMap
        val got = Dedup.dupClusters(edges.toDF("id_a", "id_b")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expect, s"n=$n edges=$edges")
      }
    }
  }
}
