package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke: drives the driver-facing surface — `SparkEntry.entry` and a
  * couple of cross-checks that the oracle can't express (MinHash recall
  * vs exact Jaccard, ANN vs brute-force overlap). Run:
  *   sbt "runMain graft.Smoke [sfDir]"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${e.count()}")
    e.show(6, truncate = false)

    def pairs(name: String) =
      SparkEntry.queries(name)(spark, sfDir)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ex = pairs("x02_jaccard_pairs")
    val mh = pairs("x09_minhash_pairs")
    println(s"MINHASH exact=${ex.size} lsh=${mh.size} " +
      s"recall=${if (ex.isEmpty) 1.0 else ex.intersect(mh).size.toDouble / ex.size}")

    def topk(name: String) =
      SparkEntry.queries(name)(spark, sfDir)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = topk("x03_cosine_topk")
    val ann = topk("x11_ann_ivf")
    println(s"ANN bf=${bf.size} lsh=${ann.size} " +
      s"overlap=${if (bf.isEmpty) 1.0 else bf.intersect(ann).size.toDouble / bf.size}")

    spark.stop()
  }
}
