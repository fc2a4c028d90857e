package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.sql.functions._
object ProbeX108 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "128k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.load(spark, dir, "documents")
    val cleaned = graft.queries.Declared.ccnetCleaned(docs)
    println("cleaned pre-AQE partitions: " + cleaned.rdd.getNumPartitions)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("cleaned count")(println("rows " + cleaned.count()))
    val m = graft.ext.TextStats.refLmTrain(cleaned, "clean_text", "lang_pred",
      col("source").isin("src0","src1") && col("doc_id").isNotNull, 1024)
    time("warm score pass") {
      val sc0 = cleaned.select(
        graft.ext.TextStats.refLmAvgLogProb(col("clean_text"), col("lang_pred"), m).as("lp"))
      println(sc0.agg(sum(when(isnan(col("lp")), 0.0).otherwise(col("lp")))).collect()(0))
    }
    // how many tasks does the scoring stage run as, post-AQE?
    val scored = cleaned.select(col("lang_pred"),
      graft.ext.TextStats.refLmAvgLogProb(col("clean_text"), col("lang_pred"), m).as("lp"))
    val cached = scored.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist materialize")(cached.count())
    println("cached partitions: " + cached.rdd.getNumPartitions)
    time("second pass over cache")(cached.agg(count(lit(1))).collect())
    cached.unpersist()
    // full declared x108 for reference
    time("declared x108")(graft.SparkEntry.queries("x108_ccnet_e2e")(spark, dir).collect())
    time("declared x108 again")(graft.SparkEntry.queries("x108_ccnet_e2e")(spark, dir).collect())
    spark.stop()
  }
}
