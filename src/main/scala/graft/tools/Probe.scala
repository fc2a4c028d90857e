package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiling main: times one named query twice (cold/warm) and
  * prints the formatted physical plan. Usage:
  *   sbt "runMain graft.tools.Probe <queryName> [sfDir]"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def time(tag: String): Unit = {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    time("cold")
    time("warm")
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
