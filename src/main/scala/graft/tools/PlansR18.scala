package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Writes `plans/r18/<query>_<suffix>.txt` — the formatted physical plans
  * of the queries touched in the r18 optimization round, captured before
  * and after each change so the plan-shape claims in OPTIMIZATION_r18.md
  * are checkable without running Spark.
  *
  * Run: sbt "runMain graft.tools.PlansR18 <suffix> <query>[,<query>...] [sfDir]"
  */
object PlansR18 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq.empty)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get("plans", "r18")
    Files.createDirectories(dir)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = Plans.normalize(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"wrote plans/r18/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
