package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Writes `plans/r19/<query>_<suffix>.txt` — the formatted physical plans
  * of the queries touched in the r19 optimization round, captured before
  * and after each change so the plan-shape claims in OPTIMIZATION_r19.md
  * are checkable without running Spark (the PlansR18 convention).
  *
  * Run: sbt "runMain graft.tools.PlansR19 <suffix> <query>[,<query>...] [sfDir]"
  */
object PlansR19 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
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
    val dir = Paths.get("plans", "r19")
    Files.createDirectories(dir)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = Plans.normalize(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"wrote plans/r19/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
