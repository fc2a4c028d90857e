package graft

import org.apache.spark.sql.functions._

/** Partitioned-sink competency: lang-partitioned parquet writes give
  * partition-pruned scans on read (the layout a 100 TB corpus would use).
  */
class SinkSpec extends SparkSuite {

  test("partitionBy(lang) write -> read with lang filter prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.load(spark, sf(), "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("lang") === "de")
    val expected = Tables.load(spark, sf(), "documents")
      .filter(col("lang") === "de").count()
    assert(back.count() == expected)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition pruning in plan:\n$plan")
    // only the de=... directory is listed once pruning applies
    val scanned = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("lang=en") || scanned.contains("lang=de"))
  }

  test("JSONL transport: wire values round-trip through text files with declared schema") {
    import graft.gen.RecordGen
    import graft.schema.Schemas
    val dir = java.nio.file.Files.createTempDirectory("wire_jsonl").toString
    val wire = RecordGen.toWire(RecordGen.records(spark, 200L, numPartitions = 4))
    // the wire value IS a JSON document (reference: UTF-8 JSON bytes) —
    // dump as JSONL text, one record per line
    wire.select(col("value").cast("string")).write.mode("overwrite").text(dir)
    // spark.read.json with the DECLARED schema (never inferred — the
    // reference's schema is fixed; SURVEY §1.6)
    val back = spark.read.schema(Schemas.valueSchema).json(dir)
    assert(back.count() == 200L)
    // no corrupt-record column, every struct field populated
    assert(back.filter(col("user.lastName").isNull ||
      col("user.address.city").isNull || col("payload").isNull).count() == 0)
    // beers array keeps its fixed length 2
    assert(back.filter(size(col("user.favoriteBeers")) =!= 2).count() == 0)
  }

  test("bucketed tables join co-located: SortMergeJoin with zero shuffle beneath it") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val wh = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    val o = Tables.load(spark, sf(), "orders")
    val l = Tables.load(spark, sf(), "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    o.write.option("path", s"$wh/orders_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.option("path", s"$wh/lineitem_b")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("lineitem_b").join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      // AQE wraps the plan; collect() doesn't traverse into the adaptive
      // wrapper, so unwrap to the current physical plan first
      val plan = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val smj = plan.collect { case s: SortMergeJoinExec => s }
      assert(smj.nonEmpty, "expected a SortMergeJoin over bucketed tables")
      // co-located: bucket layout satisfies the join distribution on BOTH
      // sides — no shuffle anywhere under the join
      assert(smj.head.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"unexpected shuffle under the bucketed join:\n${smj.head}")
      assert(j.count() ==
        l.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
