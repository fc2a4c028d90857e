package graft

import graft.gen.RecordGen
import graft.streaming.KafkaSink
import org.apache.spark.sql.functions._

/** K1/S4 LIVE wire e2e (reference: DataGenerator.java:512 produce ->
  * :399-402 poll -> counters): the one reference surface that needs a
  * real broker. This sandbox ships no connector jar, no kafka-clients,
  * and no broker, and its dependency set is pinned (zero egress), so an
  * in-JVM broker cannot be added here — instead the live path is
  * ENV-GATED: on any machine with the connector jars on the classpath
  * ([[KafkaSink.requiredArtifacts]]) and a reachable broker, run
  *
  *   SPARK_GRAFT_KAFKA_BOOTSTRAP=host:9092 sbt "testOnly graft.KafkaLiveSpec"
  *
  * and the round-trip executes for real. Without the env var (or the
  * jars) the test CANCELS — visible as canceled, never failed, so the
  * suite stays green in broker-less environments while the claim stays
  * checkable everywhere else.
  */
class KafkaLiveSpec extends SparkSuite {

  test("K1/S4 live round-trip: produce N -> broker -> consume N, headers survive") {
    val bootstrap = sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    assume(bootstrap.isDefined,
      "live Kafka e2e skipped: set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port " +
        "(with the connector jars on the classpath) to run it")
    assume(KafkaSink.connectorAvailable, KafkaSink.connectorDiagnosis)
    val bs = bootstrap.get
    val n = 1000L
    // unique topic per run: auto-created on produce (or pre-create via
    // admin.TopicLifecycle against the same bootstrap)
    val topic = s"graft_e2e_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val wire = RecordGen.toWire(RecordGen.records(spark, n, numPartitions = 4))
      .withColumn("topic", lit(topic))

    // K1 produce: batch Kafka write through the same wire columns the
    // streaming writer carries (topic, key, value, headers — the sink
    // emits the headers column automatically when present;
    // includeHeaders is a SOURCE option, needed only on the read below)
    wire.write.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .save()

    // S4 consume: bounded batch read of the whole topic
    val back = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .option("includeHeaders", "true")
      .load()

    // ack-exact count (the reference counts broker acks; a batch write
    // either lands every row or throws)
    assert(back.count() == n, s"expected $n records on $topic")

    // headers survive the wire byte-for-byte
    val hdr = back.select(explode(col("headers")).as("h"))
      .select(col("h.key").as("k"), col("h.value").cast("string").as("v"))
    assert(hdr.select("k").distinct().collect().map(_.getString(0)).toSet ==
      Set("X-Country", "X-Animal"))
    assert(hdr.filter(col("v").isNull || length(col("v")) === 0).count() == 0)

    // consumer-side parse integrity: every key/value JSON survives the
    // encode -> broker -> decode round-trip
    val parsed = RecordGen.parseWire(
      back.select(col("topic"), col("partition"), col("key"), col("value"),
        col("headers")))
    assert(parsed.filter(
      col("key.messageId").isNull || col("key.storeId").isNull ||
        col("value.timestamp").isNull || col("value.payload").isNull)
      .count() == 0, "wire record failed to parse after the broker round-trip")
  }
}
