package graft

import graft.config.DataGenSettings
import graft.streaming.{KafkaSink, Pipelines}

/** K1 sink boundary: the connector-resolution check and the per-cluster
  * option plane. This container ships no Kafka connector jar, so the
  * documented ERROR path is the one exercised end-to-end here — and the
  * spec proves the check mirrors what `format("kafka")` actually does,
  * in whichever state the classpath is in.
  */
class KafkaSinkSpec extends SparkSuite {

  private val settings = DataGenSettings(clusters = Map(
    "prod" -> Map(
      "bootstrap.servers" -> "\"broker1:9092,broker2:9092\"",
      "acks" -> "all",
      "group.id" -> "should-never-reach-a-producer",
      "not.a.known.config" -> "dropped",
      // the full security family must survive resolution — a writer
      // that silently drops these assembles fine and fails auth at
      // start() (the round-3 curated subset did exactly that)
      "ssl.keystore.location" -> "/etc/tls/keystore.p12",
      "ssl.keystore.password" -> "\"secret\"",
      "ssl.key.password" -> "secret2",
      "sasl.login.callback.handler.class" -> "com.example.OauthHandler",
      "enable.idempotence" -> "true")))

  test("K1 sinkOptions: resolve + quote-strip + group.id exclusion + kafka. prefix") {
    val opts = KafkaSink.sinkOptions(settings, "prod",
      defaults = Map("compression.type" -> "zstd", "acks" -> "1"))
    // quote-stripped override
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    // override beats default
    assert(opts("kafka.acks") == "all")
    // default fills a hole
    assert(opts("kafka.compression.type") == "zstd")
    // group.id is not a producer config name (the reference excludes it
    // only on the consumer path, ClientConfigFactory.java:87-90)
    assert(!opts.contains("kafka.group.id"))
    // unknown names don't pass through
    assert(!opts.exists(_._1.contains("not.a.known")))
    // arbitrary valid producer configs pass through — the name set is
    // ProducerConfig.configNames() (reflective when kafka-clients is on
    // the classpath, full static snapshot otherwise), not a curated list
    assert(opts("kafka.ssl.keystore.location") == "/etc/tls/keystore.p12")
    assert(opts("kafka.ssl.keystore.password") == "secret")
    assert(opts("kafka.ssl.key.password") == "secret2")
    assert(opts("kafka.sasl.login.callback.handler.class") == "com.example.OauthHandler")
    assert(opts("kafka.enable.idempotence") == "true")
  }

  test("K1-K4 option planes mirror the reference's three configNames() sets") {
    // producer: group.id is absent, the SSL/SASL family is present
    assert(!KafkaSink.knownProducerConfigs.contains("group.id"))
    assert(KafkaSink.knownProducerConfigs.contains("transactional.id"))
    // consumer: the reference strips group.id from the full name set but
    // keeps group.instance.id (ClientConfigFactory.java:87-90)
    assert(!KafkaSink.knownConsumerConfigs.contains("group.id"))
    assert(KafkaSink.knownConsumerConfigs.contains("group.instance.id"))
    assert(KafkaSink.knownConsumerConfigs.contains("max.poll.records"))
    // admin: connection-plane names only, no serializers
    assert(KafkaSink.knownAdminConfigs.contains("request.timeout.ms"))
    assert(!KafkaSink.knownAdminConfigs.contains("key.serializer"))
    // every plane can carry cluster security overrides
    for (plane <- Seq(KafkaSink.knownProducerConfigs,
        KafkaSink.knownConsumerConfigs, KafkaSink.knownAdminConfigs)) {
      assert(plane.contains("ssl.keystore.location"))
      assert(plane.contains("sasl.jaas.config"))
      assert(plane.contains("security.protocol"))
    }
  }

  test("K1 connector check mirrors format(\"kafka\") resolution exactly") {
    val wire = Pipelines.producer(spark, numTopics = 2)
    val ckpt = java.nio.file.Files.createTempDirectory("kafka_ckpt").toString
    if (!KafkaSink.connectorAvailable) {
      // THIS env: no spark-sql-kafka jar. (1) the raw Spark path really
      // does fail to resolve...
      val raw = intercept[Throwable] {
        wire.writeStream.format("kafka")
          .option("kafka.bootstrap.servers", "localhost:9092")
          .option("checkpointLocation", ckpt)
          .start()
      }
      assert(raw.getMessage.toLowerCase.contains("kafka"),
        s"expected a kafka data-source resolution failure, got: $raw")
      // ...(2) our writer fails FAST with the actionable jar list instead
      val diag = intercept[IllegalArgumentException] {
        KafkaSink.writer(wire, settings, "prod", ckpt)
      }
      assert(diag.getMessage.contains("spark-sql-kafka-0-10_2.13"))
      assert(KafkaSink.connectorDiagnosis.contains("kafka-clients"))
    } else {
      // connector present: the writer must assemble without ClassNotFound
      // (no broker needed until start())
      val w = KafkaSink.writer(wire, settings, "prod", ckpt)
      assert(w != null && KafkaSink.connectorDiagnosis.isEmpty)
    }
  }

  test("K1 writer requires a resolvable bootstrap.servers for the cluster") {
    val wire = Pipelines.producer(spark, numTopics = 1)
    val err = intercept[IllegalArgumentException] {
      KafkaSink.writer(wire, DataGenSettings(), "default", "/tmp/unused-ckpt")
    }
    // whichever guard fires first (connector absent here, bootstrap
    // missing in a connector-equipped env), the message is actionable
    assert(err.getMessage.contains("bootstrap.servers") ||
      err.getMessage.contains("spark-sql-kafka"))
  }
}
