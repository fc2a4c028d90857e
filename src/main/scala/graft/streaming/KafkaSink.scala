package graft.streaming

import graft.config.{ClusterConfigs, DataGenSettings}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.streaming.DataStreamWriter

import scala.jdk.CollectionConverters._
import scala.util.Try

/** K1: the Kafka producer sink boundary (reference: DataGenerator.java:512
  * `producer.send`, ClientConfigFactory.java:61-113 for the option plane).
  *
  * This environment ships no Kafka connector jar, so `format("kafka")`
  * cannot be executed here — but "it would work if a broker existed" must
  * be a CHECKED claim, not a hoped one. This object makes the boundary
  * explicit:
  *
  *  - [[connectorAvailable]] performs the exact lookup Spark's
  *    `DataSource.lookupDataSource` does for `format("kafka")`: a
  *    ServiceLoader scan for a [[DataSourceRegister]] with short name
  *    `kafka`. No reflection guessing — if this is true, `format("kafka")`
  *    resolves.
  *  - [[connectorDiagnosis]] names the exact artifacts to add when it is
  *    false (`spark-sql-kafka-0-10_2.13` + its two runtime deps, all
  *    version-matched to the running Spark), so the failure mode is a
  *    one-line fix instead of an opaque ClassNotFoundException at
  *    `start()`.
  *  - [[sinkOptions]] resolves the per-cluster producer configs through
  *    [[ClusterConfigs]] (same quote-strip / group.id-exclusion semantics
  *    as the reference) into the `kafka.`-prefixed option map the sink
  *    takes — pure, so it is testable without a connector or broker.
  *  - [[writer]] assembles the real `writeStream.format("kafka")` writer,
  *    failing fast with [[connectorDiagnosis]] when the connector is
  *    absent rather than deferring the error to `start()`.
  */
object KafkaSink {

  /** Spark's provider class for `format("kafka")` (source and sink). */
  val providerClass = "org.apache.spark.sql.kafka010.KafkaSourceProvider"

  /** The artifacts `format("kafka")` needs on the classpath, in the same
    * Scala/Spark version as the running session (for this build:
    * Scala 2.13, Spark 4.1.x).
    */
  val requiredArtifacts: Seq[String] = Seq(
    "org.apache.spark:spark-sql-kafka-0-10_2.13",
    "org.apache.spark:spark-token-provider-kafka-0-10_2.13",
    "org.apache.kafka:kafka-clients",
    "org.apache.commons:commons-pool2")

  /** Producer config names the reference's client factory knows
    * (ClientConfigFactory.java:61-113 intersects known names with
    * overrides); `group.id` is a consumer-only config and is excluded
    * from producer resolution (reference :87-90).
    */
  val knownProducerConfigs: Set[String] = Set(
    "bootstrap.servers", "acks", "batch.size", "linger.ms",
    "compression.type", "max.request.size", "security.protocol",
    "sasl.mechanism", "sasl.jaas.config", "ssl.truststore.location",
    "ssl.truststore.password", "client.id", "retries",
    "delivery.timeout.ms", "group.id")

  /** True iff `format("kafka")` resolves in this JVM — the identical
    * ServiceLoader scan Spark's DataSource.lookupDataSource performs.
    */
  def connectorAvailable: Boolean =
    java.util.ServiceLoader
      .load(classOf[DataSourceRegister], Thread.currentThread().getContextClassLoader)
      .asScala
      .exists(r => Try(r.shortName()).toOption.contains("kafka"))

  /** Human-actionable statement of what is missing (empty when nothing is). */
  def connectorDiagnosis: String =
    if (connectorAvailable) ""
    else
      s"format(\"kafka\") cannot resolve: no DataSourceRegister with short " +
        s"name 'kafka' on the classpath (provider $providerClass). Add " +
        s"these jars, version-matched to the running Spark: " +
        requiredArtifacts.mkString(", ") +
        " (e.g. --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>)."

  /** Resolve the per-cluster producer options into the `kafka.*` map the
    * sink takes. `group.id` never reaches a producer (reference
    * ClientConfigFactory.java:87-90); values are quote-stripped.
    */
  def sinkOptions(settings: DataGenSettings, cluster: String,
                  defaults: Map[String, String] = Map.empty): Map[String, String] =
    ClusterConfigs.asSparkKafkaOptions(
      ClusterConfigs.resolve(
        knownNames = knownProducerConfigs,
        overrides = settings.clusters.getOrElse(cluster, Map.empty),
        defaults = defaults,
        excludeNames = Set("group.id")))

  /** The K1 producer writer: wire columns (topic, key, value, headers) ->
    * `format("kafka")` with the cluster's resolved options and header
    * emission on. Fails fast with [[connectorDiagnosis]] if the connector
    * is absent — the caller gets the jar list, not a ClassNotFound at
    * `start()`.
    */
  def writer(wire: DataFrame, settings: DataGenSettings, cluster: String,
             checkpointDir: String,
             defaults: Map[String, String] = Map.empty): DataStreamWriter[Row] = {
    require(connectorAvailable, connectorDiagnosis)
    val opts = sinkOptions(settings, cluster, defaults)
    require(opts.contains("kafka.bootstrap.servers"),
      s"cluster '$cluster' resolves no bootstrap.servers " +
        "(set it in DataGenSettings.clusters or defaults)")
    wire.writeStream
      .format("kafka")
      .options(opts)
      .option("includeHeaders", "true")
      .option("checkpointLocation", checkpointDir)
  }
}
