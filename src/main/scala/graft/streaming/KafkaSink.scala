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

  /** The reference resolves cluster overrides against the FULL
    * `ProducerConfig.configNames()` set (ClientConfigFactory.java:76);
    * `group.id` is not a producer config at all — the reference filters
    * it only on the consumer path (ClientConfigFactory.java:87-90).
    *
    * When kafka-clients is on the classpath the exact same call is made
    * (reflectively, so this module compiles and tests without the jar);
    * otherwise a static snapshot of the Kafka 3.x name set is used, so
    * cluster overrides like `ssl.keystore.location`, `ssl.key.password`
    * or `sasl.login.*` are never silently dropped — a writer that
    * assembled fine must not fail auth at start() because its security
    * configs were filtered out.
    */
  def knownProducerConfigs: Set[String] =
    configNamesOf("org.apache.kafka.clients.producer.ProducerConfig")
      .getOrElse(producerConfigSnapshot ++ securityConfigSnapshot)

  /** Consumer plane (reference ClientConfigFactory.java:85-97): full
    * `ConsumerConfig.configNames()` minus `group.id` — "Do not allow a
    * group Id to be set for this application".
    */
  def knownConsumerConfigs: Set[String] =
    (configNamesOf("org.apache.kafka.clients.consumer.ConsumerConfig")
      .getOrElse(consumerConfigSnapshot ++ securityConfigSnapshot)) - "group.id"

  /** Admin plane (reference ClientConfigFactory.java:63-70):
    * `AdminClientConfig.configNames()`.
    */
  def knownAdminConfigs: Set[String] =
    configNamesOf("org.apache.kafka.clients.admin.AdminClientConfig")
      .getOrElse(adminConfigSnapshot ++ securityConfigSnapshot)

  /** Reflective `<cls>.configNames()` — exactly what the reference calls,
    * without a compile-time dependency on kafka-clients.
    */
  private def configNamesOf(className: String): Option[Set[String]] =
    Try {
      Class.forName(className).getMethod("configNames").invoke(null)
        .asInstanceOf[java.util.Set[String]].asScala.toSet
    }.toOption

  /** Static snapshot of ProducerConfig.configNames() (Kafka 3.x, minus
    * the security family below).
    */
  private val producerConfigSnapshot: Set[String] = Set(
    "acks", "batch.size", "bootstrap.servers", "buffer.memory",
    "client.dns.lookup", "client.id", "compression.type",
    "connections.max.idle.ms", "delivery.timeout.ms", "enable.idempotence",
    "interceptor.classes", "key.serializer", "linger.ms", "max.block.ms",
    "max.in.flight.requests.per.connection", "max.request.size",
    "metadata.max.age.ms", "metadata.max.idle.ms", "metric.reporters",
    "metrics.num.samples", "metrics.recording.level",
    "metrics.sample.window.ms", "partitioner.adaptive.partitioning.enable",
    "partitioner.availability.timeout.ms", "partitioner.class",
    "partitioner.ignore.keys", "receive.buffer.bytes",
    "reconnect.backoff.max.ms", "reconnect.backoff.ms",
    "request.timeout.ms", "retries", "retry.backoff.max.ms",
    "retry.backoff.ms", "send.buffer.bytes",
    "socket.connection.setup.timeout.max.ms",
    "socket.connection.setup.timeout.ms", "transaction.timeout.ms",
    "transactional.id", "value.serializer")

  /** Static snapshot of ConsumerConfig.configNames() (Kafka 3.x, minus
    * the security family below). Includes group.id — the exclusion is
    * applied in [[knownConsumerConfigs]], mirroring the reference.
    */
  private val consumerConfigSnapshot: Set[String] = Set(
    "allow.auto.create.topics", "auto.commit.interval.ms",
    "auto.offset.reset", "bootstrap.servers", "check.crcs",
    "client.dns.lookup", "client.id", "client.rack",
    "connections.max.idle.ms", "default.api.timeout.ms",
    "enable.auto.commit", "exclude.internal.topics",
    "fetch.max.bytes", "fetch.max.wait.ms", "fetch.min.bytes",
    "group.id", "group.instance.id", "heartbeat.interval.ms",
    "interceptor.classes", "internal.leave.group.on.close",
    "isolation.level", "key.deserializer", "max.partition.fetch.bytes",
    "max.poll.interval.ms", "max.poll.records", "metadata.max.age.ms",
    "metric.reporters", "metrics.num.samples", "metrics.recording.level",
    "metrics.sample.window.ms", "partition.assignment.strategy",
    "receive.buffer.bytes", "reconnect.backoff.max.ms",
    "reconnect.backoff.ms", "request.timeout.ms", "retry.backoff.max.ms",
    "retry.backoff.ms", "send.buffer.bytes", "session.timeout.ms",
    "socket.connection.setup.timeout.max.ms",
    "socket.connection.setup.timeout.ms", "value.deserializer")

  /** Static snapshot of AdminClientConfig.configNames() (Kafka 3.x,
    * minus the security family below).
    */
  private val adminConfigSnapshot: Set[String] = Set(
    "bootstrap.servers", "client.dns.lookup", "client.id",
    "connections.max.idle.ms", "default.api.timeout.ms",
    "metadata.max.age.ms", "metric.reporters", "metrics.num.samples",
    "metrics.recording.level", "metrics.sample.window.ms",
    "receive.buffer.bytes", "reconnect.backoff.max.ms",
    "reconnect.backoff.ms", "request.timeout.ms", "retries",
    "retry.backoff.max.ms", "retry.backoff.ms", "send.buffer.bytes",
    "socket.connection.setup.timeout.max.ms",
    "socket.connection.setup.timeout.ms")

  /** The security/SSL/SASL family (CommonClientConfigs + SslConfigs +
    * SaslConfigs) shared by all three client planes.
    */
  private val securityConfigSnapshot: Set[String] = Set(
    "security.protocol", "security.providers",
    "sasl.client.callback.handler.class", "sasl.jaas.config",
    "sasl.kerberos.kinit.cmd", "sasl.kerberos.min.time.before.relogin",
    "sasl.kerberos.service.name", "sasl.kerberos.ticket.renew.jitter",
    "sasl.kerberos.ticket.renew.window.factor",
    "sasl.login.callback.handler.class", "sasl.login.class",
    "sasl.login.connect.timeout.ms", "sasl.login.read.timeout.ms",
    "sasl.login.refresh.buffer.seconds",
    "sasl.login.refresh.min.period.seconds",
    "sasl.login.refresh.window.factor", "sasl.login.refresh.window.jitter",
    "sasl.login.retry.backoff.max.ms", "sasl.login.retry.backoff.ms",
    "sasl.mechanism", "sasl.oauthbearer.clock.skew.seconds",
    "sasl.oauthbearer.expected.audience", "sasl.oauthbearer.expected.issuer",
    "sasl.oauthbearer.jwks.endpoint.refresh.ms",
    "sasl.oauthbearer.jwks.endpoint.retry.backoff.max.ms",
    "sasl.oauthbearer.jwks.endpoint.retry.backoff.ms",
    "sasl.oauthbearer.jwks.endpoint.url",
    "sasl.oauthbearer.scope.claim.name", "sasl.oauthbearer.sub.claim.name",
    "sasl.oauthbearer.token.endpoint.url",
    "ssl.cipher.suites", "ssl.enabled.protocols",
    "ssl.endpoint.identification.algorithm", "ssl.engine.factory.class",
    "ssl.key.password", "ssl.keymanager.algorithm",
    "ssl.keystore.certificate.chain", "ssl.keystore.key",
    "ssl.keystore.location", "ssl.keystore.password", "ssl.keystore.type",
    "ssl.protocol", "ssl.provider", "ssl.secure.random.implementation",
    "ssl.trustmanager.algorithm", "ssl.truststore.certificates",
    "ssl.truststore.location", "ssl.truststore.password",
    "ssl.truststore.type")

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
    * sink takes. `group.id` can never reach a producer because it is not
    * a producer config name (the reference's explicit exclusion lives on
    * the consumer path only, ClientConfigFactory.java:87-90 — the belt
    * here is redundant with the name set but kept as a guard for the
    * static-snapshot fallback); values are quote-stripped.
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
