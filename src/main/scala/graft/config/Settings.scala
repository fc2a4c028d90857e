package graft.config

/** Typed engine settings — the reference's `DataGenConfig` interface
  * (reference: DataGenConfig.java:9-43) as a Scala case class, with the
  * defaults from application.properties:7-16.
  */
final case class DataGenSettings(
    enabled: Boolean = true,
    consumerGroupCount: Int = 1,
    shareGroupCount: Int = 1,
    streamsGroupCount: Int = 1,
    membersPerGroup: Int = 1,
    topicsPerMember: Int = 1,
    partitionsPerTopic: Int = 1,
    maxTopicDepth: Long = 5000L,
    topicPattern: String = "console_datagen_%03d-%s",
    compressionTypes: Seq[String] = Seq("none"),
    // cluster name -> kafka option overrides (datagen.kafka.<cluster>.configs.*)
    clusters: Map[String, Map[String, String]] = Map("default" -> Map.empty)) {

  /** Per-group compression codec rotation
    * (reference: DataGenerator.java:99-100, :364-365).
    */
  def compressionFor(groupNumber: Int): String =
    compressionTypes(groupNumber % compressionTypes.size)
}

/** C1: per-cluster client config resolution — the reference intersects the
  * client type's known config names with per-cluster overrides, falling
  * back to shared defaults, strips quotes, and drops `group.id` from
  * non-consumer configs (reference: ClientConfigFactory.java:61-113,
  * quote-strip :133-135, group.id exclusion :87-90).
  *
  * The relational form of the same lookup is
  * [[graft.operators.ConfigResolve]] (J2); this is the driver-plane form
  * used to assemble `kafka.*` options for sources/sinks.
  */
object ClusterConfigs {

  private val quote = "(^[\"'])|([\"']$)".r

  def stripQuotes(v: String): String = quote.replaceAllIn(v, "")

  def resolve(knownNames: Set[String],
              overrides: Map[String, String],
              defaults: Map[String, String],
              excludeNames: Set[String] = Set.empty): Map[String, String] =
    knownNames.diff(excludeNames).flatMap { name =>
      overrides.get(name).orElse(defaults.get(name))
        .map(v => name -> stripQuotes(v))
    }.toMap

  /** Prefix the resolved entries for Spark's Kafka source/sink options. */
  def asSparkKafkaOptions(resolved: Map[String, String]): Map[String, String] =
    resolved.map { case (k, v) => s"kafka.$k" -> v }
}
