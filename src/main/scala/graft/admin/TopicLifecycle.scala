package graft.admin

import scala.util.control.NonFatal

/** K2-K4: topic/group lifecycle (SURVEY §2.7), driver-plane.
  *
  * The broker boundary is the `TopicAdmin` trait — production binds it to
  * an Apache Kafka `Admin` client (not present in this environment); tests
  * bind [[InMemoryTopicAdmin]]. Semantics mirrored from the reference:
  *  - create with segment.bytes=10MiB / segment.ms=10min + settle sleep
  *    (reference: DataGenerator.java:323-347)
  *  - delete with retry <= 10 x 5s until gone everywhere (:296-321)
  *  - delete only EMPTY groups with the generated prefix, dispatched by
  *    group type (:248-294; F1/F2 filters)
  */
object TopicLifecycle {

  final case class TopicSpec(name: String, partitions: Int, replication: Short,
                             configs: Map[String, String])
  final case class GroupInfo(groupId: String, groupType: String, state: String)

  trait TopicAdmin {
    def createTopics(specs: Seq[TopicSpec]): Unit
    def deleteTopics(names: Seq[String]): Unit
    /** names that still exist out of `names` */
    def existing(names: Seq[String]): Seq[String]
    def listGroups(states: Set[String]): Seq[GroupInfo]
    def deleteGroups(groupType: String, ids: Seq[String]): Unit
    def clusterId(): Option[String]
  }

  val groupPrefix = "console-datagen-group-"
  val segmentConfigs: Map[String, String] = Map(
    "segment.bytes" -> (10 * 1024 * 1024).toString, // reference :326-329
    "segment.ms" -> (10 * 60 * 1000).toString)

  val deleteRetries = 10
  val retryDelayMs = 5000L
  val settleMs = 5000L

  def createAll(admin: TopicAdmin, topics: Seq[String], partitionsPerTopic: Int,
                replication: Short = 1, sleep: Long => Unit = Thread.sleep): Unit = {
    admin.createTopics(topics.map(TopicSpec(_, partitionsPerTopic, replication, segmentConfigs)))
    sleep(settleMs) // reference :345
  }

  /** K3: delete-with-retry until no topic remains (fixpoint loop,
    * reference :296-321). Returns the number of attempts used.
    */
  def deleteAll(admin: TopicAdmin, topics: Seq[String],
                sleep: Long => Unit = Thread.sleep): Int = {
    var attempt = 0
    var remaining = topics
    while (remaining.nonEmpty && attempt < deleteRetries) {
      attempt += 1
      try admin.deleteTopics(remaining) catch { case NonFatal(_) => () }
      sleep(retryDelayMs)
      remaining = admin.existing(remaining)
    }
    sleep(settleMs) // reference :319
    attempt
  }

  /** K4: delete stale generated groups — only EMPTY ones (F2, server-side
    * state pushdown), only ours (F1 prefix filter), dispatched per type
    * (A2 grouping; reference :248-294).
    */
  def deleteStaleGroups(admin: TopicAdmin): Map[String, Seq[String]] = {
    val mine = admin.listGroups(Set("EMPTY"))
      .filter(_.groupId.startsWith(groupPrefix))        // F1
    val byType = mine.groupBy(_.groupType)              // A2
      .map { case (t, gs) => t -> gs.map(_.groupId).sorted }
    byType.foreach { case (t, ids) => admin.deleteGroups(t, ids) }
    byType
  }

  /** A6: cluster availability — fraction of clusters reachable
    * (reference: AdminConnectivityCheck.java:32-47).
    */
  def availability(admins: Seq[TopicAdmin]): (Int, Int) =
    (admins.count(a => try a.clusterId().isDefined catch { case NonFatal(_) => false }),
      admins.size)
}

/** Test double with controllable failure behavior. */
class InMemoryTopicAdmin extends TopicLifecycle.TopicAdmin {
  import TopicLifecycle._
  var topics: Map[String, TopicSpec] = Map.empty
  var groups: Seq[GroupInfo] = Seq.empty
  var deletedGroups: Vector[(String, Seq[String])] = Vector.empty
  /** topics that refuse deletion for the first n attempts */
  var stubborn: Map[String, Int] = Map.empty
  var up: Boolean = true

  override def createTopics(specs: Seq[TopicSpec]): Unit =
    topics ++= specs.map(s => s.name -> s)
  override def deleteTopics(names: Seq[String]): Unit = names.foreach { n =>
    stubborn.get(n) match {
      case Some(left) if left > 0 => stubborn += n -> (left - 1)
      case _ => topics -= n
    }
  }
  override def existing(names: Seq[String]): Seq[String] =
    names.filter(topics.contains)
  override def listGroups(states: Set[String]): Seq[GroupInfo] =
    groups.filter(g => states.contains(g.state))
  override def deleteGroups(groupType: String, ids: Seq[String]): Unit = {
    deletedGroups :+= (groupType -> ids)
    groups = groups.filterNot(g => g.groupType == groupType && ids.contains(g.groupId))
  }
  override def clusterId(): Option[String] = if (up) Some("test-cluster") else None
}
