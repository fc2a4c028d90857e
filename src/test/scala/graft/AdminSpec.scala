package graft

import graft.admin.{InMemoryTopicAdmin, TlsTrust, TopicLifecycle}
import graft.config.{ClusterConfigs, DataGenSettings}
import org.scalatest.funsuite.AnyFunSuite

class AdminSpec extends AnyFunSuite {
  import TopicLifecycle._

  test("K2 createAll applies segment configs and settles") {
    val admin = new InMemoryTopicAdmin
    var slept = Vector.empty[Long]
    TopicLifecycle.createAll(admin, Seq("t1", "t2"), partitionsPerTopic = 3,
      sleep = slept :+= _)
    assert(admin.topics.keySet == Set("t1", "t2"))
    assert(admin.topics("t1").partitions == 3)
    assert(admin.topics("t1").configs("segment.bytes") == "10485760")
    assert(slept == Vector(5000L))
  }

  test("K3 deleteAll retries stubborn topics to fixpoint") {
    val admin = new InMemoryTopicAdmin
    TopicLifecycle.createAll(admin, Seq("a", "b"), 1, sleep = _ => ())
    admin.stubborn = Map("b" -> 2) // refuses deletion twice
    val attempts = TopicLifecycle.deleteAll(admin, Seq("a", "b"), sleep = _ => ())
    assert(admin.topics.isEmpty && attempts == 3)
  }

  test("K3 deleteAll gives up after 10 attempts") {
    val admin = new InMemoryTopicAdmin
    TopicLifecycle.createAll(admin, Seq("a"), 1, sleep = _ => ())
    admin.stubborn = Map("a" -> 100)
    val attempts = TopicLifecycle.deleteAll(admin, Seq("a"), sleep = _ => ())
    assert(attempts == 10 && admin.topics.keySet == Set("a"))
  }

  test("K4 deleteStaleGroups: EMPTY + prefix only, grouped by type (F1/F2/A2)") {
    val admin = new InMemoryTopicAdmin
    admin.groups = Seq(
      GroupInfo("console-datagen-group-consumer-0", "consumer", "EMPTY"),
      GroupInfo("console-datagen-group-consumer-1", "consumer", "STABLE"), // not empty
      GroupInfo("other-app-group", "consumer", "EMPTY"),                    // not ours
      GroupInfo("console-datagen-group-share-0", "share", "EMPTY"))
    val deleted = TopicLifecycle.deleteStaleGroups(admin)
    assert(deleted == Map(
      "consumer" -> Seq("console-datagen-group-consumer-0"),
      "share" -> Seq("console-datagen-group-share-0")))
    assert(admin.groups.map(_.groupId).toSet ==
      Set("console-datagen-group-consumer-1", "other-app-group"))
  }

  test("A6 availability counts reachable clusters") {
    val up = new InMemoryTopicAdmin
    val down = new InMemoryTopicAdmin; down.up = false
    assert(TopicLifecycle.availability(Seq(up, down, up)) == (2, 3))
  }

  test("C1 resolve: known-name intersection, override-beats-default, quote strip, exclusion") {
    val got = ClusterConfigs.resolve(
      knownNames = Set("acks", "linger.ms", "group.id", "batch.size"),
      overrides = Map("acks" -> "\"all\"", "unknown.conf" -> "x"),
      defaults = Map("acks" -> "1", "linger.ms" -> "'5'", "group.id" -> "g"),
      excludeNames = Set("group.id"))
    assert(got == Map("acks" -> "all", "linger.ms" -> "5"))
  }

  test("C1 spark option prefixing") {
    assert(ClusterConfigs.asSparkKafkaOptions(Map("acks" -> "1")) ==
      Map("kafka.acks" -> "1"))
  }

  test("compression codec rotation (reference :99-100)") {
    val s = DataGenSettings(compressionTypes = Seq("none", "gzip", "lz4"))
    assert((0 to 4).map(s.compressionFor) == Seq("none", "gzip", "lz4", "none", "gzip"))
  }

  test("C2 shouldAutoTrust decision rule") {
    assert(TlsTrust.shouldAutoTrust(true, Map("security.protocol" -> "SASL_SSL")))
    assert(!TlsTrust.shouldAutoTrust(false, Map("security.protocol" -> "SSL")))
    assert(!TlsTrust.shouldAutoTrust(true, Map("security.protocol" -> "PLAINTEXT")))
    assert(!TlsTrust.shouldAutoTrust(true, Map(
      "security.protocol" -> "SSL", "ssl.truststore.location" -> "/x")))
  }

  test("C2 PEM encoding + injection") {
    val der = Array.tabulate[Byte](100)(_.toByte)
    val pem = TlsTrust.pemEncode(der)
    assert(pem.startsWith("-----BEGIN CERTIFICATE-----\n"))
    assert(pem.endsWith("\n-----END CERTIFICATE-----"))
    val injected = TlsTrust.withAutoTrust(
      Map("security.protocol" -> "SSL"), "broker:9093",
      trustCertificates = true, fetch = (h, p) => s"PEM($h:$p)")
    assert(injected("ssl.truststore.type") == "PEM")
    assert(injected("ssl.truststore.certificates") == "PEM(broker:9093)")
  }

  test("liveness HTTP: 200 when all checks UP, 503 with failing check, SmallRye JSON shape") {
    import graft.health.Liveness
    import Liveness.CheckResult
    @volatile var consumerUp = true
    val server = new Liveness.Server(0, () => Seq(
      CheckResult("admin-connectivity", up = true, Map("clusters" -> "1/1")),
      CheckResult("producer-progress", up = true, Map("records" -> "5000")),
      CheckResult("consumer-progress", consumerUp, Map("records" -> "4800"))))
    try {
      def probe(): (Int, String) = {
        val url = new java.net.URL(s"http://127.0.0.1:${server.boundPort}/health/live")
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = scala.io.Source.fromInputStream(is).mkString
        (code, body)
      }
      val (okCode, okBody) = probe()
      assert(okCode == 200)
      assert(okBody.contains("\"status\":\"UP\""))
      assert(okBody.contains("\"name\":\"consumer-progress\""))
      assert(okBody.contains("\"records\":\"5000\""))
      consumerUp = false
      val (downCode, downBody) = probe()
      assert(downCode == 503)
      assert(downBody.startsWith("{\"status\":\"DOWN\""))
      assert(downBody.contains("{\"name\":\"consumer-progress\",\"status\":\"DOWN\""))
    } finally server.stop()
  }
}
