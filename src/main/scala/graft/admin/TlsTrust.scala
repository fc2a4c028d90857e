package graft.admin

import java.security.cert.X509Certificate
import javax.net.ssl.{SSLContext, SSLSocket, TrustManager, X509TrustManager}
import java.util.Base64

/** C2: TLS auto-trust (SURVEY §2.8) — when trust-certificates is enabled,
  * the protocol is SSL and no truststore is configured, fetch the broker's
  * certificate chain over a trust-all handshake and inject it as PEM
  * truststore options (reference: ClientConfigFactory.java:137-184).
  * Pure JDK; no Kafka types.
  */
object TlsTrust {

  private object TrustAll extends X509TrustManager {
    override def checkClientTrusted(chain: Array[X509Certificate], authType: String): Unit = ()
    override def checkServerTrusted(chain: Array[X509Certificate], authType: String): Unit = ()
    override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
  }

  /** PEM-encode a DER certificate payload (64-char base64 lines). */
  def pemEncode(der: Array[Byte]): String = {
    val b64 = Base64.getEncoder.encodeToString(der).grouped(64).mkString("\n")
    s"-----BEGIN CERTIFICATE-----\n$b64\n-----END CERTIFICATE-----"
  }

  /** Fetch the peer certificate chain of `host:port` trusting everything
    * (the reference's bootstrap-trust step), PEM-encoded.
    */
  def fetchPeerChainPem(host: String, port: Int, timeoutMs: Int = 10000): String = {
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, Array[TrustManager](TrustAll), new java.security.SecureRandom())
    val socket = ctx.getSocketFactory.createSocket(host, port).asInstanceOf[SSLSocket]
    try {
      socket.setSoTimeout(timeoutMs)
      socket.startHandshake()
      socket.getSession.getPeerCertificates.collect {
        case c: X509Certificate => pemEncode(c.getEncoded)
      }.mkString("\n")
    } finally socket.close()
  }

  /** The reference's decision rule (ClientConfigFactory.java:139-149):
    * only auto-trust when asked to, speaking SSL, and not already
    * configured with a truststore.
    */
  def shouldAutoTrust(trustCertificates: Boolean, config: Map[String, String]): Boolean =
    trustCertificates &&
      config.getOrElse("security.protocol", "").contains("SSL") &&
      !config.keys.exists(_.startsWith("ssl.truststore"))

  /** Inject the fetched chain as PEM truststore config
    * (reference :168-173).
    */
  def withAutoTrust(config: Map[String, String], bootstrap: String,
                    trustCertificates: Boolean,
                    fetch: (String, Int) => String = fetchPeerChainPem(_, _)): Map[String, String] =
    if (!shouldAutoTrust(trustCertificates, config)) config
    else {
      val Array(host, port) = bootstrap.split(",").head.split(":")
      config ++ Map(
        "ssl.truststore.type" -> "PEM",
        "ssl.truststore.certificates" -> fetch(host, port.toInt))
    }
}
