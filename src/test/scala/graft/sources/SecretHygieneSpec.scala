package graft.sources

import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Secret hygiene seam (ref EventHubsConf.scala:137-145 — connection strings
 * stored encrypted in the settings bag; EventHubsConf.trimmed:163-191 —
 * driver-only options never ship to executors; EventHubsUtils.scala:187-207
 * — the encrypt/decrypt pair). Local backends carry no credentials, so this
 * pins the SEAM: sealing at every connector boundary, redaction in renders,
 * EntityPath naming, and the executor-trimmed option set.
 */
class SecretHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Secret = "TOPSECRET123"
  private def connStr(hub: String) =
    s"Endpoint=sb://ns.example/;SharedAccessKeyName=key;" +
      s"SharedAccessKey=$Secret;EntityPath=$hub"

  test("connection string is sealed at the boundary and redacted in renders") {
    val conf = EventLogConf(new CaseInsensitiveStringMap(
      java.util.Map.of("connectionString", connStr("h1"), "partitions", "2")))
    // sealed at rest: the options map holds ciphertext, not the secret
    assert(conf.options("connectionstring").startsWith("enc:"))
    assert(!conf.options("connectionstring").contains(Secret))
    // the accessor round-trips
    assert(conf.connectionString.contains(connStr("h1")))
    // renders redact
    assert(!conf.toString.contains(Secret))
    assert(conf.toString.contains("connectionstring=[REDACTED]"))
    // sealing is idempotent (mixed-provenance maps normalize safely)
    assert(EventLogConf.sealSecrets(conf.options) == conf.options)
  }

  test("EntityPath names the log: reference-style connection-string-only reads work") {
    EventLogRegistry.drop("csHub")
    val log = EventLogRegistry.create("csHub", 2)
    for (i <- 0 until 6)
      log.append(i % 2, Event(s"e$i".getBytes("UTF-8"), (i + 1) * 1000000L))
    val df = spark.read.format("graft-eventlog")
      .option("connectionString", connStr("csHub")).load()
    assert(df.count() == 6)
    // neither the logical nor the executed plan carries the plaintext secret
    val rendered = df.queryExecution.logical.toString +
      df.queryExecution.executedPlan.toString + df.queryExecution.toString
    assert(!rendered.contains(Secret), "plaintext secret leaked into a plan render")
  }

  test("executorTrimmed ships reader needs only; planning options stay on the driver") {
    val conf = EventLogConf(Map(
      "name" -> "h2", "partitions" -> "4",
      "connectionstring" -> Obfuscation.seal(connStr("h2")),
      "startingposition" -> """{"seqNo":5}""",
      "startingpositions" -> """{"0":{"seqNo":1}}""",
      "maxeventspertrigger" -> "100",
      "maxratesperpartition" -> """{"0":10}""",
      "placementstrategy" -> "hash",
      "slowpartitionadjustment" -> "true",
      "maxacceptablebatchreceivetime" -> "5000",
      "maxretries" -> "3", "receivertimeout" -> "1000",
      "prefetchcount" -> "64", "consumergroup" -> "g1"))
    val t = conf.executorTrimmed
    // identity + credentials + receive/retry tuning survive
    assert(t.name == "h2" && t.partitions == 4)
    assert(t.connectionString.contains(connStr("h2")))
    assert(t.maxRetries == 3 && t.receiverTimeoutMs == 1000L)
    assert(t.prefetchCount.contains(64L) && t.consumerGroup == "g1")
    // the slow-partition feedback pair must ship: readers record receive
    // metrics gated on it (stripping it would silently disable R3 — the
    // reference's trimmed conf keeps both keys for the same reason)
    assert(t.slowPartitionAdjustment, "slowpartitionadjustment must ship")
    assert(t.maxAcceptableBatchReceiveTimeMs == 5000L)
    // planning-only state does not serialize into tasks
    for (k <- Seq("startingposition", "startingpositions", "maxeventspertrigger",
        "maxratesperpartition", "placementstrategy"))
      assert(!t.options.contains(k), s"$k must not ship to executors")
    // the secret stays sealed in the shipped form
    assert(t.options("connectionstring").startsWith("enc:"))
  }

  test("seal/unseal round-trips any plaintext, including marker-colliding values") {
    val rnd = new scala.util.Random(42)
    val tricky = Seq("", "enc:", "enc:not-base64!!", "enc:QUJD",
      "enc:" + java.util.Base64.getEncoder.encodeToString(Array.fill(32)(7: Byte)))
    val random = Seq.fill(50)(rnd.alphanumeric.take(rnd.nextInt(64)).mkString)
    for (v <- tricky ++ random) {
      val sealed0 = Obfuscation.seal(v)
      assert(Obfuscation.unseal(sealed0) == v, s"roundtrip failed for '$v'")
      // idempotent: sealing the sealed form changes nothing
      assert(Obfuscation.seal(sealed0) == sealed0)
      // at rest, never the plaintext (except the degenerate empty string)
      if (v.nonEmpty) assert(sealed0 != v)
    }
  }

  test("catalog-persisted table properties never hold a plaintext credential") {
    val cat = new EventLogCatalog()
    cat.initialize("graftsec", new CaseInsensitiveStringMap(java.util.Map.of()))
    EventLogRegistry.drop("csCat")
    cat.createTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "csCat"),
      EventLogTable.schema, Array.empty,
      java.util.Map.of("connectionString", connStr("csCat"), "partitions", "2"))
    val stored = EventLogCatalog.propsOf("csCat")
    assert(stored.get("connectionstring").exists(_.startsWith("enc:")))
    assert(!stored.values.exists(_.contains(Secret)),
      "stored TBLPROPERTIES leaked the plaintext secret")
  }
}
