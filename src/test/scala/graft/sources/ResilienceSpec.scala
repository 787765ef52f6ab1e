package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import types._

/**
 * The C1 client seam under a failing backend: transient faults retry
 * invisibly (ref RetryUtils.scala:36-173 policy — bounded count, fixed
 * delay, transient-only), permanent faults surface as clean query errors,
 * and the reference's tuning knobs (receiverTimeout / operationTimeout /
 * prefetchCount, package.scala:39-47) bound the loop. Faults are injected
 * through EventLogClients.installWrapper, UNDER the retry layer, so these
 * tests exercise the production policy end to end through real queries.
 */
class ResilienceSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[EventLogCatalog].getName)
    s
  }
  import spark.implicits._

  /** Programmable failing decorator over the real registry client. */
  private final class FaultInjectingClient(underlying: EventLogClient)
      extends EventLogClient {
    val transientReceiveFaults = new AtomicInteger(0)
    val transientBoundsFaults = new AtomicInteger(0)
    @volatile var permanentlyDown = false
    @volatile var receiveDelayMs = 0L
    val receiveCalls = new AtomicInteger(0)

    private def maybeFail(counter: AtomicInteger, op: String): Unit = {
      if (permanentlyDown)
        throw new IllegalStateException(s"backend permanently down ($op)")
      if (counter.getAndUpdate(n => math.max(0, n - 1)) > 0)
        throw new TransientLogException(s"injected transient fault ($op)")
    }

    override def partitionCount(name: String): Int = underlying.partitionCount(name)
    override def boundedSeqNos(name: String): Map[PartitionId, (SequenceNumber, SequenceNumber)] = {
      maybeFail(transientBoundsFaults, "boundedSeqNos")
      underlying.boundedSeqNos(name)
    }
    override def seekEnqueuedTime(name: String, pid: PartitionId, micros: Long): SequenceNumber =
      underlying.seekEnqueuedTime(name, pid, micros)
    override def receive(name: String, pid: PartitionId, from: SequenceNumber, count: Long)
        : Iterator[(SequenceNumber, Event)] = {
      receiveCalls.incrementAndGet()
      if (receiveDelayMs > 0) Thread.sleep(receiveDelayMs)
      maybeFail(transientReceiveFaults, "receive")
      underlying.receive(name, pid, from, count)
    }
    override def send(name: String, event: Event, pid: Option[PartitionId], key: Option[String])
        : Unit = underlying.send(name, event, pid, key)
  }

  private def freshLog(name: String, partitions: Int = 2, perPartition: Int = 20)
      : InMemoryEventLog = {
    EventLogRegistry.drop(name)
    val log = EventLogRegistry.create(name, partitions)
    for (p <- 0 until partitions; i <- 0 until perPartition)
      log.append(p, Event(s"$p-$i".getBytes("UTF-8"), (i + 1) * 1000000L))
    log
  }

  private def withFaults[T](name: String)(body: FaultInjectingClient => T): T = {
    val holder = new java.util.concurrent.atomic.AtomicReference[FaultInjectingClient]()
    EventLogClients.installWrapper(name, base => {
      // one injector per install; planning and reader resolutions share it
      holder.compareAndSet(null, new FaultInjectingClient(base))
      holder.get()
    })
    try body {
      // force one resolution so the injector exists before the test configures it
      EventLogClients.forConf(EventLogConf(Map("name" -> name)))
      holder.get()
    } finally EventLogClients.clearWrapper(name)
  }

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)

  test("transient faults on planning and receive retry invisibly in a stream") {
    freshLog("res1")
    withFaults("res1") { faults =>
      faults.transientBoundsFaults.set(3)
      faults.transientReceiveFaults.set(3)
      val q = spark.readStream.format("graft-eventlog")
        .option("name", "res1").option("retryDelayMs", "1").load()
        .groupBy().count()
        .writeStream.format("memory").queryName("res1_out")
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        val total = spark.table("res1_out").as[Long].collect().max
        assert(total == 40L, s"lost rows through transient faults: $total")
        assert(faults.transientReceiveFaults.get() == 0 &&
          faults.transientBoundsFaults.get() == 0, "injected faults were not consumed")
      } finally q.stop()
    }
  }

  test("permanent backend failure is a clean query error, not a hang or retry storm") {
    freshLog("res2")
    withFaults("res2") { faults =>
      faults.permanentlyDown = true
      val before = faults.receiveCalls.get()
      val err = intercept[Exception] {
        spark.read.format("graft-eventlog").option("name", "res2")
          .option("retryDelayMs", "1").load().count()
      }
      assert(messages(err).exists(_.contains("permanently down")),
        s"expected the backend error to surface, got: ${messages(err)}")
      // non-transient errors must NOT burn the retry budget
      assert(faults.receiveCalls.get() - before <= 2,
        s"permanent failure was retried ${faults.receiveCalls.get() - before} times")
    }
  }

  test("transient faults beyond maxRetries fail loudly with the retry count") {
    freshLog("res3")
    withFaults("res3") { faults =>
      faults.transientReceiveFaults.set(1000)
      val err = intercept[Exception] {
        // sum() is not metadata-pushable (unlike a bare count, which the
        // aggregate pushdown now answers from offsets without a receive)
        spark.read.format("graft-eventlog").option("name", "res3")
          .option("maxRetries", "2").option("retryDelayMs", "1").load()
          .agg(org.apache.spark.sql.functions.sum("sequenceNumber")).collect()
      }
      assert(messages(err).exists(_.contains("failed after 2 retries")),
        s"got: ${messages(err)}")
    }
  }

  test("a slow but SUCCESSFUL receive is returned, never discarded and re-fetched") {
    freshLog("res4")
    withFaults("res4") { faults =>
      faults.receiveDelayMs = 60L
      val before = faults.receiveCalls.get()
      // the residual filter declines aggregate pushdown, forcing a real
      // receive (a bare count is now offset-served without one)
      val n = spark.read.format("graft-eventlog").option("name", "res4")
        .option("receiverTimeout", "10")
        .option("maxRetries", "5").option("retryDelayMs", "1").load()
        .filter(org.apache.spark.sql.functions.length($"body") >= 0).count()
      assert(n == 40L)
      // one receive per partition — the overrun produced a warning, not a retry
      assert(faults.receiveCalls.get() - before <= 2,
        s"slow successful receives were re-fetched ${faults.receiveCalls.get() - before}x")
    }
  }

  test("a receive FAILING past receiverTimeout stops retrying immediately") {
    freshLog("res4b")
    withFaults("res4b") { faults =>
      faults.receiveDelayMs = 60L
      faults.transientReceiveFaults.set(1000)
      val before = faults.receiveCalls.get()
      val err = intercept[Exception] {
        // sum() forces a real receive — a bare count is now offset-served
        spark.read.format("graft-eventlog").option("name", "res4b")
          .option("receiverTimeout", "10")
          .option("maxRetries", "50").option("retryDelayMs", "1").load()
          .agg(org.apache.spark.sql.functions.sum("sequenceNumber")).collect()
      }
      assert(messages(err).exists(_.contains("receiverTimeout")),
        s"got: ${messages(err)}")
      // the timing-out backend was not hammered with the full retry budget
      assert(faults.receiveCalls.get() - before <= 4,
        s"timing-out receive was retried ${faults.receiveCalls.get() - before}x")
    }
  }

  test("an aborted epoch can re-run: abort sweeps staging without closing it") {
    EventLogRegistry.drop("res8")
    val log = EventLogRegistry.create("res8", 1)
    val key = "q1/7/0/0"
    def stage(): Unit =
      log.stageAll(key, Seq((Some(0), None, Event("row".getBytes, 1000000L))))
    stage()
    log.sweepStaged("q1/7/") // abort path: discard the attempt, epoch stays open
    assert(log.stagedCount("q1/7/") == 0L)
    stage() // the restarted epoch re-stages under the same (query, epoch)
    assert(log.publishStaged("q1/7/", Seq(key)) == 1L,
      "retry after abort must publish, not be silently dropped")
    // ...whereas after a successful publish the epoch IS closed to zombies
    log.stageAll(key, Seq((Some(0), None, Event("zombie".getBytes, 2000000L))))
    assert(log.stagedCount("q1/7/") == 0L, "zombie stage after publish must be dropped")
  }

  test("operationTimeout bounds the whole retry loop even with retries left") {
    freshLog("res5")
    withFaults("res5") { faults =>
      faults.transientReceiveFaults.set(1000000)
      val err = intercept[Exception] {
        // sum() forces a real receive — a bare count is now offset-served
        spark.read.format("graft-eventlog").option("name", "res5")
          .option("operationTimeout", "150").option("retryDelayMs", "50")
          .option("maxRetries", "1000000").load()
          .agg(org.apache.spark.sql.functions.sum("sequenceNumber")).collect()
      }
      assert(messages(err).exists(_.contains("operationTimeout")),
        s"got: ${messages(err)}")
    }
  }

  test("streams recover across triggers: faults in one batch do not poison the next") {
    val log = freshLog("res6", partitions = 2, perPartition = 5)
    withFaults("res6") { faults =>
      val q = spark.readStream.format("graft-eventlog")
        .option("name", "res6").option("retryDelayMs", "1").load()
        .writeStream.format("memory").queryName("res6_out").start()
      try {
        q.processAllAvailable()
        assert(spark.table("res6_out").count() == 10L)
        // next trigger hits fresh transient faults, then new data lands
        faults.transientReceiveFaults.set(2)
        (0 until 2).foreach(p => log.append(p, Event("late".getBytes, 99000000L)))
        q.processAllAvailable()
        assert(spark.table("res6_out").count() == 12L)
      } finally q.stop()
    }
  }

  // ---- tuning-knob conf surface (ref EventHubsConfSuite shapes) ----

  test("conf knobs parse: defaults, millis, ISO-8601 durations") {
    val dflt = EventLogConf(Map("name" -> "k"))
    assert(dflt.maxRetries == 10 && dflt.retryDelayMs == 10L)
    assert(dflt.receiverTimeoutMs == 60000L && dflt.operationTimeoutMs == 300000L)
    assert(dflt.prefetchCount.isEmpty)
    val c = EventLogConf(Map("name" -> "k", "receivertimeout" -> "PT2S",
      "operationtimeout" -> "1500", "prefetchcount" -> "256", "maxretries" -> "3"))
    assert(c.receiverTimeoutMs == 2000L && c.operationTimeoutMs == 1500L)
    assert(c.prefetchCount.contains(256L) && c.maxRetries == 3)
    intercept[IllegalArgumentException] {
      EventLogConf(Map("name" -> "k", "prefetchcount" -> "0")).prefetchCount
    }
    intercept[IllegalArgumentException] {
      EventLogConf(Map("name" -> "k", "receivertimeout" -> "-5")).receiverTimeoutMs
    }
  }

  test("unknown options are rejected loudly, not silently ignored") {
    freshLog("res7")
    val err = intercept[IllegalArgumentException] {
      spark.read.format("graft-eventlog").option("name", "res7")
        .option("receiverTimeoutt", "10").load().count()
    }
    assert(err.getMessage.contains("receivertimeoutt") &&
      err.getMessage.contains("known options"))
    // ...including on a catalog CREATE TABLE (TBLPROPERTIES are options too)
    spark.sql("DROP TABLE IF EXISTS graft.res7_bad")
    val err2 = intercept[Exception] {
      spark.sql("CREATE TABLE graft.res7_bad TBLPROPERTIES ('maxEventsPerTriggerr'='5')")
    }
    assert(messages(err2).exists(_.contains("maxeventspertriggerr")), messages(err2))
  }

  test("prefetchCount caps the parquet striped cursor's read-ahead") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val name = EventLogConf.parquetLogName(path, 4)
    ParquetEventLog.invalidate(path)
    // conf resolution routes the knob to the cursor factory
    EventLogClients.forConf(EventLogConf(
      Map("path" -> path, "partitions" -> "4", "prefetchcount" -> "8")))
    ParquetEventLog.decodedRecords.reset()
    // partition-major consumption (NOT lockstep): with only 8x4 rows of
    // read-ahead the cursor cannot buffer whole other partitions, so later
    // partitions must reposition and re-decode — bounded memory, more IO
    var served = 0L
    (0 until 4).foreach { pid =>
      (0L until 250L by 50L).foreach { from =>
        served += ParquetEventLog.receive(name, pid, from, 50L).size
      }
    }
    assert(served == 1000L)
    val decoded = ParquetEventLog.decodedRecords.sum()
    assert(decoded > 1500L,
      s"decoded only $decoded rows — the 8-row prefetch cap was not applied")
    ParquetEventLog.invalidate(path) // restore default-cap cursor for other suites
  }
}
