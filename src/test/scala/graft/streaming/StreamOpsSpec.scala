package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.{Event, EventLogRegistry}

class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def populate(name: String, partitions: Int, n: Int) = {
    EventLogRegistry.drop(name)
    val log = EventLogRegistry.create(name, partitions)
    for (p <- 0 until partitions; i <- 0 until n)
      log.append(p, Event(s"$p-$i".getBytes, i * 1000000L))
    log
  }

  test("windowedCounts over the source (reference demo shape)") {
    populate("so1", 2, 100) // 2 partitions, events at t=0..99s
    val src = spark.readStream.format("graft-eventlog").option("name", "so1").load()
    val q = StreamOps.windowedCounts(src, "enqueuedTime", "10 seconds", "10 seconds")
      .writeStream.format("memory").queryName("so1_out").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val counts = spark.table("so1_out").select($"n").as[Long].collect()
    assert(counts.length == 10 && counts.forall(_ == 20))
  }

  test("streamingDedup drops same-key duplicates within the watermark") {
    EventLogRegistry.drop("so2")
    val log = EventLogRegistry.create("so2", 1)
    // bodies repeat: 0,1,2,0,1,2,... at increasing times
    for (i <- 0 until 30) log.append(0, Event(s"${i % 3}".getBytes, i * 1000000L))
    val src = spark.readStream.format("graft-eventlog").option("name", "so2").load()
      .select(col("enqueuedTime"), col("body").cast("string").as("k"))
      .withColumn("enqueuedTime", lit(Timestamp.valueOf("2024-01-01 00:00:00")))
    val q = StreamOps.streamingDedup(src, "enqueuedTime", "1 hour", Seq("k"))
      .writeStream.format("memory").queryName("so2_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("so2_out").count() == 3)
  }

  test("sessionize closes sessions on gap events and flushes idle keys via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    def ts(s: Long) = new Timestamp(s * 1000)
    // user a: events at 1s,10s then 1000s (gap closes first session of 2).
    // NB: an event at t=0 would be dropped by the initial watermark boundary
    // (eventTime <= watermark(0)), so timestamps start at 1s.
    input.addData(("a", ts(1)), ("a", ts(10)), ("b", ts(5)))
    val q = StreamOps.sessionize(input.toDS(), gapMs = 60000)
      .writeStream.format("memory").queryName("so3_out").outputMode("append").start()
    q.processAllAvailable()
    input.addData(("a", ts(1000)))
    q.processAllAvailable()
    input.addData(("a", ts(5000)))
    q.processAllAvailable()
    // advance the watermark far past every open session so event-time
    // timeouts flush them (b's only session, a's 1000s and 5000s sessions)
    input.addData(("z", ts(100000)))
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("so3_out")
      .as[StreamOps.SessionUpdate].collect()
      .filter(_.key != "z").sortBy(s => (s.startMs, s.key))
    assert(sessions.map(s => (s.key, s.nEvents)).toSeq ==
      Seq(("a", 2L), ("b", 1L), ("a", 1L), ("a", 1L)), sessions.mkString(","))
  }

  test("foreachWriter round-robins into a named log (ref S11)") {
    EventLogRegistry.drop("so4"); populate("so4src", 1, 12)
    EventLogRegistry.create("so4", 3)
    val q = spark.readStream.format("graft-eventlog").option("name", "so4src").load()
      .select(col("body").cast("string").as("value")).as[String]
      .writeStream.foreach(StreamOps.foreachWriter("so4"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val bounds = EventLogRegistry.boundedSeqNos("so4")
    assert(bounds.values.map(_._2).sum == 12)
    assert(bounds.values.forall(_._2 > 0), s"round robin skipped: $bounds")
  }

  test("heavyHitterSink: bounded state, skewed terms found, replayed epochs skipped") {
    // 3 heavy terms spread across batches + a long distinct tail: state may
    // never exceed k candidates + one sketch, yet the heavy terms must win
    val (tracker, fn) = StreamOps.heavyHitterSink("body", k = 3)
    def batch(rows: Seq[String]) = rows.toDF("body")
    // batch 0: alpha-heavy; batch 1: beta-heavy; batch 2: gamma + tail noise
    fn(batch(Seq.fill(40)("alpha common") ++ Seq.tabulate(20)(i => s"t0_$i")), 0L)
    fn(batch(Seq.fill(30)("beta common") ++ Seq.tabulate(20)(i => s"t1_$i")), 1L)
    fn(batch(Seq.fill(25)("gamma") ++ Seq.tabulate(20)(i => s"t2_$i")), 2L)
    val got = tracker.result
    assert(got.length <= 3, s"state exceeded k: $got")
    // common: 70 across epochs; alpha 40; beta 30 — the cross-batch merge
    // must rank 'common' first even though no single batch made it #1
    assert(got.map(_._1) == Seq("common", "alpha", "beta"), got.toString)
    assert(got.toMap.apply("common") == 70L, got.toString)
    // replayed epoch (failure recovery re-runs epoch 2): counts unchanged
    fn(batch(Seq.fill(25)("gamma")), 2L)
    assert(tracker.estimate("gamma") == 25L, "replayed epoch was double-merged")
    // a fresh epoch does merge
    fn(batch(Seq.fill(50)("gamma")), 3L)
    assert(tracker.estimate("gamma") == 75L)
    // checkpoint/restore: a restarted driver resumes the tracker — same
    // top-k, same estimates, and the restored epoch floor still rejects a
    // replay of the last merged epoch
    val (restored, fn2) = StreamOps.heavyHitterSink("body", k = 3)
    restored.restore(tracker.toBytes)
    assert(restored.result == tracker.result)
    fn2(batch(Seq.fill(50)("gamma")), 3L) // replay of epoch 3: skipped
    assert(restored.estimate("gamma") == 75L)
    fn2(batch(Seq.fill(5)("gamma")), 4L)  // new epoch: merged
    assert(restored.estimate("gamma") == 80L)
  }
}
