package graft.sources

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Per-partition starting/ending positions (ref EventHubsConf.scala:244-315,
 * exercised like EventHubsSourceSuite.scala:419-564 "specific seqNos"),
 * per-partition max rates (ref :331-369), and the consumer-group namespace.
 */
class PerPartitionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLog(name: String, perPartition: Int = 10): Unit = {
    EventLogRegistry.drop(name)
    val log = EventLogRegistry.create(name, 4)
    for (p <- 0 until 4; i <- 0 until perPartition)
      log.append(p, Event(s"$p-$i".getBytes("UTF-8"), (i + 1) * 1000000L))
  }

  test("batch: per-partition starting positions override the global default") {
    freshLog("pp1")
    val df = spark.read.format("graft-eventlog").option("name", "pp1")
      .option("startingPositions",
        """{"0":{"seqNo":5},"1":{"enqueuedTime":"1970-01-01T00:00:08Z"},"2":"end-of-stream"}""")
      .load()
    val counts = df.groupBy($"partition").count()
      .as[(String, Long)].collect().toMap
    // p0 from seqNo 5 -> 5 events; p1 from ts 8s -> seqNos 7,8,9; p2 empty;
    // p3 falls back to the global start-of-stream default -> all 10
    assert(counts == Map("0" -> 5L, "1" -> 3L, "3" -> 10L))
  }

  test("batch: byte-offset positions seek like the reference's third position kind") {
    freshLog("pp-off")
    // numeric offset on p0 (local logs define offset == the seqNo string the
    // source's offset column emits), "-1" = start on p1, "@latest" = end on
    // p2; p3 falls through to the global {"offset":"4"} default
    val df = spark.read.format("graft-eventlog").option("name", "pp-off")
      .option("startingPositions",
        """{"0":{"offset":"5"},"1":{"offset":"-1"},"2":{"offset":"@latest"}}""")
      .option("startingPosition", """{"offset":"4"}""")
      .load()
    val counts = df.groupBy($"partition").count().as[(String, Long)].collect().toMap
    assert(counts == Map("0" -> 5L, "1" -> 10L, "3" -> 6L))
    // the offset column round-trips: feeding an emitted offset back as the
    // start position begins exactly at that event
    val emitted = df.filter($"partition" === "0").select($"offset")
      .as[String].collect().map(_.toLong).min
    assert(emitted == 5L)
    // a token the log never issued fails loudly, not silently — both
    // non-numeric and negative-non-sentinel forms ("-2" is a seqNo sentinel
    // no log ever issues as an offset; accepting it would clamp silently)
    for (bad <- Seq("not-an-offset", "-2")) {
      val err = intercept[Exception] {
        spark.read.format("graft-eventlog").option("name", "pp-off")
          .option("startingPosition", s"""{"offset":"$bad"}""")
          .load().count()
      }
      assert(err.getMessage != null)
    }
    // position parse/render round-trip for the new kind
    val p = EventPosition.parse("""{"offset":"123"}""")
    assert(p == EventPosition.FromOffset("123"))
    assert(EventPosition.parse(EventPosition.render(p)) == p)
  }

  test("batch: per-partition ending positions") {
    freshLog("pp2")
    val df = spark.read.format("graft-eventlog").option("name", "pp2")
      .option("endingPositions", """{"1":{"seqNo":3},"2":{"seqNo":0}}""")
      .load()
    val counts = df.groupBy($"partition").count().as[(String, Long)].collect().toMap
    assert(counts == Map("0" -> 10L, "1" -> 3L, "3" -> 10L))
  }

  test("streaming: initial offset honors per-partition positions") {
    freshLog("pp3")
    val conf = EventLogConf(Map(
      "name" -> "pp3",
      "startingposition" -> """{"seqNo":2}""",
      "startingpositions" -> """{"0":{"seqNo":7},"2":"end-of-stream"}"""))
    val stream = new EventLogMicroBatchStream(conf, EventLogTable.schema)
    val init = stream.initialOffset().asInstanceOf[EventLogSourceOffset]
    assert(init.seqNos == Map(0 -> 7L, 1 -> 2L, 2 -> 10L, 3 -> 2L))
  }

  test("streaming: maxRatesPerPartition clamps admission control per partition") {
    freshLog("pp4", perPartition = 5000)
    val conf = EventLogConf(Map(
      "name" -> "pp4",
      "maxratesperpartition" -> """{"0":100,"3":250}"""))
    val stream = new EventLogMicroBatchStream(conf, EventLogTable.schema)
    val start = stream.initialOffset().asInstanceOf[EventLogSourceOffset]
    val end = stream.latestOffset(start, ReadLimit.maxRows(4000))
      .asInstanceOf[EventLogSourceOffset]
    val shares = end.seqNos.map { case (p, u) => p -> (u - start.seqNos(p)) }
    assert(shares(0) == 100L, s"capped p0 got ${shares(0)}")
    assert(shares(3) == 250L, s"capped p3 got ${shares(3)}")
    assert(shares(1) == 1000L && shares(2) == 1000L, s"uncapped shares $shares")
  }

  test("consumer groups keep independent throttling state") {
    val a = EventLogConf(Map("name" -> "ppg", "consumergroup" -> "groupA"))
    val b = EventLogConf(Map("name" -> "ppg", "consumergroup" -> "groupB"))
    val default = EventLogConf(Map("name" -> "ppg"))
    assert(a.throttlerKey != b.throttlerKey && a.throttlerKey != default.throttlerKey)
    PartitionThrottler.drop(a.throttlerKey); PartitionThrottler.drop(b.throttlerKey)
    val ta = PartitionThrottler.forLog(a.throttlerKey)
    for (p <- 0 until 3) ta.record(0L, p, 1000, (1000 * 20e6).toLong)
    ta.record(0L, 3, 1000, (1000 * 200e6).toLong)
    assert(ta.factors(3) < 1.0, "group A sees its slow partition")
    assert(PartitionThrottler.forLog(b.throttlerKey).factors(3) == 1.0,
      "group B must not inherit group A's feedback")
  }
}
