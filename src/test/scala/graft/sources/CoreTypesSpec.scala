package graft.sources

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import types._

class CoreTypesSpec extends AnyFunSuite {

  test("EventPosition parse/render roundtrip") {
    assert(EventPosition.parse("start-of-stream") == EventPosition.FromStartOfStream)
    assert(EventPosition.parse("end-of-stream") == EventPosition.FromEndOfStream)
    assert(EventPosition.parse("earliest") == EventPosition.FromStartOfStream)
    assert(EventPosition.parse("""{"seqNo":42}""") ==
      EventPosition.FromSequenceNumber(42))
    assert(EventPosition.parse("""{"enqueuedTime":"2024-01-01T00:00:00Z"}""") ==
      EventPosition.FromEnqueuedTime(Instant.parse("2024-01-01T00:00:00Z")))
    assert(EventPosition.parse("17") == EventPosition.FromSequenceNumber(17))
    for (p <- Seq(EventPosition.FromStartOfStream, EventPosition.FromEndOfStream,
        EventPosition.FromSequenceNumber(5),
        EventPosition.FromEnqueuedTime(Instant.parse("2024-06-01T12:00:00Z")))) {
      assert(EventPosition.parse(EventPosition.render(p)) == p)
    }
    intercept[IllegalArgumentException](EventPosition.parse("nonsense"))
  }

  test("offset JSON roundtrip (ref JsonUtilsSuite semantics)") {
    val off = EventLogSourceOffset("hub", Map(0 -> 5L, 1 -> 17L, 2 -> 0L))
    val json = off.json()
    assert(json == """{"hub":{"0":5,"1":17,"2":0}}""")
    assert(EventLogSourceOffset.parse(json) == off)
    // names with special chars survive
    val off2 = EventLogSourceOffset("""h"b""", Map(0 -> 1L))
    assert(EventLogSourceOffset.parse(off2.json()) == off2)
  }

  test("OffsetRange invariants") {
    val np = NameAndPartition("h", 0)
    assert(OffsetRange(np, 3, 8, None).count == 5)
    intercept[IllegalArgumentException](OffsetRange(np, 8, 3, None))
    intercept[IllegalArgumentException](NameAndPartition("h", -1))
  }

  test("rate limit: all-available when under budget") {
    val bounds = Map(0 -> ((0L, 10L)), 1 -> ((5L, 10L)))
    assert(RateLimiter.prorate(bounds, 100) == Map(0 -> 10L, 1 -> 10L))
  }

  test("rate limit: proportional proration on uniform backlog (ref EventHubsSourceSuite:202-255)") {
    // 4 partitions x 5000 backlog, budget 4000 -> 1000 each
    val bounds = (0 until 4).map(p => p -> ((0L, 5000L))).toMap
    val r = RateLimiter.prorate(bounds, 4000)
    assert(r.values.toSet == Set(1000L))
  }

  test("rate limit: non-uniform proration, small partitions not starved (ref :331-394)") {
    // backlogs 1000 / 1 / 1, budget 300: big partition gets ~298, tiny ones >=1
    val bounds = Map(0 -> ((0L, 1000L)), 1 -> ((0L, 1L)), 2 -> ((0L, 1L)))
    val r = RateLimiter.prorate(bounds, 300)
    assert(r(1) == 1L && r(2) == 1L, s"tiny partitions starved: $r")
    assert(r(0) >= 298L && r(0) <= 300L, s"big partition share wrong: $r")
  }

  test("rate limit: zero backlog returns froms; clamped to latest") {
    val bounds = Map(0 -> ((7L, 7L)))
    assert(RateLimiter.prorate(bounds, 10) == Map(0 -> 7L))
    val b2 = Map(0 -> ((0L, 3L)), 1 -> ((0L, 3000L)))
    val r2 = RateLimiter.prorate(b2, 100)
    assert(r2(0) <= 3L)
  }

  test("rate limit: throttle factor reduces a slow partition's share (ref R3)") {
    val bounds = (0 until 2).map(p => p -> ((0L, 1000L))).toMap
    val r = RateLimiter.prorate(bounds, 1000, p => if (p == 1) 0.1 else 1.0)
    assert(r(0) == 500L)
    assert(r(1) == 50L, s"throttled partition share wrong: $r")
  }

  test("placement strategies are stable and in-range") {
    val execs = IndexedSeq("exec-0", "exec-1", "exec-2")
    val np = NameAndPartition("hub", 2)
    val h1 = PlacementStrategy.locate("hash", np, execs)
    assert(h1 == PlacementStrategy.locate("hash", np, execs)) // deterministic
    assert(h1.exists(execs.contains))
    // balanced-hash spreads consecutive partitions over distinct executors
    val placed = (0 until 3).map(p =>
      PlacementStrategy.locate("balanced-hash", NameAndPartition("hub", p), execs).get)
    assert(placed.toSet.size == 3, s"balanced-hash did not spread: $placed")
    assert(PlacementStrategy.locate("none", np, execs).isEmpty)
    assert(PlacementStrategy.locate("hash", np, IndexedSeq.empty).isEmpty)
  }

  test("EventLogConf parsing") {
    val c = EventLogConf(Map("name" -> "x", "maxeventspertrigger" -> "500",
      "startingposition" -> """{"seqNo":3}""", "failondataloss" -> "false"))
    assert(c.name == "x")
    assert(c.maxEventsPerTrigger.contains(500L))
    assert(c.startingPosition == EventPosition.FromSequenceNumber(3))
    assert(!c.failOnDataLoss)
    assert(c.endingPosition == EventPosition.FromEndOfStream)
    intercept[IllegalArgumentException](EventLogConf(Map.empty[String, String]).name)
  }
}

class EventLogBackendSpec extends AnyFunSuite {
  test("append/read/bounds/seek") {
    val log = new InMemoryEventLog("t1", 2)
    for (i <- 0 until 10)
      log.append(i % 2, Event(s"e$i".getBytes, enqueuedTimeMicros = i * 1000L))
    assert(log.bounds == Map(0 -> ((0L, 5L)), 1 -> ((0L, 5L))))
    val got = log.read(0, 1, 2).toVector
    assert(got.map(_._1) == Vector(1L, 2L))
    assert(got.map(t => new String(t._2.body)) == Vector("e2", "e4"))
    // seek: first seqNo with time >= 4000us in partition 0 (events 0,2,4,6,8)
    assert(log.seek(0, 4000L) == 2L)
    assert(log.seek(0, 999999L) == 5L)
  }

  test("ageOut moves earliest (data-loss simulation, ref R4)") {
    val log = new InMemoryEventLog("t2", 1)
    for (i <- 0 until 5) log.append(0, Event(Array[Byte](i.toByte), i.toLong))
    log.ageOut(0, 3)
    assert(log.bounds(0) == ((3L, 5L)))
  }

  test("registry: keyed routing is deterministic, unkeyed round-robins") {
    EventLogRegistry.drop("t3")
    EventLogRegistry.create("t3", 4)
    val e = Event("x".getBytes, 0L)
    EventLogRegistry.send("t3", e, pid = Some(2), key = None)
    assert(EventLogRegistry.boundedSeqNos("t3")(2) == ((0L, 1L)))
    val k1 = EventLogRegistry.get("t3").route(e, None, Some("alpha"))
    val k2 = EventLogRegistry.get("t3").route(e, None, Some("alpha"))
    assert(k1 == k2)
    val rr = (0 until 8).map(_ => EventLogRegistry.get("t3").route(e, None, None))
    assert(rr.distinct.size == 4, s"round-robin should cycle partitions: $rr")
  }

  test("translate honors all position forms") {
    EventLogRegistry.drop("t4")
    val log = EventLogRegistry.create("t4", 1)
    for (i <- 0 until 10) log.append(0, Event(Array[Byte](1), i * 1000000L))
    val c: EventLogClient = EventLogRegistry
    assert(c.translate("t4", 0, EventPosition.FromStartOfStream) == 0L)
    assert(c.translate("t4", 0, EventPosition.FromEndOfStream) == 10L)
    assert(c.translate("t4", 0, EventPosition.FromSequenceNumber(4)) == 4L)
    assert(c.translate("t4", 0, EventPosition.FromSequenceNumber(4, isInclusive = false)) == 5L)
    assert(c.translate("t4", 0,
      EventPosition.FromEnqueuedTime(Instant.ofEpochSecond(5))) == 5L)
  }

  test("partition growth copies data and adds empty partitions (ref R5)") {
    EventLogRegistry.drop("t5")
    val log = EventLogRegistry.create("t5", 2)
    for (i <- 0 until 6) log.append(i % 2, Event(Array[Byte](i.toByte), 0L))
    EventLogRegistry.grow("t5", 4)
    val b = EventLogRegistry.boundedSeqNos("t5")
    assert(b == Map(0 -> ((0L, 3L)), 1 -> ((0L, 3L)), 2 -> ((0L, 0L)), 3 -> ((0L, 0L))))
  }
}

/** Mirrors the reference's "with application properties" matrix
  * (EventHubsSourceSuite.scala:566-655): typed values erased to strings with
  * per-type rules. */
class PropertyErasureSpec extends AnyFunSuite {
  import PropertyErasure._

  test("strings, chars and binary pass through as text") {
    assert(eraseValue("hello") == "hello")
    assert(eraseValue('c') == "c")
    assert(eraseValue("bytes".getBytes("UTF-8")) == "bytes")
  }

  test("scalars render as literals") {
    assert(eraseValue(java.lang.Boolean.TRUE) == "true")
    assert(eraseValue(42) == "42")
    assert(eraseValue(42L) == "42")
    assert(eraseValue(3.5) == "3.5")
    assert(eraseValue(2.0) == "2")                      // integral doubles compact
    assert(eraseValue(new java.math.BigDecimal("1.50")) == "1.50")
    assert(eraseValue(null) == "null")
  }

  test("structured values are JSON-serialized deterministically") {
    assert(eraseValue(Map("b" -> 1, "a" -> "x")) == """{"a":"x","b":1}""")
    assert(eraseValue(Seq(1, "two", null)) == """[1,"two",null]""")
    assert(eraseValue(Map("outer" -> Map("inner" -> true))) ==
      """{"outer":{"inner":true}}""")
  }

  test("event() attaches erased properties") {
    val e = PropertyErasure.event("b".getBytes, 0L,
      Map("n" -> 7, "tags" -> Seq("x", "y")))
    assert(e.properties == Map("n" -> "7", "tags" -> """["x","y"]"""))
  }
}
