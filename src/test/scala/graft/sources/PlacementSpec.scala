package graft.sources

import org.apache.spark.graft.ExecutorDiscovery
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/**
 * S6 end-to-end: an injected executor list must surface as
 * InputPartition.preferredLocations for both batch and streaming plans,
 * per placement strategy (ref: EventHubsSource.scala:386-397,468-484).
 */
class PlacementSpec extends AnyFunSuite {

  private val execs = IndexedSeq("executor_host2_2", "executor_host1_1", "executor_host1_0")

  private def withExecutors[A](body: => A): A = {
    ExecutorDiscovery.setTestOverride(Some(execs))
    try body finally ExecutorDiscovery.setTestOverride(None)
  }

  private def freshLog(name: String): Unit = {
    EventLogRegistry.drop(name)
    val log = EventLogRegistry.create(name, 4)
    for (p <- 0 until 4; i <- 0 until 3)
      log.append(p, Event(s"$p-$i".getBytes("UTF-8"), (i + 1) * 1000000L))
  }

  private def opts(name: String, strategy: String) = new CaseInsensitiveStringMap(
    java.util.Map.of("name", name, "placementStrategy", strategy))

  test("batch scans carry hash / balanced-hash preferred locations") {
    freshLog("pl1")
    withExecutors {
      for (strategy <- Seq("hash", "balanced-hash")) {
        val table = new EventLogTable(EventLogConf(opts("pl1", strategy)))
        val parts = table.newScanBuilder(opts("pl1", strategy))
          .build().toBatch.planInputPartitions()
        assert(parts.length == 4)
        parts.zipWithIndex.foreach { case (p, pid) =>
          val expected =
            PlacementStrategy.locate(strategy, NameAndPartition("pl1", pid), execs)
          assert(p.preferredLocations().toSeq == expected.toSeq, s"$strategy pid $pid")
          assert(expected.isDefined, s"$strategy pid $pid must be placed")
        }
      }
      // balanced-hash spreads 4 partitions over 3 executors evenly (max-min <= 1)
      val placed = (0 until 4).flatMap(pid =>
        PlacementStrategy.locate("balanced-hash", NameAndPartition("pl1", pid), execs))
      val byExec = placed.groupBy(identity).view.mapValues(_.size)
      assert(byExec.values.max - byExec.values.min <= 1)
    }
  }

  test("streaming plans carry preferred locations; none without executors") {
    freshLog("pl2")
    val conf = EventLogConf(opts("pl2", "hash"))
    val stream = new EventLogMicroBatchStream(conf, EventLogTable.schema)
    val start = stream.initialOffset()
    val end = stream.latestOffset(start, ReadLimit.allAvailable())
    withExecutors {
      val parts = stream.planInputPartitions(start, end)
      parts.zipWithIndex.foreach { case (p, pid) =>
        val expected = PlacementStrategy.locate("hash", NameAndPartition("pl2", pid), execs)
        assert(p.preferredLocations().toSeq == expected.toSeq)
      }
    }
    // local mode, no override: BlockManagerMaster has no peers -> unplaced
    val unplaced = stream.planInputPartitions(start, end)
    assert(unplaced.forall(_.preferredLocations().isEmpty))
  }
}
