package org.apache.spark.graft

import org.apache.spark.SparkEnv
import org.apache.spark.scheduler.ExecutorCacheTaskLocation

/**
 * Live executor enumeration for stable partition->executor placement (S6).
 *
 * Mirrors the reference's BlockManager-based discovery
 * (ref: core/.../EventHubsSource.getSortedExecutorList,
 * EventHubsSource.scala:468-484): ask the BlockManagerMaster for its peers,
 * render each as an `ExecutorCacheTaskLocation` string (the form Spark's
 * scheduler parses back out of `InputPartition.preferredLocations`), and sort
 * so every planning cycle sees the same order — placement stability is what
 * keeps executor-side receiver caches warm across micro-batches.
 *
 * Lives under org.apache.spark because BlockManager and
 * ExecutorCacheTaskLocation are private[spark] (same trick the reference
 * uses by living in org.apache.spark.sql.eventhubs).
 */
object ExecutorDiscovery {
  /** Test seam: inject a fake executor list (end-to-end placement tests run
    * in local mode, where the BlockManagerMaster reports no peers). */
  @volatile private var testOverride: Option[IndexedSeq[String]] = None
  def setTestOverride(execs: Option[IndexedSeq[String]]): Unit = testOverride = execs

  def sortedExecutors(): IndexedSeq[String] = testOverride.getOrElse {
    val env = SparkEnv.get
    if (env == null) IndexedSeq.empty
    else {
      try {
        val bm = env.blockManager
        bm.master.getPeers(bm.blockManagerId)
          .filter(_.executorId != "driver")
          .map(id => ExecutorCacheTaskLocation(id.host, id.executorId))
          .sortWith((a, b) => if (a.host == b.host) a.executorId > b.executorId else a.host > b.host)
          .map(_.toString)
          .toIndexedSeq
      } catch {
        // discovery is an optimization; planning must survive a master RPC
        // hiccup with just unplaced partitions
        case _: Exception => IndexedSeq.empty
      }
    }
  }
}
