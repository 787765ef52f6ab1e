package graft.sources

import java.util.concurrent.atomic.AtomicReference

import org.scalatest.funsuite.AnyFunSuite

/**
 * Concurrency headroom of the striped shared cursor (r4/r5 verdict item):
 * P partition tasks of one log share a single decode pass, and a take that
 * is fully served from read-ahead must not serialize behind the shared
 * reader lock. The fast-path assertions are deterministic (sequential
 * takes over a pre-filled stripe, and a barrier-paced concurrent run where
 * the decoder of each round is pinned); the 16-thread tight-loop run
 * asserts correctness under maximum contention and prints 4-vs-16 timings.
 */
class CursorConcurrencySpec extends AnyFunSuite {

  private val path = "/root/testdata/sf0.01/events.parquet"
  private val totalRows = 10000L

  private def logName(partitions: Int) = EventLogConf.parquetLogName(path, partitions)

  test("buffer-served takes bypass the reader lock (deterministic)") {
    val p = 8
    ParquetEventLog.dropCursor(path, p)
    val name = logName(p)
    // the HIGHEST pid takes first: its last id (p-1 + p*99) is past every
    // sibling's last id, so the decode pass fully buffers all of them
    assert(ParquetEventLog.receive(name, p - 1, 0, 100).size == 100)
    val before = ParquetEventLog.cursorFastPathTakes.sum()
    for (pid <- 0 until p - 1)
      assert(ParquetEventLog.receive(name, pid, 0, 100).size == 100)
    val fast = ParquetEventLog.cursorFastPathTakes.sum() - before
    assert(fast == p - 1,
      s"all ${p - 1} sibling takes were pre-buffered and must use the fast path, got $fast")
    ParquetEventLog.dropCursor(path, p)
  }

  /** Full tight-loop lockstep scan: one thread per partition, `chunk` rows
    * per take. Returns (elapsedNanos, fastPathTakes). Each thread verifies
    * its rows are the exact dense seqNo range. */
  private def concurrentScan(partitions: Int, chunk: Int): (Long, Long) = {
    ParquetEventLog.dropCursor(path, partitions)
    val name = logName(partitions)
    val bounds = ParquetEventLog.boundedSeqNos(name)
    val firstFailure = new AtomicReference[Throwable]()
    val fastBefore = ParquetEventLog.cursorFastPathTakes.sum()
    val t0 = System.nanoTime()
    val threads = (0 until partitions).map { pid =>
      val t = new Thread(() => {
        try {
          val latest = bounds(pid)._2
          var seq = 0L
          while (seq < latest) {
            val n = math.min(chunk.toLong, latest - seq)
            val got = ParquetEventLog.receive(name, pid, seq, n).toVector
            assert(got.map(_._1) == (seq until seq + n).toVector,
              s"pid $pid window [$seq, ${seq + n}) returned the wrong seqNos")
            seq += n
          }
        } catch { case e: Throwable => firstFailure.compareAndSet(null, e) }
      })
      t.start(); t
    }
    threads.foreach(_.join())
    val elapsed = System.nanoTime() - t0
    if (firstFailure.get() != null) throw firstFailure.get()
    ParquetEventLog.dropCursor(path, partitions)
    (elapsed, ParquetEventLog.cursorFastPathTakes.sum() - fastBefore)
  }

  test("16 concurrent partition takers: correct rows, no throughput cliff vs 4") {
    concurrentScan(4, 500) // JIT + page-cache warm-up
    val (t4, _) = concurrentScan(4, 500)
    val (t16, fast16) = concurrentScan(16, 500)
    val ev4 = totalRows * 1e9 / t4
    val ev16 = totalRows * 1e9 / t16
    info(f"4 partitions: ${t4 / 1e6}%.1f ms ($ev4%.0f ev/s), " +
      f"16 partitions: ${t16 / 1e6}%.1f ms ($ev16%.0f ev/s), fast takes=$fast16")
    // the whole scan is ONE shared decode pass either way; quadrupling the
    // takers must not collapse aggregate throughput (generous 3x margin for
    // scheduling noise on a loaded CI box)
    assert(t16 < t4 * 3,
      f"throughput cliff: 16-partition scan ${t16 / 1e6}%.1f ms vs 4-partition ${t4 / 1e6}%.1f ms")
  }

  test("decode-ahead serves concurrent sibling takes lock-free (barrier-paced)") {
    // deterministic pacing: each round, the HIGHEST pid decodes first (its
    // last id is past every sibling's), then all 15 siblings take
    // CONCURRENTLY — each must be served whole from read-ahead without the
    // reader lock, so the fast-take count is exact, not scheduler-dependent
    val p = 16
    ParquetEventLog.dropCursor(path, p)
    val name = logName(p)
    val bounds = ParquetEventLog.boundedSeqNos(name)
    val latest = bounds(0)._2 // 10000/16: identical for every pid
    val chunk = 125L
    val rounds = (latest / chunk).toInt
    val barrier = new java.util.concurrent.CyclicBarrier(p)
    val fastBefore = ParquetEventLog.cursorFastPathTakes.sum()
    val firstFailure = new AtomicReference[Throwable]()
    def await(): Unit = barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
    val threads = (0 until p).map { pid =>
      val t = new Thread(() => {
        try {
          var seq = 0L
          for (_ <- 0 until rounds) {
            await()
            if (pid == p - 1)
              assert(ParquetEventLog.receive(name, pid, seq, chunk).size == chunk)
            await()
            if (pid != p - 1)
              assert(ParquetEventLog.receive(name, pid, seq, chunk).size == chunk)
            seq += chunk
          }
        } catch { case e: Throwable =>
          firstFailure.compareAndSet(null, e); barrier.reset()
        }
      })
      t.start(); t
    }
    threads.foreach(_.join())
    if (firstFailure.get() != null) throw firstFailure.get()
    val fast = ParquetEventLog.cursorFastPathTakes.sum() - fastBefore
    assert(fast == (p - 1).toLong * rounds,
      s"every sibling take of every round must be buffer-served without the " +
        s"reader lock: expected ${(p - 1) * rounds}, got $fast")
    ParquetEventLog.dropCursor(path, p)
  }

  test("interleaved fast drains and decodes keep every partition exact") {
    val p = 16
    ParquetEventLog.dropCursor(path, p)
    val name = logName(p)
    val bounds = ParquetEventLog.boundedSeqNos(name)
    val firstFailure = new AtomicReference[Throwable]()
    // deliberately unaligned chunk sizes per partition so drains and decode
    // tails interleave in every combination; a mid-scan dropCursor storm
    // (every thread) stresses reposition + close against live drains
    val threads = (0 until p).map { pid =>
      val t = new Thread(() => {
        try {
          val latest = bounds(pid)._2
          val chunk = 37 + 13 * pid
          var seq = 0L
          var checksum = 0L
          while (seq < latest) {
            val n = math.min(chunk.toLong, latest - seq)
            val got = ParquetEventLog.receive(name, pid, seq, n).toVector
            assert(got.map(_._1) == (seq until seq + n).toVector)
            checksum += got.map(_._2.enqueuedTimeMicros).sum
            seq += n
          }
          // cross-check payload integrity against the self-verifying one-shot path
          ParquetEventLog.dropCursor(path, p)
          val oneShot = ParquetEventLog.receive(name, pid, 0, latest).toVector
          assert(checksum == oneShot.map(_._2.enqueuedTimeMicros).sum,
            s"pid $pid cursor payloads diverge from the one-shot scan")
        } catch { case e: Throwable => firstFailure.compareAndSet(null, e) }
      })
      t.start(); t
    }
    threads.foreach(_.join())
    if (firstFailure.get() != null) throw firstFailure.get()
    ParquetEventLog.dropCursor(path, p)
  }
}
