package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, ForeachWriter, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.{Event, EventLogRegistry, InMemoryEventLog}

/**
 * Streaming operators over the event-log source. Watermarks, windows and
 * state management are Spark Structured Streaming's own (SURVEY §2.4 — the
 * connector's obligation is offset determinism + the event-time column);
 * these helpers add the shapes the reference demonstrates plus the custom
 * state the reference lacks.
 */
object StreamOps {

  /** The reference's demo query shape (EventHubsSourceSuite.scala:737-778):
    * watermark + tumbling-window count over the event-time column. */
  def windowedCounts(df: DataFrame, timeCol: String, watermark: String,
      windowLen: String): DataFrame =
    df.withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowLen))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup on a key with bounded state: watermark +
    * dropDuplicates keeps state only for the watermark horizon. */
  def streamingDedup(df: DataFrame, timeCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(timeCol, watermark).dropDuplicates(keyCols :+ timeCol)

  /**
   * Stream-static AS-OF enrichment: each micro-batch row takes the latest
   * at-or-before `rightCols` value per `keyCol` from a STATIC dimension —
   * the trades/quotes shape (price as of trade, last profile update as of
   * event) against a slowly-changing dimension snapshot. Enrichment is
   * per-row stateless with respect to the stream (the right side is
   * fixed), so the union over ANY trigger slicing equals the batch
   * [[graft.operators.Relational.asofJoin]] on the same inputs — which is
   * exactly how the gate oracles it.
   *
   * Fit-once shape ([[graft.operators.Relational.asofFit]]): the
   * dimension reduces ONCE to bucket-bounded probe state (sorted
   * per-bucket value arrays + per-key bucket summaries, lazily shared);
   * each micro-batch then pays two planner-chosen joins plus an array
   * lookup — no per-trigger union, window, or re-aggregation of the
   * dimension. `writeBatch` must be idempotent on the epoch id
   * (foreachBatch is at-least-once). Returns the configured writer; the
   * caller picks trigger/checkpoint and starts it.
   */
  def asofEnrichStream(stream: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightCols: Map[String, String])(
      writeBatch: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    // materialize the fitted state BEFORE the stream starts: lazily-shared
    // probe frames would otherwise be paid inside the first timed trigger,
    // inflating first-batch latency (and, under host contention, the whole
    // stream's profile) with cost that belongs to fit time
    val fitted = graft.operators.Relational
      .asofFit(right, keyCol, timeCol, rightCols).materialize()
    stream.writeStream.foreachBatch { (batch: DataFrame, epochId: Long) =>
      writeBatch(graft.operators.Relational.asofJoinWith(
        batch, fitted, keyCol, timeCol), epochId)
    }
  }

  /**
   * Stream-static fuzzy record linkage: each micro-batch of dirty records
   * links against a STATIC catalog within Levenshtein distance `maxDist`
   * (typo'd names/titles/urls matched back to their clean rows).
   *
   * Fit-once shape ([[graft.operators.Fuzzy.fuzzyFit]]): the catalog's
   * distinct keys segment and index ONCE (lazily shared); each
   * micro-batch pays only its own bounded probe explosion + the candidate
   * equi-joins + banded verifies. Per-row stateless w.r.t. the stream, so
   * the union over ANY trigger slicing equals the batch
   * [[graft.operators.Fuzzy.fuzzyJoin]] (catalog as the left side) —
   * which is exactly how the gate oracles it. `writeBatch` must be
   * idempotent on the epoch id (foreachBatch is at-least-once).
   */
  def fuzzyLinkStream(stream: DataFrame, catalog: DataFrame,
      catalogId: String, catalogKey: String,
      probeId: String, probeKey: String, maxDist: Int)(
      writeBatch: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    // fit cost out of the first trigger ([[asofEnrichStream]]'s rationale)
    val fitted = graft.operators.Fuzzy.fuzzyFit(
      catalog, catalogId, catalogKey, maxDist).materialize()
    stream.writeStream.foreachBatch { (batch: DataFrame, epochId: Long) =>
      writeBatch(graft.operators.Fuzzy.fuzzyJoinWith(
        fitted, batch, probeId, probeKey), epochId)
    }
  }

  /**
   * Cumulative data-quality profile of a STREAM — [[graft.operators
   * .Validation.checkConstraints]] per micro-batch, summed across epochs
   * into bounded driver state (one (count, violations, min offender) per
   * rule, whatever the stream's lifetime). Replay-safe the way
   * [[HeavyHitterTracker]] is: an epoch at or below the merged floor is
   * skipped, so foreachBatch's at-least-once replays never double-count.
   * Scoped to ONE query: build a fresh tracker (or reset()) per stream.
   */
  final class ConstraintTracker private[streaming] (ruleNames: Seq[String])
      extends Serializable {
    private var lastEpoch: Long = Long.MinValue
    private val nRows = new Array[Long](ruleNames.size)
    private val nViolations = new Array[Long](ruleNames.size)
    private val firstViolation = new Array[String](ruleNames.size)

    /** Merge one epoch's profile; returns false (state untouched) for a
      * replayed epoch at or below the merged floor. */
    private[streaming] def update(
        profile: Seq[(String, Long, Long, Option[String])],
        epochId: Long): Boolean =
      synchronized {
        if (epochId <= lastEpoch) return false // replayed epoch: merged
        lastEpoch = epochId
        profile.foreach { case (rule, n, v, off) =>
          val i = ruleNames.indexOf(rule)
          nRows(i) += n; nViolations(i) += v
          off.foreach { o =>
            if (firstViolation(i) == null || utf8Lt(o, firstViolation(i)))
              firstViolation(i) = o
          }
        }
        true
      }

    /** UTF-8 BYTE order, matching Spark's string min exactly — Java's
      * `<` compares UTF-16 code units, which orders supplementary-plane
      * characters differently and would let the cumulative min offender
      * diverge from the batch profile's on non-ASCII ids. */
    private def utf8Lt(a: String, b: String): Boolean = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      var i = 0
      while (i < x.length && i < y.length) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }

    /** Per-rule cumulative (rule, n_rows, n_violations, min offender). */
    def result: Seq[(String, Long, Long, Option[String])] = synchronized {
      ruleNames.indices.map(i => (ruleNames(i), nRows(i), nViolations(i),
        Option(firstViolation(i)))).toSeq
    }

    /** Clear all state (required before reuse across queries — epoch
      * floors do not transfer between streams). */
    def reset(): Unit = synchronized {
      lastEpoch = Long.MinValue
      ruleNames.indices.foreach { i =>
        nRows(i) = 0; nViolations(i) = 0; firstViolation(i) = null
      }
    }

    /** Checkpoint the cumulative profile + epoch floor. The header carries
      * the rule names: restoring into a tracker whose rules differ (name,
      * order, or count) throws instead of silently attributing counts to
      * the wrong rules — [[HeavyHitterTracker.toBytes]]'s contract. */
    def toBytes: Array[Byte] = synchronized {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(ConstraintMagic)
      out.writeInt(ruleNames.size)
      ruleNames.foreach(out.writeUTF)
      out.writeLong(lastEpoch)
      ruleNames.indices.foreach { i =>
        out.writeLong(nRows(i)); out.writeLong(nViolations(i))
        out.writeBoolean(firstViolation(i) != null)
        if (firstViolation(i) != null) out.writeUTF(firstViolation(i))
      }
      out.flush()
      bos.toByteArray
    }

    /** Restore state serialized by [[toBytes]]; throws on a foreign blob
      * or a rule-set mismatch. */
    def restore(bytes: Array[Byte]): Unit = synchronized {
      require(bytes.length >= 8,
        s"not a ConstraintTracker checkpoint (${bytes.length} bytes)")
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val magic = in.readInt()
      require(magic == ConstraintMagic,
        s"not a ConstraintTracker checkpoint (magic 0x${magic.toHexString})")
      val stored = Seq.fill(in.readInt())(in.readUTF())
      require(stored == ruleNames,
        s"checkpoint was written by a tracker with rules $stored but this " +
          s"tracker has $ruleNames — counts would attribute to the wrong " +
          "rules; rebuild the tracker with the checkpoint's rule set")
      // parse the WHOLE blob into locals before mutating: a truncated
      // checkpoint that passes the header checks must throw with the
      // tracker unchanged, never half-restored (a caller catching the
      // error and continuing would double-count or mis-skip epochs)
      val epoch = in.readLong()
      val parsed = ruleNames.indices.map { _ =>
        val n = in.readLong(); val v = in.readLong()
        (n, v, if (in.readBoolean()) in.readUTF() else null)
      }
      lastEpoch = epoch
      ruleNames.indices.foreach { i =>
        nRows(i) = parsed(i)._1; nViolations(i) = parsed(i)._2
        firstViolation(i) = parsed(i)._3
      }
    }
  }

  /** [[ConstraintTracker.toBytes]] header magic ("gCTR"). */
  private val ConstraintMagic: Int = 0x67435452

  /** foreachBatch sink monitoring a stream's constraint profile: each
    * micro-batch runs ONE [[graft.operators.Validation.checkConstraints]]
    * scan (a per-rule aggregate — no shuffle of data) and folds the
    * per-rule counts into the tracker. Returns (tracker, sink fn).
    *
    * `hardTolerance` turns the monitor into a HARD GATE ([[graft.operators
    * .Validation.requireConstraints]]'s mid-stream form): after an epoch
    * MERGES, any rule whose cumulative violation fraction exceeds its
    * tolerance (default 0.0 for rules not in the map; `Some(Map.empty)` =
    * zero tolerance everywhere) throws, failing the query at exactly the
    * epoch the threshold crossed. The gate reads the CUMULATIVE counts —
    * one bad row trips a zero-tolerance rule whatever the batch slicing —
    * and a replayed epoch is skipped before the check, so failure
    * recovery can never double-count its way into a spurious trip. */
  def constraintSink(idCol: org.apache.spark.sql.Column,
      rules: Seq[(String, org.apache.spark.sql.Column)],
      hardTolerance: Option[Map[String, Double]] = None)
      : (ConstraintTracker, (DataFrame, Long) => Unit) = {
    hardTolerance.foreach(_.keys.foreach(k => require(rules.exists(_._1 == k),
      s"tolerance for unknown rule '$k'")))
    val tracker = new ConstraintTracker(rules.map(_._1))
    val fn = (batch: DataFrame, epochId: Long) => {
      val profile = graft.operators.Validation
        .checkConstraints(batch, idCol, rules)
        .select(col("rule"), col("n_rows"), col("n_violations"),
          col("first_violation"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          Option(r.getString(3))))
        .toSeq
      val merged = tracker.update(profile, epochId)
      if (merged) hardTolerance.foreach { tol =>
        val failing = tracker.result.filter { case (rule, n, v, _) =>
          v > 0 && (if (n == 0) 0.0 else v.toDouble / n) >
            tol.getOrElse(rule, 0.0)
        }
        if (failing.nonEmpty) throw new IllegalStateException(
          s"stream constraint gate tripped at epoch $epochId: " +
            failing.map { case (rule, n, v, off) =>
              s"$rule ($v/$n cumulative rows, first offender " +
                s"id=${off.orNull})"
            }.mkString("; "))
      }
    }
    (tracker, fn)
  }

  /**
   * Cumulative distribution-drift monitor of a STREAM against a FIXED
   * reference histogram — the streaming twin of [[graft.operators
   * .Validation.distributionDrift]], in the fit-once / probe-many shape:
   * the reference snapshot reduces ONCE to `buckets` counts
   * ([[driftFit]]), and each micro-batch adds one map-side-combined
   * histogram aggregate (<= B rows collected) to bounded driver state.
   * Counts are exact integers, so cumulative totals over ANY trigger
   * slicing equal the batch histogram — the PSI after the last epoch is
   * the batch PSI. Replay-safe via the same epoch floor as
   * [[ConstraintTracker]]; scoped to ONE query (reset() before reuse).
   */
  final class DriftTracker private[streaming] (
      val lo: Double, val hi: Double, val buckets: Int, val alpha: Double,
      private val refCounts: Array[Long]) extends Serializable {
    private var lastEpoch: Long = Long.MinValue
    private val curCounts = new Array[Long](buckets)

    /** Merge one epoch's histogram; returns false (state untouched) for a
      * replayed epoch at or below the merged floor. */
    private[streaming] def update(batchCounts: Seq[(Int, Long)],
        epochId: Long): Boolean = synchronized {
      if (epochId <= lastEpoch) return false // replayed epoch: merged
      lastEpoch = epochId
      batchCounts.foreach { case (b, n) => curCounts(b) += n }
      true
    }

    /** Per-bucket cumulative (bucket, n_ref, n_cur). */
    def counts: Seq[(Int, Long, Long)] = synchronized {
      (0 until buckets).map(b => (b, refCounts(b), curCounts(b)))
    }

    /** Total PSI of the stream so far vs the reference —
      * [[graft.operators.Validation.psiTotal]]'s formula on the
      * cumulative counts. */
    def psiTotal: Double = synchronized {
      val tr = refCounts.sum.toDouble + alpha * buckets
      val tc = curCounts.sum.toDouble + alpha * buckets
      (0 until buckets).map { b =>
        val p = (refCounts(b) + alpha) / tr
        val q = (curCounts(b) + alpha) / tc
        (q - p) * math.log(q / p)
      }.sum
    }

    /** Clear the STREAM side + epoch floor (the fitted reference stays —
      * it is the monitor's identity). Required before reuse across
      * queries: epoch floors do not transfer between streams. */
    def reset(): Unit = synchronized {
      lastEpoch = Long.MinValue
      java.util.Arrays.fill(curCounts, 0L)
    }

    /** Checkpoint the cumulative state + epoch floor. The header carries
      * the full monitor identity — (lo, hi, buckets, alpha) AND the
      * reference histogram — so restoring into a differently-fitted
      * monitor throws instead of silently producing garbage PSI
      * ([[ConstraintTracker.toBytes]]'s contract). */
    def toBytes: Array[Byte] = synchronized {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(DriftMagic)
      out.writeDouble(lo); out.writeDouble(hi)
      out.writeInt(buckets); out.writeDouble(alpha)
      refCounts.foreach(out.writeLong)
      out.writeLong(lastEpoch)
      curCounts.foreach(out.writeLong)
      out.flush()
      bos.toByteArray
    }

    /** Restore state serialized by [[toBytes]]; throws on a foreign blob
      * or a monitor-identity mismatch, with the tracker unchanged. */
    def restore(bytes: Array[Byte]): Unit = synchronized {
      require(bytes.length >= 8,
        s"not a DriftTracker checkpoint (${bytes.length} bytes)")
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val magic = in.readInt()
      require(magic == DriftMagic,
        s"not a DriftTracker checkpoint (magic 0x${magic.toHexString})")
      val (sLo, sHi) = (in.readDouble(), in.readDouble())
      val (sB, sA) = (in.readInt(), in.readDouble())
      require(sLo == lo && sHi == hi && sB == buckets && sA == alpha,
        s"checkpoint was written by a differently-configured monitor " +
          s"([$sLo, $sHi) x $sB, alpha=$sA vs [$lo, $hi) x $buckets, " +
          s"alpha=$alpha) — cumulative counts would bin differently")
      val sRef = Array.fill(buckets)(in.readLong())
      require(java.util.Arrays.equals(sRef, refCounts),
        "checkpoint was written against a DIFFERENT reference histogram — " +
          "PSI against this monitor's reference would be garbage; refit " +
          "from the checkpoint's reference snapshot")
      // parse the whole blob before mutating (truncated checkpoint must
      // leave the tracker unchanged)
      val epoch = in.readLong()
      val cur = Array.fill(buckets)(in.readLong())
      lastEpoch = epoch
      System.arraycopy(cur, 0, curCounts, 0, buckets)
    }
  }

  /** [[DriftTracker.toBytes]] header magic ("gDFT"). */
  private val DriftMagic: Int = 0x67444654

  /** Fit the drift monitor's reference histogram ONCE from a reference
    * snapshot — one map-side-combined aggregate, <= `buckets` rows
    * collected. NULLs and NaNs excluded, out-of-range values clamped into
    * the edge cells (the exact [[graft.operators.Validation
    * .distributionDrift]] binning — bucket expression AND admission
    * predicate are shared). */
  def driftFit(ref: DataFrame, valueCol: String, lo: Double, hi: Double,
      buckets: Int, alpha: Double = 0.5): DriftTracker = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive (smoothing), got $alpha")
    val refCounts = new Array[Long](buckets)
    ref.filter(graft.operators.Validation.driftValueOk(col(valueCol)))
      .select(graft.operators.Validation
        .driftBucket(col(valueCol), lo, hi, buckets).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))
      .collect()
      .foreach(r => refCounts(r.getInt(0)) = r.getLong(1))
    new DriftTracker(lo, hi, buckets, alpha, refCounts)
  }

  /** foreachBatch sink folding each micro-batch's histogram (ONE
    * aggregate, <= B rows) into `tracker`'s cumulative stream side.
    *
    * A finite `maxPsi` turns the monitor into a HARD GATE ([[graft
    * .operators.Validation.requireDriftBelow]]'s mid-stream form): after
    * an epoch MERGES, if the cumulative PSI vs the fitted reference
    * exceeds `maxPsi` the sink throws — failing the query at exactly the
    * epoch the threshold crossed, with the worst buckets in the message.
    * A replayed epoch is skipped before the check (cumulative counts
    * unchanged), so failure recovery never double-counts into a spurious
    * trip. */
  def driftSink(tracker: DriftTracker, valueCol: String,
      maxPsi: Double = Double.PositiveInfinity)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, epochId: Long) => {
      val counts = batch
        .filter(graft.operators.Validation.driftValueOk(col(valueCol)))
        .select(graft.operators.Validation.driftBucket(
          col(valueCol), tracker.lo, tracker.hi, tracker.buckets).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)))
        .toSeq
      val merged = tracker.update(counts, epochId)
      if (merged && tracker.psiTotal > maxPsi) {
        val w = (tracker.hi - tracker.lo) / tracker.buckets
        val worst = tracker.counts
          .map { case (b, nr, nc) =>
            val p = (nr + tracker.alpha) /
              (tracker.counts.map(_._2).sum + tracker.alpha * tracker.buckets)
            val q = (nc + tracker.alpha) /
              (tracker.counts.map(_._3).sum + tracker.alpha * tracker.buckets)
            (b, nr, nc, (q - p) * math.log(q / p))
          }
          .sortBy(-_._4).take(3)
          .map { case (b, nr, nc, psi) =>
            f"[${tracker.lo + b * w}%.4g, ${tracker.lo + (b + 1) * w}%.4g) " +
              f"ref=$nr cur=$nc psi=$psi%.4f"
          }
        throw new IllegalStateException(
          f"stream drift gate tripped at epoch $epochId: cumulative PSI " +
            f"${tracker.psiTotal}%.4f > $maxPsi on '$valueCol'; worst " +
            s"buckets: ${worst.mkString("; ")}")
      }
    }

  final case class SessionUpdate(key: String, nEvents: Long, startMs: Long, endMs: Long)

  /**
   * Session windows via flatMapGroupsWithState with EVENT-TIME timeouts: a
   * session closes when a later event of the same key arrives more than
   * `gapMs` after it, or when the watermark passes sessionEnd + gapMs (the
   * timeout flushes the open session — without a timeout, the last session
   * of a quiesced key would sit in state forever and never be emitted).
   * Event-time (not processing-time) timeouts keep the operator
   * deterministic and replay-safe, and `processAllAvailable` terminates
   * (processing-time timeouts schedule wall-clock batches that starve it).
   * State per key is O(1).
   */
  def sessionize(
      ds: Dataset[(String, Timestamp)], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[SessionUpdate] = {
    import ds.sparkSession.implicits._
    ds.toDF("key", "ts").withWatermark("ts", watermarkDelay)
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), SessionUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed sessionEnd + gap: close and emit
            val out = state.getOption.map { case (n, start, end) =>
              SessionUpdate(key, n, start, end)
            }
            state.remove()
            out.iterator
          } else {
            var (n, start, end) = state.getOption.getOrElse((0L, Long.MaxValue, Long.MinValue))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
            rows.map(_._2.getTime).toSeq.sorted.foreach { t =>
              if (n > 0 && t - end > gapMs) {
                closed += SessionUpdate(key, n, start, end)
                n = 0; start = Long.MaxValue; end = Long.MinValue
              }
              n += 1; start = math.min(start, t); end = math.max(end, t)
            }
            if (n > 0) {
              state.update((n, start, end))
              state.setTimeoutTimestamp(end + gapMs)
            } else state.remove()
            closed.iterator
          }
      }
  }

  /**
   * Bounded-state streaming heavy hitters: the 100 TB replacement for a
   * complete-mode `groupBy(token).count()`, whose state store holds one row
   * per DISTINCT token — a 10⁸+-row state per shuffle partition on a web
   * corpus, materialized in full every trigger. Here the cross-batch state
   * is a KB-sized Count-Min sketch plus at most `k` candidate terms,
   * independent of vocabulary size:
   *
   *  - each micro-batch aggregates its tokens into a CMS
   *    (`count_min_sketch`, mergeable partials, map-side combined) and a
   *    distributed top-`candidatesPerBatch` term list (TakeOrdered — never
   *    a global sort, never the batch vocabulary on the driver);
   *  - the tracker merges the batch CMS into the running sketch (same
   *    eps/confidence/seed, so merged counts ADD exactly) and re-ranks
   *    (previous candidates ∪ batch candidates) by their merged-CMS
   *    estimates, keeping `k`.
   *
   * Guarantees, matching the classic sketch-heavy-hitter recipe: every
   * reported count is within the CMS one-sided bound
   * (exact <= est <= exact + eps * totalTokens w.p. `confidence`); a true
   * heavy hitter is reported as long as it surfaces in some batch's
   * top-`candidatesPerBatch` (admission-controlled batches make that the
   * overwhelmingly common case; a term spread perfectly thin below every
   * batch head can be missed — the standard tradeoff for bounded state).
   *
   * Epoch-idempotent: a replayed `foreachBatch` epoch (failure recovery)
   * is skipped, not double-merged — same rule as the connector sink's
   * idempotent epoch commit. That guard assumes epochs INCREASE within one
   * query lifetime, so a tracker is SINGLE-QUERY (single-checkpoint)
   * scoped: starting a second query with a fresh checkpoint restarts epoch
   * ids at 0, which the guard would silently skip. Call [[HeavyHitterTracker
   * .reset]] (or build a new tracker) before reusing one across queries.
   */
  /** [[HeavyHitterTracker.toBytes]] header magic: guards against feeding a
    * pre-header (or foreign) byte blob into [[HeavyHitterTracker.restore]]. */
  private val HeavyHitterMagic: Int = 0x67484854 // "gHHT"

  final class HeavyHitterTracker private[streaming] (
      k: Int, eps: Double, confidence: Double, seed: Int) extends Serializable {
    @transient private var cms: org.apache.spark.util.sketch.CountMinSketch = _
    private var candidates: List[String] = Nil
    private var lastEpoch: Long = Long.MinValue

    private[streaming] def update(
        batchCms: Option[Array[Byte]], batchTerms: Seq[String],
        epochId: Long): Unit = synchronized {
      if (epochId <= lastEpoch) return // replayed epoch: already merged
      lastEpoch = epochId
      batchCms.foreach { bytes =>
        val b = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(bytes))
        if (cms == null) cms = b else { cms.mergeInPlace(b); () }
      }
      if (cms != null) {
        candidates = (candidates ++ batchTerms).distinct
          .map(t => t -> cms.estimateCount(t))
          .sortBy { case (t, n) => (-n, t) }
          .take(k).map(_._1)
      }
    }

    /** Current top-k (term, estimated count), best-ranked first. */
    def result: Seq[(String, Long)] = synchronized {
      if (cms == null) Nil
      else candidates.map(t => t -> cms.estimateCount(t))
    }

    /** Clear all state (sketch, candidates, epoch watermark) so the tracker
      * can feed a NEW query whose epoch ids restart at 0 — without this, the
      * replay guard would mistake the new query's batches for replays of the
      * old one's and skip every one of them. */
    def reset(): Unit = synchronized {
      cms = null
      candidates = Nil
      lastEpoch = Long.MinValue
    }

    /** Point estimate for any term from the merged sketch (CMS one-sided
      * bound applies whether or not the term is a kept candidate). */
    def estimate(term: String): Long = synchronized {
      if (cms == null) 0L else cms.estimateCount(term)
    }

    /** Serialize (sketch + candidates + last epoch) — checkpoint this
      * beside the stream's offset log so a driver restart resumes the
      * tracker instead of losing history (the tracker itself is
      * process-local state; Spark checkpoints offsets, not foreachBatch
      * user state). */
    def toBytes: Array[Byte] = synchronized {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      // header: the tracker's CMS parameters. Restoring into a tracker
      // built with different (k, eps, confidence, seed) would silently
      // merge INCOMPATIBLE sketches — width/depth/hash-seed all differ, so
      // counts become garbage with no error. restore() validates loudly.
      out.writeInt(HeavyHitterMagic)
      out.writeInt(k)
      out.writeDouble(eps)
      out.writeDouble(confidence)
      out.writeInt(seed)
      out.writeLong(lastEpoch)
      out.writeInt(candidates.length)
      candidates.foreach(out.writeUTF)
      if (cms == null) out.writeInt(0)
      else {
        val sk = new java.io.ByteArrayOutputStream()
        cms.writeTo(sk)
        val bytes = sk.toByteArray
        out.writeInt(bytes.length)
        out.write(bytes)
      }
      out.flush()
      bos.toByteArray
    }

    /** Restore state serialized by [[toBytes]]. The byte header carries the
      * writing tracker's (k, eps, confidence, seed); restoring into a
      * tracker built with DIFFERENT parameters throws instead of silently
      * merging incompatible sketches into garbage counts. */
    def restore(bytes: Array[Byte]): Unit = synchronized {
      // 28-byte header: magic + k + eps + confidence + seed
      require(bytes.length >= 28,
        s"not a HeavyHitterTracker checkpoint (${bytes.length} bytes — " +
          "shorter than the parameter header)")
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val magic = in.readInt()
      require(magic == HeavyHitterMagic,
        s"not a HeavyHitterTracker checkpoint (magic 0x${magic.toHexString}; " +
          "pre-header-format bytes cannot be restored — rebuild the tracker " +
          "and replay, the header was introduced before any stable release)")
      val (k0, eps0, conf0, seed0) =
        (in.readInt(), in.readDouble(), in.readDouble(), in.readInt())
      require(k0 == k && eps0 == eps && conf0 == confidence && seed0 == seed,
        s"checkpoint was written by a tracker with (k=$k0, eps=$eps0, " +
          s"confidence=$conf0, seed=$seed0) but this tracker has (k=$k, " +
          s"eps=$eps, confidence=$confidence, seed=$seed) — merging " +
          "differently-configured CMS sketches silently corrupts counts; " +
          "rebuild the tracker with the checkpoint's parameters")
      lastEpoch = in.readLong()
      candidates = List.fill(in.readInt())(in.readUTF())
      val skLen = in.readInt()
      cms = if (skLen == 0) null
      else {
        val sk = new Array[Byte](skLen)
        in.readFully(sk)
        org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(sk))
      }
    }
  }

  /** Build the tracker plus the `foreachBatch` function that feeds it.
    * Usage: `val (t, fn) = StreamOps.heavyHitterSink("body", 20)` then
    * `stream.writeStream.foreachBatch(fn)...`; read `t.result` after. */
  def heavyHitterSink(textCol: String, k: Int, candidatesPerBatch: Int = 0,
      eps: Double = graft.operators.Sketches.DefaultCmsEps,
      confidence: Double = 0.99, seed: Int = 42)
      : (HeavyHitterTracker, (DataFrame, Long) => Unit) = {
    require(k > 0, s"k must be positive, got $k")
    require(candidatesPerBatch >= 0,
      s"candidatesPerBatch must be >= 0 (0 = default 4k), got $candidatesPerBatch")
    val perBatch = if (candidatesPerBatch > 0) candidatesPerBatch else 4 * k
    val tracker = new HeavyHitterTracker(k, eps, confidence, seed)
    val fn = (batch: DataFrame, epochId: Long) => {
      // the CMS aggregate and the top-M candidate job share one
      // materialization of the exploded token stream — without the persist
      // each trigger would scan/split/explode the batch twice
      val words = batch
        .select(explode(split(col(textCol).cast("string"), " ")).as("term"))
        .filter(col("term") =!= "")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val cmsBytes = Option(
          words.agg(count_min_sketch(col("term"), lit(eps), lit(confidence),
            lit(seed)).as("cms")).head().getAs[Array[Byte]]("cms"))
        val terms = words.groupBy(col("term")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("term").asc).limit(perBatch)
          .select(col("term")).collect().map(_.getString(0)).toSeq
        tracker.update(cmsBytes, terms, epochId)
      } finally { words.unpersist(); () }
    }
    (tracker, fn)
  }

  /**
   * Simplest possible sink: a ForeachWriter that round-robins string rows
   * into a named in-memory log (ref S11: EventHubsForeachWriter.scala:41-99).
   */
  def foreachWriter(logName: String): ForeachWriter[String] =
    new ForeachWriter[String] {
      // resolved once per partition-epoch in open(), not per row
      @transient private var log: InMemoryEventLog = _
      override def open(partitionId: Long, epochId: Long): Boolean = {
        log = EventLogRegistry.get(logName); true
      }
      override def process(value: String): Unit = {
        val e = Event(value.getBytes("UTF-8"), System.currentTimeMillis() * 1000L)
        log.append(log.route(e, None, None), e)
      }
      override def close(errorOrNull: Throwable): Unit = ()
    }

  /** Row-typed variant honoring the sink schema columns (body / partition). */
  def foreachRowWriter(logName: String): ForeachWriter[Row] =
    new ForeachWriter[Row] {
      @transient private var log: InMemoryEventLog = _
      override def open(partitionId: Long, epochId: Long): Boolean = {
        log = EventLogRegistry.get(logName); true
      }
      override def process(r: Row): Unit = {
        val body = r.schema.fieldNames.indexOf("body") match {
          case -1 => throw new IllegalArgumentException("row needs a 'body' column")
          case i => r.get(i) match {
            case s: String => s.getBytes("UTF-8")
            case b: Array[Byte] => b
            case other => throw new IllegalArgumentException(s"bad body type $other")
          }
        }
        val pid = r.schema.fieldNames.indexOf("partition") match {
          case -1 => None
          case i => Option(r.getString(i)).map { s =>
            val p = try s.toInt catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(s"invalid partition id '$s'")
            }
            if (p < 0 || p >= log.numPartitions)
              throw new IllegalArgumentException(
                s"partition id $p out of range [0, ${log.numPartitions})")
            p
          }
        }
        val e = Event(body, System.currentTimeMillis() * 1000L)
        log.append(log.route(e, pid, None), e)
      }
      override def close(errorOrNull: Throwable): Unit = ()
    }
}
