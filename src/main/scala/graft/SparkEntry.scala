package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}

/**
 * Driver contract: one query per implemented operator (SURVEY §2), each with
 * an exactly-equivalent DuckDB oracle where SQL-expressible. Column names are
 * aligned between the Spark plan and the oracle SQL; every query ends with a
 * deterministic ORDER BY so row order can never differ.
 */
object SparkEntry {

  /** Flagship: the reference's demo query shape (windowed count over the
    * event stream, EventHubsSourceSuite.scala:737-778) through our DSv2
    * source on the sf0.001 seeded log. */
  def entry(spark: SparkSession): DataFrame = {
    val df = GraftEventLog.readParquetLog(spark, "/root/testdata/sf0.001/events.parquet", 4)
    df.groupBy(window(col("enqueuedTime"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("window.start"))
  }

  private def mid(dir: String) = s"$dir/events.parquet"

  /** Gate-scratch directory for per-run verification plumbing (per-epoch
    * outputs, temp indexes, seeded copies): tmpfs when the host has one,
    * else the OS temp dir, deleted at JVM exit either way. These artifacts
    * are the harness's scratch space, not the operator under measurement —
    * a cluster job would land them on its fast local scratch/DFS, while
    * `/tmp` here is a spinning-rust-class block device whose per-file
    * commit latency taxes every epoch write. The DURABLE sink gate
    * (q_sink_durable) deliberately does NOT use this: real disk is part of
    * its contract. */
  private def scratchDir(prefix: String): String = {
    val shm = new java.io.File("/dev/shm")
    val p =
      if (tmpfsUsable(shm))
        java.nio.file.Files.createTempDirectory(shm.toPath, prefix)
      else java.nio.file.Files.createTempDirectory(prefix)
    val f = p.toFile
    sys.addShutdownHook {
      org.apache.commons.io.FileUtils.deleteQuietly(f); ()
    }
    p.toString
  }

  /** Size guard for the tmpfs scratch choice: tmpfs pages compete with
    * executor memory, so a RAM-constrained host (or a much larger SF)
    * must fall back to disk instead of OOMing the machine through the
    * page cache. "Usable" = writable with at least [[TmpfsMinFreeBytes]]
    * of free space (≥ 2× any plausible per-gate scratch at bench scale;
    * a bigger deployment lands scratch on real local disk/DFS anyway). */
  private[graft] val TmpfsMinFreeBytes: Long = 2L << 30

  private[graft] def tmpfsUsable(shm: java.io.File): Boolean =
    shm.isDirectory && shm.canWrite && shm.getUsableSpace >= TmpfsMinFreeBytes

  /** The exact ngram-Jaccard pair set feeds BOTH q_dedup_ngram and
    * q_dedup_clusters; computing the shingle-index join once per (session,
    * dir) and checkpointing halves the most expensive pipeline in the sweep
    * (clusters would otherwise recompute it from scratch). */
  // The memoized DataFrames strongly reference their session, so ANY map
  // holding them pins that session — a WeakReference around the key could
  // never clear and would only pretend otherwise. The honest lifecycle:
  // hold strong refs, evict entries for STOPPED sessions on every access
  // (their checkpoint blocks are already released by the stop). An
  // abandoned-but-unstopped session stays memoized — stopping the session
  // is the API contract for releasing its resources.
  private val ngramPairsMemo = new java.util.HashMap[Integer,
    (SparkSession, scala.collection.mutable.Map[String, DataFrame])]()
  private def ngramPairsShared(s: SparkSession, dir: String): DataFrame =
    ngramPairsMemo.synchronized {
      ngramPairsMemo.entrySet().removeIf(_.getValue._1.sparkContext.isStopped)
      val k = Integer.valueOf(System.identityHashCode(s))
      val cur = ngramPairsMemo.get(k)
      val entry =
        if (cur != null && (cur._1 eq s)) cur
        else {
          val fresh = (s, scala.collection.mutable.Map.empty[String, DataFrame])
          ngramPairsMemo.put(k, fresh)
          fresh
        }
      val df = entry._2.getOrElseUpdate(dir,
        Dedup.lazyShare(
          Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
            k = 3, threshold = 0.5)))
      // a clearCache() (e.g. Bench between sweep passes) drops the persist
      // registration of the long-lived memo DataFrame — re-register so the
      // two gates sharing it (ngram pairs, clusters) stay shared per pass
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    }

  private val SplitWeights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** The ngram-Jaccard connected-components CTE chain (pairs → edges →
    * transitive reach) shared by the q_dedup_clusters and
    * q_corpus_split_safe oracles — both must define the SAME components. */
  private lazy val sqlNgramReachCtes: String =
    s"""pairs AS (
       |  WITH d AS (
       |    SELECT doc_id,
       |     list_distinct(${TextFunctions.sqlWordShingles("text", 3)
             .replace("string_split(text, ' ')", "w")}) AS sh
       |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
       |  ), e AS (
       |    SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d WHERE len(sh) > 0
       |  ), p AS (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
       |     count(*) AS shared
       |    FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
       |    GROUP BY 1, 2, 3, 4)
       |  SELECT doc_a, doc_b FROM p
       |  WHERE shared * 1.0 / (na + nb - shared) >= 0.5
       |), edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
       |)""".stripMargin

  /** Per-source keep-rates for the q_corpus_mix stratified-sampling gate
    * (shared by the Spark query and its DuckDB oracle twin). */
  private val MixRates = Map("src0" -> 0.25, "src1" -> 0.75)
  private val MixDefaultRate = 0.5
  private val MixBudgets = Map("src0" -> 400L, "src1" -> 900L, "src2" -> 2500L)
  private val MixEpochs = Map("src0" -> 2.5, "src1" -> 0.4)
  private val Bm25Query = Seq("data", "key", "spark", "table", "value")

  /** Fixed benchmark query TABLE for the multi-query BM25 gate: duplicate
    * in-query terms (dedup once), overlapping term sets across queries
    * (shared tf/df work), and one all-miss query (absent from output). */
  private val Bm25Queries = Seq(
    (1L, "data value"),
    (2L, "spark table key"),
    (3L, "data data spark"),
    (4L, "zzzznomatch qqqqnomatch"))

  /** Stream gates copy the documents table into a graft log only to stream
    * it back out; the copy is byte-identical across every gate of the same
    * payload shape, so it is written ONCE per (sf dir, shape) and shared.
    * The gates' subject is the streaming read path — an Nth identical
    * write-side job is pure harness overhead muddying the bench's
    * round-over-round comparison. In-memory registry logs, one per sf dir
    * and shape, never dropped (bounded: the test suite touches <= 3 dirs). */
  private val sharedLogs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def sharedLog(dir: String, shape: String)(
      write: String => Unit): String =
    sharedLogs.compute(s"$dir|$shape", (_, existing) => {
      if (existing != null && sources.EventLogRegistry.exists(existing)) existing
      else {
        val name = s"s${shape}_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        write(name)
        name
      }
    })

  private def sharedDocsLog(s: SparkSession, dir: String, withId: Boolean,
      dropSrc0: Boolean = false, withSource: Boolean = false,
      withLang: Boolean = false): String = {
    val shape = (if (withId) "id" else "body") +
      (if (dropSrc0) "nosrc0" else "") + (if (withSource) "src" else "") +
      (if (withLang) "lang" else "")
    sharedLog(dir, shape) { name =>
      val docs0 = Tables.documents(s, dir)
      val docs = if (dropSrc0) docs0.filter(col("source") =!= "src0") else docs0
      (if (withId && withSource && withLang)
        docs.select(col("text").cast("binary").as("body"),
          map(lit("doc_id"), col("doc_id").cast("string"),
            lit("source"), col("source"),
            lit("lang"), col("lang")).as("properties"))
      else if (withId && withSource)
        docs.select(col("text").cast("binary").as("body"),
          map(lit("doc_id"), col("doc_id").cast("string"),
            lit("source"), col("source")).as("properties"))
      else if (withId)
        docs.select(col("text").cast("binary").as("body"),
          map(lit("doc_id"), col("doc_id").cast("string")).as("properties"))
      else docs.select(col("text").cast("binary").as("body")))
        .write.format(GraftEventLog.Format)
        .option("name", name).option("partitions", "4").mode("append").save()
    }
  }

  /** Shared embeddings log for q_stream_embed_drift: the vector rides in
    * the body as a comma-joined DOUBLE rendering (widened BEFORE
    * stringify — double -> string -> double round-trips exactly in Spark,
    * while stringifying the raw floats would re-parse to DIFFERENT
    * doubles than the batch path's float -> double widening). */
  private def sharedEmbedLog(s: SparkSession, dir: String): String =
    sharedLog(dir, "emb") { name =>
      Tables.embeddings(s, dir)
        .select(concat_ws(",",
            transform(col("embedding").cast("array<double>"),
              x => x.cast("string"))).cast("binary").as("body"),
          map(lit("vec_id"), col("vec_id").cast("string"),
            lit("label"), col("label").cast("string")).as("properties"))
        .write.format(GraftEventLog.Format)
        .option("name", name).option("partitions", "4").mode("append").save()
    }

  /** Shared events log carrying (event_id, event_type, value) as typed
    * properties — q_stream_drift's source (the parquet-seeded `path` log
    * erases `value`, which the drift monitor needs). */
  private def sharedEventsValLog(s: SparkSession, dir: String): String =
    sharedLog(dir, "evval") { name =>
      Tables.events(s, dir)
        .select(col("event_type").cast("binary").as("body"),
          map(lit("event_id"), col("event_id").cast("string"),
            lit("event_type"), col("event_type"),
            lit("value"), col("value").cast("string")).as("properties"))
        .write.format(GraftEventLog.Format)
        .option("name", name).option("partitions", "4").mode("append").save()
    }

  /** Same once-per-dir sharing for q_stream_session_window's sentinel-
    * augmented events copy (events + one watermark-advancing sentinel row
    * — a pure function of the sf dir): written on first use, reused by
    * the second bench pass, deleted at JVM exit. */
  private val sharedSentinelDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Once-per-dir snapshot sketches for the overlap matrix/append gates:
    * the m2/m3/m5 sketch files — and the incremental-lifecycle twin
    * `m2app` (save a quarter of the corpus, append the remaining evens) —
    * are pure functions of the sf dir (deterministic reductions), so
    * re-writing them per gate run was ~2.3 s of harness overhead per run
    * muddying the bench ([[sharedLog]]'s rationale). Deleted at JVM exit. */
  private val sharedSketchDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def overlapSketchDir(s: SparkSession, dir: String): String =
    sharedSketchDirs.computeIfAbsent(dir, _ => {
      val d = Tables.documents(s, dir)
      val base = scratchDir("ovm")
      Seq("m2" -> 2, "m3" -> 3, "m5" -> 5).foreach { case (nm, m) =>
        operators.CorpusOps.saveOverlapSketch(
          d.filter(col("doc_id") % m === 0), "text", s"$base/$nm")
      }
      val evens = d.filter(col("doc_id") % 2 === 0)
      operators.CorpusOps.saveOverlapSketch(
        evens.filter(col("doc_id") % 4 === 0), "text", s"$base/m2app")
      operators.CorpusOps.appendToOverlapSketch(
        evens.filter(col("doc_id") % 4 =!= 0), "text", s"$base/m2app")
      sys.addShutdownHook {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base)); ()
      }
      base
    })

  /** Once-per-dir persisted BM25 stats for q_text_bm25_persisted: built
    * through the full incremental lifecycle (save the evens as the base
    * snapshot, append the odds as epoch 0) so the gate exercises save +
    * append + load + probe; the files are a pure function of the sf dir. */
  private val sharedBm25StatsDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def bm25StatsDir(s: SparkSession, dir: String): String =
    sharedBm25StatsDirs.computeIfAbsent(dir, _ => {
      val d = Tables.documents(s, dir)
      val base = scratchDir("bm25s")
      val path = s"$base/stats"
      operators.CorpusOps.saveBm25Stats(
        d.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
      operators.CorpusOps.appendToBm25Stats(
        d.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", path, epoch = 0)
      sys.addShutdownHook {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base)); ()
      }
      path
    })

  /** Once-per-dir persisted fuzzy segment index over q_fuzzy_link's
    * catalog, built through the full incremental lifecycle (save the
    * even-id half, append the odd-id half) so the gate exercises save +
    * append + load + probe — the files are a pure function of the sf
    * dir. Deleted at JVM exit. */
  private val sharedFuzzyIdxDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def fuzzyIndexDir(s: SparkSession, dir: String): String =
    sharedFuzzyIdxDirs.computeIfAbsent(dir, _ => {
      val d0 = Tables.documents(s, dir).filter(col("doc_id") < 800)
        .select(col("doc_id"), substring(col("text"), 1, 40).as("key"))
      val base = scratchDir("fzidx")
      val path = s"$base/idx"
      operators.Fuzzy.saveFuzzyIndex(
        d0.filter(col("doc_id") % 2 === 0), "doc_id", "key", maxDist = 1, path)
      operators.Fuzzy.appendToFuzzyIndex(
        d0.filter(col("doc_id") % 2 =!= 0), "doc_id", "key", path)
      sys.addShutdownHook {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base)); ()
      }
      path
    })

  /** Once-per-dir persisted perceptual-hash index over the even-doc_id
    * media, built through the full incremental lifecycle (save the
    * doc_id%4==0 quarter, append the doc_id%4==2 quarter). Deleted at JVM
    * exit. */
  private val sharedPhashIdxDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def phashIndexDir(s: SparkSession, dir: String): String =
    sharedPhashIdxDirs.computeIfAbsent(dir, _ => {
      import s.implicits._
      val d0 = Tables.documents(s, dir).filter(col("doc_id") < 800)
      def media(m: Long) = d0.filter(col("doc_id") % 4 === m)
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("content"),
          lit("image").as("format"), col("source"))
        .as[operators.Multimodal.MediaRow]
      val base = scratchDir("phidx")
      val path = s"$base/idx"
      operators.Multimodal.savePhashIndex(media(0), path, maxHamming = 4)
      operators.Multimodal.appendToPhashIndex(media(2), path)
      sys.addShutdownHook {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base)); ()
      }
      path
    })

  /** Run a gate stream to completion or fail loudly: a timed-out
    * AvailableNow query must never let the caller read partial sink
    * contents as the query's answer (and the still-running stream must not
    * keep writing under restored session confs). */
  private def awaitOrFail(q: org.apache.spark.sql.streaming.StreamingQuery,
      ms: Long = 300000): Unit =
    if (!q.awaitTermination(ms)) {
      try q.stop()
      finally throw new IllegalStateException(
        s"gate stream did not complete within ${ms / 1000}s")
    }

  /** The qualifying contaminated (doc_id, bench_id, shared) pair CTEs —
    * shared prefix of the decontamination and contamination-report oracles,
    * mirroring the shared pair stage in [[operators.CorpusOps]]. */
  private lazy val deconPairsCte: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |   list_distinct(${TextFunctions.sqlWordShingles("text", 3)
             .replace("string_split(text, ' ')", "w")}) AS sh
       |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)
       |),
       |cs AS (SELECT doc_id, unnest(sh) AS s FROM d WHERE source <> 'src0'),
       |bs AS (SELECT doc_id AS bench_id, unnest(sh) AS s FROM d WHERE source = 'src0'),
       |j AS (SELECT cs.doc_id, bs.bench_id, count(*) AS shared
       |      FROM cs JOIN bs USING (s) GROUP BY 1, 2)""".stripMargin

  /** Shared by q_corpus_decontaminate and q_stream_decontaminate: the
    * streaming form is per-batch stateless, so one batch oracle gates both. */
  private lazy val deconOracleSql: String =
    s"""$deconPairsCte
       |SELECT doc_id, count(*) AS n_bench_matched, max(shared) AS top_shared
       |FROM j WHERE shared >= 2 GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** Shared body of the stream-stream interval join gates: clicks x errors
    * on the same log partition within +-5 minutes. The equality key is
    * (partition, 10-minute time bucket) — the click side explodes to
    * bucket±1 and an exact range predicate refines, so the state join
    * hashes on a fine-grained key instead of nested-looping each
    * partition's rows (the interval is < bucket width, so each true pair
    * matches on exactly one bucket — no dedup needed). The range condition
    * on the watermarked columns is what lets Spark expire join state.
    * Runs to completion under AvailableNow; results land in memory table
    * `out` for the caller's batch-side rollup. */
  private def runStreamIntervalJoin(s: SparkSession, dir: String, out: String,
      watermarkDelay: String, joinType: String): Unit = {
    val bucketUs = 600L * 1000000L
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    // State-cost profile (graft.tools.StreamJoinProfile, sf0.1, ~2.2-2.8 s
    // wall): batch 0 addBatch ~2.0 s = dual full-log scan + banding shuffle
    // (~1 s) + symmetric-hash-join state puts/commits (~0.95 s summed over
    // tasks for 79k stored rows in 4 stores/partition); batch 1 (mandatory
    // AvailableNow watermark finalization + eviction) ~0.7 s; plus ~0.5 s
    // streaming protocol (planning, WAL, offset commits). Sweeps measured:
    // state partitions 4 vs 8 is within host noise, 16 regresses (summed
    // store-commit cost grows linearly); RocksDB regresses ~15% here (per-
    // store open/changelog overhead, while the in-memory provider holds 24 MB
    // trivially); un-banded join is 3.5x worse (per-partition nested loop).
    // The remaining cost IS the protocol's state-commit volume — every
    // stored row is a row the interval condition may still match, so the
    // plan below is the floor for stream-stream interval-join semantics.
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      def side(t: String) = s.readStream.format(GraftEventLog.Format)
        .option("path", mid(dir)).option("partitions", "4")
        .option("maxEventsPerTrigger", Long.MaxValue.toString)
        .load()
        .filter(col("properties")("event_type") === t)
        .withWatermark("enqueuedTime", watermarkDelay)
      val clicks = side("click")
        .select(col("partition").as("c_pid"),
          col("sequenceNumber").as("c_seq"), col("enqueuedTime").as("c_time"),
          floor(unix_micros(col("enqueuedTime")) / bucketUs).as("b"))
        .withColumn("c_bkt", explode(array(col("b") - 1, col("b"), col("b") + 1)))
        .drop("b")
      val errors = side("error").select(col("partition").as("e_pid"),
        col("enqueuedTime").as("e_time"),
        floor(unix_micros(col("enqueuedTime")) / bucketUs).as("e_bkt"))
      val q = clicks.join(errors,
          col("c_pid") === col("e_pid") && col("c_bkt") === col("e_bkt") &&
          col("e_time") >= col("c_time") - expr("INTERVAL 5 MINUTES") &&
          col("e_time") <= col("c_time") + expr("INTERVAL 5 MINUTES"),
          joinType)
        .writeStream.format("memory").queryName(out).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Per-(session, dir) memo of a gate-built artifact (a persisted index's
    * loaded frame, a temp path). Lifecycle: entries for stopped sessions
    * are evicted on every access, and the `eq` check guards against
    * identityHashCode reuse by a later session (same discipline as
    * [[ngramPairsMemo]]). Unlike ngramPairsMemo's builder (plan-only, no
    * job), `build()` may run index WRITE jobs — so it runs OUTSIDE the
    * monitor and other sessions' cache hits never wait behind it; a racing
    * duplicate build wastes one temp artifact, nothing more (first
    * publication wins). */
  private final class SessionDirMemo[T] {
    private val store = new java.util.HashMap[Integer,
      (SparkSession, scala.collection.mutable.Map[String, T])]()
    private def entryFor(s: SparkSession): scala.collection.mutable.Map[String, T] = {
      store.entrySet().removeIf(_.getValue._1.sparkContext.isStopped)
      val k = Integer.valueOf(System.identityHashCode(s))
      val cur = store.get(k)
      if (cur != null && (cur._1 eq s)) cur._2
      else {
        val fresh = (s, scala.collection.mutable.Map.empty[String, T])
        store.put(k, fresh)
        fresh._2
      }
    }
    def getOrBuild(s: SparkSession, dir: String, build: () => T): T = {
      val cached = store.synchronized(entryFor(s).get(dir))
      cached.getOrElse {
        val built = build()
        store.synchronized(entryFor(s).getOrElseUpdate(dir, built))
      }
    }
  }

  /** Persisted LSH index per (session, corpus dir) — built on first
    * q_ann_lsh call so repeated gate/bench runs probe the index instead of
    * rebuilding it. Caches the loaded BUCKETS DataFrame alongside the
    * params: re-creating it per probe via `spark.read.parquet` pays file
    * listing + schema/partition discovery each call (~0.2-0.4 s of fixed
    * I/O at sf0.1), while the cached frame keeps its InMemoryFileIndex and
    * each probe goes straight to partition pruning. */
  private val lshIndexes = new SessionDirMemo[(DataFrame, Int, Long)]
  private def lshIndexShared(s: SparkSession, dir: String,
      build: () => (DataFrame, Int, Long)): (DataFrame, Int, Long) =
    lshIndexes.getOrBuild(s, dir, build)

  /** Per-(session, dir) memo of the q_dedup_incremental persisted hash
    * index's PATH. */
  private val hashIndexPaths = new SessionDirMemo[String]
  private def hashIndexShared(s: SparkSession, dir: String,
      build: () => String): String =
    hashIndexPaths.getOrBuild(s, dir, build)

  /** The ngram near-dup COMPONENTS per (session, dir): q_dedup_clusters and
    * q_corpus_split_safe both need them, and the label-propagation rounds
    * (localCheckpoint-backed, so clearCache() can't unshare them) are the
    * expensive stage — run once per sweep, not once per gate. */
  private val clustersMemo = new SessionDirMemo[DataFrame]
  private def clustersShared(s: SparkSession, dir: String): DataFrame =
    clustersMemo.getOrBuild(s, dir, () => Dedup.clusters(ngramPairsShared(s, dir)))

  /** Persisted MinHash index per (session, corpus dir) — q_dedup
    * _incremental_neardup's probe target, built once per sweep. */
  private val minHashIndexPaths = new SessionDirMemo[String]

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational surface (inherited from Spark SQL; SURVEY §2.7 —
    //      exercised to prove parity on the engine we build on) ----
    "q_agg_pricing" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_items"),
          // revenue sums as DECIMAL: a float sum is shuffle-order dependent
          // (1e-9 jitter at this magnitude) and can straddle a .005 rounding
          // boundary; the per-row product is >5e-7 from any 6-decimal
          // boundary, so the decimal cast and exact sum are engine-identical
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(org.apache.spark.sql.types.DecimalType(18, 6))), 2)
            .cast("double").as("revenue"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q_join_broadcast" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("c_mktsegment"))
    }),

    "q_join_multi" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("n_name"))
    }),

    "q_join_salted" -> ((s, dir) => {
      // explicit skew-mitigation operator: results must equal the plain join
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      operators.Relational.saltedJoin(li, o, "l_orderkey", "o_orderkey",
          col("l_linenumber"), salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    "q_agg_cube" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority"))
    }),

    "q_sample_split" -> ((s, dir) => {
      // deterministic content-hash train/val/test assignment: exactly
      // reproducible across engines, runs, and partitionings
      operators.Sampling.hashSplit(Tables.documents(s, dir), col("text"), SplitWeights)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"))
    }),

    "q_corpus_cap" -> ((s, dir) => {
      // domain balancing: deterministic per-source cap on the training mix
      operators.Sampling.capPerGroup(Tables.documents(s, dir),
          Seq(col("source")), col("text"), col("doc_id"), cap = 5)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("source"))
    }),

    "q_corpus_mix" -> ((s, dir) => {
      // mixture re-weighting: stratified per-source keep-rates by content
      // hash — a pure per-row filter (no shuffle, no group-size pre-pass),
      // so re-weighting a 100 TB mix is a scan stage
      operators.Sampling.stratifiedSample(Tables.documents(s, dir),
          col("source"), MixRates, col("text"), defaultRate = MixDefaultRate)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("source"))
    }),

    "q_corpus_cap_tokens" -> ((s, dir) => {
      // token-budget balancing: mixtures are specified in tokens, so the
      // cap accumulates token counts in the same deterministic hash order
      // as q_corpus_cap and stops before the budget would be crossed
      val d = Tables.documents(s, dir)
      operators.Sampling.capPerGroupTokens(d, Seq(col("source")), col("text"),
          col("doc_id"), TextFunctions.tokenCount(col("text")), budget = 2000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long")).as("total_tokens"))
        .orderBy(col("source"))
    }),

    "q_corpus_mix_epochs" -> ((s, dir) => {
      // fractional-epoch upsampling: src0 x2.5, src1 x0.4, others x1
      val d = Tables.documents(s, dir)
      operators.Sampling.upsampleByFactor(d, col("source"), col("text"),
          MixEpochs, defaultFactor = 1.0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          max(col("epoch")).cast("long").as("max_epoch"))
        .orderBy(col("source"))
    }),

    "q_corpus_mix_budget" -> ((s, dir) => {
      // token-budget mixture: per-source budgets, unlisted sources default
      val d = Tables.documents(s, dir)
      operators.Sampling.mixByTokenBudget(d, col("source"), col("text"),
          col("doc_id"), TextFunctions.tokenCount(col("text")),
          MixBudgets, defaultBudget = 1500L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long")).as("total_tokens"))
        .orderBy(col("source"))
    }),

    "q_text_chunks" -> ((s, dir) => {
      // context-window chunking: 64-token chunks, 8-token overlap
      operators.CorpusOps.chunkDocuments(Tables.documents(s, dir),
          "doc_id", "text", chunkTokens = 64, overlap = 8)
        .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"),
          md5(col("chunk_text").cast("binary")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    "q_corpus_mix_temp" -> ((s, dir) => {
      // temperature mixing (p_source ∝ n^alpha): rates derived from the
      // group sizes in one count pre-pass, stashed so the oracle renders
      // the exact thresholds the gate used (q_ann_ivf's centroid technique)
      val d = Tables.documents(s, dir)
      val rates = operators.Sampling.temperatureRates(d, col("source"), alpha = 0.5)
      temperatureRatesStash.set(rates)
      operators.Sampling.stratifiedSample(d, col("source"), rates, col("text"),
          defaultRate = 0.0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("source"))
    }),

    "q_corpus_mix_target" -> ((s, dir) => {
      // target-proportion mixing ("50% src1 / 30% src2 / 20% src3"):
      // rates solved driver-side for the largest total needing NO
      // upsampling (binding group keeps rate 1.0), stashed so the oracle
      // renders the exact thresholds; groups outside the target drop
      val d = Tables.documents(s, dir)
      val rates = operators.Sampling.ratesForTargetMix(d, col("source"),
        Map("src1" -> 50.0, "src2" -> 30.0, "src3" -> 20.0))
      targetMixRatesStash.set(rates)
      operators.Sampling.stratifiedSample(d, col("source"), rates, col("text"),
          defaultRate = 0.0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("source"))
    }),

    "q_corpus_pack" -> ((s, dir) => {
      // concat-and-chunk sequence packing: metadata-only layout of each
      // source's token stream into 512-token training sequences (one window
      // cumsum per source; documents cross chunk boundaries as in standard
      // LLM pretraining layout)
      operators.Sampling.packSequences(Tables.documents(s, dir),
          Seq(col("source")), col("doc_id"),
          TextFunctions.tokenCount(col("text")), maxSeqLen = 512)
        .select(col("source"), col("doc_id"), col("n_tokens"),
          col("token_start"), col("seq_first"), col("seq_last"), col("seq_offset"))
        .orderBy(col("source"), col("doc_id"))
    }),

    "q_corpus_pack_bestfit" -> ((s, dir) => {
      // NO-SPLIT best-fit packing (first-fit-decreasing per (source,
      // bucket)): every doc lands whole in one 512-token sequence — the
      // fine-tuning layout where concat-and-chunk's mid-doc splits are
      // forbidden. Bucket = doc_id % 8 (integer arithmetic, so the oracle
      // replays it); the oracle replays the FFD recurrence itself with a
      // recursive CTE — full oracle, not rows-only.
      val d = Tables.documents(s, dir)
      operators.Sampling.packSequencesBestFit(d, Seq(col("source")),
          col("doc_id"), TextFunctions.tokenCount(col("text")),
          maxSeqLen = 512, bucketCol = Some(pmod(col("doc_id"), lit(8))))
        .select(col("source"), col("id").as("doc_id"), col("n_tokens"),
          col("seq_id"), col("seq_offset"))
        .orderBy(col("source"), col("doc_id"))
    }),

    "q_corpus_pack_bestfit_chunked" -> ((s, dir) => {
      // chunk-then-best-fit: docs LONGER than the 96-token sequence split
      // into the minimal piece set (full pieces + remainder) and the
      // pieces pack as units — the practical fallback where the plain
      // no-split packer fails loudly. doc_id cap + %8 bucket as in
      // q_corpus_pack_bestfit; the oracle replays piece derivation AND
      // the FFD recurrence.
      val d = Tables.documents(s, dir).filter(col("doc_id") < 800)
      operators.Sampling.packSequencesBestFitChunked(d, Seq(col("source")),
          col("doc_id"), TextFunctions.tokenCount(col("text")),
          maxSeqLen = 96, bucketCol = Some(pmod(col("doc_id"), lit(8))))
        .select(col("source"), col("id").as("doc_id"), col("piece"),
          col("n_tokens"), col("seq_id"), col("seq_offset"))
        .orderBy(col("source"), col("doc_id"), col("piece"))
    }),

    "q_corpus_pack_rows" -> ((s, dir) => {
      // materialized packing: one row per (source, seq_id) with the
      // ordered doc slices that tile it — the table a training loader
      // actually reads. Gated FLAT (one row per slice, per-sequence
      // aggregates repeated) so the DuckDB oracle replays the layout with
      // plain window functions instead of hashing nested arrays.
      operators.Sampling.packSequenceRows(Tables.documents(s, dir),
          Seq(col("source")), col("doc_id"), col("doc_id"),
          TextFunctions.tokenCount(col("text")), maxSeqLen = 512)
        .select(col("source"), col("seq_id"), col("n_docs"),
          col("seq_tokens"), explode(col("slices")).as("sl"))
        .select(col("source"), col("seq_id"), col("n_docs"),
          col("seq_tokens"), col("sl.pos").as("pos"),
          col("sl.id").as("doc_id"), col("sl.start").as("doc_start"),
          col("sl.len").as("len"))
        .orderBy(col("source"), col("seq_id"), col("pos"))
    }),

    "q_corpus_constraints" -> ((s, dir) => {
      // the data-quality admission gate: named row-level expectations with
      // COUNTED violations in one scan (a 100 TB run reports the full
      // damage profile of a bad shard, not fail-on-first); null predicates
      // count as violations, min offending id is the debugging pointer
      operators.Validation.checkConstraints(Tables.documents(s, dir),
          col("doc_id"), Seq(
            "chars_consistent" -> (length(col("text")) === col("n_chars")),
            "lang_nonnull" -> col("lang").isNotNull,
            "text_nonempty" -> (length(col("text")) > 0),
            "tokens_le_50" -> (TextFunctions.tokenCount(col("text")) <= 50)))
        .orderBy(col("rule"))
    }),

    "q_corpus_unique" -> ((s, dir) => {
      // dataset-level uniqueness expectations: one per-key aggregation +
      // constant-width re-aggregation per check (never a window); the
      // composite user/type key has real duplicates, event_id is clean
      val ev = Tables.events(s, dir)
      operators.Validation.checkUnique(ev, Seq(col("event_id")))
        .select(lit("event_id").as("key") +: uniqueCols: _*)
        .unionByName(operators.Validation
          .checkUnique(ev, Seq(col("user_id"), col("event_type")))
          .select(lit("user_id|event_type").as("key") +: uniqueCols: _*))
        .orderBy(col("key"))
    }),

    "q_corpus_referential" -> ((s, dir) => {
      // referential expectations: distinct parent keys -> planner-chosen
      // left-anti join, keys only — user_id resolves in customer (clean),
      // event_id deliberately probed against documents (real orphans)
      val ev = Tables.events(s, dir)
      operators.Validation.checkReferential(ev, col("user_id"),
          Tables.customer(s, dir), col("c_custkey"))
        .select(lit("user_id->customer").as("fk") +: refCols: _*)
        .unionByName(operators.Validation.checkReferential(ev, col("event_id"),
            Tables.documents(s, dir), col("doc_id"))
          .select(lit("event_id->documents").as("fk") +: refCols: _*))
        .orderBy(col("fk"))
    }),

    "q_stream_constraints" -> ((s, dir) => {
      // stream-side data-quality monitoring: each micro-batch runs one
      // checkConstraints scan, the tracker sums per-rule (count,
      // violations, min offender) across epochs in bounded driver state —
      // cumulative totals over ANY trigger slicing equal the batch profile
      val logName = sharedDocsLog(s, dir, withId = true)
      val nCorpus = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (nCorpus + 3) / 4)
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("doc_id").cast("long").as("doc_id"),
          col("body").cast("string").as("text"))
      val (tracker, fn) = streaming.StreamOps.constraintSink(col("doc_id"), Seq(
        "doc_id_even" -> (col("doc_id") % 2 === 0),
        "text_nonempty" -> (length(col("text")) > 0),
        "tokens_le_50" -> (TextFunctions.tokenCount(col("text")) <= 50)))
      val q = stream.writeStream.foreachBatch(fn)
        .trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
      import s.implicits._
      tracker.result
        .map { case (r, n, v, off) => (r, n, v, off.orNull) }
        .toDF("rule", "n_rows", "n_violations", "first_violation")
        .select(col("rule"), col("n_rows"), col("n_violations"),
          TextFunctions.stableRound(
            when(col("n_rows") === 0L, lit(0.0)).otherwise(
              col("n_violations").cast("double") / col("n_rows").cast("double")),
            6).as("violation_frac"),
          col("first_violation"), (col("n_violations") === 0L).as("pass"))
        .orderBy(col("rule"))
    }),

    "q_stream_fuzzy" -> ((s, dir) => {
      // streaming fuzzy record linkage in the fit-once shape: the
      // catalog's segment index fits once; each micro-batch of typo'd
      // records explodes, candidate-joins, and band-verifies against it.
      // Per-row stateless -> any slicing unions to the batch fuzzyJoin,
      // so q_fuzzy_link's oracle gates it unchanged (sides renamed: the
      // fitted catalog is the left side here).
      val outDir = scratchDir("qsfz")
      sys.addShutdownHook {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir)); ()
      }
      val logName = sharedDocsLog(s, dir, withId = true)
      val nCorpus = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (nCorpus + 3) / 4)
      val catalog = Tables.documents(s, dir).filter(col("doc_id") < 800)
        .select(col("doc_id"), substring(col("text"), 1, 40).as("key"))
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("doc_id").cast("long").as("doc_id"),
          col("body").cast("string").as("text"))
        .filter(col("doc_id") % 3 === 0 && col("doc_id") < 800)
        .select((col("doc_id") + 500000L).as("rec_id"),
          concat(substring(col("text"), 1, 11), lit("#"),
            substring(col("text"), 13, 28)).as("key"))
      val q = streaming.StreamOps.fuzzyLinkStream(stream, catalog,
          "doc_id", "key", "rec_id", "key", maxDist = 1) { (res, epochId) =>
        res.write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
      }.trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
      s.read.parquet(outDir)
        .select(col("id_r").as("id_l"), col("id_l").as("id_r"), col("dist"))
        .orderBy(col("id_l"), col("id_r"))
    }),

    "q_stream_drift" -> ((s, dir) => {
      // streaming PSI drift in the fit-once shape: the reference histogram
      // fits ONCE from the batch snapshot (even event_ids); each
      // micro-batch folds one histogram aggregate (<= 16 rows) into
      // bounded driver state. Counts are exact integers, so the cumulative
      // monitor over ANY trigger slicing equals the batch
      // distributionDrift — q_numeric_drift's oracle gates it unchanged.
      val logName = sharedEventsValLog(s, dir)
      val nEv = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (nEv + 3) / 4)
      val tracker = streaming.StreamOps.driftFit(
        Tables.events(s, dir).filter(col("event_id") % 2 === 0), "value",
        lo = 0.0, hi = 512.0, buckets = 16)
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("event_id").cast("long").as("event_id"),
          col("properties")("event_type").as("event_type"),
          col("properties")("value").cast("double").as("value"))
        .filter(col("event_id") % 2 === 1)
        .withColumn("value", when(col("event_type") === "view",
          col("value") * 1.5 + 10).otherwise(col("value")))
      val q = stream.writeStream
        .foreachBatch(streaming.StreamOps.driftSink(tracker, "value"))
        .trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
      import s.implicits._
      operators.Validation.distributionDriftFromCounts(
          tracker.counts.toDF("bucket", "n_ref", "n_cur"),
          lo = 0.0, hi = 512.0, buckets = 16)
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          TextFunctions.stableRound(col("lo_edge"), 6).as("lo_edge_r"),
          TextFunctions.stableRound(col("hi_edge"), 6).as("hi_edge_r"),
          TextFunctions.stableRound(col("p_ref"), 6).as("p_ref_r"),
          TextFunctions.stableRound(col("p_cur"), 6).as("p_cur_r"),
          TextFunctions.stableRound(col("psi"), 6).as("psi_r"))
        .orderBy(col("bucket"))
    }),

    "q_stream_cat_drift" -> ((s, dir) => {
      // streaming categorical (source-mix) PSI in the fit-once shape: the
      // reference's top-6 + __other__ mix fits ONCE from the even-id
      // batch snapshot; each micro-batch classifies against the
      // broadcast-literal top set (ONE aggregate, <= 7 rows collected)
      // into bounded driver state. Cumulative integer counts over ANY
      // trigger slicing == the batch fold, so q_categorical_drift's
      // oracle gates it unchanged (same planted dark feed: the odd-id
      // snapshot drops src1 entirely).
      val logName = sharedDocsLog(s, dir, withId = true, withSource = true)
      val n = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (n + 3) / 4)
      val tracker = streaming.StreamOps.catDriftFit(
        Tables.documents(s, dir).filter(col("doc_id") % 2 === 0),
        "source", topK = 6)
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("doc_id").cast("long").as("doc_id"),
          col("properties")("source").as("source"))
        .filter(col("doc_id") % 2 === 1 && col("source") =!= "src1")
      val q = stream.writeStream
        .foreachBatch(streaming.StreamOps.catDriftSink(tracker, "source"))
        .trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
      import s.implicits._
      operators.Validation.categoricalDriftFromCounts(
          tracker.counts.toDF("category", "__ord", "n_ref", "n_cur"),
          alpha = 0.5)
        .select(col("category"), col("n_ref"), col("n_cur"),
          TextFunctions.stableRound(col("p_ref"), 6).as("p_ref_r"),
          TextFunctions.stableRound(col("p_cur"), 6).as("p_cur_r"),
          TextFunctions.stableRound(col("psi"), 6).as("psi_r"))
        .orderBy(col("category"))
    }),

    "q_group_cat_drift" -> ((s, dir) => {
      // per-group CATEGORICAL drift — the last drift-matrix cell: the gate
      // PLANTS one source's language classifier breaking ('src2' re-labels
      // 'en' as 'zh' on the odd-id snapshot — identically in the oracle),
      // so src2's rows light up while every other group reads ~0 PSI.
      // Per-group top-3 by (count desc, name asc), tails fold to
      // __other__, per-group smoothing denominators.
      val d = Tables.documents(s, dir)
      val ref = d.filter(col("doc_id") % 2 === 0)
      val cur = d.filter(col("doc_id") % 2 === 1)
        .withColumn("lang", when(col("source") === "src2" &&
          col("lang") === "en", "zh").otherwise(col("lang")))
      operators.Validation.categoricalDriftByGroup(ref, cur,
          "source", "lang", topK = 3)
        .select(col("group").as("grp"), col("category"),
          col("n_ref"), col("n_cur"),
          TextFunctions.stableRound(col("p_ref"), 6).as("p_ref_r"),
          TextFunctions.stableRound(col("p_cur"), 6).as("p_cur_r"),
          TextFunctions.stableRound(col("psi"), 6).as("psi_r"))
        .orderBy(col("grp"), col("category"))
    }),

    "q_stream_group_cat_drift" -> ((s, dir) => {
      // the streaming twin: per-group top-3 mixes fit ONCE from the
      // even-id snapshot; each micro-batch classifies against the bounded
      // broadcast top table (ONE aggregate, <= groups x 4 rows) into
      // bounded driver state. Exact integer counts over ANY slicing ==
      // the batch fold, so q_group_cat_drift's oracle gates it unchanged.
      val logName = sharedDocsLog(s, dir, withId = true, withSource = true,
        withLang = true)
      val n = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (n + 3) / 4)
      val tracker = streaming.StreamOps.groupCatDriftFit(
        Tables.documents(s, dir).filter(col("doc_id") % 2 === 0),
        "source", "lang", topK = 3)
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("doc_id").cast("long").as("doc_id"),
          col("properties")("source").as("source"),
          col("properties")("lang").as("lang"))
        .filter(col("doc_id") % 2 === 1)
        .withColumn("lang", when(col("source") === "src2" &&
          col("lang") === "en", "zh").otherwise(col("lang")))
      val q = stream.writeStream
        .foreachBatch(streaming.StreamOps.groupCatDriftSink(
          tracker, "source", "lang"))
        .trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
      import s.implicits._
      operators.Validation.categoricalDriftByGroupFromCounts(
          tracker.counts.toDF("group", "category", "__ord", "n_ref", "n_cur"),
          alpha = 0.5)
        .select(col("group").as("grp"), col("category"),
          col("n_ref"), col("n_cur"),
          TextFunctions.stableRound(col("p_ref"), 6).as("p_ref_r"),
          TextFunctions.stableRound(col("p_cur"), 6).as("p_cur_r"),
          TextFunctions.stableRound(col("psi"), 6).as("psi_r"))
        .orderBy(col("grp"), col("category"))
    }),

    "q_stream_group_drift" -> ((s, dir) => {
      // streaming PER-GROUP PSI in the fit-once shape: per-segment
      // reference histograms fit ONCE from the even-id snapshot; each
      // micro-batch folds one (group, bucket) aggregate (<= groups x 8
      // rows) into bounded driver state. Exact integer counts over ANY
      // slicing == the batch per-group profile, so q_group_drift's oracle
      // gates it unchanged (same planted shift: 'click' values scaled
      // 1.25x + 8 on the odd-id snapshot).
      val logName = sharedEventsValLog(s, dir)
      val nEv = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (nEv + 3) / 4)
      val tracker = streaming.StreamOps.groupDriftFit(
        Tables.events(s, dir).filter(col("event_id") % 2 === 0),
        "event_type", "value", lo = 0.0, hi = 512.0, buckets = 8)
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("event_id").cast("long").as("event_id"),
          col("properties")("event_type").as("event_type"),
          col("properties")("value").cast("double").as("value"))
        .filter(col("event_id") % 2 === 1)
        .withColumn("value", when(col("event_type") === "click",
          col("value") * 1.25 + 8).otherwise(col("value")))
      val q = stream.writeStream
        .foreachBatch(streaming.StreamOps.groupDriftSink(
          tracker, "event_type", "value"))
        .trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
      import s.implicits._
      operators.Validation.distributionDriftByGroupFromCounts(
          tracker.counts.toDF("group", "bucket", "n_ref", "n_cur"),
          lo = 0.0, hi = 512.0, buckets = 8)
        .select(col("group").as("grp"), col("bucket"),
          col("n_ref"), col("n_cur"),
          TextFunctions.stableRound(col("lo_edge"), 6).as("lo_edge_r"),
          TextFunctions.stableRound(col("hi_edge"), 6).as("hi_edge_r"),
          TextFunctions.stableRound(col("p_ref"), 6).as("p_ref_r"),
          TextFunctions.stableRound(col("p_cur"), 6).as("p_cur_r"),
          TextFunctions.stableRound(col("psi"), 6).as("psi_r"))
        .orderBy(col("grp"), col("bucket"))
    }),

    "q_stream_embed_drift" -> ((s, dir) => {
      // streaming EMBEDDING drift in the fit-once shape: reference
      // per-label centroids/norms fit ONCE from the even-vec_id snapshot;
      // each micro-batch folds two bounded aggregates (per-label stats +
      // per-(label, pos) centroid sums) into labels x dim driver state.
      // Cumulative sums over ANY slicing == the batch stats up to fp
      // association, absorbed by stableRound(4) — q_embed_drift's oracle
      // gates it unchanged (same planted re-scale: odd vec_ids with
      // label >= 5 get x*1.2 + 0.01; the log round-trips DOUBLES so the
      // arithmetic is bit-identical to the batch path).
      val logName = sharedEmbedLog(s, dir)
      val n = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (n + 3) / 4)
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
      val tracker = streaming.StreamOps.embedDriftFit(
        e.filter(col("vec_id") % 2 === 0), "label", "v")
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("vec_id").cast("long").as("vec_id"),
          col("properties")("label").cast("int").as("label"),
          split(col("body").cast("string"), ",")
            .cast("array<double>").as("v"))
        .filter(col("vec_id") % 2 === 1)
        .withColumn("v", when(col("label") >= 5,
          transform(col("v"), x => x * 1.2 + 0.01)).otherwise(col("v")))
      val q = stream.writeStream
        .foreachBatch(streaming.StreamOps.embedDriftSink(tracker, "label", "v"))
        .trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
      import s.implicits._
      tracker.result.toDF("label_s", "n_ref", "n_cur", "norm_ref",
          "norm_cur", "centroid_cos", "dim_mismatch")
        .select(col("label_s").cast("int").as("label"),
          col("n_ref"), col("n_cur"),
          TextFunctions.stableRound(col("norm_ref"), 4).as("norm_ref_r"),
          TextFunctions.stableRound(col("norm_cur"), 4).as("norm_cur_r"),
          TextFunctions.stableRound(col("centroid_cos"), 4).as("cos_r"),
          col("dim_mismatch"))
        .orderBy(col("label"))
    }),

    "q_corpus_pack_texts" -> ((s, dir) => {
      // the loader's final step: resolve the packed slices to actual token
      // text — end-to-end proof that the layout reconstructs the corpus
      // (each sequence's text is the exact token span the slices claim)
      val d = Tables.documents(s, dir)
      val packed = operators.Sampling.packSequenceRows(d,
        Seq(col("source")), col("doc_id"), col("doc_id"),
        TextFunctions.tokenCount(col("text")), maxSeqLen = 512)
      operators.Sampling.packedSequenceText(packed, d,
          Seq(col("source")), col("doc_id"), col("text"))
        .select(col("source"), col("seq_id"), col("seq_tokens"), col("seq_text"))
        .orderBy(col("source"), col("seq_id"))
    }),

    "q_pipeline_e2e" -> ((s, dir) => {
      // the full pretraining-data pipeline composed in ONE plan — the
      // "switch your pipeline to this library" demonstration: quality
      // filter -> exact dedup -> benchmark decontamination -> mixture
      // sampling -> sequence packing. Every stage is the same operator its
      // individual gate verifies; the composed oracle replays all five in
      // SQL, so stage interop (schemas, nullability, determinism) is gated
      // too, not just each stage alone.
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(col("source") =!= "src0")
      val bench = docs.filter(col("source") === "src0")
      val keepIds = operators.CorpusOps.qualityFilter(corpus, "doc_id", "text",
          minTokens = 20, maxTokens = 80, lang = "en", minQuality = 0.5,
          maxDupWordFrac = 0.75)
        .filter(col("keep")).select(col("doc_id"))
      val filtered = corpus.join(keepIds, "doc_id")
      val deduped = Dedup.exactRows(filtered, Seq(col("text")), col("doc_id"))
      val flagged = operators.CorpusOps.decontaminate(deduped, bench,
          "doc_id", "text", k = 3, minShared = 2)
        .select(col("doc_id"))
      val clean = deduped.join(flagged, Seq("doc_id"), "left_anti")
      val mixed = operators.Sampling.stratifiedSample(clean, col("source"),
        MixRates, col("text"), defaultRate = MixDefaultRate)
      // persist the mixture before layout: bucketedCumSum's subtotal and
      // join-back branches would otherwise re-run the dedup+decontaminate
      // upstream; the boundary sample itself reads the RAW column-pruned
      // scan (boundarySource), not the pipeline — bucket boundaries shape
      // only balance, so sampling the superset is free and value-identical
      val staged = Dedup.lazyShare(mixed)
      operators.Sampling.packSequences(staged, Seq(col("source")), col("doc_id"),
          TextFunctions.tokenCount(col("text")), maxSeqLen = 512,
          boundarySource = Some(docs))
        .select(col("source"), col("doc_id"), col("n_tokens"), col("token_start"),
          col("seq_first"), col("seq_last"), col("seq_offset"))
        .orderBy(col("source"), col("doc_id"))
    }),

    "q_corpus_filter" -> ((s, dir) => {
      // reason-labeled quality gate: first-failing-rule labels, no shuffle
      operators.CorpusOps.qualityFilter(Tables.documents(s, dir), "doc_id", "text",
          minTokens = 20, maxTokens = 80, lang = "en", minQuality = 0.5,
          maxDupWordFrac = 0.75)
        .orderBy(col("doc_id"))
    }),

    "q_corpus_decontaminate" -> ((s, dir) => {
      // benchmark leakage: corpus docs sharing >= 2 trigram shingles with
      // any doc of the held-out "benchmark" source
      val docs = Tables.documents(s, dir)
      operators.CorpusOps.decontaminate(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", k = 3, minShared = 2)
        .orderBy(col("doc_id"))
    }),

    "q_corpus_contamination" -> ((s, dir) => {
      // the release-audit flip side: per benchmark (src0) item, how many
      // corpus docs leak it — same pair stage as q_corpus_decontaminate
      val docs = Tables.documents(s, dir)
      operators.CorpusOps.contaminationReport(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", k = 3, minShared = 2)
        .orderBy(col("bench_id"))
    }),

    "q_corpus_coverage" -> ((s, dir) => {
      // token-level contamination coverage (GPT-3/PaLM appendix metric):
      // per corpus doc, the fraction of word positions covered by a k-gram
      // that also occurs anywhere in the benchmark
      val docs = Tables.documents(s, dir)
      operators.CorpusOps.contaminationCoverage(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", k = 3)
        .orderBy(col("doc_id"))
    }),

    "q_corpus_decontaminate_neardup" -> ((s, dir) => {
      // paraphrase-shaped leakage: ids ≡0 (mod 17) re-enter as benchmark
      // docs with their first word dropped (identically in the oracle) —
      // exact-match misses them, MinHash-LSH + Jaccard-verify must not
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val wrds = split(col("text"), " ")
      val bench = d.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"),
          array_join(slice(wrds, lit(2), size(wrds) - 1), " ").as("text"))
      operators.CorpusOps.decontaminateNearDup(d, bench, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q_text_repetition" -> ((s, dir) => {
      // Gopher/MassiveText-style repetition signals, most-repetitive first
      operators.CorpusOps.repetitionProfile(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("dup_word_frac").desc, col("doc_id"))
        .limit(20)
    }),

    "q_corpus_dup_spans" -> ((s, dir) => {
      // cross-document boilerplate: per doc, the fraction of its word
      // trigram spans shared with at least one other document
      operators.CorpusOps.duplicateSpanProfile(
          Tables.documents(s, dir), "doc_id", "text", k = 3, minDf = 2)
        .orderBy(col("doc_id"))
    }),

    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rk"))
    }),

    "q_sort_topk" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(10)
    }),

    "q_setops" -> ((s, dir) => {
      // single-pass set operations: one aggregation computes membership
      // flags, a second counts the three set cardinalities (vs three
      // separate intersect/except/union jobs)
      val o = Tables.orders(s, dir)
      val flags = o.groupBy(col("o_custkey"))
        .agg(
          max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("in_urgent"),
          max(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("in_open"))
      flags.agg(
          sum(when(col("in_urgent") === 1 && col("in_open") === 0, 1).otherwise(0)).as("except_n"),
          sum(when(col("in_urgent") === 1 && col("in_open") === 1, 1).otherwise(0)).as("intersect_n"),
          sum(when(col("in_urgent") === 1 || col("in_open") === 1, 1).otherwise(0)).as("union_n"))
        .select(explode(array(
          struct(lit("except").as("op"), col("except_n").as("n")),
          struct(lit("intersect").as("op"), col("intersect_n").as("n")),
          struct(lit("union").as("op"), col("union_n").as("n")))).as("r"))
        .select(col("r.op"), col("r.n"))
        .orderBy(col("op"))
    }),

    "q_distinct_groups" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- event-time / streaming-shaped queries ----
    "q_events_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    "q_events_sessions" -> ((s, dir) => {
      // gap-rule session counts via the bucketed two-phase form (no window
      // partitioned by the bare user key — a hot user spreads over the
      // time buckets; Relational.sessionCounts)
      operators.Relational.sessionCounts(Tables.events(s, dir),
          "user_id", "ts", gapMicros = 1800L * 1000000L)
        .orderBy(col("user_id"))
    }),

    "q_events_session_window" -> ((s, dir) => {
      // native session windows (stock Spark session_window; the batch face
      // of the streaming sessionization the reference's users hand-roll)
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    "q_stream_session_window" -> ((s, dir) => {
      // NATIVE session windows in a stream (stock session_window + state
      // store) in APPEND mode — the watermark-EVICTION path a 100 TB
      // deployment runs, where a session is emitted (and its state freed)
      // once the watermark passes its end, instead of complete mode's
      // full-state rematerialization every trigger. A sentinel event far
      // past the data advances the final watermark beyond every real
      // session end + gap, so the bounded testdata provably flushes ALL
      // sessions through eviction and the result still equals the batch
      // session windows exactly.
      import s.implicits._
      val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
      val tmp = sharedSentinelDirs.computeIfAbsent(dir, _ => {
        val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
        // sentinel key -1: real user ids are non-negative; its only job is
        // to advance the final watermark past every real session end + gap
        val sentinel = Seq((-1L,
          new java.sql.Timestamp(maxTs.getTime + 36000000L))).toDF("user_id", "ts")
        val d = scratchDir("ssw_src")
        ev.unionByName(sentinel).write.mode("overwrite").parquet(d)
        sys.addShutdownHook {
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)); ()
        }
        d
      })
      val out = "ssw_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val src = s.readStream.schema(ev.schema).parquet(tmp)
        val q = src
          .withWatermark("ts", "1 hour")
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"))
          .writeStream.format("memory").queryName(out).outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        awaitOrFail(q)
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(out)
        .filter(col("user_id") =!= -1L)
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    "q_numeric_profile" -> ((s, dir) => {
      operators.Sketches.numericProfileExact(
          Tables.events(s, dir), Seq(col("event_type")), col("value"))
        .orderBy(col("event_type"))
    }),

    "q_numeric_drift" -> ((s, dir) => {
      // PSI distribution-drift monitor between two snapshots. The gate
      // PLANTS a shift (odd-id 'view' events scaled 1.5x + 10 — the tail
      // clamps into the top bucket) identically in the oracle; edges are
      // picked binary-exact (w = 32) so bucket assignment is bit-identical
      // across engines, and the smoothed probabilities / psi terms are
      // stableRound(6)ed for the hash compare
      val ev = Tables.events(s, dir)
      val ref = ev.filter(col("event_id") % 2 === 0)
      val cur = ev.filter(col("event_id") % 2 === 1)
        .withColumn("value", when(col("event_type") === "view",
          col("value") * 1.5 + 10).otherwise(col("value")))
      operators.Validation.distributionDrift(ref, cur, "value",
          lo = 0.0, hi = 512.0, buckets = 16)
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          TextFunctions.stableRound(col("lo_edge"), 6).as("lo_edge_r"),
          TextFunctions.stableRound(col("hi_edge"), 6).as("hi_edge_r"),
          TextFunctions.stableRound(col("p_ref"), 6).as("p_ref_r"),
          TextFunctions.stableRound(col("p_cur"), 6).as("p_cur_r"),
          TextFunctions.stableRound(col("psi"), 6).as("psi_r"))
        .orderBy(col("bucket"))
    }),

    "q_group_drift" -> ((s, dir) => {
      // per-group (segmented) PSI drift: the gate PLANTS a shift in ONE
      // source group ('click' events scaled 1.25x + 8 on the odd-id
      // snapshot — binary-exact arithmetic, identical in the oracle) so
      // that group's rows light up while the others read ~0 PSI; per-group
      // smoothing denominators, 8 binary-exact buckets (w = 64)
      val ev = Tables.events(s, dir)
      val ref = ev.filter(col("event_id") % 2 === 0)
      val cur = ev.filter(col("event_id") % 2 === 1)
        .withColumn("value", when(col("event_type") === "click",
          col("value") * 1.25 + 8).otherwise(col("value")))
      operators.Validation.distributionDriftByGroup(ref, cur,
          "event_type", "value", lo = 0.0, hi = 512.0, buckets = 8)
        .select(col("group").as("grp"), col("bucket"),
          col("n_ref"), col("n_cur"),
          TextFunctions.stableRound(col("lo_edge"), 6).as("lo_edge_r"),
          TextFunctions.stableRound(col("hi_edge"), 6).as("hi_edge_r"),
          TextFunctions.stableRound(col("p_ref"), 6).as("p_ref_r"),
          TextFunctions.stableRound(col("p_cur"), 6).as("p_cur_r"),
          TextFunctions.stableRound(col("psi"), 6).as("psi_r"))
        .orderBy(col("grp"), col("bucket"))
    }),

    "q_numeric_profile_sketch" -> ((s, dir) => {
      // the 100 TB numeric profile: percentile_approx (mergeable KLL-style
      // partials, map-side combined) instead of the exact sort-based
      // percentile. Gate technique = q_sketch_distinct: exact group counts
      // DuckDB-verified plus a boolean that each returned quantile value's
      // TRUE rank interval [lt+1, le] intersects the sketch's guaranteed
      // rank window [(p-eps)n - 1, (p+eps)n + 1] (eps = 1/accuracy)
      val qs = Seq(0.25, 0.5, 0.75, 0.95)
      val accuracy = 10000
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val prof = operators.Sketches.numericProfile(
          ev, Seq(col("event_type")), col("value"), qs)
        .select(col("event_type"), col("n"),
          posexplode(col("quantiles")).as(Seq("qi", "qv")))
      val qlit = array(qs.map(lit): _*)
      val eps = 1.0 / accuracy
      ev.join(broadcast(prof), Seq("event_type"))
        .groupBy(col("event_type"), col("qi"), col("qv"), col("n"))
        .agg(sum(when(col("value") < col("qv"), 1L).otherwise(0L)).as("lt"),
          sum(when(col("value") <= col("qv"), 1L).otherwise(0L)).as("le"))
        .select(col("event_type"),
          element_at(qlit, col("qi").cast("int") + 1).as("quantile"),
          col("n").as("n_exact"),
          ((col("lt") + 1) <=
            ceil((element_at(qlit, col("qi").cast("int") + 1) + eps) *
              col("n")) + 1 &&
           col("le") >=
            floor((element_at(qlit, col("qi").cast("int") + 1) - eps) *
              col("n")) - 1).as("within_rank_bounds"))
        .orderBy(col("event_type"), col("quantile"))
    }),

    "q_events_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("value").desc)
      Tables.events(s, dir)
        .withColumn("rk", dense_rank().over(w))
        .filter(col("rk") <= 3)
        .groupBy(col("event_type"), col("rk"))
        .agg(round(max(col("value")), 2).as("value"), count(lit(1)).as("n_at_rank"))
        .orderBy(col("event_type"), col("rk"))
    }),

    // ---- connector surface (S1-S13 / P1-P4 / R1-R5) ----
    "q_source_scan" -> ((s, dir) => {
      GraftEventLog.readParquetLog(s, mid(dir), 4)
        .select(col("partition"), col("sequenceNumber"),
          col("body").cast("string").as("body_str"))
        .orderBy(col("partition"), col("sequenceNumber"))
    }),

    "q_source_pushdown" -> ((s, dir) => {
      GraftEventLog.readParquetLog(s, mid(dir), 4,
          Map("startingPosition" -> """{"seqNo":100}"""))
        .filter(col("sequenceNumber") < 200)
        .groupBy(col("partition"))
        .agg(count(lit(1)).as("n"), min(col("sequenceNumber")).as("min_seq"),
          max(col("sequenceNumber")).as("max_seq"))
        .orderBy(col("partition"))
    }),

    "q_source_count" -> ((s, dir) => {
      // metadata aggregate pushdown (ref S5's count-without-scan surfaced to
      // SQL): COUNT/MIN/MAX over sequenceNumber are answered from the
      // translated offset ranges with zero events decoded — the plan carries
      // a `metadata-agg` scan (pinned in ConnectorBatchSpec/PlanSpec)
      GraftEventLog.readParquetLog(s, mid(dir), 4)
        .agg(count(lit(1)).as("n"), min(col("sequenceNumber")).as("min_seq"),
          max(col("sequenceNumber")).as("max_seq"))
    }),

    "q_source_count_groups" -> ((s, dir) => {
      // grouped form: per-partition counts/bounds are the same offset
      // arithmetic, one metadata row per log partition
      GraftEventLog.readParquetLog(s, mid(dir), 4)
        .groupBy(col("partition"))
        .agg(count(lit(1)).as("n"), min(col("sequenceNumber")).as("min_seq"),
          max(col("sequenceNumber")).as("max_seq"))
        .orderBy(col("partition"))
    }),

    "q_source_time_seek" -> ((s, dir) => {
      GraftEventLog.readParquetLog(s, mid(dir), 4,
          Map("startingPosition" -> """{"enqueuedTime":"2024-01-15T00:00:00Z"}"""))
        .groupBy(col("partition"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("partition"))
    }),

    "q_source_partition_seek" -> ((s, dir) => {
      // per-partition starting positions with precedence over the global
      // default (ref EventHubsConf.scala:244-315): seqNo seek on p0, time
      // seek on p1, end-of-stream (empty) on p2, global start on p3
      GraftEventLog.readParquetLog(s, mid(dir), 4,
          Map("startingPositions" ->
            """{"0":{"seqNo":100},"1":{"enqueuedTime":"2024-01-15T00:00:00Z"},"2":"end-of-stream"}"""))
        .groupBy(col("partition"))
        .agg(count(lit(1)).as("n"), min(col("sequenceNumber")).as("min_seq"),
          max(col("sequenceNumber")).as("max_seq"))
        .orderBy(col("partition"))
    }),

    "q_source_offset_seek" -> ((s, dir) => {
      // byte-offset positions (ref EventPosition.scala:31-56, the third
      // position kind): numeric offset on p0, "-1" (= start) on p1,
      // "@latest" (= end, empty) on p2; p3 falls through to the global
      // offset default. Local logs define offset == the seqNo string the
      // source's own `offset` column emits, so feeding an offset back seeks
      // exactly to that event.
      GraftEventLog.readParquetLog(s, mid(dir), 4,
          Map(
            "startingPositions" ->
              """{"0":{"offset":"150"},"1":{"offset":"-1"},"2":{"offset":"@latest"}}""",
            "startingPosition" -> """{"offset":"50"}"""))
        .groupBy(col("partition"))
        .agg(count(lit(1)).as("n"), min(col("sequenceNumber")).as("min_seq"),
          max(col("sequenceNumber")).as("max_seq"))
        .orderBy(col("partition"))
    }),

    "q_sink_roundtrip" -> ((s, dir) => {
      val hub = "rt-" + java.util.UUID.randomUUID().toString
      GraftEventLog.create(hub, 4)
      Tables.events(s, dir)
        .select(col("props").as("body"),
          map(lit("event_type"), col("event_type")).as("properties"))
        .write.mode("append").format(GraftEventLog.Format).option("name", hub).save()
      GraftEventLog.read(s, hub)
        .groupBy(col("properties")("event_type").as("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    "q_sink_durable" -> ((s, dir) => {
      // q_sink_roundtrip through the DURABLE file-backed log: events land
      // as parquet segments, every in-JVM cache is dropped before the
      // re-read (a fresh process sees only the files), and the re-read
      // runs in a NEW SparkSession — write, "restart", re-read -> oracle
      val root = java.nio.file.Files.createTempDirectory("graft-durable-gate")
        .toString + "/log"
      Tables.events(s, dir)
        .select(col("props").as("body"),
          map(lit("event_type"), col("event_type")).as("properties"))
        .write.mode("append").format(GraftEventLog.Format)
        .option("durablePath", root).option("partitions", "4").save()
      graft.sources.DurableEventLog.invalidate(root)
      val fresh = s.newSession()
      fresh.read.format(GraftEventLog.Format)
        .option("durablePath", root).option("partitions", "4").load()
        .groupBy(col("properties")("event_type").as("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    "q_sketch_terms" -> ((s, dir) => {
      // mergeable Count-Min term frequencies; point estimates read from the
      // KB-sized sketch, never from the data. FULL-oracle form: the output
      // is the DuckDB-verifiable property, not the library-specific
      // estimate — exact per-term counts plus the CMS guarantee
      // (exact <= est <= exact + eps*N at the configured confidence)
      // rendered as a boolean that must hash-match literal true
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val cms = operators.Sketches.termFrequencySketch(docs, "text")
        .head().getAs[Array[Byte]]("cms")
      val terms = Seq("data", "key", "spark", "table", "value")
      val est = operators.Sketches.estimateTermCounts(cms, terms).toSeq
        .toDF("term", "est_count")
      val words = docs.select(explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
      val totalTerms = words.count()
      val exact = words.filter(col("term").isin(terms: _*))
        .groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
      val epsBound =
        math.ceil(operators.Sketches.DefaultCmsEps * totalTerms).toLong
      est.join(exact, Seq("term"))
        .select(col("term"), col("n_exact"),
          (col("est_count") >= col("n_exact") &&
            col("est_count") <= col("n_exact") + epsBound).as("within_bounds"))
        .orderBy(col("term"))
    }),

    "q_catalog_roundtrip" -> ((s, dir) => {
      // the pure-SQL lifecycle: CREATE a log as a catalog table, INSERT the
      // events table into it with explicit partition routing, aggregate it
      // back — planning through the same DSv2 Table as the format() path
      s.conf.set("spark.sql.catalog.graft", "graft.sources.EventLogCatalog")
      val hub = "catrt" + java.util.UUID.randomUUID().toString.replace("-", "")
      s.sql(s"CREATE TABLE graft.$hub TBLPROPERTIES ('partitions'='4')")
      Tables.events(s, dir).createOrReplaceTempView(s"${hub}_src")
      s.sql(s"""INSERT INTO graft.$hub
                SELECT props AS body, CAST(event_id % 4 AS STRING) AS partition
                FROM ${hub}_src""")
      s.sql(s"""SELECT partition, count(*) AS n FROM graft.$hub
                GROUP BY partition ORDER BY partition""")
    }),

    "q_sink_foreach" -> ((s, dir) => {
      // ForeachWriter sink (ref S11): stream the log through the row-typed
      // foreach writer into a fresh hub, routed by explicit partition id so
      // per-partition counts are deterministic, then read it back
      val hub = "fe-" + java.util.UUID.randomUUID().toString
      GraftEventLog.create(hub, 4)
      val q = s.readStream.format(GraftEventLog.Format)
        .option("path", mid(dir)).option("partitions", "4")
        .option("maxEventsPerTrigger", Long.MaxValue.toString)
        .load()
        .select(col("body").cast("string").as("body"), col("partition"))
        .writeStream.foreach(graft.streaming.StreamOps.foreachRowWriter(hub))
        .trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
      GraftEventLog.read(s, hub)
        .groupBy(col("partition")).agg(count(lit(1)).as("n"))
        .orderBy(col("partition"))
    }),

    "q_stream_window" -> ((s, dir) => {
      val out = "sw_" + java.util.UUID.randomUUID().toString.replace("-", "")
      // stateful streaming sizing: state partitions matched to the
      // 4-partition source (not the batch-side shuffle width), and one
      // large batch — every extra micro-batch is a full state-commit round
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = s.readStream.format(GraftEventLog.Format)
          .option("path", mid(dir)).option("partitions", "4")
          .option("maxEventsPerTrigger", Long.MaxValue.toString)
          .load()
          .withWatermark("enqueuedTime", "1 hour")
          .groupBy(window(col("enqueuedTime"), "6 hours").as("w"),
            col("properties")("event_type").as("event_type"))
          .agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(out).outputMode("complete")
          .trigger(Trigger.AvailableNow()).start()
        awaitOrFail(q)
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(out)
        .select(col("w.start").as("window_start"), col("event_type"), col("n"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // ---- composed relational operators Spark lacks natively ----
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      operators.Relational.asofJoin(clicks, views, "user_id", "ts",
          Map("value" -> "view_value"))
        .select(col("event_id"), col("user_id"), col("view_value"))
        .orderBy(col("event_id"))
    }),

    "q_stream_asof" -> ((s, dir) => {
      // streaming AS-OF enrichment (trades/quotes): clicks flow through the
      // graft sink into a log (ts as micros in properties — exact
      // roundtrip), stream back in admission-controlled micro-batches, and
      // each batch carries the latest at-or-before view value per user from
      // the STATIC views dimension. Per-row stateless w.r.t. the stream ⇒
      // any trigger slicing unions to the batch asofJoin, so q_asof_join's
      // oracle gates the streaming path on the same slicing argument
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val logName = sharedLog(dir, "clicks") { name =>
        clicks.select(col("event_id").cast("string").cast("binary").as("body"),
            map(lit("event_id"), col("event_id").cast("string"),
              lit("user_id"), col("user_id").cast("string"),
              lit("ts_us"), unix_micros(col("ts")).cast("string")).as("properties"))
          .write.format(GraftEventLog.Format)
          .option("name", name).option("partitions", "4").mode("append").save()
      }
      val nClicks = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (nClicks + 3) / 4)
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("event_id").cast("long").as("event_id"),
          col("properties")("user_id").cast("long").as("user_id"),
          timestamp_micros(col("properties")("ts_us").cast("long")).as("ts"))
      val outDir = scratchDir(s"sa_out_$tag")
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = streaming.StreamOps.asofEnrichStream(stream, views,
            "user_id", "ts", Map("value" -> "view_value")) { (res, epochId) =>
          res.write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
        }.trigger(Trigger.AvailableNow()).start()
        awaitOrFail(q)
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.read.parquet(outDir)
        .select(col("event_id"), col("user_id"), col("view_value"))
        .orderBy(col("event_id"))
    }),

    "q_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
      operators.Relational.rangeJoinMicros(clicks, errors, "ts_us", "ts_us",
          300L * 1000000L)
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("l_event_id")).as("n_clicks_matched"))
    }),

    // ---- dedup operators ----
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exact(Tables.documents(s, dir), Seq(col("text")), col("doc_id"))
        .select(md5(col("text").cast("binary")).as("text_md5"),
          col("keeper"), col("n_dups"))
        .orderBy(col("text_md5"))
    }),

    "q_dedup_exact_rows" -> ((s, dir) => {
      // surviving-rows variant of exact dedup: the full row of each
      // deterministic keeper (min doc_id per distinct text)
      Dedup.exactRows(Tables.documents(s, dir), Seq(col("text")), col("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "q_dedup_ngram" -> ((s, dir) => {
      ngramPairsShared(s, dir).orderBy(col("doc_a"), col("doc_b"))
    }),

    "q_dedup_minhash" -> ((s, dir) => {
      Dedup.minHashLshPairs(Tables.documents(s, dir), "doc_id", "text",
          k = 3, numHashes = 64, bands = 16, threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q_dedup_simhash" -> ((s, dir) => {
      // default banding: 4 chunks x 16 bits, complete for hamming <= 3 —
      // the band widths that stay discriminative at corpus scale
      Dedup.simHashPairs(Tables.documents(s, dir), "doc_id", "text", k = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q_dedup_embedding" -> ((s, dir) => {
      Dedup.embeddingCosinePairs(Tables.embeddings(s, dir), "vec_id", "embedding",
          threshold = 0.4, bands = 12, bitsPerBand = 5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_dedup_paragraphs" -> ((s, dir) => {
      // paragraph-level dedup + reassembly. The synthetic corpus has no
      // newlines, so the gate segments each document into fixed 10-token
      // windows (identically in the oracle) and rejoins survivors with a
      // space; compare on the md5 of the rewritten text
      val d = Tables.documents(s, dir)
      val wrds = split(col("text"), " ")
      val nc = floor((size(wrds) + lit(9)).cast("double") / 10).cast("int")
      val paras = transform(sequence(lit(0), nc - 1),
        i => array_join(slice(wrds, i * 10 + 1, lit(10)), " "))
      Dedup.dedupParagraphs(d, "doc_id", "text", paras, joinWith = " ")
        .select(col("doc_id"), md5(col("text").cast("binary")).as("text_md5"),
          col("n_paras"), col("n_kept"))
        .orderBy(col("doc_id"))
    }),

    "q_dedup_scrub" -> ((s, dir) => {
      // ExactSubstr REMOVAL: 5-word spans seen earlier anywhere in the
      // corpus are spliced out; compare the rewritten text by md5
      Dedup.removeDuplicateSpans(Tables.documents(s, dir), "doc_id", "text", k = 5)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("text_md5"),
          col("n_words"), col("n_removed"))
        .orderBy(col("doc_id"))
    }),

    "q_dedup_normalized" -> ((s, dir) => {
      // fuzzy-exact dedup over normalizeText. The synthetic corpus has no
      // reformatted copies, so the gate PLANTS one per document (uppercased,
      // extra punctuation/whitespace, id offset +100000) — identically in
      // the oracle — and groups by the md5 of the normalized text: every
      // group must collapse to the original (min id) with its variant
      // counted
      val d0 = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val planted = d0.select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("  "), upper(col("text")), lit(" !! ")).as("text"))
      d0.unionByName(planted)
        .select(col("doc_id"),
          md5(TextFunctions.normalizeText(col("text")).cast("binary")).as("h"))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_variants"))
        .orderBy(col("h"))
    }),

    "q_dedup_incremental" -> ((s, dir) => {
      // cross-batch incremental dedup: the corpus is persisted once as a
      // 16-byte/row content-hash index, then a new batch dedups against it
      // without rescanning the corpus. The batch is planted (identically in
      // the oracle): even ids re-send an already-admitted text (must drop),
      // odd ids carry a genuinely new suffix (must survive)
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val path = hashIndexShared(s, dir, () => {
        val p = scratchDir("graft-hash-idx")
        Dedup.saveHashIndex(docs, Seq(col("text")), p)
        p
      })
      val batch = docs.select((col("doc_id") + 200000L).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" batch2 #"), col("doc_id")))
          .as("text"))
      Dedup.dedupAgainstHashIndex(batch, Seq(col("text")), path)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "q_dedup_incremental_neardup" -> ((s, dir) => {
      // the near-dup half of the incremental story: the corpus is indexed
      // once (MinHash bands + FNV shingle hashes), then a new batch probes
      // it — paraphrased re-crawls (first word dropped, ids ≡ 0 mod 13)
      // drop; genuinely new docs (reversed word order) survive
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val path = minHashIndexPaths.getOrBuild(s, dir, () => {
        val p = scratchDir("graft-mh-idx")
        Dedup.saveMinHashIndex(d, "doc_id", "text", p)
        p
      })
      val w = TextFunctions.words(col("text"))
      val batch = d.select((col("doc_id") + 300000L).as("doc_id"),
        when(col("doc_id") % 13 === 0,
            concat_ws(" ", slice(w, lit(2), size(w) - 1)))
          .otherwise(concat_ws(" ", reverse(w))).as("text"))
      Dedup.dedupAgainstMinHashIndex(batch, "doc_id", "text", path)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "q_stream_dedup_incremental" -> ((s, dir) => {
      // continuous-ingestion dedup: the corpus's hash index is built FRESH
      // each run (the stream APPENDS admitted hashes — reusing the shared
      // q_dedup_incremental index would leak state between runs), the
      // planted batch streams through the connector in admission-capped
      // micro-batches, and every epoch anti-joins + admits. No two stream
      // rows share a text, so the survivor set is trigger-slicing invariant
      // and the batch operator's SQL (q_dedup_incremental) gates it exactly
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val idxPath = scratchDir("graft-hash-sidx")
      Dedup.saveHashIndex(docs, Seq(col("text")), idxPath)
      val batch = docs.select((col("doc_id") + 200000L).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" batch2 #"), col("doc_id")))
          .as("text"))
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val logName = "sdi_" + tag
      val outDir = scratchDir(s"sdi_out_$tag")
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      batch.select(col("text").cast("binary").as("body"),
          map(lit("doc_id"), col("doc_id").cast("string")).as("properties"))
        .write.format(GraftEventLog.Format)
        .option("name", logName).option("partitions", "4").mode("append").save()
      // everything after log creation is guarded: a failure must still drop
      // the in-memory log and the (corpus-scale) temp hash index
      try {
        val nBatch = GraftEventLog.count(logName)
        val perTrigger = math.max(256L, (nBatch + 3) / 4)
        val stream = s.readStream.format(GraftEventLog.Format)
          .option("name", logName)
          .option("maxEventsPerTrigger", perTrigger.toString)
          .load()
          .select(col("properties")("doc_id").cast("long").as("doc_id"),
            col("body").cast("string").as("text"))
        s.conf.set("spark.sql.shuffle.partitions", "4")
        val q = Dedup.dedupStreamAgainstHashIndex(stream, Seq(col("text")),
            idxPath) { (survivors, epochId) =>
          // epoch-keyed overwrite: a retried epoch replaces its own output
          survivors.write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
        }.trigger(Trigger.AvailableNow()).start()
        awaitOrFail(q)
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prev)
        sources.EventLogRegistry.drop(logName)
        // the index was this run's scratch state (the stream appended to
        // it); only the parquet OUTPUT outlives the gate, as its result
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxPath))
        Dedup.forgetHashIndex(idxPath)
      }
      s.read.parquet(outDir).select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "q_stream_pipeline" -> ((s, dir) => {
      // THE deployment shape every piece exists for, composed END-TO-END
      // through the connector in ONE streaming query: per-row quality gate
      // (qualityReason — q_corpus_filter's exact rules) -> persisted-index
      // dedup admission (cross-run state, q_dedup_incremental's planted
      // construction) -> cumulative numeric drift HARD GATE over what was
      // admitted (driftSink with a finite maxPsi — a drifted feed KILLS
      // the query before the epoch lands). Every stage is trigger-slicing
      // invariant (stateless predicate; no two stream rows share a text;
      // exact integer histograms), so the full oracle replays all three
      // in SQL; the final cumulative PSI rides along as a constant column
      // every row must hash-match.
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val idxPath =
        scratchDir("graft-pipe-idx")
      Dedup.saveHashIndex(docs, Seq(col("text")), idxPath)
      val tracker = streaming.StreamOps.driftFit(
        docs.select(TextFunctions.tokenCount(col("text")).cast("double")
          .as("n_tok")),
        "n_tok", lo = 0.0, hi = 128.0, buckets = 16)
      val batch = docs.select((col("doc_id") + 200000L).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" batch2 #"), col("doc_id")))
          .as("text"))
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val logName = "spipe_" + tag
      val outDir =
        scratchDir(s"spipe_out_$tag")
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      batch.select(col("text").cast("binary").as("body"),
          map(lit("doc_id"), col("doc_id").cast("string")).as("properties"))
        .write.format(GraftEventLog.Format)
        .option("name", logName).option("partitions", "4").mode("append").save()
      try {
        val nBatch = GraftEventLog.count(logName)
        val perTrigger = math.max(256L, (nBatch + 3) / 4)
        val stream = s.readStream.format(GraftEventLog.Format)
          .option("name", logName)
          .option("maxEventsPerTrigger", perTrigger.toString)
          .load()
          .select(col("properties")("doc_id").cast("long").as("doc_id"),
            col("body").cast("string").as("text"))
          .filter(operators.CorpusOps.qualityReason(col("text"),
            20, 80, "en", 0.5, 0.75) === "keep")
        s.conf.set("spark.sql.shuffle.partitions", "4")
        val drift = streaming.StreamOps.driftSink(tracker, "n_tok",
          maxPsi = 100.0)
        val q = Dedup.dedupStreamAgainstHashIndex(stream, Seq(col("text")),
            idxPath) { (survivors, epochId) =>
          val admitted = survivors.select(col("doc_id"),
            TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
          // HARD GATE fires before the epoch's output lands: a drifted
          // feed stops the pipeline, not just flags it afterwards
          drift(admitted.select(col("n_tok").cast("double").as("n_tok")),
            epochId)
          admitted.write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
        }.trigger(Trigger.AvailableNow()).start()
        awaitOrFail(q)
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prev)
        sources.EventLogRegistry.drop(logName)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxPath))
        Dedup.forgetHashIndex(idxPath)
      }
      import s.implicits._
      val psiTotal = operators.Validation.distributionDriftFromCounts(
          tracker.counts.toDF("bucket", "n_ref", "n_cur"), 0.0, 128.0, 16)
        .agg(sum(col("psi"))).head().getDouble(0)
      s.read.parquet(outDir)
        .select(col("doc_id"), col("n_tok"))
        .withColumn("psi_r", TextFunctions.stableRound(lit(psiTotal), 6))
        .orderBy(col("doc_id"))
    }),

    "q_dedup_semantic" -> ((s, dir) => {
      // SemDeDup (k-means cells -> within-cell cosine pruning). The
      // synthetic vectors are near-orthogonal (max pairwise cosine ~0.6),
      // so the gate PLANTS a near-dup per vector — the doubled copy, id
      // +10000: cosine with the original is exactly 1 and cell assignment
      // is scale-invariant, so every planted row must drop and every
      // original survive. Centroids are stashed for the oracle rendering
      // (same technique as q_ann_ivf).
      val e0 = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val planted = e0.select((col("vec_id") + 10000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      val e = e0.unionByName(planted)
      val cents = Similarity.centroidsOf(e, "vec_id", "embedding", 16)
      semanticCentroidStash.set(cents)
      Similarity.semanticDedupWith(e, "vec_id", "embedding", cents,
          tau = 0.99, maxCellSize = 10000)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    "q_fuzzy_pairs" -> ((s, dir) => {
      // exact edit-distance near-dup discovery (PassJoin pigeonhole
      // blocking + banded levenshtein verify). Keys = first 40 chars; the
      // gate PLANTS a one-edit variant per doc (char 8 deleted, id
      // +200000) — identically in the oracle — so true pairs exist at
      // every SF. The doc_id cap bounds the ORACLE's length-banded
      // all-pairs verify, not the operator.
      val d0 = Tables.documents(s, dir).filter(col("doc_id") < 800)
        .select(col("doc_id"), substring(col("text"), 1, 40).as("key"))
      val planted = d0.select((col("doc_id") + 200000L).as("doc_id"),
        concat(substring(col("key"), 1, 7), substring(col("key"), 9, 32)).as("key"))
      operators.Fuzzy.fuzzyPairs(d0.unionByName(planted), "doc_id", "key",
          maxDist = 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_fuzzy_link" -> ((s, dir) => {
      // fuzzy record linkage: a dirty feed (one substitution typo — '#'
      // never occurs in the corpus — at char 12, id +500000) links back to
      // the clean catalog at maxDist 1
      val d0 = Tables.documents(s, dir).filter(col("doc_id") < 800)
        .select(col("doc_id"), substring(col("text"), 1, 40).as("key"))
      val dirty = d0.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 500000L).as("rec_id"),
          concat(substring(col("key"), 1, 11), lit("#"),
            substring(col("key"), 13, 28)).as("key"))
      operators.Fuzzy.fuzzyJoin(dirty, d0, "rec_id", "key", "doc_id", "key",
          maxDist = 1)
        .orderBy(col("id_l"), col("id_r"))
    }),

    "q_fuzzy_persisted" -> ((s, dir) => {
      // fuzzy linkage through the PERSISTED segment index: the catalog
      // was saved (evens) + appended (odds) into parquet once per sf dir;
      // the gate loads it — no re-fit — and probes the same dirty feed as
      // q_fuzzy_link, whose oracle gates the result unchanged. This is
      // the restart-survival contract: load + probe == fit + probe.
      val path = fuzzyIndexDir(s, dir)
      val d0 = Tables.documents(s, dir).filter(col("doc_id") < 800)
        .select(col("doc_id"), substring(col("text"), 1, 40).as("key"))
      val dirty = d0.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 500000L).as("rec_id"),
          concat(substring(col("key"), 1, 11), lit("#"),
            substring(col("key"), 13, 28)).as("key"))
      val fitted = operators.Fuzzy.loadFuzzyIndex(s, path)
      try operators.Fuzzy.fuzzyJoinWith(fitted, dirty, "rec_id", "key")
        .select(col("id_r").as("id_l"), col("id_l").as("id_r"), col("dist"))
        .orderBy(col("id_l"), col("id_r"))
        .localCheckpoint() // materialize before release drops the shares
      finally fitted.release()
    }),

    "q_embed_diversity" -> ((s, dir) => {
      // cluster-balanced diversity sampling: nearest-cell assignment plus a
      // deterministic per-cell cap — selection is a pure function of
      // (cell, id-hash), so the oracle replays it from the run's centroids
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val cents = Similarity.centroidsOf(e, "vec_id", "embedding", 16)
      diversityCentroidStash.set(cents)
      Similarity.diversitySampleWith(e, "vec_id", "embedding", cents, perCell = 20)
        .select(col("vec_id"), col("cell")).orderBy(col("vec_id"))
    }),

    "q_dedup_fuzzy" -> ((s, dir) => {
      // keep-one fuzzy dedup over the SAME planted corpus as
      // q_fuzzy_pairs: connected components over edit-distance<=2 edges,
      // smallest id survives (every planted variant collapses with its
      // original, plus any natural near-key clusters)
      val d0 = Tables.documents(s, dir).filter(col("doc_id") < 800)
        .select(col("doc_id"), substring(col("text"), 1, 40).as("key"))
      val planted = d0.select((col("doc_id") + 200000L).as("doc_id"),
        concat(substring(col("key"), 1, 7), substring(col("key"), 9, 32)).as("key"))
      Dedup.dedupByFuzzy(d0.unionByName(planted), "doc_id", "key", maxDist = 2)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "q_categorical_drift" -> ((s, dir) => {
      // categorical PSI drift of the source mix: the gate PLANTS a feed
      // going dark (odd-id snapshot drops src1 entirely) — identically in
      // the oracle; top-6 reference categories by (count desc, name asc),
      // the rest fold into __other__
      val d = Tables.documents(s, dir)
      val ref = d.filter(col("doc_id") % 2 === 0)
      val cur = d.filter(col("doc_id") % 2 === 1 && col("source") =!= "src1")
      operators.Validation.categoricalDrift(ref, cur, "source", topK = 6)
        .select(col("category"), col("n_ref"), col("n_cur"),
          TextFunctions.stableRound(col("p_ref"), 6).as("p_ref_r"),
          TextFunctions.stableRound(col("p_cur"), 6).as("p_cur_r"),
          TextFunctions.stableRound(col("psi"), 6).as("psi_r"))
        .orderBy(col("category"))
    }),

    "q_embed_drift" -> ((s, dir) => {
      // embedding-space drift between snapshots: the gate PLANTS a
      // re-scaled feed (odd vec_ids, labels >= 5: x*1.2 + 0.01 after the
      // double cast — identical arithmetic in the oracle) so drifted and
      // clean labels both appear; norms/cosine stableRound(4)ed (avg
      // summation order is engine-nondeterministic at ~1e-13)
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
      val ref = e.filter(col("vec_id") % 2 === 0)
      val cur = e.filter(col("vec_id") % 2 === 1)
        .withColumn("v", when(col("label") >= 5,
          transform(col("v"), x => x * 1.2 + 0.01)).otherwise(col("v")))
      operators.Similarity.embeddingDrift(ref, cur, "label", "v")
        .select(col("label"), col("n_ref"), col("n_cur"),
          TextFunctions.stableRound(col("norm_ref"), 4).as("norm_ref_r"),
          TextFunctions.stableRound(col("norm_cur"), 4).as("norm_cur_r"),
          TextFunctions.stableRound(col("centroid_cos"), 4).as("cos_r"),
          col("dim_mismatch"))
        .orderBy(col("label"))
    }),

    // ---- similarity search ----
    "q_ann_bruteforce" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val qv = Similarity.vectorOf(e, "vec_id", "embedding", 0L)
      Similarity.bruteForceTopK(e, "vec_id", "embedding", qv, k = 10, excludeId = Some(0L))
    }),

    "q_ann_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val qv = Similarity.vectorOf(e, "vec_id", "embedding", 0L)
      // 6-bit buckets + 3 margin-ranked probes: ~6% of the corpus scanned
      // per query at sf0.1 while keeping enough candidates for a full top-10.
      // Runs through the PERSISTED index (built once per corpus, partitioned
      // by bucket) so each probe prunes unread buckets at file-listing level.
      val (buckets, bits, seed) = lshIndexShared(s, dir, () => {
        val p = scratchDir("graft-lsh-idx")
        Similarity.saveLshIndex(
          Similarity.lshIndex(e, "vec_id", "embedding", numBits = 6, seed = 42L),
          numBits = 6, seed = 42L, p)
        Similarity.loadLshIndex(s, p) // params roundtrip, once
      })
      Similarity.lshTopKWith(buckets, bits, seed,
        qv, k = 10, multiProbe = 3, excludeId = Some(0L))
    }),

    "q_knn_join" -> ((s, dir) => {
      // exact k-NN JOIN: 8 query vectors x whole corpus, top-5 each
      val e = Tables.embeddings(s, dir)
      Similarity.knnJoin(e.filter(col("vec_id") < 8), "vec_id", "embedding",
          e, "vec_id", "embedding", k = 5)
        .orderBy(col("query_id"), col("rk"))
    }),

    "q_knn_join_lsh" -> ((s, dir) => {
      // bucketed k-NN join (full oracle: sqlKnnJoinLsh renders the identical
      // plane arithmetic; recall vs exact additionally pinned in tests)
      val e = Tables.embeddings(s, dir)
      Similarity.knnJoinLsh(e.filter(col("vec_id") < 8), "vec_id", "embedding",
          e, "vec_id", "embedding", k = 5, numBits = 6)
        .orderBy(col("query_id"), col("rk"))
    }),

    "q_ann_recall" -> ((s, dir) => {
      // recall@k harness: LSH-bucketed k-NN measured against the exact join
      // — the acceptance metric for every index/probe/quantization tradeoff
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
      val exact = Similarity.knnJoin(q, "vec_id", "embedding",
        e, "vec_id", "embedding", k = 5)
      val approx = Similarity.knnJoinLsh(q, "vec_id", "embedding",
        e, "vec_id", "embedding", k = 5, numBits = 6)
      Similarity.recallAtK(exact, approx, k = 5).orderBy(col("query_id"))
    }),

    "q_embed_quantize" -> ((s, dir) => {
      // int8 embedding compression: integer-exact per-vector checksums
      // (sum, position-weighted sum, max code) + the stably-rounded scale —
      // the quantization arithmetic verified bit-for-bit against DuckDB;
      // ranking quality under dequantization is pinned in SimilaritySpec
      val e = Tables.embeddings(s, dir)
      e.select(col("vec_id"),
          Similarity.quantizeInt8(col("embedding")).as("q"),
          Similarity.int8Scale(col("embedding")).as("scale"))
        .select(col("vec_id"),
          aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long")).as("q_sum"),
          aggregate(zip_with(col("q"), sequence(lit(1), size(col("q"))),
              (qi, i) => qi.cast("long") * i.cast("long")),
            lit(0L), (a, x) => a + x).as("q_wsum"),
          array_max(col("q")).cast("int").as("q_max"),
          TextFunctions.stableRound(col("scale"), 6).as("scale_r"))
        .orderBy(col("vec_id"))
    }),

    "q_ann_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val qv = Similarity.vectorOf(e, "vec_id", "embedding", 0L)
      // the fit is memoized; stashing the centroids the gate ACTUALLY used
      // lets oracleSql (dumped by Verify after the queries ran) render them
      // as literals — scoring/probing/assignment then oracle exactly, with
      // only the iterative-FP k-means fit itself unoracled
      val cents = Similarity.centroidsOf(e, "vec_id", "embedding", 16)
      ivfCentroidStash.set(cents)
      val idx = Similarity.ivfIndexWith(e, "vec_id", "embedding", cents)
      Similarity.ivfTopKWith(idx, cents, qv, k = 10, nProbe = 4,
        excludeId = Some(0L))
    }),

    "q_sketch_distinct" -> ((s, dir) => {
      // HLL sketches (DataSketches family): mergeable approximate distinct
      // counts. FULL-oracle form (same technique as q_sketch_terms): output
      // the DuckDB-verifiable property — exact distinct counts plus a
      // within-5% boolean for the estimate (lgConfigK=12 gives ~1% relative
      // standard error, so 5% is a hard failure signal, not flake room)
      val li = Tables.lineitem(s, dir)
      val approx = operators.Sketches.distinctSketch(
        li, Seq(col("l_returnflag")), col("l_partkey"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      approx.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double") <=
            col("n_exact").cast("double") * 0.05).as("within_5pct"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- text analysis ----
    "q_text_stats" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), TextFunctions.tokenCount(col("text")).as("n_tok"),
          col("n_chars"), TextFunctions.punctCount(col("text")).as("n_punct"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          TextFunctions.stableRound(avg(col("n_tok")), 4).as("avg_tokens"),
          TextFunctions.stableRound(avg(col("n_chars")), 4).as("avg_chars"),
          sum(col("n_punct")).as("total_punct"))
        .orderBy(col("lang"))
    }),

    "q_text_langid" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(TextFunctions.langIdGuess(col("text")).as("guess"))
        .groupBy(col("guess")).agg(count(lit(1)).as("n"))
        .orderBy(col("guess"))
    }),

    "q_corpus_report" -> ((s, dir) => {
      // dataset-card summary per source
      operators.CorpusOps.corpusReport(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("source"))
    }),

    "q_corpus_importance" -> ((s, dir) => {
      // DSIR importance weights: English docs as the target distribution,
      // hashed unigram+bigram multinomials, power-of-two bucket mask
      val docs = Tables.documents(s, dir)
      operators.CorpusOps.importanceWeights(
          docs, docs.filter(col("lang") === "en"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q_corpus_importance_sample" -> ((s, dir) => {
      // DSIR selection: deterministic Gumbel top-k over the weights
      val docs = Tables.documents(s, dir)
      operators.CorpusOps.importanceSample(
        docs, docs.filter(col("lang") === "en"), "doc_id", "text", n = 50)
    }),

    "q_corpus_select_quantile" -> ((s, dir) => {
      // FineWeb-Edu-style selection: keep each source's top quarter by the
      // stableRound(4)ed quality score — the per-group cut resolves from a
      // bounded (group, score) histogram, never a per-group sort of the rows
      val d = Tables.documents(s, dir).withColumn("score",
        TextFunctions.stableRound(TextFunctions.qualityScore(col("text")), 4))
      operators.CorpusOps.selectTopShareByGroup(d, "source", "score", topPermille = 250)
        .select(col("doc_id"), col("source"), col("score"))
        .orderBy(col("doc_id"))
    }),

    "q_dedup_paragraphs_doc" -> ((s, dir) => {
      // within-doc repeated-paragraph cleanup: plant each document's own
      // text as a duplicate second paragraph plus a unique tail
      // (identically in the oracle); the cleanup is a zero-shuffle scan
      val planted = Tables.documents(s, dir).select(col("doc_id"),
        concat_ws("\n", col("text"), col("text"),
          concat(lit("tail "), col("doc_id").cast("string"))).as("text"))
      Dedup.dedupParagraphsWithinDoc(planted, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q_text_nfc" -> ((s, dir) => {
      // Unicode NFC: plant a decomposed e + COMBINING ACUTE suffix on ids
      // ≡ 0 (mod 4); after normalization it is byte-identical to the
      // precomposed form, so content hashes and dedup see one spelling
      val nfc = graft.functions.hashFunctions.nfc_normalize _
      val planted = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 4 === 0, lit(" cafe\u0301"))
            .otherwise(lit(""))).as("text"))
      planted.select(col("doc_id"), nfc(col("text")).as("text"),
          (nfc(col("text")) =!= col("text")).as("changed"))
        .orderBy(col("doc_id"))
    }),

    "q_quality_classifier" -> ((s, dir) => {
      // FineWeb-style classifier loop, train+score in one plan: Naive Bayes
      // log-odds fit on the corpus's own language labels (en = positive),
      // every document scored by its summed token log-odds
      operators.CorpusOps.naiveBayesScore(Tables.documents(s, dir),
          "doc_id", "text", positive = col("lang") === "en")
        .orderBy(col("doc_id"))
    }),

    "q_text_encoding" -> ((s, dir) => {
      // encoding-damage profile: plant deterministic mojibake — a U+FFFD
      // replacement char, a BEL control char, a Latin-1 e-acute — identically
      // in the oracle; the profile itself is a zero-shuffle scan
      val planted = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0, lit("\uFFFD")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit("\u0007")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit("\u00e9")).otherwise(lit(""))).as("text"))
      operators.CorpusOps.encodingProfile(planted, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q_pipeline_curation" -> ((s, dir) => {
      // the round's NEW curation stages composed into ONE Catalyst plan:
      // plant unicode damage (decomposed suffix, ids ≡0 mod 4) and
      // intra-doc repetition (self-copied paragraph, ids ≡0 mod 3), then
      // NFC-normalize → drop repeated paragraphs → quality-score → keep
      // each source's top half → assign content-hash splits
      val base = concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(" cafe\u0301")).otherwise(lit("")))
      val planted = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        when(col("doc_id") % 3 === 0, concat_ws("\n", base, base))
          .otherwise(base).as("text"))
      val cleaned = operators.Corpus(planted)
        .normalizeUnicode().dedupParagraphsWithinDoc().df
      val scored = cleaned.withColumn("score",
        TextFunctions.stableRound(TextFunctions.qualityScore(col("text")), 4))
      val selected = operators.CorpusOps.selectTopShareByGroup(
        scored, "source", "score", topPermille = 500)
      operators.Sampling.hashSplit(selected, col("text"), SplitWeights)
        .select(col("doc_id"), col("source"), col("score"), col("split"))
        .orderBy(col("doc_id"))
    }),

    "q_corpus_diversity" -> ((s, dir) => {
      // distinct-n per source: the template-repetition / memorization
      // signal; shuffle rows are (source, 8-byte shingle hash) only
      operators.CorpusOps.ngramDiversity(Tables.documents(s, dir),
        "text", "source", n = 3).orderBy(col("source"))
    }),

    "q_corpus_vocab_drift" -> ((s, dir) => {
      // vocabulary-level dataset versioning over q_corpus_diff's snapshots:
      // top-30 terms by relative-frequency movement between old and new
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val oldSnap = d.filter(col("doc_id") % 7 =!= 0)
      val newSnap = d.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      operators.CorpusOps.vocabularyDrift(oldSnap, newSnap, "doc_id", "text", topK = 30)
    }),

    "q_corpus_split_safe" -> ((s, dir) => {
      // leakage-safe split: near-dup clusters (q_dedup_clusters' memoized
      // components) travel to one split together; docs without a near-dup
      // split on their own id
      operators.Sampling.leakageSafeSplitWith(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "doc_id", clustersShared(s, dir), SplitWeights)
        .select(col("doc_id"), col("split_rep"), col("split"))
        .orderBy(col("doc_id"))
    }),

    "q_corpus_diff" -> ((s, dir) => {
      // dataset versioning: two snapshots derived deterministically from the
      // corpus (identically in the oracle) — old drops ids ≡0 (mod 7), new
      // drops ids ≡0 (mod 5) and rewrites text for ids ≡0 (mod 3)
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val oldSnap = d.filter(col("doc_id") % 7 =!= 0)
      val newSnap = d.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      operators.CorpusOps.corpusDiff(oldSnap, newSnap, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q_quality_features" -> ((s, dir) => {
      // one-scan classifier feature extraction, zero shuffle
      operators.CorpusOps.qualityFeatures(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q_quality_gopher" -> ((s, dir) => {
      // Gopher rule matrix, paper-default thresholds; ratio rules compare
      // stableRound(4)ed values so both engines make identical decisions
      operators.CorpusOps.gopherRules(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q_text_lm_bigram" -> ((s, dir) => {
      // interpolated bigram LM (lambda 0.7), fitted on the corpus itself
      operators.CorpusOps.bigramLmScore(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q_text_lm_bigram_capped" -> ((s, dir) => {
      // the 100 TB form: unigram vocabulary bounded to the top-64 terms
      // (threshold-histogram selection); OOV tokens take the add-one unseen
      // bound and unseen prev counts interpolate to the unigram term alone
      operators.CorpusOps.bigramLmScore(Tables.documents(s, dir), "doc_id", "text",
          vocabCap = 64)
        .orderBy(col("doc_id"))
    }),

    "q_text_quality" -> ((s, dir) => {
      // per-row scores are rounded then summed as DECIMAL: the float avg's
      // partial-aggregation order varies run to run, and stableRound only
      // fixes cross-engine rounding of the SAME double
      Tables.documents(s, dir)
        .select(col("source"),
          TextFunctions.stableRound(TextFunctions.qualityScore(col("text")), 6)
            .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("q"))
        .groupBy(col("source"))
        .agg(TextFunctions.stableRound(
            sum(col("q")).cast("double") / count(lit(1)), 6).as("avg_quality"),
          min(col("q")).cast("double").as("min_quality"),
          max(col("q")).cast("double").as("max_quality"))
        .orderBy(col("source"))
    }),

    "q_text_tokens" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"),
          TextFunctions.tokenCount(col("text")).as("ws_tok"),
          TextFunctions.bpeTokenCount(col("text")).as("bpe_tok"))
        .groupBy(col("lang"))
        .agg(sum(col("ws_tok")).as("total_ws_tokens"),
          sum(col("bpe_tok")).as("total_bpe_tokens"))
        .orderBy(col("lang"))
    }),

    "q_dedup_clusters" -> ((s, dir) => {
      clustersShared(s, dir).orderBy(col("doc_id"))
    }),

    "q_stream_dedup" -> ((s, dir) => {
      val out = "sd_" + java.util.UUID.randomUUID().toString.replace("-", "")
      // stateful dedup wants ONE large batch: every micro-batch commits
      // all state partitions, so the default 4k/trigger cap pays a
      // state-commit round per batch. AvailableNow already snapshots the
      // end offsets, so an unbounded budget means exactly one batch at any
      // scale factor. State partitions sized to the 4-partition source.
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = s.readStream.format(GraftEventLog.Format)
          .option("path", mid(dir)).option("partitions", "4")
          .option("maxEventsPerTrigger", Long.MaxValue.toString)
          .load()
          .select(col("properties")("event_type").as("event_type"),
            col("body").cast("string").as("props"),
            col("enqueuedTime"))
          .withWatermark("enqueuedTime", "90 days")
          .dropDuplicates("event_type", "props")
          .groupBy(col("event_type")).agg(count(lit(1)).as("n_distinct"))
          .writeStream.format("memory").queryName(out).outputMode("complete")
          .trigger(Trigger.AvailableNow()).start()
        awaitOrFail(q)
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(out).orderBy(col("event_type"))
    }),

    "q_stream_enrich" -> ((s, dir) => {
      // stream-static join: the event stream enriched against a static
      // dimension via broadcast (no shuffle of the stream side, no state)
      val dim = Tables.events(s, dir).groupBy(col("event_type"))
        .agg(round(avg(col("value")), 4).as("type_avg_value"))
      val out = "se_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = s.readStream.format(GraftEventLog.Format)
          .option("path", mid(dir)).option("partitions", "4")
          .option("maxEventsPerTrigger", Long.MaxValue.toString)
          .load()
          .select(col("properties")("event_type").as("event_type"))
          .join(broadcast(dim), "event_type")
          .groupBy(col("event_type"), col("type_avg_value"))
          .agg(count(lit(1)).as("n_events"))
          .writeStream.format("memory").queryName(out).outputMode("complete")
          .trigger(Trigger.AvailableNow()).start()
        awaitOrFail(q)
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(out)
        .select(col("event_type"), col("n_events"), col("type_avg_value"))
        .orderBy(col("event_type"))
    }),

    "q_stream_decontaminate" -> ((s, dir) => {
      // streaming decontamination: corpus documents flow through the graft
      // SINK into a log, stream back out in admission-controlled
      // micro-batches, and every batch joins the static benchmark shingle
      // index. Per-batch stateless, so the union over any trigger slicing
      // equals the batch operator (q_corpus_decontaminate's oracle gates it)
      val docs = Tables.documents(s, dir)
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val logName = sharedDocsLog(s, dir, withId = true, dropSrc0 = true)
      // several micro-batches at ANY scale factor: the per-batch fixed cost
      // (trigger planning + one join job) must not dominate at large sf, so
      // the admission cap scales with the corpus instead of being absolute
      // (~4 batches: enough to prove trigger-slicing invariance, without
      // paying 2x the AvailableNow session churn 8 batches cost — the
      // operators under test are per-batch stateless either way). Sized
      // from the log's own bounds — pure metadata (per-partition seqNo
      // sums), NOT a Spark job over the corpus
      val nCorpus = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (nCorpus + 3) / 4)
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("doc_id").cast("long").as("doc_id"),
          col("body").cast("string").as("text"))
      val outDir = scratchDir(s"sdc_out_$tag")
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        // foreachBatch is at-least-once: a retried epoch must not duplicate
        // report rows, so each epoch writes to its own overwritten subdir —
        // the retry replaces its previous (possibly partial) output instead
        // of appending alongside it
        val q = operators.CorpusOps.decontaminateStream(
            stream, docs.filter(col("source") === "src0"),
            "doc_id", "text", k = 3, minShared = 2) { (report, epochId) =>
          report.write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
        }.trigger(Trigger.AvailableNow()).start()
        awaitOrFail(q)
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.read.parquet(outDir)
        .select(col("doc_id"), col("n_bench_matched"), col("top_shared"))
        .orderBy(col("doc_id"))
    }),

    "q_stream_quality" -> ((s, dir) => {
      // streaming Gopher quality matrix: documents stream back out of the
      // graft log in admission-controlled micro-batches and every batch
      // runs the shuffle-free rule matrix. Per-ROW stateless — any trigger
      // slicing unions to the batch operator, so q_quality_gopher's oracle
      // gates it unchanged
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val logName = sharedDocsLog(s, dir, withId = true)
      val nCorpus = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (nCorpus + 3) / 4)
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("doc_id").cast("long").as("doc_id"),
          col("body").cast("string").as("text"))
      val outDir = scratchDir(s"sq_out_$tag")
      val q = stream.writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epochId: Long) =>
          operators.CorpusOps.gopherRules(batch, "doc_id", "text")
            .write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
          ()
      }.trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
      s.read.parquet(outDir).drop("epoch").orderBy(col("doc_id"))
    }),

    "q_stream_classifier" -> ((s, dir) => {
      // online crawl scoring: the Naive Bayes weights fit ONCE on the
      // static corpus, then documents stream back out of the graft log in
      // admission-controlled micro-batches and each batch scores against
      // those fixed weights. Per-row stateless ⇒ any trigger slicing unions
      // to the batch operator, and fit+apply == composed train+score
      // (CorpusOpsSpec pins it), so q_quality_classifier's oracle gates it
      val docs = Tables.documents(s, dir)
      val (w, bias, oov) = operators.CorpusOps.naiveBayesFit(
        docs, "doc_id", "text", col("lang") === "en")
      val weights = Dedup.lazyShare(w)
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val logName = sharedDocsLog(s, dir, withId = true)
      val nCorpus = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (nCorpus + 3) / 4)
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("doc_id").cast("long").as("doc_id"),
          col("body").cast("string").as("text"))
      val outDir = scratchDir(s"sc_out_$tag")
      val q = stream.writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epochId: Long) =>
          operators.CorpusOps.linearClassifierScore(
              batch, "doc_id", "text", weights, bias, oov)
            .write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
          ()
      }.trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
      s.read.parquet(outDir).drop("epoch").orderBy(col("doc_id"))
    }),

    "q_stream_bm25" -> ((s, dir) => {
      // streaming retrieval scoring: BM25 statistics (per-term df, N,
      // avgdl) fit ONCE on the static corpus, then documents stream out of
      // the graft log in admission-controlled micro-batches and each batch
      // scores against those fixed stats. Per-row stateless ⇒ any trigger
      // slicing unions to the batch scorer, so the full-corpus BM25 (sans
      // top-k cut) is the exact oracle
      val docs = Tables.documents(s, dir)
      val (dft, nDocs, avgdl) = operators.CorpusOps.bm25Fit(
        docs, "doc_id", "text", Bm25Query)
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val logName = sharedDocsLog(s, dir, withId = true)
      val nCorpus = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (nCorpus + 3) / 4)
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("doc_id").cast("long").as("doc_id"),
          col("body").cast("string").as("text"))
      val outDir = scratchDir(s"sb_out_$tag")
      val q = stream.writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epochId: Long) =>
          operators.CorpusOps.bm25ScoreWith(
              batch, "doc_id", "text", dft, nDocs, avgdl)
            .write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
          ()
      }.trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
      s.read.parquet(outDir).drop("epoch").orderBy(col("doc_id"))
    }),

    "q_stream_bm25_multi" -> ((s, dir) => {
      // fit-once MULTI-query streaming retrieval: the (query_id, term) /
      // df / (N, avgdl) state fits once on the static corpus, then each
      // micro-batch scores every (query, doc) pair against it. Per-row
      // stateless ⇒ any trigger slicing unions to bm25SearchMany's scores
      // (sans top-k cut), which is the exact oracle
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val (qt, dft, nDocs, avgdl) = operators.CorpusOps.bm25FitMany(
        docs, "doc_id", "text", Bm25Queries.toDF("query_id", "query_text"),
        "query_id", "query_text")
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val logName = sharedDocsLog(s, dir, withId = true)
      val nCorpus = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (nCorpus + 3) / 4)
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("doc_id").cast("long").as("doc_id"),
          col("body").cast("string").as("text"))
      val outDir = scratchDir(s"sbm_out_$tag")
      val q = stream.writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epochId: Long) =>
          operators.CorpusOps.bm25ScoreManyWith(
              batch, "doc_id", "text", qt, dft, nDocs, avgdl)
            .write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
          ()
      }.trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
      s.read.parquet(outDir).drop("epoch")
        .orderBy(col("query_id"), col("doc_id"))
    }),

    "q_stream_vocab" -> ((s, dir) => {
      // streaming heavy-hitter terms: a STATEFUL running token count over
      // documents flowing through the connector (the state store carries the
      // vocabulary across micro-batches); complete mode emits the final
      // counts, so the top-20 equals the batch vocabulary head exactly.
      // NB this complete-mode/full-vocabulary-state shape is the EQUALITY
      // HARNESS only — one state row per distinct token does not deploy at
      // 100 TB. The deployment shape is q_stream_vocab_sketch
      // (StreamOps.heavyHitterSink: bounded CMS + k candidates), gated
      // right below on the same shared log.
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val logName = sharedDocsLog(s, dir, withId = false)
      val nCorpus = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (nCorpus + 3) / 4)
      val out = "svout_" + tag
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = s.readStream.format(GraftEventLog.Format)
          .option("name", logName)
          .option("maxEventsPerTrigger", perTrigger.toString)
          .load()
          .select(explode(split(col("body").cast("string"), " ")).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(out).outputMode("complete")
          .trigger(Trigger.AvailableNow()).start()
        awaitOrFail(q)
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(out).orderBy(col("n").desc, col("token").asc).limit(20)
    }),

    "q_stream_vocab_sketch" -> ((s, dir) => {
      // the 100 TB form of q_stream_vocab: cross-batch state is a KB-sized
      // Count-Min sketch plus 20 candidate terms (StreamOps.heavyHitterSink),
      // never one state row per distinct token. DuckDB-checkable properties:
      // the exact top-5 terms' exact counts, each found in the sketch's
      // top-20, each estimate within the one-sided CMS bound — the
      // q_sketch_terms gating technique applied to the streaming tracker
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val logName = sharedDocsLog(s, dir, withId = false)
      val nCorpus = GraftEventLog.count(logName)
      val perTrigger = math.max(256L, (nCorpus + 3) / 4)
      val (tracker, fn) = streaming.StreamOps.heavyHitterSink("body", k = 20)
      val q = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .writeStream.foreachBatch(fn)
        .trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q)
      val inTopK = tracker.result.map(_._1).toSet
      val words = docs.select(explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
      val epsBound = math.ceil(
        operators.Sketches.DefaultCmsEps * words.count()).toLong
      val top5 = words.groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("term").asc).limit(5)
        .as[(String, Long)].collect()
      top5.toSeq.map { case (t, n) =>
        val est = tracker.estimate(t)
        (t, n, inTopK.contains(t), est >= n && est <= n + epsBound)
      }.toDF("term", "n_exact", "in_topk", "within_bounds")
        .orderBy(col("term"))
    }),

    "q_stream_knn" -> ((s, dir) => {
      // streaming vector-search enrichment: query vectors flow through the
      // graft sink into a log (doubles serialized shortest-roundtrip, so
      // the parse back is bit-identical), stream back in admission-
      // controlled micro-batches, and every batch takes exact top-k
      // neighbors from the STATIC corpus — a micro-batch is dimension-
      // table-sized, exactly knnJoin's broadcast contract. Per-query
      // stateless, so the union over ANY trigger slicing equals the batch
      // k-NN join and the batch oracle gates the streaming path.
      val e = Tables.embeddings(s, dir)
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val logName = "knn_" + tag
      // the streamed QUERY set is a fixed 128-vector slice: exact k-NN cost
      // is |queries| x |corpus| by contract, and the gate's point is the
      // streaming protocol (sink -> admission-controlled batches -> per-
      // batch join), not an all-pairs sweep that would grow quadratically
      // with the scale factor
      e.filter(col("vec_id") < 128).select(
          concat_ws(",", transform(col("embedding").cast("array<double>"),
            x => x.cast("string"))).cast("binary").as("body"),
          map(lit("vec_id"), col("vec_id").cast("string")).as("properties"))
        .write.format(GraftEventLog.Format)
        .option("name", logName).option("partitions", "4").mode("append").save()
      // ~4 micro-batches for the fixed 128-query slice (cap from log-bounds
      // metadata; the floor keeps degenerate tiny logs from one-row batches)
      val nVecs = GraftEventLog.count(logName)
      val perTrigger = math.max(32L, (nVecs + 3) / 4)
      val stream = s.readStream.format(GraftEventLog.Format)
        .option("name", logName)
        .option("maxEventsPerTrigger", perTrigger.toString)
        .load()
        .select(col("properties")("vec_id").cast("long").as("vec_id"),
          transform(split(col("body").cast("string"), ","),
            x => x.cast("double")).as("embedding"))
      val outDir = scratchDir(s"knn_out_$tag")
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = stream.writeStream.foreachBatch { (batch: DataFrame, epochId: Long) =>
          // epoch-keyed overwrite: foreachBatch is at-least-once, a retried
          // epoch replaces its own (possibly partial) output
          Similarity.knnJoin(batch, "vec_id", "embedding",
              e, "vec_id", "embedding", k = 3)
            .write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
          ()
        }.trigger(Trigger.AvailableNow()).start()
        awaitOrFail(q)
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prev)
        sources.EventLogRegistry.drop(logName)
      }
      s.read.parquet(outDir)
        .select(col("query_id"), col("vec_id"), col("cosine"), col("rk"))
        .orderBy(col("query_id"), col("rk"))
    }),

    "q_stream_join" -> ((s, dir) => {
      val out = "sj_" + java.util.UUID.randomUUID().toString.replace("-", "")
      runStreamIntervalJoin(s, dir, out, watermarkDelay = "1 hour", joinType = "inner")
      s.table(out).agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("c_pid"), col("c_seq")).as("n_clicks_matched"))
    }),

    "q_stream_join_outer" -> ((s, dir) => {
      // left-outer variant: unmatched clicks emit null-extended rows once
      // the watermark passes their join window (deterministic under
      // AvailableNow: final watermark = min across both streams' max event
      // times). The exploded banding copies collapse in the batch rollup.
      val out = "sjo_" + java.util.UUID.randomUUID().toString.replace("-", "")
      runStreamIntervalJoin(s, dir, out, watermarkDelay = "0 seconds",
        joinType = "left_outer")
      s.table(out)
        .groupBy(col("c_pid"), col("c_seq"))
        .agg(max(when(col("e_time").isNotNull, 1).otherwise(0)).as("m"),
          count(col("e_time")).as("pairs"))
        .agg(sum(col("pairs")).as("n_pairs"),
          sum(col("m")).as("n_matched_clicks"),
          sum(lit(1) - col("m")).as("n_null_only_clicks"))
    }),

    "q_stream_sessionize" -> ((s, dir) => {
      import s.implicits._
      // arbitrary-stateful sessionization (flatMapGroupsWithState) over a
      // file-source stream keyed by user; emits closed sessions only —
      // in-batch gap splits plus event-time-timeout flushes, so the result
      // is a pure function of the data and the final watermark
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = s.read.parquet(mid(dir)).schema
      val out = "ssz_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        // file-source streams need a directory basePath; the glob keeps the
        // listing to the events table inside the shared sf directory
        val src = s.readStream.schema(rawSchema).parquet(s"$dir/events*.parquet")
        val normalized = Tables.normalizeTs(src)
        val keyed = normalized
          .select(col("user_id").cast("string"), col("ts"))
          .as[(String, java.sql.Timestamp)]
        val q = graft.streaming.StreamOps.sessionize(keyed, 1800000L)
          .toDF()
          .writeStream.format("memory").queryName(out).outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        awaitOrFail(q)
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(out)
        .select(col("key").as("user_id"), col("nEvents").as("n_events"),
          col("startMs").as("session_start"), col("endMs").as("session_end"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    "q_text_vocab" -> ((s, dir) => {
      // corpus vocabulary head: token frequency with a total tiebreak order
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20)
    }),

    "q_text_tfidf" -> ((s, dir) => {
      // per-document distinctive terms: tf x raw idf, top 3 per doc
      operators.CorpusOps.tfIdfTopTerms(Tables.documents(s, dir), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("term"))
    }),

    "q_corpus_overlap" -> ((s, dir) => {
      // dataset-dedup triage: overlap of two snapshot slices by distinct
      // normalized-content hash — three count-distinct aggregations, no
      // corpus join (inclusion-exclusion gives the intersection)
      val d = Tables.documents(s, dir)
      operators.CorpusOps.corpusOverlap(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 3 === 0), "text")
    }),

    "q_corpus_overlap_sketch" -> ((s, dir) => {
      // the 100 TB repeated-triage form: per-snapshot HLL sketches merged
      // pairwise (KB-sized state, no corpus join). Gate technique =
      // q_sketch_distinct: output the DuckDB-verifiable exact counts plus
      // accuracy-bound booleans for the estimates (lgConfigK=12 is ~1%
      // relative standard error, so 5% is a failure signal, not flake room;
      // the intersection inherits both sides' errors, so its bound scales
      // with n_union)
      val d = Tables.documents(s, dir)
      val a = d.filter(col("doc_id") % 2 === 0)
      val b = d.filter(col("doc_id") % 3 === 0)
      val approx = operators.CorpusOps.corpusOverlapSketch(a, b, "text")
        .select(col("n_a").as("a_a"), col("n_b").as("a_b"),
          col("n_union").as("a_union"), col("n_intersect").as("a_intersect"))
      val exact = operators.CorpusOps.corpusOverlap(a, b, "text")
      exact.crossJoin(approx).select(
        col("n_a").as("n_a_exact"), col("n_b").as("n_b_exact"),
        col("n_union").as("n_union_exact"),
        col("n_intersect").as("n_intersect_exact"),
        (abs(col("a_a") - col("n_a")).cast("double") <=
          col("n_a").cast("double") * 0.05).as("a_within_5pct"),
        (abs(col("a_b") - col("n_b")).cast("double") <=
          col("n_b").cast("double") * 0.05).as("b_within_5pct"),
        (abs(col("a_union") - col("n_union")).cast("double") <=
          col("n_union").cast("double") * 0.05).as("union_within_5pct"),
        (abs(col("a_intersect") - col("n_intersect")).cast("double") <=
          col("n_union").cast("double") * 0.05).as("intersect_within_5pct_of_union"))
    }),

    "q_corpus_overlap_matrix" -> ((s, dir) => {
      // N-snapshot triage: each snapshot reduces ONCE to a persisted
      // KB-sized sketch file (saveOverlapSketch); ALL pairwise overlaps
      // then come from one plan over the sketch rows — zero corpus
      // rescans (corpusOverlapMatrix). Gate technique = the sketch gate's:
      // exact per-pair counts DuckDB-verified, 5%-bound booleans for the
      // sketch estimates. The sketch files are memoized per sf dir
      // (overlapSketchDir) — pure functions of the dir, so the gate's
      // subject is the matrix READ path, not N re-sketching jobs.
      val d = Tables.documents(s, dir)
      val preds = Seq("m2" -> 2, "m3" -> 3, "m5" -> 5)
      val base = overlapSketchDir(s, dir)
      val paths = preds.map { case (nm, _) => nm -> s"$base/$nm" }
      val matrix = operators.CorpusOps.corpusOverlapMatrix(s, paths)
      val exact = preds.combinations(2).map { case Seq((na, ma), (nb, mb)) =>
        operators.CorpusOps.corpusOverlap(
            d.filter(col("doc_id") % ma === 0),
            d.filter(col("doc_id") % mb === 0), "text")
          .select(lit(na).as("snap_a"), lit(nb).as("snap_b"),
            col("n_a").as("e_a"), col("n_b").as("e_b"),
            col("n_union").as("e_union"), col("n_intersect").as("e_intersect"))
      }.reduce(_ unionAll _)
      matrix.join(exact, Seq("snap_a", "snap_b"))
        .select(col("snap_a"), col("snap_b"),
          col("e_a").as("n_a_exact"), col("e_b").as("n_b_exact"),
          col("e_union").as("n_union_exact"),
          col("e_intersect").as("n_intersect_exact"),
          (abs(col("n_a") - col("e_a")).cast("double") <=
            col("e_a").cast("double") * 0.05).as("a_within_5pct"),
          (abs(col("n_b") - col("e_b")).cast("double") <=
            col("e_b").cast("double") * 0.05).as("b_within_5pct"),
          (abs(col("n_union") - col("e_union")).cast("double") <=
            col("e_union").cast("double") * 0.05).as("union_within_5pct"),
          (abs(col("n_intersect") - col("e_intersect")).cast("double") <=
            col("e_union").cast("double") * 0.05)
            .as("intersect_within_5pct_of_union"))
        .orderBy(col("snap_a"), col("snap_b"))
    }),

    "q_corpus_overlap_append" -> ((s, dir) => {
      // incremental snapshot lifecycle: m2app (save a quarter of the
      // corpus, append the remaining evens — appendToOverlapSketch) must
      // behave like the rebuilt full-save m2 of the same set. HLL union
      // IS set union, but NOT bit-identical estimation: a directly-built
      // sketch streams the HIP estimator while a union-built one answers
      // with the composite estimator, so the same set's estimates agree
      // only to within the sketch's error once past sparse mode (exact
      // equality held at sf0.001/0.01 and broke at sf0.1). The gate
      // therefore bounds: appended and union within 5% of the DuckDB
      // exact, and appended-vs-rebuilt within 2% of each other (both
      // describe ONE set; lgK=12 RSE is ~1%).
      val base = overlapSketchDir(s, dir)
      val m = operators.CorpusOps.corpusOverlapMatrix(s,
        Seq("m2" -> s"$base/m2", "m2app" -> s"$base/m2app"))
      val d = Tables.documents(s, dir)
      val evens = d.filter(col("doc_id") % 2 === 0)
      val exact = operators.CorpusOps.corpusOverlap(evens, evens, "text")
        .select(col("n_a").as("e_n"))
      m.crossJoin(exact).select(
        col("e_n").as("n_exact"),
        (abs(col("n_b") - col("e_n")).cast("double") <=
          col("e_n").cast("double") * 0.05).as("appended_within_5pct"),
        (abs(col("n_union") - col("e_n")).cast("double") <=
          col("e_n").cast("double") * 0.05).as("union_within_5pct"),
        (abs(col("n_a") - col("n_b")).cast("double") <=
          col("e_n").cast("double") * 0.02).as("append_matches_rebuilt"))
    }),

    "q_text_bm25" -> ((s, dir) => {
      // Okapi BM25 retrieval against a fixed query: token stream filtered
      // to the query terms before any shuffle, df/stats broadcast,
      // distributed top-k — the corpus-search / decontamination-triage
      // scorer (ordered by the output rank so the result is deterministic)
      operators.CorpusOps.bm25Search(Tables.documents(s, dir), "doc_id", "text",
          Bm25Query, k = 20)
        .orderBy(col("score").desc, col("doc_id").asc)
    }),

    "q_text_bm25_persisted" -> ((s, dir) => {
      // the persisted search-stats lifecycle: an index built INCREMENTALLY
      // (base snapshot of the evens + one appended epoch of the odds) must
      // reproduce the one-shot bm25Search over the same corpus EXACTLY —
      // df/N/total-length are exact mergeable sums, so the same full-hash
      // oracle as q_text_bm25 gates it. Index files memoized per sf dir
      // (a pure function of the dir — overlapSketchDir's rationale).
      val path = bm25StatsDir(s, dir)
      operators.CorpusOps.bm25SearchWithStats(Tables.documents(s, dir),
          "doc_id", "text", Bm25Query, path, k = 20)
        .orderBy(col("score").desc, col("doc_id").asc)
    }),

    "q_text_bm25_multi" -> ((s, dir) => {
      // multi-query BM25: a benchmark TABLE of queries scored in ONE corpus
      // pass — shared token/tf/df work, broadcast per-query fan-out, and a
      // WindowGroupLimit per-query top-k (each map task ships <= k rows per
      // query). The retrieval shape every eval-decontamination triage runs.
      import s.implicits._
      operators.CorpusOps.bm25SearchMany(Tables.documents(s, dir), "doc_id",
          "text", Bm25Queries.toDF("query_id", "query_text"),
          "query_id", "query_text", k = 10)
        .orderBy(col("query_id"), col("rnk"))
    }),

    "q_text_lm_score" -> ((s, dir) => {
      // CCNet-style unigram-LM quality: per-doc avg negative log-likelihood
      operators.CorpusOps.lmQualityScore(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q_text_ppl_buckets" -> ((s, dir) => {
      // CCNet head/middle/tail: equal-mass perplexity tiers cut at exact
      // integer-rank thresholds resolved from a bounded avg_nll histogram
      // (no global sort, no float interpolation)
      operators.CorpusOps.perplexityBuckets(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q_text_lm_capped" -> ((s, dir) => {
      // the 100 TB form of the unigram LM: vocabulary bounded to the top-64
      // terms by (count desc, term asc) via the threshold-histogram
      // selection (no global sort-limit); out-of-vocabulary tokens score
      // the add-one unseen probability 1/(T+V)
      operators.CorpusOps.lmQualityScore(Tables.documents(s, dir), "doc_id", "text",
          vocabCap = 64)
        .orderBy(col("doc_id"))
    }),

    "q_corpus_shuffle" -> ((s, dir) => {
      // deterministic training-order shuffle; gate checks the order head
      operators.Sampling.deterministicShuffle(Tables.documents(s, dir), col("doc_id"), "epoch0")
        .select(col("doc_id"), col("shuffle_key"))
        .limit(50)
    }),

    "q_dedup_winnow" -> ((s, dir) => {
      Dedup.fingerprintPairs(Tables.documents(s, dir), "doc_id", "text",
          ngram = 24, window = 8, minShared = 5)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q_text_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("source"), TextFunctions.fingerprint(col("text")).as("fp"))
        .groupBy(col("source"))
        .agg(countDistinct(col("fp")).as("n_distinct"), count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }),

    "q_text_redact" -> ((s, dir) => {
      // PII scrubbing gate: the synthetic docs carry no PII, so the gate
      // PLANTS a deterministic email + phone + IPv4 per document and then
      // verifies the masking chain removes all three identically in both
      // engines (counts, byte deltas, and the full redacted text's hash)
      val planted = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
        lit(" call 555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".7"))
      Tables.documents(s, dir)
        .select(col("source"), planted.as("t"))
        .select(col("source"), col("t"),
          TextFunctions.redactPii(col("t")).as("r"),
          TextFunctions.piiCount(col("t")).as("n"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_pii"),
          sum(length(col("t")) - length(col("r"))).as("chars_removed"),
          countDistinct(md5(col("r").cast("binary"))).as("n_distinct_redacted"))
        .orderBy(col("source"))
    }),

    // ---- multimodal ----
    "q_multimodal_meta" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, s"$dir/documents.parquet")
      Multimodal.metadataSummary(media.toDF())
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n"), sum(col("byte_len")).as("total_bytes"),
          countDistinct(col("content_md5")).as("n_distinct"))
        .orderBy(col("format"))
    }),

    "q_multimodal_decode" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(s, s"$dir/documents.parquet")
      Multimodal.decode(media)
        .groupByKey(_.format)
        .mapGroups { (fmt, rows) =>
          var n = 0L; var frames = 0L; var bytes = 0L
          rows.foreach { d => n += 1; frames += d.n_frames; bytes += d.byte_len }
          (fmt, n, frames, bytes)
        }
        .toDF("format", "n", "total_frames", "total_bytes")
        .orderBy(col("format"))
    }),

    // frame-extraction gate: per-video sampled-frame counts and byte totals
    // (rows-only — frame boundaries come from the stub codec)
    "q_multimodal_frames" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(s, s"$dir/documents.parquet")
      Multimodal.sampleFrames(media, stride = 10)
        .groupByKey(_.media_id)
        .mapGroups { (id, fs) =>
          var n = 0L; var bytes = 0L; var maxFrame = 0
          fs.foreach { f => n += 1; bytes += f.payload.length; maxFrame = math.max(maxFrame, f.frame_no) }
          (id, n, bytes, maxFrame)
        }
        .toDF("media_id", "n_sampled", "sampled_bytes", "max_frame")
        .orderBy(col("media_id"))
    }),

    "q_multimodal_dedup" -> ((s, dir) => {
      import s.implicits._
      // perceptual near-dup media pairs: the gate PLANTS a RE-ENCODED copy
      // of every 4th media row (id + 300000; first 40 chars upper-cased — a
      // byte-level change that leaves the stub raster's gradients nearly
      // intact, the payload analog of a JPEG re-encode) and the
      // dHash + Hamming-banded pair machinery recovers each plant at
      // distance <= 4 while unrelated media stay far apart. The doc_id cap
      // bounds the ORACLE's all-pairs verify, not the operator (banded
      // plan, PlanSpec-pinned no-cartesian).
      val d0 = Tables.documents(s, dir).filter(col("doc_id") < 800)
      val base = d0.select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("content"),
        lit("image").as("format"), col("source"))
      val planted = d0.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 300000L).as("media_id"),
          concat(upper(substring(col("text"), 1, 40)),
            substring(col("text"), 41, Int.MaxValue))
            .cast("binary").as("content"),
          lit("image").as("format"), col("source"))
      Multimodal.perceptualDedupPairs(
          base.unionByName(planted).as[Multimodal.MediaRow], maxHamming = 4)
        .orderBy(col("media_a"), col("media_b"))
    }),

    "q_multimodal_dedup_incremental" -> ((s, dir) => {
      import s.implicits._
      // incremental perceptual dedup through the PERSISTED phash index
      // (even-doc_id media, saved quarter + appended quarter — the full
      // lifecycle): the batch carries re-encodes of every 8th doc (its
      // original IS indexed -> drop) and odd-id originals (never indexed
      // -> survive, unless a natural even-id near-dup exists — which the
      // oracle replays identically)
      val path = phashIndexDir(s, dir)
      val d0 = Tables.documents(s, dir).filter(col("doc_id") < 800)
      val reenc = d0.filter(col("doc_id") % 8 === 0)
        .select((col("doc_id") + 300000L).as("media_id"),
          concat(upper(substring(col("text"), 1, 40)),
            substring(col("text"), 41, Int.MaxValue))
            .cast("binary").as("content"),
          lit("image").as("format"), col("source"))
      val fresh = d0.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("content"),
          lit("image").as("format"), col("source"))
      operators.Multimodal.dedupAgainstPhashIndex(
          reenc.unionByName(fresh).as[operators.Multimodal.MediaRow], path)
        .select(col("media_id")).orderBy(col("media_id"))
    }),

    // decode-error containment gate: a deterministic faulty codec (rejects
    // media_id % 5 == 0) must yield per-row errors, never task failures
    // (rows-only — the error split is codec-defined)
    "q_multimodal_errors" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, s"$dir/documents.parquet")
      Multimodal.decodeSafe(media, new RejectEveryFifth())
        .groupBy(col("format"), col("error").isNotNull.as("failed"))
        .agg(count(lit(1)).as("n"), sum(col("byte_len")).as("total_bytes"))
        .orderBy(col("format"), col("failed"))
    })
  )

  /** Deterministic fault-injecting codec for q_multimodal_errors: payloads of
    * media_id % 5 == 0 are "malformed". Exercises the per-row error path of
    * [[graft.operators.Multimodal.decodeSafe]] end-to-end. */
  private final class RejectEveryFifth extends Multimodal.MediaCodec {
    def decode(mediaId: Long, content: Array[Byte], format: String): Multimodal.DecodedMedia = {
      if (mediaId % 5 == 0)
        throw new IllegalArgumentException(s"malformed payload for media $mediaId")
      Multimodal.StubCodec.decode(mediaId, content, format)
    }
  }

  /** Centroids the q_ann_ivf gate actually used, captured for the oracle
    * rendering (Verify dumps oracleSql AFTER running the queries). Absent
    * (oracleSql evaluated standalone) → the key is omitted and the driver
    * falls back to its rows-only check. */
  private val ivfCentroidStash =
    new java.util.concurrent.atomic.AtomicReference[Array[(Int, Array[Double])]]()

  /** Same capture for q_dedup_semantic's k-means cells. */
  private val semanticCentroidStash =
    new java.util.concurrent.atomic.AtomicReference[Array[(Int, Array[Double])]]()

  /** Same capture for q_embed_diversity's k-means cells. */
  private val diversityCentroidStash =
    new java.util.concurrent.atomic.AtomicReference[Array[(Int, Array[Double])]]()

  /** Same capture for q_corpus_mix_temp's size-derived keep-rates. */
  private val temperatureRatesStash =
    new java.util.concurrent.atomic.AtomicReference[Map[String, Double]]()

  /** Same capture for q_corpus_mix_target's solved keep-rates. */
  private val targetMixRatesStash =
    new java.util.concurrent.atomic.AtomicReference[Map[String, Double]]()

  /** Embedding dimension of the testdata `embeddings` table (TESTDATA.md) —
    * the vector oracles render per-index fold expressions and need it
    * statically. */
  private val EmbeddingDim = 64

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL — identical semantics, identical column names.
  // EVERY gate renders a full oracle. LSH/minhash/winnow/IVF: seed-derived
  // constants (permutations, hyperplanes, centroids) are computed from the
  // same single source of truth as the executor kernels and inlined as SQL
  // literals, with FP op order matched exactly (see Similarity.sql* docs).
  // The two sketch gates (HLL/CMS — estimates are library-specific and
  // cannot be reproduced in another engine) output the PROPERTY instead:
  // exact counts (DuckDB-verified) plus the sketch's accuracy-bound boolean,
  // which must hash-match literal true.
  // ---------------------------------------------------------------------
  def oracleSql: Map[String, String] = {
    val srcRank =
      "SELECT event_id % 4 AS pid, props, " +
        "row_number() OVER (PARTITION BY event_id % 4 ORDER BY event_id) - 1 AS rk FROM events"
    Map(
      "q_agg_pricing" ->
        """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
          | count(*) AS n_items,
          | round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)), 2)::DOUBLE
          |   AS revenue,
          | min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
          |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q_join_broadcast" ->
        """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_join_multi" ->
        """SELECT n_name, sum(l_quantity) AS sum_qty, count(*) AS n_rows,
          | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          |FROM lineitem
          | JOIN orders ON l_orderkey = o_orderkey
          | JOIN customer ON o_custkey = c_custkey
          | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          | JOIN nation ON c_nationkey = n_nationkey
          | JOIN region ON n_regionkey = r_regionkey
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_join_salted" ->
        """SELECT o_orderpriority, count(*) AS n_rows,
          | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_agg_cube" ->
        """SELECT coalesce(o_orderstatus, '(all)') AS status,
          | coalesce(o_orderpriority, '(all)') AS priority,
          | count(*) AS n, round(sum(o_totalprice), 2) AS total
          |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
          |ORDER BY 1, 2""".stripMargin,

      "q_sample_split" ->
        s"""SELECT ${operators.Sampling.sqlHashSplit("text", SplitWeights)} AS split,
           | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_corpus_mix" ->
        s"""SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
           |FROM documents
           |WHERE ${operators.Sampling.sqlStratifiedKeep("source", MixRates, "text", MixDefaultRate)}
           |GROUP BY 1 ORDER BY 1""".stripMargin,

      // same deterministic (hash, id) order as q_corpus_cap's oracle; the
      // cumulative window is RANGE-framed in both engines and the order key
      // is unique, so RANGE == ROWS
      "q_corpus_cap_tokens" ->
        """SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS total_tokens
          |FROM (SELECT source, len(string_split(text, ' ')) AS nt,
          |        sum(len(string_split(text, ' '))) OVER (
          |          PARTITION BY source
          |          ORDER BY substr(md5(text), 1, 13), doc_id) AS cum
          |      FROM documents)
          |WHERE cum <= 2000 GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_text_chunks" ->
        operators.CorpusOps.sqlChunkDocuments(chunkTokens = 64, overlap = 8),

      "q_corpus_mix_epochs" ->
        s"""SELECT source, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs,
           |  max(epoch) AS max_epoch
           |FROM (SELECT source, doc_id,
           |        unnest(range(${operators.Sampling.sqlUpsampleCopies(
                      "source", "text", MixEpochs, 1.0)})) AS epoch
           |      FROM documents)
           |GROUP BY 1 ORDER BY 1""".stripMargin,

      // q_corpus_cap_tokens's window with a per-source CASE budget
      "q_corpus_mix_budget" ->
        s"""SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS total_tokens
           |FROM (SELECT source, len(string_split(text, ' ')) AS nt,
           |        sum(len(string_split(text, ' '))) OVER (
           |          PARTITION BY source
           |          ORDER BY substr(md5(text), 1, 13), doc_id) AS cum
           |      FROM documents)
           |WHERE cum <= (${operators.Sampling.sqlTokenBudgetCase(
                "source", MixBudgets, 1500L)})
           |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_corpus_cap" ->
        """SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
          |FROM (SELECT source, n_chars,
          |        row_number() OVER (PARTITION BY source
          |                           ORDER BY substr(md5(text), 1, 13), doc_id) AS rn
          |      FROM documents)
          |WHERE rn <= 5 GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_corpus_pack" ->
        """WITH t AS (
          |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
          |  FROM documents)
          |SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
          | CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS token_start,
          | CAST(floor((sum(n_tokens) OVER w - n_tokens) / 512) AS BIGINT) AS seq_first,
          | CAST(CASE WHEN n_tokens = 0
          |       THEN floor((sum(n_tokens) OVER w - n_tokens) / 512) - 1
          |       ELSE floor((sum(n_tokens) OVER w - 1) / 512) END AS BIGINT) AS seq_last,
          | CAST((sum(n_tokens) OVER w - n_tokens) % 512 AS BIGINT) AS seq_offset
          |FROM t WINDOW w AS (PARTITION BY source ORDER BY doc_id)
          |ORDER BY source, doc_id""".stripMargin,

      // the FFD recurrence replayed verbatim: same (len desc, id asc)
      // order, same first-fit rule, same bucket arithmetic — the bins
      // state rides the recursive CTE as a list column
      "q_corpus_pack_bestfit" ->
        """WITH RECURSIVE t AS (
          |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens,
          |    (doc_id % 8)::INT AS bkt
          |  FROM documents),
          |r AS (
          |  SELECT *, row_number() OVER (PARTITION BY source, bkt
          |           ORDER BY n_tokens DESC, doc_id ASC) AS rn
          |  FROM t WHERE n_tokens > 0),
          |ffd AS (
          |  SELECT source, bkt, 0::BIGINT AS rn, NULL::BIGINT AS doc_id,
          |    NULL::BIGINT AS n_tokens, NULL::BIGINT AS seq_id,
          |    NULL::BIGINT AS seq_offset, []::BIGINT[] AS used
          |  FROM (SELECT DISTINCT source, bkt FROM r)
          |  UNION ALL
          |  SELECT r.source, r.bkt, r.rn, r.doc_id, r.n_tokens,
          |    (r.bkt::BIGINT * 4294967296 + bin - 1) AS seq_id,
          |    CASE WHEN bin <= len(ffd.used) THEN ffd.used[bin::INT]
          |         ELSE 0 END AS seq_offset,
          |    CASE WHEN bin <= len(ffd.used)
          |      THEN list_transform(range(1, len(ffd.used) + 1),
          |             i -> CASE WHEN i = bin
          |                  THEN ffd.used[i::INT] + r.n_tokens
          |                  ELSE ffd.used[i::INT] END)
          |      ELSE list_append(ffd.used, r.n_tokens) END AS used
          |  FROM ffd JOIN r ON r.source = ffd.source AND r.bkt = ffd.bkt
          |    AND r.rn = ffd.rn + 1,
          |  LATERAL (SELECT coalesce(
          |      list_filter(range(1, len(ffd.used) + 1),
          |        i -> ffd.used[i::INT] + r.n_tokens <= 512)[1],
          |      len(ffd.used) + 1) AS bin) b
          |)
          |SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
          |  seq_id, seq_offset
          |FROM ffd WHERE rn > 0
          |UNION ALL
          |SELECT source, doc_id, CAST(n_tokens AS BIGINT), -1, 0
          |FROM t WHERE n_tokens = 0
          |ORDER BY source, doc_id""".stripMargin,

      // piece derivation (minimal split set) + the FFD recurrence, both
      // replayed; piece asc is the in-doc tie-break among full pieces
      "q_corpus_pack_bestfit_chunked" ->
        """WITH RECURSIVE t AS (
          |  SELECT source, doc_id, len(string_split(text, ' ')) AS n,
          |    (doc_id % 8)::INT AS bkt
          |  FROM documents WHERE doc_id < 800),
          |p AS (
          |  SELECT source, doc_id, bkt,
          |    unnest(range(0, greatest((n + 95) // 96, 1))) AS piece, n
          |  FROM t),
          |p2 AS (
          |  SELECT source, doc_id, bkt, piece,
          |    least(96, n - piece * 96) AS n_tokens
          |  FROM p),
          |r AS (
          |  SELECT *, row_number() OVER (PARTITION BY source, bkt
          |    ORDER BY n_tokens DESC, doc_id ASC, piece ASC) AS rn
          |  FROM p2 WHERE n_tokens > 0),
          |ffd AS (
          |  SELECT source, bkt, 0::BIGINT AS rn, NULL::BIGINT AS doc_id,
          |    NULL::BIGINT AS piece, NULL::BIGINT AS n_tokens,
          |    NULL::BIGINT AS seq_id, NULL::BIGINT AS seq_offset,
          |    []::BIGINT[] AS used
          |  FROM (SELECT DISTINCT source, bkt FROM r)
          |  UNION ALL
          |  SELECT r.source, r.bkt, r.rn, r.doc_id, r.piece, r.n_tokens,
          |    (r.bkt::BIGINT * 4294967296 + bin - 1) AS seq_id,
          |    CASE WHEN bin <= len(ffd.used) THEN ffd.used[bin::INT]
          |         ELSE 0 END AS seq_offset,
          |    CASE WHEN bin <= len(ffd.used)
          |      THEN list_transform(range(1, len(ffd.used) + 1),
          |             i -> CASE WHEN i = bin
          |                  THEN ffd.used[i::INT] + r.n_tokens
          |                  ELSE ffd.used[i::INT] END)
          |      ELSE list_append(ffd.used, r.n_tokens) END AS used
          |  FROM ffd JOIN r ON r.source = ffd.source AND r.bkt = ffd.bkt
          |    AND r.rn = ffd.rn + 1,
          |  LATERAL (SELECT coalesce(
          |      list_filter(range(1, len(ffd.used) + 1),
          |        i -> ffd.used[i::INT] + r.n_tokens <= 96)[1],
          |      len(ffd.used) + 1) AS bin) b
          |)
          |SELECT source, doc_id, CAST(piece AS BIGINT) AS piece,
          |  CAST(n_tokens AS BIGINT) AS n_tokens, seq_id, seq_offset
          |FROM ffd WHERE rn > 0
          |UNION ALL
          |SELECT source, doc_id, CAST(piece AS BIGINT), 0, -1, 0
          |FROM p2 WHERE n_tokens = 0
          |ORDER BY source, doc_id, piece""".stripMargin,

      "q_corpus_pack_rows" ->
        """WITH d AS (
          |  SELECT source, doc_id,
          |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          |   CAST(sum(len(string_split(text, ' '))) OVER
          |     (PARTITION BY source ORDER BY doc_id)
          |     - len(string_split(text, ' ')) AS BIGINT) AS token_start
          |  FROM documents),
          | e AS (
          |  SELECT source, doc_id, n_tokens, token_start,
          |   unnest(generate_series(token_start // 512,
          |     (token_start + n_tokens - 1) // 512)) AS seq_id
          |  FROM d WHERE n_tokens > 0),
          | s AS (
          |  SELECT source, seq_id, doc_id,
          |   greatest(token_start, seq_id * 512) - seq_id * 512 AS pos,
          |   greatest(token_start, seq_id * 512) - token_start AS doc_start,
          |   least(token_start + n_tokens, seq_id * 512 + 512)
          |     - greatest(token_start, seq_id * 512) AS len
          |  FROM e)
          |SELECT source, seq_id,
          | count(*) OVER (PARTITION BY source, seq_id) AS n_docs,
          | CAST(sum(len) OVER (PARTITION BY source, seq_id) AS BIGINT)
          |   AS seq_tokens,
          | pos, doc_id, doc_start, len
          |FROM s ORDER BY source, seq_id, pos""".stripMargin,

      "q_corpus_constraints" -> Seq(
        constraintRuleSql("chars_consistent", "len(text) = n_chars"),
        constraintRuleSql("lang_nonnull", "lang IS NOT NULL"),
        constraintRuleSql("text_nonempty", "len(text) > 0"),
        constraintRuleSql("tokens_le_50",
          s"${TextFunctions.sqlTokenCount.format("text")} <= 50"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY rule"),

      "q_corpus_unique" -> {
        def check(label: String, groupSql: String, ksSql: String) =
          s"""SELECT '$label' AS key, CAST(sum(n) AS BIGINT) AS n_rows,
             | count(*) AS n_distinct_keys,
             | CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
             | CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_rows,
             | min(CASE WHEN n > 1 THEN ks END) AS example_dup_key,
             | sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) = 0 AS pass
             |FROM (SELECT count(*) AS n, min($ksSql) AS ks
             |      FROM events GROUP BY $groupSql)""".stripMargin
        check("event_id", "event_id",
          "coalesce(event_id::VARCHAR, '<null>')") +
          "\nUNION ALL\n" +
          check("user_id|event_type", "user_id, event_type",
            "coalesce(user_id::VARCHAR, '<null>') || '|' || " +
              "coalesce(event_type, '<null>')") +
          "\nORDER BY key"
      },

      "q_corpus_referential" -> {
        def check(label: String, childKey: String,
            parentTable: String, parentKey: String) =
          s"""SELECT '$label' AS fk, b.n_child_rows, b.n_null_keys,
             | o.n_orphans,
             | ${TextFunctions.sqlStableRound(
               "CASE WHEN b.n_child_rows - b.n_null_keys = 0 THEN 0.0 ELSE " +
                 "o.n_orphans::DOUBLE / (b.n_child_rows - b.n_null_keys) END",
               6)} AS orphan_frac,
             | o.first_orphan, o.n_orphans = 0 AS pass
             |FROM
             | (SELECT count(*) AS n_child_rows,
             |   CAST(sum(CASE WHEN $childKey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |     AS n_null_keys FROM events) b,
             | (SELECT count(*) AS n_orphans, min($childKey::VARCHAR) AS first_orphan
             |  FROM events e WHERE $childKey IS NOT NULL AND NOT EXISTS
             |   (SELECT 1 FROM $parentTable p WHERE p.$parentKey = e.$childKey)) o""".stripMargin
        check("user_id->customer", "user_id", "customer", "c_custkey") +
          "\nUNION ALL\n" +
          check("event_id->documents", "event_id", "documents", "doc_id") +
          "\nORDER BY fk"
      },

      // the streaming tracker's cumulative totals over any trigger slicing
      // equal the one-pass batch profile — same oracle technique
      "q_stream_constraints" -> Seq(
        constraintRuleSql("doc_id_even", "doc_id % 2 = 0"),
        constraintRuleSql("text_nonempty", "len(text) > 0"),
        constraintRuleSql("tokens_le_50",
          s"${TextFunctions.sqlTokenCount.format("text")} <= 50"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY rule"),

      "q_corpus_pack_texts" ->
        """WITH d AS (
          |  SELECT source, doc_id,
          |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          |   CAST(sum(len(string_split(text, ' '))) OVER
          |     (PARTITION BY source ORDER BY doc_id)
          |     - len(string_split(text, ' ')) AS BIGINT) AS token_start
          |  FROM documents),
          | e AS (
          |  SELECT source, doc_id, n_tokens, token_start,
          |   unnest(generate_series(token_start // 512,
          |     (token_start + n_tokens - 1) // 512)) AS seq_id
          |  FROM d WHERE n_tokens > 0),
          | s AS (
          |  SELECT source, seq_id, doc_id,
          |   greatest(token_start, seq_id * 512) - seq_id * 512 AS pos,
          |   greatest(token_start, seq_id * 512) - token_start AS doc_start,
          |   least(token_start + n_tokens, seq_id * 512 + 512)
          |     - greatest(token_start, seq_id * 512) AS len
          |  FROM e),
          | t AS (
          |  SELECT s.source, s.seq_id, s.pos, s.len,
          |   array_to_string(list_slice(string_split(doc.text, ' '),
          |     s.doc_start + 1, s.doc_start + s.len), ' ') AS piece
          |  FROM s JOIN documents doc USING (doc_id))
          |SELECT source, seq_id, CAST(sum(len) AS BIGINT) AS seq_tokens,
          | string_agg(piece, ' ' ORDER BY pos) AS seq_text
          |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q_corpus_filter" -> {
        val reason = operators.CorpusOps.sqlQualityFilterReason(
          "text", 20, 80, "en", 0.5, 0.75)
        s"""SELECT doc_id,
           | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           | (${TextFunctions.sqlLangIdGuess("text")}) AS lang,
           | ${TextFunctions.sqlStableRound(TextFunctions.sqlQualityScore("text"), 4)}
           |   AS quality,
           | ${TextFunctions.sqlStableRound(
               "1.0 - len(list_distinct(string_split(text, ' '))) * 1.0" +
                 " / len(string_split(text, ' '))", 4)} AS dup_word_frac,
           | (($reason) = 'keep') AS keep,
           | ($reason) AS reason
           |FROM documents ORDER BY doc_id""".stripMargin
      },

      "q_corpus_decontaminate" -> deconOracleSql,

      "q_corpus_contamination" ->
        s"""$deconPairsCte
           |SELECT bench_id, count(*) AS n_corpus_docs, max(shared) AS top_shared,
           | CAST(sum(shared) AS BIGINT) AS total_shared
           |FROM j WHERE shared >= 2 GROUP BY 1 ORDER BY bench_id""".stripMargin,

      // engines may hash spans differently (double-xxhash64 vs md5) —
      // agreement is up to a collision, as in the dedup-family oracles
      "q_corpus_coverage" ->
        """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
          |        len(string_split(text, ' ')) AS n
          |      FROM documents WHERE source != 'src0'),
          |b AS (SELECT DISTINCT md5(array_to_string(list_slice(w, pos + 1, pos + 3), ' ')) AS h
          |      FROM (SELECT string_split(text, ' ') AS w,
          |              unnest(range(greatest(len(string_split(text, ' ')) - 2, 0))) AS pos
          |            FROM documents WHERE source = 'src0')),
          |o AS (SELECT doc_id, pos,
          |        md5(array_to_string(list_slice(w, pos + 1, pos + 3), ' ')) AS h
          |      FROM (SELECT doc_id, w, unnest(range(greatest(n - 2, 0))) AS pos FROM d)),
          |cov AS (SELECT DISTINCT doc_id, pos + u AS cp FROM o JOIN b USING (h)
          |        CROSS JOIN (SELECT unnest(range(3)) AS u) t),
          |c AS (SELECT doc_id, count(*) AS ncov FROM cov GROUP BY 1)
          |SELECT d.doc_id, d.n::INT AS n_words, coalesce(c.ncov, 0)::INT AS n_covered,
          |  CASE WHEN d.n = 0 THEN 0.0 ELSE
          |    (round((coalesce(c.ncov, 0)::DOUBLE / d.n) * 10000.0) / 10000.0)
          |  END AS coverage
          |FROM d LEFT JOIN c USING (doc_id) ORDER BY d.doc_id""".stripMargin,

      "q_corpus_decontaminate_neardup" ->
        operators.CorpusOps.sqlDecontaminateNearDup(),

      "q_pipeline_e2e" -> {
        val reason = operators.CorpusOps.sqlQualityFilterReason(
          "text", 20, 80, "en", 0.5, 0.75)
        val sh = TextFunctions.sqlWordShingles("text", 3)
          .replace("string_split(text, ' ')", "w")
        val mix = operators.Sampling.sqlStratifiedKeep(
          "source", MixRates, "text", MixDefaultRate)
        s"""WITH corpus AS (SELECT doc_id, source, text FROM documents WHERE source <> 'src0'),
           |k1 AS (SELECT * FROM corpus WHERE ($reason) = 'keep'),
           |d1 AS (SELECT doc_id, source, text FROM (
           |        SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
           |        FROM k1)
           |       WHERE rn = 1),
           |shc AS (SELECT doc_id, unnest(list_distinct($sh)) AS s
           |        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM d1)),
           |shb AS (SELECT doc_id AS bench_id, unnest(list_distinct($sh)) AS s
           |        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
           |              WHERE source = 'src0')),
           |flag AS (SELECT DISTINCT doc_id FROM (
           |          SELECT shc.doc_id, shb.bench_id, count(*) AS shared
           |          FROM shc JOIN shb USING (s) GROUP BY 1, 2)
           |         WHERE shared >= 2),
           |m AS (SELECT * FROM d1
           |      WHERE doc_id NOT IN (SELECT doc_id FROM flag) AND ($mix)),
           |t AS (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens FROM m)
           |SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           | CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS token_start,
           | CAST(floor((sum(n_tokens) OVER w - n_tokens) / 512) AS BIGINT) AS seq_first,
           | CAST(CASE WHEN n_tokens = 0
           |       THEN floor((sum(n_tokens) OVER w - n_tokens) / 512) - 1
           |       ELSE floor((sum(n_tokens) OVER w - 1) / 512) END AS BIGINT) AS seq_last,
           | CAST((sum(n_tokens) OVER w - n_tokens) % 512 AS BIGINT) AS seq_offset
           |FROM t WINDOW w AS (PARTITION BY source ORDER BY doc_id)
           |ORDER BY source, doc_id""".stripMargin
      },

      "q_text_repetition" ->
        s"""WITH base AS (
           |  SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct,
           |         unnest(${TextFunctions.sqlWordShingles("text", 2)
                 .replace("string_split(text, ' ')", "w")}) AS bigram
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
           |  WHERE len(w) >= 2
           |),
           |bg AS (SELECT doc_id, n_words, n_distinct, bigram, count(*) AS bg_n
           |       FROM base GROUP BY 1, 2, 3, 4),
           |top AS (SELECT doc_id, n_words, n_distinct, max(bg_n) AS top_bg
           |        FROM bg GROUP BY 1, 2, 3)
           |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           |       ${TextFunctions.sqlStableRound("1 - n_distinct * 1.0 / n_words", 4)}
           |         AS dup_word_frac,
           |       ${TextFunctions.sqlStableRound("top_bg * 1.0 / (n_words - 1)", 4)}
           |         AS top_bigram_frac
           |FROM top ORDER BY dup_word_frac DESC, doc_id LIMIT 20""".stripMargin,

      "q_embed_quantize" ->
        s"""WITH b AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS v,
           |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
           |      AS scale
           |  FROM embeddings),
           |qt AS (
           |  SELECT vec_id, scale,
           |    list_transform(v, x -> CASE WHEN scale = 0 THEN 0
           |      ELSE floor(x / scale + 0.5)::BIGINT END) AS q
           |  FROM b)
           |SELECT vec_id,
           | CAST(list_sum(q) AS BIGINT) AS q_sum,
           | CAST(list_sum(list_transform(range(1, len(q) + 1), i -> q[i] * i))
           |   AS BIGINT) AS q_wsum,
           | CAST(list_max(q) AS INT) AS q_max,
           | ${TextFunctions.sqlStableRound("scale", 6)} AS scale_r
           |FROM qt ORDER BY vec_id""".stripMargin,

      "q_corpus_dup_spans" ->
        s"""WITH sp AS (
           |  SELECT doc_id, unnest(${TextFunctions.sqlWordShingles("text", 3)
                 .replace("string_split(text, ' ')", "w")}) AS s
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
           |dup AS (SELECT s, count(DISTINCT doc_id) AS span_df
           |        FROM sp GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
           |j AS (SELECT sp.doc_id, dup.span_df FROM sp LEFT JOIN dup USING (s))
           |SELECT doc_id, count(*) AS n_spans,
           | count(span_df) AS n_dup_spans,
           | ${TextFunctions.sqlStableRound(
                "count(span_df)::DOUBLE / count(*)::DOUBLE", 4)} AS dup_span_frac,
           | coalesce(max(span_df), 0) AS max_span_df
           |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "q_window_rank" ->
        """SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
          | SELECT c_mktsegment, c_custkey, c_acctbal,
          |  row_number() OVER (PARTITION BY c_mktsegment
          |                     ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
          | FROM customer) WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,

      "q_sort_topk" ->
        """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
          |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
          |LIMIT 10""".stripMargin,

      "q_setops" ->
        """WITH urgent AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
          | open AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
          |SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM urgent EXCEPT SELECT * FROM open)
          |UNION ALL
          |SELECT 'intersect', count(*) FROM (SELECT * FROM urgent INTERSECT SELECT * FROM open)
          |UNION ALL
          |SELECT 'union', count(*) FROM (SELECT * FROM urgent UNION SELECT * FROM open)
          |ORDER BY op""".stripMargin,

      "q_distinct_groups" ->
        """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
          | count(DISTINCT l_suppkey) AS n_supps
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_events_window" ->
        """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
          | count(*) AS n, round(sum(value), 2) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q_events_sessions" ->
        """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
          | SELECT user_id,
          |  CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
          |       THEN 1 ELSE 0 END AS new_session
          | FROM (SELECT user_id, ts,
          |        lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
          |       FROM events))
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      // identical session semantics to q_events_session_window: complete-
      // mode streaming session windows equal the batch result
      "q_stream_session_window" ->
        """WITH s AS (
          |  SELECT user_id, ts,
          |   CASE WHEN lag(ts) OVER w IS NULL
          |     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
          |   THEN 1 ELSE 0 END AS ns
          |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
          |), g AS (
          |  SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid
          |  FROM s)
          |SELECT user_id, min(ts) AS session_start,
          | max(ts) + INTERVAL '30 minutes' AS session_end, count(*) AS n_events
          |FROM g GROUP BY user_id, sid ORDER BY 1, 2""".stripMargin,

      "q_events_session_window" ->
        """WITH s AS (
          |  SELECT user_id, ts,
          |   CASE WHEN lag(ts) OVER w IS NULL
          |     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
          |   THEN 1 ELSE 0 END AS ns
          |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
          |), g AS (
          |  SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid
          |  FROM s)
          |SELECT user_id, min(ts) AS session_start,
          | max(ts) + INTERVAL '30 minutes' AS session_end, count(*) AS n_events
          |FROM g GROUP BY user_id, sid ORDER BY 1, 2""".stripMargin,

      "q_numeric_profile" ->
        """SELECT event_type, count(*) AS n, round(avg(value), 4) AS avg,
          | round(stddev_samp(value), 4) AS sd,
          | round(quantile_cont(value, 0.25), 4) AS p25,
          | round(quantile_cont(value, 0.50), 4) AS p50,
          | round(quantile_cont(value, 0.75), 4) AS p75,
          | round(min(value), 4) AS min, round(max(value), 4) AS max
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_numeric_drift" -> numericDriftOracleSql,

      // exact cumulative counts over any trigger slicing == the batch
      // histogram, so the stream monitor shares the batch oracle
      "q_stream_drift" -> numericDriftOracleSql,

      // n_exact = count(value), NOT count(*): the rank window
      // [(p-eps)n, (p+eps)n] is over percentile_approx's actual input
      // population (non-null values), so n must exclude nulls too
      "q_numeric_profile_sketch" ->
        """SELECT event_type, q.quantile, count(value) AS n_exact,
          | true AS within_rank_bounds
          |FROM events, (VALUES (0.25), (0.5), (0.75), (0.95)) q(quantile)
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q_group_drift" -> groupDriftOracleSql,

      // exact cumulative (group, bucket) counts over any trigger slicing
      // == the batch per-group histograms, so the streaming monitor
      // shares the batch oracle (numericDriftOracleSql's rationale)
      "q_stream_group_drift" -> groupDriftOracleSql,

      "q_stream_enrich" ->
        """SELECT event_type, count(*) AS n_events,
          | round(avg(value), 4) AS type_avg_value
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

      // per-batch stateless streaming => the batch decontamination oracle
      // gates the streamed result unchanged
      "q_stream_decontaminate" -> deconOracleSql,

      "q_stream_join" ->
        """WITH src AS (
          |  SELECT event_id % 4 AS pid,
          |   row_number() OVER (PARTITION BY event_id % 4 ORDER BY event_id) - 1 AS rk,
          |   ts, event_type
          |  FROM events
          |), c AS (SELECT pid, rk, ts FROM src WHERE event_type = 'click'),
          | er AS (SELECT pid, ts FROM src WHERE event_type = 'error')
          |SELECT count(*) AS n_pairs,
          | count(DISTINCT (c.pid, c.rk)) AS n_clicks_matched
          |FROM c JOIN er ON c.pid = er.pid
          | AND abs(epoch_us(c.ts) - epoch_us(er.ts)) <= 300000000""".stripMargin,

      "q_stream_join_outer" ->
        """WITH src AS (
          |  SELECT event_id % 4 AS pid,
          |   row_number() OVER (PARTITION BY event_id % 4 ORDER BY event_id) - 1 AS rk,
          |   ts, event_type
          |  FROM events
          |), c AS (SELECT pid, rk, ts FROM src WHERE event_type = 'click'),
          | er AS (SELECT pid, ts FROM src WHERE event_type = 'error'),
          | pm AS (
          |  SELECT c.pid, c.rk, c.ts, count(er.ts) AS pairs
          |  FROM c LEFT JOIN er ON c.pid = er.pid
          |   AND abs(epoch_us(c.ts) - epoch_us(er.ts)) <= 300000000
          |  GROUP BY 1, 2, 3
          |), m AS (
          |  -- the query watermark is the MIN across both input streams'
          |  -- max event times, not the global max
          |  SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM er)) AS mx)
          |SELECT CAST(sum(pairs) AS BIGINT) AS n_pairs,
          | CAST(sum(CASE WHEN pairs > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched_clicks,
          | CAST(sum(CASE WHEN pairs = 0
          |   AND epoch_us(pm.ts) + 300000000 < epoch_us(m.mx)
          |  THEN 1 ELSE 0 END) AS BIGINT) AS n_null_only_clicks
          |FROM pm, m""".stripMargin,

      "q_stream_sessionize" ->
        """WITH s AS (
          |  SELECT user_id, ts,
          |   CASE WHEN lag(ts) OVER w IS NULL
          |     OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
          |   THEN 1 ELSE 0 END AS ns
          |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
          |), g AS (
          |  SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid
          |  FROM s
          |), sess AS (
          |  SELECT user_id, sid, count(*) AS n_events,
          |   min(ts) AS smin, max(ts) AS smax
          |  FROM g GROUP BY 1, 2
          |), lastq AS (
          |  SELECT user_id, max(smax) AS last_end FROM sess GROUP BY 1
          |), m AS (SELECT max(ts) AS mx FROM events)
          |SELECT CAST(sess.user_id AS VARCHAR) AS user_id, n_events,
          | epoch_ms(smin) AS session_start, epoch_ms(smax) AS session_end
          |FROM sess JOIN lastq ON sess.user_id = lastq.user_id, m
          |WHERE sess.smax < lastq.last_end
          |   OR epoch_ms(sess.smax) + 1800000 < epoch_ms(m.mx)
          |ORDER BY 1, 3""".stripMargin,

      "q_text_vocab" ->
        """SELECT token, count(*) AS n
          |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
          |GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,

      // the stateful running count's final complete-mode state == the batch
      // vocabulary head, whatever the trigger slicing
      "q_stream_vocab" ->
        """SELECT token, count(*) AS n
          |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
          |GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,

      // the sketch tracker's booleans are the CMS guarantees (found in
      // top-20, estimate within the one-sided bound) — literal true in the
      // oracle, exact counts carry the data check (q_sketch_terms pattern)
      "q_stream_vocab_sketch" ->
        """WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
          | c AS (SELECT term, count(*) AS n_exact FROM w WHERE term != ''
          |       GROUP BY 1)
          |SELECT term, n_exact, true AS in_topk, true AS within_bounds
          |FROM (SELECT * FROM c ORDER BY n_exact DESC, term ASC LIMIT 5)
          |ORDER BY term""".stripMargin,

      "q_corpus_overlap" -> operators.CorpusOps.sqlCorpusOverlap(
        "SELECT text FROM documents WHERE doc_id % 2 = 0",
        "SELECT text FROM documents WHERE doc_id % 3 = 0"),

      "q_corpus_overlap_sketch" ->
        s"""SELECT n_a AS n_a_exact, n_b AS n_b_exact, n_union AS n_union_exact,
           | n_intersect AS n_intersect_exact,
           | true AS a_within_5pct, true AS b_within_5pct,
           | true AS union_within_5pct, true AS intersect_within_5pct_of_union
           |FROM (${operators.CorpusOps.sqlCorpusOverlap(
                 "SELECT text FROM documents WHERE doc_id % 2 = 0",
                 "SELECT text FROM documents WHERE doc_id % 3 = 0")})""".stripMargin,

      "q_corpus_overlap_matrix" -> Seq(("m2", 2, "m3", 3), ("m2", 2, "m5", 5),
          ("m3", 3, "m5", 5)).map { case (na, ma, nb, mb) =>
        s"""SELECT '$na' AS snap_a, '$nb' AS snap_b,
           | n_a AS n_a_exact, n_b AS n_b_exact, n_union AS n_union_exact,
           | n_intersect AS n_intersect_exact,
           | true AS a_within_5pct, true AS b_within_5pct,
           | true AS union_within_5pct, true AS intersect_within_5pct_of_union
           |FROM (${operators.CorpusOps.sqlCorpusOverlap(
                  s"SELECT text FROM documents WHERE doc_id % $ma = 0",
                  s"SELECT text FROM documents WHERE doc_id % $mb = 0")})""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY snap_a, snap_b"),

      "q_corpus_overlap_append" ->
        s"""SELECT n_a AS n_exact, true AS appended_within_5pct,
           | true AS union_within_5pct, true AS append_matches_rebuilt
           |FROM (${operators.CorpusOps.sqlCorpusOverlap(
                 "SELECT text FROM documents WHERE doc_id % 2 = 0",
                 "SELECT text FROM documents WHERE doc_id % 2 = 0")})""".stripMargin,

      "q_text_bm25" -> operators.CorpusOps.sqlBm25(Bm25Query, k = 20),

      // the persisted incremental stats reproduce the one-shot search
      // EXACTLY (df/N/total-length are exact mergeable sums) — same oracle
      "q_text_bm25_persisted" -> operators.CorpusOps.sqlBm25(Bm25Query, k = 20),

      "q_text_bm25_multi" -> operators.CorpusOps.sqlBm25Many(Bm25Queries, k = 10),

      // fit-once + per-row-stateless scoring: any slicing unions to the
      // uncut multi-query scores
      "q_stream_bm25_multi" -> operators.CorpusOps.sqlBm25ManyScores(Bm25Queries),

      // fixed fit stats + per-row-stateless scoring: any trigger slicing
      // unions to the batch scorer, so the uncut corpus BM25 is exact
      "q_stream_bm25" -> operators.CorpusOps.sqlBm25Scores(Bm25Query),

      "q_text_tfidf" ->
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          | tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
          | dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
          | n AS (SELECT count(*) AS n_docs FROM documents),
          | s AS (SELECT doc_id, term, tf, df,
          |        tf::DOUBLE * (n_docs::DOUBLE / df::DOUBLE) AS score,
          |        row_number() OVER (PARTITION BY doc_id
          |          ORDER BY tf::DOUBLE * (n_docs::DOUBLE / df::DOUBLE) DESC, term ASC) AS rk
          |       FROM tfc JOIN dfc USING (term), n)
          |SELECT doc_id, term, tf, df,
          |  (round(score * 10000.0) / 10000.0) AS score
          |FROM s WHERE rk <= 3 ORDER BY doc_id, term""".stripMargin,

      "q_text_lm_score" ->
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          | cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
          | tot AS (SELECT count(*) AS t FROM tok),
          | voc AS (SELECT count(*) AS v FROM cnt)
          |SELECT doc_id, count(*) AS n_tokens,
          | (round((sum((round(-ln((c + 1)::DOUBLE / (t + v)::DOUBLE) * 1000000.0)
          |     / 1000000.0)::DECIMAL(18,6))::DOUBLE / count(*)) * 10000.0)
          |   / 10000.0) AS avg_nll
          |FROM tok JOIN cnt USING (term), tot, voc
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // the oracle picks the capped vocabulary with a plain rank (DuckDB is
      // single-node; the Spark side's histogram-threshold selection exists
      // precisely to avoid this global sort-limit) — same (count desc,
      // term asc) order, so the selected term sets are identical
      "q_text_lm_capped" ->
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          | cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
          | lm AS (SELECT term, c FROM (
          |   SELECT term, c, row_number() OVER (ORDER BY c DESC, term ASC) AS rn
          |   FROM cnt) WHERE rn <= 64),
          | tot AS (SELECT count(*) AS t FROM tok),
          | voc AS (SELECT count(*) AS v FROM lm)
          |SELECT doc_id, count(*) AS n_tokens,
          | (round((sum((round(-ln((coalesce(c, 0) + 1)::DOUBLE / (t + v)::DOUBLE) * 1000000.0)
          |     / 1000000.0)::DECIMAL(18,6))::DOUBLE / count(*)) * 10000.0)
          |   / 10000.0) AS avg_nll
          |FROM tok LEFT JOIN lm USING (term), tot, voc
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "q_text_ppl_buckets" -> operators.CorpusOps.sqlPerplexityBuckets(),

      "q_text_lm_bigram" -> operators.CorpusOps.sqlBigramLmScore(),

      "q_text_lm_bigram_capped" ->
        operators.CorpusOps.sqlBigramLmScore(vocabCap = 64),

      "q_corpus_shuffle" ->
        """SELECT doc_id, md5('epoch0-' || doc_id) AS shuffle_key
          |FROM documents ORDER BY shuffle_key, doc_id LIMIT 50""".stripMargin,

      "q_events_rank" ->
        """SELECT event_type, rk, round(max(value), 2) AS value, count(*) AS n_at_rank
          |FROM (SELECT event_type, value,
          |       dense_rank() OVER (PARTITION BY event_type ORDER BY value DESC) AS rk
          |      FROM events)
          |WHERE rk <= 3 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q_catalog_roundtrip" ->
        """SELECT CAST(event_id % 4 AS VARCHAR) AS "partition", count(*) AS n
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_source_scan" ->
        s"""SELECT CAST(pid AS VARCHAR) AS "partition", rk AS sequenceNumber,
           | props AS body_str
           |FROM ($srcRank) ORDER BY 1, 2""".stripMargin,

      "q_source_pushdown" ->
        s"""SELECT CAST(pid AS VARCHAR) AS "partition", count(*) AS n,
           | min(rk) AS min_seq, max(rk) AS max_seq
           |FROM ($srcRank) WHERE rk >= 100 AND rk < 200
           |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_source_count" ->
        s"""SELECT count(*) AS n, min(rk) AS min_seq, max(rk) AS max_seq
           |FROM ($srcRank)""".stripMargin,

      "q_source_count_groups" ->
        s"""SELECT CAST(pid AS VARCHAR) AS "partition", count(*) AS n,
           | min(rk) AS min_seq, max(rk) AS max_seq
           |FROM ($srcRank) GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_source_time_seek" ->
        """SELECT CAST(event_id % 4 AS VARCHAR) AS "partition", count(*) AS n
          |FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      // per-partition seek: ts is monotone in event_id per partition, so the
      // time-seek on p1 is exactly the ts >= predicate
      "q_source_partition_seek" ->
        """SELECT CAST(pid AS VARCHAR) AS "partition", count(*) AS n,
          | min(rk) AS min_seq, max(rk) AS max_seq
          |FROM (SELECT event_id % 4 AS pid, ts,
          |        row_number() OVER (PARTITION BY event_id % 4 ORDER BY event_id) - 1 AS rk
          |      FROM events)
          |WHERE (pid = 0 AND rk >= 100)
          |   OR (pid = 1 AND ts >= TIMESTAMP '2024-01-15 00:00:00')
          |   OR pid = 3
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      // offset == per-partition rank in the local log model; p2 (@latest)
      // contributes no rows, p3 uses the global {"offset":"50"} default
      "q_source_offset_seek" ->
        s"""SELECT CAST(pid AS VARCHAR) AS "partition", count(*) AS n,
           | min(rk) AS min_seq, max(rk) AS max_seq
           |FROM ($srcRank)
           |WHERE (pid = 0 AND rk >= 150) OR pid = 1 OR (pid = 3 AND rk >= 50)
           |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_sink_roundtrip" ->
        """SELECT event_type, count(*) AS n FROM events GROUP BY 1 ORDER BY 1""",

      "q_sink_durable" ->
        """SELECT event_type, count(*) AS n FROM events GROUP BY 1 ORDER BY 1""",

      "q_sink_foreach" ->
        """SELECT CAST(event_id % 4 AS VARCHAR) AS "partition", count(*) AS n
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_stream_window" ->
        """SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start, event_type,
          | count(*) AS n
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q_asof_join" ->
        """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
          | views AS (SELECT user_id, ts, max(value) AS v FROM events
          |           WHERE event_type = 'view' GROUP BY 1, 2)
          |SELECT c.event_id, c.user_id, v.v AS view_value
          |FROM clicks c ASOF LEFT JOIN views v
          |  ON c.user_id = v.user_id AND c.ts >= v.ts
          |ORDER BY 1""".stripMargin,

      // per-row stateless w.r.t. the stream (static right side), so the
      // batch as-of IS the oracle under any trigger slicing
      "q_stream_asof" ->
        """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
          | views AS (SELECT user_id, ts, max(value) AS v FROM events
          |           WHERE event_type = 'view' GROUP BY 1, 2)
          |SELECT c.event_id, c.user_id, v.v AS view_value
          |FROM clicks c ASOF LEFT JOIN views v
          |  ON c.user_id = v.user_id AND c.ts >= v.ts
          |ORDER BY 1""".stripMargin,

      "q_range_join" ->
        """WITH clicks AS (SELECT event_id, ts FROM events WHERE event_type = 'click'),
          | errors AS (SELECT event_id, ts FROM events WHERE event_type = 'error')
          |SELECT count(*) AS n_pairs, count(DISTINCT c.event_id) AS n_clicks_matched
          |FROM clicks c JOIN errors e
          |  ON abs(epoch_us(c.ts) - epoch_us(e.ts)) <= 300000000""".stripMargin,

      "q_dedup_exact" ->
        """SELECT md5(text) AS text_md5, min(doc_id) AS keeper, count(*) AS n_dups
          |FROM documents GROUP BY text ORDER BY 1""".stripMargin,

      "q_dedup_exact_rows" ->
        """SELECT doc_id, lang, source, n_chars FROM (
          | SELECT doc_id, lang, source, n_chars,
          |  row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
          | FROM documents)
          |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

      // same hash-group equivalence as q_dedup_paragraphs: the scrub
      // decision depends only on span-equality groups and the unique
      // (doc_id, pos) order, not on the hash values themselves
      "q_dedup_scrub" ->
        """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
          |        len(string_split(text, ' ')) AS n FROM documents),
          |o AS (SELECT doc_id, unnest(range(greatest(n - 4, 0))) AS pos, w FROM d),
          |s AS (SELECT doc_id, pos,
          |        md5(array_to_string(list_slice(w, pos + 1, pos + 5), ' ')) AS h
          |      FROM o),
          |m AS (SELECT doc_id, pos,
          |        row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
          |        count(*) OVER (PARTITION BY h) AS cnt FROM s),
          |cov AS (SELECT DISTINCT doc_id, pos + u AS cp FROM m
          |        CROSS JOIN (SELECT unnest(range(5)) AS u) t
          |        WHERE cnt >= 2 AND rn >= 2),
          |p AS (SELECT doc_id, unnest(range(n)) AS p, w FROM d),
          |keep AS (SELECT p.doc_id, p.p, p.w[p.p + 1] AS word FROM p
          |         LEFT JOIN cov ON p.doc_id = cov.doc_id AND p.p = cov.cp
          |         WHERE cov.doc_id IS NULL),
          |agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY p) AS txt,
          |          count(*) AS n_kept FROM keep GROUP BY doc_id)
          |SELECT d.doc_id, md5(coalesce(agg.txt, '')) AS text_md5,
          |  len(d.w)::INT AS n_words,
          |  (len(d.w) - coalesce(agg.n_kept, 0))::INT AS n_removed
          |FROM d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin,

      // first-occurrence choice depends only on hash-equality groups, so
      // the engines may hash differently (xxhash64 pair vs md5) and still
      // agree up to a collision; ORDER BY (doc_id, pos) is unique, making
      // row_number deterministic in both
      "q_dedup_paragraphs" ->
        """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
          |        len(string_split(text, ' ')) AS n FROM documents),
          |p AS (SELECT doc_id, unnest(range((n + 9) // 10)) AS pos, w FROM d),
          |q AS (SELECT doc_id, pos,
          |        array_to_string(list_slice(w, pos * 10 + 1, pos * 10 + 10), ' ') AS para
          |      FROM p),
          |k AS (SELECT doc_id, pos FROM (
          |        SELECT doc_id, pos,
          |          row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
          |        FROM q) WHERE rn = 1)
          |SELECT s.doc_id, md5(string_agg(s.para, ' ' ORDER BY s.pos)) AS text_md5,
          |  CAST(any_value((d.n + 9) // 10) AS INT) AS n_paras,
          |  CAST(count(*) AS INT) AS n_kept
          |FROM (SELECT q.* FROM q JOIN k USING (doc_id, pos)) s
          |JOIN d USING (doc_id)
          |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

      // lowercasing agrees across engines only for ASCII, so the guard
      // errors the gate loudly on a non-ASCII document instead of letting
      // the oracle silently diverge
      "q_dedup_normalized" ->
        s"""WITH d AS (SELECT doc_id, text FROM documents
           | UNION ALL
           | SELECT doc_id + 100000, '  ' || upper(text) || ' !! ' FROM documents),
           |n AS (SELECT ${TextFunctions.sqlAsciiGuard("doc_id", "text")} AS doc_id,
           |  ${TextFunctions.sqlNormalizeText("text")} AS nt FROM d)
           |SELECT md5(nt) AS h, min(doc_id) AS doc_id, count(*) AS n_variants
           |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,

      // exact-content semantics of the hash-index anti-join (equal up to a
      // 128-bit collision, same convention as the q_dedup_exact oracles)
      "q_dedup_incremental" -> incrementalDedupOracleSql,

      "q_dedup_incremental_neardup" -> Dedup.sqlMinHashIndexSurvivors(
        "SELECT doc_id, string_split(text, ' ') AS w FROM documents",
        """SELECT doc_id + 300000 AS doc_id,
          | CASE WHEN doc_id % 13 = 0
          |  THEN list_slice(string_split(text, ' '), 2, len(string_split(text, ' ')))
          |  ELSE list_reverse(string_split(text, ' ')) END AS w
          |FROM documents""".stripMargin),

      // the streaming form admits per epoch, but no two stream rows share
      // a text, so ANY trigger slicing unions to the batch result
      "q_stream_dedup_incremental" -> incrementalDedupOracleSql,

      "q_stream_pipeline" -> {
        val reason = operators.CorpusOps.sqlQualityFilterReason(
          "text", 20, 80, "en", 0.5, 0.75)
        // quality -> anti-join dedup -> PSI of admitted token counts vs
        // the corpus fit: the same dense-16-bucket, alpha=0.5 formula as
        // numericDriftOracleSql (alpha*buckets = 8.0, width 128/16 = 8)
        s"""WITH batch AS (
           | SELECT doc_id + 200000 AS doc_id,
           |  CASE WHEN doc_id % 2 = 0 THEN text
           |       ELSE text || ' batch2 #' || doc_id END AS text
           | FROM documents),
           |kept AS (SELECT * FROM batch WHERE ($reason) = 'keep'),
           |surv AS (
           | SELECT b.doc_id,
           |        CAST(len(string_split(b.text, ' ')) AS BIGINT) AS n_tok
           | FROM kept b
           | WHERE NOT EXISTS (SELECT 1 FROM documents c WHERE c.text = b.text)),
           |refh AS (
           | SELECT LEAST(GREATEST(CAST(floor(
           |          len(string_split(text, ' ')) / 8.0) AS INTEGER), 0), 15)
           |          AS bucket,
           |        count(*) AS n_ref
           | FROM documents GROUP BY 1),
           |curh AS (
           | SELECT LEAST(GREATEST(CAST(floor(n_tok / 8.0) AS INTEGER), 0), 15)
           |          AS bucket,
           |        count(*) AS n_cur
           | FROM surv GROUP BY 1),
           |cells AS (
           | SELECT g.bucket, COALESCE(n_ref, 0) AS n_ref,
           |        COALESCE(n_cur, 0) AS n_cur
           | FROM (SELECT unnest(generate_series(0, 15)) AS bucket) g
           | LEFT JOIN refh USING (bucket) LEFT JOIN curh USING (bucket)),
           |tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM cells),
           |psi AS (
           | SELECT sum(((n_cur + 0.5) / (tc + 8.0) - (n_ref + 0.5) / (tr + 8.0))
           |        * ln(((n_cur + 0.5) / (tc + 8.0))
           |             / ((n_ref + 0.5) / (tr + 8.0)))) AS p
           | FROM cells, tot)
           |SELECT doc_id, n_tok,
           |       ${TextFunctions.sqlStableRound("(SELECT p FROM psi)", 6)} AS psi_r
           |FROM surv ORDER BY doc_id""".stripMargin
      },

      "q_dedup_ngram" ->
        s"""WITH d AS (
           |  SELECT doc_id,
           |   list_distinct(${TextFunctions.sqlWordShingles("text", 3)
                 .replace("string_split(text, ' ')", "w")}) AS sh
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
           |), e AS (
           |  SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d WHERE len(sh) > 0
           |), p AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
           |   count(*) AS shared
           |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2, 3, 4)
           |SELECT doc_a, doc_b,
           | round(shared * 1.0 / (na + nb - shared), 4) AS jaccard
           |FROM p WHERE shared * 1.0 / (na + nb - shared) >= 0.5
           |ORDER BY 1, 2""".stripMargin,

      "q_fuzzy_pairs" ->
        """WITH d0 AS (
          |  SELECT doc_id, substr(text, 1, 40) AS key
          |  FROM documents WHERE doc_id < 800),
          |a AS (
          |  SELECT doc_id, key FROM d0
          |  UNION ALL
          |  SELECT doc_id + 200000, substr(key, 1, 7) || substr(key, 9, 32)
          |  FROM d0)
          |SELECT * FROM (
          |  SELECT x.doc_id AS id_a, y.doc_id AS id_b,
          |    levenshtein(x.key, y.key)::INT AS dist
          |  FROM a x JOIN a y
          |    ON x.doc_id < y.doc_id
          |   AND abs(length(x.key) - length(y.key)) <= 2)
          |WHERE dist <= 2 ORDER BY 1, 2""".stripMargin,

      "q_fuzzy_link" -> fuzzyLinkOracleSql,

      // load + probe == fit + probe: the persisted-index gate shares the
      // live linkage oracle (same catalog, same dirty feed)
      "q_fuzzy_persisted" -> fuzzyLinkOracleSql,

      "q_dedup_fuzzy" ->
        """WITH RECURSIVE d0 AS (
          |  SELECT doc_id, substr(text, 1, 40) AS key
          |  FROM documents WHERE doc_id < 800),
          |a AS (
          |  SELECT doc_id, key FROM d0
          |  UNION ALL
          |  SELECT doc_id + 200000, substr(key, 1, 7) || substr(key, 9, 32)
          |  FROM d0),
          |fpairs AS (
          |  SELECT * FROM (
          |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
          |      levenshtein(x.key, y.key) AS dist
          |    FROM a x JOIN a y
          |      ON x.doc_id < y.doc_id
          |     AND abs(length(x.key) - length(y.key)) <= 2)
          |  WHERE dist <= 2),
          |edges AS (
          |  SELECT doc_a AS u, doc_b AS v FROM fpairs
          |  UNION SELECT doc_b, doc_a FROM fpairs),
          |reach(u, v) AS (
          |  SELECT u, v FROM edges
          |  UNION
          |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
          |rep AS (SELECT u AS doc_id, least(u, min(v)) AS cluster
          |        FROM reach GROUP BY u)
          |SELECT a.doc_id FROM a LEFT JOIN rep r USING (doc_id)
          |WHERE coalesce(r.cluster, a.doc_id) = a.doc_id
          |ORDER BY 1""".stripMargin,

      // per-row stateless linkage: any trigger slicing unions to the
      // batch fuzzyJoin, so the streaming form shares the batch oracle
      "q_stream_fuzzy" -> fuzzyLinkOracleSql,

      "q_dedup_minhash" ->
        operators.Dedup.sqlMinHashLshPairs(
          k = 3, numHashes = 64, bands = 16, threshold = 0.5, seed = 42L),

      "q_dedup_simhash" ->
        operators.Dedup.sqlSimHashPairs(k = 3, maxHamming = 3),

      "q_dedup_winnow" ->
        operators.Dedup.sqlFingerprintPairs(ngram = 24, window = 8, minShared = 5),

      "q_dedup_embedding" ->
        operators.Dedup.sqlEmbeddingCosinePairs(
          dim = EmbeddingDim, threshold = 0.4, bands = 12, bitsPerBand = 5),

      "q_categorical_drift" -> categoricalDriftOracleSql,

      "q_group_cat_drift" -> groupCatDriftOracleSql,

      // exact cumulative classified counts over any slicing == the batch
      // per-group fold, so the streaming twin shares the batch oracle
      "q_stream_group_cat_drift" -> groupCatDriftOracleSql,

      // exact cumulative classified counts over any trigger slicing ==
      // the batch fold, so the streaming monitor shares the batch oracle
      "q_stream_cat_drift" -> categoricalDriftOracleSql,

      "q_embed_drift" -> embedDriftOracleSql,

      // cumulative per-label sums over any slicing == the batch stats up
      // to fp association, absorbed by the shared stableRound(4)
      "q_stream_embed_drift" -> embedDriftOracleSql,

      "q_ann_lsh" ->
        Similarity.sqlLshTopK(dim = EmbeddingDim, numBits = 6, seed = 42L,
          queryId = 0L, k = 10, multiProbe = 3),

      "q_knn_join_lsh" ->
        Similarity.sqlKnnJoinLsh(dim = EmbeddingDim, numBits = 6, seed = 42L,
          queryPred = "s.vec_id < 8", k = 5),

      // composes the two k-NN oracles above: exact top-5 vs the LSH twin,
      // overlap per query
      "q_ann_recall" ->
        s"""WITH ex0 AS (${oracleSqlKnnExact(k = 5)}),
           |ap0 AS (${Similarity.sqlKnnJoinLsh(dim = EmbeddingDim, numBits = 6,
                seed = 42L, queryPred = "s.vec_id < 8", k = 5)}),
           |ex AS (SELECT query_id, list_distinct(list(vec_id)) AS exact_ids
           |       FROM ex0 GROUP BY query_id),
           |ap AS (SELECT query_id, list_distinct(list(vec_id)) AS approx_ids
           |       FROM ap0 GROUP BY query_id)
           |SELECT ex.query_id,
           |  len(exact_ids)::INT AS n_exact,
           |  len(list_intersect(exact_ids, coalesce(approx_ids, [])))::INT AS n_hit,
           |  ${TextFunctions.sqlStableRound(
                "len(list_intersect(exact_ids, coalesce(approx_ids, [])))" +
                  " * 1.0 / len(exact_ids)", 4)} AS recall
           |FROM ex LEFT JOIN ap ON ex.query_id = ap.query_id
           |ORDER BY ex.query_id""".stripMargin,

      "q_dedup_clusters" ->
        s"""WITH RECURSIVE $sqlNgramReachCtes
           |SELECT u AS doc_id, least(u, min(v)) AS cluster
           |FROM reach GROUP BY u ORDER BY 1""".stripMargin,

      "q_corpus_split_safe" ->
        s"""WITH RECURSIVE $sqlNgramReachCtes,
           |rep AS (SELECT u AS doc_id, least(u, min(v)) AS cluster
           |        FROM reach GROUP BY u),
           |j AS (SELECT d.doc_id, coalesce(r.cluster, d.doc_id) AS split_rep
           |      FROM documents d LEFT JOIN rep r USING (doc_id))
           |SELECT doc_id, split_rep,
           | ${operators.Sampling.sqlHashSplit("split_rep::VARCHAR", SplitWeights)} AS split
           |FROM j ORDER BY doc_id""".stripMargin,

      "q_stream_dedup" ->
        """SELECT event_type, count(DISTINCT props) AS n_distinct
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_ann_bruteforce" ->
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          | q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
          |SELECT e.vec_id,
          |  (round(list_cosine_similarity(e.v, q.qv) * 1000000.0) / 1000000.0) AS cosine
          |FROM e, q WHERE e.vec_id != 0
          |ORDER BY cosine DESC, e.vec_id ASC LIMIT 10""".stripMargin,

      "q_knn_join" -> oracleSqlKnnExact(k = 5),

      "q_sketch_distinct" ->
        """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact,
          | true AS within_5pct
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_sketch_terms" ->
        """WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
          |SELECT term, count(*) AS n_exact, true AS within_bounds
          |FROM w WHERE term IN ('data', 'key', 'spark', 'table', 'value')
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      // the streaming form is per-batch stateless (each query vector's
      // top-k depends only on itself and the static corpus), so the batch
      // all-queries k-NN join is its exact oracle under any trigger slicing
      "q_stream_knn" ->
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          | s AS (SELECT q.vec_id AS query_id, e.vec_id,
          |        (round(list_cosine_similarity(e.v, q.v) * 1000000.0) / 1000000.0) AS cosine
          |       FROM e q, e WHERE e.vec_id != q.vec_id AND q.vec_id < 128),
          | r AS (SELECT *, row_number() OVER (PARTITION BY query_id
          |                 ORDER BY cosine DESC, vec_id ASC) AS rk FROM s)
          |SELECT query_id, vec_id, cosine, rk FROM r WHERE rk <= 3
          |ORDER BY query_id, rk""".stripMargin,

      "q_text_stats" ->
        s"""SELECT lang, count(*) AS n_docs,
           | ${TextFunctions.sqlStableRound(
               "avg(" + TextFunctions.sqlTokenCount.format("text") + ")", 4)} AS avg_tokens,
           | ${TextFunctions.sqlStableRound("avg(n_chars)", 4)} AS avg_chars,
           | CAST(sum(${TextFunctions.sqlPunctCount.format("text")}) AS BIGINT) AS total_punct
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_text_langid" ->
        s"""SELECT ${TextFunctions.sqlLangIdGuess("text")} AS guess, count(*) AS n
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_corpus_report" -> operators.CorpusOps.sqlCorpusReport(),

      "q_corpus_importance" ->
        operators.CorpusOps.sqlImportanceWeights("lang = 'en'"),

      "q_corpus_importance_sample" ->
        operators.CorpusOps.sqlImportanceSample("lang = 'en'", 50),

      "q_corpus_select_quantile" ->
        operators.CorpusOps.sqlSelectTopShareByGroup(250),

      "q_quality_classifier" ->
        operators.CorpusOps.sqlNaiveBayesScore("lang = 'en'"),

      // fit-once weights applied per micro-batch are row-stateless, so the
      // stream unions to the batch train+score exactly
      "q_stream_classifier" ->
        operators.CorpusOps.sqlNaiveBayesScore("lang = 'en'"),

      "q_dedup_paragraphs_doc" -> Dedup.sqlDedupParagraphsWithinDoc(
        "SELECT doc_id, text || chr(10) || text || chr(10) || 'tail ' || doc_id AS text " +
          "FROM documents"),

      "q_text_nfc" ->
        """WITH d AS (SELECT doc_id,
          |  text || CASE WHEN doc_id % 4 = 0 THEN ' cafe' || chr(769) ELSE '' END AS text
          |  FROM documents)
          |SELECT doc_id, nfc_normalize(text) AS text,
          | nfc_normalize(text) <> text AS changed
          |FROM d ORDER BY doc_id""".stripMargin,

      "q_text_encoding" -> operators.CorpusOps.sqlEncodingProfile(
        """SELECT doc_id, text ||
          | CASE WHEN doc_id % 3 = 0 THEN chr(65533) ELSE '' END ||
          | CASE WHEN doc_id % 5 = 0 THEN chr(7) ELSE '' END ||
          | CASE WHEN doc_id % 7 = 0 THEN chr(233) ELSE '' END AS text
          |FROM documents""".stripMargin),

      "q_pipeline_curation" -> {
        val score = TextFunctions.sqlStableRound(
          TextFunctions.sqlQualityScore("text"), 4)
        s"""WITH d0 AS (
           |  SELECT doc_id, source,
           |   CASE WHEN doc_id % 3 = 0 THEN b || chr(10) || b ELSE b END AS text
           |  FROM (SELECT doc_id, source,
           |         text || CASE WHEN doc_id % 4 = 0
           |                      THEN ' cafe' || chr(769) ELSE '' END AS b
           |        FROM documents)),
           | n AS (SELECT doc_id, source, nfc_normalize(text) AS text FROM d0),
           | p AS (SELECT doc_id, source,
           |        array_to_string(
           |          list_filter(ps, (x, i) -> list_position(ps, x) = i),
           |          chr(10)) AS text
           |       FROM (SELECT doc_id, source,
           |              string_split(text, chr(10)) AS ps FROM n)),
           | scored AS (SELECT doc_id, source, text, ($score) AS score FROM p),
           | tot AS (SELECT source, count(*) AS n FROM scored GROUP BY 1),
           | ranked AS (SELECT source, score,
           |            row_number() OVER (PARTITION BY source ORDER BY score DESC) AS rn
           |            FROM scored),
           | th AS (SELECT r.source, min(score) AS t
           |        FROM ranked r JOIN tot USING (source)
           |        WHERE rn <= (500 * n + 999) // 1000 GROUP BY 1)
           |SELECT s.doc_id, s.source, s.score,
           | ${operators.Sampling.sqlHashSplit("s.text", SplitWeights)} AS split
           |FROM scored s JOIN th USING (source) WHERE s.score >= th.t
           |ORDER BY s.doc_id""".stripMargin
      },

      "q_corpus_diversity" -> operators.CorpusOps.sqlNgramDiversity(3),

      "q_corpus_vocab_drift" -> operators.CorpusOps.sqlVocabularyDrift(
        "SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0",
        """SELECT doc_id,
          | CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text
          |FROM documents WHERE doc_id % 5 <> 0""".stripMargin, 30),

      "q_corpus_diff" ->
        """WITH o AS (SELECT doc_id, md5(text) AS old_md5 FROM documents
          |           WHERE doc_id % 7 <> 0),
          |n AS (SELECT doc_id,
          |        md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS new_md5
          |      FROM documents WHERE doc_id % 5 <> 0)
          |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
          |  CASE WHEN o.doc_id IS NULL THEN 'added'
          |       WHEN n.doc_id IS NULL THEN 'removed'
          |       WHEN old_md5 <> new_md5 THEN 'changed'
          |       ELSE 'unchanged' END AS status,
          |  old_md5, new_md5
          |FROM o FULL OUTER JOIN n USING (doc_id)
          |ORDER BY doc_id""".stripMargin,

      "q_quality_features" -> operators.CorpusOps.sqlQualityFeatures(),

      "q_quality_gopher" -> operators.CorpusOps.sqlGopherRules(),

      // per-row stateless => any trigger slicing unions to the batch matrix
      "q_stream_quality" -> operators.CorpusOps.sqlGopherRules(),

      "q_text_quality" ->
        s"""SELECT source,
           | ${TextFunctions.sqlStableRound("sum(q)::DOUBLE / count(*)", 6)} AS avg_quality,
           | min(q)::DOUBLE AS min_quality, max(q)::DOUBLE AS max_quality
           |FROM (SELECT source,
           |        (${TextFunctions.sqlStableRound(
                      TextFunctions.sqlQualityScore("text"), 6)})::DECIMAL(18,6) AS q
           |      FROM documents)
           |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_text_tokens" ->
        s"""SELECT lang, CAST(sum(${TextFunctions.sqlTokenCount.format("text")}) AS BIGINT) AS total_ws_tokens,
           | CAST(sum(${TextFunctions.sqlBpeTokenCount.format("text")}) AS BIGINT) AS total_bpe_tokens
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_text_fingerprint" ->
        s"""SELECT source, count(DISTINCT ${TextFunctions.sqlFingerprint.format("text")}) AS n_distinct,
           | count(*) AS n_docs
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_text_redact" ->
        s"""WITH t AS (
           |  SELECT source,
           |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ||
           |      ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
           |      ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
           |  FROM documents)
           |SELECT source, count(*) AS n_docs,
           | CAST(sum(${TextFunctions.sqlPiiCount("t")}) AS BIGINT) AS n_pii,
           | CAST(sum(length(t) - length(${TextFunctions.sqlRedactPii("t")})) AS BIGINT)
           |   AS chars_removed,
           | count(DISTINCT md5(${TextFunctions.sqlRedactPii("t")})) AS n_distinct_redacted
           |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_multimodal_meta" ->
        """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
          |            WHEN doc_id % 3 = 1 THEN 'audio'
          |            ELSE 'video' END AS format,
          | count(*) AS n, CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
          | count(DISTINCT md5(text)) AS n_distinct
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      // StubCodec is pure arithmetic (Multimodal.scala:72-90): n_frames for
      // video derives from an FNV-1a 64-bit hash of the payload bytes, which
      // DuckDB can fold over the (all-ASCII) text's codepoints with HUGEINT
      // mod-2^64 arithmetic (fnvSql). h >>> 16 of the unsigned value is
      // integer division by 65536; floorMod(·, 120) of that non-negative
      // value is a plain %. Image/audio are always 1 frame.
      // the stub raster + dHash replayed cell-for-cell: per-cell EXACT
      // integer byte sums / counts (both engines divide the same integers,
      // so the doubles — and the > comparisons — are bit-identical), bits
      // compared as lists (no 1<<63 signed-overflow gymnastics), all-pairs
      // verify bounded by the gate's doc_id cap
      "q_multimodal_dedup" ->
        s"""WITH m0 AS (
           |  SELECT (${TextFunctions.sqlAsciiGuard("doc_id", "text")})
           |    AS media_id, text AS t
           |  FROM documents WHERE doc_id < 800
           |  UNION ALL
           |  SELECT doc_id + 300000,
           |    upper(substr(text, 1, 40)) || substr(text, 41)
           |  FROM documents WHERE doc_id < 800 AND doc_id % 4 = 0),
           |${sqlDhashBitsCtes("m0", "b")},
           |p AS (
           |  SELECT x.media_id AS media_a, y.media_id AS media_b,
           |    ${sqlHammingOf("x.bits", "y.bits")}::INT AS hamming
           |  FROM b x JOIN b y ON x.media_id < y.media_id)
           |SELECT media_a, media_b, hamming FROM p
           |WHERE hamming <= 4 ORDER BY 1, 2""".stripMargin,

      // same raster/bits machinery over index and batch sides; survivors
      // = batch media with no indexed bits-list within hamming 4
      "q_multimodal_dedup_incremental" ->
        s"""WITH idx0 AS (
           |  SELECT (${TextFunctions.sqlAsciiGuard("doc_id", "text")})
           |    AS media_id, text AS t
           |  FROM documents WHERE doc_id < 800 AND doc_id % 2 = 0),
           |bat0 AS (
           |  SELECT doc_id + 300000 AS media_id,
           |    upper(substr(text, 1, 40)) || substr(text, 41) AS t
           |  FROM documents WHERE doc_id < 800 AND doc_id % 8 = 0
           |  UNION ALL
           |  SELECT doc_id, text FROM documents
           |  WHERE doc_id < 800 AND doc_id % 2 = 1),
           |${sqlDhashBitsCtes("idx0", "ib")},
           |${sqlDhashBitsCtes("bat0", "bb")},
           |matched AS (
           |  SELECT DISTINCT x.media_id
           |  FROM bb x JOIN ib y
           |    ON ${sqlHammingOf("x.bits", "y.bits")} <= 4)
           |SELECT media_id FROM bat0
           |WHERE media_id NOT IN (SELECT media_id FROM matched)
           |ORDER BY media_id""".stripMargin,

      "q_multimodal_decode" ->
        s"""WITH m AS (
           |  SELECT (${TextFunctions.sqlAsciiGuard("doc_id", "text")}) AS media_id,
           |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
           |         ELSE 'video' END AS format,
           |    octet_length(CAST(text AS BLOB)) AS byte_len,
           |    CASE WHEN doc_id % 3 = 2 THEN
           |      1 + ((($fnvSql // 65536) % 120)::BIGINT)
           |    ELSE 1 END AS n_frames
           |  FROM documents)
           |SELECT format, count(*) AS n,
           | CAST(sum(n_frames) AS BIGINT) AS total_frames,
           | CAST(sum(byte_len) AS BIGINT) AS total_bytes
           |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

      // Frame sampling is slice arithmetic over the same FNV frame count:
      // chunk = max(1, len/f), each sampled frame's slice is
      // max(0, min(len, from+chunk) - from), the max sampled index is the
      // largest stride multiple below f. All exactly integer — so the
      // sampled-frame gate hashes against DuckDB too.
      "q_multimodal_frames" ->
        s"""WITH v AS (
           |  SELECT (${TextFunctions.sqlAsciiGuard("doc_id", "text")}) AS media_id,
           |    octet_length(CAST(text AS BLOB))::BIGINT AS len,
           |    (1 + (($fnvSql // 65536) % 120))::BIGINT AS f
           |  FROM documents WHERE doc_id % 3 = 2),
           |s AS (SELECT media_id, (f + 9) // 10 AS n_sampled,
           |        greatest(1, len // f) AS chunk, f, len FROM v)
           |SELECT media_id, CAST(n_sampled AS BIGINT) AS n_sampled,
           | CAST(list_sum(list_transform(range(0, f, 10),
           |      fi -> greatest(0, least(len, fi * chunk + chunk) - fi * chunk)))
           |   AS BIGINT) AS sampled_bytes,
           | CAST(((f - 1) // 10) * 10 AS INT) AS max_frame
           |FROM s ORDER BY media_id""".stripMargin,

      // The fault-injecting codec rejects exactly media_id % 5 == 0 and the
      // per-row containment keeps every rejected row as an error row with
      // the raw byte length — a deterministic partition of the corpus, so
      // the error-containment gate is exactly SQL-expressible.
      "q_multimodal_errors" ->
        """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
          |            ELSE 'video' END AS format,
          | (doc_id % 5 = 0) AS failed, count(*) AS n,
          | CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes
          |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) ++ Option(ivfCentroidStash.get()).map(cents =>
      "q_ann_ivf" -> Similarity.sqlIvfTopK(
        cents, dim = EmbeddingDim, queryId = 0L, k = 10, nProbe = 4)
    ) ++ Option(temperatureRatesStash.get()).map(rates =>
      "q_corpus_mix_temp" ->
        s"""SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
           |FROM documents
           |WHERE ${operators.Sampling.sqlStratifiedKeep("source", rates, "text", 0.0)}
           |GROUP BY 1 ORDER BY 1""".stripMargin
    ) ++ Option(targetMixRatesStash.get()).map(rates =>
      "q_corpus_mix_target" ->
        s"""SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
           |FROM documents
           |WHERE ${operators.Sampling.sqlStratifiedKeep("source", rates, "text", 0.0)}
           |GROUP BY 1 ORDER BY 1""".stripMargin
    ) ++ Option(semanticCentroidStash.get()).map(cents =>
      "q_dedup_semantic" -> Similarity.sqlSemanticDedup(
        cents, dim = EmbeddingDim, tau = 0.99, maxCellSize = 10000,
        sourceSql = """SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          | UNION ALL SELECT vec_id + 10000,
          |   list_transform(embedding::DOUBLE[], x -> x * 2) FROM embeddings"""
          .stripMargin)
    ) ++ Option(diversityCentroidStash.get()).map(cents =>
      "q_embed_diversity" -> Similarity.sqlDiversitySample(
        cents, dim = EmbeddingDim, perCell = 20))
  }

  /** Output columns of [[operators.Validation.checkUnique]] /
    * [[operators.Validation.checkReferential]] — the gates prepend a
    * check-label column and union several checks. */
  private val uniqueCols = Seq("n_rows", "n_distinct_keys", "n_dup_keys",
    "n_dup_rows", "example_dup_key", "pass").map(col)
  private val refCols = Seq("n_child_rows", "n_null_keys", "n_orphans",
    "orphan_frac", "first_orphan", "pass").map(col)

  /** One constraint rule's DuckDB profile row ([[operators.Validation
    * .checkConstraints]]'s twin): counted violations with null-predicate-
    * is-violation semantics, lexicographic min offender, rounded fraction.
    * Shared by the batch and streaming constraint oracles. */
  private def constraintRuleSql(name: String, holdsSql: String): String =
    s"""SELECT '$name' AS rule, count(*) AS n_rows,
       | CAST(sum(CASE WHEN coalesce($holdsSql, false) THEN 0 ELSE 1 END) AS BIGINT)
       |   AS n_violations,
       | ${TextFunctions.sqlStableRound(
         s"CASE WHEN count(*) = 0 THEN 0.0 ELSE " +
           s"sum(CASE WHEN coalesce($holdsSql, false) THEN 0 ELSE 1 END)::DOUBLE" +
           s" / count(*) END", 6)} AS violation_frac,
       | min(CASE WHEN NOT coalesce($holdsSql, false)
       |     THEN doc_id::VARCHAR END) AS first_violation,
       | sum(CASE WHEN coalesce($holdsSql, false) THEN 0 ELSE 1 END) = 0 AS pass
       |FROM documents""".stripMargin

  /** Planted-batch admission oracle shared by q_dedup_incremental and its
    * streaming twin: survivors are exactly the batch rows whose text the
    * corpus has never admitted. */
  /** Fuzzy record linkage of the planted typo'd feed — shared by
    * q_fuzzy_link (batch) and q_stream_fuzzy (the fit-once streaming
    * linkage, whose per-row statelessness makes the batch SQL its oracle
    * too). */
  private val fuzzyLinkOracleSql: String =
    """WITH d0 AS (
      |  SELECT doc_id, substr(text, 1, 40) AS key
      |  FROM documents WHERE doc_id < 800),
      |dirty AS (
      |  SELECT doc_id + 500000 AS rec_id,
      |    substr(key, 1, 11) || '#' || substr(key, 13, 28) AS key
      |  FROM d0 WHERE doc_id % 3 = 0)
      |SELECT * FROM (
      |  SELECT x.rec_id AS id_l, y.doc_id AS id_r,
      |    levenshtein(x.key, y.key)::INT AS dist
      |  FROM dirty x JOIN d0 y
      |    ON abs(length(x.key) - length(y.key)) <= 1)
      |WHERE dist <= 1 ORDER BY 1, 2""".stripMargin

  /** PSI drift profile of the planted even/odd snapshot split — shared by
    * q_numeric_drift (batch) and q_stream_drift (the cumulative streaming
    * monitor, whose exact counts make the batch SQL its oracle too). */
  private val numericDriftOracleSql: String = {
    def sr(e: String) = TextFunctions.sqlStableRound(e, 6)
    val pr = "(n_ref + 0.5) / (tr + 8.0)"
    val pc = "(n_cur + 0.5) / (tc + 8.0)"
    s"""WITH ref0 AS (
       |  SELECT value FROM events WHERE event_id % 2 = 0),
       |cur0 AS (
       |  SELECT CASE WHEN event_type = 'view' THEN value * 1.5 + 10
       |         ELSE value END AS value
       |  FROM events WHERE event_id % 2 = 1),
       |r AS (
       |  SELECT CAST(least(greatest(floor((value - 0.0) / 32.0), 0), 15)
       |           AS INT) AS bucket, count(*) AS n
       |  FROM ref0 WHERE value IS NOT NULL AND NOT isnan(value::DOUBLE)
       |  GROUP BY 1),
       |c AS (
       |  SELECT CAST(least(greatest(floor((value - 0.0) / 32.0), 0), 15)
       |           AS INT) AS bucket, count(*) AS n
       |  FROM cur0 WHERE value IS NOT NULL AND NOT isnan(value::DOUBLE)
       |  GROUP BY 1),
       |f AS (SELECT CAST(range AS INT) AS bucket FROM range(16)),
       |j AS (
       |  SELECT f.bucket, coalesce(r.n, 0) AS n_ref, coalesce(c.n, 0) AS n_cur
       |  FROM f LEFT JOIN r USING (bucket) LEFT JOIN c USING (bucket)),
       |t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
       |SELECT j.bucket, j.n_ref, j.n_cur,
       | ${sr("0.0 + bucket * 32.0")} AS lo_edge_r,
       | ${sr("0.0 + (bucket + 1) * 32.0")} AS hi_edge_r,
       | ${sr(pr)} AS p_ref_r,
       | ${sr(pc)} AS p_cur_r,
       | ${sr(s"(($pc) - ($pr)) * ln(($pc) / ($pr))")} AS psi_r
       |FROM j, t ORDER BY 1""".stripMargin
  }

  /** Per-group PSI profile of the planted 'click'-shift split — shared by
    * q_group_drift (batch) and q_stream_group_drift (the cumulative
    * streaming monitor, whose exact integer counts make the batch SQL its
    * oracle too — numericDriftOracleSql's rationale). */
  private val groupDriftOracleSql: String = {
    def sr(e: String) = TextFunctions.sqlStableRound(e, 6)
    val pr = "(n_ref + 0.5) / (tr + 4.0)"
    val pc = "(n_cur + 0.5) / (tc + 4.0)"
    val bkt = "CAST(least(greatest(floor((value - 0.0) / 64.0), 0), 7) AS INT)"
    s"""WITH ref0 AS (
       |  SELECT event_type AS grp, value FROM events
       |  WHERE event_id % 2 = 0 AND event_type IS NOT NULL),
       |cur0 AS (
       |  SELECT event_type AS grp,
       |    CASE WHEN event_type = 'click' THEN value * 1.25 + 8
       |    ELSE value END AS value
       |  FROM events WHERE event_id % 2 = 1 AND event_type IS NOT NULL),
       |r AS (SELECT grp, $bkt AS bucket, count(*) AS n FROM ref0
       |      WHERE value IS NOT NULL AND NOT isnan(value::DOUBLE)
       |      GROUP BY 1, 2),
       |c AS (SELECT grp, $bkt AS bucket, count(*) AS n FROM cur0
       |      WHERE value IS NOT NULL AND NOT isnan(value::DOUBLE)
       |      GROUP BY 1, 2),
       |g AS (SELECT DISTINCT grp FROM
       |      (SELECT grp FROM ref0 UNION ALL SELECT grp FROM cur0)),
       |f AS (SELECT grp, CAST(range AS INT) AS bucket FROM g, range(8)),
       |j AS (SELECT f.grp, f.bucket, coalesce(r.n, 0) AS n_ref,
       |        coalesce(c.n, 0) AS n_cur
       |      FROM f LEFT JOIN r USING (grp, bucket)
       |      LEFT JOIN c USING (grp, bucket)),
       |t AS (SELECT grp, sum(n_ref) AS tr, sum(n_cur) AS tc
       |      FROM j GROUP BY 1)
       |SELECT j.grp, j.bucket, j.n_ref, j.n_cur,
       | ${sr("0.0 + bucket * 64.0")} AS lo_edge_r,
       | ${sr("0.0 + (bucket + 1) * 64.0")} AS hi_edge_r,
       | ${sr(pr)} AS p_ref_r, ${sr(pc)} AS p_cur_r,
       | ${sr(s"(($pc) - ($pr)) * ln(($pc) / ($pr))")} AS psi_r
       |FROM j JOIN t USING (grp) ORDER BY 1, 2""".stripMargin
  }

  /** Categorical (source-mix) PSI of the planted dark-feed split — shared
    * by q_categorical_drift (batch) and q_stream_cat_drift (the cumulative
    * streaming monitor with exact integer counts). */
  private val categoricalDriftOracleSql: String = {
    def sr(e: String) = TextFunctions.sqlStableRound(e, 6)
    val pr = "(n_ref + 0.5) / (tr + 0.5 * nrows)"
    val pc = "(n_cur + 0.5) / (tc + 0.5 * nrows)"
    s"""WITH refc AS (
       |  SELECT source AS cat, count(*) AS n FROM documents
       |  WHERE doc_id % 2 = 0 AND source IS NOT NULL GROUP BY 1),
       |curc AS (
       |  SELECT source AS cat, count(*) AS n FROM documents
       |  WHERE doc_id % 2 = 1 AND source <> 'src1'
       |    AND source IS NOT NULL GROUP BY 1),
       |top AS (SELECT cat, n FROM refc ORDER BY n DESC, cat ASC LIMIT 6),
       |refh AS (
       |  SELECT CASE WHEN cat IN (SELECT cat FROM top) THEN cat
       |         ELSE '__other__' END AS category, sum(n)::BIGINT AS n_ref
       |  FROM refc GROUP BY 1),
       |curh AS (
       |  SELECT CASE WHEN cat IN (SELECT cat FROM top) THEN cat
       |         ELSE '__other__' END AS category, sum(n)::BIGINT AS n_cur
       |  FROM curc GROUP BY 1),
       |frame AS (SELECT cat AS category FROM top
       |          UNION ALL SELECT '__other__'),
       |j AS (
       |  SELECT f.category, coalesce(r.n_ref, 0) AS n_ref,
       |    coalesce(c.n_cur, 0) AS n_cur
       |  FROM frame f LEFT JOIN refh r USING (category)
       |  LEFT JOIN curh c USING (category)),
       |t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc,
       |      count(*) AS nrows FROM j)
       |SELECT category, n_ref, n_cur,
       | ${sr(pr)} AS p_ref_r, ${sr(pc)} AS p_cur_r,
       | ${sr(s"(($pc) - ($pr)) * ln(($pc) / ($pr))")} AS psi_r
       |FROM j, t ORDER BY 1""".stripMargin
  }

  /** Per-group categorical (language-mix-per-source) PSI of the planted
    * broken-classifier split — shared by q_group_cat_drift (batch) and
    * q_stream_group_cat_drift (exact cumulative classified counts). */
  private val groupCatDriftOracleSql: String = {
    def sr(e: String) = TextFunctions.sqlStableRound(e, 6)
    val pr = "(n_ref + 0.5) / (tr + 0.5 * nrows)"
    val pc = "(n_cur + 0.5) / (tc + 0.5 * nrows)"
    s"""WITH refc AS (
       |  SELECT source AS grp, lang AS cat, count(*) AS n FROM documents
       |  WHERE doc_id % 2 = 0 AND source IS NOT NULL AND lang IS NOT NULL
       |  GROUP BY 1, 2),
       |curc AS (
       |  SELECT source AS grp,
       |    CASE WHEN source = 'src2' AND lang = 'en' THEN 'zh'
       |    ELSE lang END AS cat, count(*) AS n
       |  FROM documents
       |  WHERE doc_id % 2 = 1 AND source IS NOT NULL AND lang IS NOT NULL
       |  GROUP BY 1, 2),
       |top AS (SELECT grp, cat FROM (
       |    SELECT *, row_number() OVER (PARTITION BY grp
       |      ORDER BY n DESC, cat ASC) AS rk FROM refc)
       |  WHERE rk <= 3),
       |refh AS (
       |  SELECT r.grp, t.cat IS NULL AS isoth,
       |    coalesce(t.cat, '__other__') AS category, sum(r.n)::BIGINT AS n_ref
       |  FROM refc r LEFT JOIN top t ON r.grp = t.grp AND r.cat = t.cat
       |  GROUP BY 1, 2, 3),
       |curh AS (
       |  SELECT c.grp, t.cat IS NULL AS isoth,
       |    coalesce(t.cat, '__other__') AS category, sum(c.n)::BIGINT AS n_cur
       |  FROM curc c LEFT JOIN top t ON c.grp = t.grp AND c.cat = t.cat
       |  GROUP BY 1, 2, 3),
       |g AS (SELECT DISTINCT grp FROM
       |      (SELECT grp FROM refc UNION ALL SELECT grp FROM curc)),
       |frame AS (SELECT grp, false AS isoth, cat AS category FROM top
       |  UNION ALL SELECT grp, true, '__other__' FROM g),
       |j AS (
       |  SELECT f.grp, f.category, coalesce(r.n_ref, 0) AS n_ref,
       |    coalesce(c.n_cur, 0) AS n_cur
       |  FROM frame f
       |  LEFT JOIN refh r ON f.grp = r.grp AND f.isoth = r.isoth
       |    AND f.category = r.category
       |  LEFT JOIN curh c ON f.grp = c.grp AND f.isoth = c.isoth
       |    AND f.category = c.category),
       |t2 AS (SELECT grp, sum(n_ref) AS tr, sum(n_cur) AS tc,
       |       count(*) AS nrows FROM j GROUP BY 1)
       |SELECT j.grp, j.category, j.n_ref, j.n_cur,
       | ${sr(pr)} AS p_ref_r, ${sr(pc)} AS p_cur_r,
       | ${sr(s"(($pc) - ($pr)) * ln(($pc) / ($pr))")} AS psi_r
       |FROM j JOIN t2 USING (grp) ORDER BY 1, 2""".stripMargin
  }

  /** Per-label embedding drift of the planted re-scale split — shared by
    * q_embed_drift (batch) and q_stream_embed_drift (cumulative per-label
    * sums; fp-association differences absorbed by stableRound(4)). */
  private val embedDriftOracleSql: String = {
    def sr(e: String) = TextFunctions.sqlStableRound(e, 4)
    val normOf = "avg(sqrt(list_sum(list_transform(v, x -> x * x))))"
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |ref AS (SELECT label, v FROM e WHERE vec_id % 2 = 0),
       |cur AS (
       |  SELECT label,
       |    CASE WHEN label >= 5 THEN list_transform(v, x -> x * 1.2 + 0.01)
       |    ELSE v END AS v
       |  FROM e WHERE vec_id % 2 = 1),
       |rs AS (SELECT label, count(*) AS n_ref, $normOf AS norm_ref,
       |        min(len(v)) AS dn_r, max(len(v)) AS dx_r
       |       FROM ref GROUP BY 1),
       |cs AS (SELECT label, count(*) AS n_cur, $normOf AS norm_cur,
       |        min(len(v)) AS dn_c, max(len(v)) AS dx_c
       |       FROM cur GROUP BY 1),
       |rc AS (SELECT label, i, avg(v[i]) AS m
       |       FROM ref, range(1, ${EmbeddingDim + 1}) t(i) GROUP BY 1, 2),
       |cc AS (SELECT label, i, avg(v[i]) AS m
       |       FROM cur, range(1, ${EmbeddingDim + 1}) t(i) GROUP BY 1, 2),
       |cosq AS (
       |  SELECT rc.label,
       |    CASE WHEN sum(rc.m * rc.m) > 0 AND sum(cc.m * cc.m) > 0
       |      THEN sum(rc.m * cc.m)
       |           / sqrt(sum(rc.m * rc.m) * sum(cc.m * cc.m)) END AS cos
       |  FROM rc JOIN cc ON rc.label = cc.label AND rc.i = cc.i
       |  GROUP BY 1)
       |SELECT label, coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur,
       | ${sr("norm_ref")} AS norm_ref_r, ${sr("norm_cur")} AS norm_cur_r,
       | CASE WHEN one_dim THEN ${sr("cos")} END AS cos_r,
       | NOT one_dim AS dim_mismatch
       |FROM (SELECT *,
       |   (dn_r IS NULL OR dn_r = dx_r) AND (dn_c IS NULL OR dn_c = dx_c)
       |   AND (dx_r IS NULL OR dx_c IS NULL OR dx_r = dx_c) AS one_dim
       |  FROM rs FULL OUTER JOIN cs USING (label)
       |  LEFT JOIN cosq USING (label))
       |ORDER BY 1""".stripMargin
  }

  /** DuckDB rendering of [[graft.operators.Multimodal.StubCodec]]'s raster
    * + dHash over a bound CTE `<src>(media_id, t)`: a grid CTE of 72
    * exact byte-slice means (integer sums / counts — both engines divide
    * the same integers, so the doubles and the > comparisons are
    * bit-identical under the ascii guard) and a `<out>(media_id, bits)`
    * CTE of the 64 adjacent-cell gradient bits. */
  private def sqlDhashBitsCtes(src: String, out: String): String = {
    val len = "length(t)" // == byte length under the ascii guard
    val lo = s"(c * $len) // 72"
    val hi = s"((c + 1) * $len) // 72"
    s"""g_$out AS (
       |  SELECT media_id,
       |    list_transform(range(0, 72), c -> CASE WHEN $hi > $lo THEN
       |      (list_sum(list_transform(range($lo, $hi),
       |         i -> ord(t[(i + 1)::INT])))::DOUBLE) / ($hi - $lo)
       |      ELSE 0.0 END) AS gr
       |  FROM $src),
       |$out AS (
       |  SELECT media_id,
       |    list_transform(range(0, 64), s ->
       |      CASE WHEN gr[((s // 8) * 9 + (s % 8) + 1)::INT]
       |             > gr[((s // 8) * 9 + (s % 8) + 2)::INT]
       |      THEN 1 ELSE 0 END) AS bits
       |  FROM g_$out)""".stripMargin
  }

  /** Hamming distance of two 64-slot 0/1 bits lists. */
  private def sqlHammingOf(a: String, b: String): String =
    s"list_sum(list_transform(range(0, 64), i -> " +
      s"CASE WHEN $a[(i + 1)::INT] <> $b[(i + 1)::INT] THEN 1 ELSE 0 END))"

  private val incrementalDedupOracleSql: String =
    """WITH batch AS (
      | SELECT doc_id + 200000 AS doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN text
      |       ELSE text || ' batch2 #' || doc_id END AS text
      | FROM documents)
      |SELECT b.doc_id FROM batch b
      |WHERE NOT EXISTS (SELECT 1 FROM documents c WHERE c.text = b.text)
      |ORDER BY doc_id""".stripMargin

  /** Exact k-NN join oracle (vec_id < 8 query set, top-`k` per query) —
    * shared by q_knn_join and, as the ground-truth CTE, q_ann_recall. */
  private def oracleSqlKnnExact(k: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       | q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       | s AS (SELECT query_id, e.vec_id,
       |        (round(list_cosine_similarity(e.v, qv) * 1000000.0) / 1000000.0) AS cosine
       |       FROM q, e WHERE e.vec_id != query_id),
       | r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |                 ORDER BY cosine DESC, vec_id ASC) AS rk FROM s)
       |SELECT query_id, vec_id, cosine, rk FROM r WHERE rk <= $k
       |ORDER BY query_id, rk""".stripMargin

  /** DuckDB rendering of [[graft.operators.Multimodal.StubCodec]]'s FNV-1a
    * 64-bit hash (shared twin: [[TextFunctions.sqlFnv1a64]]) — codepoint
    * folding equals the kernel's UTF-8-byte stream only for ASCII text, so
    * every oracle that uses it routes its id column through
    * [[TextFunctions.sqlAsciiGuard]]: a future non-ASCII document fails the
    * gate loudly instead of silently diverging. */
  private lazy val fnvSql: String = "(" + TextFunctions.sqlFnv1a64("text") + ")"
}
