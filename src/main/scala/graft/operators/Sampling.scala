package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic content-hash sampling and split assignment.
 *
 * A row's fate is a pure function of `md5(key)` — no RNG state, no
 * partitioning dependence — so samples and train/val/test splits are exactly
 * reproducible across runs, engines, and cluster layouts, and re-running a
 * 100 TB pipeline reassigns nothing. The first 13 hex digits of the md5
 * (52 bits, compared lexicographically == numerically for equal-length
 * lowercase hex) address the sample space.
 */
object Sampling {

  private val HexSpace = math.pow(16, 13)

  /** Threshold prefix such that `hex13 < threshold` keeps ~`rate` of rows.
    * rate >= 1 returns "g", which every 13-char hex string sorts below (a
    * 14-char numeric rendering would sort BELOW most hashes and silently
    * invert the clamp). */
  def hexThreshold(rate: Double): String =
    if (rate >= 1.0) "g"
    else f"${math.max(0.0, rate * HexSpace).toLong}%013x"

  private def hex13(key: Column): Column =
    substring(md5(key.cast("binary")), 1, 13)

  /** Keep ~`rate` of rows, chosen by content hash of `key`. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(hex13(key) < lit(hexThreshold(rate)))

  /** Assign each row a split label by cumulative hash ranges; `weights`
    * (label, fraction) should sum to ~1 — the last split takes the
    * remainder. Adds a `split` column. */
  def hashSplit(df: DataFrame, key: Column, weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty, "at least one split")
    val cum = weights.scanLeft(0.0)(_ + _._2).tail
    val h = hex13(key)
    val expr = weights.init.zip(cum.init).foldRight(lit(weights.last._1)) {
      case (((label, _), upper), acc) =>
        when(h < lit(hexThreshold(upper)), lit(label)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic training-order shuffle: global sort by the salted
    * content hash of `key` (identical order every run and on any cluster
    * size — epoch `seed` changes reshuffle the corpus). A Spark range-
    * partitioned sort: sampled split points, no single-task bottleneck, no
    * driver materialization; with a `.limit(n)` on top Catalyst collapses
    * it to a distributed top-k instead of a full sort. The hash column is
    * kept as `shuffle_key` so downstream stages (and the oracle) can verify
    * the order without re-deriving it. */
  def deterministicShuffle(df: DataFrame, key: Column, seed: String): DataFrame =
    df.withColumn("shuffle_key", md5(concat_ws("-", lit(seed), key).cast("binary")))
      .orderBy(col("shuffle_key"), key)

  /** Per-group cap ("domain balancing"): keep at most `cap` rows per group,
    * chosen deterministically by content hash with an id tiebreak — the
    * standard way to stop one giant domain from dominating a training mix
    * while keeping the selection reproducible across runs and partitionings.
    * One window shuffle on the group key; a group's rows never leave their
    * partition after it. */
  def capPerGroup(
      df: DataFrame, groupCols: Seq[Column], hashKey: Column, tieBreak: Column,
      cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols: _*).orderBy(hex13(hashKey).asc, tieBreak.asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= cap).drop("__rn")
  }

  /** Number of order-key buckets the grouped prefix sums split each group
    * into. With hex13 order keys a 2-hex-digit prefix yields 256 uniform
    * buckets; the generic sampled-boundary path aims for the same count. */
  private[operators] val CumSumBuckets = 256

  /** Order-consistent bucket of a `hex13` order key: its first two hex
    * digits as an int (0..255). Lowercase fixed-width hex compares
    * lexicographically == numerically, so every key in bucket b sorts
    * strictly before every key in bucket b+1 — cutting a group's hash
    * order at bucket boundaries never splits the order. */
  private def hexBucket(hexKey: Column): Column =
    coalesce(conv(substring(hexKey, 1, 2), 16, 10).cast("int"), lit(0))

  /**
   * Distributed grouped running sum — `sum(value) OVER (PARTITION BY group
   * ORDER BY orderKeys)` WITHOUT funneling each group through one reducer.
   *
   * A bare per-group window cumsum has no rank-limit pushdown (unlike
   * `row_number`'s WindowGroupLimit), so the window shuffle lands a
   * group's ENTIRE row set in a single task that must sort it — a 100 TB
   * corpus with a handful of sources puts billions of rows through one
   * reducer per source, and AQE cannot split a window partition. Instead,
   * the same two-phase prefix sum as [[CorpusOps.cappedVocab]]'s histogram
   * cuts:
   *
   *  1. Bucket the order key with `bucket` — REQUIRED order-consistent:
   *     key1 < key2 must imply bucket(key1) <= bucket(key2), so bucket
   *     boundaries are cuts of the group's order, never reorderings.
   *  2. Per-(group, bucket) subtotals: a map-side-combinable hash
   *     aggregation over at most |groups| * [[CumSumBuckets]] cells.
   *  3. Cross-bucket offsets WITHOUT any window: each group's <= 256
   *     subtotal cells collect into one array; a higher-order `aggregate`
   *     over the array yields each bucket's prefix offset. Bounded work
   *     per group regardless of corpus size, and no Window node
   *     partitioned by the bare group column anywhere in the plan.
   *  4. Join the offsets back (null-safe on group keys; the offset side is
   *     metadata-scale, so the planner broadcasts it) and window ONLY
   *     within (group, bucket) — each window partition holds ~1/256 of a
   *     group, so a skewed group spreads over 256 tasks instead of one.
   *
   * The result is VALUE-identical to the single-window form for any
   * bucketing (buckets only cut the order), so oracles and repartition
   * invariance are untouched.
   */
  private def bucketedCumSum(
      df: DataFrame, groupCols: Seq[Column], orderKeys: Seq[Column],
      bucket: Column, value: Column, cumCol: String): DataFrame = {
    val gNames = groupCols.indices.map(i => s"__g$i")
    val d0 = groupCols.zip(gNames).foldLeft(df) { case (acc, (c, n)) =>
      acc.withColumn(n, c)
    }
    // null values count as 0 — exactly how a window SUM ignores them. An
    // uncoalesced null would also poison the per-bucket subtotal (sum of
    // all-null = null) and through it every LATER bucket's offset, silently
    // nulling __cum for whole bucket ranges
    val d = d0.withColumn("__bkt", bucket)
      .withColumn("__val", coalesce(value.cast("long"), lit(0L)))
    val gCols = gNames.map(col)
    val sub = d.groupBy((gCols :+ col("__bkt")): _*).agg(sum(col("__val")).as("__sub"))
    val offsets = sub
      .groupBy(gCols: _*)
      .agg(collect_list(struct(col("__bkt"), col("__sub"))).as("__arr"))
      .select((gCols :+ col("__arr") :+ explode(col("__arr")).as("__e")): _*)
      .select((gCols :+ col("__e.__bkt").as("__obkt") :+
        aggregate(
          filter(col("__arr"), x => x.getField("__bkt") < col("__e.__bkt")),
          lit(0L), (acc, x) => acc + x.getField("__sub")).as("__off")): _*)
      .withColumnsRenamed(gNames.map(n => n -> s"__o$n").toMap)
    val joinCond = gNames.map(n => d(n) <=> offsets(s"__o$n"))
      .reduce(_ && _) && d("__bkt") === offsets("__obkt")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((gCols :+ col("__bkt")): _*)
      .orderBy(orderKeys: _*)
    d.join(offsets, joinCond)
      .withColumn(cumCol, col("__off") + sum(col("__val")).over(w))
      .drop((gNames ++ gNames.map(n => s"__o$n") ++
        Seq("__bkt", "__obkt", "__val", "__off")): _*)
  }

  /** Per-group TOKEN budget: keep each group's rows, in [[capPerGroup]]'s
    * deterministic hash order, until the cumulative token count would
    * exceed `budget` (the crossing document is dropped, so each group's
    * kept total is ≤ budget). Training mixtures are specified in tokens,
    * not documents — a doc-count cap lets a long-document group blow its
    * token share. Monotone in budget (raising it only ADDS documents).
    * The running sum is the [[bucketedCumSum]] two-phase prefix sum: one
    * metadata-scale subtotal aggregation plus one window over (group,
    * hex-prefix bucket) — a group's rows spread over [[CumSumBuckets]]
    * tasks, never a single reducer. */
  def capPerGroupTokens(
      df: DataFrame, groupCols: Seq[Column], hashKey: Column, tieBreak: Column,
      tokenCount: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val key = hex13(hashKey)
    bucketedCumSum(df, groupCols, Seq(key.asc, tieBreak.asc), hexBucket(key),
        tokenCount, "__cum")
      .filter(col("__cum") <= budget).drop("__cum")
  }

  /** Token-budget MIXTURE: [[capPerGroupTokens]] with a per-group budget
    * map — the way training mixtures are actually specified ("this many
    * tokens of web, this many of code"). Groups absent from `budgets` get
    * `defaultBudget` (default unlimited). The budget map renders as a
    * per-row CASE chain over the same [[bucketedCumSum]] prefix sum. */
  def mixByTokenBudget(
      df: DataFrame, groupCol: Column, hashKey: Column, tieBreak: Column,
      tokenCount: Column, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue): DataFrame = {
    require(budgets.values.forall(_ > 0) && defaultBudget > 0,
      "budgets must be positive")
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (g, b)) =>
      when(groupCol === g, lit(b)).otherwise(acc)
    }
    val key = hex13(hashKey)
    bucketedCumSum(df, Seq(groupCol), Seq(key.asc, tieBreak.asc), hexBucket(key),
        tokenCount, "__cum")
      .filter(col("__cum") <= budget).drop("__cum")
  }

  /** Mixture UPSAMPLING (epochs, possibly fractional): emit each row of
    * group g `factors(g)` times in expectation — floor(factor) full copies
    * plus one more when the row's content-hash coin lands under the
    * fractional part (the same hex13 coin as [[stratifiedSample]], so a
    * factor < 1 downsamples with EXACTLY stratifiedSample's row choice).
    * Small high-quality sources are repeated for multiple epochs in real
    * training mixtures; this is that recipe, deterministic and
    * partitioning-invariant. The copy index is exposed as `epoch` so a
    * downstream [[deterministicShuffle]] can salt on (key, epoch) and
    * spread the copies. Pure per-row explode — NO shuffle.
    */
  def upsampleByFactor(
      df: DataFrame, groupCol: Column, key: Column,
      factors: Map[String, Double], defaultFactor: Double = 1.0): DataFrame = {
    require(factors.values.forall(_ >= 0.0) && defaultFactor >= 0.0,
      "factors must be non-negative")
    def chain[T](f: Double => T, litOf: T => Column): Column =
      factors.toSeq.sortBy(_._1).foldRight(litOf(f(defaultFactor))) {
        case ((g, x), acc) => when(groupCol === lit(g), litOf(f(x))).otherwise(acc)
      }
    val full = chain[Int](x => math.floor(x).toInt, lit(_))
    val fracThresh = chain[String](x => hexThreshold(x - math.floor(x)), lit(_))
    val n = full + when(hex13(key) < fracThresh, 1).otherwise(0)
    df.withColumn("__n", n).filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(0), col("__n") - 1, lit(1))))
      .drop("__n")
  }

  /** DuckDB rendering of [[upsampleByFactor]]'s copy-count expression. */
  def sqlUpsampleCopies(
      groupCol: String, keyCol: String,
      factors: Map[String, Double], defaultFactor: Double = 1.0): String = {
    def chain(f: Double => String): String =
      factors.toSeq.sortBy(_._1).map { case (g, x) =>
        s"WHEN $groupCol = '${sqlEscape(g)}' THEN ${f(x)}"
      }.mkString("CASE ", " ", s" ELSE ${f(defaultFactor)} END")
    val full = chain(x => math.floor(x).toInt.toString)
    val thresh = chain(x => s"'${hexThreshold(x - math.floor(x))}'")
    s"(($full) + (CASE WHEN substr(md5($keyCol), 1, 13) < ($thresh) " +
      "THEN 1 ELSE 0 END))"
  }

  /** DuckDB rendering of [[mixByTokenBudget]]'s budget CASE chain. */
  def sqlTokenBudgetCase(
      groupCol: String, budgets: Map[String, Long], defaultBudget: Long): String =
    budgets.toSeq.sortBy(_._1).map { case (g, b) =>
      s"WHEN $groupCol = '$g' THEN $b"
    }.mkString("CASE ", " ", s" ELSE $defaultBudget END")

  /**
   * Training-sequence packing ("concatenate and chunk", the layout step of
   * every LLM pretraining pipeline): lay each group's token stream out in
   * deterministic `orderCol` order and cut it into fixed `maxSeqLen`-token
   * training sequences. Each document reports its absolute token offset,
   * the sequence range it spans (`seq_first`..`seq_last` — documents cross
   * chunk boundaries, as in standard concat-and-chunk), and its offset
   * inside the first sequence.
   *
   * The result is pure metadata — a [[bucketedCumSum]] grouped prefix sum,
   * no token materialization — so packing a 100 TB corpus costs one
   * shuffle of its doc STATS spread over [[CumSumBuckets]] tasks per
   * group (never one reducer per group). The default layout adds a bounded
   * boundary-sampling pre-pass at plan-construction time
   * ([[temperatureRates]]' count pre-pass precedent); skip it entirely with
   * `hexOrdered = true` when the layout order is one of this library's hex
   * hash keys (the usual case — packing follows [[deterministicShuffle]]),
   * or point `boundarySource` at a cheaper frame carrying the same order
   * column when composing on top of an expensive upstream. The training
   * loader then fetches a sequence's documents by (group, seq range)
   * lookup.
   *
   * A zero-token document gets `seq_last = seq_first - 1` (explicitly, at
   * ANY token offset — not only at chunk boundaries): it occupies no
   * sequence (a loader emitting docs per (group, seq) range emits nothing),
   * but keeps its `token_start` bookkeeping.
   *
   * Per-document separator overhead (BOS/EOS tokens between concatenated
   * documents) is the CALLER's expression: pass
   * `tokenCount + lit(sepTokens)` and every document's layout footprint
   * includes its separators — no dedicated parameter needed, since
   * `tokenCount` is an arbitrary column.
   */
  def packSequences(
      df: DataFrame, groupCols: Seq[Column], orderCol: Column,
      tokenCount: Column, maxSeqLen: Int,
      hexOrdered: Boolean = false,
      boundarySource: Option[DataFrame] = None): DataFrame = {
    require(maxSeqLen > 0, s"maxSeqLen must be positive, got $maxSeqLen")
    require(!(hexOrdered && boundarySource.nonEmpty),
      "pass hexOrdered OR boundarySource, not both")
    // bucket choice NEVER affects values (buckets only cut the layout
    // order; bucketedCumSum is bucketing-invariant) — only how evenly a
    // group spreads over tasks. Three layouts, cheapest first:
    //  - hexOrdered: orderCol is one of this library's lowercase fixed-width
    //    hex keys (md5 / hex13 / deterministicShuffle's shuffle_key), whose
    //    first two digits are already a uniform order-consistent bucket —
    //    ZERO pre-pass, like capPerGroupTokens.
    //  - boundarySource: sample split points from a CHEAPER frame holding
    //    the same order column (e.g. the raw scan under an expensive
    //    dedup+mix pipeline) instead of re-running the full input per pass.
    //  - default: sample the input itself (persist expensive upstreams).
    val bucket =
      if (hexOrdered) hexBucket(orderCol)
      else rangeBucket(boundarySource.getOrElse(df), orderCol)
    bucketedCumSum(df.withColumn("n_tokens", tokenCount.cast("long")),
        groupCols, Seq(orderCol.asc), bucket, col("n_tokens"), "__cum_end")
      .withColumn("token_start", col("__cum_end") - col("n_tokens"))
      .withColumn("seq_first", floor(col("token_start") / maxSeqLen))
      .withColumn("seq_last",
        when(col("n_tokens") === 0L, col("seq_first") - 1L)
          .otherwise(floor((col("__cum_end") - 1) / maxSeqLen)))
      .withColumn("seq_offset", col("token_start") % maxSeqLen)
      .drop("__cum_end")
  }

  /**
   * Materialized training sequences — the loader-side twin of
   * [[packSequences]]: one row per (group, sequence) carrying the ordered
   * document SLICES that tile it, so a training loader reads sequences
   * directly instead of hand-rolling the (group, seq range) lookup the
   * [[packSequences]] scaladoc describes.
   *
   * Each document explodes into the `seq_first..seq_last` range it spans —
   * a BOUNDED fan-out of at most ceil(n_tokens / maxSeqLen) + 1 rows per
   * document, no windows — then one (group, seq_id) shuffle assembles each
   * sequence's slices. A slice is (pos, id, start, len): the document
   * `id`'s tokens [start, start + len) occupy the sequence's positions
   * [pos, pos + len). Slices tile the sequence gaplessly in layout order
   * (`pos` is unique within a sequence, so the sorted array IS the
   * loader's read plan); only the group's final sequence may be short
   * (`seq_tokens < maxSeqLen`). Documents with a zero (or null) token
   * count occupy no sequence, exactly as in [[packSequences]].
   *
   * Scale shape: per-sequence state is bounded by maxSeqLen (a sequence
   * holds at most maxSeqLen slices), and a group's sequences spread over
   * the (group, seq_id) shuffle — a 95%-skew group never funnels through
   * one reducer. The layout knobs (`hexOrdered`, `boundarySource`) pass
   * straight to [[packSequences]].
   */
  def packSequenceRows(
      df: DataFrame, groupCols: Seq[Column], orderCol: Column, idCol: Column,
      tokenCount: Column, maxSeqLen: Int,
      hexOrdered: Boolean = false,
      boundarySource: Option[DataFrame] = None): DataFrame = {
    val packed = packSequences(df, groupCols, orderCol, tokenCount, maxSeqLen,
      hexOrdered, boundarySource)
    val exploded = packed
      .filter(col("n_tokens") > 0)
      .select(groupCols ++ Seq(idCol.as("__id"), col("n_tokens"),
        col("token_start"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq_id")): _*)
    val seqStart = col("seq_id") * maxSeqLen
    val gStart = greatest(col("token_start"), seqStart)
    val gEnd = least(col("token_start") + col("n_tokens"),
      seqStart + maxSeqLen)
    exploded
      .select(groupCols ++ Seq(col("seq_id"),
        struct((gStart - seqStart).as("pos"), col("__id").as("id"),
          (gStart - col("token_start")).as("start"),
          (gEnd - gStart).as("len")).as("__slice")): _*)
      .groupBy(groupCols :+ col("seq_id"): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__slice.len")).as("seq_tokens"),
        sort_array(collect_list(col("__slice"))).as("slices"))
  }

  /**
   * Resolve [[packSequenceRows]]' slices to actual TOKEN TEXT — the final
   * loader step, and the end-to-end proof of the layout: concatenating a
   * group's `seq_text`s in seq_id order reproduces the group's documents
   * in layout order token-for-token (asserted by the round-trip property
   * test and the q_corpus_pack_texts oracle).
   *
   * One planner-chosen equi-join attaches each slice's document text
   * (slices explode back to one row per (sequence, doc) — the same
   * bounded fan-out they were built from), `slice(words, start+1, len)`
   * cuts the token span per row (codegen'd, zero shuffle), and one
   * (group, seq_id) aggregation reassembles each sequence in `pos` order.
   * Shuffled bytes are one copy of each document's spanned tokens —
   * materializing text costs text movement, there is no cheaper shape.
   */
  def packedSequenceText(packedRows: DataFrame, docs: DataFrame,
      groupCols: Seq[Column], idCol: Column, textCol: Column): DataFrame = {
    val d = docs.select(idCol.as("__did"),
      graft.functions.TextFunctions.words(textCol).as("__w"))
    val ex = packedRows
      .select(groupCols ++ Seq(col("seq_id"), col("seq_tokens"),
        explode(col("slices")).as("__s")): _*)
    ex.join(d, ex("__s.id") === d("__did"))
      .select(groupCols ++ Seq(col("seq_id"), col("seq_tokens"),
        struct(col("__s.pos").as("pos"),
          slice(col("__w"), col("__s.start") + 1, col("__s.len"))
            .as("toks")).as("__piece")): _*)
      .groupBy(groupCols :+ col("seq_id"): _*)
      .agg(max(col("seq_tokens")).as("seq_tokens"),
        array_join(flatten(transform(
            sort_array(collect_list(col("__piece"))),
            p => p.getField("toks"))), " ").as("seq_text"))
  }

  /** Order-consistent bucket expression for an ARBITRARY orderable
    * `orderCol` (packSequences' caller picks the layout order — often a
    * doc id or shuffle key, not a hash this library minted): boundaries
    * come from a per-partition reservoir sample of the key (fixed seed per
    * partition index — deterministic on a fixed input partitioning), and
    * the bucket is "how many boundaries the key is >= ", a short codegen'd
    * comparison chain. Only bucket BALANCE depends on the sample; the
    * prefix-sum VALUES are bucketing-invariant, so a skewed or stale
    * sample degrades parallelism, never correctness. Null keys sort first
    * under `asc` and get bucket 0 (null >= b is null -> indicator 0). The
    * per-partition sample (8 keys * input partitions) re-reservoirs to a
    * FIXED [[MaxBoundaryKeys]] driver-side cap, so driver memory does not
    * grow with cluster scale; the cap and the driver-side sort shape only
    * bucket BALANCE, never values ([[bucketOf]] is a sum of per-boundary
    * indicators — monotone in the key for ANY boundary multiset). */
  private[operators] def rangeBucket(df: DataFrame, orderCol: Column): Column =
    bucketOf(orderCol, sampledBoundaries(df, orderCol))

  /** The boundary-sampling half of [[rangeBucket]], exposed so a caller can
    * sample from a CHEAPER source than the full plan the bucket expression
    * will run over (e.g. [[Relational.asofJoin]] samples the raw time
    * column of both inputs, skipping the right side's dedup shuffle). */
  /** Driver-side cap on collected boundary-sample keys: 64k 16-byte-ish
    * keys is ~1 MB however many input partitions the cluster has. */
  private[operators] val MaxBoundaryKeys = 65536

  private[operators] def sampledBoundaries(
      df: DataFrame, orderCol: Column): Seq[Any] = {
    val keyed = df.select(orderCol.as("__k"))
    // aim for ~2x CumSumBuckets total samples whatever the partition
    // count: a 4-partition input at 8/partition would yield only ~32
    // boundaries — 8x coarser buckets than designed, so a hot group
    // spreads 8x worse. Per-partition cost stays capped at 8 once the
    // input has >= 64 partitions (the cluster-scale case).
    val rdd = keyed.rdd
    val parts = math.max(1, rdd.getNumPartitions)
    val perPart = math.max(8, (2 * CumSumBuckets + parts - 1) / parts)
    // count rows alongside the reservoir: the bucket COUNT below scales
    // with observed data density, so tiny inputs don't pay 256 buckets'
    // per-group overhead for parallelism they cannot use
    val rowCount = keyed.sparkSession.sparkContext.longAccumulator
    val sampled = rdd.mapPartitionsWithIndex { (idx, it) =>
      val rng = new java.util.Random(0x9E3779B97F4A7C15L ^ idx)
      val res = new Array[org.apache.spark.sql.Row](perPart)
      var n = 0L
      it.foreach { r =>
        n += 1
        if (n <= perPart) res((n - 1).toInt) = r
        else {
          val j = math.abs(rng.nextLong() % n)
          if (j < perPart) res(j.toInt) = r
        }
      }
      rowCount.add(n)
      res.iterator.filter(_ != null)
    }.collect()
    // second-level reservoir: one fixed seed over the per-partition samples
    // keeps at most MaxBoundaryKeys rows regardless of input partition count
    val capped =
      if (sampled.length <= MaxBoundaryKeys) sampled
      else {
        val rng = new java.util.Random(0x9E3779B97F4A7C15L)
        val res = new Array[org.apache.spark.sql.Row](MaxBoundaryKeys)
        var n = 0L
        sampled.foreach { r =>
          n += 1
          if (n <= MaxBoundaryKeys) res((n - 1).toInt) = r
          else {
            val j = math.abs(rng.nextLong() % n)
            if (j < MaxBoundaryKeys) res(j.toInt) = r
          }
        }
        res
      }
    val keys = capped.iterator.filter(_ != null)
      .map(_.get(0)).filter(_ != null).toArray
    if (keys.isEmpty) return Nil
    // sort DRIVER-side (every key type this library buckets — string,
    // numeric, timestamp, date — is Comparable); a mis-sorted or unsorted
    // boundary list can only unbalance buckets, never change values, so a
    // non-Comparable key type just falls back to encounter order
    val sorted = scala.util.Try(
      keys.sortWith((a, b) =>
        a.asInstanceOf[Comparable[Any]].compareTo(b) < 0)
    ).getOrElse(keys)
    // density-aware bucket count: ~1k rows per bucket up to the
    // [[CumSumBuckets]] ceiling. A 5k-row input gets ~16 buckets (all the
    // parallelism its size can use, an order less per-group subtotal
    // overhead); a corpus-scale input gets the full 256. Bucket count
    // shapes only balance/parallelism — values are bucketing-invariant.
    val densityB = math.max(16L, rowCount.value / 1000L)
    val nB = math.min(math.min(CumSumBuckets.toLong, densityB),
      sorted.length + 1L).toInt
    (1 until nB)
      .map(i => sorted((i.toLong * sorted.length / nB).toInt))
      .distinct
  }

  /** "How many boundaries is the key >= " — the order-consistent bucket
    * expression over driver-held `boundaries` (see [[rangeBucket]]).
    * The indicator sum is folded as a BALANCED tree (depth ~log2(256))
    * rather than a left-nested 256-deep Add chain: the deep chain broke
    * whole-stage codegen and made every plan carrying it megabytes large
    * — a real per-batch planning tax. (A lambda-based
    * size(filter(array, ...)) form would be flatter still, but a lambda
    * capturing an outer attribute fails to re-resolve inside [[Relational
    * .asofJoin]]'s union, so the fold stays lambda-free.) */
  private[operators] def bucketOf(orderCol: Column, boundaries: Seq[Any]): Column = {
    def tree(cols: Seq[Column]): Column =
      if (cols.sizeIs <= 1) cols.headOption.getOrElse(lit(0))
      else tree(cols.grouped(2).map(_.reduce(_ + _)).toSeq)
    tree(boundaries.map(b => when(orderCol >= lit(b), 1).otherwise(0)))
  }

  /**
   * Stratified (per-group) sampling — the "mixture re-weighting" step of a
   * training-data recipe: keep ~`rates(group)` of each group's rows
   * (`defaultRate` for groups not in the map), chosen by content hash of
   * `key` like [[hashSample]]. A pure per-row filter — NO shuffle, no
   * group-size pre-pass — so re-weighting a 100 TB mixture is a scan that
   * pipelines into the next stage, and the same row is kept or dropped
   * regardless of partitioning, engine, or run.
   */
  def stratifiedSample(
      df: DataFrame, groupCol: Column, rates: Map[String, Double], key: Column,
      defaultRate: Double = 1.0): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldRight(lit(hexThreshold(defaultRate))) {
      case ((g, r), acc) => when(groupCol === lit(g), lit(hexThreshold(r))).otherwise(acc)
    }
    df.filter(hex13(key) < threshold)
  }

  /**
   * Temperature re-weighting of a grouped mixture — the standard
   * multi-source LLM data recipe (multilingual/domain sampling with
   * p_group ∝ n_group^alpha): per-group keep-rates such that the sampled
   * mixture's expected group sizes follow size^alpha, scaled so the
   * highest-rate group keeps `maxRate` of its rows. alpha = 1 keeps
   * proportions unchanged; alpha = 0 equalizes expected group counts
   * (down-samples the head, leaves the tail whole); in between damps the
   * head smoothly. One count pre-pass (rows-per-group, metadata scale)
   * computes the rates DRIVER-side; feed them to [[stratifiedSample]]
   * (whose per-row hash filter is the whole runtime cost) — or call
   * [[temperatureSample]] for the one-step form. Rates are returned so
   * reports and oracles can render the exact thresholds used.
   */
  def temperatureRates(df: DataFrame, groupCol: Column, alpha: Double,
      maxRate: Double = 1.0): Map[String, Double] = {
    require(alpha >= 0.0, s"alpha must be >= 0, got $alpha")
    require(maxRate > 0.0 && maxRate <= 1.0, s"maxRate must be in (0,1], got $maxRate")
    val counts = df.groupBy(groupCol.cast("string").as("g"))
      .agg(count(lit(1)).as("n"))
      .filter(col("g").isNotNull)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // one row per GROUP on the driver: mixtures have a handful of
    // sources/domains/languages; a high-cardinality group column is the
    // wrong input for temperature mixing, so fail it loudly
    require(counts.length <= 10000,
      s"temperatureRates: ${counts.length} distinct groups — temperature " +
        "mixing re-weights a handful of sources; for per-key sampling use " +
        "stratifiedSample with explicit rates or hashSample")
    val w = counts.map { case (g, n) => g -> math.pow(n.toDouble, alpha - 1.0) }
    val wMax = w.map(_._2).max
    w.map { case (g, ww) => g -> maxRate * ww / wMax }.toMap
  }

  /**
   * Sampling rates that hit TARGET mixture proportions exactly — the
   * "make the training mix 60% web / 30% code / 10% books" solver. Scales
   * the requested proportions to the largest total that needs NO
   * upsampling (the binding group keeps rate 1.0; every other group
   * downsamples), so output_d ≈ target_d · T with
   * T = min_d size_d / target_d. Driver-side pure math over per-group
   * sizes ([[temperatureRates]]' shape — a handful of domains, counted in
   * one aggregate); feed the rates to [[stratifiedSample]]. Groups absent
   * from `targets` get rate 0 (excluded from the mix); a target for a
   * group with zero rows is rejected loudly (the mix is infeasible).
   */
  def ratesForTargetMix(df: DataFrame, groupCol: Column,
      targets: Map[String, Double]): Map[String, Double] = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(_ > 0.0),
      s"target proportions must be positive: $targets")
    val counts = df.groupBy(groupCol.cast("string").as("g"))
      .agg(count(lit(1)).as("n"))
      .filter(col("g").isNotNull)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = targets.keySet.filter(g => counts.getOrElse(g, 0L) == 0L)
    require(missing.isEmpty,
      s"target mix is infeasible: group(s) ${missing.toSeq.sorted.mkString(",")} " +
        "have no rows — no downsampling of the others can produce their share")
    val total = targets.values.sum // normalize: callers may pass 60/30/10
    val t = targets.map { case (g, p) => counts(g) / (p / total) }.min
    targets.map { case (g, p) =>
      g -> math.min(1.0, (p / total) * t / counts(g))
    }
  }

  /** [[temperatureRates]] + [[stratifiedSample]] in one step (groups not in
    * the rate table — e.g. null group values — are dropped). */
  def temperatureSample(df: DataFrame, groupCol: Column, key: Column,
      alpha: Double, maxRate: Double = 1.0): DataFrame =
    stratifiedSample(df, groupCol,
      temperatureRates(df, groupCol, alpha, maxRate), key, defaultRate = 0.0)

  /**
   * Near-dup-aware train/val/test split: every document in one near-dup
   * CLUSTER lands in the same split — the eval-hygiene guard against
   * train/test leakage through paraphrase copies, which a plain per-doc
   * hash split scatters across splits with probability 1-Σw². `pairs` is
   * any near-dup pair table (doc_a, doc_b) — [[Dedup.ngramJaccardPairs]],
   * [[Dedup.minHashLshPairs]], [[Dedup.simHashPairs]] ... — so the leakage
   * definition composes with every dedup family. The split key is the
   * cluster representative (min id in the connected component; a doc with
   * no near-dup represents itself): still a pure content-derived function,
   * reproducible on any partitioning. Adds `split_rep` and `split`.
   *
   * Scale shape: candidate pairs come from the caller's bucketed pipeline
   * (never all-pairs); [[Dedup.clusters]] label-propagates over EDGES only
   * (docs without a near-dup never enter the iteration); the cluster map —
   * one row per doc WITH a near-dup, typically a small fraction — joins
   * back planner-chosen, and the split itself is a per-row hash expression.
   */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      weights: Seq[(String, Double)]): DataFrame =
    leakageSafeSplitWith(docs, idCol, Dedup.clusters(pairs), weights)

  /** [[leakageSafeSplit]] over a PRECOMPUTED component map (doc_id,
    * cluster) — for callers that already ran [[Dedup.clusters]] (clustering
    * is the expensive stage; the split itself is a hash expression). */
  def leakageSafeSplitWith(docs: DataFrame, idCol: String, comps: DataFrame,
      weights: Seq[(String, Double)]): DataFrame = {
    val c = comps.select(col("doc_id").as("__cid"), col("cluster"))
    val withRep = docs.join(c, col(idCol) === col("__cid"), "left")
      .withColumn("split_rep", coalesce(col("cluster"), col(idCol)))
      .drop("__cid", "cluster")
    hashSplit(withRep, col("split_rep").cast("string"), weights)
  }

  /** DuckDB rendering of [[stratifiedSample]]'s keep-predicate (oracle twin). */
  def sqlStratifiedKeep(
      groupCol: String, rates: Map[String, Double], keyCol: String,
      defaultRate: Double = 1.0): String = {
    val cases = rates.toSeq.sortBy(_._1).map { case (g, r) =>
      s"WHEN $groupCol = '${sqlEscape(g)}' THEN '${hexThreshold(r)}'"
    }.mkString(" ")
    s"substr(md5($keyCol), 1, 13) < (CASE $cases ELSE '${hexThreshold(defaultRate)}' END)"
  }

  /** Group keys are data, not SQL — escape the one metacharacter a string
    * literal can smuggle in. */
  private def sqlEscape(s: String): String = s.replace("'", "''")

  /** DuckDB rendering of the same split expression (oracle twin). */
  def sqlHashSplit(col: String, weights: Seq[(String, Double)]): String = {
    val cum = weights.scanLeft(0.0)(_ + _._2).tail
    val h = s"substr(md5($col), 1, 13)"
    weights.init.zip(cum.init).foldRight(s"'${sqlEscape(weights.last._1)}'") {
      case (((label, _), upper), acc) =>
        s"CASE WHEN $h < '${hexThreshold(upper)}' THEN '${sqlEscape(label)}' ELSE $acc END"
    }
  }

  /**
   * BEST-FIT sequence packing — the no-split alternative to
   * [[packSequences]]' concat-and-chunk: every document lands WHOLE in
   * exactly one `maxSeqLen`-token training sequence (fine-tuning and
   * long-context curricula often forbid splitting a document mid-thought),
   * packed by deterministic FIRST-FIT-DECREASING within each (group,
   * bucket): docs sort by (n_tokens desc, id asc) and each goes into the
   * FIRST open sequence with room, else opens a new one — the classic FFD
   * bin-packing recipe (<= 11/9 OPT + 1 bins), far denser than packing in
   * arrival order when lengths are mixed.
   *
   * Scale shape: the same bucketed machinery as [[packSequences]] — each
   * group's docs spread over buckets (default: the first two hex digits
   * of md5(id), [[bucketedCumSum]]'s hexBucket; pass `bucketCol` to
   * override, e.g. an integer-arithmetic bucket an external replayer can
   * compute), each (group, bucket) packs independently in ONE task with
   * O(bins) state, and sequence ids are globally unique within a group by
   * construction (`bucket * 2^32 + bin`). Bucketing costs fill only at
   * bucket seams (one possibly-short final bin per bucket); no window, no
   * single-reducer group, no token materialization.
   *
   * Output: one row per input doc — group columns, `id`, `n_tokens`,
   * `seq_id` (the sequence the WHOLE doc occupies; -1 for zero-token
   * docs, [[packSequences]]' occupy-nothing convention), `seq_offset`
   * (token position inside the sequence). A doc longer than `maxSeqLen`
   * fails LOUDLY — no-split packing cannot place it; filter or chunk
   * oversized docs upstream.
   */
  /**
   * [[packSequencesBestFit]] with the practical fallback for documents
   * LONGER than a sequence: each oversized doc splits into the MINIMAL
   * piece set (full maxSeqLen pieces + one remainder — the fewest cuts
   * any packing could make), and the pieces pack as ordinary units.
   * Full pieces fill a sequence exactly; only the remainder competes in
   * FFD. Output adds a `piece` column (0 for docs that were never split),
   * so "no doc spans sequences" holds piece-wise and a doc's pieces are
   * recoverable in order. Same determinism and bucketed machinery; a
   * doc's pieces inherit its bucket.
   */
  def packSequencesBestFitChunked(
      df: DataFrame, groupCols: Seq[Column], idCol: Column,
      tokenCount: Column, maxSeqLen: Int,
      bucketCol: Option[Column] = None,
      numBuckets: Int = CumSumBuckets): DataFrame = {
    require(maxSeqLen > 0, s"maxSeqLen must be positive, got $maxSeqLen")
    val nt = tokenCount.cast("long")
    // minimal piece set: ceil(n/max) pieces, all but the last full-length;
    // zero-token docs keep one zero piece (the occupy-nothing row)
    val nPieces = greatest(ceil(nt / lit(maxSeqLen.toLong)).cast("long"), lit(1L))
    val pieces = df.select(
        groupCols ++ Seq(idCol.as("__pid"), nt.as("__nt"),
          bucketCol.getOrElse(
              hexBucketN(hex13(idCol.cast("string")), numBuckets))
            .cast("int").as("__pbkt"),
          explode(sequence(lit(0L), nPieces - 1L)).as("piece")): _*)
      .withColumn("__plen",
        least(lit(maxSeqLen.toLong), col("__nt") - col("piece") * maxSeqLen))
    val gNames = pieces.columns
      .filterNot(Set("__pid", "__nt", "__pbkt", "piece", "__plen")).toSeq
    val packed = packSequencesBestFit(
      pieces, gNames.map(col),
      struct(col("__pid").as("id"), col("piece").as("piece")),
      col("__plen"), maxSeqLen, Some(col("__pbkt")), numBuckets)
    packed.select(gNames.map(col) ++ Seq(
      col("id.id").as("id"), col("id.piece").as("piece"),
      col("n_tokens"), col("seq_id"), col("seq_offset")): _*)
  }

  def packSequencesBestFit(
      df: DataFrame, groupCols: Seq[Column], idCol: Column,
      tokenCount: Column, maxSeqLen: Int,
      bucketCol: Option[Column] = None,
      numBuckets: Int = CumSumBuckets): DataFrame = {
    require(maxSeqLen > 0, s"maxSeqLen must be positive, got $maxSeqLen")
    require(numBuckets > 0 && numBuckets <= (1 << 30),
      s"numBuckets must be in [1, 2^30], got $numBuckets")
    val bucket =
      bucketCol.getOrElse(hexBucketN(hex13(idCol.cast("string")), numBuckets))
    val prep = df.select(
      groupCols ++ Seq(bucket.cast("int").as("__bkt"), idCol.as("id"),
        tokenCount.cast("long").as("n_tokens")): _*)
    val gNames = prep.columns.dropRight(2).toSeq // group names + __bkt
    val nKey = gNames.size
    val sorted = prep
      .repartition(gNames.map(col): _*)
      .sortWithinPartitions(
        gNames.map(col) ++ Seq(col("n_tokens").desc, col("id").asc): _*)
    val outSchema = org.apache.spark.sql.types.StructType(
      prep.schema.fields.filterNot(_.name == "__bkt") ++ Seq(
        org.apache.spark.sql.types.StructField("seq_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("seq_offset",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val bktIdx = nKey - 1
    sorted.mapPartitions { rows =>
      // FFD state for the CURRENT (group, bucket) run — input is sorted by
      // the full key, so a key change is a state reset, and one task may
      // carry many (group, bucket) runs back to back
      var curKey: Seq[Any] = null
      var bins: FirstFitBins = null
      rows.map { r =>
        val key = (0 until nKey).map(r.get)
        if (key != curKey) { curKey = key; bins = new FirstFitBins(maxSeqLen) }
        val nt = r.getLong(nKey + 1)
        require(nt <= maxSeqLen,
          s"document ${r.get(nKey)} has $nt tokens > maxSeqLen $maxSeqLen " +
            "— no-split packing cannot place it; filter or chunk oversized " +
            "docs upstream")
        val (seqId, off) =
          if (nt == 0L) (-1L, 0L)
          else {
            // fast-path: a FULL-length doc can never fit an open bin
            // (every open bin already holds >= 1 token), so it opens its
            // own bin without a lookup — the exact placement first-fit
            // would make, minus the search
            val found = if (nt == maxSeqLen) -1 else bins.findFirstFit(nt)
            val i = if (found < 0) bins.open() else found
            val off0 = maxSeqLen - bins.residual(i)
            bins.place(i, nt)
            ((r.getInt(bktIdx).toLong << 32) | i.toLong, off0)
          }
        org.apache.spark.sql.Row.fromSeq(
          (0 until bktIdx).map(r.get) ++ Seq(r.get(nKey), nt, seqId, off))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /**
   * One (group, bucket) run's open-bin state for [[packSequencesBestFit]]:
   * a max segment tree over per-bin residual capacity, so FIRST-FIT — the
   * lowest-indexed bin whose residual fits the doc — resolves in O(log
   * bins) instead of a linear scan of every open bin. The scan mattered:
   * FFD never closes a bin, so a run holding 1/numBuckets of a group's
   * corpus accretes millions of open bins at 100 TB, and the pathological
   * workload ([[packSequencesBestFitChunked]]'s full-length pieces, which
   * fit NO open bin) walked all of them per piece — quadratic in pieces.
   * Placement semantics are bit-identical to the scan: the tree descends
   * left-first, returning the same lowest index first-fit would.
   */
  private final class FirstFitBins(maxSeqLen: Int) {
    private var cap = 1024
    private var tree = new Array[Long](2 * cap) // leaf i at tree(cap+i)
    private var bins = 0
    def count: Int = bins
    def residual(i: Int): Long = tree(cap + i)
    /** Lowest-indexed open bin with residual >= need, or -1. Unopened
      * slots hold residual 0 and `need` >= 1, so they never match. */
    def findFirstFit(need: Long): Int = {
      if (tree(1) < need) return -1
      var node = 1
      while (node < cap)
        node = if (tree(2 * node) >= need) 2 * node else 2 * node + 1
      node - cap
    }
    def open(): Int = {
      if (bins == cap) grow()
      val i = bins
      bins += 1
      update(i, maxSeqLen.toLong)
      i
    }
    def place(i: Int, nt: Long): Unit = update(i, tree(cap + i) - nt)
    private def update(i: Int, residual: Long): Unit = {
      var node = cap + i
      tree(node) = residual
      node >>= 1
      while (node >= 1) {
        tree(node) = math.max(tree(2 * node), tree(2 * node + 1))
        node >>= 1
      }
    }
    private def grow(): Unit = {
      val nc = cap * 2
      val nt = new Array[Long](2 * nc)
      System.arraycopy(tree, cap, nt, nc, bins)
      var i = nc - 1
      while (i >= 1) { nt(i) = math.max(nt(2 * i), nt(2 * i + 1)); i -= 1 }
      cap = nc
      tree = nt
    }
  }

  /** [[hexBucket]] generalized to `n` order-key buckets. n = 256 is the
    * 2-hex-digit fast path (identical buckets to [[hexBucket]], keeping
    * default results stable); other widths take the first 8 hex digits
    * mod n — NOT order-consistent across bucket boundaries, which the
    * packers don't need (each bucket is an independent packing run). */
  private def hexBucketN(hexKey: Column, n: Int): Column =
    if (n == CumSumBuckets) hexBucket(hexKey)
    else coalesce(
      pmod(conv(substring(hexKey, 1, 8), 16, 10).cast("long"), lit(n.toLong))
        .cast("int"),
      lit(0))
}
