package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality constraint checking — the admission gate a production
 * training-data pipeline runs before (and after) every transform stage:
 * named row-level expectations evaluated with COUNTED violations, never
 * fail-on-first (a 100 TB run must report the full damage profile of a
 * bad shard in one pass, not die on its first row).
 *
 * Scale shape: all rules evaluate in ONE scan — each rule is a pair of
 * map-side-combinable aggregates (violation count + min offending id), so
 * the plan is a single HashAggregate over the input with a 1-row result,
 * then a constant-width driver-side unpivot to per-rule rows. No shuffle
 * carries data; adding rules adds columns to the aggregate, not passes.
 */
object Validation {

  /**
   * Evaluate `rules` (name -> predicate that must hold per row) over `df`
   * in one pass. Returns one row per rule, in the given order:
   * (rule, n_rows, n_violations, violation_frac, first_violation, pass).
   *
   *  - A predicate evaluating to NULL counts as a VIOLATION (the rule did
   *    not hold), so `col("x") > 0` flags null x — the semantics an
   *    expectation wants, where SQL's three-valued logic would silently
   *    pass nulls through a WHERE-style filter.
   *  - `first_violation` is the MINIMUM offending `idCol` value (cast to
   *    string) — a bounded, deterministic debugging pointer, not an
   *    unbounded example list.
   *  - `violation_frac` is stableRound(·, 6) for cross-engine gating.
   */
  def checkConstraints(df: DataFrame, idCol: Column,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkConstraints needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be distinct")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.flatMap {
      case ((_, pred), i) => Seq(
        // NULL predicate = violation: coalesce the HOLDS side, not the
        // violation side
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v_$i"),
        min(when(!coalesce(pred, lit(false)), idCol.cast("string")))
          .as(s"__id_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perRule = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i).as("__ord"), lit(name).as("rule"), col("__n").as("n_rows"),
        coalesce(col(s"__v_$i"), lit(0L)).as("n_violations"),
        col(s"__id_$i").as("first_violation"))
    }
    one.select(explode(array(perRule: _*)).as("r"))
      .select(col("r.__ord").as("__ord"), col("r.rule").as("rule"),
        col("r.n_rows").as("n_rows"), col("r.n_violations").as("n_violations"),
        graft.functions.TextFunctions.stableRound(
          when(col("r.n_rows") === 0L, lit(0.0)).otherwise(
            col("r.n_violations").cast("double") / col("r.n_rows").cast("double")),
          6).as("violation_frac"),
        col("r.first_violation"),
        (col("r.n_violations") === 0L).as("pass"))
      .orderBy(col("__ord")).drop("__ord")
  }

  /**
   * Uniqueness expectation over a key — the dataset-level twin of
   * [[checkConstraints]]' row rules: one row
   * (n_rows, n_distinct_keys, n_dup_keys, n_dup_rows, example_dup_key,
   * pass). NULL key parts participate as ordinary values (two all-null
   * keys are duplicates of each other — exactly the id-collision a
   * pipeline needs to hear about).
   *
   * Scale shape: ONE hash aggregation on the key (map-side combined)
   * followed by a constant-width re-aggregation of the per-key counts —
   * the [[Dedup.exactRows]] shuffle shape; `example_dup_key` is the
   * lexicographic min of the stringified duplicated key, bounded state.
   */
  def checkUnique(df: DataFrame, keyCols: Seq[Column]): DataFrame = {
    require(keyCols.nonEmpty, "checkUnique needs at least one key column")
    val keyStr = concat_ws("|",
      keyCols.map(c => coalesce(c.cast("string"), lit("<null>"))): _*)
    df.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__n"), min(keyStr).as("__k"))
      .agg(coalesce(sum(col("__n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_distinct_keys"),
        coalesce(sum(when(col("__n") > 1, 1L).otherwise(0L)), lit(0L))
          .as("n_dup_keys"),
        coalesce(sum(when(col("__n") > 1, col("__n")).otherwise(0L)), lit(0L))
          .as("n_dup_rows"),
        min(when(col("__n") > 1, col("__k"))).as("example_dup_key"))
      .withColumn("pass", col("n_dup_keys") === 0L)
  }

  /**
   * Referential expectation: child rows whose `keyCol` does not appear in
   * `parent`'s `refCol` — one row (n_child_rows, n_null_keys, n_orphans,
   * orphan_frac, first_orphan, pass). NULL child keys are counted
   * SEPARATELY (n_null_keys), not as orphans — an optional FK is a
   * different defect than a dangling one; gate nulls with a
   * [[checkConstraints]] rule when they are illegal too.
   *
   * Scale shape: ONE pass over the child — its keys left-join the
   * parent's DISTINCT keys (multiplicity exactly 1, so row counts are
   * preserved; keys only, neither table's payload shuffles) and a single
   * constant-width aggregate computes rows/nulls/orphans/min-orphan
   * together; `orphan_frac` is over non-null child keys, stableRound(6).
   */
  def checkReferential(child: DataFrame, keyCol: Column,
      parent: DataFrame, refCol: Column): DataFrame = {
    val orphan = col("__k").isNotNull && col("__r").isNull
    child.select(keyCol.as("__k"))
      .join(parent.select(refCol.as("__r")).distinct(),
        col("__k") === col("__r"), "left")
      .agg(count(lit(1)).as("n_child_rows"),
        coalesce(sum(when(col("__k").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_null_keys"),
        coalesce(sum(when(orphan, 1L).otherwise(0L)), lit(0L)).as("n_orphans"),
        min(when(orphan, col("__k").cast("string"))).as("first_orphan"))
      .select(
      col("n_child_rows"), col("n_null_keys"), col("n_orphans"),
      graft.functions.TextFunctions.stableRound(
        when(col("n_child_rows") - col("n_null_keys") === 0L, lit(0.0))
          .otherwise(col("n_orphans").cast("double") /
            (col("n_child_rows") - col("n_null_keys")).cast("double")),
        6).as("orphan_frac"),
      col("first_orphan"), (col("n_orphans") === 0L).as("pass"))
  }

  /**
   * Distribution drift between two snapshots of a numeric column — the
   * population-stability-index (PSI) monitor a pipeline runs between a
   * reference batch and each new batch to catch silent upstream shifts
   * (scale changes, truncation, a source going dark) before they reach
   * training.
   *
   * Fixed equi-width histogram over `[lo, hi)` with `buckets` cells;
   * values outside the range clamp into the edge cells (a drifted tail
   * lands in a bucket instead of vanishing), NULLs and NaNs are excluded
   * on both sides (Spark's NaN-is-largest ordering would otherwise clamp
   * NaN silently into the top cell, indistinguishable from a genuine high
   * tail — a NaN flood is a [[checkConstraints]] rule, not a histogram
   * cell). Per-cell probabilities are Laplace-smoothed with `alpha` so an
   * empty cell never divides by zero: `p = (n + alpha) / (N + alpha*B)`.
   * Output is one row per bucket 0..B-1 (empty cells included):
   * (bucket, lo_edge, hi_edge, n_ref, n_cur, p_ref, p_cur, psi) with
   * `psi = (p_cur - p_ref) * ln(p_cur / p_ref)` — total PSI is the sum;
   * the conventional alarm thresholds are ~0.1 (investigate) / ~0.25
   * (block).
   *
   * Scale shape: each snapshot reduces in ONE map-side-combined aggregate
   * to at most B rows; the dense bucket frame (a B-row range) left-joins
   * the two histograms and the two grand totals attach as one-row scalar
   * aggregates — nothing data-sized ever shuffles or reaches the driver.
   * The bucket edges are FIXED by the caller (take them from the
   * reference's known domain), so the monitor is deterministic and
   * incremental-friendly — unlike quantile-based edges, two runs are
   * comparable without re-fitting.
   */
  def distributionDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, buckets: Int,
      alpha: Double = 0.5): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive (smoothing), got $alpha")
    def hist(df: DataFrame, n: String): DataFrame = df
      .filter(driftValueOk(col(valueCol)))
      .select(driftBucket(col(valueCol), lo, hi, buckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(n))
    val frame = ref.sparkSession.range(buckets)
      .select(col("id").cast("int").as("bucket"))
    val joined = frame
      .join(hist(ref, "__nr"), Seq("bucket"), "left")
      .join(hist(cur, "__nc"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("__nr"), lit(0L)).as("n_ref"),
        coalesce(col("__nc"), lit(0L)).as("n_cur"))
    distributionDriftFromCounts(joined, lo, hi, buckets, alpha)
  }

  /** [[distributionDrift]]'s probability/PSI tail over an already-binned
    * dense count frame (bucket, n_ref, n_cur) — the entry point for
    * histograms accumulated elsewhere (e.g. the streaming monitor
    * [[graft.streaming.StreamOps.DriftTracker]]), so batch and streaming
    * PSI can never use different formulas. */
  def distributionDriftFromCounts(counts: DataFrame, lo: Double, hi: Double,
      buckets: Int, alpha: Double = 0.5): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive (smoothing), got $alpha")
    val w = (hi - lo) / buckets
    // grand totals as one-row scalar aggregates (the allowed one-row
    // cross-join shape); alpha-smoothed probabilities and the PSI term
    val totals = counts.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val pRef = (col("n_ref") + alpha) / (col("__tr") + alpha * buckets)
    val pCur = (col("n_cur") + alpha) / (col("__tc") + alpha * buckets)
    counts.crossJoin(totals)
      .select(col("bucket"),
        lit(lo).plus(col("bucket") * w).as("lo_edge"),
        lit(lo).plus((col("bucket") + 1) * w).as("hi_edge"),
        col("n_ref"), col("n_cur"),
        pRef.as("p_ref"), pCur.as("p_cur"),
        ((pCur - pRef) * log(pCur / pRef)).as("psi"))
      .orderBy(col("bucket"))
  }

  /**
   * Categorical distribution drift between two snapshots — PSI over
   * category frequencies (source mix, language mix, license mix): the
   * discrete twin of [[distributionDrift]], catching a feed going dark or
   * a new domain flooding in.
   *
   * Categories are the reference's top `topK` by count (ties broken by
   * category value, so the cut is deterministic); everything else — and
   * every current-only category — folds into the `__other__` row, so the
   * output stays bounded however many distinct values exist (urls,
   * domains). The fold row is keyed internally by an is-other flag, not
   * by its display string, so a real category named `__other__` neither
   * merges with nor double-counts against it (it appears as its own row
   * if it makes the top-K, and folds like any other tail value if not).
   * NULL categories are excluded on both sides. Probabilities
   * are Laplace-smoothed over the emitted rows (`alpha`), PSI per row as
   * in [[distributionDrift]]; output (category, n_ref, n_cur, p_ref,
   * p_cur, psi), top categories by descending reference count then
   * `__other__` last.
   *
   * Scale shape: each snapshot reduces map-side to its category counts;
   * the top-K cut is a distributed TakeOrdered over those counts (never a
   * global sort of data), and the bounded top set broadcasts back to
   * classify both histograms. Nothing data-sized shuffles.
   */
  def categoricalDrift(ref: DataFrame, cur: DataFrame, catCol: String,
      topK: Int = 50, alpha: Double = 0.5): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(alpha > 0, s"alpha must be positive (smoothing), got $alpha")
    val other = "__other__"
    def counts(df: DataFrame) = df
      .filter(col(catCol).isNotNull)
      .select(col(catCol).cast("string").as("__cat"))
      .groupBy(col("__cat")).agg(count(lit(1)).as("__n"))
    val refCounts = counts(ref)
    val top = refCounts
      .orderBy(col("__n").desc, col("__cat").asc).limit(topK)
      .select(col("__cat").as("__top"), col("__n").as("__topn"))
    // the fold row is keyed by an IS-OTHER boolean, not by the '__other__'
    // display string: a real category literally named '__other__' that
    // makes the top-K keeps (false, '__other__') and never merges with —
    // or double-joins against — the fold row (true, '__other__')
    def hist(df: DataFrame, n: String) = counts(df)
      .join(broadcast(top), col("__cat") === col("__top"), "left")
      .select(col("__top").isNull.as("__isoth"),
        coalesce(col("__top"), lit(other)).as("category"), col("__n"))
      .groupBy(col("__isoth"), col("category")).agg(sum(col("__n")).as(n))
    // dense frame: the top categories (rank-ordered) + the OTHER row, so
    // an emptied-out category still appears with n_cur = 0
    val frame = top
      .select(lit(false).as("__isoth"), col("__top").as("category"),
        col("__topn").as("__ord"))
      .unionByName(top.sparkSession.range(1)
        .select(lit(true).as("__isoth"), lit(other).as("category"),
          lit(-1L).as("__ord")))
    val joined = frame
      .join(hist(ref, "__nr"), Seq("__isoth", "category"), "left")
      .join(hist(cur, "__nc"), Seq("__isoth", "category"), "left")
      .select(col("category"), col("__ord"),
        coalesce(col("__nr"), lit(0L)).as("n_ref"),
        coalesce(col("__nc"), lit(0L)).as("n_cur"))
    categoricalDriftFromCounts(joined, alpha)
  }

  /** [[categoricalDrift]]'s probability/PSI tail over an already-folded
    * count frame (category, __ord, n_ref, n_cur) — the entry point for
    * counts accumulated elsewhere (the streaming monitor
    * [[graft.streaming.StreamOps.CatDriftTracker]]), so batch and
    * streaming categorical PSI can never use different formulas
    * ([[distributionDriftFromCounts]]'s contract). Rows order by __ord
    * descending then category (rank order, fold row last at __ord -1). */
  private[graft] def categoricalDriftFromCounts(joined: DataFrame,
      alpha: Double): DataFrame = {
    val totals = joined.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"), count(lit(1)).as("__rows"))
    val pRef = (col("n_ref") + alpha) / (col("__tr") + col("__rows") * alpha)
    val pCur = (col("n_cur") + alpha) / (col("__tc") + col("__rows") * alpha)
    joined.crossJoin(totals)
      .select(col("category"), col("__ord"), col("n_ref"), col("n_cur"),
        pRef.as("p_ref"), pCur.as("p_cur"),
        ((pCur - pRef) * log(pCur / pRef)).as("psi"))
      .orderBy(col("__ord").desc, col("category").asc)
      .drop("__ord")
  }

  /**
   * Per-group distribution drift — [[distributionDrift]] keyed by a
   * segment column (source, language, license): the monitoring shape a
   * multi-source corpus actually needs, because a 30% shift in one minor
   * feed disappears inside a corpus-level PSI but screams in its own
   * group's. ONE pass per snapshot; output one row per (group, bucket)
   * with per-GROUP smoothed probabilities and PSI terms — a group's PSI
   * is the sum of its bucket rows, comparable across groups regardless of
   * group size (each group normalizes by its own totals).
   *
   * Groups are the union of non-null groups seen in either snapshot
   * (cast to string), densified over all `buckets` cells, so a group that
   * went dark still shows its rows with n_cur = 0 — exactly the outage
   * the monitor exists to catch. NULL groups are excluded like NULL
   * categories in [[categoricalDrift]] (an unlabeled row is a
   * [[checkConstraints]] defect, not a segment). NULL/NaN values excluded
   * as in [[distributionDrift]].
   *
   * Scale shape: each snapshot reduces map-side to <= groups x B rows;
   * the dense (group, bucket) frame is groups x B (bounded — groups are
   * segments, not ids), per-group totals re-aggregate those counts, and
   * everything joins on group/bucket keys. Nothing data-sized shuffles.
   */
  def distributionDriftByGroup(ref: DataFrame, cur: DataFrame,
      groupCol: String, valueCol: String, lo: Double, hi: Double,
      buckets: Int, alpha: Double = 0.5): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive (smoothing), got $alpha")
    val w = (hi - lo) / buckets
    def hist(df: DataFrame, n: String): DataFrame = df
      .filter(col(groupCol).isNotNull && driftValueOk(col(valueCol)))
      .select(col(groupCol).cast("string").as("group"),
        driftBucket(col(valueCol), lo, hi, buckets).as("bucket"))
      .groupBy(col("group"), col("bucket")).agg(count(lit(1)).as(n))
    def grps(df: DataFrame) = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("group")).distinct()
    val frame = grps(ref).unionByName(grps(cur)).distinct()
      .crossJoin(ref.sparkSession.range(buckets)
        .select(col("id").cast("int").as("bucket")))
    val joined = frame
      .join(hist(ref, "__nr"), Seq("group", "bucket"), "left")
      .join(hist(cur, "__nc"), Seq("group", "bucket"), "left")
      .select(col("group"), col("bucket"),
        coalesce(col("__nr"), lit(0L)).as("n_ref"),
        coalesce(col("__nc"), lit(0L)).as("n_cur"))
    distributionDriftByGroupFromCounts(joined, lo, hi, buckets, alpha)
  }

  /** [[distributionDriftByGroup]]'s probability/PSI tail over an
    * already-binned dense count frame (group, bucket, n_ref, n_cur) — the
    * entry point for per-group histograms accumulated elsewhere (the
    * streaming monitor [[graft.streaming.StreamOps.GroupDriftTracker]]),
    * so batch and streaming per-group PSI can never use different
    * formulas ([[distributionDriftFromCounts]]'s contract). */
  def distributionDriftByGroupFromCounts(joined: DataFrame, lo: Double,
      hi: Double, buckets: Int, alpha: Double = 0.5): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive (smoothing), got $alpha")
    val w = (hi - lo) / buckets
    // per-GROUP grand totals (one narrow row per group, equi-joined back)
    val totals = joined.groupBy(col("group"))
      .agg(sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"))
    val pRef = (col("n_ref") + alpha) / (col("__tr") + alpha * buckets)
    val pCur = (col("n_cur") + alpha) / (col("__tc") + alpha * buckets)
    joined.join(broadcast(totals), Seq("group"))
      .select(col("group"), col("bucket"),
        lit(lo).plus(col("bucket") * w).as("lo_edge"),
        lit(lo).plus((col("bucket") + 1) * w).as("hi_edge"),
        col("n_ref"), col("n_cur"),
        pRef.as("p_ref"), pCur.as("p_cur"),
        ((pCur - pRef) * log(pCur / pRef)).as("psi"))
      .orderBy(col("group"), col("bucket"))
  }

  /**
   * Per-group CATEGORICAL drift — [[categoricalDrift]] keyed by a segment
   * column: the last cell of the drift matrix (numeric / categorical x
   * corpus-level / per-group), catching a mix shift INSIDE one feed that
   * corpus-level PSI averages away (one source's language classifier
   * breaking, one crawl's license mix flipping). Per GROUP: the
   * reference's top `topK` categories (count desc, name asc within the
   * group), everything else — and every cur-only category — folds into
   * the group's `__other__` row (keyed by an is-other boolean, never the
   * display string — [[categoricalDrift]]'s collision contract), and
   * probabilities smooth over the group's own emitted rows so each
   * group's PSI is comparable regardless of group size. Groups are the
   * union of non-null groups in either snapshot: a group present only in
   * `cur` has an empty top set, so ALL its rows fold to `__other__` with
   * n_ref = 0 — the "new feed showed up" alarm. NULL groups and NULL
   * categories are excluded.
   *
   * Scale shape: each snapshot reduces map-side to (group, category)
   * counts; the per-group top-K cut is a rank window WITH the
   * rank-limit (WindowGroupLimit) pushdown — never a global sort — and
   * the bounded top set (groups x K rows) broadcasts back to classify
   * both histograms. Output is groups x (K+1) rows; nothing data-sized
   * shuffles.
   */
  def categoricalDriftByGroup(ref: DataFrame, cur: DataFrame,
      groupCol: String, catCol: String, topK: Int = 50,
      alpha: Double = 0.5): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(alpha > 0, s"alpha must be positive (smoothing), got $alpha")
    val other = "__other__"
    def counts(df: DataFrame) = df
      .filter(col(groupCol).isNotNull && col(catCol).isNotNull)
      .select(col(groupCol).cast("string").as("group"),
        col(catCol).cast("string").as("__cat"))
      .groupBy(col("group"), col("__cat")).agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("__n").desc, col("__cat").asc)
    val top = counts(ref)
      .withColumn("__rk", row_number().over(w)).filter(col("__rk") <= topK)
      .select(col("group"), col("__cat").as("__top"), col("__n").as("__topn"))
    def hist(df: DataFrame, n: String) = {
      val c = counts(df)
      c.join(broadcast(top),
          c("group") === top("group") && c("__cat") === top("__top"), "left")
        .select(c("group").as("group"),
          col("__top").isNull.as("__isoth"),
          coalesce(col("__top"), lit(other)).as("category"), col("__n"))
        .groupBy(col("group"), col("__isoth"), col("category"))
        .agg(sum(col("__n")).as(n))
    }
    def grps(df: DataFrame) = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("group")).distinct()
    // dense frame: each group's top rows (rank-ordered) + its OTHER row —
    // union of groups from BOTH snapshots, so a cur-only group appears
    val frame = top
      .select(col("group"), lit(false).as("__isoth"),
        col("__top").as("category"), col("__topn").as("__ord"))
      .unionByName(grps(ref).unionByName(grps(cur)).distinct()
        .select(col("group"), lit(true).as("__isoth"),
          lit(other).as("category"), lit(-1L).as("__ord")))
    val joined = frame
      .join(hist(ref, "__nr"), Seq("group", "__isoth", "category"), "left")
      .join(hist(cur, "__nc"), Seq("group", "__isoth", "category"), "left")
      .select(col("group"), col("category"), col("__ord"),
        coalesce(col("__nr"), lit(0L)).as("n_ref"),
        coalesce(col("__nc"), lit(0L)).as("n_cur"))
    categoricalDriftByGroupFromCounts(joined, alpha)
  }

  /** [[categoricalDriftByGroup]]'s probability/PSI tail over an
    * already-folded count frame (group, category, __ord, n_ref, n_cur) —
    * the entry point for counts accumulated elsewhere (the streaming
    * monitor [[graft.streaming.StreamOps.GroupCatDriftTracker]]), so
    * batch and streaming can never use different formulas. Per-GROUP
    * totals and row counts drive the smoothing; rows order by group, then
    * rank (__ord desc), then category, fold row last. */
  private[graft] def categoricalDriftByGroupFromCounts(joined: DataFrame,
      alpha: Double): DataFrame = {
    val totals = joined.groupBy(col("group"))
      .agg(sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"),
        count(lit(1)).as("__rows"))
    val pRef = (col("n_ref") + alpha) / (col("__tr") + col("__rows") * alpha)
    val pCur = (col("n_cur") + alpha) / (col("__tc") + col("__rows") * alpha)
    joined.join(broadcast(totals), Seq("group"))
      .select(col("group"), col("category"), col("__ord"),
        col("n_ref"), col("n_cur"),
        pRef.as("p_ref"), pCur.as("p_cur"),
        ((pCur - pRef) * log(pCur / pRef)).as("psi"))
      .orderBy(col("group"), col("__ord").desc, col("category").asc)
      .drop("__ord")
  }

  /** [[distributionDriftByGroup]] that THROWS when ANY group's total PSI
    * exceeds `maxPsi` — the per-segment hard gate ([[requireDriftBelow]]'s
    * contract). The exception names every failing group with its total and
    * worst bucket, worst group first, so one failure report says WHICH
    * feed moved and WHERE; returns the per-(group, bucket) profile when
    * all groups pass. */
  def requireGroupDriftBelow(ref: DataFrame, cur: DataFrame,
      groupCol: String, valueCol: String, lo: Double, hi: Double,
      buckets: Int, maxPsi: Double,
      alpha: Double = 0.5): Array[org.apache.spark.sql.Row] = {
    require(maxPsi > 0, s"maxPsi must be positive, got $maxPsi")
    val profile = distributionDriftByGroup(
      ref, cur, groupCol, valueCol, lo, hi, buckets, alpha).collect()
    val failing = profile.groupBy(_.getString(0)).toSeq
      .map { case (g, rows) =>
        (g, rows.map(_.getDouble(8)).sum, rows.maxBy(_.getDouble(8)))
      }
      .filter(_._2 > maxPsi)
      .sortBy(-_._2)
    if (failing.nonEmpty) throw new IllegalStateException(
      s"per-group drift check failed on '$valueCol' (maxPsi $maxPsi): " +
        failing.map { case (g, total, worst) =>
          f"group '$g' PSI $total%.4f, worst bucket " +
            f"[${worst.getDouble(2)}%.4g, ${worst.getDouble(3)}%.4g) " +
            f"ref=${worst.getLong(4)} cur=${worst.getLong(5)} " +
            f"psi=${worst.getDouble(8)}%.4f"
        }.mkString("; "))
    profile
  }

  /** The drift histogram's admission predicate — shared by every hist/fit
    * path so batch and streaming can never disagree on what counts: NULL
    * and NaN values are excluded (NaN passes `isNotNull` and, via Spark's
    * NaN-is-largest ordering through greatest/least, would silently land
    * in the top bucket). */
  private[graft] def driftValueOk(c: Column): Column =
    c.isNotNull && !isnan(c.cast("double"))

  /** The drift histogram's bucket expression — shared by
    * [[distributionDrift]] and the streaming monitor
    * ([[graft.streaming.StreamOps.driftSink]]) so the two can never bin
    * differently: equi-width over [lo, hi), out-of-range values clamped
    * into the edge cells. */
  private[graft] def driftBucket(c: Column, lo: Double, hi: Double,
      buckets: Int): Column = {
    val w = (hi - lo) / buckets
    least(greatest(floor((c.cast("double") - lo) / w), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("int")
  }

  /** Total PSI of [[distributionDrift]] on the same arguments — the single
    * scalar a scheduler alarms on. */
  def psiTotal(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, buckets: Int, alpha: Double = 0.5): Double =
    distributionDrift(ref, cur, valueCol, lo, hi, buckets, alpha)
      .agg(sum(col("psi"))).head().getDouble(0)

  /** [[distributionDrift]] that THROWS when total PSI exceeds `maxPsi` —
    * the hard gate a pipeline calls before admitting a new batch
    * ([[requireConstraints]]'s shape). The exception carries the total and
    * the worst buckets so one failure report shows WHERE the distribution
    * moved; returns the per-bucket profile when it passes. The
    * conventional thresholds are ~0.1 (investigate) / ~0.25 (block). */
  def requireDriftBelow(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, buckets: Int, maxPsi: Double,
      alpha: Double = 0.5): Array[org.apache.spark.sql.Row] = {
    require(maxPsi > 0, s"maxPsi must be positive, got $maxPsi")
    val profile = distributionDrift(ref, cur, valueCol, lo, hi, buckets, alpha)
      .collect()
    val total = profile.map(_.getDouble(7)).sum
    if (total > maxPsi) {
      val worst = profile.sortBy(-_.getDouble(7)).take(3).map { r =>
        f"[${r.getDouble(1)}%.4g, ${r.getDouble(2)}%.4g) " +
          f"ref=${r.getLong(3)} cur=${r.getLong(4)} psi=${r.getDouble(7)}%.4f"
      }
      throw new IllegalStateException(
        f"distribution drift check failed: total PSI $total%.4f > $maxPsi " +
          s"on '$valueCol'; worst buckets: ${worst.mkString("; ")}")
    }
    profile
  }

  /** [[checkConstraints]] that THROWS (after the full profile is computed)
    * when any rule with a tolerance of zero — or a violation fraction above
    * its per-rule `tolerance` — fails: the hard-gate form a pipeline calls
    * between stages. The exception message carries every failing rule's
    * count, fraction, and first offending id, so one failure report covers
    * the whole batch. Returns the per-rule profile when all pass. */
  def requireConstraints(df: DataFrame, idCol: Column,
      rules: Seq[(String, Column)],
      tolerance: Map[String, Double] = Map.empty): Array[org.apache.spark.sql.Row] = {
    tolerance.keys.foreach(k => require(rules.exists(_._1 == k),
      s"tolerance for unknown rule '$k'"))
    val profile = checkConstraints(df, idCol, rules).collect()
    val failing = profile.filter { r =>
      // gate on the COUNTS, not the display-rounded fraction: 1 violation
      // in 10M rows rounds to 0.000000 but must still fail a
      // zero-tolerance rule (the whole point of a hard gate)
      val (n, v) = (r.getLong(1), r.getLong(2))
      val frac = if (n == 0) 0.0 else v.toDouble / n
      v > 0 && frac > tolerance.getOrElse(r.getString(0), 0.0)
    }
    if (failing.nonEmpty) throw new IllegalStateException(
      "constraint check failed: " + failing.map { r =>
        s"${r.getString(0)} (${r.getLong(2)}/${r.getLong(1)} rows = " +
          s"${r.getDouble(3)}, first offender id=${r.getString(4)})"
      }.mkString("; "))
    profile
  }
}
