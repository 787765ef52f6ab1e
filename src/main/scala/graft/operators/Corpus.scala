package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fluent facade over the corpus-pipeline operators: the stage order of a
 * standard pretraining data pipeline as chained calls, each delegating to
 * the exact operator its individual oracle gate verifies (no logic of its
 * own — the facade cannot drift from the operators).
 *
 *   Corpus(docs)                        // (doc_id, text) by default
 *     .qualityFilter(minTokens = 20)    // reason-labeled gate, keep-only
 *     .dedupExact()                     // first doc per content hash
 *     .decontaminate(benchDf)           // drop benchmark-overlapping docs
 *     .sample(Map("web" -> 0.5))        // per-source mixture re-weighting
 *     .shuffle("epoch0")                // deterministic training order
 *     .pack(maxSeqLen = 2048)           // concat-and-chunk layout
 *
 * Every stage returns a new [[Corpus]] over a lazily-composed DataFrame —
 * one Catalyst plan end to end, so the optimizer sees the whole pipeline
 * (the composed plan is what q_pipeline_e2e gates against DuckDB). One
 * exception: [[decontaminate]] runs eager benchmark-index jobs at
 * CONSTRUCTION time when its bloom gate opens (corpus ≥16× the benchmark
 * by plan stats — see [[CorpusOps.decontaminate]]); every other stage, and
 * decontaminate below that ratio, builds the plan without running anything.
 */
final case class Corpus(df: DataFrame, idCol: String = "doc_id", textCol: String = "text") {

  private def id: Column = col(idCol)

  /** Keep only documents passing the reason-labeled quality gate. */
  def qualityFilter(
      minTokens: Int = 10, maxTokens: Int = 100000, lang: String = "en",
      minQuality: Double = 0.3, maxDupWordFrac: Double = 0.9): Corpus = {
    val keep = CorpusOps.qualityFilter(df, idCol, textCol,
        minTokens, maxTokens, lang, minQuality, maxDupWordFrac)
      .filter(col("keep")).select(col("doc_id").as(idCol))
    copy(df = df.join(keep, idCol))
  }

  /** Keep the first document (by id) of every exact-content group. */
  def dedupExact(): Corpus =
    copy(df = Dedup.exactRows(df, Seq(col(textCol)), id))

  /** Keep the first document (by id) of every NORMALIZED-content group —
    * [[graft.functions.TextFunctions.normalizeText]] canonicalizes casing,
    * punctuation and whitespace before hashing, so trivially-reformatted
    * copies dedup at exact-dedup cost (same single hash-shuffle plan). */
  def dedupNormalized(): Corpus =
    copy(df = Dedup.exactRows(df,
      Seq(graft.functions.TextFunctions.normalizeText(col(textCol))), id))

  /** Mask emails / phone numbers / IPs in the text column (the C4/Dolma
    * scrub stage) — a pure per-row expression, zero shuffle. */
  def redactPii(): Corpus =
    copy(df = df.withColumn(textCol,
      graft.functions.TextFunctions.redactPii(col(textCol))))

  /** Keep one representative per near-duplicate cluster (n-gram Jaccard). */
  def dedupNearDup(ngram: Int = 3, threshold: Double = 0.5): Corpus =
    copy(df = Dedup.dedupByNearDup(df, idCol, textCol, ngram, threshold))

  /** Drop documents sharing at least `minShared` `k`-gram shingles with any
    * benchmark document. Fully lazy — the bloom pre-filter (gated on the
    * corpus:bench plan-size ratio) is a Catalyst scalar subquery that
    * executes with the query, so even this stage keeps the facade's
    * one-lazy-plan contract ([[CorpusOps.decontaminate]]). */
  def decontaminate(bench: DataFrame, k: Int = 3, minShared: Int = 2): Corpus = {
    val flagged = CorpusOps.decontaminate(df, bench, idCol, textCol, k, minShared)
      .select(col("doc_id").as(idCol))
    copy(df = df.join(flagged, Seq(idCol), "left_anti"))
  }

  /** Drop documents whose token-level benchmark coverage
    * ([[CorpusOps.contaminationCoverage]] — fraction of word positions
    * covered by any benchmark-shared `k`-gram) exceeds `maxCoverage`: the
    * GPT-3/PaLM-style cut for near-verbatim leaks that no single benchmark
    * item flags strongly. */
  def dropContaminatedSpans(bench: DataFrame, maxCoverage: Double = 0.2,
      k: Int = 3): Corpus = {
    val flagged = CorpusOps.contaminationCoverage(df, bench, idCol, textCol, k)
      .filter(col("coverage") > maxCoverage)
      .select(col("doc_id").as(idCol))
    copy(df = df.join(flagged, Seq(idCol), "left_anti"))
  }

  /** Drop documents whose shingle-Jaccard with any benchmark document
    * reaches `threshold` — the paraphrase-shaped leakage exact
    * decontamination misses ([[CorpusOps.decontaminateNearDup]]). */
  def decontaminateNearDup(bench: DataFrame, k: Int = 3,
      threshold: Double = 0.5): Corpus = {
    val flagged = CorpusOps.decontaminateNearDup(df, bench, idCol, textCol,
        k, threshold = threshold)
      .select(col("doc_id").as(idCol))
    copy(df = df.join(flagged, Seq(idCol), "left_anti"))
  }

  /** Drop documents whose cross-document duplicate-span fraction exceeds
    * the threshold — shared-boilerplate removal (the detection half is
    * [[CorpusOps.duplicateSpanProfile]]; documents shorter than `k` words
    * carry no spans and are always kept). */
  def dropBoilerplate(maxDupSpanFrac: Double = 0.5, k: Int = 3): Corpus = {
    val flagged = CorpusOps.duplicateSpanProfile(df, idCol, textCol, k)
      .filter(col("dup_span_frac") > maxDupSpanFrac)
      .select(col("doc_id").as(idCol))
    copy(df = df.join(flagged, Seq(idCol), "left_anti"))
  }

  /** Drop documents failing any Gopher quality rule
    * ([[CorpusOps.gopherRules]], paper-default thresholds). */
  def gopherFilter(): Corpus = {
    val flagged = CorpusOps.gopherRules(df, idCol, textCol)
      .filter(!col("pass")).select(col("doc_id").as(idCol))
    copy(df = df.join(flagged, Seq(idCol), "left_anti"))
  }

  /** Exact-substring scrub: word positions covered by a `k`-gram span seen
    * earlier anywhere in the corpus are spliced out; documents are
    * rewritten from surviving words ([[Dedup.removeDuplicateSpans]]).
    * Other columns are replaced by (n_words, n_removed) — run before
    * projections that must survive. */
  def scrubDuplicateSpans(k: Int = 5): Corpus =
    copy(df = Dedup.removeDuplicateSpans(df, idCol, textCol, k))

  /** Paragraph-level exact dedup with reassembly: each distinct paragraph
    * survives only at its corpus-wide first occurrence; documents are
    * rewritten from their surviving paragraphs (and drop when nothing
    * survives). Other columns are replaced by (n_paras, n_kept) — run this
    * stage before projections that must survive ([[Dedup.dedupParagraphs]]). */
  def dedupParagraphs(delim: String = "\n"): Corpus =
    copy(df = Dedup.dedupParagraphs(df, idCol, textCol,
      org.apache.spark.sql.functions.split(col(textCol), delim), joinWith = delim))

  /** Mixture re-weighting: keep ~rate of each group, content-hash chosen. */
  def sample(rates: Map[String, Double], groupCol: String = "source",
      defaultRate: Double = 1.0): Corpus =
    copy(df = Sampling.stratifiedSample(df, col(groupCol), rates, col(textCol), defaultRate))

  /** Temperature mixing: keep-rates derived from group sizes so sampled
    * proportions follow size^alpha ([[Sampling.temperatureRates]]).
    * NOTE: the group-size pre-pass runs EAGERLY at this call. */
  def sampleByTemperature(alpha: Double, groupCol: String = "source",
      maxRate: Double = 1.0): Corpus =
    copy(df = Sampling.temperatureSample(df, col(groupCol), col(textCol), alpha, maxRate))

  /** Cap each group's row count (domain balancing). */
  def capPerGroup(cap: Int, groupCol: String = "source"): Corpus =
    copy(df = Sampling.capPerGroup(df, Seq(col(groupCol)), col(textCol), id, cap))

  /** Sample to TARGET mixture proportions ("60% web / 30% code / 10%
    * books") — rates solved by [[Sampling.ratesForTargetMix]] (largest
    * total needing no upsampling), groups absent from `targets` dropped.
    * NOTE: the group-size pre-pass runs EAGERLY at this call. */
  def sampleToMix(targets: Map[String, Double],
      groupCol: String = "source"): Corpus =
    copy(df = Sampling.stratifiedSample(df, col(groupCol),
      Sampling.ratesForTargetMix(df, col(groupCol), targets), col(textCol),
      defaultRate = 0.0))

  /** Terminal: data-quality expectations over the corpus
    * ([[Validation.checkConstraints]] — counted violations, one scan). */
  def check(rules: Seq[(String, Column)]): DataFrame =
    Validation.checkConstraints(df, id, rules)

  /** Hard gate between pipeline stages ([[Validation.requireConstraints]]):
    * throws with the full damage profile when a rule exceeds its
    * tolerance; returns `this` for chaining when all pass. Runs EAGERLY. */
  def requireValid(rules: Seq[(String, Column)],
      tolerance: Map[String, Double] = Map.empty): Corpus = {
    Validation.requireConstraints(df, id, rules, tolerance)
    this
  }

  /** Mixture epochs: repeat each group `factors(g)` times (fractional via
    * the content-hash coin; < 1 downsamples). Adds an `epoch` column. */
  def upsample(factors: Map[String, Double], defaultFactor: Double = 1.0,
      groupCol: String = "source"): Corpus =
    copy(df = Sampling.upsampleByFactor(df, col(groupCol), col(textCol),
      factors, defaultFactor))

  /** Token-budget mixture: cap each group's cumulative whitespace-token
    * count at its budget (unlisted groups get `defaultBudget`). */
  def mixByTokenBudget(budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue, groupCol: String = "source"): Corpus =
    copy(df = Sampling.mixByTokenBudget(df, col(groupCol), col(textCol), id,
      graft.functions.TextFunctions.tokenCount(col(textCol)), budgets, defaultBudget))

  /** Within-document repeated-paragraph cleanup (Dolma-style; zero-shuffle
    * scan — [[dedupParagraphs]] is the corpus-wide form). */
  def dedupParagraphsWithinDoc(delim: String = "\n"): Corpus =
    copy(df = Dedup.dedupParagraphsWithinDoc(df, idCol, textCol, delim)
      .drop("n_paras", "n_kept"))

  /** Unicode NFC canonical normalization of the text column, so decomposed
    * and precomposed spellings hash/shingle identically (zero-shuffle). */
  def normalizeUnicode(): Corpus =
    copy(df = df.withColumn(textCol,
      graft.functions.hashFunctions.nfc_normalize(col(textCol))))

  /** Keep each group's top `topPermille`/1000 fraction by `scoreCol`
    * (FineWeb-Edu-style classifier selection; threshold ties all kept). The
    * score column must already exist — pair with a scoring terminal, e.g.
    * `.withScore(...)` via plain DataFrame ops, and discretize it
    * (stableRound) so the selection histogram stays bounded. */
  def selectTopShare(scoreCol: String, topPermille: Int,
      groupCol: String = "source"): Corpus =
    copy(df = CorpusOps.selectTopShareByGroup(df, groupCol, scoreCol, topPermille))

  /** Drop documents whose text shows encoding damage (replacement chars,
    * stray C0 controls, or a non-ASCII ratio past the mojibake heuristic).
    * Zero-shuffle scan stage. */
  def dropEncodingSuspects(): Corpus =
    copy(df = df.filter(!CorpusOps.encodingSuspect(col(textCol))))

  /** Near-dup-aware train/val/test split: paraphrase clusters (ngram
    * Jaccard ≥ `threshold`) land in one split — adds `split_rep`/`split`.
    * The clustering pre-pass runs when the plan executes. */
  def leakageSafeSplit(weights: Seq[(String, Double)], ngram: Int = 3,
      threshold: Double = 0.5): Corpus =
    copy(df = Sampling.leakageSafeSplit(df, idCol,
      Dedup.ngramJaccardPairs(df, idCol, textCol, ngram, threshold), weights))

  /** Deterministic training order (adds `shuffle_key`, globally sorted). */
  def shuffle(seed: String): Corpus =
    copy(df = Sampling.deterministicShuffle(df, id, seed))

  /** Terminal: overlapping fixed-token context windows per document. */
  def chunk(chunkTokens: Int, overlap: Int = 0): DataFrame =
    CorpusOps.chunkDocuments(df, idCol, textCol, chunkTokens, overlap)

  /** Terminal: concat-and-chunk sequence layout per group, in id order. */
  def pack(maxSeqLen: Int, groupCols: Seq[Column] = Seq(col("source"))): DataFrame =
    Sampling.packSequences(df, groupCols, id,
      graft.functions.TextFunctions.tokenCount(col(textCol)), maxSeqLen)

  /** Terminal: concat-and-chunk layout in TRAINING order — the
    * `shuffle_key` a prior [[shuffle]] minted. The key is this library's
    * own md5 hex, so the layout buckets come straight off its first two
    * digits (`hexOrdered`): zero boundary-sampling pre-pass, the shape a
    * 100 TB epoch layout wants. */
  def packShuffled(maxSeqLen: Int,
      groupCols: Seq[Column] = Seq(col("source"))): DataFrame = {
    require(df.columns.contains("shuffle_key"),
      "packShuffled needs the shuffle_key column — call shuffle(seed) first")
    Sampling.packSequences(df, groupCols, col("shuffle_key"),
      graft.functions.TextFunctions.tokenCount(col(textCol)), maxSeqLen,
      hexOrdered = true)
  }

  /** Terminal: MATERIALIZED training sequences in id order — one row per
    * (group, seq_id) with the ordered doc slices tiling it, the table a
    * training loader reads directly ([[Sampling.packSequenceRows]]). */
  def packRows(maxSeqLen: Int,
      groupCols: Seq[Column] = Seq(col("source"))): DataFrame =
    Sampling.packSequenceRows(df, groupCols, id, id,
      graft.functions.TextFunctions.tokenCount(col(textCol)), maxSeqLen)

  /** Terminal: materialized sequences in TRAINING order ([[packShuffled]]'s
    * zero-pre-pass hex layout); slices carry the document id, not the
    * shuffle key, so the loader joins nothing to resolve them. */
  def packRowsShuffled(maxSeqLen: Int,
      groupCols: Seq[Column] = Seq(col("source"))): DataFrame = {
    require(df.columns.contains("shuffle_key"),
      "packRowsShuffled needs the shuffle_key column — call shuffle(seed) first")
    Sampling.packSequenceRows(df, groupCols, col("shuffle_key"), id,
      graft.functions.TextFunctions.tokenCount(col(textCol)), maxSeqLen,
      hexOrdered = true)
  }

  // ---- reports (terminal, don't transform the corpus) ----

  def tfIdfTopTerms(k: Int = 3): DataFrame = CorpusOps.tfIdfTopTerms(df, idCol, textCol, k)
  def lmQualityScore(vocabCap: Int = Int.MaxValue): DataFrame =
    CorpusOps.lmQualityScore(df, idCol, textCol, vocabCap)
  def repetitionProfile(): DataFrame = CorpusOps.repetitionProfile(df, idCol, textCol)
  def dupSpanProfile(k: Int = 3, minDf: Int = 2): DataFrame =
    CorpusOps.duplicateSpanProfile(df, idCol, textCol, k, minDf)
  def contaminationReport(bench: DataFrame, k: Int = 3, minShared: Int = 2): DataFrame =
    CorpusOps.decontaminate(df, bench, idCol, textCol, k, minShared)
  def encodingProfile(): DataFrame = CorpusOps.encodingProfile(df, idCol, textCol)
  def classify(positive: Column): DataFrame =
    CorpusOps.naiveBayesScore(df, idCol, textCol, positive)
  def bm25(queryTerms: Seq[String], k: Int = 20): DataFrame =
    CorpusOps.bm25Search(df, idCol, textCol, queryTerms, k)
  def ngramDiversity(groupCol: String = "source", n: Int = 3): DataFrame =
    CorpusOps.ngramDiversity(df, textCol, groupCol, n)
  def vocabularyDrift(older: Corpus, topK: Int = 20): DataFrame =
    CorpusOps.vocabularyDrift(older.df, df, idCol, textCol, topK)
  /** Unordered id pairs whose `keyCol` values sit within Levenshtein
    * distance `maxDist` — fuzzy near-duplicate discovery over a short key
    * (title, url, name), [[Fuzzy.fuzzyPairs]]. */
  def fuzzyPairs(keyCol: String, maxDist: Int = 2): DataFrame =
    Fuzzy.fuzzyPairs(df, idCol, keyCol, maxDist)
  /** PSI distribution drift of `valueCol` vs an older snapshot over the
    * fixed histogram [lo, hi) x buckets — [[Validation.distributionDrift]]
    * (this corpus is the CURRENT side). */
  def distributionDrift(older: Corpus, valueCol: String, lo: Double,
      hi: Double, buckets: Int): DataFrame =
    Validation.distributionDrift(older.df, df, valueCol, lo, hi, buckets)
}
