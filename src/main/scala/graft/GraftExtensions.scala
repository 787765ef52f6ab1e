package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions._

/**
 * SQL surface for the engine's custom Catalyst expressions: with
 * `spark.sql.extensions=graft.GraftExtensions` (or
 * `GraftExtensions.install(spark)` on a live session) every sketch/similarity
 * primitive is callable from plain SQL —
 *
 *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
 *   SELECT graft_simhash64(graft_word_shingles(text, 3)) FROM documents
 *
 * — which is the idiomatic Spark mechanism for shipping engine extensions
 * (SparkSessionExtensions.injectFunction), and what lets pure-SQL users of
 * the library run the dedup/ANN building blocks without Scala.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
  }
}

object GraftExtensions {

  private def intArg(args: Seq[Expression], i: Int, default: Int, fn: String): Int =
    if (args.length <= i) default
    else args(i) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }

  private def dblArg(args: Seq[Expression], i: Int, default: Double, fn: String): Double =
    if (args.length <= i) default
    else args(i) match {
      case Literal(v: Double, _)              => v
      case Literal(v: java.math.BigDecimal, _) => v.doubleValue
      case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
      case Literal(v: Int, _)                 => v.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a numeric literal, got $other")
    }

  private def longArg(args: Seq[Expression], i: Int, default: Long, fn: String): Long =
    if (args.length <= i) default
    else args(i) match {
      case Literal(v: Long, _) => v
      case Literal(v: Int, _)  => v.toLong
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }

  private def arity(args: Seq[Expression], fn: String, min: Int, max: Int): Unit =
    if (args.length < min || args.length > max)
      throw new IllegalArgumentException(
        s"$fn expects between $min and $max arguments, got ${args.length}")

  private def dArr(e: Expression): Expression = Cast(e, ArrayType(DoubleType))

  // bridge for functions whose canonical definition is a Column composition
  // (TextFunctions) rather than a single custom Expression: SQL and Column
  // callers share the one definition, so they cannot drift.
  private def asCol(e: Expression) = org.apache.spark.sql.graft.ColumnBridge.column(e)
  private def asExpr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftExtensions.getClass.getCanonicalName, "", name, usage,
        "", "", "", "", "", "", "built-in"),
      builder)

  /** (identifier, info, builder) triples — the SparkSessionExtensions
    * FunctionDescription shape. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_word_shingles",
      "graft_word_shingles(text, k) - ordered k-word shingles of a space-separated string") {
      args => arity(args, "graft_word_shingles", 2, 2)
        WordShingles(args.head, intArg(args, 1, 3, "graft_word_shingles"))
    },
    fn("graft_minhash",
      "graft_minhash(shingles[, numHashes[, seed]]) - MinHash signature of a string array") {
      args => arity(args, "graft_minhash", 1, 3)
        MinHashSignature(args.head,
          intArg(args, 1, 64, "graft_minhash"), longArg(args, 2, 42L, "graft_minhash"))
    },
    fn("graft_simhash64",
      "graft_simhash64(shingles) - 64-bit SimHash of a string array") {
      args => arity(args, "graft_simhash64", 1, 1)
        SimHash64(args.head)
    },
    fn("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two numeric arrays (double precision)") {
      args => arity(args, "graft_cosine", 2, 2)
        CosineSimilarity(dArr(args.head), dArr(args(1)))
    },
    fn("graft_hyperplane_bucket",
      "graft_hyperplane_bucket(vec[, numBits[, seed]]) - hyperplane LSH sign-bucket of a vector") {
      args => arity(args, "graft_hyperplane_bucket", 1, 3)
        HyperplaneLshBucket(dArr(args.head),
          intArg(args, 1, 16, "graft_hyperplane_bucket"),
          longArg(args, 2, 42L, "graft_hyperplane_bucket"))
    },
    fn("graft_fingerprints",
      "graft_fingerprints(text[, ngram[, window]]) - winnowing rolling-hash fingerprints") {
      args => arity(args, "graft_fingerprints", 1, 3)
        RollingFingerprints(args.head,
          intArg(args, 1, 8, "graft_fingerprints"), intArg(args, 2, 4, "graft_fingerprints"))
    },
    fn("graft_langid",
      "graft_langid(text) - marker-word language guess ('und' when undetermined)") {
      args => arity(args, "graft_langid", 1, 1)
        Coalesce(Seq(LangIdGuess(args.head, TextFunctions.langMarkers), Literal("und")))
    },
    fn("graft_nfc",
      "graft_nfc(text) - Unicode NFC canonical normalization") {
      args => arity(args, "graft_nfc", 1, 1)
        graft.functions.NfcNormalize(args.head)
    },
    fn("graft_token_count",
      "graft_token_count(text) - whitespace-token count") {
      args => arity(args, "graft_token_count", 1, 1)
        asExpr(TextFunctions.tokenCount(asCol(args.head)))
    },
    fn("graft_bpe_token_count",
      "graft_bpe_token_count(text) - BPE-approximate subword token count") {
      args => arity(args, "graft_bpe_token_count", 1, 1)
        asExpr(TextFunctions.bpeTokenCount(asCol(args.head)))
    },
    fn("graft_quality_score",
      "graft_quality_score(text) - [0,1] corpus pre-filter quality blend") {
      args => arity(args, "graft_quality_score", 1, 1)
        asExpr(TextFunctions.qualityScore(asCol(args.head)))
    },
    fn("graft_doc_fingerprint",
      "graft_doc_fingerprint(text) - md5 content fingerprint of normalized text") {
      args => arity(args, "graft_doc_fingerprint", 1, 1)
        asExpr(TextFunctions.fingerprint(asCol(args.head)))
    },
    fn("graft_redact_pii",
      "graft_redact_pii(text) - mask emails/phones/IPv4s with <EMAIL>/<PHONE>/<IP>") {
      args => arity(args, "graft_redact_pii", 1, 1)
        asExpr(TextFunctions.redactPii(asCol(args.head)))
    },
    fn("graft_pii_count",
      "graft_pii_count(text) - number of email/phone/IPv4 matches graft_redact_pii would mask") {
      args => arity(args, "graft_pii_count", 1, 1)
        asExpr(TextFunctions.piiCount(asCol(args.head)))
    })

  // ---- table-valued functions: whole corpus operators from pure SQL ----
  //   SELECT * FROM graft_tfidf('documents', 'doc_id', 'text', 3)
  // The first argument names any resolvable table/view; the builder runs at
  // analysis time on the active session, hands that relation to the SAME
  // Column-API operator the Scala surface uses, and returns its (unresolved)
  // logical plan for the analyzer to resolve in place — one definition, two
  // front ends, no drift.

  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def strArg(args: Seq[Expression], i: Int, fn: String): String =
    args(i) match {
      case Literal(v, org.apache.spark.sql.types.StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string literal, got $other")
    }

  private def activeTable(name: String): org.apache.spark.sql.DataFrame =
    SparkSession.getActiveSession.getOrElse(throw new IllegalStateException(
      "graft table functions need an active SparkSession")).table(name)

  private def logical(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.logical

  private def tvf(name: String, usage: String)(builder: Seq[Expression] => LogicalPlan)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftExtensions.getClass.getCanonicalName, "", name, usage,
        "", "", "", "", "", "", "built-in"),
      builder)

  /** TVF (identifier, info, builder) triples — the
    * SparkSessionExtensions.injectTableFunction shape. */
  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    Seq(
      tvf("graft_tfidf",
        "graft_tfidf(table, idCol, textCol[, k]) - top-k tf*idf distinctive terms per document") {
        args => arity(args, "graft_tfidf", 3, 4)
          logical(operators.CorpusOps.tfIdfTopTerms(
            activeTable(strArg(args, 0, "graft_tfidf")),
            strArg(args, 1, "graft_tfidf"), strArg(args, 2, "graft_tfidf"),
            intArg(args, 3, 3, "graft_tfidf")))
      },
      tvf("graft_lm_score",
        "graft_lm_score(table, idCol, textCol[, vocabCap]) - per-document unigram-LM avg NLL") {
        args => arity(args, "graft_lm_score", 3, 4)
          logical(operators.CorpusOps.lmQualityScore(
            activeTable(strArg(args, 0, "graft_lm_score")),
            strArg(args, 1, "graft_lm_score"), strArg(args, 2, "graft_lm_score"),
            intArg(args, 3, Int.MaxValue, "graft_lm_score")))
      },
      tvf("graft_ppl_buckets",
        "graft_ppl_buckets(table, idCol, textCol[, nBuckets]) - CCNet-style equal-mass " +
          "perplexity tiers (1 = most fluent); one lazy plan, thresholds as sub-aggregates") {
        args => arity(args, "graft_ppl_buckets", 3, 4)
          logical(operators.CorpusOps.perplexityBuckets(
            activeTable(strArg(args, 0, "graft_ppl_buckets")),
            strArg(args, 1, "graft_ppl_buckets"), strArg(args, 2, "graft_ppl_buckets"),
            intArg(args, 3, 3, "graft_ppl_buckets")))
      },
      tvf("graft_quality_filter",
        "graft_quality_filter(table, idCol, textCol) - reason-labeled corpus quality gate") {
        args => arity(args, "graft_quality_filter", 3, 3)
          logical(operators.CorpusOps.qualityFilter(
            activeTable(strArg(args, 0, "graft_quality_filter")),
            strArg(args, 1, "graft_quality_filter"), strArg(args, 2, "graft_quality_filter")))
      },
      tvf("graft_repetition",
        "graft_repetition(table, idCol, textCol) - per-document repetition profile") {
        args => arity(args, "graft_repetition", 3, 3)
          logical(operators.CorpusOps.repetitionProfile(
            activeTable(strArg(args, 0, "graft_repetition")),
            strArg(args, 1, "graft_repetition"), strArg(args, 2, "graft_repetition")))
      },
      tvf("graft_importance",
        "graft_importance(corpusTable, targetTable, idCol, textCol[, buckets]) - " +
          "DSIR importance log-weights: hashed unigram+bigram multinomial " +
          "likelihood ratio of each corpus doc under target vs corpus " +
          "(buckets must be a power of two)") {
        args => arity(args, "graft_importance", 4, 5)
          logical(operators.CorpusOps.importanceWeights(
            activeTable(strArg(args, 0, "graft_importance")),
            activeTable(strArg(args, 1, "graft_importance")),
            strArg(args, 2, "graft_importance"), strArg(args, 3, "graft_importance"),
            intArg(args, 4, 8192, "graft_importance")))
      },
      tvf("graft_decontaminate",
        "graft_decontaminate(corpusTable, benchTable, idCol, textCol[, k[, minShared]]) - " +
          "docs sharing >= minShared k-gram shingles with any benchmark doc " +
          "(bloom pre-filter is a lazy scalar subquery gated on plan stats: " +
          "EXPLAIN runs no jobs; the filter builds at first execution)") {
        args => arity(args, "graft_decontaminate", 4, 6)
          logical(operators.CorpusOps.decontaminate(
            activeTable(strArg(args, 0, "graft_decontaminate")),
            activeTable(strArg(args, 1, "graft_decontaminate")),
            strArg(args, 2, "graft_decontaminate"), strArg(args, 3, "graft_decontaminate"),
            intArg(args, 4, 3, "graft_decontaminate"),
            intArg(args, 5, 2, "graft_decontaminate")))
      },
      tvf("graft_contamination",
        "graft_contamination(corpusTable, benchTable, idCol, textCol[, k[, minShared]]) - " +
          "per-benchmark-item leak report: corpus docs sharing >= minShared " +
          "shingles, by bench_id (same lazy bloom subquery as " +
          "graft_decontaminate)") {
        args => arity(args, "graft_contamination", 4, 6)
          logical(operators.CorpusOps.contaminationReport(
            activeTable(strArg(args, 0, "graft_contamination")),
            activeTable(strArg(args, 1, "graft_contamination")),
            strArg(args, 2, "graft_contamination"), strArg(args, 3, "graft_contamination"),
            intArg(args, 4, 3, "graft_contamination"),
            intArg(args, 5, 2, "graft_contamination")))
      },
      tvf("graft_coverage",
        "graft_coverage(corpusTable, benchTable, idCol, textCol[, k]) - " +
          "per-document token-level benchmark coverage: fraction of word " +
          "positions covered by any k-gram shared with the benchmark") {
        args => arity(args, "graft_coverage", 4, 5)
          logical(operators.CorpusOps.contaminationCoverage(
            activeTable(strArg(args, 0, "graft_coverage")),
            activeTable(strArg(args, 1, "graft_coverage")),
            strArg(args, 2, "graft_coverage"), strArg(args, 3, "graft_coverage"),
            intArg(args, 4, 3, "graft_coverage")))
      },
      tvf("graft_dup_spans",
        "graft_dup_spans(table, idCol, textCol[, k[, minDf]]) - per-document " +
          "cross-doc duplicate-span profile (shared-boilerplate fraction)") {
        args => arity(args, "graft_dup_spans", 3, 5)
          logical(operators.CorpusOps.duplicateSpanProfile(
            activeTable(strArg(args, 0, "graft_dup_spans")),
            strArg(args, 1, "graft_dup_spans"), strArg(args, 2, "graft_dup_spans"),
            intArg(args, 3, 3, "graft_dup_spans"),
            intArg(args, 4, 2, "graft_dup_spans")))
      },
      tvf("graft_lm_bigram",
        "graft_lm_bigram(table, idCol, textCol[, lambda]) - per-document " +
          "interpolated bigram-LM avg NLL") {
        args => arity(args, "graft_lm_bigram", 3, 4)
          logical(operators.CorpusOps.bigramLmScore(
            activeTable(strArg(args, 0, "graft_lm_bigram")),
            strArg(args, 1, "graft_lm_bigram"), strArg(args, 2, "graft_lm_bigram"),
            dblArg(args, 3, 0.7, "graft_lm_bigram")))
      },
      tvf("graft_features",
        "graft_features(table, idCol, textCol) - one-scan per-document " +
          "quality-classifier feature extraction (zero shuffle)") {
        args => arity(args, "graft_features", 3, 3)
          logical(operators.CorpusOps.qualityFeatures(
            activeTable(strArg(args, 0, "graft_features")),
            strArg(args, 1, "graft_features"), strArg(args, 2, "graft_features")))
      },
      tvf("graft_gopher",
        "graft_gopher(table, idCol, textCol) - per-document Gopher quality rule matrix") {
        args => arity(args, "graft_gopher", 3, 3)
          logical(operators.CorpusOps.gopherRules(
            activeTable(strArg(args, 0, "graft_gopher")),
            strArg(args, 1, "graft_gopher"), strArg(args, 2, "graft_gopher")))
      },
      tvf("graft_chunk",
        "graft_chunk(table, idCol, textCol, chunkTokens[, overlap]) - " +
          "fixed-token context windows per document") {
        args => arity(args, "graft_chunk", 4, 5)
          logical(operators.CorpusOps.chunkDocuments(
            activeTable(strArg(args, 0, "graft_chunk")),
            strArg(args, 1, "graft_chunk"), strArg(args, 2, "graft_chunk"),
            intArg(args, 3, -1, "graft_chunk"),
            intArg(args, 4, 0, "graft_chunk")))
      },
      tvf("graft_select_top",
        "graft_select_top(table, groupCol, scoreCol, topPermille) - keep each " +
          "group's top share by score (threshold ties all kept)") {
        args => arity(args, "graft_select_top", 4, 4)
          logical(operators.CorpusOps.selectTopShareByGroup(
            activeTable(strArg(args, 0, "graft_select_top")),
            strArg(args, 1, "graft_select_top"),
            strArg(args, 2, "graft_select_top"),
            intArg(args, 3, -1, "graft_select_top")))
      },
      tvf("graft_dedup_paragraphs",
        "graft_dedup_paragraphs(table, idCol, textCol) - newline-paragraph " +
          "exact dedup with document reassembly (corpus-wide first occurrence wins)") {
        args => arity(args, "graft_dedup_paragraphs", 3, 3)
          logical(operators.Dedup.dedupParagraphs(
            activeTable(strArg(args, 0, "graft_dedup_paragraphs")),
            strArg(args, 1, "graft_dedup_paragraphs"),
            strArg(args, 2, "graft_dedup_paragraphs")))
      },
      tvf("graft_dedup_paragraphs_doc",
        "graft_dedup_paragraphs_doc(table, idCol, textCol) - WITHIN-document " +
          "repeated-paragraph cleanup (keep first occurrence; zero-shuffle)") {
        args => arity(args, "graft_dedup_paragraphs_doc", 3, 3)
          logical(operators.Dedup.dedupParagraphsWithinDoc(
            activeTable(strArg(args, 0, "graft_dedup_paragraphs_doc")),
            strArg(args, 1, "graft_dedup_paragraphs_doc"),
            strArg(args, 2, "graft_dedup_paragraphs_doc")))
      },
      tvf("graft_report",
        "graft_report(table, idCol, textCol[, groupCol]) - per-group " +
          "dataset-card summary (docs, tokens, dup count, quality, language)") {
        args => arity(args, "graft_report", 3, 4)
          logical(operators.CorpusOps.corpusReport(
            activeTable(strArg(args, 0, "graft_report")),
            strArg(args, 1, "graft_report"), strArg(args, 2, "graft_report"),
            if (args.size > 3) strArg(args, 3, "graft_report") else "source"))
      },
      tvf("graft_scrub_spans",
        "graft_scrub_spans(table, idCol, textCol[, k]) - exact-substring " +
          "scrub: splice out k-gram spans seen earlier anywhere in the corpus") {
        args => arity(args, "graft_scrub_spans", 3, 4)
          logical(operators.Dedup.removeDuplicateSpans(
            activeTable(strArg(args, 0, "graft_scrub_spans")),
            strArg(args, 1, "graft_scrub_spans"), strArg(args, 2, "graft_scrub_spans"),
            intArg(args, 3, 5, "graft_scrub_spans")))
      },
      tvf("graft_corpus_diff",
        "graft_corpus_diff(oldTable, newTable, idCol, textCol) - " +
          "snapshot diff: added/removed/changed/unchanged by content md5") {
        args => arity(args, "graft_corpus_diff", 4, 4)
          logical(operators.CorpusOps.corpusDiff(
            activeTable(strArg(args, 0, "graft_corpus_diff")),
            activeTable(strArg(args, 1, "graft_corpus_diff")),
            strArg(args, 2, "graft_corpus_diff"), strArg(args, 3, "graft_corpus_diff")))
      },
      tvf("graft_diversity",
        "graft_diversity(table, textCol, groupCol, n) - per-group distinct-n " +
          "n-gram diversity (template-repetition signal)") {
        args => arity(args, "graft_diversity", 4, 4)
          logical(operators.CorpusOps.ngramDiversity(
            activeTable(strArg(args, 0, "graft_diversity")),
            strArg(args, 1, "graft_diversity"), strArg(args, 2, "graft_diversity"),
            intArg(args, 3, -1, "graft_diversity")))
      },
      tvf("graft_overlap",
        "graft_overlap(tableA, tableB, textCol) - corpus-level overlap by " +
          "distinct normalized-content hash (jaccard, containment)") {
        args => arity(args, "graft_overlap", 3, 3)
          logical(operators.CorpusOps.corpusOverlap(
            activeTable(strArg(args, 0, "graft_overlap")),
            activeTable(strArg(args, 1, "graft_overlap")),
            strArg(args, 2, "graft_overlap")))
      },
      tvf("graft_sessions",
        "graft_sessions(table, keyCol, timeCol, gapSeconds) - per-key " +
          "gap-rule session counts (n_sessions, n_events)") {
        args => arity(args, "graft_sessions", 4, 4)
          logical(operators.Relational.sessionCounts(
            activeTable(strArg(args, 0, "graft_sessions")),
            strArg(args, 1, "graft_sessions"), strArg(args, 2, "graft_sessions"),
            longArg(args, 3, 1800L, "graft_sessions") * 1000000L))
      },
      tvf("graft_asof",
        "graft_asof(leftTable, rightTable, keyCol, timeCol, valueCol[, alias]) - " +
          "as-of join: latest right valueCol at-or-before each left row's time, per key") {
        args => arity(args, "graft_asof", 5, 6)
          val valueCol = strArg(args, 4, "graft_asof")
          val alias = if (args.length > 5) strArg(args, 5, "graft_asof") else valueCol
          logical(operators.Relational.asofJoin(
            activeTable(strArg(args, 0, "graft_asof")),
            activeTable(strArg(args, 1, "graft_asof")),
            strArg(args, 2, "graft_asof"), strArg(args, 3, "graft_asof"),
            Map(valueCol -> alias)))
      },
      tvf("graft_pack",
        "graft_pack(table, groupCol, orderCol, textCol, maxSeqLen) - " +
          "concat-and-chunk sequence packing metadata (token_start, seq range)") {
        args => arity(args, "graft_pack", 5, 5)
          logical(operators.Sampling.packSequences(
            activeTable(strArg(args, 0, "graft_pack")),
            Seq(org.apache.spark.sql.functions.col(strArg(args, 1, "graft_pack"))),
            org.apache.spark.sql.functions.col(strArg(args, 2, "graft_pack")),
            graft.functions.TextFunctions.tokenCount(
              org.apache.spark.sql.functions.col(strArg(args, 3, "graft_pack"))),
            intArg(args, 4, 2048, "graft_pack")))
      },
      tvf("graft_pack_rows",
        "graft_pack_rows(table, groupCol, orderCol, textCol, maxSeqLen) - " +
          "materialized training sequences: one row per (group, seq_id) " +
          "with the ordered document slices tiling it") {
        args => arity(args, "graft_pack_rows", 5, 5)
          logical(operators.Sampling.packSequenceRows(
            activeTable(strArg(args, 0, "graft_pack_rows")),
            Seq(org.apache.spark.sql.functions.col(strArg(args, 1, "graft_pack_rows"))),
            org.apache.spark.sql.functions.col(strArg(args, 2, "graft_pack_rows")),
            org.apache.spark.sql.functions.col(strArg(args, 2, "graft_pack_rows")),
            graft.functions.TextFunctions.tokenCount(
              org.apache.spark.sql.functions.col(strArg(args, 3, "graft_pack_rows"))),
            intArg(args, 4, 2048, "graft_pack_rows")))
      },
      tvf("graft_pack_bestfit",
        "graft_pack_bestfit(table, groupCol, idCol, textCol, maxSeqLen) - " +
          "NO-SPLIT first-fit-decreasing packing: every doc lands whole " +
          "in one sequence (seq_id, seq_offset; -1 for zero-token docs)") {
        args => arity(args, "graft_pack_bestfit", 5, 5)
          logical(operators.Sampling.packSequencesBestFit(
            activeTable(strArg(args, 0, "graft_pack_bestfit")),
            Seq(org.apache.spark.sql.functions.col(strArg(args, 1, "graft_pack_bestfit"))),
            org.apache.spark.sql.functions.col(strArg(args, 2, "graft_pack_bestfit")),
            graft.functions.TextFunctions.tokenCount(
              org.apache.spark.sql.functions.col(strArg(args, 3, "graft_pack_bestfit"))),
            intArg(args, 4, 2048, "graft_pack_bestfit")))
      },
      tvf("graft_bm25",
        "graft_bm25(table, idCol, textCol, query[, k]) - Okapi BM25 top-k " +
          "document retrieval for a space-separated query string") {
        args => arity(args, "graft_bm25", 4, 5)
          logical(operators.CorpusOps.bm25Search(
            activeTable(strArg(args, 0, "graft_bm25")),
            strArg(args, 1, "graft_bm25"), strArg(args, 2, "graft_bm25"),
            // single-space split, NOT \s+: the corpus tokenizer
            // (TextFunctions.words) splits on single spaces only, so doc
            // tokens may legitimately contain tabs/newlines — a \s+ query
            // split could never produce such terms, making those doc
            // tokens unmatchable via the TVF. Query and corpus must
            // tokenize identically (bm25SearchMany does the same by
            // running TextFunctions.words on the query column).
            strArg(args, 3, "graft_bm25").split(" ").toSeq.filter(_.nonEmpty),
            intArg(args, 4, 20, "graft_bm25")))
      },
      tvf("graft_bm25_many",
        "graft_bm25_many(docsTable, idCol, textCol, queriesTable, queryIdCol, " +
          "queryTextCol[, k]) - one-pass Okapi BM25 top-k per query of a query table") {
        args => arity(args, "graft_bm25_many", 6, 7)
          logical(operators.CorpusOps.bm25SearchMany(
            activeTable(strArg(args, 0, "graft_bm25_many")),
            strArg(args, 1, "graft_bm25_many"), strArg(args, 2, "graft_bm25_many"),
            activeTable(strArg(args, 3, "graft_bm25_many")),
            strArg(args, 4, "graft_bm25_many"), strArg(args, 5, "graft_bm25_many"),
            intArg(args, 6, 20, "graft_bm25_many")))
      },
      tvf("graft_drift",
        "graft_drift(refTable, curTable, valueCol, lo, hi, buckets) - PSI " +
          "distribution-drift profile between two snapshots of a numeric column") {
        args => arity(args, "graft_drift", 6, 6)
          logical(operators.Validation.distributionDrift(
            activeTable(strArg(args, 0, "graft_drift")),
            activeTable(strArg(args, 1, "graft_drift")),
            strArg(args, 2, "graft_drift"),
            dblArg(args, 3, 0.0, "graft_drift"),
            dblArg(args, 4, 1.0, "graft_drift"),
            intArg(args, 5, 10, "graft_drift")))
      },
      tvf("graft_group_drift",
        "graft_group_drift(refTable, curTable, groupCol, valueCol, lo, hi, " +
          "buckets) - per-group PSI drift profile (one row per group x " +
          "bucket, per-group smoothing)") {
        args => arity(args, "graft_group_drift", 7, 7)
          logical(operators.Validation.distributionDriftByGroup(
            activeTable(strArg(args, 0, "graft_group_drift")),
            activeTable(strArg(args, 1, "graft_group_drift")),
            strArg(args, 2, "graft_group_drift"),
            strArg(args, 3, "graft_group_drift"),
            dblArg(args, 4, 0.0, "graft_group_drift"),
            dblArg(args, 5, 1.0, "graft_group_drift"),
            intArg(args, 6, 10, "graft_group_drift")))
      },
      tvf("graft_group_cat_drift",
        "graft_group_cat_drift(refTable, curTable, groupCol, catCol[, topK]) - " +
          "per-group categorical PSI drift (per-group top-K + __other__ " +
          "fold, per-group smoothing)") {
        args => arity(args, "graft_group_cat_drift", 4, 5)
          logical(operators.Validation.categoricalDriftByGroup(
            activeTable(strArg(args, 0, "graft_group_cat_drift")),
            activeTable(strArg(args, 1, "graft_group_cat_drift")),
            strArg(args, 2, "graft_group_cat_drift"),
            strArg(args, 3, "graft_group_cat_drift"),
            intArg(args, 4, 50, "graft_group_cat_drift")))
      },
      tvf("graft_embed_drift",
        "graft_embed_drift(refTable, curTable, labelCol, vecCol) - per-label " +
          "embedding drift (counts, mean norms, centroid cosine, dim_mismatch)") {
        args => arity(args, "graft_embed_drift", 4, 4)
          logical(operators.Similarity.embeddingDrift(
            activeTable(strArg(args, 0, "graft_embed_drift")),
            activeTable(strArg(args, 1, "graft_embed_drift")),
            strArg(args, 2, "graft_embed_drift"),
            strArg(args, 3, "graft_embed_drift")))
      },
      tvf("graft_cat_drift",
        "graft_cat_drift(refTable, curTable, catCol[, topK]) - categorical " +
          "PSI drift profile (reference top-K categories + __other__ fold)") {
        args => arity(args, "graft_cat_drift", 3, 4)
          logical(operators.Validation.categoricalDrift(
            activeTable(strArg(args, 0, "graft_cat_drift")),
            activeTable(strArg(args, 1, "graft_cat_drift")),
            strArg(args, 2, "graft_cat_drift"),
            intArg(args, 3, 50, "graft_cat_drift")))
      },
      tvf("graft_fuzzy_pairs",
        "graft_fuzzy_pairs(table, idCol, keyCol, maxDist) - unordered id " +
          "pairs within Levenshtein distance maxDist (exact, pigeonhole-" +
          "blocked, never all-pairs)") {
        args => arity(args, "graft_fuzzy_pairs", 4, 4)
          logical(operators.Fuzzy.fuzzyPairs(
            activeTable(strArg(args, 0, "graft_fuzzy_pairs")),
            strArg(args, 1, "graft_fuzzy_pairs"),
            strArg(args, 2, "graft_fuzzy_pairs"),
            intArg(args, 3, 2, "graft_fuzzy_pairs")))
      },
      tvf("graft_fuzzy_join",
        "graft_fuzzy_join(leftTable, rightTable, leftId, leftKey, rightId, " +
          "rightKey, maxDist) - fuzzy record linkage: (id_l, id_r, dist) " +
          "pairs within Levenshtein distance maxDist") {
        args => arity(args, "graft_fuzzy_join", 7, 7)
          logical(operators.Fuzzy.fuzzyJoin(
            activeTable(strArg(args, 0, "graft_fuzzy_join")),
            activeTable(strArg(args, 1, "graft_fuzzy_join")),
            strArg(args, 2, "graft_fuzzy_join"),
            strArg(args, 3, "graft_fuzzy_join"),
            strArg(args, 4, "graft_fuzzy_join"),
            strArg(args, 5, "graft_fuzzy_join"),
            intArg(args, 6, 2, "graft_fuzzy_join")))
      },
      tvf("graft_classify",
        "graft_classify(table, idCol, textCol, positiveSqlPredicate) - " +
          "Naive Bayes log-odds train+score; positive class via a SQL predicate") {
        args => arity(args, "graft_classify", 4, 4)
          logical(operators.CorpusOps.naiveBayesScore(
            activeTable(strArg(args, 0, "graft_classify")),
            strArg(args, 1, "graft_classify"), strArg(args, 2, "graft_classify"),
            org.apache.spark.sql.functions.expr(strArg(args, 3, "graft_classify"))))
      },
      tvf("graft_check",
        "graft_check(table, idCol, ruleName, holdsSqlPredicate) - counted " +
          "data-quality expectation: violations of the predicate in one scan") {
        args => arity(args, "graft_check", 4, 4)
          logical(operators.Validation.checkConstraints(
            activeTable(strArg(args, 0, "graft_check")),
            org.apache.spark.sql.functions.col(strArg(args, 1, "graft_check")),
            Seq(strArg(args, 2, "graft_check") ->
              org.apache.spark.sql.functions.expr(strArg(args, 3, "graft_check")))))
      },
      tvf("graft_check_unique",
        "graft_check_unique(table, keyCols) - key-uniqueness expectation; " +
          "keyCols is a comma-separated column list") {
        args => arity(args, "graft_check_unique", 2, 2)
          logical(operators.Validation.checkUnique(
            activeTable(strArg(args, 0, "graft_check_unique")),
            strArg(args, 1, "graft_check_unique").split(",").toSeq
              .map(_.trim).filter(_.nonEmpty)
              .map(org.apache.spark.sql.functions.col)))
      },
      tvf("graft_check_fk",
        "graft_check_fk(childTable, childKeyCol, parentTable, parentKeyCol) - " +
          "referential-integrity expectation: orphaned child keys") {
        args => arity(args, "graft_check_fk", 4, 4)
          logical(operators.Validation.checkReferential(
            activeTable(strArg(args, 0, "graft_check_fk")),
            org.apache.spark.sql.functions.col(strArg(args, 1, "graft_check_fk")),
            activeTable(strArg(args, 2, "graft_check_fk")),
            org.apache.spark.sql.functions.col(strArg(args, 3, "graft_check_fk"))))
      },
      tvf("graft_vocab_drift",
        "graft_vocab_drift(oldTable, newTable, idCol, textCol, topK) - " +
          "top-k terms by relative-frequency movement between snapshots") {
        args => arity(args, "graft_vocab_drift", 5, 5)
          logical(operators.CorpusOps.vocabularyDrift(
            activeTable(strArg(args, 0, "graft_vocab_drift")),
            activeTable(strArg(args, 1, "graft_vocab_drift")),
            strArg(args, 2, "graft_vocab_drift"), strArg(args, 3, "graft_vocab_drift"),
            intArg(args, 4, -1, "graft_vocab_drift")))
      },
      tvf("graft_encoding",
        "graft_encoding(table, idCol, textCol) - per-document encoding-damage " +
          "profile (replacement/control chars, non-ASCII ratio, suspect flag)") {
        args => arity(args, "graft_encoding", 3, 3)
          logical(operators.CorpusOps.encodingProfile(
            activeTable(strArg(args, 0, "graft_encoding")),
            strArg(args, 1, "graft_encoding"), strArg(args, 2, "graft_encoding")))
      },
      tvf("graft_shuffle",
        "graft_shuffle(table, keyCol, seed) - deterministic salted-hash training order") {
        args => arity(args, "graft_shuffle", 3, 3)
          logical(operators.Sampling.deterministicShuffle(
            activeTable(strArg(args, 0, "graft_shuffle")),
            org.apache.spark.sql.functions.col(strArg(args, 1, "graft_shuffle")),
            strArg(args, 2, "graft_shuffle")))
      })

  /** Register on a live session (tests, notebooks). */
  def install(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(spark, id, info, builder)
    }
    tableFunctions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.ColumnBridge.registerTableFunction(spark, id, info, builder)
    }
  }
}
