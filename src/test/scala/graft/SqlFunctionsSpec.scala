package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{hashFunctions, TextFunctions}

/** The SparkSessionExtensions SQL surface must agree exactly with the
  * Column-level API (same expressions underneath). */
class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    GraftExtensions.install(s)
    s
  }

  test("SQL functions match the Column API results") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    df.createOrReplaceTempView("sqldocs")

    val shSql = spark.sql("SELECT graft_word_shingles(text, 3) FROM sqldocs")
      .as[Seq[String]].head()
    val shCol = df.select(TextFunctions.wordShingles($"text", 3)).as[Seq[String]].head()
    assert(shSql == shCol)

    val simSql = spark.sql(
      "SELECT graft_simhash64(graft_word_shingles(text, 3)) FROM sqldocs").as[Long].head()
    val simCol = df.select(hashFunctions.simhash64(TextFunctions.wordShingles($"text", 3)))
      .as[Long].head()
    assert(simSql == simCol)

    val mhSql = spark.sql(
      "SELECT graft_minhash(graft_word_shingles(text, 3), 16, 7) FROM sqldocs")
      .as[Seq[Long]].head()
    val mhCol = df.select(
      hashFunctions.minhash_signature(TextFunctions.wordShingles($"text", 3), 16, 7L))
      .as[Seq[Long]].head()
    assert(mhSql == mhCol)

    val fpSql = spark.sql("SELECT graft_fingerprints(text, 8, 4) FROM sqldocs")
      .as[Seq[Long]].head()
    val fpCol = df.select(hashFunctions.rolling_fingerprints($"text", 8, 4))
      .as[Seq[Long]].head()
    assert(fpSql == fpCol)
  }

  test("vector functions cast their inputs like the Column wrappers do") {
    import spark.implicits._
    assert(spark.sql("SELECT graft_cosine(array(1.0, 0.0), array(1.0, 0.0))")
      .as[Double].head() == 1.0)
    // float arrays (the embeddings table's type) are accepted via the cast
    val vecs = Seq((1L, Seq(1.0f, 0.5f))).toDF("id", "v")
    vecs.createOrReplaceTempView("sqlvecs")
    val bSql = spark.sql("SELECT graft_hyperplane_bucket(v) FROM sqlvecs").as[Long].head()
    val bCol = vecs.select(hashFunctions.hyperplane_lsh_bucket($"v")).as[Long].head()
    assert(bSql == bCol)
    val cSql = spark.sql(
      "SELECT graft_cosine(v, CAST(array(1.0, 0.5) AS ARRAY<DOUBLE>)) FROM sqlvecs")
      .as[Double].head()
    assert(math.abs(cSql - 1.0) < 1e-9)
  }

  test("corpus-filter primitives are SQL-callable and match the Column API") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox, jumps over the lazy dog!")).toDF("id", "text")
    df.createOrReplaceTempView("sqldocs2")
    val got = spark.sql(
      """SELECT graft_token_count(text), graft_bpe_token_count(text),
        |       graft_quality_score(text), graft_doc_fingerprint(text)
        |FROM sqldocs2""".stripMargin).as[(Int, Int, Double, String)].head()
    val want = df.select(
        TextFunctions.tokenCount($"text"), TextFunctions.bpeTokenCount($"text"),
        TextFunctions.qualityScore($"text"), TextFunctions.fingerprint($"text"))
      .as[(Int, Int, Double, String)].head()
    assert(got == want)
    assert(got._1 == 9 && got._2 > got._1) // bpe splits punctuation off
  }

  test("EXPLAIN graft_decontaminate runs ZERO Spark jobs (lazy bloom subquery)") {
    import java.util.concurrent.ConcurrentLinkedQueue
    val docs = Tables.documents(spark, SparkTestSession.sf0001)
    // corpus >> bench so the bloom gate is OPEN — the eager-build regression
    // this pins fired exactly then
    docs.createOrReplaceTempView("exdocs")
    docs.limit(2).createOrReplaceTempView("exbench")
    // jobs are attributed to SQL executions: the EXPLAIN's executions must
    // own ZERO jobs (the sentinel action below owns its own — under AQE it
    // legitimately submits several)
    val jobs = new ConcurrentLinkedQueue[(Int, String)]() // (jobId, jobGroup)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.add((j.jobId,
          Option(j.properties.getProperty("spark.jobGroup.id")).getOrElse("-")))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // attribute by job group: suites share this SparkContext and may run
      // concurrently, so only jobs tagged with OUR group count as strays
      // (session-thread jobs and AQE/subquery futures both inherit it via
      // thread-local capture)
      spark.sparkContext.setJobGroup("GRAFT_EXPLAIN_TEST", "explain-must-be-job-free", false)
      val plan =
        try {
          val p = spark.sql(
            "EXPLAIN EXTENDED SELECT * FROM graft_decontaminate('exdocs', 'exbench', 'doc_id', 'text')")
            .collect().map(_.getString(0)).mkString("\n")
          // every TVF whose operator shares intermediates must also explain
          // job-free (their checkpoints are lazy persists, not AQE-eager ones)
          Seq(
            "EXPLAIN SELECT * FROM graft_contamination('exdocs', 'exbench', 'doc_id', 'text')",
            "EXPLAIN SELECT * FROM graft_lm_bigram('exdocs', 'doc_id', 'text', 0.7)",
            "EXPLAIN SELECT * FROM graft_lm_score('exdocs', 'doc_id', 'text')",
            "EXPLAIN SELECT * FROM graft_ppl_buckets('exdocs', 'doc_id', 'text')",
            "EXPLAIN SELECT * FROM graft_dup_spans('exdocs', 'doc_id', 'text')"
          ).foreach(q => spark.sql(q).collect())
          p
        } finally spark.sparkContext.clearJobGroup()
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilter"),
        "expected the lazy bloom subquery in the plan:\n" + plan)
      // flush the async listener bus with one sentinel action: every event
      // posted before it is delivered before its start event
      spark.sparkContext.setJobGroup("SENTINEL", "SENTINEL", false)
      try spark.range(1).groupBy().count().collect()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!jobs.toArray(Array.empty[(Int, String)]).exists(_._2 == "SENTINEL") &&
        System.nanoTime() < deadline) Thread.sleep(50)
      val strays = jobs.toArray(Array.empty[(Int, String)])
        .filter { case (_, g) => g == "GRAFT_EXPLAIN_TEST" }
      assert(strays.isEmpty,
        s"EXPLAIN must not start Spark jobs; stray jobs (id, group): ${strays.mkString(", ")}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("PII scrub is SQL-callable and matches the Column API") {
    import spark.implicits._
    val df = Seq((1L, "mail a.b@c.io or call 555-0199 from 10.1.2.3")).toDF("id", "text")
    df.createOrReplaceTempView("sqldocs3")
    val got = spark.sql(
      "SELECT graft_redact_pii(text), graft_pii_count(text) FROM sqldocs3")
      .as[(String, Int)].head()
    val want = df.select(TextFunctions.redactPii($"text"), TextFunctions.piiCount($"text"))
      .as[(String, Int)].head()
    assert(got == want)
    assert(got == (("mail <EMAIL> or call <PHONE> from <IP>", 3)))
  }

  test("graft_nfc composes decomposed unicode in SQL") {
    import spark.implicits._
    // Spark SQL's chr() wraps at 256, so the combining mark arrives via a view
    Seq(Tuple1("cafe\u0301")).toDF("t").createOrReplaceTempView("nfcv")
    assert(spark.sql("SELECT graft_nfc(t) FROM nfcv").as[String].head() ==
      "caf\u00e9")
    assert(spark.sql("SELECT graft_nfc('plain')").as[String].head() == "plain")
  }

  test("langid falls through to 'und' and literal-arg validation fires") {
    import spark.implicits._
    assert(spark.sql("SELECT graft_langid('the cat is on the mat')").as[String].head() == "en")
    assert(spark.sql("SELECT graft_langid('zzz qqq')").as[String].head() == "und")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'), id) FROM range(1)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("integer literal")))
  }

  test("new TVFs validate arity loudly") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    for (bad <- Seq(
        "SELECT * FROM graft_asof('a', 'b', 'k')",              // too few
        "SELECT * FROM graft_pack('a', 'g', 'o', 't', 1, 2)",   // too many
        "SELECT * FROM graft_bm25_many('a', 'i', 't', 'q')")) { // too few
      val e = intercept[Exception](spark.sql(bad).collect())
      assert(msgs(e).exists(m => m.contains("expects") || m.contains("argument")),
        s"$bad: ${msgs(e).mkString(" | ")}")
    }
  }

  test("table functions run whole corpus operators from SQL, matching the API") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    docs.createOrReplaceTempView("tvfdocs")

    val tfidfSql = spark.sql(
      "SELECT * FROM graft_tfidf('tvfdocs', 'doc_id', 'text', 2) ORDER BY doc_id, term")
    val tfidfApi = operators.CorpusOps.tfIdfTopTerms(docs, "doc_id", "text", 2)
      .orderBy(col("doc_id"), col("term"))
    assert(tfidfSql.collect().toSeq == tfidfApi.collect().toSeq)

    val lmSql = spark.sql(
      "SELECT * FROM graft_lm_score('tvfdocs', 'doc_id', 'text') ORDER BY doc_id")
    val lmApi = operators.CorpusOps.lmQualityScore(docs, "doc_id", "text")
      .orderBy(col("doc_id"))
    assert(lmSql.collect().toSeq == lmApi.collect().toSeq)

    spark.sql("SELECT * FROM tvfdocs WHERE lang = 'en'")
      .createOrReplaceTempView("tvftarget")
    val impSql = spark.sql(
      "SELECT * FROM graft_importance('tvfdocs', 'tvftarget', 'doc_id', 'text') ORDER BY doc_id")
    val impApi = operators.CorpusOps.importanceWeights(
        docs, docs.filter(col("lang") === "en"), "doc_id", "text")
      .orderBy(col("doc_id"))
    assert(impSql.collect().toSeq == impApi.collect().toSeq)

    val pplSql = spark.sql(
      "SELECT * FROM graft_ppl_buckets('tvfdocs', 'doc_id', 'text') ORDER BY doc_id")
    val pplApi = operators.CorpusOps.perplexityBuckets(docs, "doc_id", "text")
      .orderBy(col("doc_id"))
    assert(pplSql.collect().toSeq == pplApi.collect().toSeq)

    val qf = spark.sql(
      "SELECT count(*) FROM graft_quality_filter('tvfdocs', 'doc_id', 'text') WHERE keep")
      .collect()(0).getLong(0)
    assert(qf > 0 && qf <= docs.count())

    val rep = spark.sql(
      "SELECT * FROM graft_repetition('tvfdocs', 'doc_id', 'text') ORDER BY doc_id")
    assert(rep.collect().toSeq ==
      operators.CorpusOps.repetitionProfile(docs, "doc_id", "text")
        .orderBy(col("doc_id")).collect().toSeq)

    val ds = spark.sql(
      "SELECT * FROM graft_dup_spans('tvfdocs', 'doc_id', 'text') ORDER BY doc_id")
    assert(ds.collect().toSeq ==
      operators.CorpusOps.duplicateSpanProfile(docs, "doc_id", "text")
        .orderBy(col("doc_id")).collect().toSeq)

    val sh = spark.sql(
      "SELECT doc_id FROM graft_shuffle('tvfdocs', 'doc_id', 'epoch0') LIMIT 5")
      .collect().map(_.getLong(0)).toSeq
    val shApi = operators.Sampling.deterministicShuffle(docs, col("doc_id"), "epoch0")
      .select(col("doc_id")).limit(5).collect().map(_.getLong(0)).toSeq
    assert(sh == shApi)

    val corpus = docs.filter(col("source") =!= "src0")
    val bench = docs.filter(col("source") === "src0")
    corpus.createOrReplaceTempView("tvfcorpus")
    bench.createOrReplaceTempView("tvfbench")
    val dec = spark.sql(
      "SELECT * FROM graft_decontaminate('tvfcorpus', 'tvfbench', 'doc_id', 'text') ORDER BY doc_id")
    assert(dec.collect().toSeq ==
      operators.CorpusOps.decontaminate(corpus, bench, "doc_id", "text")
        .orderBy(col("doc_id")).collect().toSeq)

    val cov = spark.sql(
      "SELECT * FROM graft_coverage('tvfcorpus', 'tvfbench', 'doc_id', 'text') ORDER BY doc_id")
    assert(cov.collect().toSeq ==
      operators.CorpusOps.contaminationCoverage(corpus, bench, "doc_id", "text")
        .orderBy(col("doc_id")).collect().toSeq)

    val gop = spark.sql(
      "SELECT * FROM graft_gopher('tvfdocs', 'doc_id', 'text') ORDER BY doc_id")
    assert(gop.collect().toSeq ==
      operators.CorpusOps.gopherRules(docs, "doc_id", "text")
        .orderBy(col("doc_id")).collect().toSeq)

    val ch = spark.sql(
      "SELECT * FROM graft_chunk('tvfdocs', 'doc_id', 'text', 64, 8) " +
        "ORDER BY doc_id, chunk_id")
    assert(ch.collect().toSeq ==
      operators.CorpusOps.chunkDocuments(docs, "doc_id", "text", 64, 8)
        .orderBy(col("doc_id"), col("chunk_id")).collect().toSeq)

    val scored = docs.withColumn("score",
      TextFunctions.stableRound(TextFunctions.qualityScore(col("text")), 4))
    scored.createOrReplaceTempView("tvfscored")
    val sel = spark.sql(
      "SELECT * FROM graft_select_top('tvfscored', 'source', 'score', 250) ORDER BY doc_id")
    assert(sel.collect().toSeq ==
      operators.CorpusOps.selectTopShareByGroup(scored, "source", "score", 250)
        .orderBy(col("doc_id")).collect().toSeq)

    val pd = spark.sql(
      "SELECT * FROM graft_dedup_paragraphs('tvfdocs', 'doc_id', 'text') ORDER BY doc_id")
    assert(pd.collect().toSeq ==
      operators.Dedup.dedupParagraphs(docs, "doc_id", "text")
        .orderBy(col("doc_id")).collect().toSeq)

    val pdd = spark.sql(
      "SELECT * FROM graft_dedup_paragraphs_doc('tvfdocs', 'doc_id', 'text') ORDER BY doc_id")
    assert(pdd.collect().toSeq ==
      operators.Dedup.dedupParagraphsWithinDoc(docs, "doc_id", "text")
        .orderBy(col("doc_id")).collect().toSeq)

    val enc = spark.sql(
      "SELECT * FROM graft_encoding('tvfdocs', 'doc_id', 'text') ORDER BY doc_id")
    assert(enc.collect().toSeq ==
      operators.CorpusOps.encodingProfile(docs, "doc_id", "text")
        .orderBy(col("doc_id")).collect().toSeq)

    val div = spark.sql(
      "SELECT * FROM graft_diversity('tvfdocs', 'text', 'source', 3) ORDER BY source")
    assert(div.collect().toSeq ==
      operators.CorpusOps.ngramDiversity(docs, "text", "source", 3)
        .orderBy(col("source")).collect().toSeq)

    val ovl = spark.sql(
      "SELECT * FROM graft_overlap('tvfcorpus', 'tvfdocs', 'text')")
    assert(ovl.collect().toSeq ==
      operators.CorpusOps.corpusOverlap(
          spark.table("tvfcorpus"), docs, "text").collect().toSeq)

    graft.Tables.events(spark, graft.SparkTestSession.sf0001)
      .createOrReplaceTempView("tvfevents")
    val ses = spark.sql(
      "SELECT * FROM graft_sessions('tvfevents', 'user_id', 'ts', 1800) " +
        "ORDER BY user_id")
    assert(ses.collect().toSeq ==
      operators.Relational.sessionCounts(
          graft.Tables.events(spark, graft.SparkTestSession.sf0001),
          "user_id", "ts", 1800L * 1000000L)
        .orderBy(col("user_id")).collect().toSeq)

    val bm = spark.sql(
      "SELECT * FROM graft_bm25('tvfdocs', 'doc_id', 'text', 'data key value', 5)")
    assert(bm.collect().toSeq ==
      operators.CorpusOps.bm25Search(docs, "doc_id", "text",
          Seq("data", "key", "value"), k = 5)
        .collect().toSeq)

    // tokenizer parity: the corpus splits on single spaces only, so a doc
    // token may contain a tab — the TVF's query split must keep "a\tb" as
    // ONE term (a \s+ split would shred it into unmatchable halves)
    locally { import spark.implicits._
      Seq((1L, "a\tb plain"), (2L, "other words here"))
        .toDF("doc_id", "text").createOrReplaceTempView("tvftabdocs")
    }
    val tabHit = spark.sql(
      "SELECT doc_id FROM graft_bm25('tvftabdocs', 'doc_id', 'text', 'a\tb', 5)")
    assert(tabHit.collect().map(_.getLong(0)).toSeq == Seq(1L),
      "tab-containing doc token must be matchable via the TVF query string")

    val checked = spark.sql(
      "SELECT * FROM graft_check('tvfdocs', 'doc_id', 'short_text', 'length(text) < 40')")
    assert(checked.collect().toSeq ==
      operators.Validation.checkConstraints(docs, col("doc_id"),
        Seq("short_text" -> (length(col("text")) < 40))).collect().toSeq)
    val uniq = spark.sql("SELECT * FROM graft_check_unique('tvfdocs', 'source, doc_id')")
    assert(uniq.collect().toSeq ==
      operators.Validation.checkUnique(docs,
        Seq(col("source"), col("doc_id"))).collect().toSeq)
    val fk = spark.sql(
      "SELECT * FROM graft_check_fk('tvfdocs', 'doc_id', 'tvfcorpus', 'doc_id')")
    assert(fk.collect().toSeq ==
      operators.Validation.checkReferential(docs, col("doc_id"),
        spark.table("tvfcorpus"), col("doc_id")).collect().toSeq)

    locally { import spark.implicits._
      Seq((1L, "data value"), (2L, "key table"))
        .toDF("query_id", "query_text").createOrReplaceTempView("tvfqueries")
    }

    val packed = spark.sql(
      "SELECT * FROM graft_pack('tvfdocs', 'source', 'doc_id', 'text', 128) " +
        "ORDER BY source, doc_id")
    assert(packed.collect().toSeq ==
      operators.Sampling.packSequences(docs,
          Seq(col("source")), col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")), 128)
        .orderBy(col("source"), col("doc_id")).collect().toSeq)

    val packedRows = spark.sql(
      "SELECT * FROM graft_pack_rows('tvfdocs', 'source', 'doc_id', 'text', 128) " +
        "ORDER BY source, seq_id")
    assert(packedRows.collect().toSeq ==
      operators.Sampling.packSequenceRows(docs,
          Seq(col("source")), col("doc_id"), col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")), 128)
        .orderBy(col("source"), col("seq_id")).collect().toSeq)

    val bestfit = spark.sql(
      "SELECT * FROM graft_pack_bestfit('tvfdocs', 'source', 'doc_id', 'text', 512) " +
        "ORDER BY source, id")
    assert(bestfit.collect().toSeq ==
      operators.Sampling.packSequencesBestFit(docs,
          Seq(col("source")), col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")), 512)
        .orderBy(col("source"), col("id")).collect().toSeq)

    graft.Tables.events(spark, graft.SparkTestSession.sf0001)
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
      .createOrReplaceTempView("tvfclicks")
    graft.Tables.events(spark, graft.SparkTestSession.sf0001)
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
      .createOrReplaceTempView("tvfviews")
    val asof = spark.sql(
      "SELECT * FROM graft_asof('tvfclicks', 'tvfviews', 'user_id', 'ts', " +
        "'value', 'view_value') ORDER BY event_id")
    assert(asof.collect().toSeq ==
      operators.Relational.asofJoin(spark.table("tvfclicks"),
          spark.table("tvfviews"), "user_id", "ts", Map("value" -> "view_value"))
        .orderBy(col("event_id")).collect().toSeq)
    // 5-arg form: the carried column keeps its own name
    val asof5 = spark.sql(
      "SELECT * FROM graft_asof('tvfclicks', 'tvfviews', 'user_id', 'ts', " +
        "'value') ORDER BY event_id")
    assert(asof5.columns.contains("value") &&
      asof5.select(col("value")).collect().toSeq ==
        asof.select(col("view_value")).collect().toSeq)
    val bmm = spark.sql(
      "SELECT * FROM graft_bm25_many('tvfdocs', 'doc_id', 'text', " +
        "'tvfqueries', 'query_id', 'query_text', 5) ORDER BY query_id, rnk")
    assert(bmm.collect().toSeq ==
      operators.CorpusOps.bm25SearchMany(docs, "doc_id", "text",
          spark.table("tvfqueries"), "query_id", "query_text", k = 5)
        .orderBy(col("query_id"), col("rnk")).collect().toSeq)

    { import spark.implicits._
      Seq(1L -> "kitten", 2L -> "sitting", 3L -> "mitten", 4L -> "flour",
          5L -> "flower").toDF("id", "key")
        .createOrReplaceTempView("tvffuzzy") }

    val dr = spark.sql(
      "SELECT * FROM graft_drift('tvfcorpus', 'tvfdocs', 'n_chars', " +
        "0.0, 600.0, 12) ORDER BY bucket")
    assert(dr.collect().toSeq ==
      operators.Validation.distributionDrift(corpus, docs, "n_chars",
          0.0, 600.0, 12)
        .orderBy(col("bucket")).collect().toSeq)
    assert(dr.count() == 12)

    val gdr = spark.sql(
      "SELECT * FROM graft_group_drift('tvfcorpus', 'tvfdocs', 'lang', " +
        "'n_chars', 0.0, 600.0, 6) ORDER BY 1, 2")
    assert(gdr.collect().toSeq ==
      operators.Validation.distributionDriftByGroup(corpus, docs, "lang",
          "n_chars", 0.0, 600.0, 6)
        .orderBy(col("group"), col("bucket")).collect().toSeq)
    assert(gdr.count() % 6 == 0 && gdr.count() > 0)

    val cdr = spark.sql(
      "SELECT * FROM graft_cat_drift('tvfcorpus', 'tvfdocs', 'lang', 3) " +
        "ORDER BY category")
    assert(cdr.collect().toSeq ==
      operators.Validation.categoricalDrift(corpus, docs, "lang", topK = 3)
        .orderBy(col("category")).collect().toSeq)
    assert(cdr.count() == 4)

    val gcdr = spark.sql(
      "SELECT * FROM graft_group_cat_drift('tvfcorpus', 'tvfdocs', " +
        "'source', 'lang', 2) ORDER BY group, category")
    assert(gcdr.collect().toSeq ==
      operators.Validation.categoricalDriftByGroup(corpus, docs,
          "source", "lang", topK = 2)
        .orderBy(col("group"), col("category")).collect().toSeq)

    val embs = spark.read.parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
    embs.filter(col("vec_id") % 2 === 0).createOrReplaceTempView("tvfembref")
    embs.filter(col("vec_id") % 2 === 1).createOrReplaceTempView("tvfembcur")
    val edr = spark.sql(
      "SELECT * FROM graft_embed_drift('tvfembref', 'tvfembcur', 'label', " +
        "'embedding') ORDER BY label")
    assert(edr.collect().toSeq ==
      operators.Similarity.embeddingDrift(
          embs.filter(col("vec_id") % 2 === 0),
          embs.filter(col("vec_id") % 2 === 1), "label", "embedding")
        .orderBy(col("label")).collect().toSeq)
    assert(edr.count() == 10)
    val fz = spark.sql(
      "SELECT * FROM graft_fuzzy_pairs('tvffuzzy', 'id', 'key', 2) " +
        "ORDER BY id_a, id_b")
    assert(fz.collect().toSeq ==
      operators.Fuzzy.fuzzyPairs(spark.table("tvffuzzy"), "id", "key", 2)
        .orderBy(col("id_a"), col("id_b")).collect().toSeq)
    assert(fz.count() > 0)

    val fj = spark.sql(
      "SELECT * FROM graft_fuzzy_join('tvffuzzy', 'tvffuzzy', 'id', 'key', " +
        "'id', 'key', 1) WHERE id_l < id_r ORDER BY id_l, id_r")
    assert(fj.collect().toSeq ==
      operators.Fuzzy.fuzzyJoin(spark.table("tvffuzzy"), spark.table("tvffuzzy"),
          "id", "key", "id", "key", 1)
        .filter(col("id_l") < col("id_r"))
        .orderBy(col("id_l"), col("id_r")).collect().toSeq)

    val cls = spark.sql(
      "SELECT * FROM graft_classify('tvfdocs', 'doc_id', 'text', 'lang = ''en''') " +
        "ORDER BY doc_id")
    assert(cls.collect().toSeq ==
      operators.CorpusOps.naiveBayesScore(docs, "doc_id", "text",
          expr("lang = 'en'"))
        .orderBy(col("doc_id")).collect().toSeq)

    val vd = spark.sql(
      "SELECT * FROM graft_vocab_drift('tvfcorpus', 'tvfdocs', 'doc_id', 'text', 10)")
    assert(vd.collect().toSeq ==
      operators.CorpusOps.vocabularyDrift(
          spark.table("tvfcorpus"), docs, "doc_id", "text", 10)
        .collect().toSeq)

    val cd = spark.sql(
      "SELECT * FROM graft_corpus_diff('tvfcorpus', 'tvfdocs', 'doc_id', 'text') " +
        "ORDER BY doc_id")
    assert(cd.collect().toSeq ==
      operators.CorpusOps.corpusDiff(corpus, docs, "doc_id", "text")
        .orderBy(col("doc_id")).collect().toSeq)

    val blm = spark.sql(
      "SELECT * FROM graft_lm_bigram('tvfdocs', 'doc_id', 'text', 0.5) ORDER BY doc_id")
    assert(blm.collect().toSeq ==
      operators.CorpusOps.bigramLmScore(docs, "doc_id", "text", lambda = 0.5)
        .orderBy(col("doc_id")).collect().toSeq)

    // TVFs compose with plain SQL on top
    val top = spark.sql(
      """SELECT term, count(*) AS n FROM graft_tfidf('tvfdocs', 'doc_id', 'text', 1)
        |GROUP BY term ORDER BY n DESC, term LIMIT 3""".stripMargin).collect()
    assert(top.nonEmpty)

    // argument validation is pointed
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_tfidf('tvfdocs', 'doc_id')").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("between 3 and 4") || m.contains("graft_tfidf")))
  }

  test("spark.sql.extensions wiring registers scalar AND table functions") {
    // exactly what the session builder does with spark.sql.extensions set:
    // apply the extension class, then register into the session registries
    // (a second SparkContext isn't constructible in the shared test JVM, so
    // the wiring is exercised against fresh registries directly)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val fr = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    val tfr = new org.apache.spark.sql.catalyst.analysis.SimpleTableFunctionRegistry
    org.apache.spark.sql.graft.ColumnBridge.applyExtensions(ext, fr, tfr)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    for (f <- GraftExtensions.functions.map(_._1))
      assert(fr.functionExists(f), s"scalar $f missing from config-path registry")
    for (f <- GraftExtensions.tableFunctions.map(_._1))
      assert(tfr.functionExists(f), s"table fn $f missing from config-path registry")
    assert(tfr.functionExists(FunctionIdentifier("graft_tfidf")))
  }
}
