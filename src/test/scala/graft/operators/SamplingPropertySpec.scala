package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the hash-sampling threshold math (deterministic
  * seeded sampling — no scalatestplus bridge in the offline cache). The
  * Spark/DuckDB agreement itself is covered by the q_sample_split oracle;
  * these pin the pure threshold function. */
class SamplingPropertySpec extends AnyFunSuite {

  private def forSamples[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val hex13Gen: Gen[String] =
    Gen.listOfN(13, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)

  test("hexThreshold is 13 lowercase hex chars for rate < 1, 'g' at >= 1") {
    forSamples(Gen.choose(0.0, 0.999999)) { r =>
      val t = Sampling.hexThreshold(r)
      assert(t.length == 13 && t.forall(c => c.isDigit || ('a' to 'f').contains(c)), t)
    }
    forSamples(Gen.choose(1.0, 100.0)) { r =>
      assert(Sampling.hexThreshold(r) == "g")
    }
  }

  test("threshold is monotone in rate and brackets every hash") {
    forSamples(Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0))) { case (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      assert(Sampling.hexThreshold(lo) <= Sampling.hexThreshold(hi))
    }
    forSamples(hex13Gen) { h =>
      assert(h < Sampling.hexThreshold(1.0), "rate 1 keeps every hash")
      assert(h >= Sampling.hexThreshold(0.0), "rate 0 keeps none")
    }
  }

  test("rate-monotone membership: a kept hash stays kept at any higher rate") {
    forSamples(Gen.zip(hex13Gen, Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0))) {
      case (h, a, b) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        if (h < Sampling.hexThreshold(lo)) assert(h < Sampling.hexThreshold(hi))
    }
  }

  test("sqlHashSplit and hashSplit share identical cumulative thresholds") {
    val w = Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    val sql = Sampling.sqlHashSplit("text", w)
    assert(sql.contains(Sampling.hexThreshold(0.5)))
    assert(sql.contains(Sampling.hexThreshold(0.8)))
    assert(!sql.contains("'g'") || sql.endsWith("'c'"), "last split is the fallback")
  }

  test("two-phase as-of carry == driver brute force on random inputs") {
    // random keys/times/nullable values, duplicate right times included:
    // the bucketed carry (within-bucket window + cross-bucket carry-in)
    // must match a literal per-row scan of the deduped right side
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val gen = Gen.zip(
      Gen.listOf(Gen.zip(Gen.oneOf("k1", "k2"), Gen.choose(0L, 500L))),
      Gen.listOf(Gen.zip(Gen.oneOf("k1", "k2"), Gen.choose(0L, 500L),
        Gen.option(Gen.choose(0L, 99L)))))
    forSamples(gen, n = 8) { case (lRows0, rRows0) =>
      val lRows = lRows0.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      if (lRows.nonEmpty) {
        val l = lRows.toDF("id", "k", "t")
        val r = rRows0.toDF("k", "t", "v")
        val got = Relational.asofJoin(l, r, "k", "t", Map("v" -> "v"))
          .select($"id", $"v").as[(Long, Option[Long])].collect().toMap
        // the fit-once probe form must be value-identical to the composed
        // join on every random input (in-bucket, carry-in, and
        // missing-bucket fallback paths all get exercised)
        val fitted = Relational.asofFit(r, "k", "t", Map("v" -> "v"))
        val gotFit = Relational.asofJoinWith(l, fitted, "k", "t")
          .select($"id", $"v").as[(Long, Option[Long])].collect().toMap
        assert(gotFit == got, s"asofJoinWith diverged from asofJoin; right=$rRows0")
        // brute force over the max-deduped right side
        val dedup = rRows0.groupBy(r => (r._1, r._2)).map { case ((k, t), g) =>
          (k, t, g.flatMap(_._3).reduceOption(_ max _))
        }.toSeq
        lRows.foreach { case (id, k, t) =>
          val exp = dedup.filter(r => r._1 == k && r._2 <= t && r._3.isDefined)
            .sortBy(_._2).lastOption.flatMap(_._3)
          assert(got(id) == exp,
            s"left ($k,$t): got ${got(id)}, expected $exp; right=$rRows0")
        }
      }
    }
  }

  test("fitted as-of probe == composed join under adversarial inputs: " +
      "null keys/times, out-of-range probes, exact ties") {
    // the dense-index edge paths: probes BELOW every data bucket (null
    // answer), probes far PAST the key's last data (summary carry), gap
    // buckets, exact (t, probe) ties, null keys on BOTH sides (null-safe
    // key match), and null times on both sides (right null-t rows are
    // dropped by contract; a null probe time matches nothing)
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val keyGen = Gen.oneOf(Gen.const(Some("k1")), Gen.const(Some("k2")),
      Gen.const(Option.empty[String]))
    // half the probe times land inside the right's [0, 500] axis (frequent
    // exact ties), half sweep far below/above it
    val lTimeGen = Gen.frequency(
      1 -> Gen.choose(-3000L, 3000L), 1 -> Gen.choose(0L, 500L))
    val gen = Gen.zip(
      Gen.listOf(Gen.zip(keyGen, Gen.option(lTimeGen))),
      Gen.listOf(Gen.zip(keyGen, Gen.option(Gen.choose(0L, 500L)),
        Gen.option(Gen.choose(0L, 99L)))))
    forSamples(gen, n = 12) { case (lRows0, rRows0) =>
      val lRows = lRows0.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      if (lRows.nonEmpty) {
        val l = lRows.toDF("id", "k", "t")
        val r = rRows0.toDF("k", "t", "v")
        val got = Relational.asofJoin(l, r, "k", "t", Map("v" -> "v"))
          .select($"id", $"v").as[(Long, Option[Long])].collect().toMap
        val fitted = Relational.asofFit(r, "k", "t", Map("v" -> "v"))
        val gotFit = Relational.asofJoinWith(l, fitted, "k", "t")
          .select($"id", $"v").as[(Long, Option[Long])].collect().toMap
        assert(gotFit == got,
          s"asofJoinWith diverged from asofJoin; left=$lRows0 right=$rRows0")
        // brute force: right rows with a null time are dropped; per-column
        // last-non-null among rows at-or-before the probe; a null probe
        // time or unseen/null-mismatched key yields null
        val dedup = rRows0.filter(_._2.isDefined)
          .groupBy(row => (row._1, row._2)).map { case ((k, t), g) =>
            (k, t.get, g.flatMap(_._3).reduceOption(_ max _))
          }.toSeq
        lRows.foreach { case (id, k, t) =>
          val exp = t.flatMap { tt =>
            dedup.filter(row => row._1 == k && row._2 <= tt && row._3.isDefined)
              .sortBy(_._2).lastOption.flatMap(_._3)
          }
          assert(got(id) == exp,
            s"left ($k,$t): got ${got(id)}, expected $exp; right=$rRows0")
        }
      }
    }
  }

  test("fitted as-of probe == composed join == brute force: 300 combined adversarial samples") {
    // prescription-scale randomized sweep of asofJoinWith's dense-index
    // edge paths: 300 samples ride as composite keys in 6 combined frame
    // pairs (the sessionCounts technique), so each block's fit sees 50
    // different per-sample distributions cut by ONE shared [p1,p99] probe
    // bucket — gap buckets, probes below every data bucket and far past
    // the last one, exact (t, probe) ties, and null keys/times on both
    // sides (null keys from different samples deliberately merge into one
    // global null-key group: the brute force treats them identically, so
    // the null-safe key match is exercised across a LARGE frame, not a
    // toy one)
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val keyGen = Gen.oneOf(Gen.const(Some("k1")), Gen.const(Some("k2")),
      Gen.const(Option.empty[String]))
    val lTimeGen = Gen.frequency(
      1 -> Gen.choose(-3000L, 3000L), 1 -> Gen.choose(0L, 500L))
    val sampleGen = Gen.zip(
      Gen.listOf(Gen.zip(keyGen, Gen.option(lTimeGen))),
      Gen.listOf(Gen.zip(keyGen, Gen.option(Gen.choose(0L, 500L)),
        Gen.option(Gen.choose(0L, 99L)))))
    def check(lRows: Seq[(Long, Option[String], Option[Long])],
        rRows: Seq[(Option[String], Option[Long], Option[Long])]): Unit = {
      val l = lRows.toDF("id", "k", "t")
      val r = rRows.toDF("k", "t", "v")
      val got = Relational.asofJoin(l, r, "k", "t", Map("v" -> "v"))
        .select($"id", $"v").as[(Long, Option[Long])].collect().toMap
      val fitted = Relational.asofFit(r, "k", "t", Map("v" -> "v"))
      val gotFit = Relational.asofJoinWith(l, fitted, "k", "t")
        .select($"id", $"v").as[(Long, Option[Long])].collect().toMap
      assert(gotFit == got, "asofJoinWith diverged from asofJoin; first diffs: " +
        (got.toSet diff gotFit.toSet).take(3) + " expected vs got " +
        (gotFit.toSet diff got.toSet).take(3))
      val dedup = rRows.filter(_._2.isDefined)
        .groupBy(row => (row._1, row._2)).map { case ((k, t), g) =>
          (k, t.get, g.flatMap(_._3).reduceOption(_ max _))
        }.toSeq
      lRows.foreach { case (id, k, t) =>
        val exp = t.flatMap { tt =>
          dedup.filter(row => row._1 == k && row._2 <= tt && row._3.isDefined)
            .sortBy(_._2).lastOption.flatMap(_._3)
        }
        assert(got(id) == exp, s"left ($k,$t): got ${got(id)}, expected $exp")
      }
    }
    var nextId = 0L
    for (block <- 0 until 6) {
      val (lAll, rAll) = (0 until 50).map { i =>
        val (lRows0, rRows0) = sampleGen(Gen.Parameters.default,
          Seed((1000 + block * 50 + i).toLong)).getOrElse((Nil, Nil))
        def tag(k: Option[String]) = k.map(kk => s"s${i}|$kk")
        (lRows0.map { case (k, t) =>
          nextId += 1; (nextId, tag(k), t)
        }, rRows0.map { case (k, t, v) => (tag(k), t, v) })
      }.unzip
      val (lRows, rRows) = (lAll.flatten, rAll.flatten)
      if (lRows.nonEmpty) check(lRows, rRows)
    }
    // degenerate axes the random sweep can miss: an all-equal right time
    // axis (p1 == p99 -> the probe bucket collapses to a single bucket)
    // probed below, at, and above the one data point; and probes exactly
    // on the right axis's own min/max values (the [p1,p99] edges)
    check(Seq((9001L, Some("k"), Some(41L)), (9002L, Some("k"), Some(42L)),
        (9003L, Some("k"), Some(43L)), (9004L, Some("k"), None)),
      Seq.fill(20)((Some("k"), Some(42L), Some(7L))))
    check((0L to 100L).map(t => (9100L + t, Some("k"), Some(t))) ++
        Seq((9300L, Some("k"), Some(0L)), (9301L, Some("k"), Some(100L))),
      (0L to 100L by 5).map(t => (Some("k"), Some(t), Some(t))))
  }

  test("packSequenceRows == driver brute force: random token streams, tiling invariants") {
    // the materialized loader view must equal a literal driver-side
    // concat-and-chunk for any token-count distribution (zeros included):
    // same sequences, same slice order, same (id, start, len) spans
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val gen = Gen.listOf(Gen.zip(Gen.oneOf("g1", "g2"), Gen.choose(0L, 40L)))
    forSamples(gen, n = 25) { rows0 =>
      val rows = rows0.zipWithIndex.map { case ((g, t), i) => (g, i.toLong, t) }
      if (rows.nonEmpty) {
        val maxSeqLen = 16
        val df = rows.toDF("g", "doc_id", "n_tok").repartition(5)
        val got = Sampling.packSequenceRows(df, Seq($"g"), $"doc_id",
            $"doc_id", $"n_tok", maxSeqLen)
          .select($"g", $"seq_id", $"n_docs", $"seq_tokens", $"slices")
          .as[(String, Long, Long, Long, Seq[(Long, Long, Long, Long)])]
          .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
        // brute force: lay each group's docs out in doc_id order, walk the
        // token stream cutting every maxSeqLen tokens
        val expected = rows.groupBy(_._1).toList.flatMap { case (g, grp) =>
          var off = 0L
          val slices = grp.sortBy(_._2).flatMap { case (_, id, t) =>
            val out = (off until off + t).grouped(1).toSeq // per-token walk
              .flatten.groupBy(_ / maxSeqLen).toSeq.map { case (seq, toks) =>
                (seq, (toks.min % maxSeqLen, id, toks.min - off, toks.length.toLong))
              }
            off += t
            out
          }
          slices.groupBy(_._1).map { case (seq, ss) =>
            val sorted = ss.map(_._2).sortBy(_._1)
            (g, seq) -> ((sorted.length.toLong, sorted.map(_._4).sum, sorted))
          }
        }.toMap
        assert(got == expected,
          s"diff keys: ${(expected.keySet diff got.keySet) ++ (got.keySet diff expected.keySet)}")
      }
    }
  }

  test("bucketed sessionCounts == driver brute force: 300 random samples + degenerate spacings") {
    // the two-phase form (within-(key, bucket) lag + sorted-array boundary
    // merge) must equal the naive per-key scan for any keys/timestamps/gaps;
    // 300 random samples ride as disjoint composite keys in 6 combined
    // frames (one per gap), so the bucket-boundary merge sees 50 different
    // distributions cut by ONE shared boundary sample per frame
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_micros
    def bruteCheck(rows: Seq[(String, Long)], gapMicros: Long): Unit = {
      val df = rows.toDF("k", "t").select($"k", timestamp_micros($"t").as("ts"))
      val got = Relational.sessionCounts(df, "k", "ts", gapMicros)
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val exp = rows.groupBy(_._1).map { case (k, g) =>
        val ts = g.map(_._2).sorted
        val breaks = ts.zip(ts.drop(1)).count { case (a, b) => b - a > gapMicros }
        k -> (((breaks + 1).toLong, ts.length.toLong))
      }
      assert(got == exp, s"gap=$gapMicros; first diffs: " +
        (exp.toSet diff got.toSet).take(3) + " expected vs got " +
        (got.toSet diff exp.toSet).take(3))
    }
    val rowGen = Gen.listOf(Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0L, 2000L)))
    for ((gap, block) <- Seq(1L, 7L, 10L, 50L, 123L, 400L).zipWithIndex) {
      val combined = (0 until 50).flatMap { i =>
        val sample = rowGen(Gen.Parameters.default,
          Seed((block * 50 + i).toLong)).getOrElse(Nil)
        sample.map { case (k, t) => (s"s${i}_$k", t) }
      }
      if (combined.nonEmpty) bruteCheck(combined, gap)
    }
    // all-equal timestamps: every event lands ON one bucket boundary value
    bruteCheck(Seq.fill(200)(("k", 777L)), 10L)
    // spacing EXACTLY the gap never splits (the rule is strictly-greater);
    // one microsecond less splits everywhere — the boundary-merge's
    // cross-bucket comparison must honor the same strictness
    bruteCheck((0 until 100).map(i => ("k", i * 10L)), 10L)
    bruteCheck((0 until 100).map(i => ("k", i * 10L)), 9L)
  }

  test("bucketed prefix sum: a null token count is 0, never poisons later buckets") {
    // a null value alone in its bucket used to null that bucket's subtotal
    // and, through the offset aggregate, EVERY later bucket's cumulative —
    // silently dropping whole bucket ranges from the budget filter. Window
    // SUM semantics (nulls ignored) must hold instead.
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val rows = (0 until 64).map(i => ("g", s"doc_$i",
      if (i % 5 == 0) None else Some(3L)))
    val df = rows.toDF("src", "doc_id", "n_tok")
    val kept = Sampling.capPerGroupTokens(df, Seq($"src"), $"doc_id", $"doc_id",
        $"n_tok", budget = Long.MaxValue / 4)
      .select($"doc_id").as[String].collect()
    assert(kept.length == 64,
      s"null token counts dropped ${64 - kept.length} rows from later buckets")
  }

  test("bucketed prefix sum == naive per-group cumsum on random inputs") {
    // the two-phase prefix sum must be VALUE-identical to the single-window
    // form for any data, group skew, duplicate tokens, or partitioning —
    // randomized inputs sweep the shapes the fixed-fixture tests miss
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val rowsGen = Gen.listOf(Gen.zip(
      Gen.oneOf("g1", "g2", "g3"),           // group (few, to force overlap)
      Gen.choose(0, 9999),                   // id (may collide -> same hash)
      Gen.choose(0L, 50L)))                  // token count (zeros included)
    forSamples(rowsGen, n = 8) { rows0 =>
      val rows = rows0.zipWithIndex
        .map { case ((g, id, t), i) => (g, s"d${id}_$i", t) } // unique ids
      if (rows.nonEmpty) {
        val df = rows.toDF("src", "doc_id", "n_tok").repartition(5)
        // naive reference: driver-side sort by (md5-hex order, tiebreak)
        def hex(s: String): String = {
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(s.getBytes("UTF-8"))
          d.map("%02x".format(_)).mkString.substring(0, 13)
        }
        // .toList before flatMap: flatMapping the groupBy Map directly would
        // rebuild a Map keyed by group and silently keep ONE pair per group
        val expected = rows.groupBy(_._1).toList.flatMap { case (_, grp) =>
          var cum = 0L
          grp.sortBy { case (_, id, _) => (hex(id), id) }.flatMap {
            case (g, id, t) =>
              cum += t
              if (cum <= 100L) Some((g, id)) else None
          }
        }.toSet
        val got = Sampling.capPerGroupTokens(df, Seq($"src"), $"doc_id",
            $"doc_id", $"n_tok", budget = 100L)
          .select($"src", $"doc_id").as[(String, String)].collect().toSet
        assert(got == expected,
          s"mismatch: extra=${got -- expected} missing=${expected -- got} rows=$rows")
      }
    }
  }

  test("chunked best-fit packing == plain-Scala FFD simulator: random corpora sweep") {
    // the distributed chunk-then-first-fit-decreasing packer must equal a
    // literal driver-side simulator for any token-count mix (zeros,
    // exact multiples, oversized docs), plus the packing invariants:
    // minimal piece sets, no piece spans sequences, never more bins than
    // next-fit over the same piece order
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val maxSeqLen = 16
    def piecesOf(id: Long, t: Long): Seq[(Long, Long, Long)] = {
      val np = math.max(1L, (t + maxSeqLen - 1) / maxSeqLen)
      (0L until np).map(p => (id, p, math.min(maxSeqLen.toLong, t - p * maxSeqLen)))
    }
    val gen = Gen.listOf(Gen.zip(Gen.oneOf("g1", "g2"), Gen.choose(0L, 50L)))
    forSamples(gen, n = 25) { rows0 =>
      val docs = rows0.zipWithIndex.map { case ((g, t), i) => (g, i.toLong, t) }
      if (docs.nonEmpty) {
        val df = docs.toDF("g", "doc_id", "n_tok").repartition(5)
        val got = Sampling.packSequencesBestFitChunked(df, Seq($"g"),
            $"doc_id", $"n_tok", maxSeqLen, bucketCol = Some(lit(0)))
          .select($"g", $"id", $"piece", $"n_tokens", $"seq_id", $"seq_offset")
          .as[(String, Long, Long, Long, Long, Long)].collect()
        // (a) minimal piece sets: ceil(t/max) pieces, all but the last full
        val byDoc = got.groupBy(r => (r._1, r._2))
        docs.foreach { case (g, id, t) =>
          val ps = byDoc((g, id)).sortBy(_._3)
          val want = math.max(1L, (t + maxSeqLen - 1) / maxSeqLen)
          assert(ps.length == want && ps.map(_._3).toSeq == (0L until want),
            s"doc ($g,$id,$t) pieces ${ps.toSeq}")
          assert(ps.dropRight(1).forall(_._4 == maxSeqLen) && ps.map(_._4).sum == t)
        }
        // (b) no piece spans sequences
        assert(got.filter(_._5 >= 0).forall(r => r._6 + r._4 <= maxSeqLen))
        // (d) placement equality with the simulator (len desc, (id, piece)
        // asc, lowest-indexed fitting bin; zero-len pieces occupy nothing)
        val sim = docs.groupBy(_._1).flatMap { case (g, ds) =>
          val order = ds.flatMap { case (_, id, t) => piecesOf(id, t) }
            .sortBy { case (id, p, len) => (-len, id, p) }
          val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
          order.map { case (id, p, len) =>
            if (len == 0L) (g, id, p) -> ((-1L, 0L))
            else {
              var i = 0
              while (i < bins.length && bins(i) + len > maxSeqLen) i += 1
              if (i == bins.length) bins += 0L
              val off = bins(i); bins(i) += len
              (g, id, p) -> ((i.toLong, off))
            }
          }
        }
        got.foreach(r => assert(sim((r._1, r._2, r._3)) == ((r._5, r._6)),
          s"row $r expected ${sim((r._1, r._2, r._3))}"))
        // (c) FFD never uses more bins than next-fit over the same order
        docs.groupBy(_._1).foreach { case (g, ds) =>
          val lens = ds.flatMap { case (_, id, t) => piecesOf(id, t) }
            .sortBy { case (id, p, len) => (-len, id, p) }
            .map(_._3).filter(_ > 0)
          var nf = 0; var cur = 0L
          lens.foreach { l =>
            if (nf == 0 || cur + l > maxSeqLen) { nf += 1; cur = l }
            else cur += l
          }
          val ffd = got.filter(r => r._1 == g && r._5 >= 0).map(_._5).distinct.length
          assert(ffd <= nf, s"group $g: FFD $ffd bins > next-fit $nf")
        }
      }
    }
  }
}
