package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("asofJoin attaches the latest right row at or before each left time, per key") {
    val trades = Seq(
      (1L, "A", ts(10)), (2L, "A", ts(25)), (3L, "B", ts(15)), (4L, "B", ts(5)))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts(8), 100.0), ("A", ts(10), 101.0), ("A", ts(20), 102.0),
      ("B", ts(12), 50.0))
      .toDF("sym", "ts", "px")
    val got = Relational.asofJoin(trades, quotes, "sym", "ts", Map("px" -> "px"))
      .select($"trade_id", $"px").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(101.0)) // quote at exactly t=10 counts (<=)
    assert(got(2L).contains(102.0)) // latest prior quote
    assert(got(3L).contains(50.0))
    assert(got(4L).isEmpty)         // no quote before t=5
  }

  test("asofJoin carries each column's last NON-NULL value independently, across buckets") {
    // column A goes null at the latest quote while B updates: the carry
    // must pull A from the older quote and B from the newer one — the
    // last(ignoreNulls) per-column semantic, which the cross-bucket
    // carry-in must preserve (many distinct times spread the rows over
    // the sampled time buckets, so carries routinely cross boundaries)
    val trades = (100L to 400L by 10).map(t => (t, "K", ts(t)))
      .toDF("trade_id", "sym", "ts")
    val quotes = (
      (1L to 395L by 7).map(t => ("K", ts(t), Some(t * 1.0), Option.empty[Double])) :+
        (("K", ts(50), Option.empty[Double], Some(7.7))))
      .toDF("sym", "ts", "a", "b")
    val got = Relational.asofJoin(trades, quotes, "sym", "ts",
        Map("a" -> "a", "b" -> "b"))
      .select($"trade_id", $"a", $"b")
      .as[(Long, Option[Double], Option[Double])].collect()
    got.foreach { case (t, a, b) =>
      val expA = (1L to 395L by 7).filter(_ <= t).lastOption.map(_ * 1.0)
      assert(a == expA, s"trade $t: a=$a expected $expA")
      assert(b.contains(7.7), s"trade $t: b=$b expected 7.7 carried from ts=50")
    }
  }

  test("asofJoin deduplicates right side ties deterministically (max)") {
    val l = Seq((1L, "K", ts(10))).toDF("id", "k", "ts")
    val r = Seq(("K", ts(10), 1.0), ("K", ts(10), 9.0)).toDF("k", "ts", "v")
    val got = Relational.asofJoin(l, r, "k", "ts", Map("v" -> "v"))
      .select($"v").as[Double].head()
    assert(got == 9.0)
  }

  test("asofJoin and asofFit drop null-time right rows and null probe times identically") {
    // contract: a right row with unknown time is never "at or before" any
    // probe (the rows a correlated WHERE t <= probe subquery excludes),
    // and a null probe time matches nothing — BOTH engines, so the
    // fit-once streaming path can never diverge from the composed join
    val l = Seq((1L, "K", Some(ts(10))), (2L, "K", Option.empty[Timestamp]))
      .toDF("id", "k", "ts")
    val r = Seq(("K", Option.empty[Timestamp], 666.0), ("K", Some(ts(5)), 5.0))
      .toDF("k", "ts", "v")
    val exp = Map(1L -> Some(5.0), 2L -> None)
    val got = Relational.asofJoin(l, r, "k", "ts", Map("v" -> "v"))
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(got == exp, s"asofJoin: $got")
    val fitted = Relational.asofFit(r, "k", "ts", Map("v" -> "v"))
    val gotFit = Relational.asofJoinWith(l, fitted, "k", "ts")
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(gotFit == exp, s"asofJoinWith: $gotFit")
  }

  test("asofFit probe equals asofJoin on a DATE time axis (date->timestamp bucket path)") {
    import org.apache.spark.sql.functions._
    def d(s: String) = java.sql.Date.valueOf(s)
    val left = Seq((1L, "K", d("2024-01-05")), (2L, "K", d("2024-03-01")),
      (3L, "K", d("2023-12-01")), (4L, "Z", d("2024-06-01")))
      .toDF("id", "k", "day")
    val right = Seq(("K", d("2024-01-01"), 10L), ("K", d("2024-02-15"), 20L),
      ("K", d("2024-05-01"), 30L)).toDF("k", "day", "v")
    val exp = Relational.asofJoin(left, right, "k", "day", Map("v" -> "v"))
      .select($"id", $"v").as[(Long, Option[Long])].collect().toMap
    val fitted = Relational.asofFit(right, "k", "day", Map("v" -> "v"))
    val got = Relational.asofJoinWith(left, fitted, "k", "day")
      .select($"id", $"v").as[(Long, Option[Long])].collect().toMap
    assert(got == exp, s"got $got expected $exp")
    assert(got == Map(1L -> Some(10L), 2L -> Some(20L), 3L -> None, 4L -> None))
  }

  test("asofFit.release unpersists the shared probe frames; probes still answer") {
    import org.apache.spark.storage.StorageLevel
    val l = Seq((1L, "K", ts(10))).toDF("id", "k", "ts")
    val r = Seq(("K", ts(5), 5.0)).toDF("k", "ts", "v")
    val fitted = Relational.asofFit(r, "k", "ts", Map("v" -> "v"))
    def probe() = Relational.asofJoinWith(l, fitted, "k", "ts")
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(probe() == Map(1L -> Some(5.0)))
    assert(fitted.byKey.storageLevel != StorageLevel.NONE)
    fitted.release()
    assert(fitted.byBucket.storageLevel == StorageLevel.NONE &&
      fitted.byKey.storageLevel == StorageLevel.NONE)
    assert(probe() == Map(1L -> Some(5.0))) // lineage recompute, not failure
  }

  test("rangeJoinMicros finds exactly the pairs within tolerance (vs brute force)") {
    val l = Seq((1L, 0L), (2L, 1000L), (3L, 5000L)).toDF("id", "t")
    val r = Seq((10L, 900L), (11L, 2500L), (12L, 99999L)).toDF("id", "t")
    val got = Relational.rangeJoinMicros(l, r, "t", "t", 1000L)
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
    // brute force: |l-r| <= 1000
    val expected = (for {
      (li, lt) <- Seq((1L, 0L), (2L, 1000L), (3L, 5000L))
      (ri, rt) <- Seq((10L, 900L), (11L, 2500L), (12L, 99999L))
      if math.abs(lt - rt) <= 1000
    } yield (li, ri)).toSet
    assert(got == expected, s"got $got expected $expected")
  }

  test("rangeJoinMicros matches a brute-force inequality join on real data") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, SparkTestSession.sf0001)
    val a = ev.filter($"event_type" === "click")
      .select($"event_id", unix_micros($"ts").as("t"))
    val b = ev.filter($"event_type" === "error")
      .select($"event_id", unix_micros($"ts").as("t"))
    val tol = 300L * 1000000L
    val banded = Relational.rangeJoinMicros(a, b, "t", "t", tol).count()
    val brute = a.as("a").join(b.as("b"),
      abs(col("a.t") - col("b.t")) <= tol).count()
    assert(banded == brute, s"banded $banded != brute $brute")
  }
}

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("HLL distinct sketch estimates within 5% of exact and merges losslessly") {
    val li = graft.Tables.lineitem(spark, SparkTestSession.sf001)
    val sk = Sketches.distinctSketch(li, Seq($"l_returnflag"), $"l_partkey")
    val exact = li.groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    val est = sk.select($"l_returnflag", $"n_approx").as[(String, Long)].collect().toMap
    for ((k, e) <- exact) {
      val a = est(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: est $a vs exact $e")
    }
    // merged global estimate ~ global distinct
    val global = Sketches.mergeDistinctSketches(sk)
    val globalExact = li.select(countDistinct($"l_partkey")).as[Long].head()
    assert(math.abs(global - globalExact).toDouble / globalExact < 0.05,
      s"merged $global vs exact $globalExact")
  }

  test("numericProfile returns ordered quantiles within range") {
    val ev = graft.Tables.events(spark, SparkTestSession.sf0001)
    val p = Sketches.numericProfile(ev, Seq($"event_type"), $"value")
      .as[(String, Long, Double, Double, Double, Seq[Double])].collect()
    assert(p.nonEmpty)
    p.foreach { case (_, n, avg, mn, mx, qs) =>
      assert(n > 0 && avg >= mn && avg <= mx)
      assert(qs.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)), qs.toString)
      assert(qs.forall(q => q >= mn && q <= mx))
    }
  }

  test("numericProfile n counts non-null values only (the quantiles' population)") {
    // avg/min/max/percentile_approx all skip nulls; n must describe the
    // same population, or rank-bound checks [(p-eps)n, (p+eps)n] computed
    // from it are against the wrong n whenever the column contains nulls
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None), ("b", None)).toDF("g", "value")
    val p = Sketches.numericProfile(df, Seq($"g"), $"value")
      .select($"g", $"n").as[(String, Long)].collect().toMap
    assert(p == Map("a" -> 2L, "b" -> 0L), p.toString)
  }

  test("saltedJoin returns exactly the plain equi-join rows") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, graft.SparkTestSession.sf0001)
    val o = graft.Tables.orders(spark, graft.SparkTestSession.sf0001)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"l_orderkey", $"l_linenumber", $"o_custkey")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val salted = key(Relational.saltedJoin(li, o, "l_orderkey", "o_orderkey",
      col("l_linenumber"), salts = 4))
    val plain = key(li.join(o, li("l_orderkey") === o("o_orderkey")))
    assert(salted == plain && salted.nonEmpty)
  }

  test("hashSample/hashSplit are deterministic, size-proportional, and total") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, graft.SparkTestSession.sf001)
    val n = docs.count().toDouble
    val s1 = Sampling.hashSample(docs, col("text"), 0.3)
    assert(s1.count() == Sampling.hashSample(docs, col("text"), 0.3).count())
    assert(math.abs(s1.count() / n - 0.3) < 0.1, s"sample rate ${s1.count() / n}")
    // rate >= 1 keeps everything (the threshold must sort above every hash)
    assert(Sampling.hashSample(docs, col("text"), 1.0).count() == n.toLong)
    val split = Sampling.hashSplit(docs, col("text"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val byLabel = split.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(byLabel.values.sum == n.toLong, "every row gets exactly one split")
    assert(math.abs(byLabel("train") / n - 0.8) < 0.1)
    // assignment is content-determined: a subset keeps its labels
    val sub = Sampling.hashSplit(docs.limit(50), col("text"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val full = split.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(sub.forall { case (id, lbl) => full(id) == lbl })
  }

  test("temperatureRates follows size^alpha; sampling approximates it") {
    import org.apache.spark.sql.functions._
    // head group 16x the tail: alpha=0.5 should keep the head at
    // sqrt(1/16)=1/4 the tail's rate
    val df = spark.range(1700).select(
      when($"id" < 1600, lit("head")).otherwise(lit("tail")).as("g"),
      concat(lit("doc "), $"id").as("text"))
    val r1 = Sampling.temperatureRates(df, col("g"), alpha = 1.0)
    assert(r1 == Map("head" -> 1.0, "tail" -> 1.0), s"alpha=1 is identity: $r1")
    val r0 = Sampling.temperatureRates(df, col("g"), alpha = 0.0)
    assert(r0("tail") == 1.0 && math.abs(r0("head") - 100.0 / 1600.0) < 1e-12,
      s"alpha=0 equalizes expected counts: $r0")
    val rHalf = Sampling.temperatureRates(df, col("g"), alpha = 0.5)
    assert(rHalf("tail") == 1.0 && math.abs(rHalf("head") - 0.25) < 1e-12, s"$rHalf")
    // the sampled mixture approximates the rates (hash-sampling variance)
    val kept = Sampling.temperatureSample(df, col("g"), col("text"), alpha = 0.5)
      .groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(kept("tail") == 100L, "rate-1.0 group keeps every row")
    assert(math.abs(kept("head") - 400.0) < 120.0, s"head kept ${kept("head")} of ~400")
    // maxRate rescales the whole profile
    val rCap = Sampling.temperatureRates(df, col("g"), alpha = 0.5, maxRate = 0.5)
    assert(rCap("tail") == 0.5 && math.abs(rCap("head") - 0.125) < 1e-12)
    // a high-cardinality group column is the wrong tool and fails loudly
    val wide = spark.range(10001).select($"id".cast("string").as("g"), $"id".cast("string").as("text"))
    val e = intercept[IllegalArgumentException](
      Sampling.temperatureRates(wide, col("g"), alpha = 0.5))
    assert(e.getMessage.contains("groups"))
  }
}
