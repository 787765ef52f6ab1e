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
}
