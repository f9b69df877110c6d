package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks of the round-6 integer-exact math, driver-side only
  * (no Spark jobs — pure derivation validation, same deterministic-seed
  * pattern as [[FoldPropertiesSpec]]).
  *
  * 1. The anomaly test's cross-multiplied integer form is EXACTLY the
  *    rational 3σ test — (n·x−s)² > 9·(n·ssq−s²) multiplied through by
  *    n² loses nothing, so the engine's no-float plan cannot disagree
  *    with the textbook definition on any input.
  * 2. The theta/KMV overlap estimator is exact whenever a pair's sketch
  *    threshold never truncates (both sides under k) — the sub-k
  *    fallback [[graft.pipeline.RelOps.thetaOverlapUsers]] relies on.
  */
class SketchPropertiesSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def cases[A](gen: Gen[A], n: Int = 64): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong)))

  test("integer 3-sigma form equals the rational variance test exactly") {
    val gen = for {
      trail <- Gen.listOfN(24, Gen.chooseNum(0L, 2000000L))
      x <- Gen.chooseNum(0L, 4000000L)
    } yield (trail, x)
    for ((trail, x) <- cases(gen)) {
      val n = trail.length.toLong
      val s = trail.sum
      val ssq = trail.map(c => BigInt(c) * c).sum
      val intForm = BigInt(n * x - s).pow(2) > 9 * (n * ssq - BigInt(s) * s)
      // textbook form in exact rationals: (x − s/n)² > 9·(ssq/n − s²/n²)
      // ⇔ (via ×n², n > 0) the integer form; validate against BigDecimal
      // with enough scale to be exact for these magnitudes
      val mc = new java.math.MathContext(60)
      val bn = BigDecimal(n, mc)
      val mean = BigDecimal(s, mc) / bn
      val varPop = BigDecimal(ssq, mc) / bn - mean * mean
      val ratForm = (BigDecimal(x, mc) - mean).pow(2) > varPop * 9
      assert(intForm == ratForm, s"x=$x trail=$trail")
    }
  }

  test("KMV overlap is exact when no side truncates (sub-k sketches)") {
    val U = 1152921504606846976L // 2^60, the hash60 space
    val gen = for {
      a <- Gen.listOfN(40, Gen.chooseNum(0L, U - 1)).map(_.distinct)
      b <- Gen.listOfN(40, Gen.chooseNum(0L, U - 1)).map(_.distinct)
      shared <- Gen.listOfN(10, Gen.chooseNum(0L, U - 1)).map(_.distinct)
    } yield (a ++ shared, b ++ shared)
    for ((ha, hb) <- cases(gen)) {
      val k = 128 // both sides < k ⇒ θ = U and the sample IS the set
      assert(ha.size < k && hb.size < k)
      val sa = ha.distinct.sorted.take(k)
      val sb = hb.distinct.sorted.take(k)
      val theta = U // sub-k rule on both sides
      val m = sa.toSet.intersect(sb.toSet).count(_ < theta)
      val est = m.toDouble * (U.toDouble / theta.toDouble)
      val exact = ha.toSet.intersect(hb.toSet).size
      assert(est == exact.toDouble, s"est $est exact $exact")
    }
  }

  test("KMV estimator tracks truth within tolerance when truncating") {
    // deterministic pseudo-uniform hashes via the engine's own md5 hash
    def h(x: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(x.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val k = 128
    val U = 1152921504606846976L
    // two overlapping 1000-element sets: 500 shared
    val a = (0L until 1000L).map(h).toVector
    val b = (500L until 1500L).map(h).toVector
    val sa = a.sorted.take(k)
    val sb = b.sorted.take(k)
    val theta = math.min(sa(k - 1), sb(k - 1))
    val m = sa.toSet.intersect(sb.toSet).count(_ < theta)
    val est = m.toDouble * (U.toDouble / theta.toDouble)
    val exact = a.toSet.intersect(b.toSet).size // 500
    assert(exact == 500)
    assert(math.abs(est - exact) / exact <= 0.5,
      s"est $est vs exact $exact")
  }
}
