package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins Knight's O(n log n) S against the O(n²) sign-sum definition on
  * exhaustive small inputs and a deterministic pseudo-random sweep —
  * the pure-logic half of the x240 replan (the Spark integration and
  * plan shape are pinned in TimeSeriesSpec / PlanAuditSpec). */
class KendallSAggSpec extends AnyFunSuite {

  private val agg = new KendallSAgg

  private def brute(xs: Seq[CRank]): (Long, Long, Long) = {
    var s = 0L; var n1 = 0L; var n2 = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.size) {
      val (a, b) = (xs(i), xs(j))
      s += java.lang.Long.signum(b.c - a.c).toLong *
        java.lang.Long.signum(b.r - a.r)
      if (a.c == b.c) n1 += 1
      if (a.r == b.r) n2 += 1
    }
    (s, n1, n2)
  }

  private def check(xs: Seq[CRank]): Unit = {
    val got = agg.finish(xs)
    val (s, n1, n2) = brute(xs)
    assert(got === KendallS(s, n1, n2, xs.size.toLong),
      s"input=$xs brute=($s,$n1,$n2)")
  }

  test("empty and singleton buffers") {
    assert(agg.finish(Nil) === KendallS(0L, 0L, 0L, 0L))
    check(Seq(CRank(5L, 2L)))
  }

  test("exhaustive 4-element inputs over a 3-value alphabet") {
    val vals = Seq(0L, 1L, 2L)
    for {
      a <- vals; b <- vals; c <- vals; d <- vals
      e <- vals; f <- vals; g <- vals; h <- vals
    } check(Seq(CRank(a, e), CRank(b, f), CRank(c, g), CRank(d, h)))
  }

  test("deterministic pseudo-random sweep, n up to 200") {
    // LCG so the sweep is reproducible without Random
    var seed = 42L
    def next(m: Long): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.floorMod(seed >>> 16, m)
    }
    for (n <- Seq(2, 3, 7, 50, 200)) {
      val xs = Seq.fill(n)(CRank(next(8L), next(5L) + 1L))
      check(xs)
    }
  }

  test("reduce/merge are order-insensitive (multiset law)") {
    val xs = Seq(CRank(1L, 1L), CRank(2L, 1L), CRank(2L, 3L), CRank(0L, 2L))
    val viaReduce = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    val viaMerge = agg.finish(agg.merge(
      xs.take(2).foldLeft(agg.zero)(agg.reduce),
      xs.drop(2).reverse.foldLeft(agg.zero)(agg.reduce)))
    assert(viaReduce === viaMerge)
    assert(viaReduce === agg.finish(xs))
  }
}
