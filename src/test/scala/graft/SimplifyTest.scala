package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{Metrics, Simplify}

/** Douglas–Peucker invariants (SURVEY §5.2 layer 3: optimized vs naive). */
class SimplifyTest extends AnyFunSuite {

  // textbook recursive formulation — the reference implementation
  private def naive(xs: Array[Double], ys: Array[Double], eps: Double): Array[Int] = {
    def rec(lo: Int, hi: Int): List[Int] =
      if (hi - lo <= 1) List(lo, hi)
      else {
        var best = -1; var bestD = eps
        for (i <- lo + 1 until hi) {
          val d = Metrics.pointSegDist(xs(i), ys(i), xs(lo), ys(lo), xs(hi), ys(hi))
          if (d > bestD) { bestD = d; best = i }
        }
        if (best < 0) List(lo, hi)
        else rec(lo, best).init ::: rec(best, hi)
      }
    if (xs.length <= 2) Array.range(0, xs.length) else rec(0, xs.length - 1).toArray
  }

  private def randomTraj(n: Int, seed: Int): (Array[Double], Array[Double]) = {
    val rnd = new scala.util.Random(seed)
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    var x = 0.0; var y = 0.0
    for (i <- 0 until n) {
      x += rnd.nextDouble(); y += rnd.nextGaussian() * 0.3
      xs(i) = x; ys(i) = y
    }
    (xs, ys)
  }

  test("iterative DP ≡ naive recursion; endpoints kept; subsequence; error ≤ ε") {
    for (seed <- 1 to 10; eps <- Seq(0.05, 0.3, 1.5)) {
      val (xs, ys) = randomTraj(60 + seed, seed)
      val fast = Simplify.douglasPeucker(xs, ys, eps)
      val ref = naive(xs, ys, eps)
      assert(fast.toSeq == ref.toSeq, s"seed=$seed eps=$eps")
      assert(fast.head == 0 && fast.last == xs.length - 1)
      assert(fast.toSeq == fast.toSeq.sorted.distinct) // strictly increasing
      assert(Simplify.maxError(xs, ys, fast) <= eps + 1e-12)
    }
  }

  test("degenerate inputs: ≤2 points identity; collinear collapses to endpoints") {
    assert(Simplify.douglasPeucker(Array(1.0), Array(2.0), 0.1).toSeq == Seq(0))
    assert(Simplify.douglasPeucker(Array(1.0, 2.0), Array(2.0, 3.0), 0.1).toSeq == Seq(0, 1))
    val xs = Array.tabulate(50)(_.toDouble); val ys = xs.map(_ * 2.0)
    assert(Simplify.douglasPeucker(xs, ys, 1e-9).toSeq == Seq(0, 49))
  }

  test("eps below minimum deviation keeps every point") {
    val (xs, ys) = randomTraj(40, 99)
    val kept = Simplify.douglasPeucker(xs, ys, 1e-12)
    assert(kept.length == xs.length)
  }
}
