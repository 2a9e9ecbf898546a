package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Metrics

/** Property tests for the trajectory metric kernels (SURVEY §5.2): metric
  * axioms on seeded random trajectories, DP == naive recursion for Fréchet,
  * and the Hausdorff ≤ discrete-Fréchet dominance.
  */
class MetricPropertiesTest extends AnyFunSuite {

  private val rnd = new Random(42)
  private def traj(n: Int): (Array[Double], Array[Double]) =
    (Array.fill(n)(rnd.nextDouble() * 30), Array.fill(n)(rnd.nextDouble() * 200))

  private val cases = (1 to 200).map { _ =>
    val (n, m) = (1 + rnd.nextInt(40), 1 + rnd.nextInt(40))
    (traj(n), traj(m))
  }

  test("identity: d(A,A) == 0 for both metrics") {
    cases.foreach { case ((xa, ya), _) =>
      assert(Metrics.hausdorff(xa, ya, xa, ya) == 0.0)
      assert(Metrics.discreteFrechet(xa, ya, xa, ya) == 0.0)
    }
  }

  test("symmetry: d(A,B) == d(B,A)") {
    cases.foreach { case ((xa, ya), (xb, yb)) =>
      assert(Metrics.hausdorff(xa, ya, xb, yb) == Metrics.hausdorff(xb, yb, xa, ya))
      assert(Metrics.discreteFrechet(xa, ya, xb, yb) == Metrics.discreteFrechet(xb, yb, xa, ya))
    }
  }

  test("frechet DP equals naive memoized recursion") {
    cases.foreach { case ((xa, ya), (xb, yb)) =>
      val dp = Metrics.discreteFrechet(xa, ya, xb, yb)
      val naive = Metrics.discreteFrechetNaive(xa, ya, xb, yb)
      assert(dp == naive, s"DP $dp != naive $naive")
    }
  }

  test("hausdorff <= discrete frechet") {
    cases.foreach { case ((xa, ya), (xb, yb)) =>
      val h = Metrics.hausdorff(xa, ya, xb, yb)
      val f = Metrics.discreteFrechet(xa, ya, xb, yb)
      assert(h <= f + 1e-12, s"hausdorff $h > frechet $f")
    }
  }

  test("hausdorff triangle inequality") {
    val triples = (1 to 50).map(_ => (traj(1 + rnd.nextInt(20)), traj(1 + rnd.nextInt(20)), traj(1 + rnd.nextInt(20))))
    triples.foreach { case ((xa, ya), (xb, yb), (xc, yc)) =>
      val ab = Metrics.hausdorff(xa, ya, xb, yb)
      val bc = Metrics.hausdorff(xb, yb, xc, yc)
      val ac = Metrics.hausdorff(xa, ya, xc, yc)
      assert(ac <= ab + bc + 1e-9)
    }
  }

  test("hausdorff equals brute-force max-of-min (no early-break effect)") {
    cases.take(60).foreach { case ((xa, ya), (xb, yb)) =>
      def brute(x1: Array[Double], y1: Array[Double], x2: Array[Double], y2: Array[Double]) =
        x1.indices.map { i =>
          x2.indices.map { j =>
            val dx = x1(i) - x2(j); val dy = y1(i) - y2(j)
            math.sqrt(dx * dx + dy * dy)
          }.min
        }.max
      val expected = math.max(brute(xa, ya, xb, yb), brute(xb, yb, xa, ya))
      assert(Metrics.hausdorff(xa, ya, xb, yb) == expected)
    }
  }
}
