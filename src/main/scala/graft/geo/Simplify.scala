package graft.geo

/** Trajectory simplification — Douglas–Peucker polyline reduction (the
  * classic compression step a trajectory store runs at ingest; published
  * algorithm, Douglas & Peucker 1973). Runs per trajectory inside a task —
  * never across rows — so it parallelizes embarrassingly over users.
  *
  * Deterministic: the split point is the FIRST index attaining the maximum
  * deviation, so results are independent of partitioning and replay.
  */
object Simplify {

  /** Indices (sorted, ascending) of the points kept by Douglas–Peucker with
    * tolerance `eps`: endpoints always survive; every dropped point lies
    * within `eps` of the simplified polyline's corresponding segment.
    * Iterative explicit stack — no recursion-depth limit on degenerate
    * million-point inputs. */
  def douglasPeucker(xs: Array[Double], ys: Array[Double], eps: Double): Array[Int] = {
    val n = xs.length
    if (n <= 2) return Array.range(0, n)
    val keep = new java.util.BitSet(n)
    keep.set(0); keep.set(n - 1)
    val stack = scala.collection.mutable.Stack((0, n - 1))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.pop()
      if (hi - lo > 1) {
        var best = -1
        var bestD = eps
        var i = lo + 1
        while (i < hi) {
          val d = Metrics.pointSegDist(xs(i), ys(i), xs(lo), ys(lo), xs(hi), ys(hi))
          if (d > bestD) { bestD = d; best = i }
          i += 1
        }
        if (best >= 0) {
          keep.set(best)
          stack.push((lo, best))
          stack.push((best, hi))
        }
      }
    }
    val out = new Array[Int](keep.cardinality())
    var i = keep.nextSetBit(0)
    var j = 0
    while (i >= 0) { out(j) = i; j += 1; i = keep.nextSetBit(i + 1) }
    out
  }

  /** Max distance from any original point to the segment of the simplified
    * polyline spanning it — the realized simplification error (≤ eps by the
    * DP invariant; exposed so tests and the declared query can assert it). */
  def maxError(xs: Array[Double], ys: Array[Double], kept: Array[Int]): Double = {
    var worst = 0.0
    var s = 0
    while (s < kept.length - 1) {
      val lo = kept(s); val hi = kept(s + 1)
      var i = lo + 1
      while (i < hi) {
        val d = Metrics.pointSegDist(xs(i), ys(i), xs(lo), ys(lo), xs(hi), ys(hi))
        if (d > worst) worst = d
        i += 1
      }
      s += 1
    }
    worst
  }
}
