package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrajectorySearch

/** Bound-seeding top-k search (reference O11/O13): exact equality with the
  * naive scan, and pruning power on spatially separated data. */
class TrajectorySearchTest extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pruned top-k equals naive top-k on real data") {
    val ta = Tables.trajArrays(spark, TestSpark.sf0001)
    for (metric <- Seq("hausdorff", "frechet")) {
      val naive = TrajectorySearch.topKOf(ta, 0L, 10, metric)
        .collect().map(_.toString).toSeq
      val pruned = TrajectorySearch.topKPruned(ta, 0L, 10, metric)
        .collect().map(_.toString).toSeq
      assert(pruned == naive, metric)
    }
  }

  test("pruning fires on spatially separated clusters") {
    // 60 users: 20 near the query (cluster at origin), 40 far away
    val rnd = new scala.util.Random(11)
    def traj(cx: Double, cy: Double): (Seq[Double], Seq[Double]) = {
      val n = 5 + rnd.nextInt(10)
      (Seq.fill(n)(cx + rnd.nextDouble()), Seq.fill(n)(cy + rnd.nextDouble()))
    }
    val rows = (0L until 20L).map(i => (i, traj(0, 0))) ++
      (20L until 60L).map(i => (i, traj(500 + (i % 5) * 100, 500)))
    val ta = rows.map { case (id, (xs, ys)) => (id, xs, ys) }.toDF("user_id", "xs", "ys")

    val naive = TrajectorySearch.topKOf(ta, 0L, 10, "hausdorff")
      .collect().map(_.toString).toSeq
    val pruned = TrajectorySearch.topKPruned(ta, 0L, 10, "hausdorff")
      .collect().map(_.toString).toSeq
    assert(pruned == naive)

    // the k-th distance stays inside the near cluster (≈ ≤ 3), so the far
    // users' boxes (≥ ~490 away) must be pruned
    val r = TrajectorySearch.topKOf(ta, 0L, 10, "hausdorff")
      .agg(max($"dist")).as[Double].head()
    val nCand = TrajectorySearch.prunedCandidateCount(ta, 0L, r + 1e-6)
    assert(nCand <= 19, s"expected only near-cluster candidates, got $nCand")
  }
}
