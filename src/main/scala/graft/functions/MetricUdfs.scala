package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import graft.geo.Metrics

/** Shared UDF registrations of the trajectory metric kernels (inputs are
  * two parallel primitive-double coordinate arrays per trajectory). */
object MetricUdfs {
  val hausdorff: UserDefinedFunction =
    udf { (xa: Seq[Double], ya: Seq[Double], xb: Seq[Double], yb: Seq[Double]) =>
      Metrics.hausdorff(xa.toArray, ya.toArray, xb.toArray, yb.toArray)
    }
  val frechet: UserDefinedFunction =
    udf { (xa: Seq[Double], ya: Seq[Double], xb: Seq[Double], yb: Seq[Double]) =>
      Metrics.discreteFrechet(xa.toArray, ya.toArray, xb.toArray, yb.toArray)
    }
  val dtw: UserDefinedFunction =
    udf { (xa: Seq[Double], ya: Seq[Double], xb: Seq[Double], yb: Seq[Double]) =>
      Metrics.dtw(xa.toArray, ya.toArray, xb.toArray, yb.toArray)
    }
  /** Closest approach between two polylines (min seg-seg distance; 0 when
    * the paths cross) — reference O3 over whole trajectories. */
  val closestApproach: UserDefinedFunction =
    udf { (xa: Seq[Double], ya: Seq[Double], xb: Seq[Double], yb: Seq[Double]) =>
      Metrics.closestApproach(xa.toArray, ya.toArray, xb.toArray, yb.toArray)
    }

  /** Min distance from a point to a polyline given as parallel coordinate
    * arrays (reference O2 lifted to the whole trajectory): min over
    * segments of [[Metrics.pointSegDist]]. Single-point polylines degrade
    * to plain point distance. */
  val polylineDist: UserDefinedFunction =
    udf { (px: Double, py: Double, xs: Seq[Double], ys: Seq[Double]) =>
      val n = xs.length
      if (n == 1) Metrics.pointSegDist(px, py, xs(0), ys(0), xs(0), ys(0))
      else {
        var best = Double.MaxValue
        var i = 0
        while (i < n - 1) {
          val d = Metrics.pointSegDist(px, py, xs(i), ys(i), xs(i + 1), ys(i + 1))
          if (d < best) best = d
          i += 1
        }
        best
      }
    }
  /** Early-abandoning Hausdorff (exact below the bound — see
    * Metrics.hausdorffBounded). */
  val hausdorffBounded: UserDefinedFunction =
    udf { (xa: Seq[Double], ya: Seq[Double], xb: Seq[Double], yb: Seq[Double], bound: Double) =>
      Metrics.hausdorffBounded(xa.toArray, ya.toArray, xb.toArray, yb.toArray, bound)
    }
  /** LCSS ε-match count (similarity = count / min(n,m)). */
  val lcss: UserDefinedFunction =
    udf { (xa: Seq[Double], ya: Seq[Double], xb: Seq[Double], yb: Seq[Double], ex: Double, ey: Double) =>
      Metrics.lcssCount(xa.toArray, ya.toArray, xb.toArray, yb.toArray, ex, ey)
    }
  /** EDR — edit distance on real sequence with ε-match substitutions. */
  val edr: UserDefinedFunction =
    udf { (xa: Seq[Double], ya: Seq[Double], xb: Seq[Double], yb: Seq[Double], ex: Double, ey: Double) =>
      Metrics.edr(xa.toArray, ya.toArray, xb.toArray, yb.toArray, ex, ey)
    }
  /** ERP — edit distance with real penalty against the origin gap point
    * (the true metric of the edit family — see Metrics.erp). */
  val erp: UserDefinedFunction =
    udf { (xa: Seq[Double], ya: Seq[Double], xb: Seq[Double], yb: Seq[Double]) =>
      Metrics.erp(xa.toArray, ya.toArray, xb.toArray, yb.toArray)
    }
  /** Douglas–Peucker simplification stats: (points kept, realized max
    * error) per trajectory — geo.Simplify run once per row. */
  val dpStats: UserDefinedFunction =
    udf { (xs: Seq[Double], ys: Seq[Double], eps: Double) =>
      val xa = xs.toArray; val ya = ys.toArray
      val kept = graft.geo.Simplify.douglasPeucker(xa, ya, eps)
      (kept.length, graft.geo.Simplify.maxError(xa, ya, kept))
    }
}
