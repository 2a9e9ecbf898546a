package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.DoubleType

import graft.geo.Metrics

/** Codegen adapter for the bounded Hausdorff refinement kernel: a plain
  * object (static forwarders, no companion class) so generated Java can
  * call `compute` directly. `ArrayData.toDoubleArray` is one bulk memcpy
  * per array — unlike a Scala UDF, whose Seq[Double] conversion boxes every
  * element; on an all-pairs refine the boxing dominates the kernel itself.
  */
object HausdorffKernelStatic {
  def compute(xa: ArrayData, ya: ArrayData, xb: ArrayData, yb: ArrayData,
              bound: Double): Double =
    Metrics.hausdorffBounded(xa.toDoubleArray(), ya.toDoubleArray(),
      xb.toDoubleArray(), yb.toDoubleArray(), bound)

  /** One directed pass of the bounded Hausdorff DIRECTLY over ArrayData
    * (UnsafeArrayData.getDouble is a plain word load): same loop, same
    * early break, same early abandon as Metrics.directedSq — identical
    * doubles. Returns the running max² (possibly > b², the abandon
    * certificate). */
  private def directedSqAD(x1: ArrayData, y1: ArrayData,
                           x2: ArrayData, y2: ArrayData,
                           cmax0: Double, b2: Double): Double = {
    var cmax = cmax0
    val n1 = x1.numElements()
    val n2 = x2.numElements()
    var i = 0
    while (i < n1) {
      val px = x1.getDouble(i)
      val py = y1.getDouble(i)
      var cmin = Double.PositiveInfinity
      var j = 0
      while (j < n2 && cmin > cmax) {
        val dx = px - x2.getDouble(j)
        val dy = py - y2.getDouble(j)
        val d = dx * dx + dy * dy
        if (d < cmin) cmin = d
        j += 1
      }
      if (cmin > cmax && cmin != Double.PositiveInfinity) {
        cmax = cmin
        if (cmax > b2) return cmax
      }
      i += 1
    }
    cmax
  }

  /** Copy-free bounded Hausdorff: value-identical to [[compute]] (same
    * operation order — property-tested), skipping the four per-pair
    * primitive-array allocations+memcpys. MEASURED A WASH (r14, Probe
    * `t21ab`: 1.57/1.54 s copy vs 1.57/1.53 s no-copy warm on the brute
    * half-join) — the stage cost was the join's 1-task serialization, not
    * the copies (fixed in bruteKnnJoin). Kept registered for the record and
    * for probes; query paths stay on [[compute]]. */
  def computeNoCopy(xa: ArrayData, ya: ArrayData, xb: ArrayData, yb: ArrayData,
                    bound: Double): Double = {
    if (xa.numElements() == 0 || xb.numElements() == 0) return Double.NaN
    val b2 = bound * bound
    var cmax = directedSqAD(xa, ya, xb, yb, 0.0, b2)
    if (cmax > b2) return math.sqrt(cmax)
    cmax = directedSqAD(xb, yb, xa, ya, cmax, b2)
    math.sqrt(cmax)
  }
}

/** Same adapter for the bounded discrete-Fréchet DP kernel. */
object FrechetKernelStatic {
  def compute(xa: ArrayData, ya: ArrayData, xb: ArrayData, yb: ArrayData,
              bound: Double): Double =
    Metrics.frechetBounded(xa.toDoubleArray(), ya.toDoubleArray(),
      xb.toDoubleArray(), yb.toDoubleArray(), bound)
}

object HausdorffCodegen {
  /** Expression builder: a whole-stage-codegen static call into the
    * early-abandoning kernel (exact at/below the bound; a certificate value
    * above it). */
  def build(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): StaticInvoke =
    StaticInvoke(
      HausdorffKernelStatic.getClass, DoubleType, "compute", exprs,
      propagateNull = true, returnNullable = false)

  /** Register `graft_hausdorff_bounded(xs1, ys1, xs2, ys2, bound)`. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions._
    castToImpl(spark).sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hausdorff_bounded", build, "built-in")
  }

  def apply(xs1: Column, ys1: Column, xs2: Column, ys2: Column, bound: Column): Column =
    call_function("graft_hausdorff_bounded", xs1, ys1, xs2, ys2, bound)

  /** The copy-free variant ([[HausdorffKernelStatic.computeNoCopy]]) as
    * `graft_hausdorff_bounded_nc` — value-identical; picked for short
    * trajectories where the per-pair array allocations dominate. */
  def buildNoCopy(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): StaticInvoke =
    StaticInvoke(
      HausdorffKernelStatic.getClass, DoubleType, "computeNoCopy", exprs,
      propagateNull = true, returnNullable = false)

  def registerNoCopy(spark: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions._
    castToImpl(spark).sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hausdorff_bounded_nc", buildNoCopy, "built-in")
  }

  def applyNoCopy(xs1: Column, ys1: Column, xs2: Column, ys2: Column, bound: Column): Column =
    call_function("graft_hausdorff_bounded_nc", xs1, ys1, xs2, ys2, bound)
}

object FrechetCodegen {
  def build(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): StaticInvoke =
    StaticInvoke(
      FrechetKernelStatic.getClass, DoubleType, "compute", exprs,
      propagateNull = true, returnNullable = false)

  /** Register `graft_frechet_bounded(xs1, ys1, xs2, ys2, bound)`. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions._
    castToImpl(spark).sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_frechet_bounded", build, "built-in")
  }

  def apply(xs1: Column, ys1: Column, xs2: Column, ys2: Column, bound: Column): Column =
    call_function("graft_frechet_bounded", xs1, ys1, xs2, ys2, bound)
}
