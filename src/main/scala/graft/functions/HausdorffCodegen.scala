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
