package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{IntegerType, ObjectType}

/** Static nearest-centroid routing kernel for the LARGE-nlist regime of
  * `Sketches.ivfRoute`: the centroid matrix rides a Spark BROADCAST
  * variable (one torrent-fetched copy per executor, read lazily via
  * `bc.value`) instead of an `array(array(lit…))` expression literal —
  * at production nlist (≥ 4096 lists × 64 dims) the literal form's
  * expression tree and generated code blow past the codegen limits while
  * the broadcast handle stays a few bytes in the plan.
  *
  * Exact parity with the literal fold is load-bearing for incremental
  * ingest (append ≡ one-shot): the distance accumulates in ascending
  * dimension order with each float widened to double before subtraction
  * (same as the SQL `CAST(x AS DOUBLE) - y` zip_with), and the argmin
  * scans lists in id order with a strict `<` so ties break to the LOWEST
  * list id — bit-identical routing on both shapes (SketchesTest parity).
  */
object IvfRouteKernelStatic {
  def route(emb: ArrayData, bc: Broadcast[Array[Array[Double]]]): Int = {
    val e = emb.toFloatArray()
    val cs = bc.value
    var best = -1
    var bd = Double.PositiveInfinity
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      var d = 0.0
      var j = 0
      val m = math.min(e.length, c.length)
      while (j < m) { val t = e(j).toDouble - c(j); d += t * t; j += 1 }
      if (d < bd) { bd = d; best = i }
      i += 1
    }
    best
  }
}

object IvfRouteKernel {
  /** Whole-stage-codegen static call: the broadcast handle enters the
    * expression as an object-typed literal appended by the registered
    * builder (shipped with the serialized plan as a codegen reference
    * object — the same mechanism a broadcast join uses for its relation
    * handle); the centroid payload itself moves over the broadcast
    * manager, once per executor. The function name carries the broadcast
    * id, so distinct center sets in one session never collide. */
  def apply(embedding: Column, bc: Broadcast[Array[Array[Double]]]): Column = {
    val name = register(SparkSession.active, bc)
    call_function(name, embedding)
  }

  /** Register `graft_ivf_route_<bcId>(embedding)` binding these centers. */
  def register(spark: SparkSession, bc: Broadcast[Array[Array[Double]]]): String = {
    val name = s"graft_ivf_route_${bc.id}"
    import org.apache.spark.sql.classic.ClassicConversions._
    castToImpl(spark).sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => StaticInvoke(
        IvfRouteKernelStatic.getClass, IntegerType, "route",
        exprs :+ Literal.fromObject(bc,
          ObjectType(classOf[Broadcast[Array[Array[Double]]]])),
        propagateNull = true, returnNullable = false),
      "built-in")
    name
  }

  /** Drop a kernel registered by [[register]] — the eviction half of the
    * bounded per-session cache in `Sketches.ivfRouteBroadcast` (the
    * registry closure holds the broadcast handle; dropping it makes the
    * broadcast destroyable). */
  def unregister(spark: SparkSession, name: String): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions._
    castToImpl(spark).sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name))
    ()
  }
}
