package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DoubleType

/** Static kernel for [[GraftWithin]]: planar distance, rounded exactly like
  * Spark's `round(x, 6)` (decimal HALF_UP on the shortest string form — the
  * repo-wide §2.7b determinism contract), compared to eps. */
object GeoWithinKernel {
  def within(x1: Double, y1: Double, x2: Double, y2: Double, eps: Double): Boolean = {
    val dx = x1 - x2
    val dy = y1 - y2
    java.math.BigDecimal.valueOf(math.sqrt(dx * dx + dy * dy))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() <= eps
  }
}

/** `graft_within(x1, y1, x2, y2, eps)` — declarative ε-distance predicate
  * (reference O17 surface): true iff `round(dist((x1,y1),(x2,y2)), 6) ≤ eps`.
  *
  * Standalone it is just a correct (interpreted) predicate; its real job is
  * to be the MARKER the optimizer rule `graft.plans.RewriteDistanceJoin`
  * recognizes on an inner-join condition and rewrites into a grid-cell
  * equi-join — the user writes the O(n²) theta-join declaratively and the
  * planner supplies the spatial blocking. CodegenFallback is deliberate:
  * after the rewrite this predicate only runs on grid-cell candidate pairs
  * (bounded by blocking), never on the full pair space. */
case class GraftWithin(children: Seq[Expression])
    extends Expression with Predicate with CodegenFallback {

  require(children.length == 5, "graft_within(x1, y1, x2, y2, eps)")
  def x1: Expression = children(0)
  def y1: Expression = children(1)
  def x2: Expression = children(2)
  def y2: Expression = children(3)
  def eps: Expression = children(4)

  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else GeoWithinKernel.within(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Double],
      vs(4).asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)
}

object GraftWithin {
  /** Builder used by both the session-extension injection and the runtime
    * registry: casts every argument to DOUBLE so SQL decimal literals
    * (`1.0`) and float columns both work. */
  def build(exprs: Seq[Expression]): GraftWithin =
    GraftWithin(exprs.map(e => if (e.dataType == DoubleType) e else Cast(e, DoubleType)))

  /** Register `graft_within` in this session (idempotent). */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions._
    castToImpl(spark).sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_within", build, "built-in")
  }
}
