package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

import graft.functions.GraftWithin

/** Whole-operator Catalyst rewrite (reference O17 as a planner rule): an
  * inner join whose condition carries a `graft_within(x1, y1, x2, y2, eps)`
  * predicate — one point per side, foldable eps — is a spatial ε-distance
  * join. Planned naively it is an O(n²) BroadcastNestedLoopJoin; this rule
  * rewrites it into the grid-cell form:
  *
  *   - LEFT side is expanded ×9 (`Generate(Explode(offsets))`) to its cell
  *     plus the 3×3 neighborhood; RIGHT side keeps its single home cell;
  *   - cell size = eps + 1e-6, covering the ≤ 5e-7 slack of the rounded
  *     distance contract, so two qualifying points are never more than one
  *     cell apart per axis — and each qualifying pair meets in EXACTLY one
  *     (kx, ky), keeping multiplicities exact;
  *   - the original condition stays as the residual filter, so the rewrite
  *     is correctness-preserving by construction;
  *   - the planner then sees plain equi-join keys (`ExtractEquiJoinKeys`)
  *     and picks a shuffle/broadcast HASH join — the only join shape that
  *     survives 100 TB.
  *
  * Idempotency guard: the rule skips joins whose condition already carries
  * its OWN cell-key equalities (recognized by the `_graft_cell_off`
  * generator attribute they reference). User-supplied equality conjuncts —
  * e.g. a time-step alignment key in a co-movement join (t17) — do NOT
  * disable the rewrite: they compose, so the planner hash-joins on
  * (user keys ++ cell keys) and the per-equality-group pair space is still
  * grid-blocked, which is what survives millions of points per time step.
  * Install per session via [[GraftRules.install]] or the `GraftExtensions`
  * session extension.
  */
object RewriteDistanceJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val CellOffName = "_graft_cell_off"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val already = conjuncts.exists {
        case e: EqualTo => e.references.exists(_.name == CellOffName)
        case _ => false
      }
      val gw = conjuncts.collectFirst {
        case g: GraftWithin if eligible(g, left, right) => g
      }
      if (already || gw.isEmpty) j
      else {
        val g = gw.get
        val eps = g.eps.eval(null).asInstanceOf[Double]
        val cell = Literal(eps + 1e-6, DoubleType)

        // 3×3 neighborhood offsets, exploded against the left side
        val offStruct = StructType(Seq(
          StructField("dx", IntegerType, nullable = false),
          StructField("dy", IntegerType, nullable = false)))
        val offsets = CreateArray(
          (for (dx <- -1 to 1; dy <- -1 to 1) yield CreateNamedStruct(Seq(
            Literal("dx"), Literal(dx), Literal("dy"), Literal(dy)))).toSeq)
        val offAttr = AttributeReference(CellOffName, offStruct, nullable = false)()
        val expanded = Generate(Explode(offsets), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(offAttr), child = left)

        def cellOf(e: Expression): Expression = Floor(Divide(e, cell))
        val kx1 = Add(cellOf(g.x1), Cast(GetStructField(offAttr, 0, Some("dx")), LongType))
        val ky1 = Add(cellOf(g.y1), Cast(GetStructField(offAttr, 1, Some("dy")), LongType))
        val blocked = Join(expanded, right, Inner,
          Some(And(And(EqualTo(kx1, cellOf(g.x2)), EqualTo(ky1, cellOf(g.y2))), cond)),
          hint)
        Project(j.output, blocked)
      }
  }

  /** One point per side, eps a foldable non-negative literal — exactly the
    * shape the grid argument proves correct. */
  private def eligible(g: GraftWithin, left: LogicalPlan, right: LogicalPlan): Boolean = {
    def refs(e: Expression) = e.references
    val leftSide = (refs(g.x1) ++ refs(g.y1)).forall(left.outputSet.contains)
    val rightSide = (refs(g.x2) ++ refs(g.y2)).forall(right.outputSet.contains)
    g.children.forall(_.deterministic) && g.eps.foldable &&
      leftSide && rightSide && refs(g.x1).nonEmpty && refs(g.x2).nonEmpty &&
      (g.eps.eval(null) match {
        case d: java.lang.Double => d >= 0.0
        case _ => false
      })
  }
}

object GraftRules {
  /** Install the graft optimizer rules + functions into an EXISTING session
    * (sessions built without `spark.sql.extensions`). Idempotent. */
  def install(spark: SparkSession): Unit = {
    GraftWithin.register(spark)
    if (!spark.experimental.extraOptimizations.contains(RewriteDistanceJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteDistanceJoin
    }
  }
}
