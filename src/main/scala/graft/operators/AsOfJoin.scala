package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (latest right row at-or-before each left row, per key) as a
  * composable operator.
  *
  * Spark has no native as-of join; the scalable reformulation is
  * union-tag + running `last(_, ignoreNulls)` over one window: a single
  * shuffle on the key, zero join fan-out, and state bounded by the window
  * frame — this is how a 100 TB point-in-time join avoids the O(n·m)
  * range-join trap. (The charter's "custom operator" ladder: composition
  * covers the semantics, so no custom plan node is warranted.)
  *
  * `left` and `right` must share `keys` ++ `order` columns; `right`'s
  * `payload` columns must not collide with left's. `order` MUST be a total
  * order within each key group on the right side (include a unique
  * tie-breaker column) — tied right rows would otherwise make the picked
  * payload partition-order dependent. Right rows sort before
  * left rows at an identical order key, so the match is inclusive (a right
  * row matches a left row with the exact same (order) value).
  */
object AsOfJoin {

  def asofLatest(left: DataFrame, right: DataFrame, keys: Seq[String],
                 order: Seq[String], payload: Seq[String]): DataFrame = {
    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((order.map(col) :+ col("_side")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(u) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1).drop("_side")
  }

  /** As-of join with a TOLERANCE: the latest right row at-or-before each
    * left row counts only when it lies within `tol` of the left row's
    * `order.head` value (the numeric primary order column — µs timestamps
    * here); staler matches yield NULL payloads. Same single-shuffle
    * union-tag plan as [[asofLatest]] — the right row's order value rides
    * along as one extra filled column and the tolerance check is a scalar
    * post-filter, so adding a time bound costs nothing at scale. */
  def asofLatestWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                       order: Seq[String], payload: Seq[String],
                       tol: Long): DataFrame = {
    val ord = order.head
    val filled = asofLatest(left, right.withColumn("_asof_ord", col(ord)),
      keys, order, payload :+ "_asof_ord")
    val within = col(ord) - col("_asof_ord") <= tol
    payload.foldLeft(filled) { (df, p) =>
      df.withColumn(p, when(within, col(p)))
    }.drop("_asof_ord")
  }

  /** NEAREST-in-time as-of join: each left row matched to the closest right
    * row of its key group in EITHER direction, within `tol` of the numeric
    * primary order column; equidistant candidates break BACKWARD (the
    * earlier right row) — fully deterministic given the right side's total
    * (order ++ tie-breaker) order.
    *
    * ONE union-tag frame, TWO running-`last` windows — backward on the
    * order, forward on the NEGATED order — then a scalar nearest pick.
    * Both windows partition on the same keys, so the plan is ONE key
    * exchange reused by two sorts (plan-guarded in ExplainPlanTest): no
    * join fan-out at any scale, where a range join (`|l.ts − r.ts| ≤ tol`)
    * would enumerate every in-tolerance pair. */
  def asofNearestWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                        order: Seq[String], payload: Seq[String],
                        tol: Long): DataFrame = {
    val ord = order.head
    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(0)).withColumn("_asof_ord", col(ord))
    val u = order.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      (d, o) => d.withColumn(s"_neg_$o", -col(o))
    }
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy((order.map(col) :+ col("_side")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy((order.map(o => col(s"_neg_$o")) :+ col("_side")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fillCols = payload :+ "_asof_ord"
    val filled = fillCols.foldLeft(u) { (df, p) =>
      df.withColumn(s"${p}_b", last(col(p), ignoreNulls = true).over(wB))
        .withColumn(s"${p}_f", last(col(p), ignoreNulls = true).over(wF))
    }

    val distB = col(ord) - col("_asof_ord_b")
    val distF = col("_asof_ord_f") - col(ord)
    val bOk = col("_asof_ord_b").isNotNull && distB <= tol
    val fOk = col("_asof_ord_f").isNotNull && distF <= tol
    val pickB = bOk && (!fOk || distB <= distF)
    val out = payload.foldLeft(filled.filter(col("_side") === 1)) { (df, p) =>
      df.withColumn(p, when(pickB, col(s"${p}_b")).when(fOk, col(s"${p}_f")))
    }
    out.drop((fillCols.flatMap(p => Seq(s"${p}_b", s"${p}_f"))
      ++ order.map(o => s"_neg_$o") ++ Seq("_side", "_asof_ord")): _*)
  }
}
