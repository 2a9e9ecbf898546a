package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group top-k.
  *
  * One `row_number() OVER (PARTITION BY group ORDER BY ...)` with an
  * adjacent `<= k` filter: Spark 4 plans this as `WindowGroupLimit`
  * (SPARK-37099) — a bounded per-partition top-k heap runs in Partial mode
  * BEFORE the exchange, so each map task ships at most k rows per group and
  * the reducer for a group receives ≤ k·(map partitions) rows, never the
  * group's full candidate set. That is exactly the bound the pre-Spark-4
  * hand-rolled two-stage (salt into B buckets, top-k per bucket, top-k over
  * B·k survivors) provided — with one fewer shuffle and three fewer sorts
  * (measured on t21's 2.25M-row mirror frame: 3.3–4.2 s two-stage vs
  * 1.7–2.0 s single window, same session — OPTIMIZATION_r13.md).
  *
  * `order` must be a TOTAL order (include a tiebreaker) for determinism.
  * The plan shape is guarded by ExplainPlanTest ("WindowGroupLimit
  * pushdown": Partial + Final nodes both present, no full sort of losers);
  * OperatorsTest pins the results against a brute-force per-group sort.
  * (The r13 `bucketKey`/`buckets` compatibility parameters — dead since the
  * salt stage they parameterized was subsumed by WindowGroupLimit — were
  * dropped in r14.)
  */
object Rank {

  def topKPerGroup(df: DataFrame, group: Seq[Column], order: Seq[Column], k: Int,
                   rankCol: String = "_rk"): DataFrame = {
    val w = Window.partitionBy(group: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}
