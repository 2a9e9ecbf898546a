package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group top-k. A single `row_number() OVER (PARTITION BY
  * group ORDER BY ...)` pulls EVERY row of a group through one reducer —
  * fine for bounded groups, a scale-killer when one group spans the whole
  * table (e.g. "candidates per query"). `topKPerGroup` runs two bounded
  * passes instead: local top-k per (group, bucket) — B reducers per group —
  * then top-k over the ≤ B·k survivors per group. The global top-k is a
  * subset of the union of bucket top-ks, so results are exactly the
  * single-window answer; `order` must be a TOTAL order (include a
  * tiebreaker) for determinism.
  */
object Rank {

  def topKPerGroup(df: DataFrame, group: Seq[Column], order: Seq[Column], k: Int,
                   bucketKey: Column, rankCol: String = "_rk",
                   buckets: Int = 0): DataFrame = {
    val b = if (buckets > 0) buckets
      else math.max(2, df.sparkSession.sparkContext.defaultParallelism)
    val w1 = Window.partitionBy(group :+ col("_gb"): _*).orderBy(order: _*)
    val w2 = Window.partitionBy(group: _*).orderBy(order: _*)
    df.withColumn("_gb", pmod(hash(bucketKey), lit(b)))
      .withColumn("_lr", row_number().over(w1))
      .filter(col("_lr") <= k)
      .withColumn(rankCol, row_number().over(w2))
      .filter(col(rankCol) <= k)
      .drop("_gb", "_lr")
  }
}
