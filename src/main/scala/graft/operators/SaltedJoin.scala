package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SCALE.md): salt the skewed (large)
  * side into `salts` sub-keys and explode the small side across all salts,
  * so one hot key's rows spread over `salts` reducers instead of one.
  *
  * AQE's skew-join split handles sort-merge skew automatically at runtime;
  * this explicit operator is for the cases AQE can't rewrite (aggregations
  * keyed on a hot key upstream of the join, or deliberate pre-partitioning)
  * and as the documented pattern for 100 TB pipelines.
  *
  * Exactness: pure row routing — the joined multiset is identical to the
  * unsalted join (SaltedJoinTest asserts equality).
  */
object SaltedJoin {

  def join(large: DataFrame, small: DataFrame, key: String, salts: Int = 8): DataFrame = {
    // Deterministic salt: hash ALL large-side columns (hashing the key alone
    // would be constant per key and spread nothing). Rows identical in every
    // column land on one salt — acceptable routing skew in exchange for
    // stage-retry determinism: a recomputed partition routes each row to the
    // same reducer, avoiding the classic nondeterministic-repartition hazard.
    val l = large.withColumn("_salt",
      pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val sm = small.withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    l.join(sm, Seq(key, "_salt")).drop("_salt")
  }
}
