package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-path coverage (SCALE.md "Skewed keys"): when AQE's runtime
  * skew-join split handles a power-law key on its own, and when the
  * explicit SaltedJoin rewrite is still required. */
class AqeSkewTest extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Power-law fact: one hot key carrying ~98% of the rows, with a payload
    * wide enough that the hot shuffle partition crosses the (lowered) skew
    * threshold. */
  private def skewedFact(hot: Int, cold: Int) = {
    // incompressible payload — shuffle blocks are compressed, so a constant
    // pad would deflate the hot partition below any skew threshold
    val pad = sha2(concat(lit("p"), col("id")), 256)
    spark.range(hot).select(lit(0L).as("k"), pad.as("payload"))
      .unionAll(spark.range(cold).select((col("id") % 100 + 1).as("k"),
        pad.as("payload")))
  }

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition of a power-law sort-merge join (plan evidence)") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true") {
      val fact = skewedFact(50000, 2000)
      val dim = spark.range(101).select(col("id").as("k"), (col("id") * 7).as("attr"))
      val joined = fact.join(dim, "k")
      // execute THIS frame (not a derived count) so its adaptive plan
      // finalizes — AQE rewrites are only visible on the final plan
      assert(joined.collect().length == 52000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true") || plan.contains("isSkewJoin=true") ||
        plan.contains("AQEShuffleRead skewed"),
        s"expected AQE skew split in the final plan:\n$plan")
    }
  }

  test("AQE declines the skew split when the join's partitioning is required downstream — SaltedJoin's regime") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
      val fact = skewedFact(50000, 2000)
      val dim = spark.range(101).select(col("id").as("k"), (col("id") * 7).as("attr"))
      // same join, but a groupBy on the join key consumes the partitioning:
      // splitting the hot partition would force an extra shuffle, which AQE
      // (forceOptimizeSkewedJoin=false) refuses — the hot key stays on one
      // reducer and ONLY an explicit rewrite (SaltedJoin / two-stage agg)
      // can spread it
      val agged = fact.join(dim, "k").groupBy("k").agg(count(lit(1)).as("n"))
      val rows = agged.collect()
      assert(rows.length == 101)
      val plan = agged.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(!plan.contains("skew=true") && !plan.contains("isSkewJoin=true") &&
        !plan.contains("AQEShuffleRead skewed"),
        s"expected NO skew split when partitioning is reused downstream:\n$plan")

      // the explicit rewrite handles exactly this shape: salt spreads the
      // hot key across reducers in the join, the agg re-aggregates exactly
      val salted = graft.operators.SaltedJoin.join(fact, dim, "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
        .collect().map(_.toString).sorted.toSeq
      assert(salted == rows.map(_.toString).sorted.toSeq)
    }
  }
}
