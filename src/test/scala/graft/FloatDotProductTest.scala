package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FloatDotProduct
import graft.operators.VectorOps

/** The native codegen expression must be bit-identical to the declarative
  * higher-order-function fold and to the UDF, in both interpreted and
  * codegen evaluation. */
class FloatDotProductTest extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_dot == aggregate(zip_with(...)) == UDF on real embeddings") {
    FloatDotProduct.register(spark)
    val em = Tables.table(spark, TestSpark.sf0001, "embeddings")
    val q = em.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
    val joined = em.crossJoin(broadcast(q))
    val rows = joined.select(
      $"vec_id",
      expr("graft_dot(embedding, q_emb)").as("native"),
      VectorOps.dotCol("embedding", "q_emb").as("hof"),
      VectorOps.dot($"embedding", $"q_emb").as("udf")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"native != hof for vec ${r.getLong(0)}")
      assert(r.getDouble(1) == r.getDouble(3), s"native != udf for vec ${r.getLong(0)}")
    }
  }

  test("null and length-mismatch behavior") {
    FloatDotProduct.register(spark)
    val df = Seq(
      (Some(Seq(1f, 2f, 3f)), Some(Seq(4f, 5f))),
      (None, Some(Seq(1f))),
      (Some(Seq(1f)), None)
    ).toDF("a", "b")
    val out = df.select(expr("graft_dot(a, b)")).collect()
    assert(out(0).getDouble(0) == 1f.toDouble * 4f.toDouble + 2f.toDouble * 5f.toDouble)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }
}
