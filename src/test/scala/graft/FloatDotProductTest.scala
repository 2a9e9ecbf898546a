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

  test("doGenCode actually compiles (no silent interpreted fallback)") {
    FloatDotProduct.register(spark)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val em = Tables.table(spark, TestSpark.sf0001, "embeddings")
      val q = em.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
      // graft_dot in a whole-stage-codegen projection
      val n = em.crossJoin(broadcast(q))
        .select(expr("graft_dot(embedding, q_emb)").as("d"))
        .filter($"d" > -1e9).count()
      assert(n == em.count())
      // FloatNorm2 via the optimizer rewrite inside codegen
      val self = em.select(expr("graft_dot(embedding, embedding)").as("n2"))
        .filter($"n2" > 0).count()
      assert(self == em.count())
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("null and length-mismatch behavior matches the zip_with/aggregate form") {
    FloatDotProduct.register(spark)
    val df = Seq(
      (Some(Seq(1f, 2f, 3f)), Some(Seq(4f, 5f))), // mismatch: zip_with pads with null -> NULL
      (None, Some(Seq(1f))),
      (Some(Seq(1f)), None),
      (Some(Seq(1f, 2f)), Some(Seq(3f, 4f)))
    ).toDF("a", "b")
    val out = df.select(
      expr("graft_dot(a, b)"),
      expr("aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (s,v) -> s+v)"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), r.toString)
    }
    // element-level null nullifies the fold in both forms
    val withNullElem = spark.sql(
      "SELECT graft_dot(array(CAST(1 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(2 AS FLOAT), CAST(3 AS FLOAT))) AS d")
    assert(withNullElem.collect()(0).isNullAt(0))
  }
}
