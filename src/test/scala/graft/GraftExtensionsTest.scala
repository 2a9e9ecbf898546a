package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** The SparkSessionExtensions surface: function injection + optimizer rule. */
class GraftExtensionsTest extends AnyFunSuite {

  /** getOrCreate would return TestSpark's session (no extensions), so clear
    * the default first; the new session shares the SparkContext. */
  private lazy val ext: SparkSession = {
    val prev = TestSpark.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(prev)
    SparkSession.setActiveSession(prev)
    s
  }

  test("injected graft_dot works in SQL and self-dot rewrites to FloatNorm2") {
    val spark = ext
    import spark.implicits._
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")

    val dot = spark.sql("SELECT graft_dot(a, b) FROM vecs").as[Double].head()
    assert(dot == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)

    // a LocalRelation source gets eagerly evaluated, hiding the rewrite —
    // use range so the optimized plan keeps the expression tree
    spark.range(3)
      .selectExpr("transform(sequence(1, 3), i -> CAST(i + id AS FLOAT)) AS a")
      .createOrReplaceTempView("rvecs")
    val self = spark.sql("SELECT graft_dot(a, a) AS n2 FROM rvecs")
    assert(self.queryExecution.optimizedPlan.toString.contains("floatnorm2"),
      self.queryExecution.optimizedPlan.toString)
    // row id=0: [1,2,3] -> 14
    assert(self.as[Double].collect().min == 14.0)
  }
}
