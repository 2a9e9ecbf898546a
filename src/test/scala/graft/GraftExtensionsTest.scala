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

  test("extension session exposes the full SQL surface; Graft.init matches it on a plain session") {
    // extension-injected functions all resolve in SQL
    val viaExt = ext.sql(
      """SELECT graft_within(0d, 0d, 3d, 4d, 5.0) AS w,
        |       graft_boxlb(array(0d,1d,0d,1d), array(5d,6d,0d,1d)) AS lb,
        |       graft_hausdorff_bounded(array(0d), array(0d), array(3d), array(4d), 1e18) AS h,
        |       graft_frechet_bounded(array(0d), array(0d), array(3d), array(4d), 1e18) AS f
        |""".stripMargin).head()
    assert(viaExt.getBoolean(0)) // dist 5.0 <= 5.0
    assert(viaExt.getDouble(1) == 4.0)
    assert(viaExt.getDouble(2) == 5.0)
    assert(viaExt.getDouble(3) == 5.0)
    // plain session + Graft.init: same functions, same rewrite behavior
    val plain = TestSpark.spark
    Graft.init(plain)
    val viaInit = plain.sql(
      "SELECT graft_within(0d, 0d, 3d, 4d, 5.0), " +
        "graft_boxlb(array(0d,1d,0d,1d), array(5d,6d,0d,1d)), " +
        "graft_hausdorff_bounded(array(0d), array(0d), array(3d), array(4d), 1e18), " +
        "graft_frechet_bounded(array(0d), array(0d), array(3d), array(4d), 1e18)").head()
    assert(viaInit.getBoolean(0) && viaInit.getDouble(1) == 4.0 && viaInit.getDouble(2) == 5.0)
    assert(viaInit.getDouble(3) == 5.0)
    assert(plain.experimental.extraOptimizations.contains(graft.plans.RewriteDistanceJoin))
  }
}
