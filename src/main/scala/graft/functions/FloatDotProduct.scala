package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: Σ aᵢ·bᵢ over two ARRAY<FLOAT> columns with
  * FLOAT→DOUBLE promotion and a strict left-to-right fold — semantically
  * identical to `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)),
  * 0d, (s,v) -> s+v)` INCLUDING its null semantics: `zip_with` pads a
  * length mismatch with nulls and a null element nullifies the whole fold,
  * so any null element or differing lengths yield NULL. Participates in
  * whole-stage codegen: no per-row lambda interpretation, no UDF
  * serialization, no array boxing. This is the charter's preferred shape
  * for a hot scalar kernel (Expression with doGenCode > Scala UDF).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  // nullable=true forces nullSafeCodeGen's mutable-isNull branch, so the
  // element-level null checks below can set ${ev.isNull} at runtime.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatDotProduct {
  /** Register as the SQL function `graft_dot` in this session (idempotent);
    * afterwards `expr("graft_dot(a, b)")` builds the native expression. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions._
    castToImpl(spark).sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => FloatDotProduct(exprs.head, exprs(1)), "built-in")
  }
}
