package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd dot product over fixed-point long arrays:
  * `fixed_dot(a, b) = Σ a[i]·b[i]` (null elements contribute 0; length =
  * min of the two).
  *
  * Why a custom Expression (SURVEY.md §2.10 preference order): the
  * declarative formulation `aggregate(zip_with(a, b, (x,y) -> x*y), 0L,
  * (s,x) -> s+x)` runs on Spark's interpreted higher-order-function path
  * (lambdas don't participate in whole-stage codegen), allocating per
  * element. This expression compiles to a tight primitive loop inside the
  * enclosing WholeStageCodegen stage — the hot path for vector math over
  * `ArrayType` columns at 100 TB.
  */
case class FixedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fixed_dot requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "fixed_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: two fixed_dot calls can share one codegen scope — fixed
      // locals would collide and break whole-stage compilation
      val n = ctx.freshName("fdN")
      val s = ctx.freshName("fdS")
      val i = ctx.freshName("fdI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedDot =
    copy(left = newLeft, right = newRight)
}

object FixedDot {
  val identifier: FunctionIdentifier = FunctionIdentifier("fixed_dot")
  val info: ExpressionInfo = new ExpressionInfo(classOf[FixedDot].getName, "fixed_dot")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "fixed_dot takes exactly 2 arguments")
    FixedDot(children.head, children(1))
  }

  /** Imperative registration into an EXISTING session's function registry
    * — lets query builders use `expr("fixed_dot(...)")` under any caller
    * session (the driver owns session construction). Idempotent.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
