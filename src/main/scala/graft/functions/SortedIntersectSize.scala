package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd set-intersection SIZE over two ASC-sorted, null-free
  * `ARRAY<BIGINT>` columns: a two-pointer merge — O(|a|+|b|), zero
  * allocation.
  *
  * Why a custom Expression (SURVEY.md §2.10 preference order): the
  * builtin `size(array_intersect(a, b))` builds a per-row hash set AND
  * materializes the intersection array just to take its length. In
  * adjacency-intersection triangle counting the intersection size is
  * summed over every oriented edge — at sf0.1 that is 500k edges ×
  * ~300-element arrays, and the allocation cost dominates the stage
  * (5.2s → see SCALING.md round-7). The merge loop compiles into the
  * enclosing WholeStageCodegen stage like FixedDot.
  *
  * Contract: both inputs sorted ascending with no null elements (as
  * produced by `sort_array(collect_list(...))` over non-null longs).
  * Duplicate elements advance both cursors (exact for set inputs).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_size"

  // The null-free element contract is machine-enforced: ArrayData.getLong
  // reads a null slot as 0, which would silently corrupt the count, so a
  // null element raises instead. The check compiles in ONLY for inputs
  // whose static type admits nulls (containsNull = true) — the common
  // sort_array(collect_list(...)) shape is containsNull = false and keeps
  // the branch-free hot loop.
  private def mayHaveNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  private lazy val checkLeft = mayHaveNulls(left)
  private lazy val checkRight = mayHaveNulls(right)

  private def nullElement(): Nothing = throw new IllegalArgumentException(
    "sorted_intersect_size: null array element (inputs must be null-free)")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var s = 0L
    while (i < na && j < nb) {
      if (checkLeft && a.isNullAt(i)) nullElement()
      if (checkRight && b.isNullAt(j)) nullElement()
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { s += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("siNa"); val nb = ctx.freshName("siNb")
      val i = ctx.freshName("siI"); val j = ctx.freshName("siJ")
      val s = ctx.freshName("siS")
      val x = ctx.freshName("siX"); val y = ctx.freshName("siY")
      val err = "new IllegalArgumentException(\"sorted_intersect_size: " +
        "null array element (inputs must be null-free)\")"
      val guardA =
        if (checkLeft) s"if ($a.isNullAt($i)) { throw $err; }" else ""
      val guardB =
        if (checkRight) s"if ($b.isNullAt($j)) { throw $err; }" else ""
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $s = 0L;
         |while ($i < $na && $j < $nb) {
         |  $guardA
         |  $guardB
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $s++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  val identifier: FunctionIdentifier = FunctionIdentifier("sorted_intersect_size")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "sorted_intersect_size takes exactly 2 arguments")
    SortedIntersectSize(children.head, children(1))
  }

  /** Idempotent registration into an existing session (same contract as
    * [[FixedDot.ensureRegistered]]).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
