package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst surface for [[HttpOps]] (RFC 9110/9111 caching headers).
  * `http_fresh_seconds` is null-AWARE, not null-short-circuiting: absent
  * headers are the normal case (most responses carry only a subset) and
  * select which freshness rule applies — only "no basis at all" is NULL. */

/** `http_date(s)` — epoch seconds of an HTTP-date in any RFC 9110
  * §5.6.7 format (IMF-fixdate, rfc850, asctime); NULL when unparseable. */
case class HttpDate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "http_date"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"http_date: argument must be STRING, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any = {
    val r = HttpOps.dateCodegen(s.asInstanceOf[UTF8String])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val boxed = ctx.freshName("epoch")
      s"""
         |java.lang.Long $boxed = graft.spark.HttpOps.dateCodegen($s);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `http_fresh_seconds(cache_control, age, expires, date, last_modified)`
  * — remaining freshness per RFC 9111 §4.2 (shared-cache rules: no-store/
  * no-cache → 0, s-maxage > max-age > Expires−Date > the 10% heuristic),
  * minus `Age`, floored at 0; NULL when no rule applies. */
case class HttpFreshSeconds(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "http_fresh_seconds"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(e => e.dataType == StringType || e.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "http_fresh_seconds: all five arguments must be STRING")

  override def eval(input: InternalRow): Any = {
    val a = children.map(_.eval(input).asInstanceOf[UTF8String])
    val r = HttpOps.freshCodegen(a(0), a(1), a(2), a(3), a(4))
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val Seq(c0, c1, c2, c3, c4) = children.map(_.genCode(ctx))
    val args = Seq(c0, c1, c2, c3, c4)
      .map(c => s"${c.isNull} ? null : ${c.value}").mkString(",\n  ")
    val boxed = ctx.freshName("fresh")
    ev.copy(code =
      code"""
         |${c0.code}
         |${c1.code}
         |${c2.code}
         |${c3.code}
         |${c4.code}
         |java.lang.Long $boxed = graft.spark.HttpOps.freshCodegen(
         |  $args);
         |boolean ${ev.isNull} = $boxed == null;
         |long ${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
