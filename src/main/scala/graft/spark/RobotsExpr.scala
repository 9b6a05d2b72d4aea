package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst surface for [[RobotsOps]] (RFC 9309). `robots_allowed` is
  * deliberately NOT null-short-circuiting on robots_txt: a missing
  * robots.txt (SQL NULL) means "everything allowed" in crawl semantics,
  * not "unknown". A NULL agent/path with a PRESENT robots.txt is the
  * caller's unknown and yields NULL — unparseable rows must not slip
  * through the compliance gate as "allowed". */
case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_allowed"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType == StringType || e.dataType == NullType
    if (ok(first) && ok(second) && ok(third)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "robots_allowed: robots_txt, agent, and path must be STRING")
  }

  override def eval(input: InternalRow): Any = {
    val b = RobotsOps.allowedCodegen(
      first.eval(input).asInstanceOf[UTF8String],
      second.eval(input).asInstanceOf[UTF8String],
      third.eval(input).asInstanceOf[UTF8String])
    if (b == null) null else b.booleanValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = first.genCode(ctx)
    val a = second.genCode(ctx)
    val p = third.genCode(ctx)
    val boxed = ctx.freshName("allowed")
    ev.copy(code =
      code"""
         |${r.code}
         |${a.code}
         |${p.code}
         |java.lang.Boolean $boxed = graft.spark.RobotsOps.allowedCodegen(
         |  ${r.isNull} ? null : ${r.value},
         |  ${a.isNull} ? null : ${a.value},
         |  ${p.isNull} ? null : ${p.value});
         |boolean ${ev.isNull} = $boxed == null;
         |boolean ${ev.value} = ${ev.isNull} ? false : $boxed.booleanValue();
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** `robots_crawl_delay(robots_txt, agent)` — the selected group's
  * Crawl-delay in seconds, NULL when undeclared. */
case class RobotsCrawlDelay(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_crawl_delay"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType == StringType || e.dataType == NullType
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "robots_crawl_delay: robots_txt and agent must be STRING")
  }

  override def nullSafeEval(robots: Any, agent: Any): Any =
    RobotsOps.crawlDelayCodegen(robots.asInstanceOf[UTF8String], agent.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, a) => {
      val boxed = ctx.freshName("delay")
      s"""
         |java.lang.Double $boxed = graft.spark.RobotsOps.crawlDelayCodegen($r, $a);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `robots_sitemaps(robots_txt)` — every Sitemap line, in file order
  * (group-independent per RFC 9309 §2.3.3). */
case class RobotsSitemaps(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "robots_sitemaps"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("robots_sitemaps: robots_txt must be STRING")

  override def nullSafeEval(robots: Any): Any =
    RobotsOps.sitemapsCodegen(robots.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, r => {
      s"""
         |${ev.value} = graft.spark.RobotsOps.sitemapsCodegen($r);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
