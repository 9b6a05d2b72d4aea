package graft.spark

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst surface for the sitemap tier ([[SitemapOps]]): body parsing
  * (BINARY — gz-capable — or STRING) and the location-scope predicate.
  * Null-tolerant like the rest of the crawl tiers: unrecognizable bodies
  * yield SQL NULL, never an exception. */
abstract class SitemapBodyExpr extends UnaryExpression {
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType ||
        child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: body must be STRING or BINARY, got ${child.dataType.sql}")

  protected def bodyIsBinary: Boolean = child.dataType == BinaryType

  /** static method base name on [[SitemapOps]]; STRING input routes to
    * `fn`Str (text path — a STRING column cannot hold gz bytes). */
  protected def fn: String

  override def nullSafeEval(body: Any): Any =
    if (bodyIsBinary) callBinary(body.asInstanceOf[Array[Byte]])
    else call(body.asInstanceOf[UTF8String])

  protected def call(body: UTF8String): Any
  protected def callBinary(body: Array[Byte]): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (bodyIsBinary) fn else fn + "Str"
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.spark.SitemapOps.$m($b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }
}

/** `sitemap_kind(body)` — 'urlset' | 'index' | 'text', NULL when the
  * body is not a recognizable sitemap. */
case class SitemapKind(child: Expression) extends SitemapBodyExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "sitemap_kind"
  override protected def fn: String = "kindCodegen"
  override protected def call(body: UTF8String): Any = SitemapOps.kindCodegenStr(body)
  override protected def callBinary(body: Array[Byte]): Any = SitemapOps.kindCodegen(body)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `sitemap_entries(body)` — the parsed entries in file order:
  * ARRAY<STRUCT<loc, lastmod, changefreq, priority>> (lastmod/changefreq/
  * priority NULL when absent), NULL when the body is unrecognizable. */
case class SitemapEntries(child: Expression) extends SitemapBodyExpr {
  override def dataType: DataType = SitemapEntries.Schema
  override def prettyName: String = "sitemap_entries"
  override protected def fn: String = "entriesCodegen"
  override protected def call(body: UTF8String): Any = SitemapOps.entriesCodegenStr(body)
  override protected def callBinary(body: Array[Byte]): Any = SitemapOps.entriesCodegen(body)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SitemapEntries {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true),
    StructField("changefreq", StringType, nullable = true),
    StructField("priority", DoubleType, nullable = true))), containsNull = false)
}

/** `sitemap_in_scope(sitemap_url, url)` — the sitemaps.org location
  * rule: may this sitemap legitimately list this URL? NULL when either
  * side is NULL (unknown — don't silently pass a compliance gate). */
case class SitemapInScope(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "sitemap_in_scope"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType == StringType || e.dataType == NullType
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sitemap_in_scope: both arguments must be STRING, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = SitemapOps.inScopeCodegen(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])
    if (b == null) null else b.booleanValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val sCode = left.genCode(ctx)
    val uCode = right.genCode(ctx)
    val boxed = ctx.freshName("scopeRes")
    ev.copy(code =
      code"""
         |${sCode.code}
         |${uCode.code}
         |java.lang.Boolean $boxed = graft.spark.SitemapOps.inScopeCodegen(
         |  ${sCode.isNull} ? null : ${sCode.value},
         |  ${uCode.isNull} ? null : ${uCode.value});
         |boolean ${ev.isNull} = $boxed == null;
         |boolean ${ev.value} = ${ev.isNull} ? false : $boxed.booleanValue();
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
