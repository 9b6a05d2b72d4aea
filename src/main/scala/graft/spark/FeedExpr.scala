package graft.spark

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst surface for the feed tier ([[FeedOps]]): RSS 2.0 / RSS 1.0
  * (RDF) / Atom body parsing over BINARY (gz-capable via the shared
  * sitemap decode) or STRING. Null-tolerant: non-feed bodies yield SQL
  * NULL, never an exception. */
abstract class FeedBodyExpr extends UnaryExpression {
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType ||
        child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: body must be STRING or BINARY, got ${child.dataType.sql}")

  protected def bodyIsBinary: Boolean = child.dataType == BinaryType

  /** static method base name on [[FeedOps]]; STRING routes to `fn`Str. */
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
         |${ev.value} = graft.spark.FeedOps.$m($b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }
}

/** `feed_kind(body)` — 'rss' | 'rdf' | 'atom', NULL when the body is not
  * a recognizable feed. */
case class FeedKind(child: Expression) extends FeedBodyExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "feed_kind"
  override protected def fn: String = "kindCodegen"
  override protected def call(body: UTF8String): Any = FeedOps.kindCodegenStr(body)
  override protected def callBinary(body: Array[Byte]): Any = FeedOps.kindCodegen(body)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `feed_title(body)` — the channel/feed-level title, NULL when absent
  * or not a feed. */
case class FeedTitle(child: Expression) extends FeedBodyExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "feed_title"
  override protected def fn: String = "titleCodegen"
  override protected def call(body: UTF8String): Any = FeedOps.titleCodegenStr(body)
  override protected def callBinary(body: Array[Byte]): Any = FeedOps.titleCodegen(body)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `feed_entries(body)` — entries in file order:
  * ARRAY<STRUCT<title, link, published, id>> (each field NULL when
  * absent), NULL when the body is not a recognizable feed. */
case class FeedEntries(child: Expression) extends FeedBodyExpr {
  override def dataType: DataType = FeedEntries.Schema
  override def prettyName: String = "feed_entries"
  override protected def fn: String = "entriesCodegen"
  override protected def call(body: UTF8String): Any = FeedOps.entriesCodegenStr(body)
  override protected def callBinary(body: Array[Byte]): Any = FeedOps.entriesCodegen(body)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FeedEntries {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("link", StringType, nullable = true),
    StructField("published", StringType, nullable = true),
    StructField("id", StringType, nullable = true))), containsNull = false)
}
