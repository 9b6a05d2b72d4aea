package graft.spark

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst surface for the page-metadata tier ([[MetaOps]]): `<title>`,
  * meta descriptors / Open Graph / Twitter Card, document language and
  * JSON-LD blocks as codegen'd scalar functions over the page's HTML
  * (STRING or BINARY — byte-native on BINARY like the extract_* family).
  * Null-tolerant: parse failure yields SQL NULL, never an exception. */
abstract class MetaHtmlExpr extends UnaryExpression {
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType ||
        child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: html must be STRING or BINARY, got ${child.dataType.sql}")

  protected def htmlIsBinary: Boolean = child.dataType == BinaryType

  /** static method base name on [[MetaOps]]; BINARY routes to `fn`Binary. */
  protected def fn: String

  override def nullSafeEval(html: Any): Any =
    if (htmlIsBinary) callBinary(html.asInstanceOf[Array[Byte]])
    else call(html.asInstanceOf[UTF8String])

  protected def call(html: UTF8String): Any
  protected def callBinary(html: Array[Byte]): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (htmlIsBinary) fn + "Binary" else fn
    nullSafeCodeGen(ctx, ev, h => {
      s"""
         |${ev.value} = graft.spark.MetaOps.$m($h);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }
}

/** `extract_title(html)` — the first `<title>`'s text, entity-decoded
  * and whitespace-collapsed (the WHATWG title rule); NULL when the page
  * has no title or fails to parse. */
case class ExtractTitle(child: Expression) extends MetaHtmlExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "extract_title"
  override protected def fn: String = "titleCodegen"
  override protected def call(html: UTF8String): Any = MetaOps.titleCodegen(html)
  override protected def callBinary(html: Array[Byte]): Any = MetaOps.titleCodegenBinary(html)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `extract_meta(html)` — STRUCT<title, description, keywords, lang,
  * og_title, og_description, og_url, og_image, og_type, twitter_card>
  * (each field NULL when absent); NULL only on parse failure. One fused
  * doc-order walk collects every field. */
case class ExtractMeta(child: Expression) extends MetaHtmlExpr {
  override def dataType: DataType = ExtractMeta.Schema
  override def prettyName: String = "extract_meta"
  override protected def fn: String = "metaCodegen"
  override protected def call(html: UTF8String): Any = MetaOps.metaCodegen(html)
  override protected def callBinary(html: Array[Byte]): Any = MetaOps.metaCodegenBinary(html)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExtractMeta {
  val Schema: DataType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("keywords", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("og_title", StringType, nullable = true),
    StructField("og_description", StringType, nullable = true),
    StructField("og_url", StringType, nullable = true),
    StructField("og_image", StringType, nullable = true),
    StructField("og_type", StringType, nullable = true),
    StructField("twitter_card", StringType, nullable = true)))
}

/** `extract_jsonld(html)` — raw trimmed payloads of every
  * `<script type="application/ld+json">` in document order (MIME-essence
  * type match); empty array when none, NULL on parse failure. */
case class ExtractJsonLd(child: Expression) extends MetaHtmlExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "extract_jsonld"
  override protected def fn: String = "jsonLdCodegen"
  override protected def call(html: UTF8String): Any = MetaOps.jsonLdCodegen(html)
  override protected def callBinary(html: Array[Byte]): Any = MetaOps.jsonLdCodegenBinary(html)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
