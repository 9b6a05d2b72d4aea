package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared shape of `charset_of` / `decode_html`: html BINARY (required,
  * null propagates) + content_type STRING (OPTIONAL — a null Content-Type
  * means "no transport-layer information", not "no result", so these
  * expressions do NOT use the null-short-circuiting nullSafeEval: a row
  * with a missing header still sniffs from BOM / meta / content). */
abstract class CharsetExprBase extends BinaryExpression {
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!(left.dataType == BinaryType || left.dataType == NullType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: html must be BINARY (raw payload bytes), got ${left.dataType.sql}")
    else if (!(right.dataType == StringType || right.dataType == NullType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: content_type must be STRING, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** static method on [[CharsetOps]] implementing the expression. */
  protected def fn: String

  protected def call(html: Array[Byte], ct: UTF8String): Any

  override def eval(input: InternalRow): Any = {
    val h = left.eval(input)
    if (h == null) null
    else call(h.asInstanceOf[Array[Byte]], right.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
         |${l.code}
         |boolean ${ev.isNull} = true;
         |$javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
         |if (!${l.isNull}) {
         |  ${r.code}
         |  ${ev.value} = graft.spark.CharsetOps.$fn(${l.value},
         |    ${r.isNull} ? null : ${r.value});
         |  ${ev.isNull} = ${ev.value} == null;
         |}
       """.stripMargin)
  }
}

/** `charset_of(html[, content_type])` — the sniffed canonical encoding
  * name (WHATWG precedence: BOM > Content-Type charset > meta prescan >
  * UTF-8-validity/windows-1252 heuristic). */
case class CharsetOf(left: Expression, right: Expression) extends CharsetExprBase {
  override def dataType: DataType = StringType
  override def prettyName: String = "charset_of"
  override protected def fn: String = "sniffCodegen"
  override protected def call(html: Array[Byte], ct: UTF8String): Any =
    CharsetOps.sniffCodegen(html, ct)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `decode_html(html[, content_type])` — payload bytes transcoded to
  * UTF-8 bytes (zero-copy when already valid UTF-8), ready for the
  * extract_* family. */
case class DecodeHtml(left: Expression, right: Expression) extends CharsetExprBase {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "decode_html"
  override protected def fn: String = "decodeCodegen"
  override protected def call(html: Array[Byte], ct: UTF8String): Any =
    CharsetOps.decodeCodegen(html, ct)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
