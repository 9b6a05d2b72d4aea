package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{BinaryType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst scalar `extract_text(html, selector)` returning the
  * concatenated `text()` of selector matches (the reference flow
  * `Vis::load(html).find(sel).text()`, reference `src/lib.rs:1256`,
  * `elements.rs:1097,2897`).
  *
  * A real `Expression` (not a ScalaUDF) keeps the call inside whole-stage
  * codegen: `doGenCode` emits a direct static call, no row boxing, null
  * short-circuit for free. `html` may be STRING or BINARY (UTF-8 bytes per
  * the pages-table input hint).
  */
case class ExtractText(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "extract_text"
  // clean analysis-time error instead of a codegen ClassCastException on
  // e.g. extract_text(123, 'p')
  override def checkInputDataTypes(): TypeCheckResult = {
    // NullType = untyped NULL literal: legal, evaluates to null
    if (!(left.dataType == StringType || left.dataType == BinaryType ||
        left.dataType == NullType))
      TypeCheckResult.TypeCheckFailure(
        s"extract_text: html must be STRING or BINARY, got ${left.dataType.sql}")
    else if (!(right.dataType == StringType || right.dataType == NullType))
      TypeCheckResult.TypeCheckFailure(
        s"extract_text: selector must be STRING, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  private val htmlIsBinary: Boolean = left.dataType == BinaryType

  override def nullSafeEval(html: Any, selector: Any): Any = {
    if (htmlIsBinary)
      Extractor.extractTextCodegenBinary(html.asInstanceOf[Array[Byte]],
        selector.asInstanceOf[UTF8String])
    else
      Extractor.extractTextCodegen(html.asInstanceOf[UTF8String],
        selector.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (htmlIsBinary) "extractTextCodegenBinary" else "extractTextCodegen"
    nullSafeCodeGen(ctx, ev, (h, s) => {
      s"""
         |${ev.value} = graft.spark.Extractor.$fn($h, $s);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `extract_main(html)` — the full boilerplate-strip recipe as one scalar. */
case class ExtractMain(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "extract_main"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType ||
      child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"extract_main: html must be STRING or BINARY, got ${child.dataType.sql}")

  private val htmlIsBinary: Boolean = child.dataType == BinaryType

  override def nullSafeEval(html: Any): Any = {
    if (htmlIsBinary) Extractor.extractMainCodegen(html.asInstanceOf[Array[Byte]])
    else Extractor.extractMainCodegenStr(html.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (htmlIsBinary) "extractMainCodegen" else "extractMainCodegenStr"
    nullSafeCodeGen(ctx, ev, h => {
      s"""
         |${ev.value} = graft.spark.Extractor.$fn($h);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SparkSessionExtensions hook: set
  * `spark.sql.extensions=graft.spark.GraftSparkExtensions` and the functions
  * become available to `spark.sql` / `call_function`. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("extract_text"),
      new ExpressionInfo(classOf[ExtractText].getName, "extract_text"),
      (children: Seq[Expression]) => ExtractText(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("extract_main"),
      new ExpressionInfo(classOf[ExtractMain].getName, "extract_main"),
      (children: Seq[Expression]) => ExtractMain(children.head)))
  }
}
