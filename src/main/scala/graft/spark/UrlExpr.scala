package graft.spark

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst surface for the URL tier ([[UrlOps]]): RFC 3986 reference
  * resolution / normalization / host extraction as codegen'd scalar
  * functions, plus `extract_links(html, base_url)` — the link-graph
  * primitive every crawl frontier needs downstream of extraction. All
  * null-tolerant: malformed URLs yield SQL NULL, never an exception
  * (at crawl scale some fraction of hrefs is always garbage). */
abstract class UrlUnaryExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: url must be STRING, got ${child.dataType.sql}")

  /** static method name on [[UrlOps]] implementing the expression. */
  protected def fn: String

  protected def call(url: UTF8String): Any

  override def nullSafeEval(url: Any): Any = call(url.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u => {
      s"""
         |${ev.value} = graft.spark.UrlOps.$fn($u);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
}

/** `url_normalize(url)` — RFC 3986 §6.2.2 syntax normalization + §6.2.3
  * scheme defaults, fragment dropped: the canonical crawl-identity key. */
case class UrlNormalize(child: Expression) extends UrlUnaryExpr {
  override def prettyName: String = "url_normalize"
  override protected def fn: String = "normalizeCodegen"
  override protected def call(url: UTF8String): Any = UrlOps.normalizeCodegen(url)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `url_host(url)` — lowercase host of an absolute URL (IPv6 brackets
  * stripped), NULL when absent. */
case class UrlHost(child: Expression) extends UrlUnaryExpr {
  override def prettyName: String = "url_host"
  override protected def fn: String = "hostCodegen"
  override protected def call(url: UTF8String): Any = UrlOps.hostCodegen(url)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `url_domain(url)` — registrable-domain approximation (last two labels,
  * three under generic ccTLD SLDs like co.uk): the standard grouping /
  * skew-salt key for per-site rollups. */
case class UrlDomain(child: Expression) extends UrlUnaryExpr {
  override def prettyName: String = "url_domain"
  override protected def fn: String = "domainCodegen"
  override protected def call(url: UTF8String): Any = UrlOps.domainCodegen(url)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `url_path(url)` — path + query of an absolute URL in robots
  * match-target form (`"/"` when empty, `"?query"` kept, fragment
  * dropped); NULL for authority-less refs. */
case class UrlPath(child: Expression) extends UrlUnaryExpr {
  override def prettyName: String = "url_path"
  override protected def fn: String = "pathCodegen"
  override protected def call(url: UTF8String): Any = UrlOps.pathCodegen(url)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `url_surt(url)` — the SURT canonical key (webarchive-commons /
  * CDX-index public format): host-reversed comma-joined authority,
  * lowercased path, bytewise-sorted query — one host's (and one
  * domain's) pages sort adjacently, the right range-partition / dedup
  * key at crawl scale. See [[UrlOps.surt]]. */
case class UrlSurt(child: Expression) extends UrlUnaryExpr {
  override def prettyName: String = "url_surt"
  override protected def fn: String = "surtCodegen"
  override protected def call(url: UTF8String): Any = UrlOps.surtCodegen(url)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `url_resolve(base, ref)` — RFC 3986 §5.2.2 strict reference
  * resolution, NULL when base is not absolute. */
case class UrlResolve(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_resolve"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType == StringType || e.dataType == NullType
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_resolve: base and ref must be STRING, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(base: Any, ref: Any): Any =
    UrlOps.resolveCodegen(base.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) => {
      s"""
         |${ev.value} = graft.spark.UrlOps.resolveCodegen($b, $r);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** shared shape of `extract_canonical` / `extract_refresh`:
  * (html STRING|BINARY, base_url STRING) -> STRING, null-tolerant. */
abstract class HtmlUrlExpr extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!(left.dataType == StringType || left.dataType == BinaryType || left.dataType == NullType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: html must be STRING or BINARY, got ${left.dataType.sql}")
    else if (!(right.dataType == StringType || right.dataType == NullType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: base_url must be STRING, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  protected def htmlIsBinary: Boolean = left.dataType == BinaryType

  /** static method pair on [[Extractor]]: `fn` / `fn`Binary. */
  protected def fn: String

  override def nullSafeEval(html: Any, base: Any): Any =
    if (htmlIsBinary) callBinary(html.asInstanceOf[Array[Byte]], base.asInstanceOf[UTF8String])
    else call(html.asInstanceOf[UTF8String], base.asInstanceOf[UTF8String])

  protected def call(html: UTF8String, base: UTF8String): Any
  protected def callBinary(html: Array[Byte], base: UTF8String): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (htmlIsBinary) fn + "Binary" else fn
    nullSafeCodeGen(ctx, ev, (h, b) => {
      s"""
         |${ev.value} = graft.spark.Extractor.$m($h, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }
}

/** `extract_canonical(html, base_url)` — the first
  * `link[rel~=canonical][href]` resolved against the document base and
  * normalized: the dedup-cluster key a crawl keeps per page. */
case class ExtractCanonical(left: Expression, right: Expression) extends HtmlUrlExpr {
  override def prettyName: String = "extract_canonical"
  override protected def fn: String = "extractCanonicalCodegen"
  override protected def call(html: UTF8String, base: UTF8String): Any =
    Extractor.extractCanonicalCodegen(html, base)
  override protected def callBinary(html: Array[Byte], base: UTF8String): Any =
    Extractor.extractCanonicalCodegenBinary(html, base)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `extract_refresh(html, base_url)` — the `meta[http-equiv=refresh]`
  * redirect target (WHATWG content grammar), resolved + normalized:
  * the client-side redirect edge of the crawl graph. */
case class ExtractRefresh(left: Expression, right: Expression) extends HtmlUrlExpr {
  override def prettyName: String = "extract_refresh"
  override protected def fn: String = "extractRefreshCodegen"
  override protected def call(html: UTF8String, base: UTF8String): Any =
    Extractor.extractRefreshCodegen(html, base)
  override protected def callBinary(html: Array[Byte], base: UTF8String): Any =
    Extractor.extractRefreshCodegenBinary(html, base)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `extract_links(html, base_url)` — every `a[href]` of the page in
  * document order, resolved against the page's effective base (the first
  * `base[href]` element when present, itself resolved against base_url —
  * the HTML-spec document-base rule) and normalized to crawl identity.
  * Unresolvable hrefs are skipped, parse failure yields NULL. */
/** `extract_anchors(html, base_url)` — every `a[href]` in document order
  * as ARRAY<STRUCT<href, text>>: the link target resolved/normalized like
  * `extract_links` plus its anchor text — the inbound-anchor relevance
  * signal WAT keeps and plain link extraction drops. */
case class ExtractAnchors(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("href", StringType, nullable = false),
      StructField("text", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "extract_anchors"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!(left.dataType == StringType || left.dataType == BinaryType || left.dataType == NullType))
      TypeCheckResult.TypeCheckFailure(
        s"extract_anchors: html must be STRING or BINARY, got ${left.dataType.sql}")
    else if (!(right.dataType == StringType || right.dataType == NullType))
      TypeCheckResult.TypeCheckFailure(
        s"extract_anchors: base_url must be STRING, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  private val htmlIsBinary: Boolean = left.dataType == BinaryType

  override def nullSafeEval(html: Any, base: Any): Any =
    if (htmlIsBinary)
      Extractor.extractAnchorsCodegenBinary(html.asInstanceOf[Array[Byte]],
        base.asInstanceOf[UTF8String])
    else
      Extractor.extractAnchorsCodegen(html.asInstanceOf[UTF8String],
        base.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (htmlIsBinary) "extractAnchorsCodegenBinary" else "extractAnchorsCodegen"
    nullSafeCodeGen(ctx, ev, (h, b) => {
      s"""
         |${ev.value} = graft.spark.Extractor.$fn($h, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class ExtractLinks(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "extract_links"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!(left.dataType == StringType || left.dataType == BinaryType || left.dataType == NullType))
      TypeCheckResult.TypeCheckFailure(
        s"extract_links: html must be STRING or BINARY, got ${left.dataType.sql}")
    else if (!(right.dataType == StringType || right.dataType == NullType))
      TypeCheckResult.TypeCheckFailure(
        s"extract_links: base_url must be STRING, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  private val htmlIsBinary: Boolean = left.dataType == BinaryType

  // interpreted path routes through the SAME static entries as doGenCode
  // (byte-native for BINARY; see the ExtractAttrs divergence note)
  override def nullSafeEval(html: Any, base: Any): Any =
    if (htmlIsBinary)
      Extractor.extractLinksCodegenBinary(html.asInstanceOf[Array[Byte]],
        base.asInstanceOf[UTF8String])
    else
      Extractor.extractLinksCodegen(html.asInstanceOf[UTF8String],
        base.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (htmlIsBinary) "extractLinksCodegenBinary" else "extractLinksCodegen"
    nullSafeCodeGen(ctx, ev, (h, b) => {
      s"""
         |${ev.value} = graft.spark.Extractor.$fn($h, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
