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

/** `extract_main(html)` — the full boilerplate-strip recipe as one scalar;
  * `crawl = true` is registered as `extract_main_crawl(html)` and parses
  * under the HTML5 implicit-tree profile (implied body gives the recipe's
  * `body` candidate something to match on fragment pages). */
case class ExtractMain(child: Expression, crawl: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = if (crawl) "extract_main_crawl" else "extract_main"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType ||
      child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: html must be STRING or BINARY, got ${child.dataType.sql}")

  private val htmlIsBinary: Boolean = child.dataType == BinaryType

  override def nullSafeEval(html: Any): Any = {
    if (htmlIsBinary) {
      if (crawl) Extractor.extractMainCrawlCodegen(html.asInstanceOf[Array[Byte]])
      else Extractor.extractMainCodegen(html.asInstanceOf[Array[Byte]])
    } else {
      if (crawl) Extractor.extractMainCrawlCodegenStr(html.asInstanceOf[UTF8String])
      else Extractor.extractMainCodegenStr(html.asInstanceOf[UTF8String])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val base = if (crawl) "extractMainCrawlCodegen" else "extractMainCodegen"
    val fn = if (htmlIsBinary) base else base + "Str"
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

/** `extract_attrs(html, selector, attr)` — ARRAY<STRING> of `attr(name)`
  * per selector match in document order (the reference's find + attr flow);
  * boolean attributes yield "". */
case class ExtractAttrs(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  import org.apache.spark.sql.types.ArrayType
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "extract_attrs"

  override def checkInputDataTypes(): TypeCheckResult = {
    def strOk(e: Expression) = e.dataType == StringType || e.dataType == NullType
    if (!(strOk(first) || first.dataType == BinaryType))
      TypeCheckResult.TypeCheckFailure(
        s"extract_attrs: html must be STRING or BINARY, got ${first.dataType.sql}")
    else if (!strOk(second) || !strOk(third))
      TypeCheckResult.TypeCheckFailure("extract_attrs: selector and attr must be STRING")
    else TypeCheckResult.TypeCheckSuccess
  }

  private val htmlIsBinary: Boolean = first.dataType == BinaryType

  // the interpreted path MUST route through the same static entries as
  // doGenCode: a String round-trip here would replace invalid UTF-8 with
  // U+FFFD (diverging from the byte-native codegen result) and lacked the
  // defensive NonFatal->null contract
  override def nullSafeEval(html: Any, sel: Any, attr: Any): Any = {
    if (htmlIsBinary)
      Extractor.extractAttrsCodegenBinary(html.asInstanceOf[Array[Byte]],
        sel.asInstanceOf[UTF8String], attr.asInstanceOf[UTF8String])
    else
      Extractor.extractAttrsCodegen(html.asInstanceOf[UTF8String],
        sel.asInstanceOf[UTF8String], attr.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (htmlIsBinary) "extractAttrsCodegenBinary" else "extractAttrsCodegen"
    nullSafeCodeGen(ctx, ev, (h, s, a) => {
      s"""
         |${ev.value} = graft.spark.Extractor.$fn($h, $s, $a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** `extract_html(html, selector)` — ARRAY<STRING> of outerHtml() per
  * selector match in document order (the reference's find + outer_html
  * flow): the SQL snippet-extraction surface. */
case class ExtractHtml(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.ArrayType
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "extract_html"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!(left.dataType == StringType || left.dataType == BinaryType ||
        left.dataType == NullType))
      TypeCheckResult.TypeCheckFailure(
        s"extract_html: html must be STRING or BINARY, got ${left.dataType.sql}")
    else if (!(right.dataType == StringType || right.dataType == NullType))
      TypeCheckResult.TypeCheckFailure("extract_html: selector must be STRING")
    else TypeCheckResult.TypeCheckSuccess
  }

  private val htmlIsBinary: Boolean = left.dataType == BinaryType

  override def nullSafeEval(html: Any, sel: Any): Any = {
    if (htmlIsBinary)
      Extractor.extractOuterHtmlCodegenBinary(html.asInstanceOf[Array[Byte]],
        sel.asInstanceOf[UTF8String])
    else
      Extractor.extractOuterHtmlCodegen(html.asInstanceOf[UTF8String],
        sel.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (htmlIsBinary) "extractOuterHtmlCodegenBinary" else "extractOuterHtmlCodegen"
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

/** `extract_count(html, selector)` — find(selector).length as BIGINT. */
case class ExtractCount(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.LongType
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "extract_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!(left.dataType == StringType || left.dataType == BinaryType ||
        left.dataType == NullType))
      TypeCheckResult.TypeCheckFailure(
        s"extract_count: html must be STRING or BINARY, got ${left.dataType.sql}")
    else if (!(right.dataType == StringType || right.dataType == NullType))
      TypeCheckResult.TypeCheckFailure("extract_count: selector must be STRING")
    else TypeCheckResult.TypeCheckSuccess
  }

  private val htmlIsBinary: Boolean = left.dataType == BinaryType

  // interpreted path == codegen path (see ExtractAttrs note)
  override def nullSafeEval(html: Any, sel: Any): Any = {
    val out =
      if (htmlIsBinary)
        Extractor.extractCountCodegenBinary(html.asInstanceOf[Array[Byte]],
          sel.asInstanceOf[UTF8String])
      else
        Extractor.extractCountCodegen(html.asInstanceOf[UTF8String],
          sel.asInstanceOf[UTF8String])
    if (out == null) null else out.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (htmlIsBinary) "extractCountCodegenBinary" else "extractCountCodegen"
    nullSafeCodeGen(ctx, ev, (h, s) => {
      val boxed = ctx.freshName("cnt")
      s"""
         |java.lang.Long $boxed = graft.spark.Extractor.$fn($h, $s);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SparkSessionExtensions hook: set
  * `spark.sql.extensions=graft.spark.GraftSparkExtensions` and the functions
  * become available to `spark.sql` / `call_function`. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  // a clean arity error at analysis instead of IndexOutOfBounds from
  // children(i) when the call has the wrong argument count
  private def arity(name: String, n: Int, sig: String)(children: Seq[Expression]): Unit =
    if (children.size != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments: $name$sig, got ${children.size}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("extract_text"),
      new ExpressionInfo(classOf[ExtractText].getName, "extract_text"),
      (children: Seq[Expression]) => {
        arity("extract_text", 2, "(html, selector)")(children)
        ExtractText(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("extract_main"),
      new ExpressionInfo(classOf[ExtractMain].getName, "extract_main"),
      (children: Seq[Expression]) => {
        arity("extract_main", 1, "(html)")(children)
        ExtractMain(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("extract_main_crawl"),
      new ExpressionInfo(classOf[ExtractMain].getName, "extract_main_crawl"),
      (children: Seq[Expression]) => {
        arity("extract_main_crawl", 1, "(html)")(children)
        ExtractMain(children.head, crawl = true)
      }))
    ext.injectFunction((
      FunctionIdentifier("extract_attrs"),
      new ExpressionInfo(classOf[ExtractAttrs].getName, "extract_attrs"),
      (children: Seq[Expression]) => {
        arity("extract_attrs", 3, "(html, selector, attr)")(children)
        ExtractAttrs(children(0), children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("extract_count"),
      new ExpressionInfo(classOf[ExtractCount].getName, "extract_count"),
      (children: Seq[Expression]) => {
        arity("extract_count", 2, "(html, selector)")(children)
        ExtractCount(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("extract_html"),
      new ExpressionInfo(classOf[ExtractHtml].getName, "extract_html"),
      (children: Seq[Expression]) => {
        arity("extract_html", 2, "(html, selector)")(children)
        ExtractHtml(children(0), children(1))
      }))
    // charset_of / decode_html take an OPTIONAL content_type second arg
    val nullCt = org.apache.spark.sql.catalyst.expressions.Literal(null, StringType)
    def arity12(name: String)(children: Seq[Expression]): Expression = {
      if (children.size < 1 || children.size > 2)
        throw new IllegalArgumentException(
          s"$name expects 1 or 2 arguments: $name(html[, content_type]), got ${children.size}")
      if (children.size == 2) children(1) else nullCt
    }
    ext.injectFunction((
      FunctionIdentifier("charset_of"),
      new ExpressionInfo(classOf[CharsetOf].getName, "charset_of"),
      (children: Seq[Expression]) => {
        val ct = arity12("charset_of")(children) // validates size first
        CharsetOf(children.head, ct)
      }))
    ext.injectFunction((
      FunctionIdentifier("decode_html"),
      new ExpressionInfo(classOf[DecodeHtml].getName, "decode_html"),
      (children: Seq[Expression]) => {
        val ct = arity12("decode_html")(children)
        DecodeHtml(children.head, ct)
      }))
    // URL tier (UrlOps / UrlExpr): RFC 3986 scalars + link extraction
    ext.injectFunction((
      FunctionIdentifier("url_resolve"),
      new ExpressionInfo(classOf[UrlResolve].getName, "url_resolve"),
      (children: Seq[Expression]) => {
        arity("url_resolve", 2, "(base, ref)")(children)
        UrlResolve(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("url_normalize"),
      new ExpressionInfo(classOf[UrlNormalize].getName, "url_normalize"),
      (children: Seq[Expression]) => {
        arity("url_normalize", 1, "(url)")(children)
        UrlNormalize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("url_host"),
      new ExpressionInfo(classOf[UrlHost].getName, "url_host"),
      (children: Seq[Expression]) => {
        arity("url_host", 1, "(url)")(children)
        UrlHost(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("url_domain"),
      new ExpressionInfo(classOf[UrlDomain].getName, "url_domain"),
      (children: Seq[Expression]) => {
        arity("url_domain", 1, "(url)")(children)
        UrlDomain(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("http_date"),
      new ExpressionInfo(classOf[HttpDate].getName, "http_date"),
      (children: Seq[Expression]) => {
        arity("http_date", 1, "(http_date_string)")(children)
        HttpDate(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("http_fresh_seconds"),
      new ExpressionInfo(classOf[HttpFreshSeconds].getName, "http_fresh_seconds"),
      (children: Seq[Expression]) => {
        arity("http_fresh_seconds", 5,
          "(cache_control, age, expires, date, last_modified)")(children)
        HttpFreshSeconds(children)
      }))
    ext.injectFunction((
      FunctionIdentifier("url_path"),
      new ExpressionInfo(classOf[UrlPath].getName, "url_path"),
      (children: Seq[Expression]) => {
        arity("url_path", 1, "(url)")(children)
        UrlPath(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("extract_main_density"),
      new ExpressionInfo(classOf[ExtractMainDensity].getName, "extract_main_density"),
      (children: Seq[Expression]) => {
        arity("extract_main_density", 1, "(html)")(children)
        ExtractMainDensity(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("repetition_signals"),
      new ExpressionInfo(classOf[RepetitionSignals].getName, "repetition_signals"),
      (children: Seq[Expression]) => {
        arity("repetition_signals", 1, "(text)")(children)
        RepetitionSignals(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("scrub_cards"),
      new ExpressionInfo(classOf[ScrubCards].getName, "scrub_cards"),
      (children: Seq[Expression]) => {
        arity("scrub_cards", 1, "(text)")(children)
        ScrubCards(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("scrub_pii"),
      new ExpressionInfo(classOf[ScrubPii].getName, "scrub_pii"),
      (children: Seq[Expression]) => {
        arity("scrub_pii", 1, "(text)")(children)
        ScrubPii(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("fix_text"),
      new ExpressionInfo(classOf[FixText].getName, "fix_text"),
      (children: Seq[Expression]) => {
        arity("fix_text", 1, "(text)")(children)
        FixText(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("gopher_quality"),
      new ExpressionInfo(classOf[GopherQuality].getName, "gopher_quality"),
      (children: Seq[Expression]) => {
        arity("gopher_quality", 1, "(text)")(children)
        GopherQuality(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("url_surt"),
      new ExpressionInfo(classOf[UrlSurt].getName, "url_surt"),
      (children: Seq[Expression]) => {
        arity("url_surt", 1, "(url)")(children)
        UrlSurt(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("extract_links"),
      new ExpressionInfo(classOf[ExtractLinks].getName, "extract_links"),
      (children: Seq[Expression]) => {
        arity("extract_links", 2, "(html, base_url)")(children)
        ExtractLinks(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("extract_anchors"),
      new ExpressionInfo(classOf[ExtractAnchors].getName, "extract_anchors"),
      (children: Seq[Expression]) => {
        arity("extract_anchors", 2, "(html, base_url)")(children)
        ExtractAnchors(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("extract_canonical"),
      new ExpressionInfo(classOf[ExtractCanonical].getName, "extract_canonical"),
      (children: Seq[Expression]) => {
        arity("extract_canonical", 2, "(html, base_url)")(children)
        ExtractCanonical(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("extract_refresh"),
      new ExpressionInfo(classOf[ExtractRefresh].getName, "extract_refresh"),
      (children: Seq[Expression]) => {
        arity("extract_refresh", 2, "(html, base_url)")(children)
        ExtractRefresh(children(0), children(1))
      }))
    // robots tier (RobotsOps / RobotsExpr): RFC 9309 evaluation
    ext.injectFunction((
      FunctionIdentifier("robots_allowed"),
      new ExpressionInfo(classOf[RobotsAllowed].getName, "robots_allowed"),
      (children: Seq[Expression]) => {
        arity("robots_allowed", 3, "(robots_txt, agent, path)")(children)
        RobotsAllowed(children(0), children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("robots_crawl_delay"),
      new ExpressionInfo(classOf[RobotsCrawlDelay].getName, "robots_crawl_delay"),
      (children: Seq[Expression]) => {
        arity("robots_crawl_delay", 2, "(robots_txt, agent)")(children)
        RobotsCrawlDelay(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("robots_sitemaps"),
      new ExpressionInfo(classOf[RobotsSitemaps].getName, "robots_sitemaps"),
      (children: Seq[Expression]) => {
        arity("robots_sitemaps", 1, "(robots_txt)")(children)
        RobotsSitemaps(children.head)
      }))
    // sitemap tier (SitemapOps / SitemapExpr): sitemaps.org protocol
    ext.injectFunction((
      FunctionIdentifier("sitemap_kind"),
      new ExpressionInfo(classOf[SitemapKind].getName, "sitemap_kind"),
      (children: Seq[Expression]) => {
        arity("sitemap_kind", 1, "(body)")(children)
        SitemapKind(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("sitemap_entries"),
      new ExpressionInfo(classOf[SitemapEntries].getName, "sitemap_entries"),
      (children: Seq[Expression]) => {
        arity("sitemap_entries", 1, "(body)")(children)
        SitemapEntries(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("sitemap_in_scope"),
      new ExpressionInfo(classOf[SitemapInScope].getName, "sitemap_in_scope"),
      (children: Seq[Expression]) => {
        arity("sitemap_in_scope", 2, "(sitemap_url, url)")(children)
        SitemapInScope(children(0), children(1))
      }))
    // page-metadata tier (MetaOps / MetaExpr): title / meta / OG / JSON-LD
    ext.injectFunction((
      FunctionIdentifier("extract_title"),
      new ExpressionInfo(classOf[ExtractTitle].getName, "extract_title"),
      (children: Seq[Expression]) => {
        arity("extract_title", 1, "(html)")(children)
        ExtractTitle(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("extract_meta"),
      new ExpressionInfo(classOf[ExtractMeta].getName, "extract_meta"),
      (children: Seq[Expression]) => {
        arity("extract_meta", 1, "(html)")(children)
        ExtractMeta(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("extract_jsonld"),
      new ExpressionInfo(classOf[ExtractJsonLd].getName, "extract_jsonld"),
      (children: Seq[Expression]) => {
        arity("extract_jsonld", 1, "(html)")(children)
        ExtractJsonLd(children.head)
      }))
    // feed tier (FeedOps / FeedExpr): RSS 2.0 / RDF / Atom
    ext.injectFunction((
      FunctionIdentifier("feed_kind"),
      new ExpressionInfo(classOf[FeedKind].getName, "feed_kind"),
      (children: Seq[Expression]) => {
        arity("feed_kind", 1, "(body)")(children)
        FeedKind(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("feed_title"),
      new ExpressionInfo(classOf[FeedTitle].getName, "feed_title"),
      (children: Seq[Expression]) => {
        arity("feed_title", 1, "(body)")(children)
        FeedTitle(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("feed_entries"),
      new ExpressionInfo(classOf[FeedEntries].getName, "feed_entries"),
      (children: Seq[Expression]) => {
        arity("feed_entries", 1, "(body)")(children)
        FeedEntries(children.head)
      }))
  }
}
