package graft.rdf

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element
import scala.collection.mutable

import graft.model.Triple

/** Shared JDK-DOM loader for the HTML-embedded serializations (RDFa,
  * microdata). The reference reads both through rdflib's html parsers
  * (`src/rdf/rdf_parser.py` SUPPORTED_FORMATS `rdfa`/`microdata`);
  * rdflib accepts tag-soup HTML — this engine accepts well-formed
  * XHTML (the JDK has no tag-soup parser and the zero-dependency rule
  * holds), which every generator-produced page satisfies. DOCTYPE is
  * rejected (untrusted input), so strip it upstream if present.
  */
private[rdf] object HtmlDom {
  def parse(content: String): Element = {
    val factory = DocumentBuilderFactory.newInstance()
    factory.setNamespaceAware(true)
    factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setExpandEntityReferences(false)
    factory.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .getDocumentElement
  }

  def children(e: Element): Seq[Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).map(nl.item).collect { case el: Element => el }
  }

  def attr(e: Element, name: String): Option[String] =
    Option(e.getAttribute(name)).filter(_.nonEmpty)
}

/** S1 — RDFa-lite parser (the `rdfa` serialization): the five-attribute
  * core of the W3C RDFa Lite profile — `vocab`, `prefix`, `typeof`,
  * `property`, `resource` (plus `about`, `content`, `href`/`src`
  * object sources) — with resource chaining: `property`+`resource`
  * re-roots nested elements at the object, `property`+`typeof`(+
  * optional `resource`) creates and types the object node, and a bare
  * `resource` re-roots the subject (RDFa Core 1.1 §7.5). Deviations
  * from a full RDFa 1.1 processor, deliberately: no `rel`/`rev`
  * (superseded by `property` in Lite), no `@inlist`, no xmlns:-style
  * prefix declarations — rdflib's processor (reference
  * `src/rdf/rdf_parser.py`, format `rdfa`) accepts those on
  * adversarial HTML; generator-authored RDFa Lite does not use them.
  */
object RdfaParser {
  import HtmlDom._

  def parse(content: String): Seq[Triple] = {
    val out = mutable.ArrayBuffer[Triple]()
    var bnodeCounter = 0
    def freshBnode(): String = { bnodeCounter += 1; s"_:rb$bnodeCounter" }

    final case class Ctx(subject: String, subjectKind: String,
                         vocab: String, prefixes: Map[String, String])

    def expand(term: String, ctx: Ctx): String = {
      if (term.contains("://") || term.startsWith("urn:")) term
      else {
        val i = term.indexOf(':')
        if (i > 0) ctx.prefixes.get(term.substring(0, i))
          .map(_ + term.substring(i + 1)).getOrElse(term)
        else ctx.vocab + term
      }
    }

    def parsePrefixAttr(v: String): Map[String, String] =
      v.trim.split("\\s+").grouped(2).collect {
        case Array(p, uri) if p.endsWith(":") => p.stripSuffix(":") -> uri
      }.toMap

    def walk(e: Element, ctx0: Ctx): Unit = {
      val ctx = ctx0.copy(
        vocab = attr(e, "vocab").getOrElse(ctx0.vocab),
        prefixes = ctx0.prefixes ++
          attr(e, "prefix").map(parsePrefixAttr).getOrElse(Map.empty))

      val about = attr(e, "about")
      val typeof = attr(e, "typeof")
      val property = attr(e, "property")
      val objIri = attr(e, "resource").orElse(attr(e, "href"))
        .orElse(attr(e, "src"))

      def kindOf(n: String) = if (n.startsWith("_:")) "bnode" else "uri"
      def emitTypes(subject: String): Unit =
        for (tv <- typeof.toSeq; t <- tv.trim.split("\\s+"))
          out += Triple(subject, Vocab.RdfType, expand(t, ctx), "uri")

      (about, property) match {
        case (Some(a), Some(props)) =>
          // about sets this element's subject; property still attaches to it
          emitTypes(a)
          emitLiteralOrRef(e, ctx.copy(subject = a, subjectKind = kindOf(a)),
            props, objIri)
        case (Some(a), None) =>
          emitTypes(a)
          walkChildren(e, ctx.copy(subject = a, subjectKind = kindOf(a)))
        case (None, Some(props)) =>
          if (typeof.isDefined) {
            // property + typeof: the typed node is the OBJECT — named by
            // resource/href/src when present (RDFa Core 1.1 §7.5 "typed
            // resource"), a fresh bnode otherwise. Previously the
            // resource-present case fell through to emitLiteralOrRef and
            // the object's rdf:type triples were silently dropped (the
            // common schema.org property+resource+typeof pattern).
            val node = objIri.getOrElse(freshBnode())
            val kind = kindOf(node)
            props.trim.split("\\s+").map(expand(_, ctx)).foreach(p =>
              out += Triple(ctx.subject, p, node, kind))
            val nested = ctx.copy(subject = node, subjectKind = kind)
            for (tv <- typeof.toSeq; t <- tv.trim.split("\\s+"))
              out += Triple(node, Vocab.RdfType, expand(t, nested), "uri")
            walkChildren(e, nested)
          } else emitLiteralOrRef(e, ctx, props, objIri)
        case (None, None) =>
          if (typeof.isDefined) {
            // typeof alone starts a new (unlinked) node
            val node = objIri.getOrElse(freshBnode())
            val nested = ctx.copy(subject = node, subjectKind = kindOf(node))
            for (tv <- typeof.toSeq; t <- tv.trim.split("\\s+"))
              out += Triple(node, Vocab.RdfType, expand(t, nested), "uri")
            walkChildren(e, nested)
          } else attr(e, "resource") match {
            // bare @resource (no property/typeof) re-roots the subject for
            // nested elements (RDFa Core §7.5 step 5) — href/src do NOT,
            // they only become objects in the presence of a predicate
            case Some(r) =>
              walkChildren(e, ctx.copy(subject = r, subjectKind = kindOf(r)))
            case None => walkChildren(e, ctx)
          }
      }
    }

    def emitLiteralOrRef(e: Element, ctx: Ctx, props: String,
                         objIri: Option[String]): Unit = {
      val preds = props.trim.split("\\s+").map(expand(_, ctx)).toSeq
      objIri match {
        case Some(o) =>
          val kind = if (o.startsWith("_:")) "bnode" else "uri"
          preds.foreach(p => out += Triple(ctx.subject, p, o, kind))
          walkChildren(e, ctx.copy(subject = o, subjectKind = kind))
        case None =>
          val lex = attr(e, "content").getOrElse(e.getTextContent.trim)
          val lang = attr(e, "lang").orElse(
            Option(e.getAttributeNS(
              "http://www.w3.org/XML/1998/namespace", "lang"))
              .filter(_.nonEmpty))
          val dt = attr(e, "datatype").map(expand(_, ctx))
            .orElse(if (lang.isDefined) Some(Vocab.RDF + "langString")
              else Some(Vocab.XSD + "string"))
          preds.foreach(p =>
            out += Triple(ctx.subject, p, lex, "literal", dt, None, lang))
          walkChildren(e, ctx)
      }
    }

    def walkChildren(e: Element, ctx: Ctx): Unit =
      children(e).foreach(walk(_, ctx))

    walk(parse0(content), Ctx("_:doc", "bnode", "", Map.empty))
    out.toSeq
  }

  private def parse0(content: String): Element = HtmlDom.parse(content)
}

/** S1 — HTML microdata parser (the `microdata` serialization):
  * `itemscope`/`itemtype`/`itemid`/`itemprop` per the WHATWG microdata
  * model with the standard microdata-to-RDF property expansion
  * (predicate = itemtype's vocabulary prefix + name when the name is
  * not an absolute IRI). Values: nested itemscope > href/src >
  * content attr > text content.
  */
object MicrodataParser {
  import HtmlDom._

  def parse(content: String): Seq[Triple] = {
    val out = mutable.ArrayBuffer[Triple]()
    var bnodeCounter = 0
    def freshBnode(): String = { bnodeCounter += 1; s"_:mb$bnodeCounter" }

    /** vocabulary prefix of an itemtype: up to the last '#' or '/'. */
    def vocabOf(itemtype: String): String = {
      val h = itemtype.lastIndexOf('#')
      if (h >= 0) itemtype.substring(0, h + 1)
      else {
        val s = itemtype.lastIndexOf('/')
        if (s >= 0) itemtype.substring(0, s + 1) else itemtype
      }
    }

    def walkItem(e: Element): (String, String) = {
      val subject = attr(e, "itemid").getOrElse(freshBnode())
      val kind = if (subject.startsWith("_:")) "bnode" else "uri"
      val itemtype = attr(e, "itemtype")
      itemtype.foreach(t =>
        out += Triple(subject, Vocab.RdfType, t, "uri"))
      val vocab = itemtype.map(vocabOf).getOrElse("")
      walkProps(e, subject, kind, vocab, root = true)
      (subject, kind)
    }

    def walkProps(e: Element, subject: String, kind: String,
                  vocab: String, root: Boolean): Unit = {
      for (c <- children(e)) {
        val isItem = attr(c, "itemscope").isDefined ||
          c.hasAttribute("itemscope")
        attr(c, "itemprop") match {
          case Some(names) =>
            val preds = names.trim.split("\\s+").map(n =>
              if (n.contains("://")) n else vocab + n).toSeq
            if (isItem) {
              val (o, ok) = walkItem(c)
              preds.foreach(p => out += Triple(subject, p, o, ok))
            } else {
              attr(c, "href").orElse(attr(c, "src")) match {
                case Some(iri) =>
                  preds.foreach(p => out += Triple(subject, p, iri, "uri"))
                case None =>
                  val lex = attr(c, "content")
                    .getOrElse(c.getTextContent.trim)
                  preds.foreach(p => out += Triple(subject, p, lex,
                    "literal", Some(Vocab.XSD + "string")))
              }
              walkProps(c, subject, kind, vocab, root = false)
            }
          case None =>
            if (isItem) walkItem(c) // top-level nested item (no prop edge)
            else walkProps(c, subject, kind, vocab, root = false)
        }
      }
    }

    // top-level items anywhere in the document
    def findTop(e: Element): Unit = {
      if (e.hasAttribute("itemscope")) { walkItem(e); () }
      else children(e).foreach(findTop)
    }
    findTop(HtmlDom.parse(content))
    out.toSeq
  }
}
