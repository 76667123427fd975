package graft.rdf

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element
import scala.collection.mutable

import graft.model.Triple

/** S1 — TriX dataset parser (reference supports it through rdflib —
  * `src/rdf/rdf_parser.py:187-205` lists `trix` among SUPPORTED_FORMATS /
  * DATASET_FORMATS). TriX (W3C note) is XML:
  *
  * {{{
  * <TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
  *   <graph>
  *     <uri>http://g</uri>            <!-- optional graph name -->
  *     <triple>
  *       <uri>s</uri>|<id>b</id>      <!-- subject -->
  *       <uri>p</uri>                 <!-- predicate -->
  *       <uri>o</uri>|<id>b</id>      <!-- object -->
  *         |<plainLiteral xml:lang="en">text</plainLiteral>
  *         |<typedLiteral datatype="...">text</typedLiteral>
  *     </triple>
  *   </graph>
  * </TriX>
  * }}}
  *
  * Same JDK-DOM scaffolding as [[RdfXmlParser]] (no extra dependency,
  * DOCTYPE disabled for untrusted input); pure `String => Seq[Triple]`,
  * executor-hostable.
  */
object TrixParser {

  def parse(content: String): Seq[Triple] = {
    val factory = DocumentBuilderFactory.newInstance()
    factory.setNamespaceAware(true)
    factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setExpandEntityReferences(false)
    val doc = factory.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val out = mutable.ArrayBuffer[Triple]()

    def childElements(e: Element): Seq[Element] = {
      val nl = e.getChildNodes
      (0 until nl.getLength).map(nl.item).collect { case el: Element => el }
    }

    for (graphEl <- childElements(doc.getDocumentElement)
         if graphEl.getLocalName == "graph") {
      val kids = childElements(graphEl)
      // a leading non-<triple> element names the graph (<uri> or <id>)
      val (nameEls, tripleEls) = kids.partition(_.getLocalName != "triple")
      val graphName = nameEls.headOption.map(_.getTextContent.trim)
        .map(n => if (nameEls.head.getLocalName == "id") "_:" + n else n)

      for (t <- tripleEls) {
        val terms = childElements(t)
        if (terms.size == 3) {
          def term(e: Element): (String, String, Option[String], Option[String]) =
            e.getLocalName match {
              case "uri" => (e.getTextContent.trim, "uri", None, None)
              case "id" => ("_:" + e.getTextContent.trim, "bnode", None, None)
              case "plainLiteral" =>
                val lang = Option(e.getAttributeNS(
                  "http://www.w3.org/XML/1998/namespace", "lang")).filter(_.nonEmpty)
                val dt = if (lang.isDefined) Vocab.RDF + "langString"
                  else Vocab.XSD + "string"
                (e.getTextContent, "literal", Some(dt), lang)
              case "typedLiteral" =>
                val dt = Option(e.getAttribute("datatype")).filter(_.nonEmpty)
                  .getOrElse(Vocab.XSD + "string")
                (e.getTextContent, "literal", Some(dt), None)
              case other =>
                throw new TurtleParser.ParseException(s"unknown TriX term <$other>")
            }
          val (s, _, _, _) = term(terms(0))
          val (p, _, _, _) = term(terms(1))
          val (o, ok, odt, olang) = term(terms(2))
          out += Triple(s, p, o, ok, odt, graphName, olang)
        }
      }
    }
    out.toSeq
  }
}

/** S1 — HexTuples parser (reference lists `hext` in SUPPORTED_FORMATS /
  * DATASET_FORMATS, `rdf_parser.py:188-205`). HexTuples is ND-JSON: one
  * 6-element JSON array per line —
  * `[subject, predicate, value, datatype, language, graph]` where
  * datatype is `globalId` (IRI object), `localId` (bnode) or a literal
  * datatype IRI; empty strings mean absent. Line-oriented, so at scale it
  * splits like N-Quads (per-line, embarrassingly parallel).
  */
object HexTuplesParser {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def parse(content: String): Seq[Triple] =
    content.linesIterator.zipWithIndex.flatMap { case (line, i) =>
      val t = line.trim
      if (t.isEmpty || t.startsWith("#")) None
      else {
        val arr = mapper.readTree(t)
        if (!arr.isArray || arr.size() < 6)
          throw new TurtleParser.ParseException(
            s"HexTuples line ${i + 1}: expected a 6-element JSON array")
        def str(j: Int): String = arr.get(j).asText
        val (s, p, v, dt, lang, g) =
          (str(0), str(1), str(2), str(3), str(4), str(5))
        val (oKind, oDt, oLang) = dt match {
          case "globalId" => ("uri", None, None)
          case "localId" => ("bnode", None, None)
          case d =>
            val effDt = if (lang.nonEmpty) Vocab.RDF + "langString"
              else if (d.isEmpty) Vocab.XSD + "string" else d
            ("literal", Some(effDt), Option(lang).filter(_.nonEmpty))
        }
        Some(Triple(s, p, v, oKind, oDt, Option(g).filter(_.nonEmpty), oLang))
      }
    }.toSeq
}
