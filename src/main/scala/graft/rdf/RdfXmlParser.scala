package graft.rdf

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Element, Node => DomNode}
import scala.collection.mutable

import graft.model.Triple

/** S1 — RDF/XML subset parser (the dialect of the reference's sample
  * corpus): typed node elements under `rdf:RDF` (element QName → rdf:type),
  * `rdf:about` subjects, property child elements with text content
  * (literals, optional `rdf:datatype`), `rdf:resource` object references,
  * and nested typed nodes. Uses the JDK DOM parser — no extra dependency;
  * external entity resolution disabled (untrusted input).
  */
object RdfXmlParser {

  private val RdfNs = Vocab.RDF.stripSuffix("#")

  def parse(content: String): Seq[Triple] = {
    val factory = DocumentBuilderFactory.newInstance()
    factory.setNamespaceAware(true)
    factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setExpandEntityReferences(false)
    val doc = factory.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val root = doc.getDocumentElement
    val out = mutable.ArrayBuffer[Triple]()
    var bnodeCounter = 0
    def freshBnode(): String = { bnodeCounter += 1; s"_:xb$bnodeCounter" }

    def uriOf(e: Element): String = Option(e.getNamespaceURI).getOrElse("") + e.getLocalName
    def rdfAttr(e: Element, name: String): Option[String] =
      Option(e.getAttributeNS(Vocab.RDF.stripSuffix("#") + "#", name)).filter(_.nonEmpty)

    def childElements(e: Element): Seq[Element] = {
      val nl = e.getChildNodes
      (0 until nl.getLength).map(nl.item).collect {
        case el: Element => el
      }
    }

    /** A typed node element (or rdf:Description). Returns (subject, kind). */
    def parseNode(e: Element): (String, String) = {
      val (subj, kind) = rdfAttr(e, "about").map(u => (u, "uri"))
        .orElse(rdfAttr(e, "ID").map(u => ("#" + u, "uri")))
        .orElse(rdfAttr(e, "nodeID").map(id => ("_:" + id, "bnode")))
        .getOrElse((freshBnode(), "bnode"))
      val typeUri = uriOf(e)
      if (typeUri != Vocab.RDF + "Description")
        out += Triple(subj, Vocab.RdfType, typeUri, "uri", None, None)
      for (prop <- childElements(e)) {
        val pred = uriOf(prop)
        rdfAttr(prop, "resource") match {
          case Some(res) =>
            out += Triple(subj, pred, res, "uri", None, None)
          case None =>
            val kids = childElements(prop)
            if (kids.nonEmpty) {
              // nested typed node
              val (o, k) = parseNode(kids.head)
              out += Triple(subj, pred, o, k, None, None)
            } else {
              val text = Option(prop.getTextContent).getOrElse("")
              val dt = rdfAttr(prop, "datatype")
                .orElse(Some(Vocab.XSD + "string"))
              out += Triple(subj, pred, text, "literal", dt, None)
            }
        }
      }
      (subj, kind)
    }

    childElements(root).foreach(parseNode)
    out.toSeq
  }
}
