package graft.rdf

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._
import scala.collection.mutable

import graft.model.Triple

/** S1 — JSON-LD subset parser (the dialect of the reference's sample
  * corpus, e.g. `samples/rdf/sample_iot_ontology.jsonld`): a `@context`
  * map of prefix → namespace, nodes in `@graph` (or a single node / array)
  * with `@id`, `@type`, and property keys that are prefixed names or full
  * IRIs; values may be strings (literals), `{"@id": ...}` references,
  * `{"@value": ..., "@type"/"@language": ...}` typed literals, nested node
  * objects, or arrays of any of those. Expansion/compaction beyond that
  * subset is out of scope.
  */
object JsonLdParser {

  private val mapper = new ObjectMapper()

  def parse(content: String): Seq[Triple] = {
    val root = mapper.readTree(content)
    val ctx = parseContext(root)
    val nodes: Seq[JsonNode] =
      if (root.has("@graph")) root.get("@graph").elements().asScala.toSeq
      else if (root.isArray) root.elements().asScala.toSeq
      else Seq(root)
    val out = mutable.ArrayBuffer[Triple]()
    var bnodeCounter = 0
    def freshBnode(): String = { bnodeCounter += 1; s"_:jb$bnodeCounter" }

    def expand(term: String): String = {
      if (term.startsWith("http://") || term.startsWith("https://") ||
          term.startsWith("urn:")) term
      else {
        val i = term.indexOf(':')
        if (i > 0) ctx.get(term.substring(0, i))
          .map(_ + term.substring(i + 1)).getOrElse(term)
        else ctx.get(term).getOrElse(ctx.getOrElse("@vocab", "") + term)
      }
    }

    def nodeId(n: JsonNode): (String, String) =
      Option(n.get("@id")).map(_.asText) match {
        case Some(id) if id.startsWith("_:") => (id, "bnode")
        case Some(id) => (expand(id), "uri")
        case None => (freshBnode(), "bnode")
      }

    def emitNode(n: JsonNode): (String, String) = {
      val (subj, subjKind) = nodeId(n)
      // @type: string or array
      Option(n.get("@type")).foreach { t =>
        val types = if (t.isArray) t.elements().asScala.map(_.asText).toSeq
          else Seq(t.asText)
        types.foreach(tp =>
          out += Triple(subj, Vocab.RdfType, expand(tp), "uri", None, None))
      }
      for (entry <- n.properties().asScala
           if !entry.getKey.startsWith("@")) {
        val pred = expand(entry.getKey)
        val v = entry.getValue
        val values = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
        for (value <- values) {
          if (value.isObject) {
            if (value.has("@value")) {
              val langTag = Option(value.get("@language")).map(_.asText)
              val dt = Option(value.get("@type")).map(t => expand(t.asText))
                .orElse(if (langTag.isDefined)
                  Some(Vocab.RDF + "langString") else Some(Vocab.XSD + "string"))
              out += Triple(subj, pred, value.get("@value").asText, "literal",
                dt, None, if (dt.contains(Vocab.RDF + "langString")) langTag else None)
            } else if (value.has("@id") && value.size() == 1) {
              val (o, k) = nodeId(value)
              out += Triple(subj, pred, o, k, None, None)
            } else {
              // nested node object: emit it, reference it
              val (o, k) = emitNode(value)
              out += Triple(subj, pred, o, k, None, None)
            }
          } else if (value.isTextual) {
            out += Triple(subj, pred, value.asText, "literal",
              Some(Vocab.XSD + "string"), None)
          } else if (value.isBoolean) {
            out += Triple(subj, pred, value.asText, "literal",
              Some(Vocab.XSD + "boolean"), None)
          } else if (value.isIntegralNumber) {
            out += Triple(subj, pred, value.asText, "literal",
              Some(Vocab.XSD + "integer"), None)
          } else if (value.isNumber) {
            out += Triple(subj, pred, value.asText, "literal",
              Some(Vocab.XSD + "double"), None)
          }
        }
      }
      (subj, subjKind)
    }

    nodes.foreach(emitNode)
    out.toSeq
  }

  private def parseContext(root: JsonNode): Map[String, String] = {
    Option(root.get("@context")) match {
      case Some(c) if c.isObject =>
        c.properties().asScala
          .filter(_.getValue.isTextual)
          .map(e => e.getKey -> e.getValue.asText).toMap
      case _ => Map.empty
    }
  }
}
