package graft.rdf

import scala.collection.mutable
import graft.model.Triple

/** S1 — RDF source parser, executor-side.
  *
  * The reference parses 11 serializations through rdflib
  * (`src/formats/rdf/rdf_parser.py:287-386`); this engine covers the
  * format matrix its samples exercise — Turtle, N3, N-Triples, N-Quads
  * (4th term → graph), TriG (named-graph blocks), JSON-LD (via
  * [[JsonLdParser]]) and RDF/XML (via [[RdfXmlParser]]) — as
  * dependency-free recursive-descent parsers, plus TriX ([[TrixParser]]),
  * HexTuples ([[HexTuplesParser]]), RDFa-lite ([[RdfaParser]]) and HTML
  * microdata ([[MicrodataParser]]) — all 11 of the reference's
  * serializations (the HTML-embedded pair on well-formed XHTML).
  * It is a pure `String => Seq[Triple]` function, so at scale it runs inside
  * `mapPartitions` over whole files (`spark.read.option("wholetext", true)`
  * or binaryFile), one document per task — embarrassingly parallel, no
  * driver involvement.
  *
  * Supported Turtle subset: `@prefix`/`@base`, prefixed names, `<uri>`,
  * `a`, `;` / `,` continuation, blank nodes `_:x` and `[ ... ]`,
  * collections `( ... )`, literals with `"…"`, `'''…'''`, language tags,
  * `^^` datatypes, numbers and booleans, and comments.
  */
object TurtleParser {

  final class ParseException(msg: String) extends RuntimeException(msg)

  def parseNTriples(content: String, graph: Option[String] = None): Seq[Triple] =
    content.linesIterator.zipWithIndex.flatMap { case (line, i) =>
      val t = line.trim
      if (t.isEmpty || t.startsWith("#")) None
      else Some(new Parser(t, Map.empty).parseNTripleLine(graph))
    }.toSeq

  def parseTurtle(content: String): Seq[Triple] = new Parser(content, Map.empty).parseDocument()

  /** S2 — format inference by extension with alias table
    * (`rdf_parser.py:208-278`).
    */
  def parse(content: String, format: String): Seq[Triple] =
    normalizeFormat(format) match {
      case "nt" | "nquads" => parseNTriples(content)
      case "turtle" | "n3" | "trig" => parseTurtle(content)
      case "jsonld" => JsonLdParser.parse(content)
      case "rdfxml" => RdfXmlParser.parse(content)
      case "trix" => TrixParser.parse(content)
      case "hext" => HexTuplesParser.parse(content)
      case "rdfa" => RdfaParser.parse(content)
      case "microdata" => MicrodataParser.parse(content)
      case other => throw new ParseException(s"unsupported RDF format: $other")
    }

  def normalizeFormat(fmt: String): String = {
    val f = fmt.toLowerCase.stripPrefix(".")
    Map(
      "ttl" -> "turtle", "turtle" -> "turtle", "n3" -> "n3",
      "nt" -> "nt", "ntriples" -> "nt", "n-triples" -> "nt",
      "nq" -> "nquads", "nquads" -> "nquads", "n-quads" -> "nquads",
      "trig" -> "trig", "nquad" -> "nquads",
      "trix" -> "trix", "hext" -> "hext", "hextuples" -> "hext",
      "rdfa" -> "rdfa", "html" -> "rdfa", "xhtml" -> "rdfa", "htm" -> "rdfa",
      "microdata" -> "microdata",
      "jsonld" -> "jsonld", "json-ld" -> "jsonld", "json" -> "jsonld",
      "json_ld" -> "jsonld",
      "rdf" -> "rdfxml", "xml" -> "rdfxml", "rdfxml" -> "rdfxml",
      "rdf-xml" -> "rdfxml", "owl" -> "rdfxml"
    ).getOrElse(f, f)
  }

  private val XsdString = Vocab.XSD + "string"

  private final class Parser(input: String, initialPrefixes: Map[String, String]) {
    private var pos = 0
    private val prefixes = mutable.Map[String, String](initialPrefixes.toSeq: _*)
    private var base = ""
    private var currentGraph: Option[String] = None
    private var bnodeCounter = 0
    private val out = mutable.ArrayBuffer[Triple]()

    private def freshBnode(): Node = { bnodeCounter += 1; Node(s"_:gen$bnodeCounter", "bnode", None) }

    private def fail(msg: String): Nothing =
      throw new ParseException(s"$msg at offset $pos: ...${input.slice(pos, pos + 40)}")

    private def skipWs(): Unit = {
      var go = true
      while (go && pos < input.length) {
        val c = input.charAt(pos)
        if (c == '#') { while (pos < input.length && input.charAt(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else go = false
      }
    }

    private def peek: Char = if (pos < input.length) input.charAt(pos) else '\u0000'
    private def eof: Boolean = { skipWs(); pos >= input.length }

    private def expect(c: Char): Unit = {
      skipWs()
      if (peek != c) fail(s"expected '$c'")
      pos += 1
    }

    private def tryConsume(s: String): Boolean = {
      skipWs()
      if (input.startsWith(s, pos)) { pos += s.length; true } else false
    }

    case class Node(value: String, kind: String, datatype: Option[String],
                    lang: Option[String] = None)

    def parseDocument(): Seq[Triple] = {
      while (!eof) {
        skipWs()
        if (tryConsume("@prefix") || tryConsume("PREFIX")) {
          skipWs()
          val name = readUntil(':'); expect(':')
          skipWs()
          val uri = readIriRef()
          prefixes(name.trim) = uri
          tryConsume(".")
        } else if (tryConsume("@base") || tryConsume("BASE")) {
          skipWs(); base = readIriRef(); tryConsume(".")
        } else if (tryConsume("GRAPH") || tryConsume("graph")) {
          val g = parseIriNode()
          parseGraphBlock(g.value)
        } else {
          skipWs()
          if (peek == '{') parseGraphBlock(null) // TriG default-graph block
          else {
            val s = parseSubject()
            skipWs()
            if (peek == '{') parseGraphBlock(s.value) // TriG named graph
            else { parsePredicateObjectList(s); expect('.') }
          }
        }
      }
      out.toSeq
    }

    /** TriG graph block: `<name> { stmt. stmt. }` — statements inside are
      * plain Turtle, tagged with the graph name.
      */
    private def parseGraphBlock(name: String): Unit = {
      expect('{')
      currentGraph = Option(name)
      skipWs()
      while (peek != '}' && pos < input.length) {
        val s = parseSubject()
        parsePredicateObjectList(s)
        tryConsume(".")
        skipWs()
      }
      expect('}')
      currentGraph = None
      tryConsume(".")
    }

    def parseNTripleLine(graph: Option[String]): Triple = {
      val s = parseSubject()
      skipWs()
      val p = parseIriNode()
      skipWs()
      val o = parseObject()
      skipWs()
      val g = if (peek == '<' || input.startsWith("_:", pos)) Some(parseSubject().value) else graph
      skipWs(); if (peek == '.') pos += 1
      Triple(s.value, p.value, o.value, o.kind, o.datatype, g, o.lang)
    }

    private def readUntil(c: Char): String = {
      val b = new StringBuilder
      while (pos < input.length && input.charAt(pos) != c) { b += input.charAt(pos); pos += 1 }
      b.toString
    }

    private def readIriRef(): String = {
      expect('<')
      val raw = readUntil('>')
      expect('>')
      val iri = unescape(raw)
      if (base.nonEmpty && !iri.contains(":")) base + iri else iri
    }

    private def unescape(s: String): String = {
      if (!s.contains('\\')) return s
      val b = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => b += '\n'; i += 2
            case 't' => b += '\t'; i += 2
            case 'r' => b += '\r'; i += 2
            case '"' => b += '"'; i += 2
            case '\'' => b += '\''; i += 2
            case '\\' => b += '\\'; i += 2
            case 'u' => b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
            case 'U' =>
              b.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16))); i += 10
            case other => b += other; i += 2
          }
        } else { b += c; i += 1 }
      }
      b.toString
    }

    private def isNameChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '-' || c == '.' || c == '%'

    private def readPrefixedName(): String = {
      skipWs()
      val b = new StringBuilder
      while (pos < input.length && isNameChar(input.charAt(pos))) { b += input.charAt(pos); pos += 1 }
      val prefix = b.toString
      expect(':')
      val l = new StringBuilder
      while (pos < input.length && isNameChar(input.charAt(pos))) { l += input.charAt(pos); pos += 1 }
      var local = l.toString
      // trailing '.' belongs to the statement terminator, not the name
      while (local.endsWith(".")) { local = local.dropRight(1); pos -= 1 }
      prefixes.get(prefix) match {
        case Some(ns) => ns + local
        case None => fail(s"unknown prefix '$prefix:'")
      }
    }

    private def parseIriNode(): Node = {
      skipWs()
      if (peek == '<') Node(readIriRef(), "uri", None)
      else Node(readPrefixedName(), "uri", None)
    }

    private def parseSubject(): Node = {
      skipWs()
      if (input.startsWith("_:", pos)) {
        pos += 2
        val b = new StringBuilder("_:")
        while (pos < input.length && isNameChar(input.charAt(pos))) { b += input.charAt(pos); pos += 1 }
        Node(b.toString, "bnode", None)
      } else if (peek == '[') parseBnodePropertyList()
      else if (peek == '(') parseCollection()
      else parseIriNode()
    }

    private def parsePredicate(): Node = {
      skipWs()
      if (peek == 'a' && pos + 1 < input.length && !isNameChar(input.charAt(pos + 1)) &&
          input.charAt(pos + 1) != ':') {
        pos += 1; Node(Vocab.RdfType, "uri", None)
      } else parseIriNode()
    }

    private def parseObject(): Node = {
      skipWs()
      peek match {
        case '"' | '\'' => parseLiteral()
        case '[' => parseBnodePropertyList()
        case '(' => parseCollection()
        case c if c.isDigit || c == '+' || c == '-' => parseNumeric()
        case _ =>
          if (input.startsWith("true", pos) && !isNameChar(charAt(pos + 4))) {
            pos += 4; Node("true", "literal", Some(Vocab.XSD + "boolean"))
          } else if (input.startsWith("false", pos) && !isNameChar(charAt(pos + 5))) {
            pos += 5; Node("false", "literal", Some(Vocab.XSD + "boolean"))
          } else parseSubject()
      }
    }

    private def charAt(i: Int): Char = if (i < input.length) input.charAt(i) else '\u0000'

    private def parseNumeric(): Node = {
      val b = new StringBuilder
      while (pos < input.length &&
             (input.charAt(pos).isDigit || "+-.eE".contains(input.charAt(pos)))) {
        b += input.charAt(pos); pos += 1
      }
      var lex = b.toString
      // trailing '.' is the statement terminator
      if (lex.endsWith(".") && !lex.dropRight(1).contains('.')) { lex = lex.dropRight(1); pos -= 1 }
      val dt =
        if (lex.contains('e') || lex.contains('E')) Vocab.XSD + "double"
        else if (lex.contains('.')) Vocab.XSD + "decimal"
        else Vocab.XSD + "integer"
      Node(lex, "literal", Some(dt))
    }

    private def parseLiteral(): Node = {
      skipWs()
      val quote = peek
      val lex =
        if (input.startsWith(s"$quote$quote$quote", pos)) {
          pos += 3
          val end = input.indexOf(s"$quote$quote$quote", pos)
          if (end < 0) fail("unterminated long literal")
          val s = input.substring(pos, end); pos = end + 3
          unescape(s)
        } else {
          pos += 1
          val b = new StringBuilder
          while (pos < input.length && input.charAt(pos) != quote) {
            if (input.charAt(pos) == '\\' && pos + 1 < input.length) { b += '\\'; b += input.charAt(pos + 1); pos += 2 }
            else { b += input.charAt(pos); pos += 1 }
          }
          expect(quote)
          unescape(b.toString)
        }
      if (tryConsume("^^")) {
        val dt = parseIriNode()
        Node(lex, "literal", Some(dt.value))
      } else if (peek == '@') {
        pos += 1
        val t = new StringBuilder
        while (pos < input.length && (input.charAt(pos).isLetterOrDigit || input.charAt(pos) == '-')) {
          t += input.charAt(pos); pos += 1
        }
        Node(lex, "literal", Some(Vocab.RDF + "langString"), Some(t.toString))
      } else Node(lex, "literal", Some(XsdString))
    }

    private def parseBnodePropertyList(): Node = {
      expect('[')
      val node = freshBnode()
      skipWs()
      if (peek != ']') parsePredicateObjectList(node)
      expect(']')
      node
    }

    private def parseCollection(): Node = {
      expect('(')
      val items = mutable.ArrayBuffer[Node]()
      skipWs()
      while (peek != ')') { items += parseObject(); skipWs() }
      expect(')')
      if (items.isEmpty) Node(Vocab.RdfNil, "uri", None)
      else {
        val cells = items.map(_ => freshBnode())
        for (i <- items.indices) {
          emit(cells(i), Node(Vocab.RdfFirst, "uri", None), items(i))
          val rest = if (i + 1 < items.size) cells(i + 1) else Node(Vocab.RdfNil, "uri", None)
          emit(cells(i), Node(Vocab.RdfRest, "uri", None), rest)
        }
        cells.head
      }
    }

    private def emit(s: Node, p: Node, o: Node): Unit =
      out += Triple(s.value, p.value, o.value, o.kind, o.datatype, currentGraph, o.lang)

    private def parsePredicateObjectList(subject: Node): Unit = {
      var go = true
      while (go) {
        val p = parsePredicate()
        var more = true
        while (more) {
          val o = parseObject()
          emit(subject, p, o)
          more = tryConsume(",")
        }
        skipWs()
        if (tryConsume(";")) {
          skipWs()
          go = peek != '.' && peek != ']' && peek != '}' && pos < input.length
        }
        else go = false
      }
    }

    private def parseTriplesBlock(): Unit = {
      val s = parseSubject()
      parsePredicateObjectList(s)
    }
  }

  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** Distributed file reader: whole files → per-file parse in mapPartitions
    * → triple table. Format per file from the extension (S2).
    */
  def readFiles(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.option("wholetext", "true")
      .text(path)
      .select(org.apache.spark.sql.functions.input_file_name().as("file"),
        org.apache.spark.sql.functions.col("value"))
      .as[(String, String)]
    files.mapPartitions(_.flatMap { case (file, content) =>
      val fmt = file.substring(file.lastIndexOf('.') + 1)
      parse(content, fmt)
    }).toDF()
  }
}
