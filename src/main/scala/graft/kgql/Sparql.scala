package graft.kgql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Minimal SPARQL front end for [[Bgp]] — the textual face of the
  * pattern-scan layer (the reference exposes its triple scans only as
  * Python internals; a query language is the generalized form).
  *
  * Grammar (whitespace-separated tokens; '.' separators optional):
  * {{{
  * query    := SELECT DISTINCT? ?var+ WHERE { item* }
  * item     := triple '.'? | FILTER ( expr ) | OPTIONAL { item* }
  * triple   := term term '+'? term    -- `<p>+` = bounded property path
  * term     := ?name | <iri> | "literal"
  * expr     := operand op operand        op ∈ { = != < <= > >= }
  * }}}
  * OPTIONAL blocks nest one level (SPARQL's common case); FILTERs inside
  * an OPTIONAL bind to that block, top-level FILTERs to the whole query.
  */
object Sparql {

  import Bgp._

  final case class Query(projection: Seq[String], distinct: Boolean,
      patterns: Seq[Pattern], optionals: Seq[OptionalBlock],
      filters: Seq[Column])

  /** Parse and evaluate against a (s, p, o) triple DataFrame.
    * `pathMaxHops` bounds `<p>+` property paths (SPARQL's unbounded `+`
    * needs a fixpoint; a hop bound keeps the Δ-BFS round count fixed —
    * raise it per query when the graph's diameter demands).
    */
  def query(triples: DataFrame, text: String,
      pathMaxHops: Int = 8): DataFrame = {
    val q = parse(text, pathMaxHops)
    Bgp.select(triples, q.patterns, q.projection, q.optionals, q.filters,
      q.distinct)
  }

  def parse(text: String, pathMaxHops: Int = 8): Query = {
    val toks = tokenize(text)
    val st = new Stream(toks)
    st.expectKw("SELECT")
    val distinct = st.peekKw("DISTINCT")
    if (distinct) st.next()
    val proj = scala.collection.mutable.ArrayBuffer[String]()
    while (st.peek.exists(_.startsWith("?"))) proj += st.next().drop(1)
    require(proj.nonEmpty, "SELECT needs at least one ?var")
    st.expectKw("WHERE")
    st.expect("{")
    val (pats, opts, fils) = parseBlock(st, allowOptional = true,
      pathMaxHops)
    st.expect("}")
    require(st.peek.isEmpty, s"trailing tokens: ${st.peek.getOrElse("")}")
    require(pats.nonEmpty, "WHERE block needs at least one triple pattern")
    Query(proj.toSeq, distinct, pats, opts, fils)
  }

  // ---------------------------------------------------------------- //

  private def parseBlock(st: Stream, allowOptional: Boolean,
      pathMaxHops: Int)
      : (Seq[Pattern], Seq[OptionalBlock], Seq[Column]) = {
    val pats = scala.collection.mutable.ArrayBuffer[Pattern]()
    val opts = scala.collection.mutable.ArrayBuffer[OptionalBlock]()
    val fils = scala.collection.mutable.ArrayBuffer[Column]()
    while (!st.peek.contains("}") && st.peek.nonEmpty) {
      if (st.peekKw("FILTER")) {
        st.next(); st.expect("(")
        fils += parseExpr(st)
        st.expect(")")
      } else if (st.peekKw("OPTIONAL")) {
        require(allowOptional, "nested OPTIONAL is not supported")
        st.next(); st.expect("{")
        val (p, o, f) = parseBlock(st, allowOptional = false, pathMaxHops)
        require(o.isEmpty, "nested OPTIONAL is not supported")
        require(p.nonEmpty, "OPTIONAL block needs a triple pattern")
        st.expect("}")
        opts += OptionalBlock(p, f)
      } else {
        val subj = parseTerm(st)
        val pred = parseTerm(st)
        if (st.peek.contains("+")) {
          st.next()
          pred match {
            case C(iri) =>
              pats += PathPattern(subj, iri, parseTerm(st), pathMaxHops)
            case V(_) => throw new IllegalArgumentException(
              "property-path predicate must be an IRI, not a variable")
          }
        } else pats += TriplePattern(subj, pred, parseTerm(st))
        if (st.peek.contains(".")) st.next()
      }
    }
    (pats.toSeq, opts.toSeq, fils.toSeq)
  }

  private def parseTerm(st: Stream): Term = {
    val t = st.next()
    if (t.startsWith("?")) V(t.drop(1))
    else if (t.startsWith("<") && t.endsWith(">")) C(t.drop(1).dropRight(1))
    else if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2)
      C(t.drop(1).dropRight(1))
    else throw new IllegalArgumentException(s"bad term: $t")
  }

  private def parseExpr(st: Stream): Column = {
    def operand(): Either[String, String] = parseTerm(st) match {
      case V(n) => Left(n)
      case C(v) => Right(v)
    }
    val l = operand()
    val op = st.next()
    val r = operand()
    def c(x: Either[String, String]): Column =
      x.fold(col, lit)
    op match {
      case "=" => c(l) === c(r)
      case "!=" => c(l) =!= c(r)
      case "<" => c(l) < c(r)
      case "<=" => c(l) <= c(r)
      case ">" => c(l) > c(r)
      case ">=" => c(l) >= c(r)
      case other => throw new IllegalArgumentException(s"bad op: $other")
    }
  }

  /** IRIs and quoted literals are single tokens; braces/parens/dot and
    * comparison operators are their own tokens.
    */
  private[kgql] def tokenize(text: String): Seq[String] = {
    // IRIs contain no whitespace — otherwise `?a < ?b ... ?c > ?d`
    // would tokenize as one giant <...> span
    val re = "<[^>\\s]*>|\"[^\"]*\"|\\?[A-Za-z_][A-Za-z0-9_]*|[{}().+]|!=|<=|>=|[=<>]|[A-Za-z_][A-Za-z0-9_]*".r
    re.findAllIn(text).toSeq
  }

  private final class Stream(toks: Seq[String]) {
    private var i = 0
    def peek: Option[String] = if (i < toks.length) Some(toks(i)) else None
    def peekKw(kw: String): Boolean =
      peek.exists(_.equalsIgnoreCase(kw))
    def next(): String = {
      require(i < toks.length, "unexpected end of query")
      val t = toks(i); i += 1; t
    }
    def expect(t: String): Unit = {
      val got = next()
      require(got == t, s"expected '$t', got '$got'")
    }
    def expectKw(kw: String): Unit = {
      val got = next()
      require(got.equalsIgnoreCase(kw), s"expected '$kw', got '$got'")
    }
  }
}
