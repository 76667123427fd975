package graft.kgql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Minimal SPARQL front end for [[Bgp]] — the textual face of the
  * pattern-scan layer (the reference exposes its triple scans only as
  * Python internals; a query language is the generalized form).
  *
  * Grammar (whitespace-separated tokens; '.' separators optional):
  * {{{
  * query    := select | construct | ask | describe
  * select   := SELECT DISTINCT? selItem+ WHERE { item* }
  *             group? order? ( LIMIT k | OFFSET n )*
  * construct:= CONSTRUCT { (term term term '.'?)* } WHERE { item* }
  * ask      := ASK WHERE? { item* }          -- 1-row boolean result
  * describe := DESCRIBE <iri>+               -- graph about resources
  *           | DESCRIBE ?var WHERE { item* }
  * selItem  := ?var | ( AGG ( DISTINCT? ?var | * ) AS ?name )
  * group    := GROUP BY ?var+ having?
  *             AGG ∈ { COUNT MIN MAX SUM AVG SAMPLE GROUP_CONCAT }
  * having   := HAVING ( ?var op int )       -- ?var an aggregate alias
  * order    := ORDER BY ( ?var | ASC ( ?var ) | DESC ( ?var ) )+
  * item     := triple '.'? | FILTER ( expr ) | OPTIONAL { item* }
  *           | FILTER NOT EXISTS { item* } | FILTER EXISTS { item* }
  *           | MINUS { item* }
  *           | BIND ( bexpr AS ?var )
  *           | VALUES ?var { const* }
  *           | VALUES ( ?var+ ) { ( const+ )* }
  *           | { item* } UNION { item* } ( UNION { item* } )*
  *           | { select }                    -- subquery (derived table)
  *           | GRAPH ( <iri> | ?g ) { (triple '.'?)* FILTER?* }
  *             -- named graphs (quad datasets only: use queryQuads)
  * bexpr    := CONCAT ( term+ ) | STRLEN ( ?var ) | term
  *           | IF ( expr term term ) | COALESCE ( term+ )
  * triple   := term path? term               -- path in predicate position
  * path     := pseq ('|' pseq)*              -- alternation (bag union)
  * pseq     := pelt ('/' pelt)*              -- sequence (bag join)
  * pelt     := '^'? prim ('+'|'*'|'?')?      -- inverse / closures
  * prim     := <iri> | ( path )              -- negated property set:
  *           | '!' <iri> | '!' ( <iri> ('|' <iri>)* )
  * term     := ?name | <iri> | "literal"
  * expr     := operand op operand        op ∈ { = != < <= > >= }
  *           | STRFN ( ?var "literal" )
  *             STRFN ∈ { STRSTARTS STRENDS CONTAINS REGEX }
  *           | BOUND ( ?var ) | ! BOUND ( ?var )
  * operand  := ?name | <iri> | "literal" | integer
  * }}}
  * A bare integer operand makes the comparison NUMERIC (SPARQL's
  * xsd:integer ordering): the other side's bindings go through
  * `try_cast` to BIGINT, so a non-numeric binding becomes unbound and
  * the filter drops the row — the engine's lenient form of SPARQL's
  * type error → false rule. Quoted literals and IRIs keep plain
  * string ordering. BOUND/!BOUND test null-ness of an OPTIONAL
  * binding (isNotNull/isNull — SPARQL's bound()).
  * Path operators follow SPARQL 1.1's translation: `^` `/` `|` rewrite
  * to joins/unions and keep BAG semantics; `+` is the set-semantic
  * bounded closure (Δ-BFS, [[PropertyPath]]). Aggregates follow SPARQL
  * semantics: COUNT(?v) counts bound (non-null) rows, COUNT(*) all
  * rows; every projected non-aggregate variable must be grouped.
  * SUM/AVG follow SPARQL's numeric-literal semantics restricted to
  * integers: the argument variable's bindings cast to BIGINT (non-numeric
  * bindings become unbound and are skipped, the engine's lenient form of
  * SPARQL's type error); AVG returns a double. HAVING filters the
  * aggregated rows by one integer comparison on an aggregate alias.
  * GROUP_CONCAT returns the group's bindings joined on "," in a PINNED
  * sorted order (the spec leaves element order implementation-defined;
  * sorting makes results deterministic and replayable across engines).
  * SAMPLE is likewise pinned to the group minimum — the spec allows any
  * element, determinism demands a canonical one (and MIN is the one
  * choice that stays partitioning-invariant AND map-side combines).
  * Subqueries (`{ SELECT ... }` inside a group) follow the spec's
  * bottom-up evaluation: each evaluates independently against the
  * graph, then joins into the enclosing group on its projected shared
  * variables ([[Bgp.select]]'s `derived` tables). DESCRIBE returns the
  * symmetric concise description — every triple whose subject OR object
  * is a described resource — as one predicate-pushed scan for constant
  * IRIs, or two semi-joins against the deduplicated bindings of the
  * described variable.
  * OPTIONAL blocks nest one level (SPARQL's common case); FILTERs inside
  * an OPTIONAL bind to that block, top-level FILTERs to the whole query.
  * Negation compiles to LEFT ANTI joins on the shared variables, with
  * the spec's disjoint-domain split: NOT EXISTS drops everything when
  * the inner pattern matches at all, MINUS drops nothing — see
  * [[Bgp.NegationBlock]]. FILTER EXISTS is its positive dual (LEFT SEMI,
  * [[Bgp.ExistsBlock]]); BIND extends solutions with a computed column
  * ([[Bgp.BindClause]], parse-time in-scope check).
  */
object Sparql {

  import Bgp._

  final case class Agg(fn: String, arg: Option[String],
      isDistinct: Boolean, as: String)

  final case class Query(projection: Seq[String], distinct: Boolean,
      patterns: Seq[Pattern], optionals: Seq[OptionalBlock],
      filters: Seq[Column], aggs: Seq[Agg] = Nil,
      groupVars: Seq[String] = Nil,
      template: Seq[(Term, Term, Term)] = Nil,
      negations: Seq[NegationBlock] = Nil,
      valuesBlocks: Seq[ValuesBlock] = Nil,
      orderBy: Seq[(String, Boolean)] = Nil,
      limit: Option[Int] = None,
      unions: Seq[UnionBlock] = Nil,
      having: Option[Column] = None,
      offset: Option[Int] = None,
      isAsk: Boolean = false,
      existsBlocks: Seq[ExistsBlock] = Nil,
      binds: Seq[BindClause] = Nil,
      subqueries: Seq[Query] = Nil,
      isDescribe: Boolean = false,
      describeIris: Seq[String] = Nil,
      graphs: Seq[GraphBlock] = Nil)

  /** Parse and evaluate against a (s, p, o) triple DataFrame.
    * `pathMaxHops` bounds `+` property-path closures (SPARQL's unbounded
    * `+` needs a fixpoint; a hop bound keeps the Δ-BFS round count
    * fixed — raise it per query when the graph's diameter demands).
    */
  def query(triples: DataFrame, text: String,
      pathMaxHops: Int = 8): DataFrame =
    evalParsed(triples, parse(text, pathMaxHops), None)

  /** Parse and evaluate against a (g, s, p, o) QUAD DataFrame — the
    * named-graph dataset form. `GRAPH <iri> { ... }` / `GRAPH ?g
    * { ... }` blocks evaluate against the quads ([[Bgp.graphBlock]]);
    * patterns OUTSIDE any GRAPH block match the union default graph
    * (all quads with `g` projected away — the RDF-dataset configuration
    * most stores ship for web-corpus workloads, where per-source graphs
    * partition one logical web graph).
    */
  def queryQuads(quads: DataFrame, text: String,
      pathMaxHops: Int = 8): DataFrame = {
    val triples = quads.select(col("s"), col("p"), col("o"))
    evalParsed(triples, parse(text, pathMaxHops), Some(quads))
  }

  /** Evaluate a parsed [[Query]]. Subqueries evaluate first (recursively
    * through this method) and join in as derived tables.
    */
  private def evalParsed(triples: DataFrame, q: Query,
      quads: Option[DataFrame]): DataFrame = {
    // GRAPH blocks evaluate bottom-up like subqueries and join into the
    // enclosing group as derived solution sets (shared-variable inner
    // joins — including the graph variable when it is shared)
    val graphDerived = q.graphs.map { gb =>
      val qd = quads.getOrElse(throw new IllegalArgumentException(
        "GRAPH patterns need a quad dataset — use Sparql.queryQuads"))
      Bgp.graphBlock(qd, gb)
    }
    val derived =
      q.subqueries.map(sq => evalParsed(triples, sq, quads)) ++
        graphDerived
    if (q.isDescribe) {
      // DESCRIBE: the symmetric concise description of the resource set
      // R — triples with subject or object in R, as a distinct graph.
      // Constant IRIs compile to isin filters Catalyst pushes into the
      // scan (ONE corpus pass, no join); a described variable's R is
      // the deduplicated solution column, applied via two LEFT SEMI
      // joins (s-side, o-side) whose union is the description.
      import org.apache.spark.sql.functions.col
      val spo = triples.select(col("s"), col("p"), col("o"))
      val described: DataFrame =
        if (q.describeIris.nonEmpty)
          spo.filter(col("s").isin(q.describeIris: _*) ||
            col("o").isin(q.describeIris: _*))
        else {
          val v = q.projection.head
          val r = Bgp.select(triples, q.patterns, Seq(v), q.optionals,
            q.filters, distinct = true, negations = q.negations,
            values = q.valuesBlocks, unions = q.unions,
            exists = q.existsBlocks, binds = q.binds, derived = derived)
            .withColumnRenamed(v, "r")
          spo.join(r, col("s") === col("r"), "left_semi")
            .union(spo.join(r, col("o") === col("r"), "left_semi"))
        }
      return described.distinct()
    }
    if (q.isAsk) {
      // ASK: does the pattern match at all — LocalLimit(1) under a
      // 1-row count lets the scan short-circuit on the first match
      // instead of materializing the whole solution bag.
      val vars = (q.patterns.flatMap(_.vars) ++
        q.unions.flatMap(_.vars) ++
        q.subqueries.flatMap(_.projection) ++
        q.graphs.flatMap(_.vars)).distinct
      require(vars.nonEmpty, "ASK needs at least one variable pattern")
      val bag = Bgp.select(triples, q.patterns, Seq(vars.head),
        q.optionals, q.filters, distinct = false, negations = q.negations,
        values = q.valuesBlocks, unions = q.unions,
        exists = q.existsBlocks, binds = q.binds, derived = derived)
      return bag.limit(1).agg((count(lit(1)) > 0).as("ask"))
    }
    if (q.template.nonEmpty) {
      // CONSTRUCT: instantiate each template triple over the match bag,
      // drop instantiations with an unbound (null) variable (SPARQL's
      // rule for optionals in templates), and set-union — the output is
      // an RDF GRAPH, i.e. a distinct triple set. Plan shape: the WHERE
      // bag materializes once; each template head is a projection over
      // it; the final distinct is one hash aggregation keyed on
      // (s, p, o) — output ∝ emitted graph, not ∝ match bag.
      val needed = q.template.flatMap { case (s, p, o) =>
        Seq(s, p, o).collect { case V(n) => n }
      }.distinct
      val bag = Bgp.select(triples, q.patterns, needed, q.optionals,
        q.filters, distinct = false, negations = q.negations,
        values = q.valuesBlocks, unions = q.unions,
        exists = q.existsBlocks, binds = q.binds, derived = derived)
      def term(t: Term): Column = t match {
        case V(n) => col(n)
        case C(v) => lit(v)
      }
      val parts = q.template.map { case (s, p, o) =>
        val vars = Seq(s, p, o).collect { case V(n) => n }.distinct
        vars.foldLeft(bag)((df, v) => df.filter(col(v).isNotNull))
          .select(term(s).as("s"), term(p).as("p"), term(o).as("o"))
      }
      parts.reduce(_.union(_)).distinct()
    } else if (q.aggs.isEmpty)
      modifiers(q, Bgp.select(triples, q.patterns, q.projection,
        q.optionals, q.filters, q.distinct, q.negations, q.valuesBlocks,
        q.unions, q.existsBlocks, q.binds, derived))
    else {
      // aggregate query: materialize the bag of (group vars ∪ agg arg
      // vars), then ONE hash aggregation keyed on the group vars —
      // map-side partial aggregation bounds the shuffle by the group
      // cardinality, not the bag size
      val needed = (q.groupVars ++ q.aggs.flatMap(_.arg)).distinct
      val bag = Bgp.select(triples, q.patterns, needed, q.optionals,
        q.filters, distinct = false, negations = q.negations,
        values = q.valuesBlocks, unions = q.unions,
        exists = q.existsBlocks, binds = q.binds, derived = derived)
      val aggCols = q.aggs.map { a =>
        val c = (a.fn, a.arg) match {
          case ("COUNT", None) => count(lit(1))
          case ("COUNT", Some(v)) =>
            if (a.isDistinct) countDistinct(col(v)) else count(col(v))
          case ("MIN", Some(v)) => min(col(v))
          case ("MAX", Some(v)) => max(col(v))
          // SAMPLE pinned to MIN: the spec allows any group element;
          // the minimum is deterministic, partitioning-invariant and
          // map-side combinable (first()/any_value() are none of these)
          case ("SAMPLE", Some(v)) => min(col(v))
          // try_cast, not cast: under ANSI a non-numeric literal must
          // become unbound (skipped), not fail the query — the engine's
          // lenient form of SPARQL's aggregate type error
          case ("SUM", Some(v)) => sum(col(v).try_cast("long"))
          case ("AVG", Some(v)) => avg(col(v).try_cast("long"))
          // GROUP_CONCAT with a PINNED deterministic order (the spec
          // leaves element order implementation-defined; sorting makes
          // the result replayable): sort the collected bag, join on ","
          case ("GROUP_CONCAT", Some(v)) =>
            val bagc = if (a.isDistinct) collect_set(col(v))
              else collect_list(col(v))
            array_join(array_sort(bagc), ",")
          case (fn, arg) => throw new IllegalArgumentException(
            s"unsupported aggregate: $fn(${arg.getOrElse("*")})")
        }
        c.as(a.as)
      }
      val grouped = bag.groupBy(q.groupVars.map(col): _*)
        .agg(aggCols.head, aggCols.tail: _*)
      val had = q.having.map(grouped.filter).getOrElse(grouped)
      val projected = had.select(q.projection.map(col): _*)
      modifiers(q, if (q.distinct) projected.distinct() else projected)
    }
  }

  /** Solution modifiers: ORDER BY, then OFFSET, then LIMIT (SPARQL
    * applies OFFSET before LIMIT regardless of clause order). An
    * ordered limit plans as TakeOrderedAndProject — per-partition
    * bounded top-k heaps merged on the driver, no global sort
    * materialization; with OFFSET the heaps are offset+limit deep.
    */
  private def modifiers(q: Query, df: DataFrame): DataFrame = {
    val ordered = if (q.orderBy.isEmpty) df
      else df.orderBy(q.orderBy.map { case (v, asc) =>
        if (asc) col(v).asc else col(v).desc }: _*)
    val skipped = q.offset.map(ordered.offset).getOrElse(ordered)
    q.limit.map(skipped.limit).getOrElse(skipped)
  }

  def parse(text: String, pathMaxHops: Int = 8): Query = {
    val toks = tokenize(text)
    val st = new Stream(toks)
    if (st.peekKw("CONSTRUCT")) return parseConstruct(st, pathMaxHops)
    if (st.peekKw("ASK")) return parseAsk(st, pathMaxHops)
    if (st.peekKw("DESCRIBE")) return parseDescribe(st, pathMaxHops)
    parseSelect(st, pathMaxHops) // checks trailing tokens (nested=false)
  }

  /** One SELECT query; when `nested` (a `{ SELECT ... }` subquery) the
    * parse stops at the group's closing brace instead of requiring
    * end-of-input.
    */
  private def parseSelect(st: Stream, pathMaxHops: Int,
      nested: Boolean = false): Query = {
    st.expectKw("SELECT")
    val distinct = st.peekKw("DISTINCT")
    if (distinct) st.next()
    val proj = scala.collection.mutable.ArrayBuffer[String]()
    val aggs = scala.collection.mutable.ArrayBuffer[Agg]()
    var more = true
    while (more) {
      if (st.peek.exists(_.startsWith("?"))) proj += st.next().drop(1)
      else if (st.peek.contains("(")) {
        st.next()
        val fn = st.next().toUpperCase
        require(
          Set("COUNT", "MIN", "MAX", "SUM", "AVG", "SAMPLE",
            "GROUP_CONCAT")(fn),
          s"bad aggregate fn: $fn")
        st.expect("(")
        val isDistinct = st.peekKw("DISTINCT")
        if (isDistinct) st.next()
        val arg = if (st.peek.contains("*")) { st.next(); None }
          else Some(st.next() match {
            case v if v.startsWith("?") => v.drop(1)
            case other => throw new IllegalArgumentException(
              s"aggregate arg must be ?var or *, got $other")
          })
        require(arg.nonEmpty || fn == "COUNT", s"$fn(*) is not valid")
        st.expect(")")
        st.expectKw("AS")
        val as = st.next()
        require(as.startsWith("?"), s"AS needs a ?name, got $as")
        st.expect(")")
        aggs += Agg(fn, arg, isDistinct, as.drop(1))
        proj += as.drop(1)
      } else more = false
    }
    require(proj.nonEmpty, "SELECT needs at least one ?var")
    st.expectKw("WHERE")
    st.expect("{")
    val blk = parseBlock(st, allowOptional = true, pathMaxHops)
    val Block(pats, opts, fils, negs, vals, unis, exs, binds, subs,
      graphs) = blk
    // BIND in-scope rule: each expression variable must be bound by the
    // group's patterns/unions/values/subqueries or an earlier BIND; the
    // bound name must be fresh (SPARQL forbids rebinding an in-scope var)
    locally {
      val baseVars = scala.collection.mutable.Set[String]()
      baseVars ++= pats.flatMap(_.vars)
      baseVars ++= unis.flatMap(_.vars)
      baseVars ++= vals.flatMap(_.vars)
      baseVars ++= opts.flatMap(_.patterns.flatMap(_.vars))
      baseVars ++= subs.flatMap(_.projection)
      baseVars ++= graphs.flatMap(_.vars)
      binds.foreach { b =>
        val missing = b.needs.filterNot(baseVars)
        require(missing.isEmpty,
          s"BIND reads unbound vars: ${missing.mkString(", ")}")
        require(!baseVars(b.name), s"BIND rebinds in-scope var ?${b.name}")
        baseVars += b.name
      }
    }
    st.expect("}")
    val groupVars = scala.collection.mutable.ArrayBuffer[String]()
    if (st.peekKw("GROUP")) {
      st.next(); st.expectKw("BY")
      while (st.peek.exists(_.startsWith("?")))
        groupVars += st.next().drop(1)
      require(groupVars.nonEmpty, "GROUP BY needs at least one ?var")
    }
    var having: Option[Column] = None
    if (st.peekKw("HAVING")) {
      require(groupVars.nonEmpty, "HAVING without GROUP BY")
      st.next(); st.expect("(")
      val v = st.next()
      require(v.startsWith("?"), s"HAVING needs a ?alias, got $v")
      require(aggs.exists(_.as == v.drop(1)),
        s"HAVING var must be an aggregate alias: $v")
      val op = st.next()
      val n = st.next()
      require(n.forall(_.isDigit), s"HAVING needs an integer bound, got $n")
      val c = col(v.drop(1)); val b = lit(n.toLong)
      having = Some(op match {
        case "=" => c === b
        case "!=" => c =!= b
        case "<" => c < b
        case "<=" => c <= b
        case ">" => c > b
        case ">=" => c >= b
        case other => throw new IllegalArgumentException(
          s"bad HAVING op: $other")
      })
      st.expect(")")
    }
    val orderBy = scala.collection.mutable.ArrayBuffer[(String, Boolean)]()
    if (st.peekKw("ORDER")) {
      st.next(); st.expectKw("BY")
      var going = true
      while (going) {
        if (st.peek.exists(_.startsWith("?")))
          orderBy += ((st.next().drop(1), true))
        else if (st.peekKw("ASC") || st.peekKw("DESC")) {
          val asc = st.next().equalsIgnoreCase("ASC")
          st.expect("(")
          val v = st.next()
          require(v.startsWith("?"), s"ORDER BY needs a ?var, got $v")
          st.expect(")")
          orderBy += ((v.drop(1), asc))
        } else going = false
      }
      require(orderBy.nonEmpty, "ORDER BY needs at least one sort key")
      val missing = orderBy.map(_._1).filterNot(proj.contains)
      require(missing.isEmpty,
        s"ORDER BY vars must be projected: ${missing.mkString(", ")}")
    }
    var limit: Option[Int] = None
    var offset: Option[Int] = None
    while (st.peekKw("LIMIT") || st.peekKw("OFFSET")) {
      val kw = st.next().toUpperCase
      val k = st.next()
      require(k.forall(_.isDigit), s"$kw needs a number, got $k")
      if (kw == "LIMIT") {
        require(limit.isEmpty, "duplicate LIMIT"); limit = Some(k.toInt)
      } else {
        require(offset.isEmpty, "duplicate OFFSET"); offset = Some(k.toInt)
      }
    }
    if (!nested)
      require(st.peek.isEmpty,
        s"trailing tokens: ${st.peek.getOrElse("")}")
    require(pats.nonEmpty || unis.nonEmpty || subs.nonEmpty ||
      graphs.nonEmpty,
      "WHERE block needs at least one triple pattern or subquery")
    if (aggs.nonEmpty || groupVars.nonEmpty) {
      require(aggs.nonEmpty, "GROUP BY without an aggregate in SELECT")
      val aggNames = aggs.map(_.as).toSet
      val bare = proj.filterNot(aggNames)
      val missing = bare.filterNot(groupVars.contains)
      require(missing.isEmpty,
        s"projected non-aggregate vars must be grouped: " +
          missing.mkString(", "))
    }
    Query(proj.toSeq, distinct, pats, opts, fils, aggs.toSeq,
      groupVars.toSeq, negations = negs, valuesBlocks = vals,
      orderBy = orderBy.toSeq, limit = limit, unions = unis,
      having = having, offset = offset, existsBlocks = exs,
      binds = binds, subqueries = subs, graphs = graphs)
  }

  /** DESCRIBE <iri>+ | DESCRIBE ?var WHERE { ... } — the graph about a
    * resource set (symmetric concise description, see [[evalParsed]]).
    */
  private def parseDescribe(st: Stream, pathMaxHops: Int): Query = {
    st.expectKw("DESCRIBE")
    if (st.peek.exists(_.startsWith("?"))) {
      val v = st.next().drop(1)
      st.expectKw("WHERE")
      st.expect("{")
      val b = parseBlock(st, allowOptional = true, pathMaxHops)
      st.expect("}")
      require(st.peek.isEmpty,
        s"trailing tokens: ${st.peek.getOrElse("")}")
      require(b.pats.nonEmpty || b.unis.nonEmpty || b.subs.nonEmpty ||
        b.graphs.nonEmpty,
        "DESCRIBE ?var needs at least one WHERE pattern")
      val inScope = (b.pats.flatMap(_.vars) ++ b.unis.flatMap(_.vars) ++
        b.vals.flatMap(_.vars) ++ b.subs.flatMap(_.projection) ++
        b.graphs.flatMap(_.vars)).toSet
      require(inScope(v), s"DESCRIBE var ?$v not bound in WHERE")
      Query(Seq(v), distinct = false, b.pats, b.opts, b.fils,
        negations = b.negs, valuesBlocks = b.vals, unions = b.unis,
        existsBlocks = b.exs, binds = b.binds, subqueries = b.subs,
        graphs = b.graphs,
        isDescribe = true)
    } else {
      val iris = scala.collection.mutable.ArrayBuffer[String]()
      while (st.peek.nonEmpty) parseTerm(st) match {
        case C(v) => iris += v
        case V(n) => throw new IllegalArgumentException(
          s"DESCRIBE takes IRIs or one leading ?var, got ?$n")
      }
      require(iris.nonEmpty, "DESCRIBE needs at least one IRI or ?var")
      Query(Nil, distinct = false, Nil, Nil, Nil,
        isDescribe = true, describeIris = iris.toSeq)
    }
  }

  /** ASK WHERE? { item* } — boolean pattern-existence form. */
  private def parseAsk(st: Stream, pathMaxHops: Int): Query = {
    st.expectKw("ASK")
    if (st.peekKw("WHERE")) st.next()
    st.expect("{")
    val Block(pats, opts, fils, negs, vals, unis, exs, binds, subs,
      graphs) = parseBlock(st, allowOptional = true, pathMaxHops)
    st.expect("}")
    require(st.peek.isEmpty, s"trailing tokens: ${st.peek.getOrElse("")}")
    require(pats.nonEmpty || unis.nonEmpty || subs.nonEmpty ||
      graphs.nonEmpty,
      "ASK block needs at least one triple pattern or subquery")
    Query(Seq("ask"), distinct = false, pats, opts, fils,
      negations = negs, valuesBlocks = vals, unions = unis, isAsk = true,
      existsBlocks = exs, binds = binds, subqueries = subs,
      graphs = graphs)
  }

  /** CONSTRUCT { tmplTriple* } WHERE { item* } — template triples are
    * plain terms (no paths); every template variable must occur in the
    * WHERE block (else it could never bind).
    */
  private def parseConstruct(st: Stream, pathMaxHops: Int): Query = {
    st.expectKw("CONSTRUCT")
    st.expect("{")
    val tmpl = scala.collection.mutable.ArrayBuffer[(Term, Term, Term)]()
    while (!st.peek.contains("}") && st.peek.nonEmpty) {
      tmpl += ((parseTerm(st), parseTerm(st), parseTerm(st)))
      if (st.peek.contains(".")) st.next()
    }
    st.expect("}")
    require(tmpl.nonEmpty, "CONSTRUCT needs at least one template triple")
    st.expectKw("WHERE")
    st.expect("{")
    val Block(pats, opts, fils, negs, vals, unis, exs, binds, subs,
      graphs) = parseBlock(st, allowOptional = true, pathMaxHops)
    st.expect("}")
    require(st.peek.isEmpty, s"trailing tokens: ${st.peek.getOrElse("")}")
    require(pats.nonEmpty || unis.nonEmpty || subs.nonEmpty ||
      graphs.nonEmpty,
      "WHERE block needs at least one triple pattern or subquery")
    val whereVars = (pats.flatMap(_.vars) ++
      opts.flatMap(_.patterns.flatMap(_.vars)) ++
      unis.flatMap(_.vars) ++ binds.map(_.name) ++
      subs.flatMap(_.projection) ++ graphs.flatMap(_.vars)).toSet
    val tmplVars = tmpl.flatMap { case (s, p, o) =>
      Seq(s, p, o).collect { case V(n) => n }
    }
    val unbound = tmplVars.filterNot(whereVars).distinct
    require(unbound.isEmpty,
      s"template vars not bound in WHERE: ${unbound.mkString(", ")}")
    Query(Seq("s", "p", "o"), distinct = true, pats, opts, fils,
      template = tmpl.toSeq, negations = negs, valuesBlocks = vals,
      unions = unis, existsBlocks = exs, binds = binds,
      subqueries = subs, graphs = graphs)
  }

  // ---------------------------------------------------------------- //

  /** The parsed contents of one `{ ... }` group. */
  private final case class Block(pats: Seq[Pattern],
      opts: Seq[OptionalBlock], fils: Seq[Column],
      negs: Seq[NegationBlock], vals: Seq[ValuesBlock],
      unis: Seq[UnionBlock], exs: Seq[ExistsBlock],
      binds: Seq[BindClause], subs: Seq[Query],
      graphs: Seq[GraphBlock])

  private def parseBlock(st: Stream, allowOptional: Boolean,
      pathMaxHops: Int): Block = {
    val pats = scala.collection.mutable.ArrayBuffer[Pattern]()
    val opts = scala.collection.mutable.ArrayBuffer[OptionalBlock]()
    val fils = scala.collection.mutable.ArrayBuffer[Column]()
    val negs = scala.collection.mutable.ArrayBuffer[NegationBlock]()
    val vals = scala.collection.mutable.ArrayBuffer[ValuesBlock]()
    val unis = scala.collection.mutable.ArrayBuffer[UnionBlock]()
    val exs = scala.collection.mutable.ArrayBuffer[ExistsBlock]()
    val binds = scala.collection.mutable.ArrayBuffer[BindClause]()
    val subs = scala.collection.mutable.ArrayBuffer[Query]()
    val graphs = scala.collection.mutable.ArrayBuffer[GraphBlock]()
    def innerBlock(kind: String): (Seq[Pattern], Seq[Column]) = {
      st.expect("{")
      val b = parseBlock(st, allowOptional = false, pathMaxHops)
      require(b.opts.isEmpty && b.negs.isEmpty && b.vals.isEmpty &&
        b.unis.isEmpty && b.exs.isEmpty && b.binds.isEmpty &&
        b.subs.isEmpty && b.graphs.isEmpty,
        s"nested blocks in $kind")
      require(b.pats.nonEmpty, s"$kind block needs a triple pattern")
      st.expect("}")
      (b.pats, b.fils)
    }
    def constValue(): String = parseTerm(st) match {
      case C(v) => v
      case V(n) => throw new IllegalArgumentException(
        s"VALUES entries must be constants, got ?$n")
    }
    while (!st.peek.contains("}") && st.peek.nonEmpty) {
      if (st.peekKw("FILTER")) {
        st.next()
        if (st.peekKw("NOT")) {
          require(allowOptional, "nested FILTER NOT EXISTS")
          st.next(); st.expectKw("EXISTS")
          val (p, f) = innerBlock("FILTER NOT EXISTS")
          negs += NegationBlock(p, f, isMinus = false)
        } else if (st.peekKw("EXISTS")) {
          require(allowOptional, "nested FILTER EXISTS")
          st.next()
          val (p, f) = innerBlock("FILTER EXISTS")
          exs += ExistsBlock(p, f)
        } else {
          st.expect("(")
          fils += parseExpr(st)
          st.expect(")")
        }
      } else if (st.peekKw("BIND")) {
        require(allowOptional, "nested BIND is not supported")
        st.next()
        st.expect("(")
        binds += parseBindExpr(st)
        st.expect(")")
      } else if (st.peek.contains("{") &&
          st.peekAt(1).exists(_.equalsIgnoreCase("SELECT"))) {
        // { SELECT ... } — subquery / derived table
        require(allowOptional, "nested subquery group")
        st.expect("{")
        subs += parseSelect(st, pathMaxHops, nested = true)
        st.expect("}")
      } else if (st.peek.contains("{")) {
        // { branch } UNION { branch } (UNION { branch })*
        require(allowOptional, "nested UNION group")
        val branches =
          scala.collection.mutable.ArrayBuffer(innerBlock("UNION"))
        st.expectKw("UNION")
        branches += innerBlock("UNION")
        while (st.peekKw("UNION")) { st.next()
          branches += innerBlock("UNION") }
        unis += UnionBlock(branches.toSeq)
      } else if (st.peekKw("VALUES")) {
        require(allowOptional, "nested VALUES is not supported")
        st.next()
        if (st.peek.contains("(")) { // multi-var row form
          st.next()
          val vs = scala.collection.mutable.ArrayBuffer[String]()
          while (st.peek.exists(_.startsWith("?"))) vs += st.next().drop(1)
          st.expect(")")
          st.expect("{")
          val rows = scala.collection.mutable.ArrayBuffer[Seq[String]]()
          while (st.peek.contains("(")) {
            st.next()
            rows += Seq.fill(vs.length)(constValue())
            st.expect(")")
          }
          st.expect("}")
          vals += ValuesBlock(vs.toSeq, rows.toSeq)
        } else { // single-var form
          val v = st.next()
          require(v.startsWith("?"), s"VALUES needs a ?var, got $v")
          st.expect("{")
          val rows = scala.collection.mutable.ArrayBuffer[Seq[String]]()
          while (!st.peek.contains("}") && st.peek.nonEmpty)
            rows += Seq(constValue())
          st.expect("}")
          vals += ValuesBlock(Seq(v.drop(1)), rows.toSeq)
        }
      } else if (st.peekKw("GRAPH")) {
        require(allowOptional, "nested GRAPH is not supported")
        st.next()
        val gterm = parseTerm(st)
        val (p, f) = innerBlock("GRAPH")
        val tps = p.map {
          case tp: TriplePattern => tp
          case other => throw new IllegalArgumentException(
            s"GRAPH blocks hold plain triple patterns, got $other")
        }
        graphs += GraphBlock(gterm, tps, f)
      } else if (st.peekKw("MINUS")) {
        require(allowOptional, "nested MINUS is not supported")
        st.next()
        val (p, f) = innerBlock("MINUS")
        negs += NegationBlock(p, f, isMinus = true)
      } else if (st.peekKw("OPTIONAL")) {
        require(allowOptional, "nested OPTIONAL is not supported")
        st.next()
        val (p, f) = innerBlock("OPTIONAL")
        opts += OptionalBlock(p, f)
      } else {
        val subj = parseTerm(st)
        if (st.peek.exists(_.startsWith("?"))) {
          // variable predicate: plain triple pattern only (a path with a
          // variable predicate would be a join over ALL predicates)
          pats += TriplePattern(subj, parseTerm(st), parseTerm(st))
        } else {
          val path = parsePath(st, pathMaxHops)
          val obj = parseTerm(st)
          path match {
            case Pred(iri) => pats += TriplePattern(subj, C(iri), obj)
            case p => pats += PathPattern(subj, p, obj)
          }
        }
        if (st.peek.contains(".")) st.next()
      }
    }
    Block(pats.toSeq, opts.toSeq, fils.toSeq, negs.toSeq, vals.toSeq,
      unis.toSeq, exs.toSeq, binds.toSeq, subs.toSeq, graphs.toSeq)
  }

  /** BIND ( expr AS ?var ): expr := CONCAT ( term+ ) | STRLEN ( ?v )
    * | term. CONCAT/STRLEN compile to the codegen'd concat/length
    * Columns; the needed variables are recorded for the parse-time
    * in-scope check.
    */
  private def parseBindExpr(st: Stream): BindClause = {
    val needs = scala.collection.mutable.ArrayBuffer[String]()
    def termCol(): Column = parseTerm(st) match {
      case V(n) => needs += n; col(n)
      case C(v) => lit(v)
    }
    val expr: Column =
      if (st.peekKw("CONCAT")) {
        st.next(); st.expect("(")
        val parts = scala.collection.mutable.ArrayBuffer(termCol())
        while (!st.peek.contains(")")) parts += termCol()
        st.expect(")")
        concat(parts.toSeq: _*)
      } else if (st.peekKw("STRLEN")) {
        st.next(); st.expect("(")
        val c = termCol()
        st.expect(")")
        length(c).cast("long")
      } else if (st.peekKw("IF")) {
        // IF ( expr term term ) — SPARQL's functional if: the condition
        // reuses the FILTER expression grammar (incl. BOUND and numeric
        // comparisons); an error-valued (null) condition yields the
        // else branch via when()'s otherwise, matching the spec's
        // effective-boolean-value-of-error → false
        st.next(); st.expect("(")
        val cond = parseExpr(st, needs)
        val thenC = termCol()
        val elseC = termCol()
        st.expect(")")
        when(cond, thenC).otherwise(elseC)
      } else if (st.peekKw("COALESCE")) {
        // COALESCE ( term+ ) — first bound (non-null) argument; the
        // standard OPTIONAL-default idiom
        st.next(); st.expect("(")
        val parts = scala.collection.mutable.ArrayBuffer(termCol())
        while (!st.peek.contains(")")) parts += termCol()
        st.expect(")")
        coalesce(parts.toSeq: _*)
      } else termCol()
    st.expectKw("AS")
    val v = st.next()
    require(v.startsWith("?"), s"BIND needs AS ?var, got $v")
    BindClause(v.drop(1), expr.as(v.drop(1)), needs.toSeq.distinct)
  }

  /** path := pseq ('|' pseq)* ; pseq := pelt ('/' pelt)* ;
    * pelt := '^'? prim '+'? ; prim := <iri> | "lit" | ( path ).
    * `^` applies to the modified primary (SPARQL: PathEltOrInverse ::=
    * PathElt | '^' PathElt), so `^<p>+` = inverse of the closure.
    */
  private def parsePath(st: Stream, maxHops: Int): PathExpr = {
    def iriOf(t: Term): String = t match {
      case C(iri) => iri
      case V(n) => throw new IllegalArgumentException(
        s"path step must be an IRI or group, got ?$n")
    }
    def prim(): PathExpr =
      if (st.peek.contains("!")) { // negated property set
        st.next()
        if (st.peek.contains("(")) {
          st.next()
          val preds = scala.collection.mutable.ArrayBuffer(
            iriOf(parseTerm(st)))
          while (st.peek.contains("|")) { st.next()
            preds += iriOf(parseTerm(st)) }
          st.expect(")")
          NegSet(preds.toSeq)
        } else NegSet(Seq(iriOf(parseTerm(st))))
      } else if (st.peek.contains("(")) {
        st.next()
        val p = alt()
        st.expect(")")
        p
      } else Pred(iriOf(parseTerm(st)))
    def elt(): PathExpr = {
      val inv = st.peek.contains("^")
      if (inv) st.next()
      var p = prim()
      if (st.peek.contains("+")) { st.next(); p = Plus(p, maxHops) }
      else if (st.peek.contains("*")) { st.next(); p = Star(p, maxHops) }
      else if (st.peek.contains("?")) { st.next(); p = Opt(p) }
      if (inv) Inv(p) else p
    }
    def seq(): PathExpr = {
      var p = elt()
      while (st.peek.contains("/")) { st.next(); p = PSeq(p, elt()) }
      p
    }
    def alt(): PathExpr = {
      var p = seq()
      while (st.peek.contains("|")) { st.next(); p = PAlt(p, seq()) }
      p
    }
    alt()
  }

  private def parseTerm(st: Stream): Term = {
    val t = st.next()
    if (t.startsWith("?")) V(t.drop(1))
    else if (t.startsWith("<") && t.endsWith(">")) C(t.drop(1).dropRight(1))
    else if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2)
      C(t.drop(1).dropRight(1))
    else throw new IllegalArgumentException(s"bad term: $t")
  }

  private sealed trait Operand
  private final case class OVar(n: String) extends Operand
  private final case class OStr(v: String) extends Operand
  private final case class ONum(v: Long) extends Operand

  /** FILTER / IF-condition expression. When `needs` is non-null every
    * variable the expression reads is appended (BIND's in-scope check).
    */
  private def parseExpr(st: Stream,
      needs: scala.collection.mutable.ArrayBuffer[String] = null)
      : Column = {
    def noteVar(n: String): String = {
      if (needs != null) needs += n
      n
    }
    def operand(): Operand =
      if (st.peek.exists(_.matches("-?[0-9]+")))
        ONum(st.next().toLong)
      else parseTerm(st) match {
        case V(n) => OVar(noteVar(n))
        case C(v) => OStr(v)
      }
    // BOUND ( ?v ) / ! BOUND ( ?v ): null test on an OPTIONAL binding
    if (st.peekKw("BOUND") ||
        (st.peek.contains("!") && st.peekAt(1).exists(
          _.equalsIgnoreCase("BOUND")))) {
      val negated = st.peek.contains("!")
      if (negated) st.next()
      st.next() // BOUND
      st.expect("(")
      val v = st.next()
      require(v.startsWith("?"), s"BOUND needs a ?var, got $v")
      st.expect(")")
      return if (negated) col(noteVar(v.drop(1))).isNull
        else col(noteVar(v.drop(1))).isNotNull
    }
    // string predicates: STRSTARTS/STRENDS/CONTAINS/REGEX ( ?v "lit" ) —
    // compile to startswith/endswith/contains/rlike, all codegen'd
    // Columns (REGEX uses Java regex semantics; oracles should prefer
    // the LIKE-translatable forms)
    if (st.peekKw("STRSTARTS") || st.peekKw("STRENDS") ||
        st.peekKw("CONTAINS") || st.peekKw("REGEX")) {
      val fn = st.next().toUpperCase
      st.expect("(")
      val v = st.next()
      require(v.startsWith("?"), s"$fn needs a ?var first, got $v")
      val arg = parseTerm(st) match {
        case C(s) => s
        case V(n) => throw new IllegalArgumentException(
          s"$fn needs a literal second argument, got ?$n")
      }
      st.expect(")")
      val c = col(noteVar(v.drop(1)))
      return fn match {
        case "STRSTARTS" => c.startsWith(arg)
        case "STRENDS" => c.endsWith(arg)
        case "CONTAINS" => c.contains(arg)
        case _ => c.rlike(arg)
      }
    }
    val l = operand()
    val op = st.next()
    val r = operand()
    // a bare-integer side makes the comparison numeric: the other
    // side's bindings try_cast to BIGINT (non-numeric → unbound →
    // row dropped, SPARQL's type-error→false)
    val numeric = l.isInstanceOf[ONum] || r.isInstanceOf[ONum]
    def c(x: Operand): Column = x match {
      case OVar(n) => if (numeric) col(n).try_cast("long") else col(n)
      case OStr(v) => lit(v)
      case ONum(v) => lit(v)
    }
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

  /** IRIs and quoted literals are single tokens; braces/parens/dot,
    * path operators and comparison operators are their own tokens.
    */
  private[kgql] def tokenize(text: String): Seq[String] = {
    // IRIs contain no whitespace — otherwise `?a < ?b ... ?c > ?d`
    // would tokenize as one giant <...> span
    // `!=` must precede the char class holding bare `!` (regex
    // alternation is ordered) or FILTER inequalities would split
    // integers may be signed: without the '-?' the tokenizer would
    // silently DROP the sign (unmatched chars are skipped) and
    // 'FILTER ( ?v > -5 )' would quietly become '?v > 5'
    val re = "<[^>\\s]*>|\"[^\"]*\"|\\?[A-Za-z_][A-Za-z0-9_]*|!=|<=|>=|-?[0-9]+|[{}().+|/^*!?]|[=<>]|[A-Za-z_][A-Za-z0-9_]*".r
    re.findAllIn(text).toSeq
  }

  private final class Stream(toks: Seq[String]) {
    private var i = 0
    def peek: Option[String] = if (i < toks.length) Some(toks(i)) else None
    def peekAt(k: Int): Option[String] =
      if (i + k < toks.length) Some(toks(i + k)) else None
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
