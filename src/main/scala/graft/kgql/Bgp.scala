package graft.kgql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SPARQL-style basic-graph-pattern (BGP) compiler over a triple table.
  *
  * The reference is an RDF schema tool whose core dataflow is pattern
  * scans over a triple store (`/root/reference/src/formats/rdf/
  * rdf_converter.py:118-223` — `graph.triples((None, RDF.type, X))`
  * etc.). This module generalizes those fixed scans into a declarative
  * query layer: a conjunction of triple patterns with variables is
  * compiled to a tree of DataFrame equi-joins, so Catalyst plans the
  * physical strategy (hash join, broadcast, AQE skew handling) instead
  * of a hand-rolled nested loop.
  *
  * Compilation strategy (the part that matters at 100 TB):
  *  - each pattern becomes a scan of the triple table with its constant
  *    terms as `=` filters — Catalyst pushes these into the parquet scan
  *    (predicate pushdown), so a pattern bound on predicate+object reads
  *    a sliver of the corpus, never all of it;
  *  - patterns are greedily ordered by selectivity (number of bound
  *    constants), always preferring a pattern that shares a variable
  *    with what has already been joined — no accidental cartesians;
  *  - a pattern with ≥2 bound terms yields a dictionary-scale relation
  *    (e.g. "docs mentioning one given entity") and is hinted
  *    `broadcast(...)`, keeping the corpus-sized side shuffle-free;
  *  - OPTIONAL blocks compile to left joins after the required block;
  *  - FILTERs are plain `Column`s appended at the top — Catalyst pushes
  *    them down through the joins where legal.
  *
  * SPARQL subset semantics: bag semantics unless `distinct`; a FILTER
  * referencing an unbound (null) optional variable eliminates the row,
  * matching SPARQL's error→false filter rule.
  */
object Bgp {

  /** A term of a triple pattern: variable or constant (IRI/literal). */
  sealed trait Term
  final case class V(name: String) extends Term
  final case class C(value: String) extends Term

  /** A pattern in a BGP block: a plain triple pattern or a property
    * path (any [[PathExpr]] — `^` `/` `|` `!` and the bounded `+`).
    */
  sealed trait Pattern {
    def vars: Seq[String]
    def boundCount: Int
  }

  final case class TriplePattern(s: Term, p: Term, o: Term)
      extends Pattern {
    /** (triple-column, term) pairs. */
    def terms: Seq[(String, Term)] =
      Seq("s" -> s, "p" -> p, "o" -> o)
    def vars: Seq[String] = terms.collect { case (_, V(n)) => n }.distinct
    def boundCount: Int = terms.count(_._2.isInstanceOf[C])
  }

  /** SPARQL 1.1 property-path expression (the subset whose translation
    * is relational): `<p>`, inverse `^e`, sequence `a/b`, alternation
    * `a|b`, bounded closure `e+`. Per the spec's path translation,
    * `^` / `/` / `|` rewrite to triple patterns, joins and unions and so
    * keep BAG semantics (each distinct intermediate node = one row);
    * only the closure `+` is set-semantic (distinct reachable pairs,
    * min-hop witness via [[PropertyPath]]).
    */
  sealed trait PathExpr
  final case class Pred(iri: String) extends PathExpr
  final case class Inv(e: PathExpr) extends PathExpr
  final case class PSeq(a: PathExpr, b: PathExpr) extends PathExpr
  final case class PAlt(a: PathExpr, b: PathExpr) extends PathExpr
  final case class Plus(e: PathExpr, maxHops: Int) extends PathExpr {
    require(maxHops >= 1, "maxHops must be >= 1")
  }
  /** Zero-or-more `e*` = zero-length path ∪ bounded closure. Per the
    * spec a zero-length path matches EVERY term of the graph to itself
    * (with a constant source: that term unconditionally) — so a
    * var-var `*` materializes identity over distinct(s ∪ o) on top of
    * the all-pairs closure; bind the source on corpus-scale graphs.
    */
  final case class Star(e: PathExpr, maxHops: Int) extends PathExpr {
    require(maxHops >= 1, "maxHops must be >= 1")
  }
  /** Zero-or-one `e?` = zero-length path ∪ one step (set-semantic). */
  final case class Opt(e: PathExpr) extends PathExpr
  /** Negated property set `!<p>` / `!( <p> | <q> )`: any edge whose
    * predicate is outside the set (forward direction only — the
    * `!^` inverse members of the full spec are out of this subset).
    */
  final case class NegSet(preds: Seq[String]) extends PathExpr {
    require(preds.nonEmpty, "negated property set needs >= 1 IRI")
  }

  /** Bounded property path `s <path> o` over the triple table. A
    * CONSTANT source routes through source-restricted evaluation
    * (single-source BFS for closures, semi-join pushdown for the
    * leftmost step of sequences), so prefer binding `s` on corpus-scale
    * graphs — an unbound-unbound closure materializes all-pairs.
    */
  final case class PathPattern(s: Term, path: PathExpr, o: Term)
      extends Pattern {
    def endpoints: Seq[(String, Term)] = Seq("src" -> s, "dst" -> o)
    def vars: Seq[String] =
      endpoints.collect { case (_, V(n)) => n }.distinct
    def boundCount: Int = 1 + endpoints.count(_._2.isInstanceOf[C])
  }
  object PathPattern {
    /** Legacy shape: `s <pred>+ o` (1..maxHops min-hop closure). */
    def apply(s: Term, pred: String, o: Term, maxHops: Int): PathPattern =
      PathPattern(s, Plus(Pred(pred), maxHops), o)
  }

  /** One OPTIONAL { ... } block: its patterns plus block-local filters. */
  final case class OptionalBlock(patterns: Seq[Pattern],
      filters: Seq[Column] = Nil)

  /** One negation block — `FILTER NOT EXISTS { ... }` or `MINUS
    * { ... }`. Both compile to a LEFT ANTI join on the shared
    * variables (the null-unsafe equality matches SPARQL's
    * bound-solution case; unbound-var compatibility is out of this
    * subset). They differ exactly where the spec makes them differ —
    * when the variable domains are DISJOINT: NOT EXISTS removes every
    * row if the inner pattern matches at all (an always-true anti
    * join against one inner row — distributed, no driver branch),
    * MINUS removes nothing (no shared domain ⇒ trivially no
    * incompatibility).
    */
  final case class NegationBlock(patterns: Seq[Pattern],
      filters: Seq[Column] = Nil, isMinus: Boolean = false)

  /** One positive `FILTER EXISTS { ... }` block — the dual of NOT
    * EXISTS: keep a solution iff the inner pattern matches under the
    * shared bindings. Compiles to a LEFT SEMI join on the shared
    * variables (semi, not inner: a solution must survive ONCE however
    * many inner matches exist — an inner join would multiply the bag).
    * Disjoint variable domains ⇒ keep everything iff the inner pattern
    * matches at all (an always-true semi join against one inner row).
    */
  final case class ExistsBlock(patterns: Seq[Pattern],
      filters: Seq[Column] = Nil)

  /** One `BIND ( expr AS ?var )` clause: extends each solution with a
    * computed binding. `needs` lists the variables the expression reads
    * (checked bound at parse time — SPARQL's in-scope rule for the
    * preceding group); the Column is appended via withColumn AFTER the
    * pattern joins, so it stays inside whole-stage codegen (a pure
    * projection, never a shuffle).
    */
  final case class BindClause(name: String, expr: Column,
      needs: Seq[String])

  /** One `{ ... } UNION { ... }` group: branch solutions bag-unioned
    * (no dedup, per SPARQL's Union of multisets), then joined into the
    * enclosing group on shared variables. Subset restriction, checked
    * at parse time: every branch must bind the SAME variable set —
    * asymmetric branches produce unbound variables whose join
    * compatibility (unbound-matches-anything) has no null-unsafe
    * equi-join translation; the symmetric case covers the common
    * "either pattern shape" usage and keeps the plan one union + one
    * hash join.
    */
  final case class UnionBlock(
      branches: Seq[(Seq[Pattern], Seq[Column])]) {
    require(branches.length >= 2, "UNION needs >= 2 branches")
    val vars: Seq[String] =
      branches.head._1.flatMap(_.vars).distinct.sorted
    require(branches.forall(b =>
      b._1.flatMap(_.vars).distinct.sorted == vars),
      s"UNION branches must bind the same variables: " +
        branches.map(_._1.flatMap(_.vars).distinct.sorted.mkString("("
          , ",", ")")).mkString(" vs "))
  }

  /** One GRAPH block — `GRAPH <iri> { ... }` / `GRAPH ?g { ... }` over a
    * quad table (g, s, p, o). SPARQL semantics: every pattern of the
    * block must match within the SAME graph; a variable graph term binds
    * that graph's name into the solution. Blocks hold plain triple
    * patterns (paths/nested groups inside GRAPH are out of this subset).
    */
  final case class GraphBlock(graph: Term,
      patterns: Seq[TriplePattern], filters: Seq[Column] = Nil) {
    require(patterns.nonEmpty, "GRAPH block needs >= 1 triple pattern")
    def vars: Seq[String] =
      ((graph match { case V(n) => Seq(n); case _ => Nil }) ++
        patterns.flatMap(_.vars)).distinct
  }

  /** [[scan]] over a quad table, carrying the graph column as the bound
    * graph variable — a repeated variable between `?g` and a pattern
    * position (`GRAPH ?x { ?x <p> ?o }`) becomes a column-equality
    * filter exactly like an in-pattern repeat.
    */
  private def quadScan(quads: DataFrame, tp: TriplePattern,
      gVar: String): DataFrame = {
    var df = quads
    tp.terms.foreach {
      case (c, C(v)) => df = df.filter(col(c) === v)
      case _ => ()
    }
    val varCols = ("g", gVar) +:
      tp.terms.collect { case (c, V(n)) => (c, n) }
    varCols.groupBy(_._2).valuesIterator.filter(_.size > 1).foreach { g =>
      g.map(_._1).sliding(2).foreach {
        case Seq(a, b) => df = df.filter(col(a) === col(b))
        case _ => ()
      }
    }
    val proj = varCols.groupBy(_._2).map { case (n, cs) =>
      col(cs.head._1).as(n)
    }.toSeq
    df.select(proj: _*)
  }

  /** Evaluate one GRAPH block against a quad table. A CONSTANT graph
    * term compiles to `g = iri` pushed into the scan (partition/footer
    * pruning when the store is laid out by graph) and then reuses the
    * plain triple-pattern compiler; a VARIABLE graph term carries `g`
    * through every pattern scan, so the shared `?g` column makes each
    * join same-graph by construction — the spec's semantics with zero
    * extra machinery. Same broadcast rules as [[compileBlock]].
    */
  def graphBlock(quads: DataFrame, gb: GraphBlock): DataFrame =
    gb.graph match {
      case C(iri) =>
        val triples = quads.filter(col("g") === iri)
          .select(col("s"), col("p"), col("o"))
        gb.filters.foldLeft(compileBlock(triples, gb.patterns))(
          _.filter(_))
      case V(gv) =>
        val ordered = joinOrder(gb.patterns)
          .map(_.asInstanceOf[TriplePattern])
        var first = true
        val joined = ordered.tail.foldLeft(
          quadScan(quads, ordered.head, gv)) { (acc0, p) =>
          val acc = if (first && selective(ordered.head)) broadcast(acc0)
            else acc0
          first = false
          val rhs0 = quadScan(quads, p, gv)
          val rhs = if (selective(p)) broadcast(rhs0) else rhs0
          // gv is projected by every quad scan, so `shared` is always
          // non-empty — the same-graph constraint rides the equi-join
          val shared = (gv +: p.vars).distinct
            .filter(acc0.columns.contains)
          acc.join(rhs, shared, "inner")
        }
        gb.filters.foldLeft(joined)(_.filter(_))
    }

  /** One VALUES block: inline bindings for `vars`, one row per entry.
    * Joins the solution set on the shared variables (broadcast — the
    * binding table is query-literal-sized); with no shared variable it
    * extends solutions as a cartesian, per the spec.
    */
  final case class ValuesBlock(vars: Seq[String], rows: Seq[Seq[String]]) {
    require(vars.nonEmpty, "VALUES needs >= 1 var")
    require(rows.forall(_.length == vars.length),
      "VALUES row arity must match the var list")
  }

  /** Scan one pattern: constants → pushed filters; repeated variables
    * within the pattern → column-equality filters; project+rename the
    * variable columns.
    */
  private[kgql] def scan(triples: DataFrame, tp: TriplePattern): DataFrame = {
    var df = triples
    tp.terms.foreach {
      case (c, C(v)) => df = df.filter(col(c) === v)
      case _ => ()
    }
    val varCols = tp.terms.collect { case (c, V(n)) => (c, n) }
    varCols.groupBy(_._2).valuesIterator.filter(_.size > 1).foreach { g =>
      g.map(_._1).sliding(2).foreach {
        case Seq(a, b) => df = df.filter(col(a) === col(b))
        case _ => ()
      }
    }
    val proj = varCols.groupBy(_._2).map { case (n, cs) =>
      col(cs.head._1).as(n)
    }.toSeq
    df.select(proj: _*)
  }

  /** The (src, dst) relation of a path expression. `sources` (when the
    * pattern's subject is constant, or recursively known) is pushed into
    * the LEFTMOST step only — a closure takes it as its BFS seed set, a
    * predicate scan as a semi-join (left-semi keeps bag multiplicity of
    * the left side intact = 1 row per triple), a sequence pushes into
    * its first factor, an alternation into both branches. An inverse
    * drops the restriction (its sources are the inner expr's dsts) and
    * filters after — correct, just not pushed.
    */
  private[kgql] def rel(triples: DataFrame, e: PathExpr,
      sources: Option[DataFrame] = None): DataFrame = e match {
    case Pred(iri) =>
      val scan = triples.filter(col("p") === iri)
        .select(col("s").as("src"), col("o").as("dst"))
      sources match {
        case Some(s) => scan.join(s.select("src"), Seq("src"), "left_semi")
        case None => scan
      }
    case NegSet(preds) =>
      val scan = triples.filter(!col("p").isin(preds: _*))
        .select(col("s").as("src"), col("o").as("dst"))
      sources match {
        case Some(s) => scan.join(s.select("src"), Seq("src"), "left_semi")
        case None => scan
      }
    case Inv(x) =>
      val r = rel(triples, x, None)
        .select(col("dst").as("src"), col("src").as("dst"))
      sources match {
        case Some(s) => r.join(s.select("src"), Seq("src"), "left_semi")
        case None => r
      }
    case PSeq(a, b) =>
      val ra = rel(triples, a, sources)
        .select(col("src"), col("dst").as("mid"))
      val rb = rel(triples, b, None)
        .select(col("src").as("mid"), col("dst"))
      ra.join(rb, Seq("mid")).select(col("src"), col("dst"))
    case PAlt(a, b) => // union is bag-semantic (no dedup), as SPARQL's |
      rel(triples, a, sources).union(rel(triples, b, sources))
    case Plus(x, k) =>
      // closure input must be a SET of edges (bag replication would
      // multiply frontier work for identical pairs); output is the
      // set-semantic reachable relation, min-hop dist dropped
      PropertyPath.boundedClosure(rel(triples, x, None).distinct(), k,
        sources.map(_.select("src").distinct()))
        .select(col("src"), col("dst"))
    case Star(x, k) =>
      rel(triples, Plus(x, k), sources)
        .union(zeroLength(triples, sources)).distinct()
    case Opt(x) =>
      rel(triples, x, sources)
        .union(zeroLength(triples, sources)).distinct()
  }

  /** The zero-length path relation: with a source restriction, each
    * source matched to itself unconditionally (spec: a constant term
    * zero-length-matches itself whether or not it occurs in the graph);
    * unrestricted, identity over every term of the graph — one
    * distinct over s ∪ o, corpus-scale, so prefer bound sources.
    */
  private def zeroLength(triples: DataFrame,
      sources: Option[DataFrame]): DataFrame = {
    val base = sources.getOrElse(
      triples.select(col("s").as("src"))
        .union(triples.select(col("o").as("src"))))
    // the aliases mint FRESH attribute ids for this branch: `sources`
    // is also referenced inside the closure branch (BFS seed join), and
    // sharing its attribute across both Union children trips Spark's
    // Union.rewriteConstraints (key-not-found on the reused attribute;
    // reproduced in PathExprSpec's checkpointed-pipeline star test — a
    // constraint-propagation-off control passes)
    base.select(col("src").as("zlp")).distinct()
      .select(col("zlp").as("src"), col("zlp").as("dst"))
  }

  /** Relation for a path pattern: a constant source is pushed into the
    * path evaluation (BFS seeds / leftmost semi-join), a constant object
    * filtered after; endpoints renamed to their variables; repeated
    * variable (s = o) → src = dst filter (satisfiable for non-closure
    * paths, e.g. `?x <p>/^<p> ?x`).
    */
  private[kgql] def pathScan(triples: DataFrame,
      pp: PathPattern): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val from = pp.s match {
      case C(v) => Some(Seq(v).toDF("src"))
      case V(_) => None
    }
    var closure = rel(triples, pp.path, from)
    pp.endpoints.foreach {
      case (c, C(v)) => closure = closure.filter(col(c) === v)
      case _ => ()
    }
    val varCols = pp.endpoints.collect { case (c, V(n)) => (c, n) }
    varCols.groupBy(_._2).valuesIterator.filter(_.size > 1).foreach { g =>
      g.map(_._1).sliding(2).foreach {
        case Seq(a, b) => closure = closure.filter(col(a) === col(b))
        case _ => ()
      }
    }
    val proj = varCols.groupBy(_._2).map { case (n, cs) =>
      col(cs.head._1).as(n)
    }.toSeq
    closure.select(proj: _*)
  }

  private def scanAny(triples: DataFrame, p: Pattern): DataFrame =
    p match {
      case tp: TriplePattern => scan(triples, tp)
      case pp: PathPattern => pathScan(triples, pp)
    }

  /** ≥2 bound terms ⇒ the scan is a sliver of the corpus (one predicate
    * × one endpoint) — dictionary-scale, safe to replicate to executors
    * so the big side never shuffles. Applied at JOIN time to the build
    * side only (a hint on the stream side of an outer join is
    * unsupported and would just warn).
    */
  private def selective(p: Pattern): Boolean = p match {
    case tp: TriplePattern => tp.boundCount >= 2
    case pp: PathPattern => pp.boundCount >= 2 // pred + an endpoint
  }

  /** Greedy join order: seed with the most-bound pattern; then always
    * extend with a variable-connected pattern (max shared vars, then max
    * bound terms, then input order); fall back to a cartesian only when
    * the pattern graph is genuinely disconnected.
    */
  private[kgql] def joinOrder(
      patterns: Seq[Pattern]): Seq[Pattern] = {
    if (patterns.isEmpty) return Nil
    val remaining = scala.collection.mutable.ArrayBuffer(
      patterns.zipWithIndex: _*)
    def take(i: Int) = { val p = remaining(i)._1; remaining.remove(i); p }
    val first = remaining.zipWithIndex
      .maxBy { case ((p, idx), _) => (p.boundCount, -idx) }._2
    val order = scala.collection.mutable.ArrayBuffer(take(first))
    val bound = scala.collection.mutable.Set(order.head.vars: _*)
    while (remaining.nonEmpty) {
      val next = remaining.zipWithIndex.maxBy { case ((p, idx), _) =>
        (p.vars.count(bound), p.boundCount, -idx)
      }._2
      val p = take(next)
      order += p
      bound ++= p.vars
    }
    order.toSeq
  }

  /** Compile a required block to a DataFrame (inner joins on shared
    * variables; crossJoin only for disconnected components).
    */
  private[kgql] def compileBlock(triples: DataFrame,
      patterns: Seq[Pattern]): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    val ordered = joinOrder(patterns)
    var first = true
    ordered.tail.foldLeft(scanAny(triples, ordered.head)) { (acc0, p) =>
      // hint the build side: a selective rhs always; a selective SEED
      // only on its first join (after that acc is join output, not the
      // dictionary-scale scan)
      val acc = if (first && selective(ordered.head)) broadcast(acc0)
        else acc0
      first = false
      val rhs0 = scanAny(triples, p)
      val rhs = if (selective(p)) broadcast(rhs0) else rhs0
      val shared = p.vars.filter(acc0.columns.contains)
      if (shared.nonEmpty) acc.join(rhs, shared, "inner")
      else acc.crossJoin(rhs)
    }
  }

  /** Evaluate a BGP query: required patterns, optional blocks, filters,
    * and a variable projection.
    */
  def select(triples: DataFrame,
      patterns: Seq[Pattern],
      projection: Seq[String],
      optionals: Seq[OptionalBlock] = Nil,
      filters: Seq[Column] = Nil,
      distinct: Boolean = false,
      negations: Seq[NegationBlock] = Nil,
      values: Seq[ValuesBlock] = Nil,
      unions: Seq[UnionBlock] = Nil,
      exists: Seq[ExistsBlock] = Nil,
      binds: Seq[BindClause] = Nil,
      derived: Seq[DataFrame] = Nil): DataFrame = {
    val spark = triples.sparkSession
    val base = if (patterns.nonEmpty) Some(compileBlock(triples, patterns))
      else None
    val withUnions = unions.foldLeft(base) { (acc, ub) =>
      val branch = ub.branches.map { case (pats, fils) =>
        fils.foldLeft(compileBlock(triples, pats))(_.filter(_))
          .select(ub.vars.map(col): _*) // align column order across branches
      }.reduce(_.union(_))
      acc match {
        case Some(df) =>
          val shared = ub.vars.filter(df.columns.contains)
          if (shared.nonEmpty) Some(df.join(branch, shared, "inner"))
          else Some(df.crossJoin(branch))
        case None => Some(branch)
      }
    }
    // Derived tables (SPARQL subqueries): each is a pre-evaluated
    // solution set, joined into the group on its shared variables — the
    // spec's bottom-up evaluation order (subqueries first) is exactly an
    // inner equi-join for bound solutions. An aggregate subquery's
    // output is group-cardinality-sized, so AQE picks the broadcast side
    // at runtime; no static hint (a non-aggregate subquery can be
    // corpus-scale).
    val withDerived = derived.foldLeft(withUnions) { (acc, d) =>
      acc match {
        case Some(df) =>
          val shared = d.columns.filter(df.columns.contains).toSeq
          if (shared.nonEmpty) Some(df.join(d, shared, "inner"))
          else Some(df.crossJoin(d))
        case None => Some(d)
      }
    }
    val required0 = withDerived.getOrElse(
      throw new IllegalArgumentException("empty BGP"))
    val required = values.foldLeft(required0) { (acc, vb) =>
      // LocalRelation (not an RDD) so Catalyst can constant-fold and
      // broadcast the binding table like any other literal
      import scala.jdk.CollectionConverters._
      val rows = vb.rows.map(r =>
        org.apache.spark.sql.Row(r: _*)).asJava
      val schema = org.apache.spark.sql.types.StructType(vb.vars.map(v =>
        org.apache.spark.sql.types.StructField(v,
          org.apache.spark.sql.types.StringType)))
      val vdf = broadcast(spark.createDataFrame(rows, schema))
      val shared = vb.vars.filter(acc.columns.contains)
      if (shared.nonEmpty) acc.join(vdf, shared, "inner")
      else acc.crossJoin(vdf)
    }
    val joined = optionals.foldLeft(required) { (acc, ob) =>
      val block0 = compileBlock(triples, ob.patterns)
      val block = ob.filters.foldLeft(block0)(_.filter(_))
      val shared = ob.patterns.flatMap(_.vars).distinct
        .filter(acc.columns.contains)
      acc.join(block, shared, "left_outer")
    }
    val negated = negations.foldLeft(joined) { (acc, nb) =>
      val block0 = compileBlock(triples, nb.patterns)
      val block = nb.filters.foldLeft(block0)(_.filter(_))
      val shared = nb.patterns.flatMap(_.vars).distinct
        .filter(acc.columns.contains)
      if (shared.nonEmpty) acc.join(block, shared, "left_anti")
      else if (nb.isMinus) acc // disjoint MINUS: no-op per spec
      else acc.join(block.limit(1), lit(true), "left_anti")
    }
    val semied = exists.foldLeft(negated) { (acc, eb) =>
      val block0 = compileBlock(triples, eb.patterns)
      val block = eb.filters.foldLeft(block0)(_.filter(_))
      val shared = eb.patterns.flatMap(_.vars).distinct
        .filter(acc.columns.contains)
      if (shared.nonEmpty) acc.join(block, shared, "left_semi")
      else acc.join(block.limit(1), lit(true), "left_semi")
    }
    val bound = binds.foldLeft(semied) { (acc, b) =>
      acc.withColumn(b.name, b.expr)
    }
    val filtered = filters.foldLeft(bound)(_.filter(_))
    val projected = filtered.select(projection.map(col): _*)
    if (distinct) projected.distinct() else projected
  }
}
