package graft.ontology

import graft.rdf.Vocab._
import graft.model.Triple

/** G1/G2/G3 — OWL class-expression and RDF-list resolution.
  *
  * Parity contract (reference: `src/formats/rdf/class_resolver.py:44-209`):
  *  - URIRef resolves to itself;
  *  - bnode: follow `owl:unionOf` / `intersectionOf` / `complementOf` /
  *    `oneOf` into RDF `rdf:first`/`rdf:rest` lists;
  *  - cycle detection via visited set (bnodes only), max recursion depth 10
  *    (`class_resolver.py:42`), list traversal capped at 1000 iterations
  *    (`class_resolver.py:164`);
  *  - G3 datatype unions resolve through [[TypeLattice.resolveUnion]]
  *    (`type_mapper.py:168-212`).
  *
  * Scale design: class expressions live in the ontology *schema*, which is
  * tiny relative to the instance data (Fabric caps the output at 500 entity
  * types — `constants.py:154-203`). Following SURVEY §2.5/G1, the bnode
  * subgraph is collected once, wrapped in this immutable index, and
  * broadcast; resolution runs as a pure function on executors (or driver)
  * rather than as an unbounded iterative join. The 100 TB instance scan
  * never touches this path.
  */
final class ClassExprResolver(index: Map[(String, String), List[(String, String)]])
    extends Serializable {

  private val MaxDepth = 10
  private val MaxListIterations = 1000

  private def objectsOf(s: String, p: String): List[(String, String)] =
    index.getOrElse((s, p), Nil)

  private def isBnode(kind: String): Boolean = kind == "bnode"

  /** `class_resolver.py:44-133`. `nodeKind` ∈ uri|bnode|literal. */
  def resolveClassTargets(node: String, nodeKind: String,
                          visited: Set[String] = Set.empty,
                          maxDepth: Int = MaxDepth): List[String] = {
    if (visited.contains(node)) return Nil
    if (maxDepth <= 0) return Nil
    val vis = if (isBnode(nodeKind)) visited + node else visited
    nodeKind match {
      case "uri" => List(node)
      case "bnode" =>
        val out = List.newBuilder[String]
        for ((u, _) <- objectsOf(node, OwlUnionOf))
          out ++= resolveRdfList(u, vis, maxDepth - 1)._1
        for ((i, _) <- objectsOf(node, OwlIntersectionOf))
          out ++= resolveRdfList(i, vis, maxDepth - 1)._1
        for ((c, ck) <- objectsOf(node, OwlComplementOf))
          out ++= resolveClassTargets(c, ck, vis, maxDepth - 1)
        for ((o, _) <- objectsOf(node, OwlOneOf))
          out ++= resolveRdfList(o, vis, maxDepth - 1)._1
        out.result()
      case _ => Nil
    }
  }

  /** `class_resolver.py:135-209`. Returns (targets, unresolvedCount). */
  def resolveRdfList(listNode: String, visited: Set[String] = Set.empty,
                     maxDepth: Int = MaxDepth): (List[String], Int) = {
    val targets = List.newBuilder[String]
    var unresolved = 0
    var current: String = listNode
    var currentIsBnode = current != null && current.startsWith("_:")
    var vis = visited
    var iterations = 0
    var done = current == null || current == RdfNil
    while (!done) {
      iterations += 1
      if (iterations > MaxListIterations) done = true
      else if (currentIsBnode && vis.contains(current)) done = true
      else {
        if (currentIsBnode) vis = vis + current
        objectsOf(current, RdfFirst).headOption match {
          case Some((first, "uri")) => targets += first
          case Some((first, "bnode")) =>
            val nested = resolveClassTargets(first, "bnode", vis, maxDepth - 1)
            if (nested.nonEmpty) targets ++= nested else unresolved += 1
          case Some(_) => unresolved += 1 // literal in a class list
          case None => ()
        }
        objectsOf(current, RdfRest).headOption match {
          case Some((rest, kind)) if rest != RdfNil && (kind == "uri" || kind == "bnode") =>
            current = rest
            currentIsBnode = kind == "bnode"
          case _ => done = true
        }
      }
    }
    (targets.result(), unresolved)
  }

  /** G3: `type_mapper.py:168-212` — datatype-union bnode → Fabric type. */
  def resolveDatatypeUnion(unionNode: String): String = {
    var typesFound = Set.empty[String]
    for ((u, _) <- objectsOf(unionNode, OwlUnionOf)) {
      val (ts, _) = resolveRdfList(u, Set.empty, MaxDepth)
      typesFound ++= ts.filter(t =>
        TypeLattice.xsdToFabric.contains(t) || t.startsWith(XSD))
    }
    if (typesFound.isEmpty) {
      for ((t, _) <- objectsOf(unionNode, RdfType)
           if TypeLattice.xsdToFabric.contains(t)) typesFound += t
    }
    if (typesFound.isEmpty) TypeLattice.StringT
    else TypeLattice.resolveUnion(typesFound)
  }
}

object ClassExprResolver {
  /** Predicates that make up the schema/bnode subgraph the resolver needs.
    * Filtering the (potentially huge) triple table down to these before
    * collecting keeps the driver copy tiny; the filter is pushed to the
    * scan. `rdf:type` is needed only for bnode subjects (datatype-union
    * direct type refs, `type_mapper.py:196-200`) — collecting instance
    * rdf:type rows would drag the whole corpus onto the driver.
    */
  val predicates: Seq[String] = Seq(
    OwlUnionOf, OwlIntersectionOf, OwlComplementOf, OwlOneOf,
    RdfFirst, RdfRest)

  def fromTriples(rows: Iterable[Triple]): ClassExprResolver = {
    val m = rows
      .groupBy(t => (t.s, t.p))
      .map { case (k, ts) => k -> ts.map(t => (t.o, t.oKind)).toList }
    new ClassExprResolver(m)
  }

  import org.apache.spark.sql.DataFrame

  /** Collect the bnode/schema subgraph (small by construction) and build
    * the broadcastable resolver.
    */
  def collect(triples: DataFrame): ClassExprResolver = {
    import org.apache.spark.sql.functions._
    val rows = triples
      .filter(col("p").isin(predicates: _*) || col("s").startsWith("_:"))
      .select("s", "p", "o", "oKind")
      .collect()
      .map(r => Triple(r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    fromTriples(rows)
  }
}
