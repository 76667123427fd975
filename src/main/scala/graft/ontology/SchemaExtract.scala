package graft.ontology

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Triple
import graft.rdf.Vocab._

/** Fused schema-side extraction (round-4 first-touch latency cut).
  *
  * The distributed extraction DAG ([[Extract]] driven by
  * `queries.OntologyQueries.extraction`) materializes ~16 tiny
  * localCheckpoint jobs for a schema that the Fabric caps bound at ≤500
  * entity types (`constants.py:154-203`) — pure job-dispatch latency
  * (4.7–8.6 s first touch). This path applies the SAME dispensation the
  * reference and [[ClassExprResolver.collect]] already use: the schema
  * subgraph is driver-scale, so collect it ONCE (guarded by a row cap
  * with a `limit(N+1)` probe — over the cap, the caller falls back to
  * the distributed DAG) and run the whole classification as a pure
  * Scala program. Only usage inference (J3) — the one operator that
  * scans instance data — stays distributed; its output is ≤|objProps|
  * rows and is collected. Results are returned as local-relation
  * DataFrames carrying final values, so downstream queries cost
  * plan-optimization only, with zero re-extraction risk.
  *
  * Exact parity with the distributed operators (same min/max orderings,
  * same resolver, same id/name kernels — [[Ids]]/[[Names]] pure forms,
  * whose Column parity is spec'd) is enforced by the 11 onto_* DuckDB
  * oracles, which run identically against either path.
  */
object SchemaExtract {

  final case class Result(cls: DataFrame, parents: DataFrame,
                          assignment: DataFrame, entities: DataFrame,
                          rels: DataFrame, skipped: DataFrame)

  final case class ClsRow(classUri: String, id: String, name: String)
  final case class ParentRow(classUri: String, parentUri: String)
  final case class AssignRow(classUri: String, propUri: String,
      propId: String, name: String, valueType: String, isTimeseries: Boolean)
  final case class PropRow(id: String, name: String,
      valueType: String, isTimeseries: Boolean)
  final case class EntityRow(id: String, name: String, uri: String,
      baseEntityTypeId: Option[String], entityIdParts: Seq[String],
      displayNamePropertyId: Option[String], properties: Seq[PropRow],
      timeseriesProperties: Seq[PropRow])
  final case class RelRow(id: String, name: String, uri: String,
      srcEntityTypeId: String, dstEntityTypeId: String,
      srcUri: String, dstUri: String)
  final case class SkipRow(itemType: String, name: String,
      reason: String, uri: String)

  /** Schema rows above this bound abort the fused path (a web-scale
    * triple table whose "schema-shaped" rows are really data — e.g.
    * per-instance comments); the caller then runs the distributed DAG.
    *
    * Sizing: the Fabric caps admit 500 entity types × 200 properties =
    * up to ~100 k property declarations, each carrying type + domain +
    * range + comment rows, so a legitimate near-cap ontology can have a
    * few 100 k schema rows — the cap bounds DRIVER MEMORY (tens of MB of
    * short URIs), not Catalyst work: no plan expression scales with the
    * collected set (J3 membership is broadcast-joined, not inlined as
    * `isin` literals — round-5 advisor).
    */
  val CollectLimit = 100000

  /** Rows the driver program needs: class/property declarations,
    * signatures, class expressions, comments. Branch-constant predicates
    * let Catalyst eliminate instance-data branches of a union source
    * entirely; on a flat table the filter is pushed to the scan.
    */
  private def schemaFilter = {
    val p = col("p")
    p.isin(RdfsSubClassOf, RdfsDomain, RdfsRange, OwlUnionOf,
        OwlIntersectionOf, OwlComplementOf, OwlOneOf, RdfFirst, RdfRest) ||
      (p === RdfType &&
        (col("o").isin(OwlClass, RdfsClass, OwlDatatypeProperty,
          OwlObjectProperty, RdfProperty) ||
          (col("s").startsWith("_:") && col("o").startsWith(XSD)))) ||
      (p === RdfsComment && col("oKind") === "literal")
  }

  /** Try the fused path; None = over the cap, use the distributed DAG. */
  def attempt(spark: SparkSession, t: DataFrame): Option[Result] = {
    val probe = t.filter(schemaFilter).select("s", "p", "o", "oKind")
      .limit(CollectLimit + 1).collect()
    if (probe.length > CollectLimit) return None
    val rows = probe.map(r => Triple(r.getString(0), r.getString(1),
      r.getString(2), r.getString(3))).toIndexedSeq
    Some(build(spark, t, rows))
  }

  private def build(spark: SparkSession, t: DataFrame,
                    rows: IndexedSeq[Triple]): Result = {
    import spark.implicits._
    def nonB(s: String) = !s.startsWith("_:")

    // ---- P1 classes -------------------------------------------------
    val classSet: Seq[String] = rows.iterator.collect {
      case r if r.oKind != "literal" && nonB(r.s) &&
        ((r.p == RdfType && (r.o == OwlClass || r.o == RdfsClass)) ||
          r.p == RdfsSubClassOf) => r.s
    }.toSeq.distinct.sorted(graft.model.CodePoint.ordering)
    val classIds: Map[String, String] =
      classSet.map(c => c -> Ids.entityId(c)).toMap
    val classes: String => Boolean = classSet.toSet

    // ---- J1 parents (incl. J6/G5 cycle exclusion) -------------------
    val edges = rows.iterator
      .filter(r => r.p == RdfsSubClassOf && r.oKind == "uri" && nonB(r.s) &&
        classes(r.s) && classes(r.o))
      .map(r => (r.s, r.o)).toSeq.distinct
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val parents: Map[String, String] = edges
      .filterNot { case (c, p) => Extract.reaches(adj, p, c) }
      // code-point min ≡ the Spark min() the distributed DAG computes
      .groupBy(_._1).map { case (c, ps) =>
        c -> graft.model.CodePoint.min(ps.map(_._2)) }

    // ---- resolver + first-range helpers -----------------------------
    val resolver = ClassExprResolver.fromTriples(rows)
    val firstRange: Map[String, (String, String)] = rows
      .filter(r => r.p == RdfsRange && r.oKind != "literal")
      .groupBy(_.s)
      .map { case (s, rs) =>
        val best = rs.minBy(r => (if (r.oKind == "uri") 0 else 1, r.o))(
          Ordering.Tuple2(Ordering.Int, graft.model.CodePoint.ordering))
        s -> (best.o, best.oKind)
      }
    def resolvedTargets(pred: String): Map[String, Seq[String]] = rows
      .filter(r => r.p == pred && r.oKind != "literal")
      .groupBy(_.s)
      .map { case (s, rs) =>
        s -> rs.flatMap(r => resolver.resolveClassTargets(r.o, r.oKind))
          .distinct
      }
    val domains = resolvedTargets(RdfsDomain)
    val ranges = resolvedTargets(RdfsRange)

    // ---- P2 data properties -----------------------------------------
    def typeSubjects(o: String): Seq[String] = rows.iterator
      .filter(r => r.p == RdfType && r.o == o && nonB(r.s)).map(_.s).toSeq
    val owlData = typeSubjects(OwlDatatypeProperty)
    val rdfProps = typeSubjects(RdfProperty)
    val dataProps: Seq[String] = (owlData ++ rdfProps.filter(p =>
      firstRange.get(p).exists { case (o, k) =>
        k == "uri" && TypeLattice.isXsd(o) }))
      .distinct.sorted(graft.model.CodePoint.ordering)

    // ---- value types + timeseries flags -----------------------------
    def valueTypeOf(p: String): String = firstRange.get(p) match {
      case Some((o, "uri")) => TypeLattice.fabricType(o)
      case Some((o, "bnode")) => resolver.resolveDatatypeUnion(o)
      case _ => TypeLattice.StringT
    }
    val comments: Map[String, String] = rows
      .filter(r => r.p == RdfsComment && r.oKind == "literal")
      .groupBy(_.s).map { case (s, rs) =>
        s -> graft.model.CodePoint.min(rs.map(_.o)) }
    def isTs(p: String): Boolean =
      comments.get(p).exists(_.toLowerCase(java.util.Locale.ROOT).contains("(timeseries)"))

    // ---- J2 property assignment -------------------------------------
    val assignRows: Seq[AssignRow] = (for {
      p <- dataProps
      d <- domains.getOrElse(p, Nil) if classes(d)
    } yield {
      val name = Names.uriToName(p)
      AssignRow(d, p, Ids.propertyId(classIds(d), name), name,
        valueTypeOf(p), isTs(p))
    }).sortBy(a => (a.classUri, a.propUri))

    // ---- P3 object properties ---------------------------------------
    val assignedData = dataProps.filter(p => domains.get(p).exists(_.nonEmpty))
    val owlObj = typeSubjects(OwlObjectProperty)
    val entityRange = rdfProps.filter(p =>
        firstRange.get(p).exists { case (o, k) =>
          k == "uri" && !TypeLattice.isXsd(o) })
      .filterNot(assignedData.toSet)
    val objProps: Seq[String] = (owlObj ++ entityRange)
      .distinct.sorted(graft.model.CodePoint.ordering)

    // ---- J3 usage inference — the one distributed stage -------------
    // Membership against the (potentially tens-of-thousands-string)
    // class/property sets goes through broadcast semi-joins, NOT
    // `isin(...)`: an In expression with O(|schema|) literals makes
    // Catalyst planning/codegen cost scale with the schema — near the
    // CollectLimit cap that planning alone exceeds the distributed DAG
    // this fused path replaces (round-5 advisor).
    val inferred: Map[(String, String), String] =
      if (objProps.isEmpty || classSet.isEmpty) Map.empty
      else {
        val classDf = broadcast(classSet.toDF("k"))
        val objPropsDf = broadcast(objProps.toDF("k"))
        val typeOf = t.filter(col("p") === RdfType)
          .join(classDf, col("o") === col("k"), "left_semi")
          .select(col("s").as("node"), col("o").as("cls"))
        val usage = t
          .join(objPropsDf, col("p") === col("k"), "left_semi")
          .select(col("p").as("propUri"), col("s"), col("o"), col("oKind"))
        val subj = usage.join(typeOf, col("s") === col("node"))
          .groupBy("propUri").agg(min(col("cls")).as("v"))
          .select(col("propUri"), lit("d").as("side"), col("v"))
        val obj = usage.filter(col("oKind") === "uri")
          .join(typeOf, col("o") === col("node"))
          .groupBy("propUri").agg(min(col("cls")).as("v"))
          .select(col("propUri"), lit("r").as("side"), col("v"))
        subj.union(obj).collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
      }

    // ---- J4 relationship expansion + skip ledger --------------------
    val relRows = Seq.newBuilder[RelRow]
    val skipRows = Seq.newBuilder[SkipRow]
    for (p <- objProps) {
      val declD = domains.getOrElse(p, Nil).filter(classes).distinct
      val declR = ranges.getOrElse(p, Nil).filter(classes).distinct
      val effD = if (declD.nonEmpty) declD
        else inferred.get((p, "d")).toSeq
      val effR = if (declR.nonEmpty) declR
        else inferred.get((p, "r")).toSeq
      if (effD.isEmpty || effR.isEmpty) {
        val reason =
          if (effD.isEmpty && effR.isEmpty) "missing both domain and range"
          else if (effD.isEmpty) "missing domain class"
          else "missing range class"
        skipRows += SkipRow("relationship", Names.uriToName(p), reason, p)
      } else for (d <- effD; r <- effR)
        relRows += RelRow(Ids.relId(p, d, r), Names.uriToName(p), p,
          classIds(d), classIds(r), d, r)
    }

    // ---- K3 identifiers + assembly ----------------------------------
    val byClass = assignRows.groupBy(_.classUri)
    def identifiersOf(c: String): (Option[String], Option[String]) = {
      val props = byClass.getOrElse(c, Nil).filterNot(_.isTimeseries)
      def valid(a: AssignRow) =
        a.valueType == TypeLattice.StringT || a.valueType == TypeLattice.BigIntT
      val key = (a: AssignRow) => (a.name, a.propId)
      val idProp = props.filter(a => a.name.toLowerCase(java.util.Locale.ROOT).contains("id") &&
        valid(a)).sortBy(key).lastOption
      val nameProp = props.filter(a => a.name.toLowerCase(java.util.Locale.ROOT).contains("name") &&
        a.valueType == TypeLattice.StringT).sortBy(key).lastOption
      val firstValid = props.filter(valid).sortBy(key).headOption
      val entityIdPart = idProp.orElse(firstValid).map(_.propId)
      val display =
        if (idProp.isDefined) nameProp.orElse(idProp).map(_.propId)
        else firstValid.map(_.propId)
      (entityIdPart, display)
    }
    val entityRows: Seq[EntityRow] = classSet.map { c =>
      val props = byClass.getOrElse(c, Nil)
      def arr(ts: Boolean) = props.filter(_.isTimeseries == ts)
        .map(a => PropRow(a.propId, a.name, a.valueType, a.isTimeseries))
        .sortBy(p => (p.id, p.name, p.valueType, p.isTimeseries))
      val (idPart, display) = identifiersOf(c)
      EntityRow(classIds(c), Names.uriToName(c), c,
        parents.get(c).map(classIds), idPart.toSeq.take(1), display,
        arr(ts = false), arr(ts = true))
    }

    Result(
      cls = classSet.map(c => ClsRow(c, classIds(c), Names.uriToName(c))).toDF(),
      parents = parents.toSeq.sortBy(_._1)
        .map { case (c, p) => ParentRow(c, p) }.toDF(),
      assignment = assignRows.toDF(),
      entities = entityRows.toDF(),
      rels = relRows.result().sortBy(r => (r.uri, r.srcUri, r.dstUri)).toDF(),
      skipped = skipRows.result().sortBy(_.uri).toDF())
  }
}
