package graft.ontology

import graft.SparkSpec
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check => scCheck, Parameters}

/** RDFS closure + entailment laws: fixture closure rows, reflexivity,
  * ScalaCheck equivalence with a brute-force transitive closure over
  * random relations (cycles included), and rdfs9 entailment semantics.
  */
class RdfsSpec extends SparkSpec {
  import spark.implicits._

  private def cloSet(pairs: Seq[(String, String)]): Set[(String, String)] =
    Rdfs.subClassClosure(pairs.toDF("c", "anc"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  /** Reference closure: reflexive over mentioned classes, then
    * saturate transitively (naive fixpoint, fine at test scale).
    */
  private def bruteClosure(pairs: Seq[(String, String)]): Set[(String, String)] = {
    val dom = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    var clo = dom.map(c => (c, c)) ++ pairs.toSet
    var grew = true
    while (grew) {
      val next = clo ++ (for {
        (a, b) <- clo; (c, d) <- pairs if b == c
      } yield (a, d))
      grew = next.size > clo.size
      clo = next
    }
    clo
  }

  test("fixture closure: Runtime reaches Infra and Thing, reflexive rows present") {
    val clo = cloSet(Rdfs.SubClassOf)
    assert(clo.contains(("Runtime", "Runtime")))
    assert(clo.contains(("Runtime", "Infra")))
    assert(clo.contains(("Runtime", "Thing")))
    assert(clo.contains(("Thing", "Thing")))
    assert(!clo.contains(("Infra", "Runtime"))) // no inverse edges
    assert(clo == bruteClosure(Rdfs.SubClassOf))
  }

  test("cycles converge: A->B->C->A closes to the full 3x3 square") {
    val cyc = Seq("A" -> "B", "B" -> "C", "C" -> "A")
    val clo = cloSet(cyc)
    val all = for (x <- Seq("A", "B", "C"); y <- Seq("A", "B", "C")) yield (x, y)
    assert(clo == all.toSet)
  }

  test("closure == brute reflexive-transitive closure on random relations (cycles included)") {
    val classes = Gen.choose(2, 7).flatMap(n => Gen.const((0 until n).map(i => s"C$i")))
    val relGen = for {
      cs <- classes
      m  <- Gen.choose(1, 10)
      es <- Gen.listOfN(m, Gen.zip(Gen.oneOf(cs), Gen.oneOf(cs)))
    } yield es.distinct.filter(p => p._1 != p._2) match {
      case Nil => Seq(cs.head -> cs.last)
      case xs  => xs
    }
    val p = Prop.forAll(relGen) { rel => cloSet(rel) == bruteClosure(rel) }
    val res = scCheck(Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }

  test("rdfs9 entailment: each instance inherits exactly its direct class's ancestors") {
    val clo = Rdfs.subClassClosure(Rdfs.SubClassOf.toDF("c", "anc"))
    val ent = Rdfs.entailTypes(Rdfs.DirectType.toDF("x", "cls"), clo)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val cloS = cloSet(Rdfs.SubClassOf)
    val expected = (for {
      (x, c)     <- Rdfs.DirectType
      (c2, anc)  <- cloS if c2 == c
    } yield (x, anc)).toSet
    assert(ent == expected)
    // spark's direct class is Runtime: entailed set is exactly the chain
    assert(ent.filter(_._1 == "spark").map(_._2) == Set("Runtime", "Infra", "Thing"))
  }

  test("instances whose class is absent from the TBox are dropped (join, not coalesce)") {
    val clo = Rdfs.subClassClosure(Seq("A" -> "B").toDF("c", "anc"))
    val ent = Rdfs.entailTypes(Seq("x" -> "A", "y" -> "Zzz").toDF("x", "cls"), clo)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(ent == Set(("x", "A"), ("x", "B")))
  }

  test("rdfs7: a triple materializes under every superproperty of its predicate, nothing else") {
    val tri = Seq(("d1", "urn:graft:mentions", "e1"),
      ("e1", "urn:graft:coOccursWith", "e2")).toDF("s", "p", "o")
    val ent = Rdfs.entailProperties(tri,
        Rdfs.SubPropertyOf.toDF("p", "super"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(ent == Set(
      ("d1", "urn:graft:mentions", "e1"),   // reflexive: original kept
      ("d1", "urn:graft:refersTo", "e1"),   // one hop up
      ("d1", "urn:graft:linksTo", "e1"),    // rdfs5 transitivity
      ("e1", "urn:graft:coOccursWith", "e2"),
      ("e1", "urn:graft:relatedTo", "e2"))) // the other chain only
  }

  test("rdfs2/rdfs3 fire only through the rdfs7 closure (constraints live on superproperties)") {
    val tri = Seq(("d1", "urn:graft:mentions", "e1")).toDF("s", "p", "o")
    val dom = Rdfs.PropDomain.toDF("p", "cls")
    val rng = Rdfs.PropRange.toDF("p", "cls")
    // raw triples: mentions carries no domain/range constraint → empty
    val raw = Rdfs.typeAssertions(tri, dom, rng).collect()
    assert(raw.isEmpty)
    // materialized set: refersTo types d1:Document + e1:Entity,
    // linksTo types e1:Resource
    val ent = Rdfs.entailProperties(tri, Rdfs.SubPropertyOf.toDF("p", "q"))
    val ty = Rdfs.typeAssertions(ent, dom, rng)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(ty == Set(("d1", "Document"), ("e1", "Entity"),
      ("e1", "Resource")))
  }
}
