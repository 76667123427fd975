package graft.kgql

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

/** The BGP compiler vs a naive in-memory evaluator on random triple
  * stores and random pattern conjunctions — join order, unification,
  * and bag semantics must be invisible to the result.
  */
class BgpPropertySpec extends SparkSpec {
  import spark.implicits._
  import Bgp._

  /** Naive evaluator: enumerate bindings pattern by pattern (bag
    * semantics — one result row per derivation).
    */
  private def refSelect(triples: Seq[(String, String, String)],
      patterns: Seq[TriplePattern],
      projection: Seq[String]): Seq[Seq[String]] = {
    def matchOne(binding: Map[String, String],
        tp: TriplePattern): Seq[Map[String, String]] =
      triples.flatMap { case (s, p, o) =>
        def unify(b: Option[Map[String, String]], t: Term, v: String) =
          b.flatMap { m =>
            t match {
              case C(c) => if (c == v) Some(m) else None
              case V(n) => m.get(n) match {
                case Some(x) => if (x == v) Some(m) else None
                case None => Some(m + (n -> v))
              }
            }
          }
        unify(unify(unify(Some(binding), tp.s, s), tp.p, p), tp.o, o)
      }
    patterns.foldLeft(Seq(Map.empty[String, String])) { (bs, tp) =>
      bs.flatMap(matchOne(_, tp))
    }.map(b => projection.map(b))
  }

  private val nodes = Seq("a", "b", "c", "d")
  private val preds = Seq("p", "q")
  private val vars = Seq("x", "y", "z")

  private val tripleGen = for {
    s <- Gen.oneOf(nodes); p <- Gen.oneOf(preds); o <- Gen.oneOf(nodes)
  } yield (s, p, o)

  private val termGen: Gen[Term] = Gen.frequency(
    3 -> Gen.oneOf(vars).map(V.apply),
    1 -> Gen.oneOf(nodes).map(C.apply))

  private val patternGen = for {
    s <- termGen
    p <- Gen.frequency(2 -> Gen.oneOf(preds).map(C.apply),
      1 -> Gen.oneOf(vars).map(V.apply))
    o <- termGen
  } yield TriplePattern(s, p, o)

  test("compiled BGP ≡ naive evaluator (random stores × conjunctions)") {
    val prop = Prop.forAll(
      Gen.listOfN(12, tripleGen).map(_.distinct),
      Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, patternGen))) {
      (ts, pats) =>
        val allVars = pats.flatMap(_.vars).distinct
        (ts.nonEmpty && allVars.nonEmpty) ==> {
          val df = ts.toDF("s", "p", "o")
          val got = Bgp.select(df, pats, allVars)
            .collect()
            .map(_.toSeq.map(_.asInstanceOf[String]).mkString("\u0000"))
            .toSeq.sorted
          val want = refSelect(ts, pats, allVars)
            .map(_.mkString("\u0000")).sorted
          got == want
        }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(40).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
