package graft.ontology

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The fused driver-side schema extraction must agree with the
  * distributed [[Extract]] DAG member-for-member (the 11 onto_* oracles
  * enforce the same thing end-to-end; this pins it at unit level with
  * the full nested entity rows included).
  */
class SchemaExtractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rowsOf(df: DataFrame): Set[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toString).toSet
  }

  test("fused extraction matches the distributed DAG on every member") {
    assume(new java.io.File(dir).isDirectory)
    val t = FixtureOntology.combined(spark, dir).localCheckpoint()
    val fused = SchemaExtract.attempt(spark, t).get

    val cls = Extract.classesWithIds(t).localCheckpoint()
    val parents = Extract.parentResolution(t, cls)
    val assignment = Extract.propertyAssignment(t, cls).localCheckpoint()
    val (rels, skipped) = Extract.relationships(t, cls)
    val entities = Extract.assembleEntities(cls, parents, assignment)

    assert(rowsOf(fused.cls) == rowsOf(cls))
    assert(rowsOf(fused.parents) == rowsOf(parents))
    assert(rowsOf(fused.assignment) == rowsOf(assignment))
    assert(rowsOf(fused.rels) == rowsOf(rels))
    assert(rowsOf(fused.skipped) == rowsOf(skipped))
    assert(rowsOf(fused.entities) == rowsOf(entities))
    assert(fused.cls.columns.toSeq == cls.columns.toSeq)
    assert(fused.entities.columns.toSeq == entities.columns.toSeq)
    assert(fused.rels.columns.toSeq == rels.columns.toSeq)
  }

  test("over-cap schema row sets refuse the fused path") {
    import spark.implicits._
    // 100k+1 synthetic subClassOf rows exceed CollectLimit
    val big = spark.range(SchemaExtract.CollectLimit + 1)
      .selectExpr("concat('urn:c', id) as s",
        s"'${graft.rdf.Vocab.RdfsSubClassOf}' as p",
        "'urn:root' as o", "'uri' as oKind")
    assert(SchemaExtract.attempt(spark, big).isEmpty)
  }
}
