package graft.plugins

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.ConversionStats
import graft.ontology.Extract
import graft.rdf.TurtleParser
import graft.dtdl.{DtdlConverter, DtdlParser}
import graft.cdm.{CdmConverter, CdmParser}

/** 2.12 — the engine's UDF/extension surface (reference: `OntologyPlugin`
  * ABC + singleton `PluginManager`, `src/plugins/base.py:54-120`,
  * `src/plugins/manager.py:41-430`). A format plugin turns raw document
  * content into the universal output pair (entities, relationships) plus
  * a skipped channel; discovery routes by extension, exactly the
  * reference's extension-routing map. Value-level scalar mappings stay
  * Column-expression libraries (TypeLattice etc.), not runtime-registered
  * UDFs.
  */
trait FormatPlugin {
  def formatName: String
  def fileExtensions: Set[String]
  /** content → (entities, relationships, skipped) in the
    * Extract.entityTypes schema family.
    */
  def convert(spark: SparkSession, content: String, format: String)
    : (DataFrame, DataFrame, DataFrame)
}

object RdfPlugin extends FormatPlugin {
  val formatName = "rdf"
  val fileExtensions = Set(".ttl", ".turtle", ".n3", ".nt", ".nq", ".trig",
    ".jsonld", ".rdf", ".xml", ".trix", ".hext", ".rdfa")
  def convert(spark: SparkSession, content: String, format: String)
    : (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val triples = spark.createDataset(TurtleParser.parse(content, format))
      .toDF().localCheckpoint()
    Extract.entityTypes(triples)
  }
}

object DtdlPlugin extends FormatPlugin {
  val formatName = "dtdl"
  val fileExtensions = Set(".json", ".dtdl")
  def convert(spark: SparkSession, content: String, format: String)
    : (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val res = DtdlConverter.convert(DtdlParser.parse(content))
    (spark.createDataset(res.entities).toDF(),
      spark.createDataset(res.rels).toDF(),
      spark.createDataset(res.skipped).toDF())
  }
}

object CdmPlugin extends FormatPlugin {
  val formatName = "cdm"
  val fileExtensions = Set(".cdm.json", ".manifest.cdm.json", ".model.json")
  def convert(spark: SparkSession, content: String, format: String)
    : (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val res = CdmConverter.convert(CdmParser.parse(content))
    (spark.createDataset(res.entities).toDF(),
      spark.createDataset(res.rels).toDF(),
      spark.createDataset(res.skipped).toDF())
  }
}

/** Plugin discovery + extension routing (manager.py:86-430). Immutable
  * default registry; `withPlugin` returns an extended copy (no global
  * mutable singleton — deterministic under concurrency).
  */
final class PluginRegistry private (plugins: Seq[FormatPlugin]) {
  def all: Seq[FormatPlugin] = plugins
  def byFormat(name: String): Option[FormatPlugin] =
    plugins.find(_.formatName == name)
  /** Longest-suffix match so `.manifest.cdm.json` beats `.json`. */
  def byExtension(path: String): Option[FormatPlugin] = {
    val lower = path.toLowerCase
    plugins.flatMap(p => p.fileExtensions.filter(lower.endsWith).map(e => (e.length, p)))
      .sortBy(-_._1).headOption.map(_._2)
  }
  def withPlugin(p: FormatPlugin): PluginRegistry =
    new PluginRegistry(plugins :+ p)
}

object PluginRegistry {
  val default: PluginRegistry =
    new PluginRegistry(Seq(CdmPlugin, RdfPlugin, DtdlPlugin))
}
