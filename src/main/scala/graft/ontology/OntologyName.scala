package graft.ontology

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.rdf.Vocab._
import graft.model.{ConversionStats, Skipped}

/** P6 — ontology-name extraction (reference:
  * `src/rdf/rdf_converter.py:712-728`): the first `owl:Ontology`
  * subject's `rdfs:label`, sanitized (truncate-then-prefix, see
  * [[Names.sanitizeOntologyName]]); default "ImportedOntology" when
  * there is no ontology subject OR the subject has no label — the
  * reference has no URI-local-name fallback.
  */
object OntologyName {

  def extract(triples: DataFrame): String = {
    val onto = triples
      .filter(col("p") === RdfType && col("o") === OwlOntology &&
        !col("s").startsWith("_:"))
      .select(col("s"))
      .orderBy(col("s")) // deterministic "first" (rdflib iteration order is set-ish)
      .limit(1)
      .collect().headOption.map(_.getString(0))
    onto match {
      case None => "ImportedOntology"
      case Some(uri) =>
        val label = triples
          .filter(col("s") === uri && col("p") === RdfsLabel &&
            col("oKind") === "literal")
          .select(min(col("o"))) // deterministic first label
          .collect().headOption.flatMap(r => Option(r.getString(0)))
        label.map(Names.sanitizeOntologyName).getOrElse("ImportedOntology")
    }
  }
}

/** Input-security validation (reference:
  * `src/core/validators/input.py:37-519`): path traversal, extension
  * allow-list, size cap, id-prefix shape. Driver-side gate before any
  * file reaches an executor.
  */
object InputValidation {
  val TtlExtensions = Set(".ttl", ".turtle", ".n3", ".nt", ".nq")
  val DtdlExtensions = Set(".json", ".dtdl")
  val MaxFileBytes: Long = 500L * 1024 * 1024 // parse cap, constants.py:44

  final case class Rejection(reason: String)

  def validatePath(path: String,
                   allowedExtensions: Set[String]): Either[Rejection, String] = {
    if (path == null || path.isEmpty) return Left(Rejection("empty path"))
    if (path.contains("..")) return Left(Rejection("path traversal ('..')"))
    if (path.contains("\u0000")) return Left(Rejection("NUL byte in path"))
    val dot = path.lastIndexOf('.')
    val ext = if (dot < 0) "" else path.substring(dot).toLowerCase
    if (!allowedExtensions.contains(ext))
      return Left(Rejection(s"extension '$ext' not allowed"))
    Right(path)
  }

  /** Id-prefix must be a positive integer that keeps 13-digit ids
    * (`input.py` id-prefix validation; IDConfig constants.py:114-118).
    */
  def validateIdPrefix(prefix: Long): Either[Rejection, Long] =
    if (prefix >= 1000000000000L && prefix <= 8999999999999L) Right(prefix)
    else Left(Rejection("id prefix must be a 13-digit positive value"))
}

/** D3 — batch conversion over a directory of RDF files with an
  * associative result merge (reference:
  * `src/app/cli/commands/unified/convert.py:153-215` +
  * `ConversionResult.merge`). Files parse on executors (one per task);
  * per-file extraction outputs union; stats combine via the monoid.
  */
object BatchConvert {
  import org.apache.spark.sql.SparkSession
  import graft.rdf.TurtleParser
  import scala.jdk.CollectionConverters._

  final case class BatchResult(entities: DataFrame, rels: DataFrame,
                               skipped: DataFrame, stats: ConversionStats)

  def convertDirectory(spark: SparkSession, dir: String): BatchResult = {
    import spark.implicits._
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(_.toString).toSeq.sorted // deterministic order
      .filter(p => InputValidation.validatePath(p,
        InputValidation.TtlExtensions).isRight)
    val results = files.map { f =>
      val content = java.nio.file.Files.readString(java.nio.file.Paths.get(f))
      val triples = spark.createDataset(
        TurtleParser.parse(content,
          f.substring(f.lastIndexOf('.') + 1))).toDF().localCheckpoint()
      Extract.entityTypes(triples)
    }
    val entities = results.map(_._1).reduce(_ union _)
    val rels = results.map(_._2).reduce(_ union _)
    val skipped = results.map(_._3).reduce(_ union _)
    val stats = ConversionStats(
      entityTypes = entities.count(),
      relationshipTypes = rels.count(),
      skippedItems = skipped.count())
    BatchResult(entities, rels, skipped, stats)
  }
}
