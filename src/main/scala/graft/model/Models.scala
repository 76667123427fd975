package graft.model

import java.sql.Timestamp

/** Core data model of the engine.
  *
  * Mirrors the reference's output model (reference:
  * `src/shared/models/fabric_types.py:16-176`) re-expressed as Spark-encodable
  * case classes, plus the web-scale input model from BASELINE.json's
  * `input_hint` (`url, warc_ts, html, text, lang`).
  */

/** One RDF triple / quad. Reference IR: rdflib graph rows
  * (`src/formats/rdf/rdf_parser.py:281-285`). `oKind` discriminates
  * uri | bnode | literal, replacing rdflib's node classes.
  */
final case class Triple(
    s: String,
    p: String,
    o: String,
    oKind: String,            // "uri" | "bnode" | "literal"
    oDatatype: Option[String] = None,
    graph: Option[String] = None,
    lang: Option[String] = None  // BCP-47 tag for rdf:langString literals
)

/** A Common-Crawl-style web page (BASELINE.json input_hint). */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** A detected gazetteer mention inside a page/document. */
final case class Mention(
    docId: Long,
    entity: String,      // canonical gazetteer entry id
    surface: String,     // matched surface form
    begin: Int,          // char offset in text
    end: Int,
    score: Double        // link confidence (tf-idf / context window)
)

/** Entity-type property (reference `fabric_types.py:16-57`). */
final case class Prop(
    id: String,
    name: String,
    valueType: String,   // String | Boolean | DateTime | BigInt | Double
    isTimeseries: Boolean = false
)

/** Entity type (reference `fabric_types.py:60-118`). */
final case class EntityType(
    id: String,
    name: String,
    uri: String,
    baseEntityTypeId: Option[String] = None,
    entityIdParts: Seq[String] = Nil,
    displayNamePropertyId: Option[String] = None,
    properties: Seq[Prop] = Nil,
    timeseriesProperties: Seq[Prop] = Nil
)

/** Relationship type (reference `fabric_types.py:136-176`): one row per
  * (property, domain, range) pair after m×n expansion
  * (`property_extractor.py:389-407`).
  */
final case class Rel(
    id: String,
    name: String,
    uri: String,
    srcEntityTypeId: String,
    dstEntityTypeId: String,
    srcUri: String,
    dstUri: String
)

/** Skipped-item ledger row (reference `src/shared/models/conversion.py:15-51`). */
final case class Skipped(
    itemType: String,
    name: String,
    reason: String,
    uri: String
)

/** Validation issue (reference `preflight_validator.py:24-74`). */
final case class Issue(
    category: String,
    severity: String,    // "info" | "warning" | "error"
    message: String,
    uri: String
)

/** Associative conversion ledger (reference `conversion.py:54-195`; the
  * `merge()` monoid at 176-195). Combines per-partition partials.
  */
final case class ConversionStats(
    entityTypes: Long = 0L,
    relationshipTypes: Long = 0L,
    skippedItems: Long = 0L,
    warnings: Long = 0L,
    tripleCount: Long = 0L
) {
  def merge(other: ConversionStats): ConversionStats = ConversionStats(
    entityTypes + other.entityTypes,
    relationshipTypes + other.relationshipTypes,
    skippedItems + other.skippedItems,
    warnings + other.warnings,
    tripleCount + other.tripleCount
  )
  /** converted / (converted + skipped), as `conversion.py:87-104`. */
  def successRate: Double = {
    val converted = entityTypes + relationshipTypes
    val total = converted + skippedItems
    if (total == 0) 1.0 else converted.toDouble / total
  }
}
