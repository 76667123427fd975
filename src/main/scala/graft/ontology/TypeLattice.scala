package graft.ontology

import graft.rdf.Vocab

/** XSD → Fabric value-type lattice.
  *
  * Parity contract with the reference's mapping table and 5-tier union
  * resolution (reference: `src/formats/rdf/type_mapper.py:20-87`, resolution
  * order at 75-87 / 135-166): Boolean > BigInt > Double > DateTime > String,
  * most restrictive tier containing any member wins; unknown types default
  * to String.
  *
  * In Spark plans the scalar mapping is applied either via the pure function
  * (inside typed transformations) or via the broadcast-literal map Column
  * (see [[TypeLattice.fabricTypeCol]]), both codegen-friendly.
  */
object TypeLattice {
  import Vocab.XSD

  val StringT = "String"
  val BooleanT = "Boolean"
  val DateTimeT = "DateTime"
  val BigIntT = "BigInt"
  val DoubleT = "Double"

  /** `type_mapper.py:20-72`. */
  val xsdToFabric: Map[String, String] = Map(
    // String types
    XSD + "string" -> StringT,
    XSD + "anyURI" -> StringT,
    XSD + "normalizedString" -> StringT,
    XSD + "token" -> StringT,
    XSD + "language" -> StringT,
    XSD + "Name" -> StringT,
    XSD + "NCName" -> StringT,
    XSD + "NMTOKEN" -> StringT,
    // Boolean
    XSD + "boolean" -> BooleanT,
    // Date/Time
    XSD + "dateTime" -> DateTimeT,
    XSD + "date" -> DateTimeT,
    XSD + "dateTimeStamp" -> DateTimeT,
    XSD + "time" -> StringT,          // time-only preserved as String
    XSD + "duration" -> StringT,      // ISO 8601 string
    XSD + "dayTimeDuration" -> StringT,
    XSD + "yearMonthDuration" -> StringT,
    // Integers (13 variants)
    XSD + "integer" -> BigIntT,
    XSD + "int" -> BigIntT,
    XSD + "long" -> BigIntT,
    XSD + "short" -> BigIntT,
    XSD + "byte" -> BigIntT,
    XSD + "nonNegativeInteger" -> BigIntT,
    XSD + "positiveInteger" -> BigIntT,
    XSD + "nonPositiveInteger" -> BigIntT,
    XSD + "negativeInteger" -> BigIntT,
    XSD + "unsignedInt" -> BigIntT,
    XSD + "unsignedLong" -> BigIntT,
    XSD + "unsignedShort" -> BigIntT,
    XSD + "unsignedByte" -> BigIntT,
    // Floating point (decimal → Double: documented precision loss)
    XSD + "double" -> DoubleT,
    XSD + "float" -> DoubleT,
    XSD + "decimal" -> DoubleT,
    // Binary stored as string
    XSD + "base64Binary" -> StringT,
    XSD + "hexBinary" -> StringT,
    // Other
    XSD + "QName" -> StringT,
    XSD + "NOTATION" -> StringT
  )

  /** Union-resolution hierarchy, most → least restrictive
    * (`type_mapper.py:75-87`).
    */
  val hierarchy: Seq[(Set[String], String)] = Seq(
    Set(XSD + "boolean") -> BooleanT,
    Set("integer", "int", "long", "short", "byte", "nonNegativeInteger",
      "positiveInteger", "unsignedInt", "unsignedLong", "unsignedShort",
      "unsignedByte", "nonPositiveInteger", "negativeInteger")
      .map(XSD + _) -> BigIntT,
    Set("double", "float", "decimal").map(XSD + _) -> DoubleT,
    Set("dateTime", "date", "dateTimeStamp").map(XSD + _) -> DateTimeT,
    Set("string", "anyURI", "normalizedString", "token", "language", "Name",
      "NCName", "NMTOKEN", "time", "duration", "dayTimeDuration",
      "yearMonthDuration", "base64Binary", "hexBinary", "QName", "NOTATION")
      .map(XSD + _) -> StringT
  )

  /** `type_mapper.py:106-120`: unknown / null → String. */
  def fabricType(xsdUri: String): String =
    if (xsdUri == null) StringT else xsdToFabric.getOrElse(xsdUri, StringT)

  def isKnown(xsdUri: String): Boolean = xsdToFabric.contains(xsdUri)

  def isXsd(uri: String): Boolean =
    uri != null && (xsdToFabric.contains(uri) || uri.startsWith(XSD))

  /** Resolve a set of XSD types to the most restrictive compatible Fabric
    * type (`type_mapper.py:135-166`). Empty / unknown-only sets → String.
    */
  def resolveUnion(typesFound: Set[String]): String = {
    if (typesFound.isEmpty) StringT
    else hierarchy
      .collectFirst { case (tier, fabric) if tier.exists(typesFound) => fabric }
      .getOrElse(StringT)
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Column form of [[fabricType]]: broadcast literal map + element_at,
    * fully codegen'd (no UDF).
    */
  def fabricTypeCol(xsdUri: Column): Column = {
    val m = typedLit(xsdToFabric)
    coalesce(element_at(m, xsdUri), lit(StringT))
  }

  /** Column predicate: is this URI an XSD datatype (known table entry or
    * xsd-namespace prefixed)? Mirrors `property_extractor.py:186-190`.
    */
  def isXsdCol(uri: Column): Column =
    element_at(typedLit(xsdToFabric), uri).isNotNull || uri.startsWith(XSD)
}
