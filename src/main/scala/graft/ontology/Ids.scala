package graft.ontology

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic content-hash IDs (K2).
  *
  * The reference has two id schemes: a mutable sequential counter
  * (`src/shared/utilities/id_generator.py:23-135` — unusable in a
  * distributed plan) and a deterministic hash scheme used by the DTDL path
  * (`src/formats/dtdl/dtdl_converter.py:486-527`):
  *
  *  - entity id  = `prefix + (uint64_be(sha256(key)[0:8]) % 10^12)`
  *    rendered as a decimal string (13 digits with the default prefix
  *    `constants.py:116` = 1_000_000_000_000);
  *  - property id = `entityId + zeroPad4(uint32(md5(name)[0:8 hex]) % 10^4)`.
  *
  * We adopt the hash scheme everywhere (SURVEY §7.1): it is
  * embarrassingly parallel, stable across runs/partitionings, and
  * expressible as pure Column expressions (`sha2`/`md5`/`conv`) that stay
  * inside whole-stage codegen — no driver-side counter bottleneck at
  * 100 TB.
  */
object Ids {
  val DefaultPrefix: Long = 1000000000000L
  val Mod: Long = 1000000000000L

  /** Pure form: `dtdl_converter.py:502-511`. */
  def entityId(key: String, prefix: Long = DefaultPrefix): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (prefix + java.lang.Long.remainderUnsigned(h, Mod)).toString
  }

  /** Pure form: `dtdl_converter.py:514-527`. */
  def propertyId(baseId: String, propertyName: String): String = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(propertyName.getBytes(StandardCharsets.UTF_8))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val sub = java.lang.Long.parseLong(hex, 16) % 10000
    f"$baseId$sub%04d"
  }

  /** Column form of [[entityId]] — `sha2`/`conv` built-ins, codegen'd.
    * `conv(hex, 16, 10)` yields the unsigned decimal of the first 8 hash
    * bytes, matching Python's `int.from_bytes(..., 'big')`.
    */
  def entityIdCol(key: Column, prefix: Long = DefaultPrefix): Column = {
    val h = conv(substring(sha2(key, 256), 1, 16), 16, 10).cast(DecimalType(38, 0))
    (h % lit(Mod) + lit(prefix)).cast("long").cast("string")
  }

  /** Column form of [[propertyId]]. */
  def propertyIdCol(baseId: Column, propertyName: Column): Column = {
    val sub = conv(substring(md5(propertyName), 1, 8), 16, 10).cast("long") % 10000
    concat(baseId, lpad(sub.cast("string"), 4, "0"))
  }

  /** Relationship id: hash of the unique pair key
    * `"{propUri}::{domainUri}->{rangeUri}"` (`property_extractor.py:399-404`
    * keys relationships this way; we derive the id from the same key so the
    * m×n expansion J4 stays deterministic under any partitioning).
    */
  def relId(propUri: String, domainUri: String, rangeUri: String): String =
    entityId(s"$propUri::$domainUri->$rangeUri",
      DefaultPrefix + 100000000L) // RELATIONSHIP_ID_OFFSET, constants.py:126

  def relIdCol(propUri: Column, domainUri: Column, rangeUri: Column): Column =
    entityIdCol(concat(propUri, lit("::"), domainUri, lit("->"), rangeUri),
      DefaultPrefix + 100000000L)
}
