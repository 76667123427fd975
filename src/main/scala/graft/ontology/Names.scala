package graft.ontology

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Name pipeline F1-F7: URI → local name → sanitized Fabric identifier.
  *
  * Parity contract (reference: `src/formats/rdf/uri_utils.py:33-142`):
  *  - local name = fragment after `#`, else after last `/`, else whole URI;
  *  - invalid chars (non letter/digit/underscore) → `_`;
  *  - prepend `E_` if first char is not a letter;
  *  - truncate to 128 chars (DTDL variant truncates to 90,
  *    `dtdl_converter.py:1079-1103`; exporter prefixes `C_`,
  *    `fabric_to_ttl.py:63-70`; ontology names cap 100 with `O_`,
  *    `rdf_converter.py:468-475`);
  *  - fallback `Unknown_{n}` / `Entity_{n}` for null/empty.
  *
  * Implemented twice, deliberately: pure Scala (unit/ScalaCheck-tested,
  * used inside typed closures) and as codegen-friendly Column expressions
  * (`regexp_*` built-ins) for the relational path. A spec asserts the two
  * agree.
  */
object Names {

  /** F1 `uri_to_name` (`uri_utils.py:33-69`). */
  def uriToName(uri: String, fallbackCounter: Int = 0): String = {
    if (uri == null) return s"Unknown_$fallbackCounter"
    val s = uri.trim
    if (s.isEmpty) return s"Unknown_$fallbackCounter"
    val name =
      if (s.contains('#')) s.substring(s.lastIndexOf('#') + 1)
      else if (s.contains('/')) s.substring(s.lastIndexOf('/') + 1)
      else s
    if (name.isEmpty) s"Entity_$fallbackCounter"
    else sanitizeName(name, fallbackCounter)
  }

  /** F2 `sanitize_name` (`uri_utils.py:71-103`). */
  def sanitizeName(name: String, fallbackCounter: Int = 0,
                   prefix: String = "E_", maxLen: Int = 128): String = {
    if (name == null || name.isEmpty) return s"Entity_$fallbackCounter"
    val cleaned = name.map(c => if (Character.isLetterOrDigit(c) || c == '_') c else '_')
    if (cleaned.isEmpty) s"Entity_$fallbackCounter"
    else {
      val prefixed =
        if (!Character.isLetter(cleaned.charAt(0))) prefix + cleaned else cleaned
      prefixed.take(maxLen)
    }
  }

  /** F3 DTDL variant: truncate 90 (`dtdl_converter.py:1079-1103`). */
  def sanitizeNameDtdl(name: String): String = sanitizeName(name, maxLen = 90)

  /** F4 exporter variant: prefix `C_`, fallback `UnnamedClass`
    * (`fabric_to_ttl.py:63-70`).
    */
  def sanitizeNameExport(name: String): String =
    if (name == null || name.isEmpty) "UnnamedClass"
    else sanitizeName(name, prefix = "C_")

  /** F5 ontology-name cleanup (`rdf_converter.py:722-728`): REPLACE
    * every non-[alnum_] char with '_' (not filter), truncate to 100
    * FIRST, then prefix `O_` when the first char is not a letter (so
    * the result may reach 102 chars, as in the reference).
    */
  def sanitizeOntologyName(name: String): String = {
    if (name == null || name.isEmpty) return "ImportedOntology"
    val cleaned = name
      .map(c => if (Character.isLetterOrDigit(c) || c == '_') c else '_')
      .take(100)
    if (!Character.isLetter(cleaned.charAt(0))) "O_" + cleaned else cleaned
  }

  /** F6 validity predicate `^[letter][letter|digit|_]{0,127}$`
    * (`uri_utils.py:125-142`).
    */
  def isValidFabricName(name: String): Boolean =
    name != null && name.nonEmpty && name.length <= 128 &&
      Character.isLetter(name.charAt(0)) &&
      name.forall(c => Character.isLetterOrDigit(c) || c == '_')

  // ----- Column (codegen) forms --------------------------------------------

  /** F1 as Column: local name after `#` else after last `/`. */
  def uriToNameCol(uri: Column): Column = {
    val frag = regexp_extract(uri, "([^#]*)$", 1)
    val local = when(uri.contains("#"), frag)
      .otherwise(when(uri.contains("/"), regexp_extract(uri, "([^/]*)$", 1))
        .otherwise(uri))
    sanitizeNameCol(local)
  }

  /** F2 as Column (Unicode letter/digit classes match
    * `Character.isLetterOrDigit`).
    */
  def sanitizeNameCol(name: Column, prefix: String = "E_",
                      maxLen: Int = 128): Column = {
    val cleaned = regexp_replace(name, "[^\\p{L}\\p{N}_]", "_")
    val prefixed = when(cleaned.rlike("^[\\p{L}]"), cleaned)
      .otherwise(concat(lit(prefix), cleaned))
    when(name.isNull || length(name) === 0, lit("Entity_0"))
      .otherwise(substring(prefixed, 1, maxLen))
  }

  /** F6 as Column. */
  def isValidFabricNameCol(name: Column): Column =
    name.rlike("^[\\p{L}][\\p{L}\\p{N}_]{0,127}$")
}
