package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY §2) to a
  * DataFrame program over the testdata parquet tables; `oracleSql` carries
  * the equivalent DuckDB SQL the driver uses as a correctness oracle.
  * Column names and ordering semantics are aligned pairwise (see
  * RelationalQueries scaladoc for the decimal-exactness convention).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The north-rule pipeline end-to-end: pages → byte-identical text →
    * gazetteer mentions → triples → connected-component canonicalization.
    */
  def entry(spark: SparkSession): DataFrame =
    KgQueries.kgCanonical(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ KgQueries.queries ++ DataQueries.queries ++ OntologyQueries.queries ++ SchemaFormatQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ KgQueries.oracles ++ DataQueries.oracles ++ OntologyQueries.oracles ++ SchemaFormatQueries.oracles
}
