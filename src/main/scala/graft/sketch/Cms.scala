package graft.sketch

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Count-Min Sketch — the mergeable FREQUENCY summary next to [[Kmv]]'s
  * cardinality one: per-token occurrence estimates over a corpus whose
  * exact histogram (one row per distinct token) is vocabulary-scale,
  * where the sketch is a fixed `depth × width` integer matrix. The
  * point estimate `min_i matrix[i][h_i(tok)]` never underestimates;
  * overestimates are bounded by ε·N with probability 1−δ for
  * width = e/ε, depth = ln(1/δ) (Cormode & Muthukrishnan 2005).
  *
  * Spark-first shape — the sketch is built RELATIONALLY, no custom
  * aggregation state: explode tokens to `depth` (row, bucket) cells,
  * then ONE hash aggregation keyed on (row, bucket). Map-side combine
  * bounds each task's shuffle write at depth × width counters and the
  * total matrix at depth × width rows regardless of corpus size; CMS
  * addition being commutative/associative integer sums makes the result
  * partitioning- and merge-order-invariant BY CONSTRUCTION — which is
  * why the whole sketch replays bit-exactly in the DuckDB oracle
  * (`sketch_cms`), unlike order-sensitive summaries (Misra-Gries).
  *
  * Hashing: row `i` uses the engine's FNV-1a-64 over the UTF-16 code
  * units of `"i:" + token` (the `fnvFoldSql` oracle convention);
  * bucket = low log2(width) bits — with width a power of two this is
  * the unsigned modulus, identical in signed arithmetic.
  */
object Cms {

  val Depth = 4
  val Width = 256 // power of two: & (Width-1) ≡ unsigned mod

  def bucket(row: Int, tok: String): Int =
    (graft.mix.Mix.fnv1a(s"$row:$tok") & (Width - 1)).toInt

  /** Column form of [[bucket]], via the native codegen'd
    * [[graft.functions.FnvHash]] expression — the whole matrix build
    * stays inside whole-stage codegen (no typed flatMap / encoder
    * round trip; parity with the scalar form is ScalaCheck'd).
    */
  def bucketCol(row: Int, tok: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    graft.functions.FnvHash(concat(lit(s"$row:"), tok))
      .bitwiseAND(lit((Width - 1).toLong)).cast("int")

  /** The sketch matrix (r, b, n) — ≤ Depth × Width rows. */
  def matrix(tokens: Dataset[String]): DataFrame =
    tokens.toDF("tok")
      .select(posexplode(array(
        (0 until Depth).map(i => bucketCol(i, col("tok"))): _*))
        .as(Seq("r", "b")))
      .groupBy("r", "b")
      .agg(count(lit(1)).as("n"))

  /** Point estimates for `queries`: (token, est) with
    * est = min over rows of the addressed cell (0 if a cell is empty —
    * the token was never seen). The matrix side is ≤ Depth × Width rows,
    * so the join broadcasts.
    */
  def estimates(tokens: Dataset[String], queries: Seq[String]): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val q = queries
      .flatMap(t => (0 until Depth).map(i => (t, i, bucket(i, t))))
      .toDF("token", "r", "b") // query-literal-sized, built driver-side
    q.join(broadcast(matrix(tokens)), Seq("r", "b"), "left_outer")
      .groupBy("token")
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}
