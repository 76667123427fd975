package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BOM-explosion laws: hand-computed closed form on a small tree,
  * equivalence with a naive path-product replay over the REAL part
  * hierarchy, and the depth bound that makes the iteration terminate.
  */
class BomSpec extends SparkSpec {
  import spark.implicits._

  test("closed form on the 7-node binary tree") {
    // parent(p) = p div 2, qty(p) = p mod 3 + 1 over p ∈ [2, 7]
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 4L, 2L), (2L, 5L, 3L),
      (3L, 6L, 1L), (3L, 7L, 2L)).toDF("anc", "dsc", "qty")
    val got = RelationalQueries.bomClosure(e)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // direct edges at depth 1
    assert(got((1L, 2L)) == ((3L, 1L)) && got((2L, 5L)) == ((3L, 1L)))
    // grandchildren: qty products along the unique path
    assert(got((1L, 4L)) == ((3L * 2L, 2L)))  // 1→2 (3) → 4 (2)
    assert(got((1L, 5L)) == ((3L * 3L, 2L)))
    assert(got((1L, 6L)) == ((1L * 1L, 2L)))
    assert(got((1L, 7L)) == ((1L * 2L, 2L)))
    assert(got.size == 6 + 4) // 6 edges + 4 depth-2 pairs, nothing else
  }

  test("≡ naive path-product replay over the real part hierarchy") {
    val dir = "/root/testdata/sf0.001"
    val keys = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").cast("long")).collect().map(_.getLong(0))
      .filter(k => k >= 2 && k <= 255).toSet
    def qty(p: Long) = p % 3 + 1
    // naive: walk each node up to the root, emitting (anc, node) pairs
    val expect = (for {
      d <- keys.toSeq
      path = Iterator.iterate(d)(_ / 2).takeWhile(_ >= 1).toSeq
      (anc, i) <- path.tail.zipWithIndex
      // qty product over the child-side nodes of the path prefix
      q = path.take(i + 1).map(qty).product
      if anc >= 1 && path.take(i + 1).forall(keys.contains)
    } yield (anc, d) -> ((q, i + 1L))).toMap
    val got = RelationalQueries.q30Bom(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
  }

  test("depth is bounded by log2 of the key cap") {
    val got = RelationalQueries.q30Bom(spark, "/root/testdata/sf0.001")
      .agg(max("depth")).head().getLong(0)
    assert(got <= 7L)
  }
}
