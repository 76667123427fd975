package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def spreadJvm(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  private def zJvm(a: Long, b: Long): Long =
    spreadJvm(a) | (spreadJvm(b) << 1)

  /** Bit-by-bit Morton reference, independent of the magic numbers. */
  private def zNaive(a: Long, b: Long): Long =
    (0 until 32).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zvalue ≡ bit-by-bit Morton interleave (property)") {
    val coord = Gen.oneOf(Gen.choose(0L, 20L), Gen.choose(0L, Int.MaxValue.toLong))
    val p = Prop.forAll(Gen.listOfN(24, Gen.zip(coord, coord))) { pts =>
      pts.isEmpty || {
        pts.foreach { case (a, b) =>
          assert(zJvm(a, b) == zNaive(a, b), s"magic-number drift at ($a,$b)")
        }
        val got = pts.toDF("a", "b")
          .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b")))
          .as[(Long, Long, Long)].collect()
        got.forall { case (a, b, z) => z == zNaive(a, b) }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(8).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  test("zsort follows the unsigned Z-curve across the sign boundary") {
    // b >= 2^31 sets zvalue's bit 63; signed order on zvalue would put
    // those rows FIRST — zsort must keep them after the b < 2^31 rows
    val pts = Seq((0L, 0L), (5L, 7L), (0L, (1L << 31)),
      (123L, (1L << 32) - 1L))
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zsort(col("a"), col("b")).as("z"))
      .orderBy("z")
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2))
    assert(got.toSeq == Seq((0L, 0L), (5L, 7L), (0L, 1L << 31),
      (123L, (1L << 32) - 1L)),
      s"unsigned Z walk violated: ${got.toSeq}")
  }

  test("cluster preserves the row multiset and tightens per-file ranges") {
    val n = 4096
    // uniform grid: under id-order each output file spans the full y
    // domain; under z-order every file is a compact (x, y) box
    val df = spark.range(n).select(
      (col("id") % 64).as("x"), expr("id div 64").as("y"),
      col("id").as("payload"))
    val out = s"${System.getProperty("java.io.tmpdir")}/zorder_spec_${System.nanoTime()}"
    ZOrder.cluster(df, "x", "y", numFiles = 16)
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == n)
    assert(back.agg(sum("payload")).head.getLong(0) ==
      df.agg(sum("payload")).head.getLong(0))
    // per-file envelope area: z-clustered files cover ~1/16 of the
    // plane each; compute max area over files and assert it's far below
    // the whole domain (64 × 64)
    val areas = back
      .select(input_file_name().as("f"), col("x"), col("y"))
      .groupBy("f")
      .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
      .as[(String, Long)].collect().map(_._2)
    assert(areas.length == 16, s"expected 16 files, got ${areas.length}")
    assert(areas.max <= (64L * 64L) / 2,
      s"z-clustered file spans most of the plane: max area ${areas.max}")
  }
}
