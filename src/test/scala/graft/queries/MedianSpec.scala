package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** q19's exact-median algebra: the two-middle-row selection plus the
  * SUM(mid)·(3−|mid|)/2 reassembly equals the textbook sorted-array
  * median on odd AND even group sizes, including tie-heavy groups.
  */
class MedianSpec extends SparkSpec {
  import spark.implicits._

  private def engineMedian(rows: Seq[(String, Double)]): Map[String, Double] = {
    val df = rows.zipWithIndex
      .map { case ((g, v), i) => (g, v, i.toLong) }
      .toDF("g", "v", "k")
      .select(col("g"), col("v").cast(DecimalType(18, 2)).as("tp"), col("k"))
    val w = Window.partitionBy(col("g")).orderBy(col("tp"), col("k"))
    val wn = Window.partitionBy(col("g"))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(wn))
      .filter(expr("rn = (cnt + 1) div 2 OR rn = (cnt + 2) div 2"))
      .groupBy(col("g"))
      .agg((sum(col("tp")) * (lit(3) - count(lit(1)))).as("med2"))
      .select(col("g"), (col("med2").cast("double") / 2.0).as("m"))
      .as[(String, Double)].collect().toMap
  }

  /** Same float path as the engine: values are exact DECIMAL(18,2)
    * cents, the two-middle SUM is exact in cents, and only the final
    * /100 and /2 are double ops (halving is exact; a double-sum brute
    * comparator would differ by an ulp on cases like 0.05+0.15).
    */
  private def bruteMedian(vs: Seq[Double]): Double = {
    val c = vs.map(v => math.round(v * 100)).sorted
    val n = c.length
    if (n % 2 == 1) (2 * c(n / 2)) / 100.0 / 2.0
    else ((c(n / 2 - 1) + c(n / 2)) / 100.0) / 2.0
  }

  test("matches sorted-array median for odd, even, and tied groups") {
    val data = Seq(
      "odd" -> Seq(5.0, 1.0, 9.0),
      "even" -> Seq(4.0, 8.0, 1.0, 3.0),
      "ties" -> Seq(2.0, 2.0, 2.0, 7.0),
      "one" -> Seq(42.5),
      "two" -> Seq(1.25, 2.75))
    val rows = data.flatMap { case (g, vs) => vs.map(g -> _) }
    val got = engineMedian(rows)
    data.foreach { case (g, vs) =>
      assert(got(g) == bruteMedian(vs), s"group $g")
    }
  }

  test("random groups agree with brute force") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      (s"g${i % 11}", (rnd.nextInt(20000) / 100.0))
    }
    val got = engineMedian(rows)
    rows.groupBy(_._1).foreach { case (g, rs) =>
      assert(got(g) == bruteMedian(rs.map(_._2)), s"group $g")
    }
  }
}
