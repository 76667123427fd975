package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line on stdout.
  *
  * Methodology: a session warmup (JVM + codegen paths), then each query
  * runs twice and reports the faster run — steady-state numbers rather
  * than first-touch JIT noise. Headline throughput is the end-to-end KG
  * construction rate (documents/sec through extract → mentions →
  * triples → canonicalize, the north-rule pipeline) measured on the pure
  * in-memory path.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table + run one small agg to initialize codegen,
    // parquet footers and the shuffle machinery
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    SparkEntry.queries.get("q1_agg").foreach(f => f(spark, sfDir).count())

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // host-load evidence: the artifact of record must be able to defend
    // its own numbers against external load on a shared host (round-3
    // verdict: a front-end headline with no load context read as a 3x
    // regression). 1-minute loadavg sampled at start / before the
    // front-end headline / end.
    def loadAvg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loadStart = loadAvg()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to 2).map { _ =>
        try time(fn(spark, sfDir).count())
        catch { case _: Throwable => Double.MaxValue }
      }
      name -> runs.min
    }

    // headline: KG pipeline docs/sec (north-rule throughput)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val kgSecs = time {
      queries.KgQueries.kgCanonical(spark, sfDir).count()
    }
    val docsPerSec = nDocs / kgSecs

    // headline 2: steady-state front-end rate — the SAME job ScalingBench
    // times at two parallelism levels (html synth → extract → trie scan →
    // TF-IDF + fused co-occurrence), REP-replicated to amortize overhead
    val loadMid = loadAvg()
    val (feDocs, feReps) = {
      import org.apache.spark.sql.functions._
      // Replication amortizes fixed overhead at tiny SF but must shrink as
      // the corpus grows or the localCheckpoint caches REP× the whole
      // corpus (advisor: OOM hazard at large SF). Cap the replicated row
      // count; SPARK_GRAFT_REP overrides the base factor.
      val baseRep = sys.env.get("SPARK_GRAFT_REP").map(_.toInt).getOrElse(256)
      val maxReplicatedRows = 2000000L
      val rep = math.max(1L, math.min(baseRep.toLong,
        maxReplicatedRows / math.max(1L, nDocs))).toInt
      val replicated = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .crossJoin(spark.range(rep).toDF("rep"))
        .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
          col("text"), col("lang"), col("source"))
        .repartition(cpus.toInt * 4)
        .localCheckpoint()
      val n = replicated.count()
      val gaz = graft.extract.Gazetteer(graft.extract.Gazetteer.DefaultEntities)
      val bc = spark.sparkContext.broadcast(gaz)
      val entitiesSorted = graft.model.CodePoint.sorted(graft.extract.Gazetteer.DefaultEntities)
      val bcIdx = spark.sparkContext.broadcast(entitiesSorted.zipWithIndex.toMap)
      def runOnce(): Unit =
        ScalingBench.frontEndOnce(replicated, bc, bcIdx, entitiesSorted, n)
      runOnce() // warm
      val nReps = sys.env.get("SPARK_GRAFT_FE_REPS").map(_.toInt).getOrElse(3)
      (n, (1 to nReps).map(_ => time(runOnce())))
    }
    val feSecs = feReps.min  // steady-state headline: min of warm reps
    val feDocsPerSec = feDocs / feSecs
    val loadEnd = loadAvg()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val feRepsJson = feReps.mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","parallelism":$cpus,"n_queries":${results.size},"kg_docs_per_sec":$docsPerSec,"kg_pipeline_sec":$kgSecs,"n_docs":$nDocs,"front_end_docs_per_sec":$feDocsPerSec,"front_end_docs":$feDocs,"front_end_sec":$feSecs,"front_end_reps":$feRepsJson,"front_end_n_reps":${feReps.size},"load_avg":{"start":$loadStart,"pre_front_end":$loadMid,"end":$loadEnd}}""")
    spark.stop()
  }
}
