package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.ConnectedComponents
import graft.dedup.Dedup

/** Round-3 scale-stress (judge ask #7): run the flagship operators at
  * ~10× the bench scale (sf0.1 × REP ≈ sf1) and record the two numbers
  * that prove the 100 TB shape:
  *  - CC: rounds to fixpoint at 1× and REP× — must grow like log n, not n
  *    (replicas are BRIDGED into one graph so components genuinely grow;
  *    disjoint copies would leave the diameter unchanged and prove
  *    nothing);
  *  - dedup tiers: candidate-pair and verified-pair totals at 1× and
  *    REP× — must scale ∝ corpus (planted dups), never quadratically.
  *    Replica texts are word-salted (`w` → `w~k`) and replica embeddings
  *    are rotated by k positions, so cross-replica rows share no shingles
  *    / have random cosine: the only true dups are the per-replica
  *    planted ones, and the expected ratio is exactly REP.
  *  - kg front end: docs/sec at 1× vs REP× — flat throughput.
  *
  * Deterministic end to end (id shifts, salts and rotations are pure
  * functions of replica index). Prints one JSON line; results go into
  * BENCH.md's scale-stress section.
  */
object StressBench {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_STRESS_REP", "10").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_STRESS_OUT", "/tmp/graft_stress")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val reps = spark.range(rep).toDF("k")

    // ---- stress corpora (written once per run, overwrite) --------------
    val docs = spark.read.parquet(s"$base/documents.parquet")
    // dd corpus: word-salt replica k>0 so cross-replica docs share no
    // 3-gram shingles; planted-dup structure (doc_id % 20 / % 40) is
    // preserved because shifts are multiples of 1e8
    docs.crossJoin(reps).select(
        (col("doc_id") + col("k") * 100000000L).as("doc_id"),
        when(col("k") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1~"), col("k")))).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/dd/documents.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    // rotate replica k's vectors by k: permutations preserve planted-twin
    // cosine but randomize cross-replica cosine
    emb.crossJoin(reps).select(
        (col("vec_id") + col("k") * 100000000L).as("vec_id"),
        concat(slice(col("embedding"), col("k") + 1, lit(dim) - col("k")),
          slice(col("embedding"), lit(1), col("k"))).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$out/dd/embeddings.parquet")
    // kg corpus: plain replication (gazetteer tokens must stay intact)
    docs.crossJoin(reps).select(
        (col("doc_id") + col("k") * 100000000L).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/kg/documents.parquet")

    // ---- CC rounds at 1x and REPx --------------------------------------
    val li = spark.read.parquet(s"$base/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    def edges1x = li.select(
      concat(lit("o"), col("ok")).as("a"), concat(lit("p"), col("pk")).as("b"))
    def edgesNx = {
      val repl = li.crossJoin(reps).select(
        concat(lit("o"), col("ok") + col("k") * 10000000L).as("a"),
        concat(lit("p"), col("pk") + col("k") * 10000000L).as("b"))
      // bridges chain replica k to k+1 through ~0.1% of orders, so the
      // REPx graph is ONE graph with genuinely larger components
      val bridges = li.filter(col("ok") % 997 === 0).select("ok").distinct()
        .crossJoin(spark.range(rep - 1).toDF("k")).select(
          concat(lit("o"), col("ok") + col("k") * 10000000L).as("a"),
          concat(lit("o"), col("ok") + (col("k") + 1) * 10000000L).as("b"))
      repl.union(bridges)
    }
    def ccStats(e: DataFrame): (Long, Long, Long, Int, Double) = {
      val edges = e.localCheckpoint()
      val nEdges = edges.count()
      val ((comp, rounds), secs) = time {
        val (c, r) = ConnectedComponents.runWithRounds(edges)
        (c.localCheckpoint(), r)
      }
      (nEdges, comp.count(), comp.select("component").distinct().count(),
        rounds, secs)
    }
    val (e1, n1, c1, r1, s1) = ccStats(edges1x)
    val (eN, nN, cN, rN, sN) = ccStats(edgesNx)

    // ---- dedup candidate/verified totals at 1x and REPx -----------------
    val params = Dedup.MinHashParams(numHashes = 64, bands = 16, seed = 42L)
    def mhStats(dir: String): (Long, Long, Double) = {
      val corpus = graft.queries.DataQueries.minhashCorpus(spark, dir)
        .localCheckpoint()
      val cand = Dedup.minHashCandidatePairs(corpus, 3, params)
        .localCheckpoint()
      val nCand = cand.count()
      val (nVer, secs) = time {
        Dedup.minHashCandidates(corpus, 3, params, 0.8).count()
      }
      (nCand, nVer, secs)
    }
    val (mhCand1, mhVer1, mhSec1) = mhStats(base)
    val (mhCandN, mhVerN, mhSecN) = mhStats(s"$out/dd")

    def embStats(dir: String): (Long, Double) =
      time(graft.queries.DataQueries.ddEmbed(spark, dir).count())
    val (emb1, embSec1) = embStats(base)
    val (embN, embSecN) = embStats(s"$out/dd")

    // ---- kg front-end throughput at 1x and REPx -------------------------
    def kgStats(dir: String): (Long, Double) = {
      val n = spark.read.parquet(s"$dir/documents.parquet").count()
      val (_, secs) = time(
        graft.queries.KgQueries.kgCanonical(spark, dir).count())
      (n, secs)
    }
    val (kgN1, kgSec1) = kgStats(base)
    val (kgNN, kgSecN) = kgStats(s"$out/kg")

    println(
      s"""{"rep":$rep,"base":"$base",
         |"cc_1x":{"edges":$e1,"nodes":$n1,"components":$c1,"rounds":$r1,"sec":$s1},
         |"cc_Nx":{"edges":$eN,"nodes":$nN,"components":$cN,"rounds":$rN,"sec":$sN},
         |"minhash_1x":{"candidates":$mhCand1,"verified":$mhVer1,"sec":$mhSec1},
         |"minhash_Nx":{"candidates":$mhCandN,"verified":$mhVerN,"sec":$mhSecN},
         |"embed_1x":{"pairs":$emb1,"sec":$embSec1},
         |"embed_Nx":{"pairs":$embN,"sec":$embSecN},
         |"kg_1x":{"docs":$kgN1,"sec":$kgSec1,"docs_per_sec":${kgN1 / kgSec1}},
         |"kg_Nx":{"docs":$kgNN,"sec":$kgSecN,"docs_per_sec":${kgNN / kgSecN}}}"""
        .stripMargin.replace("\n", ""))
    spark.stop()
  }
}
