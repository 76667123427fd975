package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-4 verdict #6: phase snapshots `components`/`canonical` commit
  * BUCKETED by their merge-probe keys (node / s), so the fallback
  * sort-merge joins a future merge runs against them (batch maps too big
  * for the broadcast guards) are co-located on the corpus side — zero
  * exchanges over the snapshot.
  */
class KgBucketedSnapshotSpec extends SparkSpec {

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case q: ShuffleQueryStageExec => 1 + q.plan.children.map(count).sum
      case q: QueryStageExec => count(q.plan)
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      case e: ShuffleExchangeLike => 1 + e.children.map(count).sum
      case other => other.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  test("merge-probe joins over bucketed snapshots: corpus side has no exchange") {
    val out = Files.createTempDirectory("kgbucketed").toString
    KgPipeline.run(spark, "/root/testdata/sf0.001", out)
    // the snapshots advertise their bucketed layout
    assert(Files.exists(java.nio.file.Paths.get(
      s"$out/phase=canonical/_BUCKETED")))
    assert(Files.exists(java.nio.file.Paths.get(
      s"$out/phase=components/_BUCKETED")))

    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      val canonical = KgPipeline.loadCanonical(spark, out)
      val components = KgPipeline.loadComponents(spark, out)
      // the rewrite-shape join: canonical ⋈ rename-map on s. Over the
      // bucketed snapshot only the MAP side shuffles (to the bucket
      // layout); the corpus side reads co-located.
      val renameMap = canonical.select(col("s").as("s"))
        .distinct().limit(50)
        .withColumn("sNew", concat(col("s"), lit("#new")))
        .localCheckpoint() // a plain ∝-batch input, not a derived plan
      val sJoin = canonical.join(renameMap, Seq("s"))
      val nS = countShuffles(sJoin)
      assert(nS <= 1, s"prev canonical side must not shuffle (got $nS)")
      // the component-map probe: components ⋈ batch nodes on node
      val nodes = components.select("node").distinct().limit(50)
        .localCheckpoint()
      val nodeJoin = components.join(nodes, Seq("node"), "left_semi")
      val nN = countShuffles(nodeJoin)
      assert(nN <= 1, s"prev components side must not shuffle (got $nN)")

      // control: the same joins over the RAW parquet dirs shuffle BOTH
      // sides (no bucket metadata without the catalog table)
      val rawCanonical = spark.read.parquet(s"$out/phase=canonical")
      val nRaw = countShuffles(rawCanonical.join(renameMap, Seq("s")))
      assert(nRaw >= 2, s"control: raw read must shuffle both sides ($nRaw)")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("re-registration uses the WRITTEN bucket layout, not the session conf") {
    val out = Files.createTempDirectory("kgbucketconf").toString
    KgPipeline.run(spark, "/root/testdata/sf0.001", out)
    val full = KgPipeline.loadCanonical(spark, out)
      .collect().map(_.toString).sorted.toSeq
    // drop the tables, then change the bucket-count conf: the marker
    // (written layout) must win at re-registration — claiming the new
    // conf's layout over old file names would silently mis-join
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_snap_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val saved = spark.conf.getOption("spark.graft.snapshotBuckets")
    spark.conf.set("spark.graft.snapshotBuckets", "3")
    try {
      val again = KgPipeline.loadCanonical(spark, out)
      assert(again.collect().map(_.toString).sorted.toSeq == full.toSeq)
      val reg = spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_snap_")).map(_.name)
        .find(_.endsWith("_canonical")).get
      val buckets = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(reg))
        .bucketSpec.get.numBuckets
      assert(buckets == 8, s"must register the written layout, got $buckets")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.graft.snapshotBuckets", v)
        case None => spark.conf.unset("spark.graft.snapshotBuckets")
      }
    }
  }

  test("bucketed snapshots resume in a catalog-less state (re-registration)") {
    val out = Files.createTempDirectory("kgbucketedresume").toString
    KgPipeline.run(spark, "/root/testdata/sf0.001", out)
    val full = KgPipeline.loadCanonical(spark, out)
      .collect().map(_.toString).sorted
    // simulate a fresh session's empty catalog: drop the tables, then
    // load again — the _BUCKETED marker re-registers them
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_snap_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val again = KgPipeline.loadCanonical(spark, out)
      .collect().map(_.toString).sorted
    assert(again.toSeq == full.toSeq)
    // and the re-registered table is bucketed (co-located join replans)
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      val canonical = KgPipeline.loadCanonical(spark, out)
      val renameMap = canonical.select(col("s")).distinct().limit(10)
        .localCheckpoint()
      assert(countShuffles(canonical.join(renameMap, Seq("s"))) <= 1)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
