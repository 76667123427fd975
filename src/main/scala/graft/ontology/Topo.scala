package graft.ontology

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G4 — topological ordering of the class hierarchy, parents first
  * (reference: BFS at `rdf_converter.py:486-532`, Kahn's algorithm at
  * `fabric_serializer.py:120-171` and `dtdl_converter.py:1105-1150` —
  * required because Fabric wants parents defined before children,
  * `fabric_serializer.py:57-58`).
  *
  * Re-expressed as iterative level propagation: `level(c) = 0` for roots,
  * `1 + level(parent)` otherwise — a driver loop of broadcast joins
  * bounded by MAX_INHERITANCE_DEPTH (10, `constants.py:204`), the same
  * fixpoint skeleton as connected components. Ordering by
  * `(level, name)` is a valid topological order and, unlike Kahn's
  * queue, deterministic under any partitioning.
  */
object Topo {

  /** parents: (classUri, parentUri) single-parent rows (J1 output).
    * classes: (classUri, ...). Returns (classUri, level).
    */
  def levels(classes: DataFrame, parents: DataFrame,
             maxDepth: Int = 10): DataFrame = {
    val p = parents.select(col("classUri"), col("parentUri"))
    var levels = classes.select(col("classUri"))
      .join(p, Seq("classUri"), "left")
      .select(col("classUri"),
        when(col("parentUri").isNull, 0).otherwise(-1).as("level"),
        col("parentUri"))
    var iter = 0
    var unresolved = levels.filter(col("level") === -1).count()
    while (unresolved > 0 && iter < maxDepth) {
      val parentLevels = levels.select(col("classUri").as("parentUri"),
        col("level").as("parentLevel"))
      levels = levels
        .join(broadcast(parentLevels), Seq("parentUri"), "left")
        .select(col("classUri"),
          when(col("level") >= 0, col("level"))
            .when(col("parentLevel") >= 0, col("parentLevel") + 1)
            .otherwise(-1).as("level"),
          col("parentUri"))
        .localCheckpoint()
      unresolved = levels.filter(col("level") === -1).count()
      iter += 1
    }
    // leftover -1 (deeper than maxDepth or orphaned by cycle skips) are
    // pinned to maxDepth, mirroring the reference's bounded recursion
    levels.select(col("classUri"),
      when(col("level") === -1, maxDepth).otherwise(col("level")).as("level"))
  }

  /** Full topological rank: parents-first, deterministic. */
  def ordered(classes: DataFrame, parents: DataFrame): DataFrame = {
    val withNames = classes.select(col("classUri"),
      Names.uriToNameCol(col("classUri")).as("name"))
    levels(classes, parents)
      .join(withNames, Seq("classUri"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("level"), col("name"))))
      .select("classUri", "name", "level", "rank")
  }
}
