package graft.shape

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A6/A7 — Fabric capacity-limit counters (reference:
  * `src/core/validators/fabric_limits.py:130-405`; caps
  * `src/constants.py:154-203`): 500 entity types, 500 relationship
  * types, 200 properties/entity, 5 entityIdParts, name length 26, with a
  * 90% warn tier; definition-size estimate vs 1024 KB (warn 768 KB).
  *
  * Pure aggregations — per-entity checks are row-local Column
  * expressions; global counts are one `agg`.
  */
object Limits {
  val MaxEntityTypes = 500
  val MaxRelationshipTypes = 500
  val MaxPropertiesPerEntity = 200
  val MaxEntityIdParts = 5
  val MaxNameLength = 26
  val WarnFraction = 0.9
  val MaxDefinitionKb = 1024
  val WarnDefinitionKb = 768

  private def tier(value: org.apache.spark.sql.Column, max: Int) =
    when(value > max, "error")
      .when(value > (max * WarnFraction).toInt, "warning")
      .otherwise("ok")

  /** Per-entity limit rows: (name, nProps, nIdParts, nameLen, status). */
  def perEntity(entities: DataFrame): DataFrame =
    entities.select(
      col("name"),
      (size(col("properties")) + size(col("timeseriesProperties"))).as("nProps"),
      size(col("entityIdParts")).as("nIdParts"),
      length(col("name")).as("nameLen"))
      .withColumn("propStatus", tier(col("nProps"), MaxPropertiesPerEntity))
      .withColumn("idPartsStatus",
        when(col("nIdParts") > MaxEntityIdParts, "error").otherwise("ok"))
      .withColumn("nameStatus",
        when(col("nameLen") > MaxNameLength, "warning").otherwise("ok"))

  /** Global counters vs caps (A6) + serialized-size estimate (A7:
    * `length(to_json(struct))` summed — the relational analogue of
    * `fabric_limits.py:294-368`'s json.dumps measurement).
    */
  def global(entities: DataFrame, rels: DataFrame): DataFrame = {
    val spark = entities.sparkSession
    val e = entities.agg(
      count(lit(1)).as("nEntities"),
      sum(length(to_json(struct(col("id"), col("name"), col("properties"),
        col("timeseriesProperties"), col("entityIdParts"))))).as("entityBytes"))
    val r = rels.agg(count(lit(1)).as("nRels"),
      sum(length(to_json(struct(col("id"), col("name"),
        col("srcEntityTypeId"), col("dstEntityTypeId"))))).as("relBytes"))
    e.crossJoin(r).select(
      col("nEntities"), col("nRels"),
      tier(col("nEntities"), MaxEntityTypes).as("entityStatus"),
      tier(col("nRels"), MaxRelationshipTypes).as("relStatus"),
      ((coalesce(col("entityBytes"), lit(0L)) +
        coalesce(col("relBytes"), lit(0L))) / 1024).cast("long").as("estimatedKb"))
      .withColumn("sizeStatus",
        when(col("estimatedKb") > MaxDefinitionKb, "error")
          .when(col("estimatedKb") > WarnDefinitionKb, "warning")
          .otherwise("ok"))
  }
}
