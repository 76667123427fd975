package graft.shape

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J7 — definition referential-integrity checks (reference:
  * `src/core/validators/definition.py:56-225`):
  *  - baseEntityTypeId must reference an existing entity; self-inheritance
  *    is an error;
  *  - displayNamePropertyId must be one of the entity's own properties;
  *  - every entityIdParts entry must be one of the entity's properties
  *    AND typed String|BigInt (definition.py:147-160);
  *  - relationship source/target must reference existing entities;
  *    self-relationships warn.
  *
  * Every check is a left-anti join or row-local predicate emitting issue
  * rows — error channels, never per-row exceptions.
  */
object DefinitionIntegrity {

  def validate(entities: DataFrame, rels: DataFrame): DataFrame = {
    val ids = entities.select(col("id")).distinct()

    val allProps = entities.select(col("id").as("entityId"),
      explode(concat(col("properties"), col("timeseriesProperties"))).as("prop"))
      .select(col("entityId"), col("prop.id").as("propId"),
        col("prop.valueType").as("propType"))

    // parent exists
    val missingParent = entities
      .filter(col("baseEntityTypeId").isNotNull)
      .join(ids.withColumnRenamed("id", "baseEntityTypeId"),
        Seq("baseEntityTypeId"), "left_anti")
      .select(lit("missing_parent").as("check"), lit("error").as("severity"),
        col("name").as("subject"))

    // no self-inheritance
    val selfInherit = entities
      .filter(col("baseEntityTypeId") === col("id"))
      .select(lit("self_inheritance").as("check"), lit("error").as("severity"),
        col("name").as("subject"))

    // display name property belongs to the entity
    val displayMissing = entities
      .filter(col("displayNamePropertyId").isNotNull)
      .join(allProps.withColumnRenamed("entityId", "id")
          .withColumnRenamed("propId", "displayNamePropertyId"),
        Seq("id", "displayNamePropertyId"), "left_anti")
      .select(lit("display_not_in_properties").as("check"),
        lit("error").as("severity"), col("name").as("subject"))

    // entityIdParts ⊆ properties, typed String|BigInt
    val idParts = entities.select(col("id"), col("name"),
      explode(col("entityIdParts")).as("partId"))
    val partMissing = idParts
      .join(allProps.withColumnRenamed("entityId", "id")
        .withColumnRenamed("propId", "partId"), Seq("id", "partId"), "left_anti")
      .select(lit("idpart_not_in_properties").as("check"),
        lit("error").as("severity"), col("name").as("subject"))
    val partBadType = idParts
      .join(allProps.withColumnRenamed("entityId", "id")
        .withColumnRenamed("propId", "partId"), Seq("id", "partId"))
      .filter(!col("propType").isin("String", "BigInt"))
      .select(lit("idpart_invalid_type").as("check"),
        lit("error").as("severity"), col("name").as("subject"))

    // relationship endpoints exist; self-relationship warns
    val srcMissing = rels
      .join(ids.withColumnRenamed("id", "srcEntityTypeId"),
        Seq("srcEntityTypeId"), "left_anti")
      .select(lit("rel_source_missing").as("check"), lit("error").as("severity"),
        col("name").as("subject"))
    val dstMissing = rels
      .join(ids.withColumnRenamed("id", "dstEntityTypeId"),
        Seq("dstEntityTypeId"), "left_anti")
      .select(lit("rel_target_missing").as("check"), lit("error").as("severity"),
        col("name").as("subject"))
    val selfRel = rels
      .filter(col("srcEntityTypeId") === col("dstEntityTypeId"))
      .select(lit("self_relationship").as("check"), lit("warning").as("severity"),
        col("name").as("subject"))

    Seq(missingParent, selfInherit, displayMissing, partMissing, partBadType,
      srcMissing, dstMissing, selfRel).reduce(_ union _)
  }
}
