package graft.publish

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Downstream/publish layer — the Spark re-creation of the reference's
 * post-ER dataflow:
 *
 *  - [[interactions]] rebuilds the Personalize interactions dataset SQL
 *    (purchase history ⨝ integrated map, both brands, sub-brand item ids
 *    prefixed `sub_` to avoid collisions; reference:
 *    lambda/create_personalize_dataset_import_job/index.py:35-57, prefix
 *    rule :51, Avro shape lib/personalize.ts:60-82).
 *  - [[segmentTopN]] re-creates the item-based batch segment (top
 *    `numResults` users per item, default 100; reference:
 *    lambda/create_personalize_segment/index.py:14,194-205) as a
 *    deterministic co-purchase-affinity window query.
 *  - [[antiJoinExisting]] is the "skip items whose segments already exist"
 *    dedupe (reference: lambda/create_personalize_segment/index.py:139-141).
 *  - [[publishAtomic]] replaces the reference's delete-then-copy
 *    full-refresh publish (lambda/integrated_customer_updater/index.py:16-86)
 *    with a write-to-temp + atomic-rename swap (an Iceberg snapshot replace
 *    on a real deployment).
 */
object Downstream {

  /**
   * interactions(USER_ID, ITEM_ID, TIMESTAMP) from two purchase tables and
   * the integrated id map. `integrated` must carry (RecordId, MatchID).
   */
  def interactions(mainPurchases: DataFrame, subPurchases: DataFrame,
                   integrated: DataFrame): DataFrame = {
    val map = integrated.select(col("RecordId"), col("MatchID"))
    def side(p: DataFrame, prefixSub: Boolean): DataFrame = {
      val item = if (prefixSub) concat(lit("sub_"), col("item_id")) else col("item_id")
      p.join(map, p("customer_id") === map("RecordId"))
        .select(col("MatchID").as("USER_ID"), item.as("ITEM_ID"),
          col("purchase_date").cast("long").as("TIMESTAMP"))
    }
    side(mainPurchases, prefixSub = false)
      .unionByName(side(subPurchases, prefixSub = true))
  }

  /**
   * Top-N users per item by affinity. Affinity here = co-purchase count of
   * the item's buyers' other items (deterministic stand-in for the
   * Personalize model score), ties broken by user id.
   */
  def segmentTopN(interactions: DataFrame, itemIds: Seq[String],
                  numResults: Int = 100): DataFrame = {
    val inter = interactions.select(col("USER_ID").as("u"), col("ITEM_ID").as("i"))
    // buyers of each target item
    val buyers = inter.filter(col("i").isin(itemIds: _*))
      .select(col("i").as("target_item"), col("u").as("buyer"))
    // items co-purchased with the target by its buyers
    val co = inter.select(col("u").as("buyer"), col("i").as("co_item"))
      .join(buyers, "buyer")
      .filter(col("co_item") =!= col("target_item"))
      .select("target_item", "co_item").distinct()
    // affinity(user, target) = how many of the target's co-items the user bought
    val affinity = inter.select(col("u").as("user_id"), col("i").as("co_item"))
      .join(co, "co_item")
      .groupBy(col("target_item").as("item_id"), col("user_id"))
      .agg(count(lit(1)).as("affinity"))
    val w = Window.partitionBy(col("item_id"))
      .orderBy(col("affinity").desc, col("user_id").asc)
    affinity.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= numResults)
      .select("item_id", "user_id")
  }

  /** Drop item ids whose segment rows already exist (left anti join). */
  def antiJoinExisting(newSegments: DataFrame, existing: DataFrame): DataFrame =
    newSegments.join(existing.select("item_id").distinct(), Seq("item_id"), "left_anti")

  /**
   * Atomic full-refresh publish of a `latest` table: write parquet to a temp
   * path, atomically swap directories. Readers see the old or the new
   * snapshot, never a mix (the reference's delete-then-copy has a visible
   * gap; on cloud storage this maps to an Iceberg snapshot replace).
   */
  def publishAtomic(df: DataFrame, tableDir: String): Unit = {
    val tmp = tableDir + ".staging"
    val old = tableDir + ".old"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = Paths.get(tableDir)
    if (Files.exists(target)) {
      Files.move(target, Paths.get(old))
      Files.move(Paths.get(tmp), target)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(old))
    } else {
      Files.createDirectories(target.getParent)
      Files.move(Paths.get(tmp), target)
    }
  }

  def readLatest(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(tableDir)
}
