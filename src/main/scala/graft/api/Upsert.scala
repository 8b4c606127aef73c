package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge/upsert over immutable columnar storage — the landing pattern
  * the reference genre implements against MySQL/HBase, re-expressed for
  * a parquet lake: union the existing snapshot with the update batch
  * and keep, per key, the row that wins the (version, source) ordering.
  * One shuffle on the key; rewrite the partition/table afterwards
  * (copy-on-write, the Delta/Iceberg-style merge without table-format
  * metadata).
  */
object Upsert {

  /** Per key, keep the single row with the greatest orderCol; an update
    * row beats an existing row at equal orderCol. Column sets must
    * match (unionByName). */
  def upsert(existing: DataFrame, updates: DataFrame,
      keyCols: Seq[String], orderCol: String): DataFrame = {
    val tagged = existing.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    // final tiebreak on a content hash: rows tied on (key, version, src)
    // pick a winner by VALUE, not by task scheduling — identical
    // duplicate rows remain interchangeable, differing ones resolve
    // deterministically
    val contentCols = tagged.columns.filterNot(_ == "__src").map(col).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc, col("__src").desc,
        xxhash64(to_json(struct(contentCols: _*))))
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** Soft delete: drop keys present in `tombstones` from `existing`
    * (left-anti on the key). */
  def applyDeletes(existing: DataFrame, tombstones: DataFrame,
      keyCols: Seq[String]): DataFrame =
    existing.join(tombstones.select(keyCols.map(col): _*).distinct(),
      keyCols, "left_anti")

  /** Full MERGE INTO semantics (Delta/Iceberg `MERGE` re-expressed as
    * the plan it executes): `changes` carries one row per key with an
    * `opCol` of 'delete' / 'update' / 'insert' plus full replacement
    * values for every non-key target column. Matched+delete drops the
    * row, matched+update (and insert-on-existing-key — upsert
    * semantics) replaces the payload, unmatched insert adds the row,
    * delete OR update of an absent key is a no-op (standard MERGE:
    * only WHEN NOT MATCHED inserts create rows), and untouched target
    * rows pass through with srcCol = 'keep'. One FULL OUTER join on the
    * key — the
    * single keyed exchange a 100 TB merge costs (broadcast the feed
    * when it is small; a bucketed target joins with zero exchanges).
    * At most one change row per key is the caller's contract (enforce
    * upstream with [[upsert]]'s version ordering if the feed has
    * history). */
  def mergeInto(target: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String = "op", srcCol: String = "src"): DataFrame = {
    val payload = target.columns.filterNot(_ == keyCol).toSeq
    val t = target.select((col(keyCol) +: lit(true).as("__t_exists") +:
      payload.map(c => col(c).as("__t_" + c))): _*)
    // Validate op values inline (review finding: a typo'd op like
    // 'updte' previously passed both filters and no-op'd silently with
    // its misspelling as the provenance). The check is a codegen'd
    // conditional on the change rows — no extra pass, no driver trip —
    // and raises on the first malformed row, null included.
    val opChecked = when(col(opCol).isin("delete", "update", "insert"), col(opCol))
      .otherwise(raise_error(concat(
        lit("mergeInto: invalid op '"),
        coalesce(col(opCol).cast("string"), lit("NULL")),
        lit("' (expected delete/update/insert)"))))
    val c = changes.select((col(keyCol) +: opChecked.as("__op") +:
      payload.map(p => col(p).as("__c_" + p))): _*)
    t.join(c, Seq(keyCol), "full_outer")
      .filter(coalesce(col("__op"), lit("")) =!= "delete")
      .filter(col("__t_exists").isNotNull || col("__op") === "insert")
      .select((col(keyCol) +:
        payload.map(p => when(col("__op").isin("update", "insert"), col("__c_" + p))
          .otherwise(col("__t_" + p)).as(p))) :+
        coalesce(col("__op"), lit("keep")).as(srcCol): _*)
  }
}
