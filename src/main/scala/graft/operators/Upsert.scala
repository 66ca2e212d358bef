package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O-6: merge/upsert semantics without a transactional table format.
  *
  * Reference behavior (dags/utils/db.py:45-65): INSERT .. ON CONFLICT (keys)
  * DO UPDATE — with the batch pre-deduplicated on the conflict keys,
  * last-write-wins in batch order.
  *
  * Spark-first design: the merge is a pure DataFrame transform
  * (anti-join + union), so Catalyst plans it — at scale the anti-join
  * shuffles both sides on the key (or broadcasts a small batch), and the
  * result can be written partition-by-partition. No driver-side state.
  *
  * Determinism: "batch order" does not survive a shuffle, so last-write-wins
  * must be keyed on an explicit ordering column (e.g. the O-4 lineage column
  * `file_row_number`) — never on implicit row order (SURVEY.md §4.3).
  */
object Upsert {

  /** D-2: keep the last row per key, ordered by `orderCol` ascending
    * (highest wins). */
  def dedupLastWins(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** D-1: keep-first — flag 2nd+ occurrences per key in `orderCol` order.
    * Reference: cleaning_rules.py:211-220 (file-order keep-first). */
  def markDuplicates(df: DataFrame, keys: Seq[String], orderCol: String,
                     flag: String = "is_duplicate"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    df.withColumn(flag, row_number().over(w) > 1)
  }

  /** The merge itself: rows of `existing` whose key is absent from `batch`,
    * plus all of `batch` (batch already deduplicated by caller or via
    * [[dedupLastWins]]). Columns are matched by name.
    */
  def merge(existing: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(batch.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(batch.select(existing.columns.map(col).toIndexedSeq: _*))

  /** Full upsert: dedup the batch last-write-wins, then merge. */
  def upsert(existing: DataFrame, batch: DataFrame, keys: Seq[String],
             orderCol: String): DataFrame =
    merge(existing, dedupLastWins(batch, keys, orderCol), keys)

  /** J-6: referential-integrity validation — child rows whose foreign key
    * has no match in the parent (the reference only declares FKs in DDL;
    * this is the executable form). A left-anti join: one shuffle, or
    * broadcast when the parent is a dim. */
  def fkViolations(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as("__pk")).distinct(),
        col(childKey) === col("__pk"), "left_anti")

  /** Atomic-ish physical upsert into a parquet table path: write to a temp
    * dir, then swap. Idempotent given idempotent inputs. (The engine's only
    * mutable-state op — SURVEY.md §7.4-3.)
    */
  def upsertParquet(existingPath: String, batch: DataFrame, keys: Seq[String],
                    orderCol: String): Unit = {
    val spark = batch.sparkSession
    val existing = new org.apache.hadoop.fs.Path(existingPath)
    // resolve the FS from the path itself so fully-qualified URIs on other
    // schemes (s3a://, gs://) work — FileSystem.get(conf) would silently
    // target the default FS
    val fs = existing.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(existing))
        upsert(spark.read.parquet(existingPath), batch, keys, orderCol)
      else dedupLastWins(batch, keys, orderCol)
    val tmp = new org.apache.hadoop.fs.Path(existingPath + ".tmp-" + java.util.UUID.randomUUID)
    merged.write.mode("overwrite").parquet(tmp.toString)
    // swap via a .bak rename so a crash mid-swap never leaves zero live
    // copies: worst case the table survives at .bak (recovery: rename back)
    val bak = new org.apache.hadoop.fs.Path(existingPath + ".bak-" + java.util.UUID.randomUUID)
    val hadBak = fs.exists(existing) && fs.rename(existing, bak)
    fs.rename(tmp, existing)
    if (hadBak) fs.delete(bak, true)
  }
}
