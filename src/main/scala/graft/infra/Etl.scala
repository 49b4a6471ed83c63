package graft.infra

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** ETL bookkeeping: failure channel + processing-status ledger.
  *
  * Re-expresses the reference's pipeline infrastructure:
  *  - EtlFailureData / logFailure (etl/EtlFailureData.java, every Fn's
  *    ETL_FAILURE_TAG side output): per-record failures become a second
  *    Dataset instead of killing the job.
  *  - ProcessingStatus (etl/ProcessingStatus.java,
  *    util/DatastoreProcessingStatusUtil.java): a per-document ledger of
  *    which stages completed, updated by joins (the reference updates
  *    Datastore entities; here the ledger is itself a DataFrame).
  */
object Etl {

  case class EtlFailure(id: Long, stage: String, message: String)

  /** Run a per-row computation that may throw; rows split into a success
    * Dataset and an EtlFailure Dataset (the Beam multi-output-tag shape). */
  def withFailureChannel[T, U](input: Dataset[T], stage: String, idOf: T => Long)(f: T => U)(
    implicit ue: org.apache.spark.sql.Encoder[U],
    ee: org.apache.spark.sql.Encoder[Either[EtlFailure, U]]): (Dataset[U], Dataset[EtlFailure]) = {
    import input.sparkSession.implicits._
    val attempted: Dataset[Either[EtlFailure, U]] = input.map { t =>
      try Right(f(t))
      catch { case e: Throwable => Left(EtlFailure(idOf(t), stage, String.valueOf(e.getMessage))) }
    }
    val ok = attempted.flatMap(_.toOption)
    val failed = attempted.flatMap(_.left.toOption)
    (ok, failed)
  }

  /** Initial status ledger: one row per document, all stage flags false. */
  def initStatus(docs: DataFrame, stages: Seq[String]): DataFrame =
    stages.foldLeft(docs.select(col("doc_id"))) { (acc, s) => acc.withColumn(s, lit(false)) }

  /** Mark a stage done for the ids present in `completed` (left join + flag
    * update — the Spark dual of the reference's status entity upsert). */
  def markDone(status: DataFrame, completed: DataFrame, stage: String): DataFrame = {
    val done = completed.select(col("doc_id")).distinct().withColumn("__done", lit(true))
    status.join(done, Seq("doc_id"), "left")
      .withColumn(stage, coalesce(col("__done"), col(stage)))
      .drop("__done")
  }

  /** Ids still lacking a stage — drives the reference's redo collections. */
  def pending(status: DataFrame, stage: String): DataFrame =
    status.where(!col(stage)).select("doc_id")

  /** Keyed upsert (reference: update/UpdateMedlineEntitiesPipeline — new
    * Medline baselines overwrite matching documents, keep the rest). Updates
    * win on key collision; pure anti-join + union, no MERGE dependency. */
  def upsert(current: DataFrame, updates: DataFrame, key: String): DataFrame =
    current.join(updates.select(key), Seq(key), "left_anti").unionByName(updates)

  /** [[upsert]] extended with the DELETE channel every Medline update file
    * carries (the DeleteCitation entries at the bottom of each nightly
    * file: reference corpora/PmidToFileExtractor.java:74-80,
    * MedlineUiMetadataExtractor.java:58-59 writes them as a .delete.tsv.gz
    * sidecar). Updates win on key collision, keys in `deletes` VANISH —
    * including keys that were never present (delete-of-absent is a no-op,
    * as in the reference's baseline apply). Two anti-joins + one union;
    * the deletes side is retraction-sized (tiny), so AQE broadcasts it. */
  def upsertWithDeletes(current: DataFrame, updates: DataFrame, deletes: DataFrame,
                        key: String): DataFrame =
    upsert(current, updates, key).join(deletes.select(key), Seq(key), "left_anti")

  /** key + change_type ('added' | 'removed' | 'changed') — snapshot diff:
    * which keys a new corpus snapshot added, dropped, or modified relative
    * to the old one (the delta report an update pipeline publishes before
    * committing a baseline swap; unchanged keys are omitted — they are the
    * overwhelming mass at scale and carry no information). ONE full-outer
    * co-partitioned equi-join on the key with null-safe column compares —
    * no window, no sort, the only scalable diff shape at 100 TB. */
  def snapshotDiff(old: DataFrame, neu: DataFrame, key: String,
                   compareCols: Seq[String]): DataFrame = {
    val o = old.select((key +: compareCols).map(c => col(c).as(s"o_$c")): _*)
    val n = neu.select((key +: compareCols).map(c => col(c).as(s"n_$c")): _*)
    val changed = compareCols
      .map(c => !(col(s"o_$c") <=> col(s"n_$c")))
      .reduce(_ || _)
    o.join(n, col(s"o_$key") === col(s"n_$key"), "full_outer")
      .withColumn("change_type",
        when(col(s"o_$key").isNull, "added")
          .when(col(s"n_$key").isNull, "removed")
          .when(changed, "changed"))
      .where(col("change_type").isNotNull)
      .select(coalesce(col(s"o_$key"), col(s"n_$key")).as(key), col("change_type"))
  }

  /** SCD-2 history: the versioned dual of [[upsert]] (the reference's
    * update pipelines overwrite in place; a warehouse keeps the lineage —
    * which baseline carried which value). Input: (batch_id, rows) in batch
    * order, all with identical schemas keyed by `key`. Output adds
    * version (1-based per key), valid_from (batch id), valid_to (next
    * version's batch id, null while current), is_current.
    *
    * The window partitions by key ordered by batch id — partition width is
    * the number of batches a key appears in (here ≤ #batches, a small
    * constant), NOT corpus-width: this is the bounded-window shape that is
    * safe at any corpus size, unlike a global ordering. One shuffle on the
    * key. */
  def scd2(batches: Seq[(Long, DataFrame)], key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = batches
      .map { case (b, df) => df.withColumn("valid_from", lit(b)) }
      .reduce(_.unionByName(_))
    val w = Window.partitionBy(key).orderBy("valid_from")
    all
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
