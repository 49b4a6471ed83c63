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
}
