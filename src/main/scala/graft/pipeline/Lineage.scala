package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import graft.sources.Tables

/** S11 — pipeline-run lineage (reference: models.py:14-27;
  * ingest_capacity.py:85-96,195-199,213-224; compute_metrics.py:31-42,
  * 91-111; surfaced at /runs, main.py:110-127).
  *
  * A run row is appended when a job starts (status=running) and a final
  * row is appended on completion (success/failed + counters + notes).
  * Append-only beats update-in-place on object storage; the "current"
  * status of a run is its latest row (see QueryLayer.recentRuns).
  * Timestamps are passed IN (no `func.now()`) so replays are
  * deterministic (SURVEY.md §7.4.3).
  */
object Lineage {

  final case class RunState(runId: String, source: String, status: String,
                            startedAt: java.sql.Timestamp,
                            endedAt: Option[java.sql.Timestamp] = None,
                            rowsIn: Option[Long] = None,
                            rowsLoaded: Option[Long] = None,
                            rowsRejected: Option[Long] = None,
                            notes: Option[String] = None)

  def toDf(spark: SparkSession, s: RunState): DataFrame = {
    val row = Row(s.runId, s.source, s.status, s.startedAt,
      s.endedAt.orNull, s.rowsIn.map(Long.box).orNull,
      s.rowsLoaded.map(Long.box).orNull, s.rowsRejected.map(Long.box).orNull,
      s.notes.orNull)
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), Tables.pipelineRunsSchema)
  }

  def append(spark: SparkSession, path: String, s: RunState): Unit =
    toDf(spark, s).write.mode(SaveMode.Append).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Tables.pipelineRunsSchema).parquet(path)
}
