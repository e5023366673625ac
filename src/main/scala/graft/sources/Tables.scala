package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schemas and parquet I/O for the engine's tables.
  *
  * Mirrors the reference's relational model (reference:
  * `backend/app/models.py:14-117`) — four tables keyed by natural key
  * (date, region) with synthetic surrogate ids — re-expressed as explicit
  * Spark `StructType`s over date-partitioned Parquet directories.
  *
  * Scale notes (100 TB design):
  *   - Fact tables are partitioned by `date` so P9-style date filters and
  *     the S7 merge rewrite prune partitions instead of scanning the table.
  *   - No inference anywhere: every read supplies the schema, so the
  *     parquet footer scan is the only metadata round-trip.
  */
object Tables {

  /** `pipeline_runs` — run lineage (reference: models.py:14-27). */
  val pipelineRunsSchema: StructType = StructType(Seq(
    StructField("run_id", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("started_at", TimestampType, nullable = false),
    StructField("ended_at", TimestampType, nullable = true),
    StructField("rows_in", LongType, nullable = true),
    StructField("rows_loaded", LongType, nullable = true),
    StructField("rows_rejected", LongType, nullable = true),
    StructField("notes", StringType, nullable = true)
  ))

  /** `regions` dimension (reference: models.py:30-46). */
  val regionsSchema: StructType = StructType(Seq(
    StructField("region_id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("population", IntegerType, nullable = true),
    StructField("created_at", TimestampType, nullable = true)
  ))

  /** `hospital_capacity_daily` fact (reference: models.py:49-82),
    * UNIQUE(date, region_id). */
  val capacitySchema: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("region_id", StringType, nullable = false),
    StructField("total_beds", IntegerType, nullable = false),
    StructField("occupied_beds", IntegerType, nullable = false),
    StructField("icu_beds", IntegerType, nullable = true),
    StructField("icu_occupied", IntegerType, nullable = true),
    StructField("source_run_id", StringType, nullable = true)
  ))

  /** `metrics_daily` derived fact (reference: models.py:85-117),
    * UNIQUE(date, region_id). */
  val metricsSchema: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("region_id", StringType, nullable = false),
    StructField("bed_occ_pct", DoubleType, nullable = false),
    StructField("icu_occ_pct", DoubleType, nullable = true),
    StructField("strain_index", DoubleType, nullable = false),
    StructField("source_run_id", StringType, nullable = true)
  ))

  /** HHS capacity CSV contract — the declared ingest input columns and
    * their canonical renames (reference: ingest_capacity.py:106-113). */
  val hhsRenameMap: Seq[(String, String)] = Seq(
    "date" -> "date",
    "state" -> "region",
    "inpatient_beds" -> "total_beds",
    "inpatient_beds_used" -> "occupied_beds",
    "total_staffed_adult_icu_beds" -> "icu_beds",
    "staffed_adult_icu_bed_occupancy" -> "icu_occupied"
  )

  /** Raw CSV is read all-string: parse/validate happens in the plan, so a
    * malformed cell becomes a reject row (P3) instead of a read error. */
  def hhsCsvSchema(sourceCols: Seq[String]): StructType =
    StructType(sourceCols.map(c => StructField(c, StringType, nullable = true)))

  def readParquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)

  def readTestTable(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Write a fact table partitioned by date — partition pruning backs both
    * the P9 date filters and the S7 merge's partial rewrite. Repartition
    * by date first so each partition gets one file per holding task, not
    * one file per (task × date). */
  def writeDatePartitioned(df: DataFrame, path: String): Unit =
    df.repartition(org.apache.spark.sql.functions.col("date"))
      .write.mode("overwrite").partitionBy("date").parquet(path)
}
