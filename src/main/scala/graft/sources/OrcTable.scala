package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the other columnar table format a Spark-native
  * engine is expected to read and write (same storage class as
  * Parquet: stripe-level min/max statistics, predicate pushdown,
  * column pruning, vectorized reads — all driven by the same Catalyst
  * scan machinery, so every optimization in this engine's Parquet
  * paths applies unchanged). Completes the format matrix next to
  * Parquet (tables), JSONL (interchange), and CSV (ingest/export);
  * x149 oracle-checks the round trip as an identity against the
  * table itself, including the edge corpus's control characters and
  * unicode through ORC's string encoding. */
object OrcTable {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Read back under an EXPLICIT schema (the engine's no-inference
    * rule at every file edge — inference is a per-run behavior, a
    * declared schema is a contract). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
