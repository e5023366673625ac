package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) source/sink — the interchange format
  * of every public LLM dataset release (The Pile, RedPajama, Dolma all
  * ship as .jsonl[.gz]), so a curation engine must read and write it
  * natively.
  *
  * Design rules, mirroring the CSV edge (`pipeline.IngestJob`):
  *   - NO schema inference: the caller supplies the `StructType`, so
  *     reading is a single pass (inference would scan the data twice
  *     and silently widen types between batches — fatal at 100 TB).
  *   - Malformed lines are never dropped silently: PERMISSIVE mode with
  *     a corrupt-record column, split into (good, rejects) exactly like
  *     the CSV reject sink (S8) — the reject frame carries the raw line
  *     for replay.
  *   - Writes go through text lines built with `to_json` rather than
  *     the JSON writer's directory semantics, so a round-trip is
  *     byte-stable for a given column order and the output is one
  *     object per line (what downstream tokenizer jobs expect).
  *
  * Scale shape: reads are splittable per file (uncompressed JSONL
  * splits on line boundaries; gzip does not — shard upstream), schema
  * projection prunes unparsed fields at the Jackson level, and the
  * reject split is one scan with a cached predicate, not two reads. */
object JsonLines {

  private val CorruptCol = "_corrupt_record"

  /** A [[read]] result: the good/reject split plus the cache handle.
    * The split shares one cached scan (the corrupt-record predicate
    * must see the same parse), so the caller owns the cache lifetime —
    * call [[unpersist]] after both sides are consumed, or the blocks
    * live until the session ends. */
  final case class Split(good: DataFrame, rejects: DataFrame,
                         private val raw: DataFrame) {
    def unpersist(): Unit = { raw.unpersist(); () }
  }

  /** Read with explicit schema; returns the good/reject [[Split]].
    * Rejects carry (raw line, reason). The input schema must not
    * itself contain the corrupt-record column. */
  def read(spark: SparkSession, path: String,
           schema: StructType): Split = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not contain $CorruptCol")
    val withCorrupt = schema.add(CorruptCol, StringType, nullable = true)
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    val good = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val rejects = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"),
        lit("malformed json").as("_reject_reason"))
    Split(good, rejects, raw)
  }

  /** Write one JSON object per line (column order = frame order). */
  def write(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))
      .write.mode("overwrite").text(path)
}
