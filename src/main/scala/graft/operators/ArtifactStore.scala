package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned store for TRAINED INDEX ARTIFACTS — IVF coarse centroids,
  * PQ codebooks, BPE vocabularies/merge tables, Bloom bitmaps.
  *
  * Why this exists: the ANN / tokenizer / contamination operators keep
  * their training deterministic and replayable so the DuckDB oracle can
  * verify the TRAINED MODEL cross-engine, and the oracle queries
  * re-derive artifacts in-query for exactly that reason. At 100 TB the
  * economics invert: training reads the full corpus (k-means over every
  * vector, BPE pair counts over every token) while a probe touches only
  * the query set and the candidate lists. Training belongs at WRITE
  * time, once, with every subsequent query probing the stored artifact
  * — this module is that write-once path.
  *
  * Mechanics are deliberately NOT new: an artifact is a small DataFrame
  * (centroids: (cid, cvec); codebooks: (subspace, cid, cvec); BPE
  * vocab: (w, n_pieces); Bloom: one bitmap row), and publishing reuses
  * [[MergeUpsert.publishPlain]]'s atomic version-dir + `_CURRENT`
  * pointer-flip protocol verbatim — immutable `v-N` dirs, commit
  * marker, crash-orphan GC, and a retention window for in-flight
  * readers. A probe running against version N keeps reading N while a
  * retrain publishes N+1; the flip is one pointer rename. Retraining
  * cadence is the caller's policy (the store is just as happy holding
  * an artifact for a year as for a micro-batch).
  *
  * Store-probe equivalence is oracle-enforced: the x115–x118 catalog
  * entries publish an artifact, read it back, probe with it, and are
  * checked against the SAME SQL as their train-in-query counterparts
  * (x17/x58/x75/x51) — byte-identical results or the round fails. */
object ArtifactStore {

  /** Publish `artifact` as the new current version of the store at
    * `path` (atomic pointer flip; previous versions retained per
    * `retainVersions` for in-flight readers). */
  def publish(spark: SparkSession, path: String, artifact: DataFrame,
              retainVersions: Int = 2): Unit =
    MergeUpsert.publishPlain(spark, path, artifact, retainVersions)

  /** The current version of the artifact at `path`. */
  def load(spark: SparkSession, path: String): DataFrame =
    MergeUpsert.readPlain(spark, path)

  /** Retained version names, oldest first (time travel via
    * [[MergeUpsert.readPlainVersion]]). */
  def versions(spark: SparkSession, path: String): Seq[String] =
    MergeUpsert.retainedVersions(spark, path)
}
