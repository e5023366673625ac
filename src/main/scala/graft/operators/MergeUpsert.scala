package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S7 — keyed upsert (MERGE), last-writer-wins on the natural key.
  *
  * The reference relies on Postgres `INSERT ... ON CONFLICT (date,
  * region_id) DO UPDATE` (reference: ingest_capacity.py:179-193,
  * compute_metrics.py:76-89) to make re-ingest idempotent. Plain Parquet
  * has no MERGE, so we implement it as a distributed algorithm over
  * builtins — no driver materialization, no custom physical operator.
  *
  * Scale design (100 TB):
  *   - `merge` uses `updates`-deduped ∪ (existing ⟕anti updates-keys).
  *     The anti join probes existing rows against only the DISTINCT KEYS
  *     of the update batch — typically tiny (one ingest file) → Catalyst
  *     broadcasts it and the existing table is NEVER shuffled. Compare the
  *     naive union+window form, which shuffles the full table on every
  *     merge.
  *   - `mergeWrite` additionally prunes by partition: only the date
  *     partitions present in the update batch are read, merged, and
  *     rewritten (dynamic partition overwrite). A day's upsert into a
  *     100 TB table touches one day's partitions, not the table.
  */
object MergeUpsert {

  /** Pure merge: rows of `updates` replace same-key rows of `existing`;
    * within `updates`, the highest `updatePriority` row per key wins —
    * pass a per-row-unique priority (e.g. the input row index) for fully
    * deterministic "last writer wins", mirroring the reference's
    * row-ordered ON CONFLICT DO UPDATE loop. With no priority, in-batch
    * duplicates collapse arbitrarily (dropDuplicates) — only safe when
    * the batch is already key-unique.
    *
    * `evolveSchema = true` aligns by name with null backfill (the
    * ADD-COLUMN class of schema evolution): a batch carrying a new
    * column widens the table (existing rows read null there), a batch
    * missing a column leaves nulls for its rows. The default strictly
    * projects the batch onto the existing schema — a batch missing a
    * required column fails the plan instead of silently nulling. */
  def merge(existing: DataFrame, updates: DataFrame, keys: Seq[String],
            updatePriority: Option[String] = None,
            broadcastKeys: Boolean = true,
            evolveSchema: Boolean = false): DataFrame = {
    val keyCols = keys.map(col)
    val deduped = updatePriority match {
      case Some(p) => dedupByPriority(updates, keys, p)
      case None => updates.dropDuplicates(keys)
    }
    // Anti join against the distinct update keys. For an incremental
    // batch (the design target) the key set is tiny → forced broadcast
    // means the big `existing` side is scanned once and NEVER shuffle-
    // written. For a backfill-scale batch (millions of keys) a forced
    // broadcast inverts into the bottleneck — callers that know they're
    // backfilling pass broadcastKeys = false for a plain shuffle join
    // (mergeWrite flips this automatically off the batch's estimated
    // distinct-key count).
    val distinctKeys = deduped.select(keyCols: _*).distinct()
    val updateKeys = if (broadcastKeys) broadcast(distinctKeys) else distinctKeys
    val survivors = existing.join(updateKeys, keys, "left_anti")
    if (evolveSchema)
      survivors.unionByName(deduped, allowMissingColumns = true)
    else
      survivors.unionByName(deduped.select(existing.columns.map(col): _*))
  }

  /** ADDITIVE merge — counters, not last-writer-wins: per key, the
    * numeric `sumCols` are summed across `existing` and `updates`
    * (absent keys start at the batch's value). The merge-on-write shape
    * for incrementally maintained aggregates: vocabulary counts,
    * per-domain stats, document frequencies — stores that a 100 TB
    * pipeline updates per batch but never recomputes from scratch.
    *
    * Scale shape: one union + key aggregation. Map-side partial
    * aggregation collapses the batch before the exchange; the store
    * side re-shuffles unless it is laid out bucketed by key
    * ([[graft.sources.Bucketing]]) — at streaming cadence write the
    * counter store bucketed and this merge plans bucket-local. */
  def mergeAdditive(existing: DataFrame, updates: DataFrame,
                    keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(sumCols.nonEmpty, "mergeAdditive needs at least one sum column")
    val proj = (keys ++ sumCols).map(col)
    val aggs = sumCols.map(c => sum(col(c)).as(c))
    existing.select(proj: _*).unionByName(updates.select(proj: _*))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** [[mergeAdditive]] against a versioned plain store (same atomic
    * publish/retention protocol as [[mergeWritePlain]]). First write
    * bootstraps from the batch alone (keys deduplicated by summing). */
  def mergeAdditiveWritePlain(spark: SparkSession, path: String,
                              updates: DataFrame, keys: Seq[String],
                              sumCols: Seq[String],
                              retainVersions: Int = 2): Unit = {
    val (cur, legacyFlat, base) = resolveBase(spark, path)
    val merged = base match {
      case Some(existing) =>
        // additive semantics are defined over keys ++ sumCols ONLY;
        // silently projecting a wider store onto them would PUBLISH the
        // narrowed schema and permanently drop the other columns
        val expected = (keys ++ sumCols).sorted
        require(existing.columns.sorted.sameElements(expected),
          s"additive merge would narrow the store's schema " +
            s"(${existing.columns.sorted.mkString(",")}) to " +
            s"(${expected.mkString(",")}) — not a counter store")
        mergeAdditive(existing, updates, keys, sumCols)
      case None =>
        val aggs = sumCols.map(c => sum(col(c)).as(c))
        updates.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    publishVersion(spark, path, merged, retainVersions, cur, legacyFlat)
  }

  /** Retention-prune a versioned plain store OUTSIDE the publish path:
    * delete published version dirs beyond the newest `keepVersions`,
    * never touching the live version or the `_CURRENT` pointer. Every
    * publish already GCs to its `retainVersions` (floor 2, the
    * in-flight-reader window); this is the maintenance pass that can
    * go BELOW that floor between publishes — e.g. a monitoring store
    * compacted to its live fold once the reader window has drained
    * (`keepVersions = 1`). Only PUBLISHED lineage (dirs at-or-below
    * the current version) is considered: a dead writer's orphan dir
    * above it is the next publish's GC to classify, not ours. Returns
    * the number of version dirs deleted; idempotent. */
  def vacuumPlain(spark: SparkSession, path: String,
                  keepVersions: Int = 1): Int = {
    require(keepVersions >= 1,
      s"keepVersions must retain the live version, got $keepVersions")
    vacuumPlainKeeping(spark, path, keepVersions)._1
  }

  /** [[vacuumPlain]] that also returns the RETAINED version names
    * (oldest first) from the same directory listing — callers that need
    * both (TableManifest.vacuum derives the live file set from the
    * kept versions) pay one LIST, not two. */
  def vacuumPlainKeeping(spark: SparkSession, path: String,
                         keepVersions: Int = 1): (Int, Seq[String]) = {
    require(keepVersions >= 1,
      s"keepVersions must retain the live version, got $keepVersions")
    val fs = fsFor(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    // explicit match, NOT .getOrElse(return ...): a non-local return in
    // a deletion path rides NonLocalReturnControl — swallowed by any
    // future enclosing catch-all, and gone in Scala 3
    currentPlainVersion(spark, path) match {
      case None => (0, versionDirs(fs, p).sortBy(versionNumber))
      case Some(cur) =>
        val curN = versionNumber(cur)
        val all = versionDirs(fs, p).sortBy(versionNumber)
        val (lineage, above) = all.partition(versionNumber(_) <= curN)
        val drop = lineage.dropRight(keepVersions)
        drop.foreach(v =>
          fs.delete(new org.apache.hadoop.fs.Path(p, v), true))
        (drop.size, lineage.takeRight(keepVersions) ++ above)
    }
  }

  /** Delete matching rows from a versioned plain store — the retention/
    * takedown pass upserts cannot express. Publishes the filtered
    * contents as a new version through the same atomic protocol
    * (readers keep the usual window) and returns the number of rows
    * removed. */
  def deleteWhere(spark: SparkSession, path: String,
                  condition: org.apache.spark.sql.Column,
                  retainVersions: Int = 2): Long = {
    val current = readPlain(spark, path)
    // NULL-condition rows are NOT matches: a bare !condition is also
    // NULL there, which filter() drops — silently deleting (and not
    // counting) every row where the predicate is undecidable
    val matches = coalesce(condition, lit(false))
    val removed = current.filter(matches).count()
    if (removed > 0)
      publishPlain(spark, path, current.filter(!matches), retainVersions)
    removed
  }

  /** Keep the highest-`priorityCol` row per key (priority should be
    * unique per row — a monotonic input index — so the result is
    * deterministic). */
  def dedupByPriority(df: DataFrame, keys: Seq[String],
                      priorityCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(priorityCol).desc)
    df.withColumn("_mu_rn", row_number().over(w))
      .filter(col("_mu_rn") === 1).drop("_mu_rn")
  }

  /** Merge into a NON-partitioned keyed parquet table with ATOMIC
    * publish (for small keyed tables: dims, streaming sinks).
    *
    * Layout: `path/v-NNNNNNNNNN/` immutable parquet version dirs plus
    * `path/_CURRENT`, a one-line pointer file naming the live version.
    * A merge writes the merged table to a NEW version dir, then flips
    * the pointer with one atomic file rename. Readers ([[readPlain]])
    * resolve the pointer first, so a writer crash at ANY point — during
    * the data write, or between write and publish — leaves readers on
    * the previous version with no gap; a half-written version dir is
    * invisible garbage, collected by the next successful merge. This is
    * the reference's transactional ON CONFLICT upsert
    * (ingest_capacity.py:179-193) re-expressed for immutable storage:
    * the protocol Delta/Iceberg implement with a transaction log,
    * reduced to its minimal pointer form. Single-writer, like the
    * reference's ingest — concurrent writers would need a lock service.
    *
    * A legacy flat table (parquet files directly at `path`, no pointer)
    * is read as the merge base on first call, left untouched until the
    * new version is live, then cleaned best-effort. For large facts
    * prefer `mergeWrite` (partition-pruned rewrite). */
  def mergeWritePlain(spark: SparkSession, path: String, updates: DataFrame,
                      keys: Seq[String], retainVersions: Int = 2): Unit = {
    val (cur, legacyFlat, base) = resolveBase(spark, path)
    val merged = base match {
      case Some(existing) => merge(existing, updates, keys)
      case None => updates.dropDuplicates(keys)
    }
    publishVersion(spark, path, merged, retainVersions, cur, legacyFlat)
  }

  /** The ONE place the merge-base protocol lives: the live version if
    * published, else a legacy flat table if present, else nothing.
    * Every writer that builds on the store's current contents must
    * route through this (or [[existingPlain]]) — checking only
    * `currentPlainVersion` treats a legacy flat store as empty, and
    * the subsequent publish's legacy cleanup would then DELETE the
    * flat files it never read. */
  private def resolveBase(spark: SparkSession, path: String)
      : (Option[String], Boolean, Option[DataFrame]) = {
    val fs = fsFor(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    val cur = currentPlainVersion(spark, path)
    val legacyFlat = cur.isEmpty && hasFlatParquet(fs, p)
    val base =
      cur.map(v => spark.read.parquet(s"$path/$v"))
        .orElse(if (legacyFlat) Some(spark.read.parquet(path)) else None)
    (cur, legacyFlat, base)
  }

  /** The store's current contents (versioned or legacy flat), if any —
    * the safe existence check for external incremental writers. */
  def existingPlain(spark: SparkSession, path: String): Option[DataFrame] =
    resolveBase(spark, path)._3

  /** Atomic full-table publish: write `df` as a new immutable version
    * and flip the `_CURRENT` pointer — the whole-table-replace analogue
    * of [[mergeWritePlain]] (no key merge; the previous contents are
    * superseded entirely). For derived tables whose row set can SHRINK
    * between publishes — e.g. a curated corpus where a newly arrived
    * document displaces a previously kept near-duplicate — which a
    * keyed upsert cannot express (upserts never delete). Readers keep
    * the same [[readPlain]] protocol and retention window. */
  def publishPlain(spark: SparkSession, path: String, df: DataFrame,
                   retainVersions: Int = 2): Unit = {
    val fs = fsFor(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    val cur = currentPlainVersion(spark, path)
    publishVersion(spark, path, df, retainVersions, cur,
      cur.isEmpty && hasFlatParquet(fs, p))
  }

  /** [[publishPlain]] with the caller's BASE version pinned: `baseCur`
    * is the live version the caller read when it started computing
    * `df`, and the read-check-flip guard refuses the publish if the
    * pointer has moved past it — where publishPlain re-resolves the
    * pointer at flip time and so cannot see that its input was derived
    * from a stale base. This is how a COMPOSED publish (TableManifest's
    * data-append-then-manifest-flip) extends the two-writer lost-update
    * detection across its whole span: capture the manifest's version at
    * merge start, publish through this. */
  def publishPlainFrom(spark: SparkSession, path: String, df: DataFrame,
                       retainVersions: Int,
                       baseCur: Option[String]): Unit = {
    val fs = fsFor(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    publishVersion(spark, path, df, retainVersions, baseCur,
      baseCur.isEmpty && hasFlatParquet(fs, p))
  }

  /** Shared publish core: version write, pointer flip, GC. `cur` and
    * `legacyFlat` are the caller's already-resolved filesystem state
    * (one pointer read + listing per publish, not two).
    *
    * CONCURRENCY GUARD (read-check-flip): just before the pointer
    * flip, the live version is re-resolved; if it moved past `cur` —
    * another writer published while this merge ran — the publish
    * REFUSES (deletes its own version dir, throws
    * ConcurrentModificationException) instead of silently clobbering
    * the other writer's merge with a result computed against a stale
    * base. The caller re-runs the merge against the new base
    * (at-least-once upstream redelivery is the recovery story, same
    * as a crash). This is detection, not mutual exclusion: a window
    * remains between the check and the rename, so SINGLE-WRITER stays
    * the contract — the guard turns the most likely violation (two
    * long merges interleaving) from silent lost-update into a hard
    * error. Package-private for the two-writer interleaving spec. */
  private[operators] def publishVersion(spark: SparkSession, path: String,
                             df: DataFrame, retainVersions: Int,
                             cur: Option[String],
                             legacyFlat: Boolean): Unit = {
    require(retainVersions >= 2,
      s"retainVersions must keep at least the live version plus one " +
        s"superseded version for in-flight readers, got $retainVersions")
    val fs = fsFor(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    // ONE pre-write listing serves nextN, orphan GC, tmp GC and legacy
    // cleanup (LIST is a billable RPC at streaming cadence): under
    // single-writer, the only entries created between this listing and
    // the GC are this publish's own vname (explicitly excluded) and
    // its tmp dir (renamed away before the GC runs).
    val entries = if (fs.exists(p)) fs.listStatus(p)
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    val vdirs = entries.filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => n.startsWith("v-") && n.drop(2).forall(_.isDigit)).toSeq
    val nextN = (vdirs.map(versionNumber) :+ 0L).max + 1
    val vname = f"v-$nextN%010d"
    // Version-dir commit protocol, in three steps whose ORDER is the
    // correctness argument:
    //   1. the parquet job writes into a hidden `.tmp-v-N` dir
    //      (invisible to versionDirs and readers);
    //   2. the dir is renamed to `v-N` — atomic on POSIX/HDFS; on
    //      object stores rename is a file-by-file copy, which is why
    //      step 3 exists;
    //   3. a zero-byte `_GRAFT_COMMITTED` marker is created INSIDE
    //      `v-N` as the last act before the pointer flip. The marker
    //      is OURS — written regardless of the committer's
    //      marksuccessfuljobs setting — and nothing reads a version
    //      dir without it unless the `_CURRENT` pointer names it.
    // A writer dying at any point leaves either a `.tmp-` dir, or an
    // unmarked partial/complete `v-N` — both invisible to the
    // lost-pointer fallback (currentPlainVersion) and GC'd on the next
    // publish. Single-writer protocol, so any `.tmp-` dir present at
    // publish time belongs to a dead writer.
    val vdir = new org.apache.hadoop.fs.Path(p, vname)
    val vtmp = new org.apache.hadoop.fs.Path(p, s".tmp-$vname")
    df.write.mode(SaveMode.Overwrite).parquet(vtmp.toString)
    if (!fs.rename(vtmp, vdir))
      throw new java.io.IOException(s"cannot commit version dir $vdir")
    fs.create(new org.apache.hadoop.fs.Path(vdir, CommitMarker), true).close()
    // read-check-flip (see scaladoc): the live version must still be
    // the one this merge read as its base. Our own freshly marked dir
    // can win currentPlainVersion's lost-pointer fallback (fresh table,
    // no pointer yet) — that is not a move.
    val nowCur = currentPlainVersion(spark, path)
    if (nowCur != cur && nowCur != Some(vname)) {
      fs.delete(vdir, true)
      throw new java.util.ConcurrentModificationException(
        s"concurrent publish detected at $path: live version moved " +
          s"from ${cur.getOrElse("<none>")} to " +
          s"${nowCur.getOrElse("<none>")} while this merge ran — " +
          "refusing to flip a result computed against a stale base; " +
          "re-run the merge (single-writer is the contract, this guard " +
          "only detects violations)")
    }
    // publish: write the pointer beside the table, then one atomic
    // rename. rename-over works on POSIX; filesystems that refuse to
    // clobber get delete+rename of the POINTER FILE only (a lost
    // pointer is recoverable — readers fall back to the newest
    // version dir, see currentPlainVersion).
    val ptr = new org.apache.hadoop.fs.Path(p, PointerName)
    val tmp = new org.apache.hadoop.fs.Path(p, s"$PointerName.tmp")
    val out = fs.create(tmp, true)
    try out.write(vname.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, ptr)) {
      fs.delete(ptr, false)
      if (!fs.rename(tmp, ptr))
        throw new java.io.IOException(s"cannot publish pointer $ptr")
    }
    // GC (best-effort, post-publish): crashed-writer orphans, plus
    // published versions beyond the newest `retainVersions`. Superseded
    // versions are RETAINED for retainVersions-1 merge cycles: an
    // in-flight reader that resolved the pointer just before a flip is
    // still scanning the old dir — deleting it immediately would fail
    // any query slower than the merge cadence (continuous streaming
    // publishes every second). Size retainVersions to the slowest
    // expected reader: a reader taking R seconds against a merge
    // cadence of C seconds needs retainVersions > R/C + 1.
    // Orphan detection is purely NUMERIC: published numbers are
    // strictly increasing, so a dir numbered ABOVE the version that was
    // current when this publish began was never published (a dead
    // writer's leftover — complete or partial, either way superseded by
    // this publish; its source batch was never pointer-acknowledged, so
    // at-least-once upstream redelivery re-merges it), and a dir
    // at-or-below it is published lineage (it was _CURRENT once).
    // Deliberately NOT keyed on job markers: committers configured with
    // marksuccessfuljobs=false write no _SUCCESS, and a marker-based
    // rule would misclassify live lineage as orphans and delete the
    // reader window. Reuses the single pre-write listing (see above).
    val curN = cur.map(versionNumber).getOrElse(-1L)
    val (orphans, lineage) = vdirs.filter(_ != vname)
      .partition(v => versionNumber(v) > curN)
    val keep = lineage.sortBy(versionNumber).takeRight(retainVersions - 1).toSet
    (orphans ++ lineage.filterNot(keep))
      .foreach(v => fs.delete(new org.apache.hadoop.fs.Path(p, v), true))
    // dead writers' half-written temp dirs (single-writer: any .tmp-
    // other than the one just renamed away is stale)
    entries.filter(d => d.isDirectory &&
        d.getPath.getName.startsWith(".tmp-v-"))
      .foreach(d => fs.delete(d.getPath, true))
    if (legacyFlat)
      entries.filter(_.isFile)
        .map(_.getPath).filter(f => f.getName != PointerName)
        .foreach(fs.delete(_, false))
    spark.catalog.refreshByPath(path)
  }

  /** Result of [[compactPlain]]: file/byte counts before, files after
    * (== before when the store was already compact and the call was a
    * no-op that published nothing). */
  final case class CompactionReport(filesBefore: Int, filesAfter: Int,
                                    bytes: Long, compacted: Boolean)

  /** Small-file compaction of a [[mergeWritePlain]] store — the
    * OPTIMIZE pass every merge-on-write table needs at streaming
    * cadence: each merge publishes a version laid out by the merge
    * plan's parallelism (shuffle-partition-many files of a few KB for
    * a dim-sized table), and a reader's cost is per-FILE (open + footer
    * + row-group seek), so a store merged every second decays toward
    * thousands of tiny files per version.
    *
    * Rewrites the LIVE version into `ceil(bytes / targetBytes)` files
    * (coalesce — a narrow dependency, no shuffle) and republishes it
    * through the same atomic version-dir + pointer-flip protocol as a
    * merge: readers either resolve the old version (retained for the
    * usual `retainVersions` window) or the compacted one, never a
    * partial state; a crash mid-compaction leaves an unmarked dir that
    * the next publish GCs. Contents are bit-identical by construction —
    * compaction is a pure re-layout.
    *
    * A legacy FLAT table (bare parquet files, no version pointer) is
    * adopted into the versioned layout by the same call. Already-compact
    * stores (file count ≤ target) are left untouched — repeated
    * compaction must not bump versions forever.
    *
    * The partitioned [[mergeWrite]] layout needs no analogue: dynamic
    * partition overwrite rewrites every touched partition wholesale
    * (one file per date by construction), so partitions never fragment.
    */
  def compactPlain(spark: SparkSession, path: String,
                   targetBytes: Long = 128L << 20,
                   retainVersions: Int = 2): CompactionReport = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val fs = fsFor(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    val cur = currentPlainVersion(spark, path)
    val dataDir = cur match {
      case Some(v) => new org.apache.hadoop.fs.Path(p, v)
      case None if hasFlatParquet(fs, p) => p
      case None => return CompactionReport(0, 0, 0L, compacted = false)
    }
    val files = fs.listStatus(dataDir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    val targetN = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (cur.isDefined && files.length <= targetN)
      return CompactionReport(files.length, files.length, bytes,
        compacted = false)
    val df = spark.read.parquet(dataDir.toString).coalesce(targetN)
    publishPlain(spark, path, df, retainVersions)
    // report what was PUBLISHED, not the target: the parquet read packs
    // small files into fewer partitions than targetN when they fit one
    // maxPartitionBytes split, and coalesce never splits — so the new
    // version can legitimately carry fewer than targetN files
    val published = currentPlainVersion(spark, path)
      .map(v => fs.listStatus(new org.apache.hadoop.fs.Path(p, v))
        .count(st => st.isFile && st.getPath.getName.endsWith(".parquet")))
      .getOrElse(targetN)
    CompactionReport(files.length, published, bytes, compacted = true)
  }

  /** Read the live version of a [[mergeWritePlain]] table: the
    * `_CURRENT` pointer's version dir; with no pointer (legacy layout or
    * a lost pointer) the newest version dir, else the flat path. */
  def readPlain(spark: SparkSession, path: String): DataFrame =
    currentPlainVersion(spark, path) match {
      case Some(v) => spark.read.parquet(s"$path/$v")
      case None => spark.read.parquet(path)
    }

  /** Time travel: read a SPECIFIC retained version (as listed by
    * [[retainedVersions]]). Versions outside the retention window are
    * GC'd — size `retainVersions` to how far back readers look. */
  def readPlainVersion(spark: SparkSession, path: String,
                       version: String): DataFrame = {
    val fs = fsFor(spark, path)
    val vdir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path), version)
    require(fs.exists(vdir),
      s"version $version of $path does not exist (GC'd or never published)")
    spark.read.parquet(vdir.toString)
  }

  /** The version-dir names currently on disk, oldest first. */
  def retainedVersions(spark: SparkSession, path: String): Seq[String] =
    versionDirs(fsFor(spark, path),
      new org.apache.hadoop.fs.Path(path)).sortBy(versionNumber)

  /** Change-data capture between two retained versions of a plain
    * store: one full-outer join on `keys` comparing the md5 of the
    * remaining columns' JSON struct form. Returns the key
    * columns plus `change` ∈ {insert, delete, update} — unchanged rows
    * are absent. The diff is key-partitioned work (one shuffle per
    * side, or none when the store is written bucketed), never a
    * row-by-row driver loop — at 100 TB this is how downstream
    * consumers learn what a merge changed without re-reading the
    * table. */
  def diffVersions(spark: SparkSession, path: String,
                   oldVersion: String, newVersion: String,
                   keys: Seq[String]): DataFrame = {
    val o = readPlainVersion(spark, path, oldVersion)
    val n = readPlainVersion(spark, path, newVersion)
    require(o.columns.sorted.sameElements(n.columns.sorted),
      s"schema changed between $oldVersion and $newVersion — diff the " +
        "overlapping columns explicitly")
    val valueCols = o.columns.filterNot(keys.contains).sorted
    def hashed(df: DataFrame, as: String) = df.select(
      keys.map(col) :+
        // to_json(struct(...)): unambiguous field boundaries and
        // null-discriminating; a separator-joined concat could alias
        // rows across column boundaries
        md5(to_json(struct(valueCols.map(col): _*))).as(as): _*)
    hashed(o, "_h_old").join(hashed(n, "_h_new"), keys, "full_outer")
      .withColumn("change",
        when(col("_h_old").isNull, lit("insert"))
          .when(col("_h_new").isNull, lit("delete"))
          .when(col("_h_old") =!= col("_h_new"), lit("update")))
      .filter(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }

  private val PointerName = "_CURRENT"
  private val CommitMarker = "_GRAFT_COMMITTED"

  private[operators] def fsFor(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** The live version-dir name: pointer first; as the lost-pointer
    * recovery fallback, the newest version dir carrying a completion
    * marker — our own `_GRAFT_COMMITTED` (written by publishVersion as
    * the last act before the pointer flip, independent of the
    * committer's marksuccessfuljobs setting) or the committer's
    * `_SUCCESS` (pre-_GRAFT_COMMITTED layouts). A bare unmarked dir is
    * NEVER adopted: on object stores the dir rename is a file-by-file
    * copy, so an unmarked `v-` dir can be a dead writer's half-copied
    * version — exactly the garbage the marker exists to exclude. A
    * crash between rename and marker leaves the dir unadopted AND the
    * pointer unflipped, so that publish simply never happened
    * (upstream redelivery re-merges its batch). None for flat/absent
    * tables. */
  def currentPlainVersion(spark: SparkSession, path: String): Option[String] = {
    val fs = fsFor(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    val ptr = new org.apache.hadoop.fs.Path(p, PointerName)
    val pointed =
      if (!fs.exists(ptr)) None
      else {
        val in = fs.open(ptr)
        try {
          val r = new java.io.BufferedReader(new java.io.InputStreamReader(
            in, java.nio.charset.StandardCharsets.UTF_8))
          Option(r.readLine()).map(_.trim).filter(_.nonEmpty)
        } finally in.close()
      }
    def marked(v: String): Boolean = fs.exists(new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(p, v), CommitMarker))
    def legacyCommitted(v: String): Boolean = fs.exists(
      new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(p, v),
        "_SUCCESS"))
    val dirs = versionDirs(fs, p)
    val markedDirs = dirs.filter(marked)
    // _SUCCESS counts as commit proof ONLY on a pure pre-marker table:
    // once any dir carries our marker, the writer is marker-layout, and
    // an unmarked dir — even with _SUCCESS — is a dead writer's
    // half-copied rename (the parquet job writes _SUCCESS into the tmp
    // dir BEFORE the copy, so a partial dir can still carry it)
    pointed.filter(v => fs.exists(new org.apache.hadoop.fs.Path(p, v)))
      .orElse(markedDirs.sorted.lastOption)
      .orElse(if (markedDirs.isEmpty)
        dirs.filter(legacyCommitted).sorted.lastOption else None)
  }

  private def versionDirs(fs: org.apache.hadoop.fs.FileSystem,
                          p: org.apache.hadoop.fs.Path): Seq[String] =
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => n.startsWith("v-") && n.drop(2).forall(_.isDigit)).toSeq

  private def versionNumber(name: String): Long = name.drop(2).toLong

  private def hasFlatParquet(fs: org.apache.hadoop.fs.FileSystem,
                             p: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(p) && fs.listStatus(p)
      .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet"))

  /** What [[mergeWrite]] decided: how many partitions the batch
    * touched, the estimated distinct-key cardinality of the batch, and
    * whether the anti-join broadcast the key set. The create-table
    * first write reports (0, 0, false) — there is no join to plan. */
  final case class MergeWriteReport(touchedPartitions: Int,
                                    keyEstimate: Long,
                                    broadcastKeys: Boolean)

  /** Merge `updates` into the date-partitioned parquet table at `path`,
    * rewriting ONLY the partitions the batch touches. Creates the table on
    * first write. `partitionCol` values must be present in `updates`.
    *
    * The broadcast-vs-shuffle anti-join decision gates on the batch's
    * ESTIMATED DISTINCT-KEY COUNT (`approx_count_distinct`, computed in
    * the same single stats pass as the touched-partition IN-list), not
    * on how many partitions it touches — two touched dates of a
    * mega-table can carry millions of keys, and a partition-count gate
    * would happily broadcast them (the r4 audit's few-but-huge hole;
    * MergeStress's `few-huge` case proves the switch). */
  /** ONE stats pass over a batch: the touched-partition IN-list (small
    * by construction — one ingest covers few dates) and the
    * key-cardinality estimate the join decision needs. Exposed to
    * callers (TableManifest) that need `touched` for their own
    * bookkeeping, so the batch is scanned once, not once per layer. */
  def batchStats(updates: DataFrame, keys: Seq[String],
                 partitionCol: String): (Seq[Any], Long) = {
    val statsRow = updates.agg(
      collect_set(col(partitionCol)).as("parts"),
      approx_count_distinct(xxhash64(keys.map(col): _*)).as("key_est"))
      .collect().head
    (statsRow.getSeq[Any](0), statsRow.getLong(1))
  }

  def mergeWrite(spark: SparkSession, path: String, updates: DataFrame,
                 keys: Seq[String], partitionCol: String = "date",
                 broadcastMaxKeys: Long = 500000L,
                 listingVia: Option[Seq[Any] => DataFrame] = None,
                 cow: Boolean = false,
                 precomputedStats: Option[(Seq[Any], Long)] = None)
      : MergeWriteReport = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(path))
    if (!exists) {
      // repartition by the partition column first: otherwise EVERY task
      // writes a file into EVERY touched partition (tasks × dates tiny
      // files — measured 80× write amplification on a historical
      // backfill spanning ~2400 dates)
      updates.dropDuplicates(keys)
        .repartition(col(partitionCol))
        .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
      return MergeWriteReport(0, 0L, broadcastKeys = false)
    }
    val (touched, keyEst) =
      precomputedStats.getOrElse(batchStats(updates, keys, partitionCol))
    // `listingVia` (e.g. TableManifest's file-zone planner) resolves
    // the touched partitions' rows WITHOUT the O(partitions) recursive
    // root listing — MergeStress measured that listing as the dominant
    // cost of incremental merges at 2400 partitions. Default keeps the
    // plain scan+filter (partition pruning still skips data, but the
    // discovery listing is table-wide).
    val pruned = listingVia match {
      case Some(resolve) => resolve(touched)
      case None => spark.read.parquet(path)
        .filter(col(partitionCol).isin(touched: _*))
    }
    // Incremental batches (few distinct keys) keep the broadcast
    // anti-join; a backfill-scale key set — whether spread over 600
    // dates or packed into 2 — switches to a shuffle join before the
    // broadcast becomes the bottleneck.
    val broadcastDecision = keyEst <= broadcastMaxKeys
    val merged = merge(pruned, updates, keys,
      broadcastKeys = broadcastDecision)
    // Publish the touched partitions' merged rows. Two physical modes
    // with identical logical semantics for manifest-planned readers:
    //   - dynamic partition overwrite (default): replace the touched
    //     partitions in place — superseded files are DELETED by the
    //     commit, so the dir stays plain-readable but no prior
    //     snapshot of a rewritten partition survives;
    //   - copy-on-write (`cow`, the TableManifest protocol): APPEND
    //     the merged rows as new immutable files and leave the
    //     superseded ones on disk — visibility is the MANIFEST version
    //     flip, prior versions stay readable (time travel / in-flight
    //     readers) until TableManifest.vacuum reclaims them. A cow dir
    //     is NOT plain-readable after its first rewrite (it holds both
    //     generations); every read must plan from the manifest.
    val laidOut = merged
      .repartition(col(partitionCol)) // one task per date → one file per date
      .sortWithinPartitions(keys.map(col): _*) // clustered row groups →
      // parquet min/max stats prune key lookups inside each date file
      .write
    if (cow)
      laidOut.mode(SaveMode.Append).partitionBy(partitionCol).parquet(path)
    else laidOut
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
    // invalidate the shared file-listing cache for readers of this path
    spark.catalog.refreshByPath(path)
    MergeWriteReport(touched.length, keyEst, broadcastDecision)
  }
}
