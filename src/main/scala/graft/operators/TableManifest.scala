package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File manifest for [[MergeUpsert.mergeWrite]]'s date-partitioned
  * tables — the Delta/Iceberg idea reduced to its load-bearing core:
  * readers and point lookups plan from a SMALL metadata table instead
  * of an O(partitions) recursive directory listing, which MergeStress
  * measured as the dominant cost of incremental merges and point
  * lookups at 2400 partitions (PERF.md round-8 — "the argument for a
  * manifest-backed table format in front of the same merge plan").
  *
  * One row per data file: (file, part, rows, key lo/hi) — the zone-map
  * stats (x140) keyed by file, published through the same atomic
  * `_CURRENT`-pointer protocol as every other store in this engine
  * ([[MergeUpsert.publishPlain]] on `path/_manifest`; the underscore
  * prefix keeps it invisible to plain parquet readers of `path`).
  * Maintenance is O(touched): after a merge rewrites k partitions, only
  * those partitions' rows are re-scanned and replaced; the publish is
  * the same pointer flip the data itself gets.
  *
  * Reference: the reference stores rows in Postgres where point
  * lookups ride a B-tree (`backend/app/main.py:110-373`); at 100 TB the
  * manifest's (partition, key-range) pruning is the distributed
  * equivalent of that index. */
object TableManifest {

  private def manifestPath(path: String) = s"$path/_manifest"

  /** `input_file_name()` returns the URI-ENCODED path (SparkPath's
    * url-encoded form); the manifest stores the DECODED filesystem
    * path, so re-reads address the literal on-disk names (a partition
    * value with a space yields a dir with a literal space but a `%20`
    * in the URI form — reading the encoded string back would miss it).
    * `url_decode` form-decodes `'+'` to space, so literal `'+'` is
    * protected first; a real `'%'` in the name is always `%25` in the
    * URI form, so one decode is exact. */
  private[operators] def decodeUri(c: Column): Column =
    url_decode(regexp_replace(c, "\\+", "%2B"))

  /** Scan the given partition values' files and compute one manifest
    * row per file. O(touched partitions), not O(table). */
  private def statsFor(spark: SparkSession, path: String,
                       partitionCol: String, parts: Seq[Any],
                       keyCol: String): DataFrame =
    // the partition DIRS are addressed directly (basePath keeps the
    // partition column) — listing touches k dirs, never the table root
    // recursively, so maintenance stays O(touched) in LIST calls too.
    // Partition VALUES are escaped exactly as the writer escaped them
    // (Spark's Hive-style partition-path escaping) so values with
    // reserved chars (':', '%', '#', …) address the real dir.
    spark.read.option("basePath", path)
      .parquet(parts.map(v => s"$path/$partitionCol=" +
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(v.toString)): _*)
      .groupBy(decodeUri(input_file_name()).as("file"),
        col(partitionCol).cast("string").as("part"))
      .agg(count(lit(1)).as("rows"),
        min(col(keyCol)).cast("string").as("key_lo"),
        max(col(keyCol)).cast("string").as("key_hi"))

  /** (Re)build manifest rows for `touched` partitions and publish the
    * merged manifest atomically. Call with the table's full partition
    * set after a create, with the batch's touched set after a merge.
    * Untouched partitions' rows carry over byte-for-byte — their files
    * were not rewritten (the dynamic-overwrite contract). */
  def update(spark: SparkSession, path: String, partitionCol: String,
             touched: Seq[Any], keyCol: String,
             retainVersions: Int = 2): Unit = {
    val fresh = statsFor(spark, path, partitionCol, touched, keyCol)
    val parts = touched.map(_.toString)
    val merged = load(spark, path) match {
      case None => fresh
      case Some(old) => old.filter(!col("part").isin(parts: _*))
        .unionByName(fresh)
    }
    MergeUpsert.publishPlain(spark, manifestPath(path), merged,
      retainVersions)
  }

  /** The live manifest, or None before the first [[update]]. */
  def load(spark: SparkSession, path: String): Option[DataFrame] =
    MergeUpsert.existingPlain(spark, manifestPath(path))

  /** [[MergeUpsert.mergeWrite]] + manifest maintenance: the touched
    * partition set is computed once from the batch (O(batch)), the
    * manifest refresh re-scans only those partitions' files. First
    * write bootstraps the manifest over the whole (just-created)
    * table. */
  def mergeWriteManifested(spark: SparkSession, path: String,
                           updates: DataFrame, keys: Seq[String],
                           partitionCol: String = "date",
                           zoneKey: Option[String] = None)
      : MergeUpsert.MergeWriteReport = {
    // when a manifest already exists, the merge's existing-rows read
    // plans from it (file list per touched partition, zero root
    // listing); new partitions simply resolve to no files
    val resolver = load(spark, path).map { m => (touched: Seq[Any]) =>
      val all = m.select("file", "part").collect()
      val kept = all.filter(r =>
        touched.map(_.toString).contains(r.getString(1)))
        .map(_.getString(0))
      if (kept.isEmpty)
        spark.read.option("basePath", path)
          .parquet(all.head.getString(0)).filter(lit(false))
      else spark.read.option("basePath", path)
        .parquet(kept.toIndexedSeq: _*)
    }
    val report = MergeUpsert.mergeWrite(spark, path, updates, keys,
      partitionCol, listingVia = resolver)
    val touched = updates.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    update(spark, path, partitionCol, touched,
      zoneKey.getOrElse(keys.head))
    report
  }

  /** Manifest-planned read of the given PARTITION values: keep only
    * the manifest files whose partition matches — the date-filtered
    * endpoint read (QueryLayer's q07–q10 path) with zero directory
    * listing. Falls back to the plain partition-pruned scan when the
    * table has no manifest (a legacy table; pruning still skips data,
    * but discovery lists the root). The residual `isin` filter keeps
    * semantics identical either way. */
  def readPartitions(spark: SparkSession, path: String, parts: Seq[Any],
                     partitionCol: String = "date"): DataFrame =
    load(spark, path) match {
      case None =>
        spark.read.parquet(path)
          .filter(col(partitionCol).isin(parts: _*))
      case Some(m) =>
        val want = parts.map(_.toString)
        val all = m.select("file", "part").collect()
        require(all.nonEmpty, s"manifest at $path lists no files")
        val kept = all.filter(r => want.contains(r.getString(1)))
          .map(_.getString(0))
        val df =
          if (kept.isEmpty)
            spark.read.option("basePath", path)
              .parquet(all.head.getString(0)).filter(lit(false))
          else spark.read.option("basePath", path)
            .parquet(kept.toIndexedSeq: _*)
        df.filter(col(partitionCol).isin(parts: _*))
    }

  /** [[readViaManifest]] when a manifest exists, the plain scan
    * otherwise — the drop-in whole-table read for pipelines whose
    * tables may predate manifest adoption. */
  def readOrPlain(spark: SparkSession, path: String): DataFrame =
    if (load(spark, path).isDefined) readViaManifest(spark, path)
    else spark.read.parquet(path)

  final case class CompactReport(partsCompacted: Int, filesBefore: Long,
                                 filesAfter: Long)

  /** Small-file compaction REGISTERED in the manifest: partitions
    * whose file count exceeds `maxFilesPerPart` are found from the
    * manifest itself (zero listing), their rows rewritten as one file
    * per partition through the same dynamic partition overwrite the
    * merge path uses, and exactly those partitions' manifest rows
    * refreshed through the same atomic `_manifest` publish. Untouched
    * partitions' files and manifest rows carry over byte-for-byte.
    * Incremental merges can't create this state themselves (the merge
    * repartitions to one file per touched date) — external appenders
    * and task-parallel writers can, and their read cost would
    * otherwise grow with every small file.
    *
    * Contract: the manifest must be CURRENT (run [[update]] after any
    * out-of-band append) — the rewrite reads exactly the manifest's
    * file list, so rows in unregistered files of a compacted partition
    * would not survive the overwrite. */
  def compactManifested(spark: SparkSession, path: String,
                        keyCol: String, partitionCol: String = "date",
                        maxFilesPerPart: Int = 1,
                        retainVersions: Int = 2): CompactReport = {
    val m = load(spark, path)
      .getOrElse(sys.error(s"no manifest at $path — call update() first"))
      .select("file", "part").collect()
    val byPart = m.groupBy(_.getString(1))
    val over = byPart.filter(_._2.length > maxFilesPerPart)
    if (over.isEmpty)
      return CompactReport(0, m.length.toLong, m.length.toLong)
    val files = over.valuesIterator.flatten.map(_.getString(0)).toSeq
    // read ONLY the over-threshold partitions' files (manifest-planned),
    // rewrite them one-file-per-partition via dynamic overwrite — the
    // same publish the merge path uses, so readers never see a partial
    // partition
    spark.read.option("basePath", path)
      .parquet(files: _*)
      .repartition(col(partitionCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
    spark.catalog.refreshByPath(path)
    // refresh exactly the compacted partitions' manifest rows; the
    // partition values re-enter statsFor in their DECODED string form
    // (escaped back to the on-disk dir names there)
    update(spark, path, partitionCol, over.keys.toSeq, keyCol,
      retainVersions)
    // filesAfter is MEASURED from the refreshed manifest (one row per
    // file), not derived from a one-file-per-partition assumption a
    // writer setting like maxRecordsPerFile could break
    CompactReport(over.size, m.length.toLong,
      load(spark, path).map(_.count()).getOrElse(0L))
  }

  /** The manifest's retained version names (oldest first) — the
    * manifest is itself a versioned plain store, so metadata time
    * travel rides [[MergeUpsert.retainedVersions]] directly. */
  def versions(spark: SparkSession, path: String): Seq[String] =
    MergeUpsert.retainedVersions(spark, manifestPath(path))

  /** Metadata time-travel audit between two retained manifest
    * versions: per partition, file/row counts before and after plus a
    * status — `added` (new partition), `removed`, `rewritten` (file
    * set changed: a merge or compaction touched it), `carried`
    * (byte-identical carry-over). Answers "what did last night's
    * merges touch, and how did the row counts move" from O(files)
    * METADATA — no data file is opened, which at 100 TB is the
    * difference between an audit query and a table scan. */
  def diffVersions(spark: SparkSession, path: String,
                   vOld: String, vNew: String): DataFrame = {
    val mp = manifestPath(path)
    def side(v: String, p: String) =
      MergeUpsert.readPlainVersion(spark, mp, v)
        .groupBy("part")
        .agg(count(lit(1)).as(s"${p}files"),
          sum(col("rows")).as(s"${p}rows"),
          sort_array(collect_list(col("file"))).as(s"${p}fs"))
    side(vOld, "o_").join(side(vNew, "n_"), Seq("part"), "full")
      .select(col("part"),
        coalesce(col("o_files"), lit(0L)).as("files_before"),
        coalesce(col("n_files"), lit(0L)).as("files_after"),
        coalesce(col("o_rows"), lit(0L)).as("rows_before"),
        coalesce(col("n_rows"), lit(0L)).as("rows_after"),
        when(col("o_fs").isNull, lit("added"))
          .when(col("n_fs").isNull, lit("removed"))
          .when(col("o_fs") === col("n_fs"), lit("carried"))
          .otherwise(lit("rewritten")).as("status"))
      .orderBy("part")
  }

  final case class LookupReport(filesTotal: Long, filesKept: Long)

  /** Read the whole table by manifest file list — zero directory
    * listing on the read path (the manifest read is one small
    * versioned table). Schema/partition semantics match
    * `spark.read.parquet(path)` via basePath. */
  def readViaManifest(spark: SparkSession, path: String): DataFrame = {
    val files = load(spark, path)
      .getOrElse(sys.error(s"no manifest at $path — call update() first"))
      .select("file").collect().map(_.getString(0))
    require(files.nonEmpty, s"manifest at $path lists no files")
    spark.read.option("basePath", path).parquet(files.toIndexedSeq: _*)
  }

  /** Manifest-planned point/range lookup: keep only files whose
    * partition matches (when given) AND whose [key_lo, key_hi] zone
    * intersects [lo, hi] — the comparison happens in the KEY's own
    * type, so string zones compare in string order and numeric zones
    * numerically (the manifest stores zones as strings; they are cast
    * back here). Returns the exact-filtered rows plus the prune
    * evidence. */
  def lookup(spark: SparkSession, path: String, keyCol: String,
             lo: Any, hi: Any, partitionCol: String = "date",
             partVal: Option[Any] = None)
      : (DataFrame, LookupReport) = {
    val m = load(spark, path)
      .getOrElse(sys.error(s"no manifest at $path — call update() first"))
    // one row per FILE — bounded metadata, not table data. The key's
    // type comes from ONE manifest-listed file's footer, never from a
    // whole-table listing (which is the cost this path exists to skip).
    val allFiles = m.select("file").collect().map(_.getString(0))
    require(allFiles.nonEmpty, s"manifest at $path lists no files")
    val keyType = spark.read.parquet(allFiles.head).schema(keyCol).dataType
    val zoned = m.filter(
      col("key_lo").cast(keyType) <= lit(hi) &&
      col("key_hi").cast(keyType) >= lit(lo))
    val pruned = partVal match {
      case Some(v) => zoned.filter(col("part") === lit(v.toString))
      case None => zoned
    }
    val kept = pruned.select("file").collect().map(_.getString(0))
    val total = allFiles.length.toLong
    val df =
      if (kept.isEmpty)
        spark.read.option("basePath", path)
          .parquet(allFiles.head)
          .filter(lit(false))
      else spark.read.option("basePath", path)
        .parquet(kept.toIndexedSeq: _*)
    val exact = partVal match {
      case Some(v) =>
        df.filter(col(keyCol).between(lit(lo), lit(hi)) &&
          col(partitionCol) === lit(v))
      case None => df.filter(col(keyCol).between(lit(lo), lit(hi)))
    }
    (exact, LookupReport(total, kept.length))
  }
}
