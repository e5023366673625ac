package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File manifest for keyed, date-partitioned parquet tables — the
  * Delta/Iceberg idea reduced to its load-bearing core: readers and
  * point lookups plan from a SMALL metadata table instead of an
  * O(partitions) recursive directory listing, which MergeStress
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
  * those partitions' NEW files are scanned and their rows replaced; the
  * publish is the same pointer flip the data itself gets.
  *
  * COPY-ON-WRITE data protocol (round 12): a merge or compaction
  * APPENDS new immutable files and never deletes — what changes is
  * which files the freshly published manifest version references. That
  * makes every retained manifest version a complete, readable SNAPSHOT
  * of the table ([[readVersion]] time travel; an in-flight reader that
  * planned from the previous version keeps valid files under its
  * feet), at the price that the partition dirs accumulate superseded
  * files until [[vacuum]] reclaims the ones no retained version
  * references. Consequently a manifested table is NOT plain-readable
  * after its first rewrite — `spark.read.parquet(path)` would see both
  * generations; every read must plan from the manifest
  * ([[readViaManifest]] / [[readPartitions]] / [[lookup]]), exactly
  * Delta's contract for its log.
  *
  * Reference: the reference stores rows in Postgres where point
  * lookups ride a B-tree (`backend/app/main.py:110-373`); at 100 TB the
  * manifest's (partition, key-range) pruning is the distributed
  * equivalent of that index. */
object TableManifest {

  private def manifestPath(path: String) = s"$path/_manifest"

  /** Driver-side planning bound: a manifest read materializes the
    * MATCHING file rows (never the whole manifest) on the driver to
    * hand Spark an explicit file list — one string per data file, the
    * same driver cost Delta pays to plan a scan. At the Delta-scale
    * contract of ~100 MB–1 GB data files, 2M rows ≈ 200 TB–2 PB of
    * addressed data; a collect beyond it means the table needs
    * [[compactManifested]], not a bigger driver. */
  private val MaxPlanFiles = 2000000

  /** [[vacuum]]'s driver-fast-path gates: at most this many partition
    * dirs are listed driver-side, and at most this many on-disk files
    * set-diffed in driver memory (≈ a few MB of path strings). Past
    * either, vacuum switches to the distributed listing + anti-join —
    * the 1e6-file MergeStress shape. */
  private val VacuumDriverMaxParts = 256
  private val VacuumDriverMaxFiles = 100000

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

  /** Scheme-and-slash-count–insensitive identity for a file path:
    * manifest rows carry `input_file_name`'s decoded URI form
    * (`file:///tmp/...`) while FileSystem listings print `file:/tmp/...`
    * — both normalize to the same raw `/tmp/...` through the Path→URI
    * round-trip (which [[TableManifestSpec]] proves for names carrying
    * spaces, '%', '+', ':'). Used ONLY for set membership
    * ([[vacuum]]'s live/dead split); reads use the original strings. */
  private def canon(s: String): String =
    new org.apache.hadoop.fs.Path(s).toUri.getPath

  /** [[canon]] as a column (vacuum's distributed live/dead split runs
    * it on executors). A UDF, deliberately: the normalization must be
    * THE SAME function the spec proves on hostile names — replicating
    * Path→URI semantics in regexp would fork the definition. Metadata
    * scale only (manifest rows and dir listings), never row data. */
  private val canonCol =
    udf((s: String) => new org.apache.hadoop.fs.Path(s).toUri.getPath)

  private def partDir(path: String, partitionCol: String, v: Any): String =
    s"$path/$partitionCol=" +
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(v.toString)

  /** The given partition values' current on-disk parquet files —
    * k LIST calls against the partition DIRS (absent dirs contribute
    * nothing), never a recursive root listing. The before/after pair
    * of these listings around a copy-on-write append is how the new
    * files are identified without any committer hook. */
  private def listPartFiles(spark: SparkSession, path: String,
                            partitionCol: String,
                            parts: Seq[Any]): Set[String] = {
    val fs = MergeUpsert.fsFor(spark, path)
    parts.flatMap { v =>
      val d = new org.apache.hadoop.fs.Path(partDir(path, partitionCol, v))
      if (!fs.exists(d)) Seq.empty[String]
      else fs.listStatus(d).toIndexedSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    }.toSet
  }

  /** One manifest row per given data file — O(new files), the
    * incremental refresh unit of every copy-on-write publish. */
  private def statsForFiles(spark: SparkSession, path: String,
                            files: Seq[String], partitionCol: String,
                            keyCol: String): DataFrame =
    spark.read.option("basePath", path)
      .parquet(files: _*)
      .groupBy(decodeUri(input_file_name()).as("file"),
        col(partitionCol).cast("string").as("part"))
      .agg(count(lit(1)).as("rows"),
        min(col(keyCol)).cast("string").as("key_lo"),
        max(col(keyCol)).cast("string").as("key_hi"))

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
      .parquet(parts.map(v => partDir(path, partitionCol, v)): _*)
      .groupBy(decodeUri(input_file_name()).as("file"),
        col(partitionCol).cast("string").as("part"))
      .agg(count(lit(1)).as("rows"),
        min(col(keyCol)).cast("string").as("key_lo"),
        max(col(keyCol)).cast("string").as("key_hi"))

  /** (Re)build manifest rows for `touched` partitions from a FULL
    * rescan of those partitions' dirs, and publish the merged manifest
    * atomically. This is the BOOTSTRAP/adoption path (a table created
    * by plain writes gains a manifest; MergeStress uses it at 2400
    * partitions): the dir rescan registers EVERY file it finds, so on
    * a copy-on-write table it is only correct for partitions that hold
    * no superseded files — i.e. never rewritten, or vacuumed with
    * `keepVersions = 1` since their last rewrite. For out-of-band data
    * arrival on a live table use [[appendManifested]], which registers
    * exactly the files it wrote. */
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

  /** The matching file rows' paths, collected BOUNDED: only rows whose
    * partition matches reach the driver (O(files in the requested
    * partitions), never O(table files)). */
  private def keptFiles(m: DataFrame, parts: Seq[String]): Array[String] = {
    val kept = m.filter(col("part").isin(parts: _*))
      .select("file").collect().map(_.getString(0))
    require(kept.length <= MaxPlanFiles,
      s"${kept.length} files match ${parts.length} partitions — beyond " +
        s"the $MaxPlanFiles-file planning bound; compact the table " +
        "(compactManifested) before reading this partition set")
    kept
  }

  /** An explicit-file-list read that stays schema-correct when the
    * list is empty: one manifest-listed file is read (for its schema)
    * under a false filter. `mergeSchema` reconciles files written under
    * EVOLVED schemas (add-column appends — x244): absent columns read
    * null, at the cost of a footer read per listed file (distributed,
    * but not free — leave it off for fixed-schema tables). */
  private def readFiles(spark: SparkSession, path: String, m: DataFrame,
                        kept: Seq[String],
                        mergeSchema: Boolean = false): DataFrame = {
    val rd = spark.read.option("basePath", path)
      .option("mergeSchema", mergeSchema.toString)
    if (kept.isEmpty) {
      val sample = m.select("file").limit(1).collect()
      require(sample.nonEmpty, s"manifest at $path lists no files")
      rd.parquet(sample.head.getString(0)).filter(lit(false))
    } else rd.parquet(kept: _*)
  }

  /** [[MergeUpsert.mergeWrite]] + manifest maintenance, copy-on-write:
    * the touched partition set is computed once from the batch
    * (O(batch)); the merge's existing-rows read plans from the
    * manifest (file list per touched partition, zero root listing);
    * the merged rows are APPENDED as new immutable files (the
    * superseded generation stays on disk for retained-version readers
    * and [[readVersion]], reclaimed by [[vacuum]]); and exactly the
    * new files' manifest rows are computed (before/after dir listing
    * of the touched partitions) and published atomically. First write
    * bootstraps both table and manifest. A crash between the data
    * append and the manifest publish leaves unreferenced files that no
    * reader ever sees and [[vacuum]] reclaims — strictly safer than
    * the in-place overwrite it replaces, which deleted files still
    * referenced by retained manifest versions.
    *
    * `zoneKey` picks the manifest's zone column (default `keys.head`);
    * it must stay the same across every publish to a table — mixed-key
    * zones would make [[lookup]]'s typed zone cast silently prune
    * wrong. */
  def mergeWriteManifested(spark: SparkSession, path: String,
                           updates: DataFrame, keys: Seq[String],
                           partitionCol: String = "date",
                           zoneKey: Option[String] = None,
                           retainVersions: Int = 2,
                           beforeManifestPublish: () => Unit = () => ())
      : MergeUpsert.MergeWriteReport = {
    // the manifest version this merge PLANS from, captured before any
    // work: the final manifest flip is guarded against it, so a second
    // manifested writer interleaving anywhere in the merge+append span
    // is refused at the flip instead of silently unreferencing the
    // other writer's publish (its own appended data files stay
    // unreferenced orphans, reclaimed by vacuum) — the two-writer spec
    // interleaves through the beforeManifestPublish seam.
    val mBase = MergeUpsert.currentPlainVersion(spark, manifestPath(path))
    // ONE stats pass serves this layer's touched-partition bookkeeping
    // AND mergeWrite's broadcast decision (it would otherwise re-scan
    // the batch for the same numbers — one whole Spark job per merge
    // at streaming cadence)
    val stats @ (touched, _) =
      MergeUpsert.batchStats(updates, keys, partitionCol)
    val existing = load(spark, path)
    // when a manifest already exists, the merge's existing-rows read
    // plans from it; new partitions simply resolve to no files
    val resolver = existing.map { m => (ts: Seq[Any]) =>
      readFiles(spark, path, m,
        keptFiles(m, ts.map(_.toString)).toIndexedSeq)
    }
    val before = listPartFiles(spark, path, partitionCol, touched)
    val report = MergeUpsert.mergeWrite(spark, path, updates, keys,
      partitionCol, listingVia = resolver, cow = true,
      precomputedStats = Some(stats))
    val newFiles =
      (listPartFiles(spark, path, partitionCol, touched) -- before).toSeq
    beforeManifestPublish()
    if (newFiles.nonEmpty) {
      // manifest maintenance is METADATA-scale always (rows = file
      // count, bounded by MaxPlanFiles) — its stats agg and publish
      // write must not inherit the session's data-sized shuffle count
      // (measured ~0.3 s/publish of pure tiny-task overhead at 32)
      graft.ScopedSessionConf.withShufflePartitions(spark, 4) {
        val fresh = statsForFiles(spark, path, newFiles, partitionCol,
          zoneKey.getOrElse(keys.head))
        val parts = touched.map(_.toString)
        val merged = existing match {
          case None => fresh
          case Some(old) => old.filter(!col("part").isin(parts: _*))
            .unionByName(fresh)
        }
        MergeUpsert.publishPlainFrom(spark, manifestPath(path), merged,
          retainVersions, mBase)
      }
    }
    report
  }

  /** Out-of-band APPEND with exact manifest registration: writes `df`
    * as new files (no merge semantics — the caller owns key
    * uniqueness) and registers EXACTLY the files it wrote, leaving
    * every existing manifest row in place. This is the safe form of
    * "external writer lands data on a live table": unlike [[update]]'s
    * dir rescan it cannot resurrect superseded copy-on-write files,
    * because it never looks at files it didn't just create. */
  /** Wholesale COPY-ON-WRITE replacement of a PARTITION SET's
    * contents: `df` (whose rows must all fall in `replaceParts` — the
    * caller owns that containment) is appended as new immutable files,
    * and one atomic manifest publish drops every existing row of
    * `replaceParts` while adding exactly the new files. Partitions
    * outside `replaceParts` are untouched — this is the fold primitive
    * for merge-on-read layouts (StreamCuration's curated epochs: N
    * published epoch partitions minus a deletes store collapse into
    * one fresh epoch, while unpublished epochs above the fold keep
    * accumulating). The superseded generation stays on disk for
    * retained-version readers ([[readVersion]]) until [[vacuum]].
    * Same interleave guard as [[mergeWriteManifested]]: the manifest
    * base is pinned first, so a concurrent publish is refused at the
    * flip and this call's appended files stay vacuumable orphans. */
  def replacePartitions(spark: SparkSession, path: String, df: DataFrame,
                        keyCol: String, partitionCol: String,
                        replaceParts: Seq[Any],
                        retainVersions: Int = 2,
                        landingParts: Option[Seq[Any]] = None): Unit = {
    val mBase = MergeUpsert.currentPlainVersion(spark, manifestPath(path))
    // first write BOOTSTRAPS (no manifest yet → nothing to drop):
    // replacePartitions doubles as the idempotent "this partition's
    // contents ARE this frame" writer (StreamCuration's epoch inserts)
    val m = mBase.map(v => spark.read.parquet(s"${manifestPath(path)}/$v"))
      .orElse(load(spark, path))
    // only the dirs receiving NEW files need the before/after listing;
    // the dropped partitions are removed from the manifest by name.
    // Callers that KNOW df's partition set pass it via `landingParts`
    // (it must cover every partition value df writes — a missed value
    // leaves that dir's new files unregistered) so df executes exactly
    // once, in the write (r15 advice: compactCurated's fold plan was
    // paid twice — once for this distinct-collect, once writing).
    val landing = landingParts.getOrElse(
      df.select(col(partitionCol)).distinct().collect().map(_.get(0)).toSeq)
    val before = listPartFiles(spark, path, partitionCol, landing)
    df.write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy(partitionCol).parquet(path)
    spark.catalog.refreshByPath(path)
    val newFiles =
      (listPartFiles(spark, path, partitionCol, landing) -- before).toSeq
    graft.ScopedSessionConf.withShufflePartitions(spark, 4) {
      val dropped = replaceParts.map(_.toString)
      val kept = m.map(_.filter(!col("part").isin(dropped: _*)))
      val fresh =
        if (newFiles.isEmpty) None
        else Some(statsForFiles(spark, path, newFiles, partitionCol, keyCol))
      (kept, fresh) match {
        case (Some(k), Some(f)) =>
          MergeUpsert.publishPlainFrom(spark, manifestPath(path),
            k.unionByName(f), retainVersions, mBase)
        case (Some(k), None) =>
          MergeUpsert.publishPlainFrom(spark, manifestPath(path), k,
            retainVersions, mBase)
        case (None, Some(f)) =>
          MergeUpsert.publishPlainFrom(spark, manifestPath(path), f,
            retainVersions, mBase)
        case (None, None) => () // empty df on an absent table: no-op
      }
    }
  }

  def appendManifested(spark: SparkSession, path: String, df: DataFrame,
                       keyCol: String, partitionCol: String = "date",
                       retainVersions: Int = 2): Unit = {
    // pinned like mergeWriteManifested's mBase: a concurrent manifest
    // publish during the append is refused at the flip
    val mBase = MergeUpsert.currentPlainVersion(spark, manifestPath(path))
    val touched = df.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    val before = listPartFiles(spark, path, partitionCol, touched)
    df.write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy(partitionCol).parquet(path)
    spark.catalog.refreshByPath(path)
    val newFiles =
      (listPartFiles(spark, path, partitionCol, touched) -- before).toSeq
    if (newFiles.isEmpty) return
    // metadata-scale publish: see mergeWriteManifested's scoped block
    graft.ScopedSessionConf.withShufflePartitions(spark, 4) {
      val fresh = statsForFiles(spark, path, newFiles, partitionCol, keyCol)
      val merged = load(spark, path) match {
        case None => fresh
        case Some(old) => old.unionByName(fresh)
      }
      MergeUpsert.publishPlainFrom(spark, manifestPath(path), merged,
        retainVersions, mBase)
    }
  }

  /** Manifest-planned read of the given PARTITION values: keep only
    * the manifest files whose partition matches — the date-filtered
    * endpoint read (QueryLayer's q07–q10 path) with zero directory
    * listing and an O(matching files) driver plan (never the whole
    * manifest). Falls back to the plain partition-pruned scan when the
    * table has no manifest (a legacy, never-rewritten table; pruning
    * still skips data, but discovery lists the root). The residual
    * `isin` filter keeps semantics identical either way.
    *
    * Manifest-currency contract (applies to every manifest-planned
    * read here): files appended out-of-band and never registered via
    * [[appendManifested]]/[[update]] are INVISIBLE — derived jobs
    * reading through the manifest silently exclude them, they do not
    * fail. Register every out-of-band arrival before reading. */
  def readPartitions(spark: SparkSession, path: String, parts: Seq[Any],
                     partitionCol: String = "date"): DataFrame =
    load(spark, path) match {
      case None =>
        spark.read.parquet(path)
          .filter(col(partitionCol).isin(parts: _*))
      case Some(m) =>
        val kept = keptFiles(m, parts.map(_.toString))
        readFiles(spark, path, m, kept.toIndexedSeq)
          .filter(col(partitionCol).isin(parts: _*))
    }

  /** [[readViaManifest]] when a manifest exists, the plain scan
    * otherwise — the drop-in whole-table read for pipelines whose
    * tables may predate manifest adoption. Same manifest-currency
    * contract as [[readPartitions]]: unregistered out-of-band files
    * are silently excluded, not an error. */
  def readOrPlain(spark: SparkSession, path: String): DataFrame =
    if (load(spark, path).isDefined) readViaManifest(spark, path)
    else spark.read.parquet(path)

  final case class CompactReport(partsCompacted: Int, filesBefore: Long,
                                 filesAfter: Long)

  /** Small-file compaction REGISTERED in the manifest: partitions
    * whose file count exceeds `maxFilesPerPart` are found from the
    * manifest itself (zero listing), their rows rewritten one file per
    * partition as NEW files (copy-on-write — readers on the previous
    * manifest version keep their files; the fragments become
    * unreferenced in the new version and [[vacuum]] reclaims them),
    * and exactly those partitions' manifest rows replaced through the
    * same atomic `_manifest` publish. Untouched partitions' files and
    * manifest rows carry over byte-for-byte.  Incremental merges can't
    * create this state themselves (the merge repartitions to one file
    * per touched date) — external appenders and task-parallel writers
    * can, and their read cost would otherwise grow with every small
    * file.
    *
    * Contract: the manifest must be CURRENT (register any out-of-band
    * append via [[appendManifested]] first) — the rewrite reads exactly
    * the manifest's file list, so rows in unregistered files of a
    * compacted partition would vanish from the new manifest version.
    * `zoneKey` must match the zone column every prior publish used
    * (default: the sort key `keyCol` — pass the table's established
    * zone key when they differ, e.g. IngestJob's capacity table sorts
    * by (date, region_id) but zones on region_id); mixed-key zones
    * would make [[lookup]]'s typed cast silently prune wrong. */
  def compactManifested(spark: SparkSession, path: String,
                        keyCol: String, partitionCol: String = "date",
                        maxFilesPerPart: Int = 1,
                        retainVersions: Int = 2,
                        zoneKey: Option[String] = None): CompactReport = {
    // the flip-guard base is captured FIRST and the manifest contents
    // read explicitly from THAT version path (r14 advice): load()-then-
    // currentPlainVersion left a window where a concurrent manifest
    // publish landing between the two calls paired stale contents with
    // the new pointer — the guard passed and the compacted manifest
    // silently unreferenced the interleaver's files. With base and
    // contents pinned to the same version, such an interleave is
    // refused at the flip instead (the publishPlainFrom contract).
    val mBase = MergeUpsert.currentPlainVersion(spark, manifestPath(path))
    val m = mBase.map(v => spark.read.parquet(s"${manifestPath(path)}/$v"))
      .orElse(load(spark, path)) // legacy flat manifest: no guard possible
      .getOrElse(sys.error(s"no manifest at $path — call update() first"))
    val filesBefore = m.count()
    // over-threshold partitions found DISTRIBUTED from the manifest;
    // only their names (bounded by partition count) reach the driver
    val overParts = m.groupBy("part").agg(count(lit(1)).as("nf"))
      .filter(col("nf") > maxFilesPerPart)
      .select("part").collect().map(_.getString(0)).toSeq
    if (overParts.isEmpty)
      return CompactReport(0, filesBefore, filesBefore)
    val files = keptFiles(m, overParts)
    val before = listPartFiles(spark, path, partitionCol, overParts)
    // read ONLY the over-threshold partitions' live files
    // (manifest-planned), rewrite them one-file-per-partition as new
    // appended files — the copy-on-write publish, so readers never see
    // a partial partition and prior versions stay readable
    spark.read.option("basePath", path)
      .parquet(files.toIndexedSeq: _*)
      .repartition(col(partitionCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy(partitionCol)
      .parquet(path)
    spark.catalog.refreshByPath(path)
    val newFiles =
      (listPartFiles(spark, path, partitionCol, overParts) -- before).toSeq
    // replace exactly the compacted partitions' manifest rows with the
    // new files' stats; the partition values re-enter statsForFiles in
    // their DECODED string form
    // metadata-scale publish: see mergeWriteManifested's scoped block
    // (the DATA rewrite above deliberately stays at the session's
    // shuffle sizing — it is table-scale work)
    graft.ScopedSessionConf.withShufflePartitions(spark, 4) {
      val fresh = statsForFiles(spark, path, newFiles, partitionCol,
        zoneKey.getOrElse(keyCol))
      val merged = m.filter(!col("part").isin(overParts: _*))
        .unionByName(fresh)
      MergeUpsert.publishPlainFrom(spark, manifestPath(path), merged,
        retainVersions, mBase)
    }
    // filesAfter is MEASURED from the refreshed manifest (one row per
    // file), not derived from a one-file-per-partition assumption a
    // writer setting like maxRecordsPerFile could break
    CompactReport(overParts.size, filesBefore,
      load(spark, path).map(_.count()).getOrElse(0L))
  }

  /** The manifest's retained version names (oldest first) — the
    * manifest is itself a versioned plain store, so metadata time
    * travel rides [[MergeUpsert.retainedVersions]] directly. */
  def versions(spark: SparkSession, path: String): Seq[String] =
    MergeUpsert.retainedVersions(spark, manifestPath(path))

  /** DATA time travel: read the table exactly as manifest `version`
    * saw it — the file list that version references, which
    * copy-on-write guarantees is still on disk for every retained
    * version ([[vacuum]]'s contract). The audit/debug read a
    * production lake runs daily: "what did this table hold before last
    * night's merges". Versions outside the retention window are GC'd —
    * size `retainVersions`/`keepVersions` to how far back readers
    * look. */
  def readVersion(spark: SparkSession, path: String,
                  version: String,
                  partitionCol: String = "date"): DataFrame = {
    val mv = MergeUpsert.readPlainVersion(spark, manifestPath(path), version)
    // file count = manifest row count: decide the plan shape BEFORE
    // any driver materialization (r15 — the old gate collected the
    // list first, then threw past MaxPlanFiles)
    val nFiles = mv.count()
    require(nFiles > 0,
      s"manifest version $version of $path lists no files")
    if (nFiles > MaxPlanFiles)
      // past the explicit-list planning bound the read switches to the
      // distributed semi-join plan — full-table time travel with NO
      // driver file list (the gate used to throw here; MergeStress
      // time-travels the full 1e6-file table through this path).
      // readVersionAll derives the true partition column from the
      // manifest's own paths, so a table partitioned by anything
      // other than the defaulted `partitionCol` still reads correctly
      // through the fallback (r15 advice: the defaulted column made
      // the semi-join plan silently find zero partition dirs).
      return readVersionAll(spark, path, version, partitionCol)
    val files = mv.select("file").collect().map(_.getString(0))
    spark.read.option("basePath", path).parquet(files.toIndexedSeq: _*)
  }

  /** The partition COLUMN a manifest file path encodes — the
    * `<col>=<value>` dir segment directly above the file. The manifest
    * stores partition VALUES only (`part`), so reads that construct
    * partition dirs need the column name from somewhere; deriving it
    * from the version's own paths beats trusting a caller default
    * (r15 advice: [[readVersion]]'s large-table fallback with the
    * defaulted "date" on a differently-partitioned table built dirs
    * that don't exist and returned silent zero rows). None for a
    * file written unpartitioned at the table root. */
  private[operators] def partitionColOf(file: String): Option[String] = {
    val dir = new org.apache.hadoop.fs.Path(file).getParent.getName
    val i = dir.indexOf('=')
    if (i <= 0) None
    else Some(org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(dir.substring(0, i)))
  }

  /** [[readVersionPartitions]] generalized to EVERY partition the
    * version references — the all-partitions semi-join read behind
    * [[readVersion]]'s large-table fallback. Driver state is one
    * string per PARTITION (bounded by partition count, not file
    * count); per-row file membership is decided distributed. Public:
    * callers past the gate can invoke the semi-join full read
    * directly (MergeStress time-travels a 1e6-file table through it);
    * the spec pins its row-equality to the explicit-list read. */
  def readVersionAll(spark: SparkSession, path: String,
                     version: String,
                     partitionCol: String = "date"): DataFrame = {
    val mv = MergeUpsert.readPlainVersion(spark, manifestPath(path), version)
    val parts = mv.select("part").distinct().collect()
      .map(_.getString(0)).toSeq
    // the version's own paths name the partition column — prefer that
    // over the caller's default (r15 advice: a wrong default built
    // nonexistent dirs and read silent zero rows)
    val pc = mv.select("file").limit(1).collect().headOption
      .map(_.getString(0)).flatMap(partitionColOf).getOrElse(partitionCol)
    readVersionPartitions(spark, path, version, parts, pc)
  }

  /** Time travel a PARTITION SUBSET of manifest `version` with NO
    * driver file list — the read-side twin of [[vacuum]]'s distributed
    * live/dead split, and the actionable path past [[readVersion]]'s
    * [[MaxPlanFiles]] gate (MergeStress time-travels a 1e6-file table
    * through it). The plan: scan the subset's partition DIRS (every
    * copy-on-write generation that still sits in them) and keep
    * exactly the rows whose source file the version references, via a
    * semi join of `input_file_name()` against the version's manifest
    * rows on the canonical path — per-ROW selection decided
    * distributed, so nothing scales with the table's total file count
    * on the driver.
    *
    * Cost model vs [[readVersion]]: the scan touches ALL retained
    * generations of the requested partitions (typically
    * `retainVersions` ≈ 2 of each — vacuum bounds the amplification)
    * and discards superseded rows by the join, where the explicit
    * file list reads only the referenced generation. The trade is
    * deliberate: bounded read amplification for unbounded planning.
    * Requested partitions absent from the version contribute nothing;
    * a subset whose dirs are all absent yields an empty frame with
    * the version's schema. */
  def readVersionPartitions(spark: SparkSession, path: String,
                            version: String, parts: Seq[Any],
                            partitionCol: String = "date"): DataFrame = {
    require(parts.nonEmpty, "readVersionPartitions needs >= 1 partition")
    val mv = MergeUpsert
      .readPlainVersion(spark, manifestPath(path), version)
      .filter(col("part").isin(parts.map(_.toString): _*))
    val fs = MergeUpsert.fsFor(spark, path)
    val dirs = parts
      .map(v => partDir(path, partitionCol, v))
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
    // LOUD-FAILURE GATE (r15 advice): if the version REFERENCES files
    // in a requested partition but that partition's constructed dir
    // does not exist, the semi join below would silently drop those
    // rows — the usual cause is a wrong `partitionCol` (the dirs on
    // disk are `<other>=v`, not `<partitionCol>=v`). Refuse with the
    // column the manifest's own paths encode. Distinct-collect is
    // bounded by the REQUESTED partition count.
    locally {
      val referenced = mv.select("part").distinct().collect()
        .map(_.getString(0)).toSet
      val missing = parts.map(_.toString).filter(referenced)
        .filterNot(v => fs.exists(
          new org.apache.hadoop.fs.Path(partDir(path, partitionCol, v))))
      if (missing.nonEmpty) {
        val hint = mv.select("file").limit(1).collect().headOption
          .map(_.getString(0)).flatMap(partitionColOf)
          .map(c => s"; the manifest's paths encode partition column " +
            s"'$c'").getOrElse("")
        throw new IllegalStateException(
          s"manifest version $version of $path references files in " +
            s"partition(s) ${missing.take(5).mkString(", ")} but no dir " +
            s"'$partitionCol=<value>' exists for them — wrong " +
            s"partitionCol, or the table was mutated outside the " +
            s"copy-on-write protocol$hint")
      }
    }
    if (dirs.isEmpty)
      // schema from ONE referenced file of the version (or the live
      // manifest when the subset is empty in this version too)
      return readFiles(spark, path,
        MergeUpsert.readPlainVersion(spark, manifestPath(path), version),
        Seq.empty)
    val referenced = mv.select(canonCol(col("file")).as("cfile_"))
      .distinct()
    spark.read.option("basePath", path).parquet(dirs: _*)
      // input_file_name() is the URI-encoded form; the manifest holds
      // the decoded path — decode then canonicalize BOTH sides (the
      // same normalization vacuum's split rides, spec-proven on
      // hostile names)
      .withColumn("cfile_", canonCol(decodeUri(input_file_name())))
      .join(referenced, Seq("cfile_"), "left_semi")
      .drop("cfile_")
  }

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

  final case class VacuumReport(versionsDropped: Int, versionsKept: Int,
                                filesLive: Long, filesDeleted: Long)

  /** Reclaim data files no retained manifest version references — the
    * Delta `VACUUM` core, and the storage bound that makes
    * copy-on-write viable at merge cadence (without it, every rewrite
    * grows the table dir forever). In order:
    *
    *  1. RETENTION PUBLISH: manifest versions beyond the newest
    *     `keepVersions` are deleted (whole immutable version dirs; the
    *     `_CURRENT` pointer — which every reader resolves first — is
    *     untouched, so this narrows only how far back [[readVersion]]
    *     reaches). After this step the on-disk version set IS the
    *     retention pointer the deletion below derives from.
    *  2. LIVE SET: the union of `file` across the retained versions —
    *     a DataFrame, never a driver set.
    *  3. LISTING + SPLIT, size-gated two ways. Small tables (≤
    *     [[VacuumDriverMaxParts]] partition dirs AND ≤
    *     [[VacuumDriverMaxFiles]] on-disk files) take the DRIVER fast
    *     path: list + set-diff in memory, one Spark job total — the
    *     unit-of-work shape of streaming-cadence vacuums, where the
    *     distributed form's three shuffle rounds cost more than the
    *     whole table (measured 1.3 s vs 0.3 s on a 60-file table).
    *     Past the gate, the partition dirs are listed
    *     EXECUTOR-PARALLEL (one LIST RPC per dir, fanned across the
    *     cluster), and the live/dead split is ONE full-outer join of
    *     listing⟷manifest on the canonical path — no file list ever
    *     materializes on the driver, so vacuum has no planning bound
    *     (the r12 1e5 → r13 1e6-file stress, MergeStress "vacuum
    *     planning"; the 2400-partition stress rides the same
    *     distributed path). Both paths enforce the same gates and
    *     report.
    *  4. SAFETY GATE: every live file must exist on disk — a dangling
    *     reference means the table was mutated outside the
    *     copy-on-write protocol, and vacuum REFUSES rather than guess.
    *  5. DELETE: the join's dead side is removed executor-parallel
    *     (DELETE is a per-file RPC; at a post-merge backlog of
    *     thousands of files a driver loop would serialize them).
    *
    * Idempotent: a re-run finds an empty dead set and deletes nothing.
    * Single-writer, like every publish in this engine — run it from
    * the table's writer, never concurrently with one (it would reclaim
    * a concurrent writer's not-yet-published files).
    *
    * `keepVersions = 1` keeps only the live version — maximal space
    * reclaim, no time travel window. */
  def vacuum(spark: SparkSession, path: String,
             keepVersions: Int = 2): VacuumReport =
    vacuumImpl(spark, path, keepVersions, scope = None)

  /** PARTITION-SCOPED vacuum (r15) — the steady-state maintenance pass
    * after a merge that touched k partitions: list ONLY those
    * partitions' dirs and reclaim their superseded generations, at a
    * cost independent of the table's total partition count (the mirror
    * of the scoped symlink re-export). Semantics per partition are
    * identical to [[vacuum]] — same retention prune, same live/dead
    * split against the RETAINED manifest versions, same
    * dangling-reference refusal (checked for the scoped partitions'
    * live files). Orphans outside the scope are untouched; run the
    * full [[vacuum]] for the periodic whole-table orphan sweep. */
  def vacuumPartitions(spark: SparkSession, path: String,
                       parts: Seq[Any], partitionCol: String = "date",
                       keepVersions: Int = 2): VacuumReport = {
    require(parts.nonEmpty, "vacuumPartitions needs >= 1 partition")
    vacuumImpl(spark, path, keepVersions, Some((partitionCol, parts)))
  }

  private def vacuumImpl(spark: SparkSession, path: String,
                         keepVersions: Int,
                         scope: Option[(String, Seq[Any])]): VacuumReport = {
    require(keepVersions >= 1,
      s"keepVersions must retain at least the live version, got " +
        s"$keepVersions")
    val mp = manifestPath(path)
    val fs = MergeUpsert.fsFor(spark, path)
    // one listing yields both the retention prune and the kept set
    val (dropped, keep) =
      MergeUpsert.vacuumPlainKeeping(spark, mp, keepVersions)
    require(keep.nonEmpty, s"no manifest at $path — nothing to vacuum")
    // scoped: the global we-still-reference-SOMETHING guard must look
    // at the whole manifest (a legitimately dead partition has zero
    // live files of its own), then the live set narrows to the scope
    val liveAll = keep.map(v =>
        MergeUpsert.readPlainVersion(spark, mp, v).select("file", "part"))
      .reduce(_.unionByName(_))
    val live = scope.map { case (_, parts) =>
        liveAll.filter(col("part").isin(parts.map(_.toString): _*))
      }.getOrElse(liveAll)
      .select(canonCol(col("file")).as("cfile")).distinct()
    // candidates: parquet files under the FIRST-LEVEL partition dirs
    // (the only place this format writes data); `_manifest`, pointer
    // files and job markers are never candidates. Unscoped, the dir
    // NAMES come from one root listing (O(partitions)); scoped, the k
    // dirs are addressed directly — NO root listing, which is the
    // whole point. The per-dir file listings run on executors.
    val root = new org.apache.hadoop.fs.Path(path)
    val partDirs = scope match {
      case Some((pc, parts)) => parts
        .map(v => partDir(path, pc, v))
        .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
        .toIndexedSeq
      case None => fs.listStatus(root).toIndexedSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .map(_.getPath.toString)
    }

    // whole-table-dead refusal: unscoped, the live set itself must be
    // nonempty (checked per path below); scoped, a partition may be
    // legitimately all-dead, so the guard moves to the GLOBAL manifest
    if (scope.nonEmpty)
      require(!liveAll.limit(1).isEmpty,
        s"retained manifest versions of $path list no files — refusing " +
          "to treat the whole table as dead")

    // ---- driver fast path (small tables; see scaladoc step 3) ----
    if (partDirs.size <= VacuumDriverMaxParts) {
      val candPaths = partDirs.flatMap { d =>
        fs.listStatus(new org.apache.hadoop.fs.Path(d)).toIndexedSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map(_.getPath)
      }
      if (candPaths.size <= VacuumDriverMaxFiles) {
        // metadata-scale distinct: a handful of manifest versions,
        // bounded rows — 4 shuffle partitions, not the session's count
        val liveSet = graft.ScopedSessionConf.withShufflePartitions(spark, 4) {
          live.collect()
        }.map(_.getString(0)).toSet
        require(liveSet.size <= MaxPlanFiles,
          s"${liveSet.size} live files referenced by a " +
            s"${candPaths.size}-file table — manifest inconsistent")
        require(liveSet.nonEmpty || scope.nonEmpty,
          s"retained manifest versions of $path " +
            "list no files — refusing to treat the whole table as dead")
        val candSet = candPaths.map(p => canon(p.toString)).toSet
        val missing = liveSet -- candSet
        require(missing.isEmpty,
          s"manifest references ${missing.size} files absent on disk " +
            s"(mutated outside the copy-on-write protocol?) — refusing " +
            s"to vacuum; e.g. ${missing.take(3).mkString(", ")}")
        val dead = candPaths.filterNot(p => liveSet.contains(canon(p.toString)))
        dead.foreach(p => fs.delete(p, false))
        if (dead.nonEmpty) spark.catalog.refreshByPath(path)
        return VacuumReport(dropped, keep.size, liveSet.size.toLong,
          dead.size.toLong)
      }
    }

    // ---- distributed path (the 100 TB shape) ----
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val cands = spark.createDataset(partDirs)
      .repartition(math.min(32, math.max(1, partDirs.size)))
      .mapPartitions { it =>
        it.flatMap { d =>
          val dp = new org.apache.hadoop.fs.Path(d)
          dp.getFileSystem(conf.value).listStatus(dp).iterator
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
            .map(_.getPath.toString)
        }
      }.toDF("path")
      .select(col("path"), canonCol(col("path")).as("cfile"))
    // ONE shuffle decides everything: live-but-missing (refuse),
    // dead-on-disk (delete), live count (report)
    val joined = cands
      .join(live.withColumn("live", lit(true)), Seq("cfile"), "full_outer")
      .persist()
    try {
      val stats = joined.agg(
        count(when(col("live"), 1)).as("liveN"),
        count(when(col("live") && col("path").isNull, 1)).as("missingN"),
        count(when(col("live").isNull, 1)).as("deadN")).collect().head
      val (liveN, missingN, deadN) =
        (stats.getLong(0), stats.getLong(1), stats.getLong(2))
      require(liveN > 0 || scope.nonEmpty,
        s"retained manifest versions of $path list " +
          "no files — refusing to treat the whole table as dead")
      if (missingN > 0) {
        val ex = joined.filter(col("live") && col("path").isNull)
          .select("cfile").take(3).map(_.getString(0))
        throw new IllegalArgumentException(
          s"manifest references $missingN files absent on disk " +
            s"(mutated outside the copy-on-write protocol?) — refusing " +
            s"to vacuum; e.g. ${ex.mkString(", ")}")
      }
      if (deadN > 0) {
        // executor-parallel delete; SerializableConfiguration ships the
        // hadoop conf so each partition opens the real FileSystem
        joined.filter(col("live").isNull).select("path")
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            it.foreach { r =>
              val p = new org.apache.hadoop.fs.Path(r.getString(0))
              p.getFileSystem(conf.value).delete(p, false)
            }
          }
        spark.catalog.refreshByPath(path)
      }
      VacuumReport(dropped, keep.size, liveN, deadN)
    } finally joined.unpersist()
  }

  final case class LookupReport(filesTotal: Long, filesKept: Long)

  /** Read the whole table by manifest file list — zero directory
    * listing on the read path (the manifest read is one small
    * versioned table). Schema/partition semantics match a plain read
    * of the live file set via basePath. Same manifest-currency
    * contract as [[readPartitions]].
    *
    * SCHEMA EVOLUTION (x244): a table whose generations were written
    * under evolved schemas — [[appendManifested]] of a batch carrying
    * a new column, or [[mergeWriteManifested]] after an evolveSchema
    * merge — needs `mergeSchema = true` to reconcile: the union schema
    * is computed from the listed files' footers (distributed) and
    * pre-evolution rows read null in the added columns. Off by default:
    * fixed-schema tables shouldn't pay a footer read per file. */
  def readViaManifest(spark: SparkSession, path: String,
                      mergeSchema: Boolean = false): DataFrame = {
    val files = load(spark, path)
      .getOrElse(sys.error(s"no manifest at $path — call update() first"))
      .select("file").collect().map(_.getString(0))
    require(files.nonEmpty, s"manifest at $path lists no files")
    require(files.length <= MaxPlanFiles,
      s"${files.length} files — beyond the $MaxPlanFiles-file planning " +
        "bound; compact the table or read by partition")
    spark.read.option("basePath", path)
      .option("mergeSchema", mergeSchema.toString)
      .parquet(files.toIndexedSeq: _*)
  }

  /** Manifest-planned point/range lookup: keep only files whose
    * partition matches (when given) AND whose [key_lo, key_hi] zone
    * intersects [lo, hi] — the comparison happens in the KEY's own
    * type, so string zones compare in string order and numeric zones
    * numerically (the manifest stores zones as strings; they are cast
    * back here). Only the SURVIVING file rows are collected to plan
    * the read — O(kept), never O(table files). Returns the
    * exact-filtered rows plus the prune evidence. */
  def lookup(spark: SparkSession, path: String, keyCol: String,
             lo: Any, hi: Any, partitionCol: String = "date",
             partVal: Option[Any] = None)
      : (DataFrame, LookupReport) = {
    val m = load(spark, path)
      .getOrElse(sys.error(s"no manifest at $path — call update() first"))
    // The key's type comes from ONE manifest-listed file's footer,
    // never from a whole-table listing (the cost this path skips).
    val sample = m.select("file").limit(1).collect()
    require(sample.nonEmpty, s"manifest at $path lists no files")
    val keyType =
      spark.read.parquet(sample.head.getString(0)).schema(keyCol).dataType
    val zoned = m.filter(
      col("key_lo").cast(keyType) <= lit(hi) &&
      col("key_hi").cast(keyType) >= lit(lo))
    val pruned = partVal match {
      case Some(v) => zoned.filter(col("part") === lit(v.toString))
      case None => zoned
    }
    val kept = pruned.select("file").collect().map(_.getString(0))
    require(kept.length <= MaxPlanFiles,
      s"${kept.length} files survive zone pruning — beyond the " +
        s"$MaxPlanFiles-file planning bound; compact the table")
    val total = m.count()
    val df = readFiles(spark, path, m, kept.toIndexedSeq)
    val exact = partVal match {
      case Some(v) =>
        df.filter(col(keyCol).between(lit(lo), lit(hi)) &&
          col(partitionCol) === lit(v))
      case None => df.filter(col(keyCol).between(lit(lo), lit(hi)))
    }
    (exact, LookupReport(total, kept.length))
  }

  /** Export the LIVE manifest in the symlink-format-manifest
    * convention (Delta's generateSymlinkManifest / Hive
    * SymlinkTextInputFormat): under `out`, one directory per
    * partition (`<partitionCol>=<part>/`) holding text file(s) whose
    * lines are the partition's live data-file paths. External engines
    * (Presto/Trino/Athena/Hive) read the COW table through this
    * WITHOUT understanding the `_manifest` protocol — they see exactly
    * the live snapshot, never superseded or in-flight files, because
    * the export derives from the same atomic manifest version every
    * graft reader plans from.
    *
    * Distributed end to end: the manifest rows are repartitioned by
    * partition and written through the text sink's partitionBy — no
    * file list touches the driver. Re-export OVERWRITES (the manifest
    * flip's external twin: regenerate after merges/compactions/vacuums,
    * stale exports dangle exactly like Delta's). Returns the exported
    * file-path count.
    *
    * `parts` scopes the re-export: only the given partition values'
    * export dirs are rewritten (dynamic partition overwrite), every
    * other partition's files stay byte-identical on disk — so after a
    * merge touching k partitions the refresh costs O(k), independent
    * of the table's partition count (MergeStress "scoped symlink
    * re-export"), where the full form rewrites everything. A requested
    * partition with NO live files (vacuumed away / removed) has its
    * export dir deleted — partition-overwrite alone would leave the
    * stale listing dangling. [[refreshSymlinkExport]] derives `parts`
    * from a manifest version diff. */
  def exportSymlinkManifest(spark: SparkSession, path: String,
                            out: String,
                            partitionCol: String = "date",
                            parts: Option[Seq[Any]] = None): Long = {
    val m = load(spark, path)
      .getOrElse(sys.error(s"no manifest at $path — call update() first"))
    val scoped = parts match {
      case Some(ps) => m.filter(col("part").isin(ps.map(_.toString): _*))
      case None => m
    }
    val rows = scoped.select(col("file").as("value"),
      col("part").as(partitionCol)).cache()
    val n = rows.count()
    parts match {
      case None =>
        rows.repartition(col(partitionCol))
          .write.mode(SaveMode.Overwrite).partitionBy(partitionCol)
          .text(out)
      case Some(ps) =>
        if (n > 0)
          // dynamic overwrite: only partitions present in `rows` are
          // replaced; the untouched ones keep their existing exports
          graft.ScopedSessionConf.withConf(spark,
            "spark.sql.sources.partitionOverwriteMode", "dynamic") {
            rows.repartition(col(partitionCol))
              .write.mode(SaveMode.Overwrite).partitionBy(partitionCol)
              .text(out)
          }
        // requested partitions that no longer hold live files: remove
        // their export dirs (the writer above never visits them)
        val live = rows.select(col(partitionCol)).distinct()
          .collect().map(_.getString(0)).toSet
        val fs = MergeUpsert.fsFor(spark, out)
        ps.map(_.toString).filterNot(live).foreach { v =>
          fs.delete(
            new org.apache.hadoop.fs.Path(partDir(out, partitionCol, v)),
            true)
        }
    }
    rows.unpersist()
    n
  }

  /** Incremental export maintenance: re-export ONLY the partitions a
    * manifest-version transition touched — [[diffVersions]] already
    * computes the per-partition delta, so the external mirror pays
    * O(changed partitions) per refresh instead of a full rewrite
    * (at 1e6+ files a full re-export rewrites everything after every
    * merge). `removed` partitions' export dirs are deleted; `carried`
    * ones are not touched. Returns the re-exported path count.
    *
    * The export body always materializes the LIVE manifest's listing
    * for the changed partitions — pass the live version as `vNew`
    * (the normal "refresh after a publish" call); an older `vNew`
    * would scope the partition set to that transition but still
    * export the live rows. */
  def refreshSymlinkExport(spark: SparkSession, path: String,
                           out: String, vOld: String, vNew: String,
                           partitionCol: String = "date"): Long = {
    val changed = diffVersions(spark, path, vOld, vNew)
      .filter(col("status") =!= "carried")
      .select("part").collect().map(_.getString(0)).toSeq
    if (changed.isEmpty) 0L
    else exportSymlinkManifest(spark, path, out, partitionCol,
      Some(changed))
  }

  /** Read the table THROUGH an exported symlink manifest — what an
    * external engine does, expressed in Spark for the parity check:
    * resolve the listed paths (bounded by the same planning cap as
    * [[readViaManifest]]) and scan exactly those parquet files. The
    * manifest text files are resolved with ONE FileSystem glob and
    * read driver-side — they are metadata (a handful of line files per
    * partition), and the trailing-slash `textFile` glob this replaces
    * made Spark's path probe log a spurious ERROR stack trace on every
    * first read (clean runs must log clean). */
  def readViaSymlinkManifest(spark: SparkSession, tablePath: String,
                             manifestDir: String): DataFrame = {
    val files = symlinkListedPaths(spark, manifestDir)
    require(files.nonEmpty, s"symlink manifest at $manifestDir is empty")
    require(files.length <= MaxPlanFiles,
      s"${files.length} files — beyond the $MaxPlanFiles-file planning " +
        "bound; compact the table before exporting")
    spark.read.option("basePath", tablePath)
      .parquet(files: _*)
  }

  /** Every data-file path an exported symlink manifest lists — ONE
    * driver-side FileSystem glob over the per-partition line files
    * (metadata scale; also what keeps `DataFrameReader`'s path-probe
    * machinery, which logs a spurious ERROR stack for glob paths, off
    * the read path entirely). Shared by [[readViaSymlinkManifest]] and
    * export-consistency checks. */
  def symlinkListedPaths(spark: SparkSession,
                         manifestDir: String): Vector[String] = {
    val fs = MergeUpsert.fsFor(spark, manifestDir)
    val lineFiles = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$manifestDir/*/*"))
    if (lineFiles == null) return Vector.empty
    lineFiles.iterator
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .flatMap { st =>
        val in = fs.open(st.getPath)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().map(_.trim).filter(_.nonEmpty).toVector
        finally in.close()
      }.toVector
  }
}
