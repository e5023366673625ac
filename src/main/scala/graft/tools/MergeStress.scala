package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MergeUpsert

/** Merge-path stress (r2 verdict stretch): a date-partitioned keyed
  * table at factor*6M rows (2400 dates × factor*2500 regions), then the
  * three merge shapes that matter at backfill scale:
  *   - incremental 1-day batch — broadcast anti-join, touches ONE
  *     partition of 2400;
  *   - a 600-date backfill — the touched-partition IN-list and the
  *     dynamic-overwrite fan-out at their worst, and the key set is far
  *     past broadcast size (mergeWrite auto-switches to a shuffle join);
  *   - a point-lookup read proving the sorted row groups prune.
  * Update batches are materialized (cached + counted) BEFORE the timed
  * region — the first cut of this harness re-derived each batch from a
  * 60M-row `spark.range` three times inside mergeWrite's plan (touched
  * collect, anti-join build, write), and the batch-generation scans
  * dwarfed the merge being measured.
  *
  * Standalone: `runMain graft.tools.MergeStress [factor]`; also runs as
  * the tail of ScaleStress. */
object MergeStress {

  def run(spark: SparkSession, factor: Int, work: String): Unit = {
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[stress] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.1f s  out=$n")
    }
    val nDates = 2400
    val nRegions = factor * 2500
    def capTable(bump: Int) = spark.range(nDates.toLong * nRegions).select(
      date_add(lit("2018-01-01").cast("date"),
        (col("id") % nDates).cast("int")).as("date"),
      concat(lit("r"), (col("id") / nDates).cast("long")).as("region_id"),
      ((col("id") % 1000) + bump).cast("int").as("total_beds"))
    println(s"[stress] merge table rows=${nDates.toLong * nRegions} dates=$nDates")

    val init = capTable(0)
    time("mergeWrite init (2400 dates)")({
      MergeUpsert.mergeWrite(spark, s"$work/bigcap", init,
        Seq("date", "region_id"))
      spark.read.parquet(s"$work/bigcap").count()
    })

    val oneDay = capTable(1)
      .filter(col("date") === lit("2018-06-01").cast("date")).cache()
    val oneDayRows = oneDay.count()
    time("mergeWrite 1-day batch")({
      MergeUpsert.mergeWrite(spark, s"$work/bigcap", oneDay,
        Seq("date", "region_id"))
      oneDayRows
    })

    val backfill = capTable(2)
      .filter(col("date") < lit("2019-09-01").cast("date")).cache()
    val backfillRows = backfill.count()
    time("mergeWrite 600-date backfill")({
      val rep = MergeUpsert.mergeWrite(spark, s"$work/bigcap", backfill,
        Seq("date", "region_id"))
      println(s"[stress]   backfill report: $rep")
      assert(!rep.broadcastKeys, s"600-date backfill must not broadcast: $rep")
      backfillRows
    })
    oneDay.unpersist()
    backfill.unpersist()

    // few-but-HUGE: 2 touched dates carrying factor*600k keys — the
    // case a touched-partition-count gate would broadcast (and die on
    // at cluster scale); the key-estimate gate must pick the shuffle
    // join
    val fewHuge = spark.range(2L * factor * 300000).select(
      date_add(lit("2018-01-01").cast("date"),
        (col("id") % 2).cast("int")).as("date"),
      concat(lit("fh"), (col("id") / 2).cast("long")).as("region_id"),
      lit(7).cast("int").as("total_beds")).cache()
    val fewHugeRows = fewHuge.count()
    time("mergeWrite few-huge (2 dates)")({
      val rep = MergeUpsert.mergeWrite(spark, s"$work/bigcap", fewHuge,
        Seq("date", "region_id"))
      println(s"[stress]   few-huge report: $rep")
      assert(rep.touchedPartitions == 2 && !rep.broadcastKeys,
        s"few-but-huge batch must shuffle, not broadcast: $rep")
      fewHugeRows
    })
    fewHuge.unpersist()

    time("point lookup (sorted row groups)")(
      spark.read.parquet(s"$work/bigcap")
        .filter(col("date") === lit("2018-06-01").cast("date") &&
          col("region_id") === "r1234")
        .count())

    // ---- manifest-backed rows (the round-9 "listing-dominated"
    // finding): bootstrap once over all 2400 partitions, then measure
    // the SAME 1-day merge and point lookup with a manifest in front —
    // maintenance O(touched), reads planned from file zones with zero
    // directory listing ----
    import graft.operators.TableManifest
    time("manifest bootstrap (2400)")({
      TableManifest.update(spark, s"$work/bigcap", "date",
        spark.read.parquet(s"$work/bigcap").select("date").distinct()
          .collect().map(_.get(0)).toSeq,
        "region_id")
      TableManifest.load(spark, s"$work/bigcap").get.count()
    })
    val oneDay2 = capTable(3)
      .filter(col("date") === lit("2018-07-01").cast("date")).cache()
    val oneDay2Rows = oneDay2.count()
    time("manifested 1-day batch")({
      TableManifest.mergeWriteManifested(spark, s"$work/bigcap",
        oneDay2, Seq("date", "region_id"), zoneKey = Some("region_id"))
      oneDay2Rows
    })
    oneDay2.unpersist()
    time("manifest point lookup")({
      val (df, rep) = TableManifest.lookup(spark, s"$work/bigcap",
        "region_id", "r1234", "r1234",
        partVal = Some(java.sql.Date.valueOf("2018-06-01")))
      println(s"[stress]   manifest lookup report: $rep")
      assert(rep.filesKept < rep.filesTotal,
        s"manifest must prune files: $rep")
      df.count()
    })

    // ---- scoped symlink re-export (r13 verdict item 4): the full
    // export rewrites every partition's listing; after a merge
    // touching ONE date, refreshSymlinkExport re-exports only the
    // diffed partitions — O(k), independent of the table's 2400
    // partitions (the untouched 2399 dirs keep their physical files) ----
    val symDir = s"$work/bigcap-sym"
    val fullExportN = { // also the baseline the refresh is compared to
      val t0 = System.nanoTime()
      val n = TableManifest.exportSymlinkManifest(spark,
        s"$work/bigcap", symDir)
      println(f"[stress] symlink full export (2400)   " +
        f"${(System.nanoTime() - t0) / 1e9}%8.1f s  out=$n")
      n
    }
    val vPreRefresh = TableManifest.versions(spark, s"$work/bigcap").last
    val oneDay3 = capTable(4)
      .filter(col("date") === lit("2018-07-01").cast("date")).cache()
    oneDay3.count()
    TableManifest.mergeWriteManifested(spark, s"$work/bigcap", oneDay3,
      Seq("date", "region_id"), zoneKey = Some("region_id"))
    oneDay3.unpersist()
    time("symlink 1-part refresh")({
      val vNew = TableManifest.versions(spark, s"$work/bigcap").last
      val n = TableManifest.refreshSymlinkExport(spark, s"$work/bigcap",
        symDir, vPreRefresh, vNew)
      assert(n > 0 && n < fullExportN / 100,
        s"a 1-date refresh must re-export O(1 partition), not " +
          s"O(table): $n of $fullExportN")
      // the scoped refresh leaves the export exactly live
      assert(TableManifest.symlinkListedPaths(spark, symDir).toSet ==
        TableManifest.load(spark, s"$work/bigcap").get
          .select("file").collect().map(_.getString(0)).toSet,
        "refreshed export must list exactly the live manifest")
      n
    })

    // ---- vacuum at merge cadence (r11 verdict item 1): N copy-on-
    // write merges of ONE date grow that partition's dir linearly (each
    // rewrite appends a new generation, retained for in-flight readers
    // and time travel); vacuum after the cycle reclaims every
    // generation no retained manifest version references, holding the
    // table's file count FLAT. The vacuum pays one full listing of the
    // 2400 partition dirs — the bounded, schedulable cost that replaces
    // unbounded growth ----
    def partFileCount(date: String): Int =
      new java.io.File(s"$work/bigcap/date=$date")
        .listFiles().count(_.getName.endsWith(".parquet"))
    val cycles = 5
    time(s"$cycles COW merges of one date")({
      (1 to cycles).foreach { i =>
        val b = capTable(3 + i)
          .filter(col("date") === lit("2018-08-01").cast("date")).cache()
        b.count()
        TableManifest.mergeWriteManifested(spark, s"$work/bigcap", b,
          Seq("date", "region_id"), zoneKey = Some("region_id"))
        b.unpersist()
      }
      partFileCount("2018-08-01").toLong
    })
    // ---- PARTITION-SCOPED vacuum (r14 verdict item 5): the steady-
    // state pass after a k-partition merge lists ONLY those k dirs —
    // its cost is the k dirs' listings plus the manifest scan,
    // independent of the table's 2400 partitions (compare the full
    // sweep's root listing below). Reclaims exactly the merged date's
    // superseded generations; the full vacuum afterwards finds nothing
    // more for that date ----
    time("scoped vacuum (1 of 2400 parts)")({
      val grown = partFileCount("2018-08-01")
      val vac = TableManifest.vacuumPartitions(spark, s"$work/bigcap",
        Seq(java.sql.Date.valueOf("2018-08-01")), keepVersions = 2)
      val flat = partFileCount("2018-08-01")
      println(s"[stress]   scoped vacuum report: $vac; " +
        s"merged-date dir files $grown -> $flat")
      assert(grown >= cycles && flat <= 2,
        s"scoped vacuum must reclaim the merged date's generations: " +
          s"$grown -> $flat")
      vac.filesDeleted
    })
    time("vacuum (2400-part listing)")({
      val before = partFileCount("2018-08-01")
      val vac = TableManifest.vacuum(spark, s"$work/bigcap",
        keepVersions = 2)
      val flat = partFileCount("2018-08-01")
      println(s"[stress]   vacuum report: $vac; " +
        s"merged-date dir files $before -> $flat")
      assert(flat == before,
        "the scoped pass already reclaimed the merged date: " +
          s"$before -> $flat")
      val vac2 = TableManifest.vacuum(spark, s"$work/bigcap",
        keepVersions = 2)
      assert(vac2.filesDeleted == 0, s"idempotent re-run: $vac2")
      vac.filesDeleted
    })

    // ---- vacuum planning at 10^6 files (r12 verdict item 2): the
    // live/dead split is ONE distributed full-outer join of
    // executor-parallel partition listings against the manifest — no
    // file list ever reaches the driver, so there is no planning bound
    // to hit. 1e6 empty data files under 1000 synthetic partitions are
    // created and registered in a published manifest version; vacuum
    // must (a) plan with all 1e6 live and delete nothing, then (b)
    // after the synthetic generation is deregistered, reclaim all 1e6
    // executor-parallel ----
    time("vacuum planning @ 1e6 files")({
      import spark.implicits._
      val path = s"$work/bigvac"
      val base = spark.range(100L).select(
        date_add(lit("2024-01-01").cast("date"),
          (col("id") % 2).cast("int")).as("date"),
        col("id").as("region_id"),
        lit(1).cast("int").as("total_beds"))
      TableManifest.mergeWriteManifested(spark, path, base,
        Seq("date", "region_id"), zoneKey = Some("region_id"))
      val nFiles = 1000000L
      def synthFile = concat(lit(s"$path/date=2200-"),
        lpad((col("id") % 1000).cast("string"), 4, "0"),
        lit("/f-"), lpad(col("id").cast("string"), 7, "0"),
        lit(".parquet"))
      // raw java.nio HARDLINKS to one real parquet file: this is test
      // RIGGING, not the path under test — hadoop's ChecksumFileSystem
      // pays ~2 ms/file (a .crc sibling + parent checks), which would
      // make the rig 30× slower than the vacuum it exists to measure.
      // Links (not empty touches, the pre-r15 rig) make every
      // synthetic file REAL parquet, so the full-table time-travel
      // read below can actually execute against all 1e6 files.
      // largest file = guaranteed non-empty donor (a shuffle task that
      // received no rows still writes a footer-only parquet file).
      // Links fan out over a 64-copy donor POOL — ext4 caps hardlinks
      // per inode at ~65k, so 1e6 links to one file would fail; the
      // pool lives under a dot-dir (never a partition dir, so vacuum
      // and reads don't see it)
      val donor = new java.io.File(s"$path/date=2024-01-01")
        .listFiles().filter(_.getName.endsWith(".parquet"))
        .maxBy(_.length).getAbsolutePath
      val poolN = 64
      val pool = (0 until poolN).map { i =>
        val p = java.nio.file.Paths.get(s"$path/.linkpool/d-$i.parquet")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.copy(java.nio.file.Paths.get(donor), p)
        p.toString
      }.toArray
      spark.range(nFiles).select(synthFile.as("p")).as[String]
        .foreachPartition { (it: Iterator[String]) =>
          val seen = scala.collection.mutable.HashSet[String]()
          var i = 0
          it.foreach { f =>
            val file = new java.io.File(f)
            val dir = file.getParentFile
            if (seen.add(dir.getPath)) dir.mkdirs()
            java.nio.file.Files.createLink(file.toPath,
              java.nio.file.Paths.get(pool(i % poolN)))
            i += 1
          }
        }
      val real = TableManifest.load(spark, path).get
        .filter(!col("part").startsWith("2200-")).localCheckpoint()
      val synthRows = spark.range(nFiles).select(
        synthFile.as("file"),
        concat(lit("2200-"),
          lpad((col("id") % 1000).cast("string"), 4, "0")).as("part"),
        lit(1L).as("rows"),
        col("id").cast("string").as("key_lo"),
        col("id").cast("string").as("key_hi"))
      MergeUpsert.publishPlain(spark, s"$path/_manifest",
        real.unionByName(synthRows))
      val t0 = System.nanoTime()
      val rep = TableManifest.vacuum(spark, path, keepVersions = 1)
      val planSec = (System.nanoTime() - t0) / 1e9
      println(f"[stress]   1e6-file vacuum (all live): $rep, $planSec%.1f s")
      assert(rep.filesLive > nFiles && rep.filesDeleted == 0, s"$rep")
      // ---- time travel at 1e6 files WITHOUT a driver file list (r13
      // verdict item 7): readVersionPartitions plans the requested
      // partition distributed (manifest-version rows filtered to the
      // subset, rows kept by the canonical-path semi join) — the 1e6
      // synthetic manifest rows never reach the driver, and the read
      // cost is the subset's, not the table's ----
      val vSynth = TableManifest.versions(spark, path).last
      val tt0 = System.nanoTime()
      val ttRows = TableManifest.readVersionPartitions(spark, path,
        vSynth, Seq("2024-01-01")).count()
      val ttSec = (System.nanoTime() - tt0) / 1e9
      println(f"[stress]   1e6-file time travel (1 part): $ttRows rows, " +
        f"$ttSec%.1f s")
      assert(ttRows == 50L,
        s"subset time travel must read the partition's snapshot: $ttRows")
      // ---- FULL-table time travel at 1e6 files (r14 verdict item 4):
      // past readVersion's 2M-file explicit-list bound the read falls
      // back to this distributed semi-join plan (readVersionAll — the
      // same plan, invoked directly since the rig sits at 1e6): no
      // driver file list, per-row membership decided by the
      // canonical-path semi join, and because the rig hardlinks REAL
      // parquet the read executes end to end over all 1e6 files ----
      val donorRows = spark.read.parquet(donor).count()
      val tf0 = System.nanoTime()
      val fullRows = TableManifest.readVersionAll(spark, path, vSynth)
        .count()
      val tfSec = (System.nanoTime() - tf0) / 1e9
      println(f"[stress]   1e6-file FULL time travel: $fullRows rows, " +
        f"$tfSec%.1f s")
      assert(fullRows == 100L + nFiles * donorRows,
        s"full time travel must read every referenced file exactly " +
          s"once: $fullRows vs ${100L + nFiles * donorRows}")
      // deregister the synthetic generation; the next vacuum reclaims it
      MergeUpsert.publishPlain(spark, s"$path/_manifest", real)
      val t1 = System.nanoTime()
      val rep2 = TableManifest.vacuum(spark, path, keepVersions = 1)
      val delSec = (System.nanoTime() - t1) / 1e9
      println(f"[stress]   1e6-file vacuum (reclaim): $rep2, $delSec%.1f s")
      assert(rep2.filesDeleted == nFiles,
        s"all synthetic files must be reclaimed: $rep2")
      nFiles
    })

    // ---- planning at 10^5 files (the 100 TB manifest question): the
    // planner's input is the MANIFEST TABLE, never the filesystem, so
    // its latency is a metadata scan + an O(kept) collect. A real
    // 40-partition table's manifest is inflated with 100k synthetic
    // rows whose partitions and key zones sit far from the probe —
    // pruning discards them unopened (their file paths alias a real
    // file, so any sampled footer read stays valid). Lookup must stay
    // interactive at this row count ----
    time("lookup @ 1e5-row manifest")({
      val path = s"$work/bigmanifest"
      val base = spark.range(40L * 100).select(
        date_add(lit("2024-01-01").cast("date"),
          (col("id") % 40).cast("int")).as("date"),
        col("id").as("region_id"),
        (col("id") % 7).cast("int").as("total_beds"))
      TableManifest.mergeWriteManifested(spark, path, base,
        Seq("date", "region_id"), zoneKey = Some("region_id"))
      val real = TableManifest.load(spark, s"$work/bigmanifest").get
      val aRealFile = real.select("file").collect().head.getString(0)
      val synth = spark.range(100000L).select(
        lit(aRealFile).as("file"),
        concat(lit("2200-"), (col("id") % 1000).cast("string"))
          .as("part"),
        lit(1000L).as("rows"),
        (col("id") * 10L + 1000000000L).cast("string").as("key_lo"),
        (col("id") * 10L + 1000000009L).cast("string").as("key_hi"))
      MergeUpsert.publishPlain(spark, s"$path/_manifest",
        real.unionByName(synth))
      val t0 = System.nanoTime()
      val (df, rep) = TableManifest.lookup(spark, path, "region_id",
        240L, 260L)
      val hits = df.count()
      val planAndRead = (System.nanoTime() - t0) / 1e9
      println(f"[stress]   1e5-manifest lookup: $rep, $hits rows, " +
        f"$planAndRead%.2f s")
      assert(rep.filesTotal > 100000L && rep.filesKept <= 40L &&
        hits == 21L, s"zones must prune the synthetic bulk: $rep, $hits")
      hits
    })

    // ---- parity-surface rows (r10 verdict item 1): the HOSPITAL
    // pipeline's own incremental derive at 2400 partitions.
    // capacity is written the way IngestJob now writes it
    // (mergeWriteManifested); "legacy" is the same table without a
    // manifest. The timed op is MetricsJob.runIncremental — its
    // capacity read plans from the manifest's file list vs the plain
    // scan's O(partitions) root listing ----
    def hospitalCap = spark.range(nDates.toLong * (factor * 250L)).select(
      date_add(lit("2018-01-01").cast("date"),
        (col("id") % nDates).cast("int")).as("date"),
      concat(lit("r"), (col("id") / nDates).cast("long")).as("region_id"),
      ((col("id") % 900) + 100).cast("int").as("total_beds"),
      (col("id") % 800).cast("int").as("occupied_beds"),
      ((col("id") % 90) + 10).cast("int").as("icu_beds"),
      (col("id") % 80).cast("int").as("icu_occupied"))
    import graft.pipeline.MetricsJob
    val oneDate = Seq(java.sql.Date.valueOf("2018-06-01"))
    TableManifest.mergeWriteManifested(spark, s"$work/hospcap",
      hospitalCap, Seq("date", "region_id"), zoneKey = Some("region_id"))
    MergeUpsert.mergeWrite(spark, s"$work/hospcap_legacy", hospitalCap,
      Seq("date", "region_id"))
    // metrics tables pre-created (bootstrap write is not the measured
    // path) so both timed rows are the same-shape INCREMENTAL merge
    MetricsJob.runIncremental(spark, s"$work/hospcap",
      s"$work/hospmet", "seed-m", oneDate)
    val legacySeed = spark.read.parquet(s"$work/hospcap_legacy")
      .filter(col("date").isin(oneDate: _*))
    MergeUpsert.mergeWrite(spark, s"$work/hospmet_legacy",
      MetricsJob.derive(legacySeed, "seed-l"), Seq("date", "region_id"))
    time("parity 1-day derive legacy")({
      val cap = spark.read.parquet(s"$work/hospcap_legacy")
        .filter(col("date").isin(oneDate: _*))
      MergeUpsert.mergeWrite(spark, s"$work/hospmet_legacy",
        MetricsJob.derive(cap, "m-legacy"), Seq("date", "region_id"))
      factor * 250L
    })
    time("parity 1-day derive manifest")({
      MetricsJob.runIncremental(spark, s"$work/hospcap",
        s"$work/hospmet", "m-manifest", oneDate)
      factor * 250L
    })
  }

  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("graft-merge-stress").toString
    run(spark, factor, work)
    spark.stop()
  }
}
