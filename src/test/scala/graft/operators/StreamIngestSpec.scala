package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamIngestSpec extends SparkSpec {
  import org.apache.spark.sql.types._
  import spark.implicits._
  import graft.streaming.StreamIngest

  test("availableNow drains are exactly-once per file and upsert on key") {
    val work = java.nio.file.Files.createTempDirectory("graft-ss").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$work/in"))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))

    // the file source does not recurse: arrivals must be real files, so
    // write to a staging dir and move the part file in (as S3 put would)
    def arrive(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$work/stage-$name"
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$work/in/$name"))
    }

    arrive(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "f1.parquet")
    StreamIngest.ingestAvailableNow(spark, s"$work/in", schema,
      s"$work/target", Seq("k"), s"$work/cp")
    assert(MergeUpsert.readPlain(spark, s"$work/target").count() == 2)

    // corrected re-delivery: same key new value + a new key
    arrive(Seq((2L, "b2"), (3L, "c")).toDF("k", "v"), "f2.parquet")
    StreamIngest.ingestAvailableNow(spark, s"$work/in", schema,
      s"$work/target", Seq("k"), s"$work/cp")
    val got = MergeUpsert.readPlain(spark, s"$work/target")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("continuous trigger: micro-batches merge as files arrive, and a " +
       "restart from checkpoint resumes exactly-once") {
    val work = java.nio.file.Files.createTempDirectory("graft-cont").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$work/in"))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    def arrive(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$work/stage-$name"
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$work/in/$name"))
    }
    def target = MergeUpsert.readPlain(spark, s"$work/target")
      .orderBy("k").as[(Long, String)].collect().toSeq

    // run 1: two micro-batches under a ProcessingTime trigger
    arrive(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "f1.parquet")
    val q1 = StreamIngest.ingestContinuous(spark, s"$work/in", schema,
      s"$work/target", Seq("k"), s"$work/cp", interval = "100 milliseconds")
    try {
      q1.processAllAvailable()
      assert(target == Seq((1L, "a"), (2L, "b")))
      arrive(Seq((2L, "b2")).toDF("k", "v"), "f2.parquet")
      q1.processAllAvailable()
      assert(target == Seq((1L, "a"), (2L, "b2")))
    } finally q1.stop() // "kill" between micro-batches (offsets committed)

    // while the query is down, a file arrives — nobody processes it
    arrive(Seq((3L, "c")).toDF("k", "v"), "f3.parquet")
    assert(target == Seq((1L, "a"), (2L, "b2")))

    // run 2, SAME checkpoint: resumes with only the unseen file. The
    // versioned sink makes batch count observable: exactly 3 merges
    // total means f1/f2 were NOT re-merged on restart.
    val q2 = StreamIngest.ingestContinuous(spark, s"$work/in", schema,
      s"$work/target", Seq("k"), s"$work/cp", interval = "100 milliseconds")
    try {
      q2.processAllAvailable()
      assert(target == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
      assert(MergeUpsert.currentPlainVersion(spark, s"$work/target")
        .contains("v-0000000003"),
        "restart must not re-merge committed batches (one version per merge)")
    } finally q2.stop()
  }

  test("compaction cadence bounds live-version file decay under streaming") {
    val work = java.nio.file.Files.createTempDirectory("graft-scomp").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$work/in"))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    def arrive(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$work/stage-$name"
      // ONE file per arrival, ONE atomic move: the running 100 ms
      // trigger may list the source dir at any instant, and a
      // multi-file move loop can get split across two micro-batches
      // (observed as a rare suite-load flake), which shifts the exact
      // version-count assertion below. Merge-output file counts come
      // from the merge's own shuffle, not from arrival file counts, so
      // nothing this test asserts depends on multi-file arrivals.
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$work/in/$name.parquet"))
    }
    def liveFiles: Int = {
      val v = MergeUpsert.currentPlainVersion(spark, s"$work/target").get
      new java.io.File(s"$work/target/$v").listFiles()
        .count(_.getName.endsWith(".parquet"))
    }
    val q = StreamIngest.ingestContinuous(spark, s"$work/in", schema,
      s"$work/target", Seq("k"), s"$work/cp", interval = "100 milliseconds",
      compactEvery = 2, compactTargetBytes = 1L << 30)
    try {
      (0 until 4).foreach { b =>
        arrive((1L to 40L).map(k => (k, s"b$b")).toDF("k", "v"),
          s"f$b")
        q.processAllAvailable()
      }
      // every 2nd data batch triggers a compaction republish: the live
      // version must be the single-file compacted layout, not the
      // merge parallelism's multi-file one
      assert(liveFiles == 1, s"live version should be compacted, got $liveFiles files")
      // 4 merge publishes + 2 cadence compaction publishes = version 6
      // (proves the cadence actually fired; liveFiles alone could pass
      // vacuously if AQE coalesced a tiny merge to one file)
      assert(MergeUpsert.currentPlainVersion(spark, s"$work/target")
        .contains("v-0000000006"),
        s"expected 2 compaction publishes, at ${
          MergeUpsert.currentPlainVersion(spark, s"$work/target")}")
      val got = MergeUpsert.readPlain(spark, s"$work/target")
        .orderBy("k").as[(Long, String)].collect().toSeq
      assert(got == (1L to 40L).map(k => (k, "b3")))
    } finally q.stop()
  }
}
