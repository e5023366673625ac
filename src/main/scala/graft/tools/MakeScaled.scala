package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize a scaled-up copy of a driver testdata dir (default: 10×
  * sf0.1 ≈ sf1.0) in the driver's exact layout — one plain parquet
  * FILE per table — so `Bench` runs against it unmodified
  * (`SPARK_GRAFT_SF_DIR=/tmp/testdata-sf1`). Closes the regime gap
  * between the sf0.1 bench and the synthetic in-memory f10–f100
  * ScaleStress runs: a real 6M-row lineitem READ FROM PARQUET, with
  * scan/shuffle/spill behavior included in every query's time.
  *
  * Scaling rules (referential integrity preserved):
  * - facts (orders, lineitem) replicate with consistent o_orderkey /
  *   l_orderkey offsets; FOREIGN keys into the unscaled dims
  *   (customer, supplier, part, nation, region) stay unchanged — 10×
  *   more orders from the same customer base, the realistic shape.
  * - documents replicate with offset doc_id and a per-copy suffix
  *   token (distinct texts, natural near-dup density — the
  *   ScaleStress convention; verbatim copies would make every doc a
  *   10-replica clique and bench the pathological input instead).
  * - embeddings/events replicate with offset ids (vec_id; event_id +
  *   user_id). Query sets selected by `vec_id < 5` stay 5 rows.
  * - events.ts is written as plain INT64 nanos (the ns-annotated
  *   source is read under a scoped nanosAsLong, so both layouts reach
  *   consumers as LongType).
  *
  * Usage: runMain graft.tools.MakeScaled [factor] [srcDir] [outDir] */
object MakeScaled {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(2).headOption.getOrElse("/tmp/testdata-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))

    def writeOne(name: String, df: DataFrame): Unit = {
      val stage = s"$out/.stage-$name"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(s"$out/$name.parquet")
      java.nio.file.Files.deleteIfExists(dst)
      java.nio.file.Files.move(part.toPath, dst)
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(stage))
      println(s"[make-scaled] $name: ${spark.read.parquet(dst.toString).count()} rows")
    }
    def rep(df: DataFrame)(copy: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => copy(df, k)).reduce(_ unionByName _)

    // unscaled dims: byte-identical copies
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      val p = s"$src/$n.parquet"
      if (new java.io.File(p).exists())
        java.nio.file.Files.copy(java.nio.file.Paths.get(p),
          java.nio.file.Paths.get(s"$out/$n.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val orders0 = spark.read.parquet(s"$src/orders.parquet")
    writeOne("orders", rep(orders0)((d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(k * 100000000L))))
    val li0 = spark.read.parquet(s"$src/lineitem.parquet")
    writeOne("lineitem", rep(li0)((d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(k * 100000000L))))
    val docs0 = spark.read.parquet(s"$src/documents.parquet")
    writeOne("documents", rep(docs0)((d, k) =>
      d.withColumn("doc_id", col("doc_id") + lit(k * 1000000L))
        .withColumn("text", concat(col("text"), lit(s" copytag$k")))))
    val emb0 = spark.read.parquet(s"$src/embeddings.parquet")
    writeOne("embeddings", rep(emb0)((d, k) =>
      d.withColumn("vec_id", col("vec_id") + lit(k * 1000000L))))
    val ev0 = graft.queries.ReferenceCatalog.events(spark, src)
      .withColumn("ts", (unix_micros(col("ts")) * 1000L))
    writeOne("events", rep(ev0)((d, k) =>
      d.withColumn("event_id", col("event_id") + lit(k * 10000000L))
        .withColumn("user_id", col("user_id") + lit(k * 1000000L))))
    spark.stop()
  }
}
