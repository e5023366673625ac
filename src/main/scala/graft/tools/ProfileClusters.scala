package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-level timing for the cluster-resolution family (x18/x31's
  * residual cost) — breaks resolveClusters' driver path into its
  * constituent jobs to show where the seconds go at sf0.1.
  * Usage: runMain graft.tools.ProfileClusters [sfDir] */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm file listing

    val sigs = time("signatures (cache+count)") {
      val s = Dedup.minhashSignatures(docs, "doc_id", "text", 32).cache()
      s.count(); s
    }
    val cands = time("lsh candidates (cache+count)") {
      val c = Dedup.minhashLsh(docs, "doc_id", "text", sigs = Some(sigs)).cache()
      c.count(); c
    }
    val pairs = time("verify (cache+count)") {
      val p = Dedup.verifyCandidates(docs, "doc_id", "text",
        cands.filter(col("est_jaccard") >= 0.25), minJaccard = 0.4).cache()
      p.count(); p
    }
    val p2 = time("pairs re-cache + count (rC step)") {
      val p = pairs.select(col("id_a").cast("long").as("src"),
        col("id_b").cast("long").as("dst")).cache()
      p.count(); p
    }
    val rawEs = time("pairs collect")(p2.collect())
    val known = time("endpoint membership semi-join") {
      import spark.implicits._
      val endpoints = rawEs.flatMap(r => Seq(r.getLong(0), r.getLong(1)))
        .distinct.toSeq
      docs.select(col("doc_id").cast("long").as("node"))
        .join(broadcast(endpoints.toDF("node")), Seq("node"), "left_semi")
        .as[Long].collect().toSet
    }
    println(s"[prof] endpoints=${known.size} edges=${rawEs.length}")
    val clusters = time("full resolveClusters") {
      Dedup.resolveClusters(docs, "doc_id", pairs)
    }
    time("clusters orderBy+count")(clusters.orderBy("doc_id").count())
    // unpersist EVERYTHING first: Spark's CacheManager substitutes any
    // sameResult subtree with its InMemoryRelation, so a live signature
    // cache would silently feed the "no cache" measurement below
    sigs.unpersist(blocking = true)
    cands.unpersist(blocking = true)
    pairs.unpersist(blocking = true)
    p2.unpersist(blocking = true)
    time("x18 shape end-to-end (no shared cache)") {
      Dedup.resolveClusters(docs, "doc_id",
        Dedup.nearDupPipeline(docs, "doc_id", "text",
          minEstJaccard = 0.25, minJaccard = 0.4))
        .orderBy("doc_id").count()
    }
    spark.stop()
  }
}
