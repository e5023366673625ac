package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted-artifact contract: probe-from-store must equal
  * train-in-query EXACTLY (same rounding, same tiebreaks — the x115–
  * x118 oracle twins check this cross-engine; here we pin it
  * in-engine on fixtures the oracle never sees), and the store itself
  * must behave as a versioned atomic publish (flip, retention). */
class ArtifactStoreSpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Long): Seq[Double] =
    (0 until 8).map(d => ((seed * 31 + d * 7) % 13 - 6).toDouble)

  private lazy val corpus = (0L until 40L).map(i => (i, vec(i)))
    .toDF("vec_id", "embedding")
  private lazy val queries = corpus.filter(col("vec_id") < 3)

  test("IVF probe from stored centroids equals train-in-query") {
    val store = java.nio.file.Files
      .createTempDirectory("graft-ivf-spec").toString
    val cents = Similarity.kmeansCentroids(
      corpus, "vec_id", "embedding", k = 4, iters = 2)
    ArtifactStore.publish(spark, store, cents)
    val fromStore = Similarity.ivfTopKWith(queries, corpus,
      "vec_id", "embedding", k = 5,
      ArtifactStore.load(spark, store), nProbe = 2).collect().toSeq
    val inQuery = Similarity.ivfTopK(queries, corpus,
      "vec_id", "embedding", k = 5, nCentroids = 4, nProbe = 2)
      .collect().toSeq
    assert(fromStore == inQuery)
  }

  test("PQ probe from stored codebooks equals train-in-query") {
    val store = java.nio.file.Files
      .createTempDirectory("graft-pq-spec").toString
    ArtifactStore.publish(spark, store, Similarity.pqCodebooks(
      corpus, "vec_id", "embedding", m = 2, k = 4, iters = 1))
    val fromStore = Similarity.pqTopKWith(queries, corpus,
      "vec_id", "embedding", k = 5,
      ArtifactStore.load(spark, store), m = 2).collect().toSeq
    val inQuery = Similarity.pqTopK(queries, corpus,
      "vec_id", "embedding", k = 5, m = 2, kCent = 4, iters = 1)
      .collect().toSeq
    assert(fromStore == inQuery)
  }

  test("bloom probe from stored bitmap equals train-in-query") {
    val docs = (0L until 30L)
      .map(i => (i, s"alpha beta gamma delta epsilon zeta token$i " +
        s"eta theta iota kappa"))
      .toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 5 === 0)
    val scan = docs.filter(col("doc_id") % 5 =!= 0)
    val store = java.nio.file.Files
      .createTempDirectory("graft-bloom-spec").toString
    ArtifactStore.publish(spark, store,
      BloomFilter.trainBloom(bench, "text", shingleN = 3, m = 1 << 10, k = 3))
    val fromStore = BloomFilter.flagBloomWith(scan, "doc_id", "text",
      ArtifactStore.load(spark, store), shingleN = 3, m = 1 << 10, k = 3)
      .orderBy("doc_id").collect().toSeq
    val inQuery = BloomFilter.flagBloom(scan, "doc_id", "text",
      bench, "text", shingleN = 3, m = 1 << 10, k = 3)
      .orderBy("doc_id").collect().toSeq
    assert(fromStore == inQuery && fromStore.nonEmpty)
  }

  test("publish flips atomically and retains the superseded version") {
    val store = java.nio.file.Files
      .createTempDirectory("graft-store-vers").toString
    val v1 = Seq((1L, Seq(1.0, 2.0))).toDF("cid", "cvec")
    val v2 = Seq((2L, Seq(3.0, 4.0))).toDF("cid", "cvec")
    ArtifactStore.publish(spark, store, v1)
    assert(ArtifactStore.load(spark, store)
      .select("cid").as[Long].collect().toSeq == Seq(1L))
    ArtifactStore.publish(spark, store, v2)
    assert(ArtifactStore.load(spark, store)
      .select("cid").as[Long].collect().toSeq == Seq(2L),
      "load must see the flipped version")
    val vers = ArtifactStore.versions(spark, store)
    assert(vers.size == 2, s"retainVersions=2 keeps live+1, got $vers")
    // the superseded version stays readable for in-flight probes
    assert(MergeUpsert.readPlainVersion(spark, store, vers.head)
      .select("cid").as[Long].collect().toSeq == Seq(1L))
  }
}
