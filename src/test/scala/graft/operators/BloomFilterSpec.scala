package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1 << 12
  private val K = 3

  test("no false negatives: every inserted hash probes positive") {
    val members = (1L to 500L).map(i => math.abs(i * 2654435761L) % (1L << 60))
    val bloom = BloomFilter.build(members.toDF("h"), "h", M, K)
    val probed = members.toDF("h").crossJoin(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("bitmap"), col("h"), M, K))
    assert(probed.count() == members.distinct.size)
  }

  test("false-positive rate is near theory for disjoint probes") {
    val members = (1L to 500L).map(i => math.abs(i * 2654435761L) % (1L << 60))
    val bloom = BloomFilter.build(members.toDF("h"), "h", M, K)
    val probes = (1L to 2000L).map(i => math.abs(i * 40503L + 7L) % (1L << 60))
      .filterNot(members.toSet)
    val fp = probes.toDF("h").crossJoin(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("bitmap"), col("h"), M, K))
      .count()
    // ~1500 set bits of 4096 -> p ≈ (0.31)^3 ≈ 3% ; allow generous slack
    assert(fp < probes.size * 0.12, s"fp=$fp of ${probes.size}")
  }

  test("bitmap is dense, ordered, and fixed-size") {
    val bloom = BloomFilter.build(Seq(42L).toDF("h"), "h", M, K).head()
    val words = bloom.getSeq[Long](0)
    assert(words.size == M / 64)
    assert(words.count(_ != 0L) <= K) // one element sets at most K words
  }

  test("flagBloom is a superset of exact contamination, same shingles") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 29 =!= 0)
    val bench = docs.filter(col("doc_id") % 29 === 0)
    val exact = Contamination.flag(corpus, "doc_id", "text", bench, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloomed = BloomFilter.flagBloom(corpus, "doc_id", "text", bench, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives: every exactly-contaminated doc is flagged with
    // at least as many hits
    exact.foreach { case (id, n) =>
      assert(bloomed.contains(id) && bloomed(id) >= n,
        s"doc $id exact=$n bloom=${bloomed.get(id)}")
    }
  }

  test("keyBloom/pruneKeys: no false negatives, real reduction, and " +
    "the pruned join equals the plain join") {
    import spark.implicits._
    val small = Seq(3L, 700L, 999L).toDF("key")
    val big = (0L until 1000L).map(i => (i, s"p$i")).toDF("key", "payload")
    val bloom = BloomFilter.keyBloom(small, "key")
    val pruned = BloomFilter.pruneKeys(big, "key", bloom)
    val kept = pruned.select("key").collect().map(_.getLong(0)).toSet
    // every true key survives (no false negatives)...
    assert(Set(3L, 700L, 999L).subsetOf(kept))
    // ...and the gate actually reduced the big side (FPs allowed, but
    // at m=2^16/k=3 over 3 keys they are vanishingly rare)
    assert(kept.size < 100, s"pruned to ${kept.size} rows")
    // the join after pruning is byte-equal to the plain join
    val got = pruned.join(small, Seq("key")).select("key", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expect = big.join(small, Seq("key")).select("key", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expect && got.size == 3)
  }

  test("ledger: OR-merge of batch bitmaps equals the from-scratch " +
    "union; every previously-inserted key probes seen") {
    import spark.implicits._
    val b1 = (0L until 500L).toDF("key")
    val b2 = (400L until 900L).toDF("key")
    val m1 = BloomFilter.keyBloomPortable(b1, "key")
    val m2 = BloomFilter.keyBloomPortable(b2, "key")
    val merged = m1.crossJoin(m2.select(col("bitmap").as("b2")))
      .select(BloomFilter.mergeBitmaps(col("bitmap"), col("b2"))
        .as("bitmap"))
    val scratch = BloomFilter.keyBloomPortable(
      b1.unionByName(b2).distinct(), "key")
    assert(merged.head().getSeq[Long](0) == scratch.head().getSeq[Long](0))
    // no false negatives across the merged ledger
    val seen = BloomFilter.probeKeysPortable(
      (0L until 900L).toDF("key"), "key", merged)
      .filter(!col("seen")).count()
    assert(seen == 0L)
    // empty ledger flags nothing
    val none = BloomFilter.probeKeysPortable(b1, "key",
      BloomFilter.emptyBitmap(spark, 1 << 16))
      .filter(col("seen")).count()
    assert(none == 0L)
  }
}
