package graft

/** x121's recall harness on a planted corpus: verbatim replicas have
  * word-shingle Jaccard 1.0, and identical signatures collide in every
  * band — the index can never miss them, so recall is exactly 1.0 and
  * the truth count is the replica-pair count. Also pins the harness
  * invariants (hits bounded by both sides). */
class LshRecallSpec extends SparkSpec {

  import spark.implicits._

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-recall").toString
    val distinct = (1 to 40).map { i =>
      (100L + i, s"unique document number $i with entirely distinct " +
        s"content about topic-$i covering subject-$i matter-$i " +
        s"theme-$i angle-$i facet-$i aspect-$i detail-$i point-$i", "en")
    }
    val replicas = (0 until 3).map { k =>
      (200L + k, "the exact same replicated document body repeated " +
        "verbatim across three ids with enough words to shingle " +
        "properly and survive banding end to end", "en")
    }
    (distinct ++ replicas).toDF("doc_id", "text", "lang")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted replicas: truth = C(3,2) pairs, recall = 1.0") {
    val row = SparkEntry.queries("x121_lsh_recall")(spark, fixtureDir).head
    val (nTruth, nCand, nHit) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nTruth == 3L, s"3 replicas -> 3 truth pairs, got $nTruth")
    assert(nHit == nTruth, "identical docs collide in every band")
    assert(nHit <= nCand)
    assert(row.getDouble(3) == 1.0)
  }

  test("driver corpus: invariants hold and recall is defined") {
    val row = SparkEntry
      .queries("x121_lsh_recall")(spark, "/root/testdata/sf0.001").head
    val (nTruth, nCand, nHit) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nHit <= nTruth && nHit <= nCand)
    if (nTruth > 0) {
      val r = row.getDouble(3)
      assert(r >= 0.0 && r <= 1.0)
    } else assert(row.isNullAt(3))
  }
}
