package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("flags docs sharing an n-shingle with the benchmark, counts distinct overlaps") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // contains the bench 5-shingle "quick brown fox jumps over" (and
      // one more overlapping shingle)
      (1L, "she saw the quick brown fox jumps over rocks"),
      // same words, different order: no shared 5-shingle
      (2L, "fox brown quick the jumps lazy over dog the"),
      (3L, "completely unrelated text about spark plans here")
    ).toDF("doc_id", "text")
    val got = Contamination.flag(corpus, "doc_id", "text", bench, "text",
      shingleN = 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.contains(1L) && got(1L) >= 1)
    assert(!got.contains(2L))
    assert(!got.contains(3L))
  }
}
