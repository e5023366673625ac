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

  test("spans: overlapping hits merge into maximal intervals, separated hits don't") {
    import org.apache.spark.sql.functions._
    val bench = Seq((100L, "a b c d e f"), (101L, "x y z w v")).toDF("doc_id", "text")
    val corpus = Seq(
      // 'a b c d e f' at tokens 2-7 (two overlapping 5-shingles ->
      // ONE span [2,7]); 'x y z w v' at tokens 12-16 (one span)
      (1L, "t0 t1 a b c d e f t8 t9 t10 t11 x y z w v t17"),
      (2L, "no contamination in this one at all right")
    ).toDF("doc_id", "text")
    val got = Contamination.spans(corpus, "doc_id", "text", bench, "text")
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 7L, 2L), (1L, 12L, 16L, 1L)),
      s"got ${got.toSeq}")
  }

  test("spans: adjacent (but not overlapping) spans merge; short docs excluded") {
    import org.apache.spark.sql.functions._
    val bench = Seq((100L, "a b c d e"), (101L, "f g h i j")).toDF("doc_id", "text")
    val corpus = Seq(
      // hits at pos 0 (a..e) and pos 5 (f..j): ends at 4 and starts at
      // 5 — adjacent token ranges, one merged span [0,9]
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d")  // 4 tokens < shingle width: no positional shingles
    ).toDF("doc_id", "text")
    val got = Contamination.spans(corpus, "doc_id", "text", bench, "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 0L, 9L)))
  }
}
