package graft.operators

import graft.SparkSpec

class GramIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "quick silver"),
    (3L, "abcx bcdy"),      // has grams abc+bcd but never "abcd"
    (4L, "say abcd aloud"),
    (5L, "")).toDF("doc_id", "text")
  private def idx = GramIndex.build(docs, "doc_id", "text")

  test("search returns exactly the naive contains matches") {
    val qs = Seq(("q1", "quick"), ("q2", "abcd"), ("q3", "nowhere"))
      .toDF("qid", "q")
    val got = GramIndex.search(qs, "qid", "q", idx, docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("q1", 1L), ("q1", 2L), ("q2", 4L)))
  }

  test("all-grams-present but non-adjacent candidate dies at verify") {
    // doc 3 carries every trigram of "abcd" (abc, bcd) yet not the
    // substring — the candidate stage must surface it, verify kill it
    val qs = Seq(("q", "abcd")).toDF("qid", "q")
    val got = GramIndex.search(qs, "qid", "q", idx, docs, "doc_id", "text")
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(4L))
  }

  test("needles shorter than n match nothing, by contract") {
    val qs = Seq(("q", "ox")).toDF("qid", "q")
    assert(GramIndex.search(qs, "qid", "q", idx, docs, "doc_id", "text")
      .count() == 0)
  }

  test("index is distinct postings; empty docs contribute one pad gram") {
    val postings = idx.collect()
    assert(postings.length == postings.distinct.length)
    assert(postings.exists(_.getLong(0) == 5L),
      "empty text still indexes (single zero-pad gram)")
  }
}
