package graft.operators

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("top terms rank by tf·N/df with term-order tie break") {
    val docs = Seq(
      (1L, "apple apple banana shared"),
      (2L, "banana cherry shared shared"),
      (3L, "cherry date shared")
    ).toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rn")
      .select("doc_id", "term", "tf", "score", "rn")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    // doc 1: apple tf=2 df=1 → 2·3/1 = 6; banana tf=1 df=2 → 1.5
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, "apple", 2L, 6.0, 1), (1L, "banana", 1L, 1.5, 2)))
    // doc 2: shared tf=2 df=3 → 2; banana tf=1 df=2 → 1.5 (beats cherry
    // 1.5 by term order tie-break: 'banana' < 'cherry')
    assert(got.filter(_._1 == 2L).toSeq == Seq(
      (2L, "shared", 2L, 2.0, 1), (2L, "banana", 1L, 1.5, 2)))
    // doc 3: date tf=1 df=1 → 3; cherry tf=1 df=2 → 1.5
    assert(got.filter(_._1 == 3L).toSeq == Seq(
      (3L, "date", 1L, 3.0, 1), (3L, "cherry", 1L, 1.5, 2)))
  }
}
