package graft.operators

import graft.SparkSpec

class TopicTagSpec extends SparkSpec {
  import spark.implicits._

  test("tag picks the majority topic, ties break alphabetically") {
    val docs = Seq(
      (1L, "scan join filter table"),       // execution 3 vs storage 1
      (2L, "table stream row batch"),       // storage 2 = streaming 2 → storage? no: execution<retrieval<storage<streaming — storage wins
      (3L, "nothing matches here at all"),
      (4L, ""),
      (5L, "Vector HASH query")).toDF("doc_id", "text") // case-folded
    val m = TopicTag.tag(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(m(1L) == (("execution", 3L)))
    assert(m(2L) == (("storage", 2L)), "tie → alphabetically first topic")
    assert(m(3L) == (("other", 0L)))
    assert(m(4L) == (("other", 0L)))
    assert(m(5L) == (("retrieval", 3L)))
  }

  test("tag emits exactly one row per document") {
    val docs = Seq((1L, "scan scan"), (2L, "table"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TopicTag.tag(docs, "doc_id", "text")
    assert(out.count() == 3)
    assert(out.select("doc_id").distinct().count() == 3)
  }

  test("overlapping taxonomy keywords are rejected") {
    intercept[IllegalArgumentException] {
      TopicTag.tag(Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "text",
        Seq("a" -> Seq("dup"), "b" -> Seq("dup")))
    }
  }
}
