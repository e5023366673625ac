package graft

import graft.operators.RepeatedSpans

/** Keep-one exact-substring removal (x122): planted duplicated spans
  * pin the policy — the globally first occurrence (by doc_id, pos)
  * survives, every later occurrence is stripped, overlapping spans
  * union, short docs pass through whole. */
class StripSpansSpec extends SparkSpec {

  import spark.implicits._

  private val span = "one two three four five six seven eight"

  test("second occurrence stripped, first kept; within-doc repeats too") {
    val df = Seq(
      (1L, s"$span alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"prefix0 prefix1 $span suffix0 suffix1"),
      (3L, s"$span filler0 filler1 $span")
    ).toDF("doc_id", "text")
    val out = RepeatedSpans.stripSpans(df, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
    // doc 1 holds the global first occurrence (doc_id 1, pos 0)
    assert(out(0).getLong(2) == 0L, "first occurrence keeps its tokens")
    assert(out(0).getString(3).startsWith(span))
    // doc 2's copy is a later occurrence -> its 8 tokens are removed
    assert(out(1).getLong(2) == 8L)
    assert(out(1).getString(3) == "prefix0 prefix1 suffix0 suffix1")
    // doc 3: first span already exists in doc 1 -> stripped; its own
    // second copy is a further occurrence -> stripped too
    assert(out(2).getLong(2) == 16L)
    assert(out(2).getString(3) == "filler0 filler1")
  }

  test("overlapping duplicated spans union, not double-count") {
    // 9 shared tokens = two overlapping duplicated 8-grams; removal
    // must strip 9 tokens from the copy, not 16
    val nine = s"$span nine"
    val df = Seq(
      (1L, s"$nine tail0 tail1 tail2 tail3 tail4 tail5 tail6"),
      (2L, s"head0 head1 head2 head3 head4 head5 head6 $nine")
    ).toDF("doc_id", "text")
    val out = RepeatedSpans.stripSpans(df, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 0L)
    assert(out(1).getLong(2) == 9L)
    assert(out(1).getString(3) ==
      "head0 head1 head2 head3 head4 head5 head6")
  }

  test("k=50 (x123): only runs of >= 50 shared tokens are stripped") {
    val fifty = (1 to 50).map(i => s"w$i").mkString(" ")
    val fortyNine = (1 to 49).map(i => s"v$i").mkString(" ")
    val df = Seq(
      (1L, s"$fifty a1 a2 $fortyNine"),
      // a full copy of the 50-run (stripped) AND of the 49-run (kept:
      // below the k=50 visibility threshold, exactly Lee et al.'s
      // length cutoff semantics)
      (2L, s"b1 $fifty b2 $fortyNine")
    ).toDF("doc_id", "text")
    val out = RepeatedSpans.stripSpans(df, "doc_id", "text", k = 50)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 0L)
    assert(out(1).getLong(2) == 50L)
    assert(out(1).getString(3) == s"b1 b2 $fortyNine")
  }

  test("docs shorter than k pass through whole; empty doc -> empty") {
    val df = Seq((1L, "too short to span"), (2L, "")).toDF("doc_id", "text")
    val out = RepeatedSpans.stripSpans(df, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 0L)
    assert(out(0).getString(3) == "too short to span")
    assert(out(1).getLong(1) == 0L && out(1).getString(3) == "")
  }
}
