package graft.operators

import graft.SparkSpec

class FunnelsSpec extends SparkSpec {
  import spark.implicits._

  test("ordered funnel: order matters, not mere presence") {
    val events = Seq(
      // A: signup(1) -> click(2) -> purchase(3): all stages
      (1L, 1L, "signup"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      // B: click(1) BEFORE signup(2): stage 1 only
      (2L, 1L, "click"), (2L, 2L, "signup"),
      // C: signup(1) -> purchase(2) -> click(3): purchase precedes the
      // qualifying click, so stages 1-2 only
      (3L, 1L, "signup"), (3L, 2L, "purchase"), (3L, 3L, "click"),
      // D: never signs up: no stage
      (4L, 1L, "click"), (4L, 2L, "purchase"),
      // E: simultaneous signup/click (strict > excludes the tie)
      (5L, 1L, "signup"), (5L, 1L, "click")
    ).toDF("user_id", "ms", "event_type")
    val got = Funnels.orderedFunnel(events, "user_id", "ms",
        "event_type", Seq("signup", "click", "purchase"))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((4L, 2L, 1L)))
  }

  test("ordered funnel: repeat events use the EARLIEST qualifying time") {
    // click at 5 qualifies; the later click at 50 must not push the
    // purchase-at-10 out of the funnel
    val events = Seq(
      (1L, 1L, "signup"), (1L, 5L, "click"), (1L, 50L, "click"),
      (1L, 10L, "purchase")
    ).toDF("user_id", "ms", "event_type")
    val got = Funnels.orderedFunnel(events, "user_id", "ms",
        "event_type", Seq("signup", "click", "purchase"))
      .collect().head
    assert(got.getLong(2) == 1L)
  }

  test("cohort retention: cells count distinct users of the cohort's active weeks") {
    val wk = 604800000L
    val events = Seq(
      (1L, 0L), (1L, wk + 1), (1L, 3 * wk),  // cohort 0: weeks 0,1,3
      (2L, 1L), (2L, wk),                    // cohort 0: weeks 0,1
      (3L, wk * 2 + 5)                       // cohort 2: week 0
    ).toDF("user_id", "ms")
    val got = Funnels.cohortRetention(events, "user_id", "ms")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 2L, (0L, 3L) -> 1L, (2L, 0L) -> 1L))
  }

  test("percentile normalization: per-group percent_rank with tie sharing") {
    val docs = Seq(
      (1L, "a", 0.1), (2L, "a", 0.5), (3L, "a", 0.5), (4L, "a", 0.9),
      (5L, "b", 0.7)
    ).toDF("doc_id", "source", "q")
    val got = CorpusStats.percentileNormalize(docs, "source", "q")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // group a, n=4: ranks 1,2,2,4 -> (r-1)/3
    assert(got(1L) == 0.0 && got(4L) == 1.0)
    assert(got(2L) == got(3L) && got(2L) == 1.0 / 3)
    assert(got(5L) == 0.0, "single-row group normalizes to 0")
  }

  test("cooccurrence: distinct-user support, repeats don't inflate") {
    val events = Seq(
      (1L, "view"), (1L, "view"), (1L, "cart"),   // repeat view: 1 user
      (2L, "view"), (2L, "cart"), (2L, "buy"),
      (3L, "view"), (3L, "buy"),
      (4L, "view")                                 // single type: no pair
    ).toDF("user_id", "event_type")
    val got = Funnels.cooccurrence(events, "user_id", "event_type", k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    // (cart,view): users 1,2; (buy,view): users 2,3; (buy,cart): user 2
    assert(got(("cart", "view"))._1 == 2L)
    assert(got(("buy", "view"))._1 == 2L)
    assert(got(("buy", "cart"))._1 == 1L)
    assert(got.size == 3)
    // ranks: support ties broken by (type_a, type_b)
    assert(got(("buy", "view"))._2 == 1 && got(("cart", "view"))._2 == 2 &&
      got(("buy", "cart"))._2 == 3)
  }

  test("transitionMatrix: per-user sequences, probabilities sum to 1 " +
    "per from-state, cross-user transitions never counted") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // user 1: a→b→a; user 2: a→b. NO transition between users.
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "a"),
      (2L, ts("2024-01-01 00:00:30"), 4L, "a"),
      (2L, ts("2024-01-01 00:01:30"), 5L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnels.transitionMatrix(ev, "user_id", "ts", "event_id",
        "event_type")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(("a", "b")) == ((2L, 1.0))) // both users a→b
    assert(got(("b", "a")) == ((1L, 1.0))) // only user 1
    assert(got.size == 2) // no b-at-end → anything, no cross-user edge
  }

  test("decayedCounts: fresh events weigh 2^20, each halflife halves, " +
    "ancient events weigh zero") {
    import spark.implicits._
    val ref = 1700000000000000L // µs
    def at(daysAgo: Long) = new java.sql.Timestamp(
      (ref - daysAgo * 86400000000L) / 1000L)
    val ev = Seq(
      ("fresh", at(0)), ("fresh", at(6)), // both in halflife 0
      ("old", at(7)), ("old", at(14)), // 1 and 2 halflives
      ("ancient", at(7 * 60)) // shift capped → 0
    ).toDF("event_type", "ts")
    val got = Funnels.decayedCounts(ev, "event_type", "ts", ref)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("fresh") == ((2L, 2L * 1048576L)))
    assert(got("old") == ((2L, 1048576L / 2 + 1048576L / 4)))
    assert(got("ancient") == ((1L, 0L)))
  }

  test("decayedCounts: events AFTER refUs weigh the full 2^20, " +
    "never mod-64 shift to zero") {
    import spark.implicits._
    val ref = 1700000000000000L // µs
    def at(daysAgo: Long) = new java.sql.Timestamp(
      (ref - daysAgo * 86400000000L) / 1000L)
    val ev = Seq(
      ("skewed", at(-30)), // 30 days IN THE FUTURE of refUs
      ("skewed", at(0))
    ).toDF("event_type", "ts")
    val got = Funnels.decayedCounts(ev, "event_type", "ts", ref)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // without the lower clamp the -4 halflife shift hits Java's
    // mod-64 semantics (>> 60 = 0); clamped, both rows weigh 2^20
    assert(got("skewed") == ((2L, 2L * 1048576L)))
  }

  test("transitionEntropy: deterministic chains carry 0 bits; a " +
    "uniform 2-way split carries 1") {
    import spark.implicits._
    def at(ms: Long) = new java.sql.Timestamp(ms)
    // user 1: a->b->a->b (a always goes to b, b always to a: 0 bits);
    // user 2/3: c->a and c->b once each (c: 1 bit)
    val ev = Seq(
      (1L, 1L, 1L, "a"), (2L, 1L, 2L, "b"), (3L, 1L, 3L, "a"),
      (4L, 1L, 4L, "b"),
      (5L, 2L, 1L, "c"), (6L, 2L, 2L, "a"),
      (7L, 3L, 1L, "c"), (8L, 3L, 2L, "b")
    ).map { case (id, u, ms, t) => (id, u, at(ms), t) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnels.transitionEntropy(ev, "user_id", "ts",
        "event_id", "event_type")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("h_bits"), r.getAs[Double]("h_conditional")))
      .toMap
    assert(got("a")._1 == 0.0)
    assert(got("b")._1 == 0.0)
    assert(got("c")._1 == 1.0)
    // H_cond = p(c)*1 = (2/5)*1 = 0.4
    assert(got("c")._2 == 0.4)
  }
}
