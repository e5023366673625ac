package graft.operators

import graft.SparkSpec

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("bradleyTerry: dominant item gets the largest strength, " +
    "strengths normalize to ~1") {
    val comps = (Seq.fill(4)(("a", "b")) ++ Seq.fill(3)(("a", "c"))
      ++ Seq.fill(2)(("b", "c")) ++ Seq(("c", "b")))
      .toDF("winner", "loser")
    val out = Preference.bradleyTerry(comps, "winner", "loser")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("a")._1 == 7L && out("a")._2 == 7L)
    assert(out("b")._1 == 2L && out("b")._2 == 7L)
    assert(out("a")._3 > out("b")._3 && out("b")._3 > out("c")._3)
    val z = out.values.map(_._3).sum
    assert(math.abs(z - 1.0) < 1e-4)
  }

  test("bradleyTerry: symmetric record gives equal strengths") {
    val comps = Seq(("x", "y"), ("y", "x")).toDF("winner", "loser")
    val out = Preference.bradleyTerry(comps, "winner", "loser")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("x") == out("y"))
  }

  test("bradleyTerry: document-grain item vocabulary fails the " +
    "maxPairs gate with a reported error, not a driver OOM") {
    // 40 distinct items chained pairwise → 39 directed pairs > cap 10
    val comps = (0 until 39).map(i => (s"d$i", s"d${i + 1}"))
      .toDF("winner", "loser")
    val e = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(comps, "winner", "loser", maxPairs = 10)
    }
    assert(e.getMessage.contains("maxPairs"))
    assert(e.getMessage.contains("bounded vocabulary"))
    // exactly at the cap is allowed (the gate is > cap, not >= cap)
    val atCap = (0 until 10).map(i => (s"d$i", s"d${i + 1}"))
      .toDF("winner", "loser")
    assert(Preference.bradleyTerry(atCap, "winner", "loser",
      maxPairs = 10).count() == 11L)
  }
}
