package graft.operators

import graft.SparkSpec

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: hub outranks leaves, isolated nodes get base rank") {
    // star: 1 connected to 2,3,4; node 5 isolated
    val nodes = (1L to 5L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val pr = GraphRank.pageRank(nodes, "id", edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 5)
    val base = (1.0 - 0.85) / 5
    assert(pr(5L) == math.floor(base * 1e10 + 0.5) / 1e10,
      "isolated node keeps the undamped base")
    assert(pr(1L) > pr(2L), "hub outranks a leaf")
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L), "symmetric leaves tie")
    assert(pr(2L) > pr(5L), "connected leaf outranks isolated node")
  }

  test("pagerank: hand-computed 2-node exchange after one iteration") {
    val nodes = Seq(1L, 2L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L)).toDF("id_a", "id_b")
    val pr = GraphRank.pageRank(nodes, "id", edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // each node: base + d * (0.5 / 1)
    val expect = math.floor(((1.0 - 0.85) / 2 + 0.85 * 0.5) * 1e10 + 0.5) / 1e10
    assert(pr(1L) == expect && pr(2L) == expect)
  }

  test("pagerank: layout-independent and validates inputs") {
    val nodes = (1L to 6L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val a = GraphRank.pageRank(nodes, "id", edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = GraphRank.pageRank(nodes.repartition(4), "id",
        edges.repartition(3))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      GraphRank.pageRank(nodes, "id", edges, iters = 0)
    }
    intercept[IllegalArgumentException] {
      GraphRank.pageRank(nodes.filter($"id" < 0), "id", edges)
    }
  }

  test("hits: the type every user touches dominates authority; " +
    "layout-independent; iters guard") {
    // 4 users all hit "popular"; only one hits "niche"
    val ev = (Seq((1L, "popular"), (2L, "popular"), (3L, "popular"),
      (4L, "popular"), (1L, "niche"), (1L, "popular")))
      .toDF("user_id", "event_type")
    val a = GraphRank.hits(ev, "user_id", "event_type")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a("popular") > a("niche"))
    assert(math.abs(a.values.sum - 1.0) < 1e-4,
      "authorities sum-normalize to ~1")
    val b = GraphRank.hits(ev.repartition(5), "user_id", "event_type")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      GraphRank.hits(ev, "user_id", "event_type", iters = 0)
    }
  }
}
