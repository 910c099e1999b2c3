package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("symmetrize yields both directions, no self-loops, no duplicates") {
    val pairs = Seq((1L, 2L), (2L, 1L), (2L, 3L), (4L, 4L)).toDF("a", "b")
    val e = Graph.symmetrize(pairs, "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(e == Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("kCore: cliques survive, tails and star hubs peel; extra rounds are no-ops") {
    // triangle {1,2,3} with a tail 3-4-5, plus a star hub 10 with
    // leaves 11..14. 2-core = exactly the triangle: round 1 peels 5
    // and every leaf, round 2 peels 4 and the (now degree-0) hub.
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L)).toDF("a", "b")
    val got = Graph.kCore(pairs, "a", "b", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // convergence: more rounds change nothing (peeling is idempotent
    // at the fixpoint)
    val more = Graph.kCore(pairs, "a", "b", k = 2, rounds = 8)
      .as[(Long, Long)].collect().toMap
    assert(more == got)
    // k=1 keeps everything with an edge; k above the max degree
    // empties the graph
    assert(Graph.kCore(pairs, "a", "b", k = 1).count() == 10)
    assert(Graph.kCore(pairs, "a", "b", k = 5).count() == 0)
    // the 3-core of a 4-clique is the whole clique at degree 3
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    assert(Graph.kCore(k4, "a", "b", k = 3).as[(Long, Long)].collect().toMap ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: a peel chain longer than the budget fails loudly instead of returning a non-core") {
    // a 12-node path peels one vertex from each end per round: its
    // 2-core is EMPTY but needs 6 edge-removing rounds to prove it —
    // a silent 2-round budget would return the middle of the path as
    // a fake core
    val path = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Graph.kCore(path, "a", "b", k = 2, rounds = 2).collect()
    }
    assert(e.getMessage.contains("not converged"), e.getMessage)
    // with budget to spare, the fixpoint is found (and it is empty)
    assert(Graph.kCore(path, "a", "b", k = 2, rounds = 8).count() == 0L)
    // a triangle with the same budget converges immediately (no-op
    // round proves the fixpoint without consuming budget)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    assert(Graph.kCore(tri, "a", "b", k = 2, rounds = 1).count() == 3L)
  }

  test("labelPropagation splits bridged cliques into two communities; CC would merge them") {
    // two triangles bridged by 3-4: one connected component, but LPA
    // at 4 synchronous min-tie rounds lands A={1,2,3}->1, B={4,5,6}->3
    // (hand-traced round by round; the oracle SQL replays the same)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("a", "b")
    val got = Graph.labelPropagation(Graph.symmetrize(pairs, "a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    // deterministic: re-run is identical
    val again = Graph.labelPropagation(Graph.symmetrize(pairs, "a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(again == got)
  }

  test("labelPropagation: a node with no in-edges keeps its own label") {
    // directed-only input (not symmetrized): 7 votes for 8, nobody
    // votes for 7
    val e = Seq((7L, 8L)).toDF("src", "dst")
    val got = Graph.labelPropagation(e, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(7L -> 7L, 8L -> 7L))
  }

  test("triangleCounts: K4 + pendant triangle + star, duplicate-input-proof") {
    // K4 on 1-4 (4 triangles), pendant triangle 4-5-6, star at 10
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (4L, 6L), (5L, 6L),
      (10L, 11L), (10L, 12L), (10L, 13L)))
    // feed every edge twice, once mirrored — cleaning is the operator's job
    val noisy = (edges ++ edges.map(_.swap)).toDF("a", "b")
    val got = Graph.triangleCounts(noisy, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 1L, 6L -> 1L))
    // star vertices are in no triangle -> absent, not zero
    assert(!got.contains(10L) && !got.contains(11L))
  }

  test("pageRank: star hub dominates, mass conserved within floor leak, deterministic") {
    // star: hub 0 connected to 1..8
    val pairs = (1L to 8L).map(i => (0L, i)).toDF("a", "b")
    val edges = Graph.symmetrize(pairs, "a", "b")
    val ranks = Graph.pageRank(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ranks.size == 9)
    val hub = ranks(0L)
    (1L to 8L).foreach(i => assert(hub > ranks(i) * 3,
      s"hub $hub should dominate spoke ${ranks(i)}"))
    // spokes are symmetric → identical ranks
    assert((1L to 8L).map(ranks).toSet.size == 1)
    // total mass ~ scale, leaking only floor remainders
    val total = ranks.values.sum
    assert(total <= 1000000L && total > 1000000L - 9 * 10 * 5,
      s"mass leaked too far: $total")
    // invariant to input partitioning
    val again = Graph.pageRank(edges.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == ranks)
  }

  test("pageRank on two disconnected pairs splits mass evenly") {
    val edges = Graph.symmetrize(Seq((1L, 2L), (3L, 4L)).toDF("a", "b"), "a", "b")
    val ranks = Graph.pageRank(edges, iterations = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ranks.values.toSet.size == 1, s"symmetric nodes must tie: $ranks")
  }

  test("bfsHops: true hop distances from a multi-source seed set; isolated seeds at 0") {
    // path 1-2-3-4-5, triangle 10-11-12 bridged at 3-10; 20 isolated
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("a", "b")
    val d = Graph.bfsHops(e, "a", "b", Seq(1L, 20L).toDF("id"), maxHops = 10)
    val m = d.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m == Map(1L -> 0L, 20L -> 0L, 2L -> 1L, 3L -> 2L,
      4L -> 3L, 10L -> 3L, 5L -> 4L, 11L -> 4L, 12L -> 4L),
      s"wrong distances: $m")
    // 12 reaches via 3-10-12 (hop 4), never the longer 3-10-11-12 —
    // BFS labels each vertex once at its MINIMUM distance (asserted
    // above); maxHops truncates the radius
    val d2 = Graph.bfsHops(e, "a", "b", Seq(1L).toDF("id"), maxHops = 2)
    assert(d2.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
