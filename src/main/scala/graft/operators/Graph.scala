package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators beyond connected components (which lives
  * with its consumer in [[graft.dedup.Dedup]]).
  *
  * PageRank here is FIXED-POINT: ranks are integer micro-units
  * (`scale` = 1e6) and every step uses floor division, so after any
  * number of iterations the ranks are bit-identical in any engine —
  * a DuckDB oracle can replay the same iterations with `//` and match
  * hashes exactly, which a floating-point PageRank never survives
  * (double sums are order-dependent).
  *
  * Scale shape per iteration: join ranks to edges by src (hash
  * shuffle), aggregate contributions by dst (partial+final hash agg),
  * left-join back onto the node set — the classic distributed PageRank
  * data flow, nothing driver-side. Lineage is cut with
  * `localCheckpoint()` every round; without it the plan nests
  * round-over-round and replanning dominates (measured on the CC
  * implementation, see Dedup.nearDupClusters).
  */
object Graph {

  /** Undirected edge list from ordered pairs: both directions, no
    * self-loops, deduplicated. */
  def symmetrize(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val ab = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    ab.union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Per-vertex triangle counts — the local clustering signal that
    * separates tight near-dup cliques (every pair similar: one
    * boilerplate family) from star-shaped false-positive clusters (one
    * template hub matching many unrelated docs: few triangles).
    *
    * Input is an UNORDERED pair list (one row per undirected edge in
    * either order); self-loops and duplicate/mirrored pairs are
    * cleaned here. Output: (id, n_triangles) for every vertex in at
    * least one triangle.
    *
    * Implementation is the degree-oriented node-iterator (the MapReduce
    * triangle algorithm of Suri & Vassilvitskii, WWW'11): each edge is
    * oriented from its lower-(degree, id) endpoint to the higher, then
    * 2-paths are built only from each vertex's OUT-edges and closed
    * against the oriented edge set. Orientation bounds each vertex's
    * out-degree by O(√m), so the 2-path join cannot blow up on a hub
    * vertex the way a naive a<b<c id-ordering does (a 10^6-degree hub
    * contributes 10^12 id-ordered 2-paths but only O(m) oriented
    * ones) — the difference between surviving 100 TB and not. The
    * orientation changes the join sizes, never the answer: each
    * triangle has exactly one lowest-(degree, id) vertex and is
    * emitted exactly once. Three hash-join shuffles of slim
    * (id, id) tuples; nothing driver-side. */
  def triangleCounts(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // canonical undirected edges: a < b, no self-loops, distinct.
    // localCheckpoint: canon is consumed SIX times downstream (degrees
    // ×2, orientation, both 2-path sides, the closing probe) and each
    // consumer would otherwise clone the entire upstream plan — with a
    // non-trivial edge producer (the span-share subtree) that measured
    // ~120 duplicated scan nodes in one plan. The cut pins a slim
    // (a, b) RDD instead; same pattern as the CC/PageRank rounds.
    val canon = pairs.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val degrees = canon.select(col("a").as("id"))
      .union(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): lower endpoint -> higher endpoint
    val withDegs = canon
      .join(degrees.withColumnRenamed("id", "a").withColumnRenamed("deg", "deg_a"), "a")
      .join(degrees.withColumnRenamed("id", "b").withColumnRenamed("deg", "deg_b"), "b")
    val aFirst = col("deg_a") < col("deg_b") ||
      (col("deg_a") === col("deg_b") && col("a") < col("b"))
    val oriented = withDegs.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("deg_a")).otherwise(col("deg_b")).as("deg_src"),
      when(aFirst, col("deg_b")).otherwise(col("deg_a")).as("deg_dst"))
    // 2-paths from each source's out-edges, ordered so (y, z) is itself
    // oriented: then one semi-probe of the oriented edge set closes them
    val e1 = oriented.select(col("src").as("x"), col("dst").as("y"),
      col("deg_dst").as("deg_y"))
    val e2 = oriented.select(col("src").as("x"), col("dst").as("z"),
      col("deg_dst").as("deg_z"))
    val paths = e1.join(e2, "x")
      .filter(col("deg_y") < col("deg_z") ||
        (col("deg_y") === col("deg_z") && col("y") < col("z")))
      .select("x", "y", "z")
    val closing = oriented.select(col("src").as("y"), col("dst").as("z"))
    val triangles = paths.join(closing, Seq("y", "z"))
    triangles.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Fixed-point PageRank. `dampingPct` is the damping factor in
    * percent (85 = the classic 0.85). Dangling mass (nodes with no
    * out-edges) is dropped, the standard simplification; on a
    * symmetrized graph every node has out-edges so nothing is lost.
    * Returns (id, rank_micro) with Σ rank_micro ≲ scale (floor
    * division leaks at most a few micro-units per node per round). */
  def pageRank(edges: DataFrame, srcCol: String = "src",
               dstCol: String = "dst", iterations: Int = 5,
               scale: Long = 1000000L, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && dampingPct > 0 && dampingPct < 100,
      s"bad params: iterations=$iterations dampingPct=$dampingPct")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint() // reused every round: materialize once
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    // out-degrees FUSED onto the edge list once, outside the loop —
    // the deg join is loop-invariant, so paying it per round was a
    // pure waste of one join (and its exchanges) per iteration
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint()
    // node count: ONE bounded driver read (a single long — the
    // centroid-class collect) instead of re-running the global-agg +
    // broadcast subtree every round. max(n, 1): the same empty-graph
    // guard the old greatest(__n, 1) provided (zero nodes ⇒ the node
    // scan below discards everything anyway). The floor-of-double-
    // division arithmetic is unchanged, so ranks stay bit-identical.
    val n = math.max(nodes.count(), 1L)
    val r0 = math.floor(scale.toDouble / n).toLong
    val base = math.floor((scale * (100 - dampingPct) / 100).toDouble / n).toLong
    var rank = nodes.select(col("id"), lit(r0).as("r"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contrib = ed.join(rank, col("src") === col("id"))
        .select(col("dst").as("id"),
          floor(col("r").cast("double") / col("deg")).cast("long").as("c"))
      val sums = contrib.groupBy("id").agg(sum("c").as("cs"))
      val next = nodes.join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + floor(lit(dampingPct).cast("double") *
            coalesce(col("cs"), lit(0L)) / 100).cast("long")).as("r"))
        .localCheckpoint()
      // round N materialized ⇒ round N−1's checkpoint blocks are dead
      graft.core.Checkpoints.releaseAll(rank)
      rank = next
    }
    // the final rank is its own checkpoint; the loop-invariant frames
    // (edges, node set, degree-fused edges) are never read past here
    graft.core.Checkpoints.releaseAll(e)
    graft.core.Checkpoints.releaseAll(nodes)
    graft.core.Checkpoints.releaseAll(ed)
    rank.select(col("id"), col("r").as("rank_micro"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) —
    * community detection over the near-dup/similarity graph, the
    * coarser sibling of connected components: CC merges everything
    * reachable, LPA splits a component into densely-linked
    * communities (a template hub bridging two boilerplate families
    * stays a bridge, not a merger). Every node starts as its own
    * label; each round every node adopts the most frequent label
    * among its NEIGHBORS, ties broken toward the smallest label —
    * fully deterministic, so a bounded number of synchronous rounds
    * is engine-exact and replayable in SQL (the asynchronous/
    * random-order variant of the paper is not). Nodes with no
    * in-edges this round keep their label. Bounded rounds also
    * sidestep synchronous LPA's bipartite 2-cycle oscillation: the
    * output is the round-`iterations` state, convergence not claimed.
    *
    * Scale shape per round: one hash join of the slim (id, label)
    * frame onto edges by src, a (dst, label) count agg
    * (partial+final), and a per-dst argmax as a struct-max hash agg
    * (max of (cnt, −label) — never a rank window over the vote list);
    * all shuffles carry (id, label, cnt) longs only. Lineage cut with
    * `localCheckpoint` every round, previous round's blocks released
    * — the PageRank discipline. Returns (id, label). */
  /** k-core extraction by SYNCHRONOUS parallel peeling (the
    * parallelization of Matula & Beck's linear peeling, "Smallest-last
    * ordering and clustering and graph coloring algorithms", JACM
    * 1983): each round simultaneously removes EVERY vertex whose
    * degree in the remaining graph is below `k`, until a round removes
    * nothing (the fixpoint — the output IS the k-core). `rounds` caps
    * the edge-removing rounds; a peel chain that outruns it fails
    * loudly rather than returning a non-core. The
    * rule is a degree threshold, never a traversal order, so the
    * result is deterministic and order-independent and a SQL oracle
    * unrolls the rounds verbatim (the [[labelPropagation]]
    * replayability discipline).
    *
    * Curation use: in a near-dup graph, the 2-core separates
    * clique-like boilerplate FAMILIES (every member survives) from
    * star-shaped template-hub false positives (leaves peel, then the
    * hub follows) — the structural complement of
    * [[triangleCounts]]'s local signal.
    *
    * Input is an unordered pair list ([[symmetrize]] cleans
    * direction, self-loops, duplicates). Output: (id, core_degree)
    * for every surviving vertex — its degree inside the core.
    *
    * Scale shape: per round, one narrow degree aggregate and two
    * semi-joins over (src, dst) long pairs — no payload ever enters
    * the loop; localCheckpoint per round cuts lineage exactly like
    * the LPA/PageRank loops. The result owns its checkpoint blocks
    * (release via `Checkpoints.releaseAll`). */
  def kCore(pairs: DataFrame, aCol: String, bCol: String, k: Int,
            rounds: Int = 4): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    var e = symmetrize(pairs, aCol, bCol).localCheckpoint()
    // Peel to the FIXPOINT, detected cheaply: a round that removes no
    // edge proves the previous state was already the k-core (peeling
    // only ever removes), and the count is over freshly checkpointed
    // blocks — no recompute. `rounds` caps EFFECTIVE (edge-removing)
    // rounds only; exhausting it unconverged fails loudly instead of
    // silently returning a non-core (the docstring promises the core).
    var nEdges = e.count()
    var converged = nEdges == 0L
    var effective = 0
    while (!converged) {
      require(effective < rounds,
        s"kCore: peel chain not converged after $rounds edge-removing rounds " +
          s"($nEdges directed edges remain) — raise `rounds`")
      val keep = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("id"))
      val next = e
        .join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst")).localCheckpoint()
      val nNext = next.count()
      if (nNext == nEdges) {
        // no-op round: fixpoint was already reached
        graft.core.Checkpoints.releaseAll(next)
        converged = true
      } else {
        graft.core.Checkpoints.releaseAll(e)
        e = next
        nEdges = nNext
        effective += 1
        converged = nNext == 0L
      }
    }
    val out = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("core_degree")).localCheckpoint()
    graft.core.Checkpoints.releaseAll(e)
    out
  }

  /** Multi-source BFS hop distances — how far every reachable vertex
    * sits from a SEED set, by synchronous frontier expansion
    * (unit-weight SSSP): round i joins the hop-i frontier against the
    * edge list, anti-joins out everything already labeled, and admits
    * the rest at hop i+1 — each vertex is labeled exactly once with
    * its TRUE minimum hop count, because BFS discovers vertices in
    * distance order (order-independent, so a SQL oracle unrolls the
    * rounds verbatim — the [[labelPropagation]] replayability
    * discipline). Stops at the natural fixpoint (an empty frontier)
    * or after `maxHops` rounds, whichever is first; unreachable
    * vertices simply never appear.
    *
    * Curation use: distance-from-seeds over the near-dup graph is
    * the "contamination blast radius" — hop 1 are direct near-dups
    * of a flagged document, hop 2 their near-dups, and the audit
    * quarantines by radius instead of recomputing pairwise overlap
    * against an exploding set.
    *
    * Scale shape: per round, one semi-join of the (long, long) edge
    * list against the frontier and one anti-join against the labeled
    * set — no payload ever enters the loop, shuffles carry two longs;
    * localCheckpoint per round cuts lineage ([[pageRank]]'s
    * discipline); frontier counts ride the checkpoint (no recompute).
    * Result owns its blocks (`Checkpoints.releaseAll`). Seeds appear
    * at hop 0 whether or not they touch any edge. */
  def bfsHops(pairs: DataFrame, aCol: String, bCol: String,
              seeds: DataFrame, maxHops: Int = 3): DataFrame = {
    require(maxHops >= 1 && maxHops <= 16, s"need 1 <= maxHops <= 16, got $maxHops")
    val e = symmetrize(pairs, aCol, bCol).localCheckpoint()
    var dist = seeds.select(col(seeds.columns.head).cast("long").as("id"))
      .distinct().withColumn("hops", lit(0L)).localCheckpoint()
    var labeled = dist.count()
    var frontierN = labeled
    var hop = 0L
    while (hop < maxHops && frontierN > 0L) {
      val frontier = dist.filter(col("hops") === hop)
        .select(col("id").as("src"))
      val next = e.join(frontier, Seq("src"), "left_semi")
        .select(col("dst").as("id")).distinct()
        .join(dist.select("id"), Seq("id"), "left_anti")
        .withColumn("hops", lit(hop + 1L))
      val grown = dist.unionByName(next).localCheckpoint()
      val grownN = grown.count()
      graft.core.Checkpoints.releaseAll(dist)
      frontierN = grownN - labeled
      labeled = grownN
      dist = grown
      hop += 1L
    }
    graft.core.Checkpoints.releaseAll(e)
    dist
  }

  def labelPropagation(edges: DataFrame, srcCol: String = "src",
                       dstCol: String = "dst", iterations: Int = 4): DataFrame = {
    require(iterations >= 1, s"need iterations >= 1, got $iterations")
    // MEASURED (round 17): pinning the loop frames with persist +
    // repartition-by-key (to make the vote join co-partitioned and
    // exchange-free, the Pregel discipline) ran 2.3x SLOWER here —
    // cached plans compile without AQE partition coalescing
    // (canChangeCachedPlanOutputPartitioning=false), so every round
    // ran full-width 32-task stages (1359 tasks vs 486) and the
    // persist/scan overhead swamped the saved exchanges at this
    // frame size. localCheckpoint + AQE remains the right local
    // shape; revisit co-partitioned pinning only on a real cluster
    // where the edge re-shuffle dominates barrier latency.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint() // reused every round: materialize once
    var lab = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .select(col("id"), col("id").cast("long").as("label"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      // Each node's CURRENT label rides as a weight-0 self-vote, so
      // the keep-own-label fallback needs no post-agg join back onto
      // `lab` (one join + its exchanges saved per round). Semantics
      // identical: any real vote (cnt ≥ 1) beats the weight-0 self
      // row; with no in-edges the self row wins alone; a self label
      // that ALSO receives votes adds 0 to its count.
      val votes = e.join(lab, col("src") === col("id"))
        .select(col("dst"), col("label"), lit(1L).as("w"))
        .unionAll(lab.select(col("id").as("dst"), col("label"), lit(0L).as("w")))
        .groupBy(col("dst"), col("label")).agg(sum(col("w")).as("cnt"))
      val next = votes
        .groupBy(col("dst").as("__id"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("__m"))
        .select(col("__id").as("id"), (-col("__m.nl")).as("label"))
        .localCheckpoint()
      graft.core.Checkpoints.releaseAll(lab)
      lab = next
    }
    graft.core.Checkpoints.releaseAll(e)
    lab
  }
}
