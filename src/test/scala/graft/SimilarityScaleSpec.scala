package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.similarity.Similarity

/** Scale-path guards for the IVF quantizer: the broadcast-join
  * assignment (large nCells) must be semantically identical to the
  * literal-inline assignment, and sampled k-means training must keep
  * recall. */
class SimilarityScaleSpec extends SparkSpec {

  private val dir01 = "/root/testdata/sf0.001"
  private val dir1 = "/root/testdata/sf0.1"

  private def queries(e: DataFrame) = e.filter(col("vec_id") < 10)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  private def resultSet(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.select("q_id", "vec_id", "rank", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("IVF broadcast-join assignment is bit-identical to literal inlining") {
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val q = queries(Tables.embeddings(spark, dir01))
    val inline = Similarity.ivfTopK(e, q, dim = 64, k = 5,
      nCells = 16, nProbe = 4, inlineCellThreshold = 64)
    val joined = Similarity.ivfTopK(e, q, dim = 64, k = 5,
      nCells = 16, nProbe = 4, inlineCellThreshold = 0) // force the join path
    assert(resultSet(inline) == resultSet(joined))
  }

  test("IVF-PQ: exhaustive budgets reproduce brute force bit-for-bit; production budgets clear the recall floor") {
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val q = queries(Tables.embeddings(spark, dir01))
    val cents = Similarity.lloydCentroidsExact(e, nCells = 16, iters = 2)
    val brute = Similarity.bruteForceTopK(e, q, k = 5)
    // law 1: nProbe = nCells and coarseK >= |corpus| make the rerank
    // cover every pair exactly — bit-identical to brute force no
    // matter what the codebook quantized away
    val exhaustive = Similarity.ivfPqTopK(e, q, dim = 64, k = 5,
      nCells = 16, nProbe = 16, nSub = 4, nCents = 16,
      coarseK = 1000000, centroids = Some(cents))
    assert(resultSet(exhaustive) == resultSet(brute))
    // law 2: the production budget (probe 4/16 cells, ADC top-20
    // rerank) keeps recall@5 above the floor
    val prod = Similarity.ivfPqTopK(e, q, dim = 64, k = 5,
      nCells = 16, nProbe = 4, nSub = 4, nCents = 16,
      coarseK = 20, centroids = Some(cents))
    val truth = resultSet(brute).map(t => (t._1, t._2))
    val got = resultSet(prod).map(t => (t._1, t._2))
    val recall = got.count(truth.contains).toDouble / truth.size
    assert(recall >= 0.5, s"IVF-PQ recall@5 fell to $recall")
    // every query still gets a full top-5 (the probe set is wide
    // enough at these cell sizes)
    assert(prod.groupBy("q_id").count().collect().forall(_.getLong(1) == 5))
  }

  test("SQ8: exhaustive coarseK equals brute force; production budget clears the recall floor") {
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val q = queries(Tables.embeddings(spark, dir01))
    val brute = Similarity.bruteForceTopK(e, q, k = 5)
    // law 1: coarseK >= |corpus| reranks every pair exactly —
    // bit-identical to brute force no matter what the grid lost
    val exhaustive = Similarity.sq8TopK(e, q, k = 5, coarseK = 1000000)
    assert(resultSet(exhaustive) == resultSet(brute))
    // law 2: 1-byte codes are faithful enough that even a tight
    // coarse budget keeps recall high (SQ8's per-dim fidelity beats
    // PQ's shared-subspace centroids at the same coarseK)
    val prod = Similarity.sq8TopK(e, q, k = 5, coarseK = 20)
    val truth = resultSet(brute).map(t => (t._1, t._2))
    val got = resultSet(prod).map(t => (t._1, t._2))
    val recall = got.count(truth.contains).toDouble / truth.size
    assert(recall >= 0.8, s"SQ8 recall@5 fell to $recall")
    assert(prod.groupBy("q_id").count().collect().forall(_.getLong(1) == 5))
  }

  test("IVF at nCells=256: large-quantizer join path, A/B vs forced inline") {
    val e = Tables.embeddings(spark, dir1).select("vec_id", "embedding")
    val q = queries(Tables.embeddings(spark, dir1))
    // default threshold (64) routes nCells=256 to the join path
    val joined = Similarity.ivfTopK(e, q, dim = 64, k = 5, nCells = 256, nProbe = 16)
    // force literal inlining of all 256 centroids for the ground truth
    val inline = Similarity.ivfTopK(e, q, dim = 64, k = 5, nCells = 256, nProbe = 16,
      inlineCellThreshold = 1000)
    assert(resultSet(joined) == resultSet(inline))
    assert(joined.groupBy("q_id").count().collect().forall(_.getLong(1) == 5))
  }

  test("persisted IVF index equals the in-memory exact-Lloyd search; scans prune cells") {
    import graft.similarity.IvfIndex
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf_idx").resolve("idx").toString
    IvfIndex.build(e, path, dim = 64, nCells = 16, iters = 2)
    assert(new java.io.File(path, "_SUCCESS").exists())
    // build/probe share one assignment expression → identical results
    val q = queries(Tables.embeddings(spark, dir01))
    val fromIndex = IvfIndex.topK(spark, path, q, dim = 64, k = 5, nProbe = 4)
    val inMemory = Similarity.ivfTopK(e, q, dim = 64, k = 5,
      nCells = 16, nProbe = 4,
      centroids = Some(Similarity.lloydCentroidsExact(e, nCells = 16, iters = 2)))
    assert(resultSet(fromIndex) == resultSet(inMemory))
    // ONE query probing 4 of 16 cells: the scan must carry a
    // cell_id partition filter — directory-level pruning, the static
    // twin of fact_pruned's dynamic pruning
    val one = q.filter(col("q_id") === 0)
    val pruned = IvfIndex.topK(spark, path, one, dim = 64, k = 5, nProbe = 4)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*cell_id[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.isDefined, s"no cell_id partition filter on the cells scan:\n$plan")
    assert(pf.get.contains("IN") || pf.get.contains("in("), pf.get)
  }

  test("filtered vector search: predicate restricts candidates BEFORE ranking; exhaustive probes equal filtered brute force; pushable filters reach the scan") {
    import graft.similarity.IvfIndex
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf_flt").resolve("idx").toString
    IvfIndex.build(e, path, dim = 64, nCells = 16, iters = 2)
    val q = queries(Tables.embeddings(spark, dir01))
    // exhaustive probing + predicate == brute force over the filtered
    // corpus: the filter applies to candidates, never truncated top-ks
    val filtered = IvfIndex.topK(spark, path, q, dim = 64, k = 5,
      nProbe = 16, predicate = Some(col("vec_id") % 3 === 0))
    val brute = Similarity.bruteForceTopK(
      e.filter(col("vec_id") % 3 === 0), q, k = 5)
    assert(resultSet(filtered) == resultSet(brute))
    // a pushable-shaped predicate reaches the parquet scan as a
    // PushedFilter (row-group pruning inside the probed partitions)
    val pushed = IvfIndex.topK(spark, path, q, dim = 64, k = 5,
      nProbe = 4, predicate = Some(col("vec_id") < 250L))
    pushed.collect()
    val plan = pushed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("PushedFilters: \\[[^\\]]*LessThan\\(vec_id,250\\)".r.findFirstIn(plan).isDefined,
      s"vec_id predicate must push into the cells scan:\n$plan")
  }

  test("persisted PQ codes: topKPq is bit-identical to the ad-hoc IVF-PQ composition; codes scan prunes and never reads embeddings") {
    import graft.similarity.IvfIndex
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivfpq_idx").resolve("idx").toString
    IvfIndex.build(e, path, dim = 64, nCells = 16, iters = 2)
    IvfIndex.buildPq(spark, path, dim = 64, nSub = 4, nCents = 16)
    val q = queries(Tables.embeddings(spark, dir01))
    val fromIndex = IvfIndex.topKPq(spark, path, q, dim = 64, k = 5,
      nProbe = 4, coarseK = 20)
    val adHoc = Similarity.ivfPqTopK(e, q, dim = 64, k = 5,
      nCells = 16, nProbe = 4, nSub = 4, nCents = 16, coarseK = 20,
      centroids = Some(Similarity.lloydCentroidsExact(e, nCells = 16, iters = 2)))
    assert(resultSet(fromIndex) == resultSet(adHoc),
      "stored codes changed the answer — storage must only change the plan")
    // exhaustive budgets ≡ brute force (the rerank covers every pair)
    val exhaustive = IvfIndex.topKPq(spark, path, q, dim = 64, k = 5,
      nProbe = 16, coarseK = 1000000)
    assert(resultSet(exhaustive) ==
      resultSet(Similarity.bruteForceTopK(e, q, k = 5)))
    // plan guard: literal queries → the ONLY embedding-reading scan is
    // the exact rerank (codes carry no embedding), and both the codes
    // and cells scans carry cell_id partition filters
    import spark.implicits._
    val lit1 = q.filter(col("q_id") === 0).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
      .toDF("q_id", "q_emb")
    val pruned = IvfIndex.topKPq(spark, path, lit1, dim = 64, k = 5,
      nProbe = 4, coarseK = 20)
    pruned.collect()
    // the adaptive plan string repeats every scan under "== Initial
    // Plan ==" — count only the final section
    val plan = pruned.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val pfs = "PartitionFilters: \\[[^\\]]*cell_id[^\\]]*\\]".r.findAllIn(plan).toSeq
    assert(pfs.size >= 2, s"codes AND cells scans must prune on cell_id:\n$plan")
    val embScans = "embedding:array".r.findAllIn(plan).size
    assert(embScans == 1,
      s"raw embeddings read by $embScans scans — only the rerank may read them:\n$plan")
  }

  test("appendPq codes new batches with the persisted quantizers; rebuild re-trains both tiers") {
    import graft.similarity.IvfIndex
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val base = e.filter(col("vec_id") < 250)
    val batch = e.filter(col("vec_id") >= 250)
    val inc = java.nio.file.Files.createTempDirectory("ivfpq_inc").resolve("idx").toString
    IvfIndex.build(base, inc, dim = 64, nCells = 16, iters = 2)
    IvfIndex.buildPq(spark, inc, dim = 64, nSub = 4, nCents = 16)
    IvfIndex.appendPq(spark, inc, batch, dim = 64)
    // the appended index serves every vector; with both quantizers
    // trained on the base (which holds all the lowest vec_ids, i.e.
    // both training sets), a one-shot build over the union is the
    // exact same artifact — codes included
    val oneShot = java.nio.file.Files.createTempDirectory("ivfpq_one").resolve("idx").toString
    IvfIndex.build(e, oneShot, dim = 64, nCells = 16, iters = 2)
    // cell quantizer trained on base ≠ full-corpus Lloyd in general —
    // so compare SERVED results against the incremental index's own
    // contents rather than across quantizers: every appended vector is
    // findable at exhaustive budgets
    val q = queries(Tables.embeddings(spark, dir01))
    val served = IvfIndex.topKPq(spark, inc, q, dim = 64, k = 5,
      nProbe = 16, coarseK = 1000000)
    assert(resultSet(served) == resultSet(Similarity.bruteForceTopK(e, q, k = 5)),
      "appended vectors must be exactly searchable at exhaustive budgets")
    // rebuild heals drift in BOTH tiers: the new generation equals a
    // fresh full-corpus build + buildPq bit-for-bit
    val gen1 = IvfIndex.rebuild(spark, inc,
      java.nio.file.Files.createTempDirectory("ivfpq_gen1").resolve("idx").toString,
      dim = 64, nCells = 16, iters = 2)
    IvfIndex.buildPq(spark, oneShot, dim = 64, nSub = 4, nCents = 16)
    def codeRows(p: String) = spark.read.parquet(s"$p/pq_codes")
      .select(col("vec_id"), col("codes").cast("string"), col("cell_id").cast("long"))
      .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    assert(codeRows(gen1) == codeRows(oneShot),
      "rebuilt PQ codes differ from a fresh build over the same corpus")
  }

  test("index append: no retraining, appended batch fully searchable") {
    import graft.similarity.IvfIndex
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val base = e.filter(col("vec_id") < 30)
    val batch = e.filter(col("vec_id") >= 30)
    val path = java.nio.file.Files.createTempDirectory("ivf_inc").resolve("idx").toString
    IvfIndex.build(base, path, dim = 64, nCells = 16, iters = 2)
    val centsBefore = spark.read.parquet(s"$path/centroids")
      .collect().map(_.toString).toSet
    IvfIndex.append(spark, path, batch, dim = 64)
    // maintenance contract: the quantizer never changes on append
    val centsAfter = spark.read.parquet(s"$path/centroids")
      .collect().map(_.toString).toSet
    assert(centsAfter == centsBefore, "append must not retrain the quantizer")
    // the whole corpus is searchable, identically to an in-memory
    // search over ALL vectors with the BASE-trained centroids
    val q = queries(Tables.embeddings(spark, dir01))
    val fromIndex = IvfIndex.topK(spark, path, q, dim = 64, k = 5, nProbe = 4)
    val inMemory = Similarity.ivfTopK(e, q, dim = 64, k = 5,
      nCells = 16, nProbe = 4,
      centroids = Some(Similarity.lloydCentroidsExact(base, nCells = 16, iters = 2)))
    assert(resultSet(fromIndex) == resultSet(inMemory))
    // appended ids actually surface in results (the batch is reachable)
    assert(fromIndex.filter(col("vec_id") >= 30).count() > 0,
      "appended vectors never retrieved")
  }

  test("rebuild heals append drift: new generation bit-identical to a fresh full build") {
    import graft.similarity.IvfIndex
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val base = e.filter(col("vec_id") < 30)
    val root = java.nio.file.Files.createTempDirectory("ivf_reb").toString
    val gen0 = s"$root/gen0"
    IvfIndex.build(base, gen0, dim = 64, nCells = 16, iters = 2)
    IvfIndex.append(spark, gen0, e.filter(col("vec_id") >= 30), dim = 64)
    // rebuild retrains on gen0's OWN cells — no source re-read — and
    // publishes a new generation; gen0 is untouched (pointer-swap
    // discipline: a reader mid-scan on gen0 can't be disturbed)
    val gen0Cells = spark.read.parquet(s"$gen0/cells")
      .collect().map(_.toString).toSet
    val gen1 = IvfIndex.rebuild(spark, gen0, s"$root/gen1", dim = 64,
      nCells = 16, iters = 2)
    assert(spark.read.parquet(s"$gen0/cells").collect().map(_.toString).toSet
      == gen0Cells, "rebuild must not touch the old generation")
    // the healed generation equals a fresh build over the same corpus
    val fresh = s"$root/fresh"
    IvfIndex.build(e, fresh, dim = 64, nCells = 16, iters = 2)
    def snap(p: String, sub: String) =
      spark.read.parquet(s"$p/$sub").collect().map(_.toString).toSet
    assert(snap(gen1, "centroids") == snap(fresh, "centroids"),
      "rebuilt quantizer differs from a fresh full-corpus train")
    assert(snap(gen1, "cells") == snap(fresh, "cells"),
      "rebuilt assignment differs from a fresh full-corpus build")
    // in-place rebuild is refused (no atomic two-dir swap exists)
    intercept[IllegalArgumentException] {
      IvfIndex.rebuild(spark, gen1, gen1, dim = 64)
    }
    ()
  }

  test("txn-safe index: torn append invisible, manifest is the commit point, pruning retained") {
    import graft.similarity.IvfIndex
    import graft.sources.TxnLog
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val base = e.filter(col("vec_id") < 30)
    val batch = e.filter(col("vec_id") >= 30)
    val path = java.nio.file.Files.createTempDirectory("ivf_txn").resolve("idx").toString
    IvfIndex.build(base, path, dim = 64, nCells = 16, iters = 2, txnSafe = true)
    val q = queries(Tables.embeddings(spark, dir01))
    def serve() = resultSet(
      IvfIndex.topK(spark, path, q, dim = 64, k = 5, nProbe = 4, txnSafe = true))
    val before = serve()
    // the storage commit protocol must not change a result bit
    val plainPath = java.nio.file.Files.createTempDirectory("ivf_plain").resolve("idx").toString
    IvfIndex.build(base, plainPath, dim = 64, nCells = 16, iters = 2)
    assert(before == resultSet(
      IvfIndex.topK(spark, plainPath, q, dim = 64, k = 5, nProbe = 4)))
    // The torn state an S3-style lister can observe mid-append: the
    // batch's data FILES exist, its manifest does not (TxnLog.commit
    // writes data before tryPublish — this is also exactly a crashed
    // writer). Stage it with an orphan data dir of valid cell rows:
    // the log names no such dir, so a reader must not see a row of it.
    TxnLog.read(spark, s"$path/cells").limit(5)
      .write.partitionBy("cell_id")
      .parquet(s"$path/cells/data/${java.util.UUID.randomUUID}")
    assert(serve() == before, "reader saw an unmanifested (torn/orphan) append")
    val preVersion = TxnLog.latestVersion(spark, s"$path/cells")
    IvfIndex.append(spark, path, batch, dim = 64, txnSafe = true)
    // append committed: the batch is fully reachable...
    assert(serve().exists(_._2 >= 30), "appended vectors never retrieved")
    // ...while a reader pinned to the pre-append version still serves
    // exactly the pre-append snapshot (never a torn one)
    val preCells = TxnLog.read(spark, s"$path/cells", asOf = Some(preVersion))
    assert(preCells.agg(max(col("vec_id"))).head.getLong(0) < 30)
    // directory-level cell pruning survives the txn-logged layout
    val one = q.filter(col("q_id") === 0)
    val pruned = IvfIndex.topK(spark, path, one, dim = 64, k = 5,
      nProbe = 4, txnSafe = true)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*cell_id[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.isDefined, s"no cell_id partition filter on the txn cells scan:\n$plan")
  }

  test("streaming IVF maintenance: foreachBatchAppend equals one-shot build content; replays no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.similarity.IvfIndex
    import graft.sources.TxnLog
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf_stream")
      .resolve("idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivf_stream_ckpt").toString
    // bootstrap on the first half (quantizer trains here), stream the rest
    IvfIndex.build(e.filter(col("vec_id") < 300), path, dim = 64, txnSafe = true)
    val rest = e.filter(col("vec_id") >= 300)
      .as[(Long, Seq[Float])].collect().toSeq
    val (b0, b1) = rest.splitAt(rest.size / 2)
    val in = MemoryStream[(Long, Seq[Float])]
    val q = in.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(IvfIndex.foreachBatchAppend(path, dim = 64))
      .start()
    try {
      in.addData(b0: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    // streamed index holds exactly the full corpus's assignments —
    // same rows as batch-appending everything in one shot
    val cells = TxnLog.read(spark, s"$path/cells")
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    assert(cells.size == e.count())
    // appended vectors are searchable where the quantizer probes
    val queries = e.filter(col("vec_id") >= 300).limit(3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    assert(IvfIndex.topK(spark, path, queries, dim = 64, k = 3,
      nProbe = 16, txnSafe = true).groupBy("q_id").count()
      .collect().forall(_.getLong(1) == 3))
    // checkpoint-recovery replay of the last batch is a no-op
    val vBefore = TxnLog.latestVersion(spark, s"$path/cells")
    IvfIndex.foreachBatchAppend(path, 64)(
      b1.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")), 1L)
    assert(TxnLog.latestVersion(spark, s"$path/cells") == vBefore)
    // and txnId without txnSafe is refused loudly
    intercept[IllegalArgumentException] {
      IvfIndex.append(spark, path, e.limit(1), dim = 64,
        txnSafe = false, txnId = Some("x"))
    }
    ()
  }

  test("IvfIndex.delete: erased vectors vanish from probes; survivors' assignments untouched; layout keeps pruning") {
    import graft.similarity.IvfIndex
    import graft.sources.TxnLog
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf_del")
      .resolve("idx").toString
    IvfIndex.build(e, path, dim = 64, txnSafe = true)
    val before = TxnLog.read(spark, s"$path/cells")
      .select("vec_id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](r.fieldIndex("cell_id")).longValue).toMap
    val victims = before.keys.filter(_ % 5 == 2).toSeq
    IvfIndex.delete(spark, path, victims, Some("rtbf-ivf"))
    // bit-identical to the original minus the victims' rows
    val after = TxnLog.read(spark, s"$path/cells")
      .select("vec_id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](r.fieldIndex("cell_id")).longValue).toMap
    assert(after == before -- victims)
    // a probe can never return an erased id
    val q = queries(Tables.embeddings(spark, dir01))
    val served = IvfIndex.topK(spark, path, q, dim = 64, k = 5,
      nProbe = 16, txnSafe = true)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(served.intersect(victims.toSet).isEmpty)
    // the copy-on-write rewrite preserved the cell_id partition
    // layout, so the cells scan still prunes (a mixed flat dir would
    // fail or lose the partition column)
    assert(TxnLog.read(spark, s"$path/cells").columns.contains("cell_id"))
    // replayed erasure is a no-op
    val v = TxnLog.latestVersion(spark, s"$path/cells")
    IvfIndex.delete(spark, path, victims, Some("rtbf-ivf"))
    assert(TxnLog.latestVersion(spark, s"$path/cells") == v)
  }

  test("rebuildAdvice: a skewed append flips the verdict to hot-cell rebuild") {
    import graft.similarity.IvfIndex
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf_adv").resolve("idx").toString
    IvfIndex.build(e, path, dim = 64, nCells = 16, iters = 2)
    // pin the hot-cell threshold just above the base imbalance so the
    // flip is about the APPEND, not about the base distribution
    // (maxEmptyCells = 16 neutralizes the empty-cell arm for the same
    // reason); sanity-check the base isn't already degenerate
    val baseImb = IvfIndex.rebuildAdvice(spark, path, maxEmptyCells = 16)
      .head.getAs[Long]("imbalance_bps")
    assert(baseImb < 100000, s"base index degenerately skewed: $baseImb bps")
    val thresh = baseImb + 1000
    val ok = IvfIndex.rebuildAdvice(spark, path,
      maxImbalanceBps = thresh, maxEmptyCells = 16).head
    assert(ok.getAs[Int]("rebuild") == 0)
    assert(ok.getAs[String]("reason") == "balanced")
    assert(ok.getAs[Long]("n_cells") == 16)
    // skewed batch: 2x the corpus, every vector a copy of one existing
    // embedding — all land in ONE cell (shared assignment expression),
    // the drift signature append's no-retrain trade accepts until rebuild
    val emb = e.orderBy("vec_id").limit(1).select("embedding").head.getSeq[Float](0)
    val n = e.count()
    val skew = spark.range(2 * n).select((col("id") + 10000000L).as("vec_id"),
      typedlit(emb).as("embedding"))
    IvfIndex.append(spark, path, skew, dim = 64)
    val bad = IvfIndex.rebuildAdvice(spark, path,
      maxImbalanceBps = thresh, maxEmptyCells = 16).head
    assert(bad.getAs[Int]("rebuild") == 1, bad.toString)
    assert(bad.getAs[String]("reason") == "hot-cell")
    assert(bad.getAs[Long]("total_vectors") == 3 * n)
    // maintain closes the loop: the flagged index rebuilds into a new
    // generation whose own advice reads balanced again (the cadence
    // no-op law) — drift healed by retraining on the index's contents
    val gen1Dir = java.nio.file.Files.createTempDirectory("ivf_adv_g1")
      .resolve("idx").toString
    val gen1 = IvfIndex.maintain(spark, path, gen1Dir, dim = 64,
      maxImbalanceBps = thresh, maxEmptyCells = 16)
    assert(gen1.contains(gen1Dir), s"flagged index must rebuild: $gen1")
    // the 2n identical vectors are DATA skew — no retrain can split
    // one point across cells — so the no-op law is advisory: at a
    // threshold above gen1's own measured imbalance, the cadence run
    // does nothing and mints no generation
    val gen1Imb = IvfIndex.rebuildAdvice(spark, gen1Dir, maxEmptyCells = 16)
      .head.getAs[Long]("imbalance_bps")
    assert(IvfIndex.maintain(spark, gen1Dir, gen1Dir + "_never", dim = 64,
      maxImbalanceBps = gen1Imb + 1000, maxEmptyCells = 16).isEmpty,
      "an index under its thresholds must be the maintenance no-op")
    // content carried: every vector (base + skew batch) searchable
    assert(spark.read.parquet(s"$gen1Dir/cells").count() == 3 * n)
  }

  test("l2Normalize produces unit vectors; zero vectors pass through") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.l2Normalize(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Double](2))).toMap
    assert(out(1L)._1 == 5.0)
    assert(out(1L)._2 == Seq(0.6, 0.8))
    assert(out(2L) == ((0.0, Seq(0.0, 0.0))))
  }

  test("int8 quantization: bounded error, range, zero-vector handling") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),   // zero vector
      (3L, Array(127.0f, -127.0f, 63.5f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Int](2), r.getDouble(3))).toMap
    // q in [-127, 127]; reconstruction error bounded by scale/2
    out.values.foreach { case (scale, q, err) =>
      assert(q.forall(v => v >= -127 && v <= 127))
      assert(err <= scale / 2 + 1e-12, s"err $err > scale/2 ${scale / 2}")
    }
    assert(out(1L)._2 == Seq(127, -64, 32, 0))
    assert(out(2L) == ((0.0, Seq(0, 0, 0, 0), 0.0)))
    assert(out(3L)._2.head == 127 && out(3L)._2(1) == -127)
  }

  test("sampled k-means training keeps recall@5: nProbe sweep vs brute force") {
    // This corpus is isotropic (max pairwise cosine ~0.5 — no true near
    // neighbors), which is IVF's documented worst regime: recall tracks
    // the probed fraction. The claims that must hold regardless of
    // regime: recall is monotone in nProbe, probing every cell is
    // exact, and training the quantizer on a hash SAMPLE (the 100 TB
    // recipe) costs almost nothing vs training on the full corpus.
    val e = Tables.embeddings(spark, dir1).select("vec_id", "embedding")
    val q = queries(Tables.embeddings(spark, dir1))
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(e, q, 5))
    def recallSweep(pct: Int): Seq[(Int, Double)] = {
      val cents = Similarity.kmeansCentroids(e, nCells = 8, trainSamplePct = pct)
      Seq(1, 2, 4, 8).map { nProbe =>
        val ivf = pairs(Similarity.ivfTopK(e, q, dim = 64, k = 5,
          nCells = 8, nProbe = nProbe, centroids = Some(cents)))
        nProbe -> (ivf & brute).size.toDouble / brute.size
      }
    }
    val sampled = recallSweep(50) // 50% deterministic hash sample
    val full = recallSweep(100)
    System.err.println(s"[graft] IVF recall@5 sweep: sampled=$sampled full=$full")
    // probe sets nest, so recall is monotone in nProbe
    sampled.sliding(2).foreach { case Seq((_, lo), (_, hi)) => assert(lo <= hi + 1e-9)
                                 case _ => () }
    // probing all cells is brute force
    assert(sampled.toMap.apply(8) == 1.0)
    assert(sampled.toMap.apply(4) >= 0.7, s"sampled recall@4: $sampled")
    // sampling the training set costs at most 0.1 recall vs full training
    val delta = full.toMap.apply(4) - sampled.toMap.apply(4)
    assert(delta <= 0.1, s"sampled training lost $delta recall at nProbe=4")
  }

  test("lloydCentroidsExact: deterministic under repartitioning, reduces " +
       "quantization error, keeps ivfTopK recall at full probe") {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    def centroidMap(df: DataFrame): Map[Long, Seq[Float]] =
      df.select("cell_id", "c_emb").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // exact arithmetic ⇒ partitioning CANNOT change the result
    // (this is the property ML KMeans float sums lack)
    val c1 = centroidMap(Similarity.lloydCentroidsExact(e, nCells = 8, iters = 2))
    val c2 = centroidMap(Similarity.lloydCentroidsExact(
      e.repartition(7), nCells = 8, iters = 2))
    assert(c1 == c2, "centroids changed under repartitioning")
    // Lloyd iterations monotonically reduce within-cell SSE vs the
    // raw first-k init (measured in the same micro-unit metric)
    def sse(cents: DataFrame): Double = {
      val micro = e.select(col("vec_id"),
        transform(col("embedding"),
          v => round(v.cast("double") * 1e6).cast("long")).as("fv"))
      val cm = cents.select(col("cell_id"),
        transform(col("c_emb"),
          v => round(v.cast("double") * 1e6).cast("long")).as("cv"))
      micro.crossJoin(broadcast(cm))
        .select(aggregate(zip_with(col("fv"), col("cv"),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x).as("d"),
          col("vec_id"))
        .groupBy("vec_id").agg(min(col("d")).as("d"))
        .agg(sum(col("d"))).head().getLong(0).toDouble
    }
    val init = Similarity.lloydCentroidsExact(e, nCells = 8, iters = 0)
    val trained = Similarity.lloydCentroidsExact(e, nCells = 8, iters = 2)
    assert(sse(trained) <= sse(init), "training increased quantization error")
    // full-probe IVF over trained centroids is still exact top-k
    val q = queries(Tables.embeddings(spark, dir01))
    val brute = Similarity.bruteForceTopK(e, q, 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, q, dim = 64, k = 5, nCells = 8, nProbe = 8,
        centroids = Some(trained))
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == brute, "full probe over trained centroids must be exact")
  }

  test("kmeansParallelInit: deterministic under repartitioning; D²-seeding beats the first-k init; composes with ivfTopK at full probe") {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    def centsMap(df: DataFrame): Map[Long, Seq[Long]] =
      df.select("cell_id", "cv").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // exact integer arithmetic + md5 sampling ⇒ the run replays
    // identically whatever the partitioning (the property a
    // RNG-seeded sampler cannot give across engines)
    val k1 = centsMap(Similarity.kmeansParallelInit(e, nCells = 8))
    val k2 = centsMap(Similarity.kmeansParallelInit(e.repartition(7), nCells = 8))
    assert(k1 == k2, "k-means|| changed under repartitioning")
    assert(k1.size == 8 && k1.keySet.size == 8)
    def sse(cents: DataFrame): BigInt = {
      val micro = e.select(col("vec_id"),
        transform(col("embedding"),
          v => round(v.cast("double") * 1e6).cast("long")).as("fv"))
      val cm = cents.select(col("cell_id"),
        transform(col("c_emb"),
          v => round(v.cast("double") * 1e6).cast("long")).as("cv"))
      BigInt(micro.crossJoin(broadcast(cm))
        .select(aggregate(zip_with(col("fv"), col("cv"),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x).as("d"),
          col("vec_id"))
        .groupBy("vec_id").agg(min(col("d")).as("d"))
        .agg(sum(col("d")).cast("decimal(38,0)")).head().getDecimal(0).toBigInteger)
    }
    // the POINT of D²-weighted seeding: a better starting potential
    // than "the first k vectors" for the same (zero) Lloyd budget
    val naive = Similarity.lloydCentroidsExact(e, nCells = 8, iters = 0)
    val kpp = Similarity.kmeansParallelInit(e, nCells = 8, lloydIters = 0)
    assert(sse(kpp) < sse(naive),
      s"k-means|| init (${sse(kpp)}) must beat the first-k init (${sse(naive)})")
    // and the weighted recluster only improves it
    val kppTrained = Similarity.kmeansParallelInit(e, nCells = 8, lloydIters = 2)
    assert(sse(kppTrained) <= sse(kpp), "weighted recluster increased the potential")
    // serving contract: the returned frame feeds ivfTopK, and at full
    // probe the centroids cannot change the answer
    val q = queries(Tables.embeddings(spark, dir01))
    val brute = Similarity.bruteForceTopK(e, q, 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, q, dim = 64, k = 5, nCells = 8, nProbe = 8,
        centroids = Some(kppTrained.select("cell_id", "c_emb", "c_norm")))
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == brute, "full probe over k-means|| centroids must be exact")
  }

  test("IvfIndex.build(init = kmeanspp): exhaustive probing stays exact; the seeded quantizer starts no worse than first-k") {
    import graft.similarity.IvfIndex
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val q = queries(Tables.embeddings(spark, dir01))
    val path = java.nio.file.Files.createTempDirectory("ivf_kpp").resolve("idx").toString
    IvfIndex.build(e, path, dim = 64, nCells = 8, iters = 2, init = "kmeanspp")
    assert(new java.io.File(path, "_SUCCESS").exists())
    // whatever the init, full probing is exact — the serving law
    val brute = Similarity.bruteForceTopK(e, q, 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = IvfIndex.topK(spark, path, q, dim = 64, k = 5, nProbe = 8)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute, "full probe over a kmeanspp-built index must be exact")
    // an unknown init refuses loudly
    val bad = intercept[IllegalArgumentException] {
      IvfIndex.build(e, path + "2", dim = 64, nCells = 8, init = "random")
    }
    assert(bad.getMessage.contains("kmeanspp"), bad.getMessage)
  }

  test("rqTopK: exhaustive rerank equals brute force; production budget clears the recall floor; residuals shrink quantization error") {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val q = queries(Tables.embeddings(spark, dir01))
    val n = e.count().toInt
    // coarseK covering every candidate: the rerank sees all pairs, so
    // whatever the codes did, the answer is exactly brute force
    val brute = Similarity.bruteForceTopK(e, q, 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exhaust = Similarity.rqTopK(e, q, k = 5, coarseK = n)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exhaust == brute, "exhaustive-rerank RQ must be exact")
    // production budget: recall@5 over the coarse-20 rerank
    val prod = Similarity.rqTopK(e, q, k = 5, coarseK = 20)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (prod & brute).size.toDouble / brute.size
    // the IVF-PQ floor: first-k codebooks are the deterministic-
    // oracle trade, not the recall-optimal one (k-means|| init is the
    // quality path)
    assert(recall >= 0.5, s"RQ production recall@5 = $recall")
    // the SECOND codebook earns its bytes: adding the residual stage
    // must not worsen — and should improve — coarse-stage recall vs
    // stage-1 alone (nC2 = 1 degenerates to one shared residual)
    val oneStage = Similarity.rqTopK(e, q, k = 5, nC2 = 1, coarseK = 20)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall1 = (oneStage & brute).size.toDouble / brute.size
    assert(recall >= recall1 - 0.04,
      s"two-stage recall $recall collapsed vs one-stage $recall1")
  }

  test("pc1Scores: closed-form axis fixture, repartition determinism, sign-consistent ordering") {
    import spark.implicits._
    // points on axis 0 at t ∈ {-2,-1,0,1,2} (plus a tiny orthogonal
    // wiggle on axis 1 that must NOT win): PC1 is axis 0 and the
    // centered score is exactly t micro-units
    def emb(t: Float, w: Float): Array[Float] =
      Array.tabulate(64)(i => if (i == 0) t else if (i == 1) w else 0.0f)
    val pts = Seq(
      (0L, emb(-2f, 0.01f)), (1L, emb(-1f, -0.01f)), (2L, emb(0f, 0.01f)),
      (3L, emb(1f, -0.01f)), (4L, emb(2f, 0.01f))).toDF("vec_id", "embedding")
    val got = Similarity.pc1Scores(pts, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // scores are the axis-0 offsets from the mean (0), up to the
    // fixed-point unit and a possible global sign flip
    val expected = Map(0L -> -2000000L, 1L -> -1000000L, 2L -> 0L,
      3L -> 1000000L, 4L -> 2000000L)
    val sign = if (got(4L) < 0) -1L else 1L
    expected.foreach { case (id, v) =>
      assert(math.abs(got(id) - sign * v) <= 2L,
        s"vec $id: got ${got(id)}, want ~${sign * v}")
    }
    // exact arithmetic ⇒ identical under repartitioning
    val got2 = Similarity.pc1Scores(pts.repartition(3), iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == got2, "pc1Scores changed under repartitioning")
    // real corpus: deterministic and full-rank output
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val c1 = Similarity.pc1Scores(e).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c2 = Similarity.pc1Scores(e.repartition(5)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c1 == c2)
    assert(c1.size == e.count())
  }

  test("binarize packs sign bits exactly; hammingTopK ranks by true Hamming") {
    import spark.implicits._
    // a vector with known signs: dims 0 and 33 positive, rest negative
    val emb = Array.tabulate(64)(i => if (i == 0 || i == 33) 1.0f else -1.0f)
    val code = Similarity.binarize(Seq((7L, emb)).toDF("vec_id", "embedding")).head()
    // fold is acc*2+bit, so dim 0 is the HIGHEST bit of code0 (bit 31)
    assert(code.getLong(1) == (1L << 31), s"code0=${code.getLong(1)}")
    assert(code.getLong(2) == (1L << 30), s"code1=${code.getLong(2)}")

    // hammingTopK must agree with Hamming computed on collected codes
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val codes = Similarity.binarize(e)
    val q = codes.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("code0").as("q0"), col("code1").as("q1"))
    val got = Similarity.hammingTopK(codes, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val all = codes.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = all.filter(_._1 < 10).flatMap { case (qid, q0, q1) =>
      all.filter(_._1 != qid)
        .map { case (id, c0, c1) =>
          (qid, id, java.lang.Long.bitCount(c0 ^ q0) + java.lang.Long.bitCount(c1 ^ q1)) }
        .sortBy { case (_, id, h) => (h, id) }.take(5)
    }.toSeq
    assert(got.sorted == expected.sorted)

    // sanity: binary codes keep meaningful recall vs float cosine top-5
    val brute = Similarity.bruteForceTopK(e, queries(Tables.embeddings(spark, dir01)), k = 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hamm = got.map { case (a, b, _) => (a, b) }.toSet
    val recall = (hamm & brute).size.toDouble / brute.size
    System.err.println(s"[graft] hamming recall@5 vs cosine: $recall")
    // well above the random baseline of k/(n-1) ~= 0.05; sign bits are
    // a recall-stage, not a ranking replacement
    assert(recall >= 0.15, s"sign-bit recall collapsed: $recall")
  }

  test("poolEmbeddings: element-wise sums, mergeable across splits") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(10.0f, 20.0f, 30.0f)),
      (1L, Array(100.0f, 200.0f, 300.0f)), (2L, Array(5.0f, 5.0f, 5.0f)))
      .toDF("grp", "embedding")
    val pooled = Similarity.poolEmbeddings(vecs, "grp").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Double](2)))).toMap
    assert(pooled(1L) == ((3L, Seq(111.0, 222.0, 333.0))))
    assert(pooled(2L) == ((1L, Seq(5.0, 5.0, 5.0))))
    // mergeable: pools of disjoint splits add element-wise to the full pool
    val half1 = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(10.0f, 20.0f, 30.0f)))
      .toDF("grp", "embedding")
    val half2 = Seq((1L, Array(100.0f, 200.0f, 300.0f))).toDF("grp", "embedding")
    val a = Similarity.poolEmbeddings(half1, "grp").head().getSeq[Double](2)
    val b = Similarity.poolEmbeddings(half2, "grp").head().getSeq[Double](2)
    assert(a.zip(b).map { case (x, y) => x + y } == pooled(1L)._2)
  }

  test("multi-probe LSH recall dominates single-probe at the same table cost") {
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val q = queries(Tables.embeddings(spark, dir01))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(e, q, k = 5))
    val single = pairs(Similarity.lshTopK(e, q, dim = 64, k = 5))
    val multi = pairs(Similarity.lshMultiProbeTopK(e, q, dim = 64, k = 5, extraProbes = 2))
    val rSingle = (single & brute).size.toDouble / brute.size
    val rMulti = (multi & brute).size.toDouble / brute.size
    System.err.println(s"[graft] lsh recall@5: single=$rSingle multi-probe=$rMulti")
    // probing 3 buckets only adds candidates, and a true-top-5 hit can
    // only be evicted by a better candidate — itself a true-top-5 hit —
    // so recall is monotone by construction
    assert(rMulti >= rSingle, s"multi-probe lost recall: $rMulti < $rSingle")
    assert((single & brute).subsetOf(multi & brute),
      "multi-probe dropped a true hit the single probe had")
    // and on this corpus the extra probes must actually surface new
    // true neighbors, or the margin flips are dead code
    assert(rMulti > rSingle, s"multi-probe added nothing: single=$rSingle multi=$rMulti")
  }

  test("binarize generalizes past 64 dims and fails loudly on a dim mismatch") {
    import spark.implicits._
    // 80 dims → 3 words: 32 + 32 + 16 bits; dims 0, 40, 79 positive
    val emb = Array.tabulate(80)(i => if (i == 0 || i == 40 || i == 79) 1.0f else -1.0f)
    val df = Seq((1L, emb)).toDF("vec_id", "embedding")
    val code = Similarity.binarize(df, dim = 80).head()
    assert(code.getLong(1) == (1L << 31), s"code0=${code.getLong(1)}") // dim 0 → top bit of word 0
    assert(code.getLong(2) == (1L << 23), s"code1=${code.getLong(2)}") // dim 40 → bit 8 of 32
    assert(code.getLong(3) == 1L, s"code2=${code.getLong(3)}")         // dim 79 → last bit of 16-wide word
    // hammingTopK picks up all three words from the schema
    val codes = Similarity.binarize(Seq(
      (1L, Array.fill(80)(1.0f)), (2L, Array.fill(80)(-1.0f)),
      (3L, Array.tabulate(80)(i => if (i < 40) 1.0f else -1.0f))).toDF("vec_id", "embedding"),
      dim = 80)
    val q = codes.filter(col("vec_id") === 1L).select(col("vec_id").as("q_id"),
      col("code0").as("q0"), col("code1").as("q1"), col("code2").as("q2"))
    val got = Similarity.hammingTopK(codes, q, k = 2).collect()
      .map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(got == Map(2L -> 80, 3L -> 40), s"got $got")
    // a 64-dim row under dim=80 must raise, not truncate or fold short
    val bad = Seq((9L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] { Similarity.binarize(bad, dim = 80).collect() }
    assert(e.getMessage != null)
  }

  test("diversitySample keeps <= perBucket per bucket, covers every bucket, deterministic") {
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val out = Similarity.diversitySample(e, dim = 64, perBucket = 2, nPlanes = 4)
    // strictly a subset of the input rows, unmodified
    assert(out.select("vec_id", "embedding").exceptAll(e).isEmpty)
    // per-bucket cap honored, ranks dense from 1
    val byBucket = out.groupBy("bucket")
      .agg(count(lit(1)).as("n"), max("bucket_rank").as("mx"), min("bucket_rank").as("mn"))
    assert(byBucket.filter(col("n") > 2 || col("mx") =!= col("n") || col("mn") =!= 1).isEmpty)
    // every non-empty bucket of the input is represented
    val allBuckets = e.select(Similarity.lshBucket(col("embedding"), 64, 4).as("bucket"))
      .distinct()
    assert(out.select("bucket").distinct().count() == allBuckets.count())
    // kept rows sit in their own bucket
    val mismatch = out.filter(
      Similarity.lshBucket(col("embedding"), 64, 4) =!= col("bucket"))
    assert(mismatch.isEmpty)
    // deterministic across runs
    val again = Similarity.diversitySample(e, dim = 64, perBucket = 2, nPlanes = 4)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("randomProject matches an independent driver-side reimplementation") {
    import spark.implicits._
    // crafted vectors incl. negatives, exact halves (rounding edges),
    // and a zero vector
    val vecs = Seq(
      1L -> Array.tabulate(64)(i => (i - 32) / 7.0f),
      2L -> Array.tabulate(64)(i => if (i % 2 == 0) 0.0000005f else -1.5f),
      3L -> Array.fill(64)(0.0f))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.randomProject(df, dim = 64, outDim = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // independent replay: same planes, BigDecimal HALF_UP micro round
    for ((id, emb) <- vecs; p <- 0 until 4) {
      val signs = Similarity.planeVector(100 + p, 64)
      val expected = (0 until 64).map { i =>
        val micro = BigDecimal(emb(i).toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        micro * (if (signs(i) > 0) 1L else -1L)
      }.sum
      assert(got((id, p)) == expected, s"vec $id plane $p")
    }
    // plane count and shape: outDim rows per vector
    assert(got.size == vecs.size * 4)
  }

  test("randomProject on the corpus: no shuffle, projections discriminate") {
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val out = Similarity.randomProject(e, dim = 64, outDim = 8)
    // pure map-side projection: no exchange anywhere in the plan
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    // sanity: distinct projections exist (planes actually discriminate)
    assert(out.select("proj_micro").distinct().count() > e.count() / 2)
  }

  test("projectedRerankTopK: exhaustive coarseK equals brute force; narrow shuffles only") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val q = queries(Tables.embeddings(spark, dir01))
    val exact = resultSet(Similarity.bruteForceTopK(e, q, k = 5))
    // coarseK >= corpus: the coarse pass prunes nothing, so the fine
    // stage must reproduce brute force bit-for-bit
    val full = Similarity.projectedRerankTopK(e, q,
      dim = 64, outDim = 8, coarseK = 1000000, k = 5)
    assert(resultSet(full) == exact)
    // pruned run: recall is DETERMINISTIC (md5 planes, fixed data) —
    // measured 0.74 on this corpus of near-orthogonal noise vectors,
    // the JL worst case; pin a floor under it
    val pruned = Similarity.projectedRerankTopK(e, q,
      dim = 64, outDim = 32, coarseK = 100, k = 5)
    val got = resultSet(pruned).map(t => (t._1, t._2))
    val want = exact.map(t => (t._1, t._2))
    val recall = (got intersect want).size.toDouble / want.size
    assert(recall >= 0.7, s"recall@5 $recall")
    // embeddings never cross a SHUFFLE exchange (broadcasts are fine —
    // that is the point of the survivor/query broadcast design)
    pruned.collect()
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec => nodes(s.plan)
      case o => o.children.flatMap(nodes)
    })
    // keyed (hash/range) exchanges only: the round-robin input
    // re-split (Parallelism.ensure) legitimately carries the vectors
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
    val shuffled = nodes(pruned.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeExec
          if s.outputPartitioning.isInstanceOf[HashPartitioning] ||
            s.outputPartitioning.isInstanceOf[RangePartitioning] =>
        s.output.map(_.name)
    }.flatten
    assert(!shuffled.exists(n => n == "embedding" || n == "q_emb"),
      s"embeddings crossed a keyed shuffle: $shuffled")
  }

  test("semanticDedup keeps reps, drops only >= tau members, covers all rows") {
    val e = Tables.embeddings(spark, dir01).select("vec_id", "embedding")
    val tau = 0.2
    val out = Similarity.semanticDedup(e, dim = 64, tau = tau, nPlanes = 4)
    assert(out.count() == e.count(), "every input row must be annotated")
    // every representative keeps itself
    assert(out.filter(col("vec_id") === col("rep_id") && !col("keep")).isEmpty)
    // drops are exactly the non-rep members at cos >= tau
    assert(out.filter(!col("keep") &&
      (col("cos") < tau || col("vec_id") === col("rep_id"))).isEmpty)
    assert(out.filter(col("keep") && col("vec_id") =!= col("rep_id") &&
      col("cos") >= tau).isEmpty)
    // the rep of each bucket is its member with the highest norm
    val withNorm = e.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 64, 4).as("bucket"),
      Similarity.norm(col("embedding")).as("nrm"))
    val best = withNorm.groupBy("bucket").agg(max("nrm").as("mx"))
    val reps = out.filter(col("vec_id") === col("rep_id"))
      .select("bucket", "rep_id").distinct()
      .join(withNorm.withColumnRenamed("vec_id", "rep_id"), Seq("bucket", "rep_id"))
      .join(best, "bucket")
    assert(reps.filter(col("nrm") =!= col("mx")).isEmpty)
  }

  test("mmrRerank trades relevance for diversity; pick 1 is the rel argmax") {
    import spark.implicits._
    // candidates for one query: two near-identical high-rel vectors
    // and one orthogonal mid-rel vector. Plain top-2 keeps the twins;
    // MMR must pick the orthogonal one second.
    val cand = Seq(
      (1L, 10L, 0.95, Array(1f, 0f, 0f, 0f)),
      (1L, 11L, 0.94, Array(1f, 0f, 0f, 0f)), // twin of 10
      (1L, 12L, 0.50, Array(0f, 1f, 0f, 0f))  // orthogonal
    ).toDF("q_id", "vec_id", "rel", "embedding")
    val out = Similarity.mmrRerank(cand, k = 3).collect()
      .map(r => r.getLong(2) -> r.getLong(1)).toMap
    // pick1 = rel argmax (10); pick2: 11 scores 0.94-1.0 < 12's 0.5-0.0
    assert(out == Map(1L -> 10L, 2L -> 12L, 3L -> 11L))
    // ties on the MMR key break by vec_id: two identical candidates
    val tie = Seq(
      (2L, 5L, 0.9, Array(1f, 0f, 0f, 0f)),
      (2L, 3L, 0.9, Array(1f, 0f, 0f, 0f))
    ).toDF("q_id", "vec_id", "rel", "embedding")
    val t = Similarity.mmrRerank(tie, k = 2).collect()
      .map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(t == Map(1L -> 3L, 2L -> 5L))
  }

  test("recallAtK: exact millionths, self-recall 1.0, missing queries report 0") {
    import spark.implicits._
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), // q1: 3 truth rows
                    (2L, 20L), (2L, 21L))            // q2: 2 truth rows
      .toDF("q_id", "vec_id")
    val approx = Seq((1L, 10L), (1L, 99L), (1L, 12L)) // q1: 2/3 hit; q2 absent
      .toDF("q_id", "vec_id")
    val out = Similarity.recallAtK(truth, approx).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(1L) == ((3L, 3L, 2L, 666666L))) // floor(2e6/3)
    assert(out(2L) == ((2L, 0L, 0L, 0L)))      // approx missed q2 entirely
    // an approx ranking equal to the truth is recall 1.0 everywhere
    val self = Similarity.recallAtK(truth, truth).collect()
    assert(self.forall(_.getLong(4) == 1000000L))
  }

  test("opqTopK: variance re-allocation lifts recall on a skewed corpus; the gate keeps balanced corpora bit-identical to PQ") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    def h(i: Long, j: Int): Double = {
      val x = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8")).take(4)
      java.nio.ByteBuffer.wrap(x).getInt.toDouble / Int.MaxValue
    }
    // all signal in the first 8 dims = the first PQ subspace hoards
    // the variance OPQ's allocation step exists to re-balance
    val skewed = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(j =>
        if (j < 8) h(i, j).toFloat else (0.002 * h(i, j)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    def queriesOf(c: DataFrame) = c.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def recallVsTruth(c: DataFrame, approx: DataFrame): Double = {
      val truth = Similarity.bruteForceTopK(c, queriesOf(c), k = 5)
        .select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val got = approx.select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }.sum / truth.size
    }
    val pqR = recallVsTruth(skewed, Similarity.pqTopK(skewed, queriesOf(skewed), dim = 64, k = 5))
    val opqR = recallVsTruth(skewed, Similarity.opqTopK(skewed, queriesOf(skewed), dim = 64, k = 5))
    assert(opqR > pqR,
      s"allocation should LIFT recall on the skewed corpus: pq=$pqR opq=$opqR")
    // balanced corpus (the real embeddings table): the skew gate keeps
    // the identity layout, so OPQ is bit-identical to plain PQ —
    // recall >= pq holds with equality by construction
    val real = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val q = queriesOf(real)
    val a = Similarity.pqTopK(real, q, dim = 64, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = Similarity.opqTopK(real, q, dim = 64, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b, "gate should keep a balanced corpus bit-identical to PQ")
  }

  test("buildPq(trainIters): the persisted index serves Lloyd-trained codebooks; recall beats the sample index at the same budget") {
    import spark.implicits._
    import graft.similarity.IvfIndex
    def h(i: Long, j: Int): Double = {
      val x = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8")).take(4)
      java.nio.ByteBuffer.wrap(x).getInt.toDouble / Int.MaxValue
    }
    val skewed = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(j =>
        if (j < 8) h(i, j).toFloat else (0.002 * h(i, j)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("ivfpq_tr")
    val sampleIdx = base.resolve("sample").toString
    val trainedIdx = base.resolve("trained").toString
    for (p <- Seq(sampleIdx, trainedIdx))
      IvfIndex.build(skewed, p, dim = 64, nCells = 4, iters = 2)
    IvfIndex.buildPq(spark, sampleIdx, dim = 64, nSub = 4, nCents = 16)
    IvfIndex.buildPq(spark, trainedIdx, dim = 64, nSub = 4, nCents = 16,
      trainIters = 2)
    // the persisted trained codebook IS pqTrainedCodebook's output
    val stored = spark.read.parquet(s"$trainedIdx/pq_codebook")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Long](2).toSeq)).toSet
    val direct = Similarity.pqTrainedCodebook(skewed, dim = 64, nSub = 4,
      nCents = 16, iters = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Long](2).toSeq)).toSet
    assert(stored == direct, "persisted codebook diverged from the trainer")
    // fair (out-of-codebook) queries; tiny coarseK so ADC order decides
    val q = skewed.filter(col("vec_id") >= 100 && col("vec_id") < 110)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def recallOf(p: String): Double = {
      val truth = Similarity.bruteForceTopK(skewed, q, k = 5)
        .select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (x, rs) => x -> rs.map(_.getLong(1)).toSet }
      val got = IvfIndex.topKPq(spark, p, q, dim = 64, k = 5,
        nProbe = 4, coarseK = 5).select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (x, rs) => x -> rs.map(_.getLong(1)).toSet }
      truth.map { case (x, t) =>
        got.getOrElse(x, Set.empty).intersect(t).size.toDouble / t.size }.sum / truth.size
    }
    val sR = recallOf(sampleIdx)
    val tR = recallOf(trainedIdx)
    System.err.println(s"[graft] indexed PQ recall: sample=$sR trained=$tR")
    assert(tR >= sR, s"trained index lost recall: sample=$sR trained=$tR")
  }

  test("pqTrainedTopK: Lloyd-trained codebooks beat the sample codebook on both fixtures; iters=0 ≡ pqTopK") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    def h(i: Long, j: Int): Double = {
      val x = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8")).take(4)
      java.nio.ByteBuffer.wrap(x).getInt.toDouble / Int.MaxValue
    }
    val skewed = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(j =>
        if (j < 8) h(i, j).toFloat else (0.002 * h(i, j)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    def queriesOf(c: DataFrame) = c.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def recallVsTruth(c: DataFrame, approx: DataFrame): Double = {
      val truth = Similarity.bruteForceTopK(c, queriesOf(c), k = 5)
        .select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val got = approx.select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }.sum / truth.size
    }
    val real = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    // FAIR queries live OUTSIDE the first-16 sample codebook: the
    // vec_id<10 oracle queries ARE sample-codebook centroids, which
    // hands the sample grid a free distance-0 code per query and
    // biases any recall comparison toward it (measured round 16:
    // biased 0.52 vs 0.38, unbiased 0.08 vs 0.20 on the same data)
    def fairQueries(c: DataFrame) = c.filter(col("vec_id") >= 100 && col("vec_id") < 110)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def recallFair(c: DataFrame, approx: DataFrame): Double = {
      val truth = Similarity.bruteForceTopK(c, fairQueries(c), k = 5)
        .select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val got = approx.select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }.sum / truth.size
    }
    // trained codebooks must not lose to the sample codebook on
    // EITHER fixture (round-15 lesson: permutations can't fix a
    // sample grid; training the grid is the principled lift)
    val measured = for ((fix, label) <- Seq((skewed, "skewed"), (real, "real"))) yield {
      val q = fairQueries(fix)
      assert(q.count() == 10, s"$label: fair-query band empty")
      val pqR = recallFair(fix, Similarity.pqTopK(fix, q, dim = 64, k = 5))
      val trR = recallFair(fix,
        Similarity.pqTrainedTopK(fix, q, dim = 64, k = 5, iters = 2))
      System.err.println(s"[graft] pq recall ($label): sample=$pqR trained=$trR")
      (label, pqR, trR)
    }
    measured.foreach { case (label, pqR, trR) =>
      assert(trR >= pqR, s"$label: training lost recall: sample=$pqR trained=$trR")
    }
    // training must reduce what it optimizes: total quantization error
    // (recall is the serving metric, MSE the trained one — assert both)
    val micro: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => transform(c, v => round(v.cast("double") * 1000000.0).cast("long"))
    def subR(df: DataFrame, idOut: String, svOut: String) =
      df.select(col("vec_id").as(idOut), micro(col("embedding")).as("__fv"))
        .select(col(idOut), posexplode(transform(sequence(lit(0), lit(3)),
          j => slice(col("__fv"), j * 16 + 1, lit(16)))).as(Seq("sub_id", svOut)))
    def sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)
    def mseOf(cb: DataFrame): Double =
      subR(skewed, "vec_id", "sv").join(broadcast(cb), "sub_id")
        .withColumn("d", sq(col("sv"), col("cv")))
        .groupBy(col("vec_id"), col("sub_id")).agg(min(col("d")).as("d"))
        .agg(avg(col("d"))).head.getDouble(0)
    val sampleCb = subR(skewed.orderBy(col("vec_id").asc).limit(16), "cent_id", "cv")
    val trainedCb = Similarity.pqTrainedCodebook(skewed, dim = 64, nSub = 4,
      nCents = 16, iters = 2)
    assert(mseOf(trainedCb) <= mseOf(sampleCb),
      s"training raised quantization error: ${mseOf(sampleCb)} -> ${mseOf(trainedCb)}")
    // iters=0 is the sample codebook by construction — bit-identical
    val q = queriesOf(real)
    val a = Similarity.pqTopK(real, q, dim = 64, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = Similarity.pqTrainedTopK(real, q, dim = 64, k = 5, iters = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b, "iters=0 should be bit-identical to pqTopK")
  }
}
