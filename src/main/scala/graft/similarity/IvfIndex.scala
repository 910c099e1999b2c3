package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED IVF index — the index-build-amortization shape every
  * production ANN deployment uses: train the quantizer and assign the
  * corpus ONCE, write the assignment CELL-PARTITIONED to storage, and
  * serve every query batch afterwards from partition-pruned scans.
  * [[Similarity.ivfTopK]] re-quantizes the corpus per call — correct
  * for ad-hoc search, wasteful for a query service; this is its
  * storage-backed twin.
  *
  * On disk: `<path>/centroids/` (nCells rows — the exact fixed-point
  * Lloyd centroids, [[Similarity.lloydCentroidsExact]], so the whole
  * index is oracle-replayable) and `<path>/cells/` partitioned by
  * `cell_id`, each row carrying (vec_id, embedding, c_norm2 — the
  * norm precomputed at build so query-time scoring is one dot
  * product). A root `_SUCCESS` marks the build complete (the
  * [[graft.sources.LayoutCache]] completeness contract when built
  * through it).
  *
  * Query-time scale shape: a batch probing p of C cells reads p/C of
  * the corpus — directory-level partition pruning, visible as
  * `PartitionFilters` on the scan (the static twin of fact_pruned's
  * dynamic pruning); the probed-query frame broadcasts; the only
  * exchange is the final narrow (q_id, vec_id, cos) rank. Assignment
  * at build and probing at query share ONE scoring expression
  * ([[Similarity.cellDistsLit]]), so results are IDENTICAL to
  * `ivfTopK(centroids = lloydCentroidsExact(...))` — the invariant
  * the spec pins and the oracle (shared with `sim_ivf_lloyd`)
  * hash-checks end-to-end. */
object IvfIndex {

  /** Train + assign + write. The returned path layout is stable: callers
    * cache it (content-keyed) and serve [[topK]] from it repeatedly.
    *
    * `txnSafe = true` routes the cells table through
    * [[graft.sources.TxnLog]] (`<path>/cells` becomes a manifest-logged
    * table, still Hive-partitioned by `cell_id` inside each version
    * dir) — see [[append]] for why. */
  def build(embeddings: DataFrame, path: String, dim: Int,
            nCells: Int = 16, iters: Int = 2,
            txnSafe: Boolean = false,
            init: String = "first-k"): Unit = {
    // init = "kmeanspp" seeds the Lloyd refinement with
    // [[Similarity.kmeansParallelInit]] (Bahmani k-means||) — the
    // production training path at corpus scale, where a first-k init
    // can start every centroid inside one dense region; both inits
    // are exact fixed point, so the index stays oracle-comparable
    require(init == "first-k" || init == "kmeanspp",
      s"IvfIndex.build: init must be 'first-k' or 'kmeanspp', got '$init'")
    val seed =
      if (init == "kmeanspp")
        Some(Similarity.kmeansParallelInit(embeddings, nCells)
          .select("cell_id", "cv"))
      else None
    val cents = Similarity.lloydCentroidsExact(embeddings, nCells, iters, seed)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    val centArr = readCentroids(embeddings.sparkSession, path, dim)
    val assigned = assignCells(embeddings, centArr)
    if (txnSafe)
      graft.sources.TxnLog.overwrite(assigned, s"$path/cells",
        partitionBy = Seq("cell_id"))
    else
      assigned.write.mode("overwrite").partitionBy("cell_id")
        .parquet(s"$path/cells")
    // the completion marker IS the commit point (LayoutCache contract)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_SUCCESS"), "")
    ()
  }

  /** Incremental maintenance: assign a NEW batch with the PERSISTED
    * quantizer — no retraining, so the centroid files never change and
    * the batch lands exactly where a query will probe for it; quantizer
    * drift is accepted until the next rebuild (the standard IVF
    * maintenance trade: assignment stays correct w.r.t. the stored
    * centroids, recall decays only as the data distribution drifts
    * from the training snapshot).
    *
    * Atomicity: with `txnSafe = false`, parquet append adds whole files
    * to the cell partitions, so on a filesystem with atomic directory
    * listings (HDFS, local) a reader whose listing predates the append
    * serves the pre-append snapshot — never a torn one. On an
    * S3-style object store there is no such listing snapshot: a
    * partitioned append commits per-file, and a concurrent lister can
    * see SOME of the batch's files. `txnSafe = true` closes that gap by
    * routing the cells table through [[graft.sources.TxnLog]] — the
    * manifest is the commit point, a reader resolves its snapshot from
    * the log and can never observe a half-published batch (spec:
    * a reader resolved mid-append serves exactly the pre-append
    * snapshot; the appended batch's data dir is invisible until its
    * manifest lands). Build and read must agree on the mode. */
  def append(spark: SparkSession, path: String, newVectors: DataFrame,
             dim: Int, txnSafe: Boolean = false,
             txnId: Option[String] = None): Unit = {
    require(txnId.isEmpty || txnSafe,
      "IvfIndex.append: txnId requires txnSafe = true — a plain parquet " +
        "append has no idempotency to give a retried transaction")
    val cents = readCentroids(spark, path, dim)
    val assigned = assignCells(newVectors, cents)
    if (txnSafe) {
      graft.sources.TxnLog.append(assigned, s"$path/cells", txnId,
        partitionBy = Seq("cell_id"))
      ()
    } else
      assigned.write.mode("append").partitionBy("cell_id")
        .parquet(s"$path/cells")
  }

  /** Right-to-be-forgotten for the ANN index: remove `vecIds`' rows
    * from the cells table by copy-on-write delete (cell partition
    * layout preserved, so probes keep pruning). The quantizer keeps
    * its trained state — an erasure never retrains, the same
    * drift-until-[[rebuild]] trade as [[append]] — and survivors'
    * assignments are untouched, so the post-delete index is
    * bit-identical to the original minus the victims' rows and a
    * probe can never return an erased id. Requires a `txnSafe` index:
    * the manifest commit is what keeps a concurrent reader on a
    * consistent snapshot (plain parquet has no delete), and the
    * txnId makes a retried erasure a no-op. Old versions still serve
    * the rows until `TxnLog.vacuum` on the cells table. */
  def delete(spark: SparkSession, path: String, vecIds: Seq[Long],
             txnId: Option[String] = None): Unit = {
    require(vecIds.nonEmpty, "IvfIndex.delete: no vector ids")
    graft.sources.TxnLog.delete(spark, s"$path/cells",
      col("vec_id").isin(vecIds: _*), txnId)
    ()
  }

  /** Exactly-once streaming index maintenance — the ingest→searchable
    * freshness loop for vectors, closing the same gap
    * [[graft.search.Bm25Index.foreachBatchUpdate]] closes for text:
    * each micro-batch of NEW vectors is assigned with the persisted
    * quantizer and appended under a batchId-derived txnId, so a
    * checkpoint-recovery replay no-ops instead of double-indexing the
    * batch. Requires a `txnSafe` index (the manifest is what makes
    * both the atomicity and the idempotency hold); quantizer drift is
    * accepted until [[rebuild]], exactly as with batch [[append]].
    * Use from `writeStream.foreachBatch`. */
  def foreachBatchAppend(path: String, dim: Int): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      append(batch.sparkSession, path, batch, dim, txnSafe = true,
        txnId = Some(s"batch-$batchId"))

  /** The cells table in the mode it was built with ([[append]]). */
  private def readCells(spark: SparkSession, path: String,
                        txnSafe: Boolean): DataFrame =
    if (txnSafe) graft.sources.TxnLog.read(spark, s"$path/cells")
    else spark.read.parquet(s"$path/cells")

  /** The ONE assignment expression (shared with [[Similarity.ivfTopK]]
    * via [[Similarity.cellDistsLit]]) applied at build, append, and —
    * on the query side — probe. */
  private def assignCells(vectors: DataFrame,
                          cents: Array[(Long, Seq[Float], Double)]): DataFrame =
    graft.core.Parallelism.ensure(vectors)
      .withColumn("c_norm2", Similarity.norm(col("embedding")))
      .withColumn("cell_id", element_at(
        array_sort(Similarity.cellDistsLit(cents)(col("embedding"), col("c_norm2"))),
        1).getField("cell_id"))

  /** Bounded collect: exactly the persisted quantizer (≤ nCells rows),
    * the same driver-side inlining [[Similarity.ivfTopK]] applies to
    * its centroid frame. */
  private def readCentroids(spark: SparkSession, path: String,
                            dim: Int): Array[(Long, Seq[Float], Double)] = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select("cell_id", "c_emb", "c_norm").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
      .sortBy(_._1)
    cents.foreach { case (id, ce, _) =>
      require(ce.length == dim, s"centroid $id has dim ${ce.length}, expected $dim") }
    cents
  }

  /** Index health report — the monitoring half of the maintenance
    * story: per-cell population plus its share of the corpus in exact
    * basis points. A drifting data distribution shows up here first
    * (appended batches piling into few cells → hot cells make those
    * probes scan-heavy and recall lopsided); the report is the signal
    * to rebuild the quantizer. One narrow aggregate over the cell
    * partition column — the vectors themselves are never read
    * (column pruning keeps the scan to cell_id). */
  def stats(spark: SparkSession, path: String,
            txnSafe: Boolean = false): DataFrame = {
    val cells = readCells(spark, path, txnSafe)
      .select(col("cell_id").cast("long").as("cell_id"))
    val counts = cells.groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n_vectors"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n_vectors")).as("__total"))))
      .select(col("cell_id"), col("n_vectors"),
        expr("(n_vectors * 10000) div greatest(__total, 1)").as("share_bps"))
  }

  /** The monitoring→ACTION half of the maintenance loop: consume
    * [[stats]] plus the stored quantizer size and issue a rebuild
    * verdict — the operator a maintenance scheduler keys off, so index
    * health is a decision, not a dashboard. All arithmetic is exact
    * integer bps (oracle-replayable).
    *
    * Decision rule:
    *  - hot cell: `imbalance_bps = max(share_bps) · nCells` is the
    *    hottest cell's load as bps of the balanced share (10000 =
    *    perfectly balanced). Over `maxImbalanceBps` → rebuild: probes
    *    landing there scan `imbalance/10000ths` of the balanced work,
    *    and appended batches piling into one cell are exactly the
    *    drift signature [[append]]'s no-retrain trade accepts only
    *    until rebuild.
    *  - empty cells: more than `maxEmptyCells` centroids own no
    *    vectors → rebuild: the quantizer no longer tessellates the
    *    data; probes spent on empty cells retrieve nothing and recall
    *    concentrates in the survivors.
    *
    * One row: (n_cells, populated_cells, empty_cells, total_vectors,
    * max_share_bps, imbalance_bps, rebuild 0/1, reason). Cost: the
    * [[stats]] aggregate plus a ≤ nCells centroid count — vectors are
    * never read. */
  def rebuildAdvice(spark: SparkSession, path: String,
                    maxImbalanceBps: Long = 30000,
                    maxEmptyCells: Long = 0,
                    txnSafe: Boolean = false): DataFrame = {
    val nCells = spark.read.parquet(s"$path/centroids").count()
    stats(spark, path, txnSafe)
      .agg(count(lit(1)).as("populated_cells"),
        sum(col("n_vectors")).as("total_vectors"),
        max(col("share_bps")).as("max_share_bps"))
      .select(lit(nCells).as("n_cells"), col("populated_cells"),
        (lit(nCells) - col("populated_cells")).as("empty_cells"),
        col("total_vectors"), col("max_share_bps"),
        (col("max_share_bps") * nCells).as("imbalance_bps"))
      .withColumn("__hot", col("imbalance_bps") > maxImbalanceBps)
      .withColumn("__empty", col("empty_cells") > maxEmptyCells)
      .select(col("n_cells"), col("populated_cells"), col("empty_cells"),
        col("total_vectors"), col("max_share_bps"), col("imbalance_bps"),
        (col("__hot") || col("__empty")).cast("int").as("rebuild"),
        coalesce(nullif(concat_ws("+",
          when(col("__hot"), lit("hot-cell")),
          when(col("__empty"), lit("empty-cells"))), lit("")),
          lit("balanced")).as("reason"))
  }

  /** The ACTION [[rebuildAdvice]]'s verdict triggers — close of the
    * maintenance loop (build → append → stats → advice → REBUILD):
    * retrain the quantizer on the index's CURRENT contents (the cells
    * table is self-contained: vec_id + embedding ride with every row,
    * so no re-read of the source corpus is needed) and publish the
    * result as a NEW GENERATION directory. The swap is the caller's
    * pointer move (the [[graft.sources.LayoutCache]] generation
    * discipline): readers on the old generation are never disturbed
    * mid-scan, the old path stays servable until swept, and
    * centroids+cells can never be observed torn across generations —
    * which an in-place rebuild could not guarantee (centroids/ and
    * cells/ are two storage units with no common commit point).
    *
    * Invariant: exact fixed-point Lloyd is row-order-insensitive
    * (integer sums, vec_id-deterministic seeding), so the rebuilt
    * generation is BIT-IDENTICAL to a fresh [[build]] over the same
    * vectors — quantizer drift from any number of no-retrain
    * [[append]]s is fully healed, which is exactly what the
    * `sim_ivf_rebuilt` oracle (full-corpus Lloyd replay) checks.
    * Returns `newPath`. */
  def rebuild(spark: SparkSession, path: String, newPath: String, dim: Int,
              nCells: Int = 16, iters: Int = 2,
              txnSafe: Boolean = false): String = {
    require(newPath != path,
      "IvfIndex.rebuild: rebuild publishes a NEW generation — an in-place " +
        "rebuild cannot swap centroids and cells atomically")
    val current = readCells(spark, path, txnSafe)
      .select(col("vec_id"), col("embedding"))
    build(current, newPath, dim, nCells, iters, txnSafe)
    // an index carrying the PQ tier re-trains BOTH quantizers: the
    // new generation's codes come from the rebuilt cells, healing PQ
    // drift exactly as the coarse rebuild heals cell drift
    if (new java.io.File(path, "pq_codebook").exists) {
      val old = spark.read.parquet(s"$path/pq_codebook")
      val nSub = pqNSub(old)
      val nCents = old.select("cent_id").distinct().count().toInt
      buildPq(spark, newPath, dim, nSub, nCents, txnSafe)
    }
    newPath
  }

  /** Unified index maintenance — the [[graft.sources.TxnLog.maintain]]
    * twin for the ANN tier: consult [[rebuildAdvice]] and execute the
    * rebuild ONLY when flagged, publishing the new generation at
    * `newPath` (the caller moves its pointer — the LayoutCache
    * generation discipline keeps old-generation readers undisturbed).
    * A healthy index does nothing and returns None, so a cadence
    * scheduler can call this blindly; advisory idempotency: the
    * rebuilt generation's advice reads balanced, so the next cadence
    * run is the no-op. Re-trains the PQ tier too when present
    * ([[rebuild]]'s contract). */
  def maintain(spark: SparkSession, path: String, newPath: String, dim: Int,
               nCells: Int = 16, iters: Int = 2,
               maxImbalanceBps: Long = 30000, maxEmptyCells: Long = 0,
               txnSafe: Boolean = false): Option[String] = {
    val verdict = rebuildAdvice(spark, path, maxImbalanceBps, maxEmptyCells,
      txnSafe).head // one row
    if (verdict.getAs[Int]("rebuild") == 1)
      Some(rebuild(spark, path, newPath, dim, nCells, iters, txnSafe))
    else None
  }

  // ----------------------------------------------------------------
  // PQ tier: persisted codes (the memory tier below the raw cells)
  // ----------------------------------------------------------------

  /** Train the PQ quantizer over the index's CURRENT cells and persist
    * the corpus CODES — at 100 TB the codes ARE the index (a 4-byte
    * code row against a 256-byte float32 vector), so a serving query
    * must never re-encode the corpus the way
    * [[Similarity.ivfPqTopK]] does per call. Layout, next to
    * centroids/cells in the same generation dir:
    *  - `<path>/pq_codebook`: (sub_id, cent_id, cv) — nSub·nCents
    *    fixed-point micro subvectors, [[Similarity.pqTopK]]'s
    *    deterministic lowest-vec_id training convention, so the whole
    *    artifact replays in SQL;
    *  - `<path>/pq_codes`: (vec_id, codes — element i+1 is subspace
    *    i's assigned centroid) PARTITIONED BY cell_id, so a query's
    *    probe set prunes code partitions exactly as it prunes cells.
    *
    * Codes derive from the cells table itself (vec_id + embedding
    * ride with every row — the [[rebuild]] self-containment), and the
    * code assignment is the [[Similarity.pqTopK]] integer min-by, so
    * [[topKPq]] is bit-identical to the ad-hoc composition. PQ drift
    * on [[appendPq]]ed batches is accepted until [[rebuild]], the
    * same no-retrain trade as the coarse quantizer's. */
  def buildPq(spark: SparkSession, path: String, dim: Int,
              nSub: Int = 4, nCents: Int = 16,
              txnSafe: Boolean = false,
              trainIters: Int = 0): Unit = {
    require(nSub > 0 && dim % nSub == 0, s"dim=$dim must divide into nSub=$nSub")
    require(nCents > 0, s"nCents must be positive, got $nCents")
    require(trainIters >= 0, s"trainIters must be >= 0, got $trainIters")
    val cells = readCells(spark, path, txnSafe)
      .select(col("vec_id"), col("cell_id").cast("long").as("cell_id"),
        col("embedding"))
    // trainIters > 0 runs [[Similarity.pqTrainedCodebook]]'s
    // per-subspace exact Lloyd over the corpus (recall lift at the
    // same code budget — measured 2.5x on fair queries); 0 keeps the
    // deterministic lowest-vec_id sample convention bit-for-bit. The
    // persisted artifact shape is identical either way, so topKPq /
    // appendPq consume both without knowing which trained them.
    val codebook =
      if (trainIters > 0)
        Similarity.pqTrainedCodebook(cells.select("vec_id", "embedding"),
          dim, nSub, nCents, trainIters)
      else pqSubRows(
        cells.orderBy(col("vec_id").asc).limit(nCents).drop("cell_id"),
        "vec_id", "cent_id", dim, nSub)
        .withColumnRenamed("sv", "cv")
    codebook.write.mode("overwrite").parquet(s"$path/pq_codebook")
    val codes = pqCodesOf(cells,
      spark.read.parquet(s"$path/pq_codebook"), dim, nSub)
    if (txnSafe) {
      graft.sources.TxnLog.overwrite(codes, s"$path/pq_codes",
        partitionBy = Seq("cell_id"))
      ()
    } else
      codes.write.mode("overwrite").partitionBy("cell_id")
        .parquet(s"$path/pq_codes")
  }

  /** Incremental maintenance of BOTH tiers: assign the new batch with
    * the persisted coarse quantizer AND code it with the persisted
    * codebook, appending cells and pq_codes together — neither
    * quantizer retrains (drift accepted until [[rebuild]]), so an
    * appended index equals a one-shot build whose training sets
    * match. Same txnSafe/txnId contract as [[append]]. */
  def appendPq(spark: SparkSession, path: String, newVectors: DataFrame,
               dim: Int, txnSafe: Boolean = false,
               txnId: Option[String] = None): Unit = {
    require(txnId.isEmpty || txnSafe,
      "IvfIndex.appendPq: txnId requires txnSafe = true")
    val cents = readCentroids(spark, path, dim)
    val codebook = spark.read.parquet(s"$path/pq_codebook")
    val nSub = pqNSub(codebook)
    val assigned = assignCells(newVectors, cents)
    val codes = pqCodesOf(
      assigned.select(col("vec_id"), col("cell_id").cast("long").as("cell_id"),
        col("embedding")), codebook, dim, nSub)
    if (txnSafe) {
      graft.sources.TxnLog.append(assigned, s"$path/cells",
        txnId.map(_ + "-cells"), partitionBy = Seq("cell_id"))
      graft.sources.TxnLog.append(codes, s"$path/pq_codes",
        txnId.map(_ + "-codes"), partitionBy = Seq("cell_id"))
      ()
    } else {
      assigned.write.mode("append").partitionBy("cell_id")
        .parquet(s"$path/cells")
      codes.write.mode("append").partitionBy("cell_id")
        .parquet(s"$path/pq_codes")
    }
  }

  /** Serve IVF-PQ from the persisted index — the FAISS `IVFx,PQy`
    * query path over stored artifacts: probe `nProbe` cells with the
    * persisted coarse quantizer, ADC-score ONLY the probed partitions'
    * CODES (raw embeddings are never read here — the scan is the
    * 64×-smaller codes table, partition-pruned), exact-cosine rerank
    * the ADC top `coarseK` from the probed cells. Bit-identical to
    * [[Similarity.ivfPqTopK]] with the same quantizers — storage
    * changes the plan, never the answer. */
  def topKPq(spark: SparkSession, path: String, queries: DataFrame,
             dim: Int, k: Int, nProbe: Int = 4, coarseK: Int = 20,
             txnSafe: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && nProbe >= 1 && coarseK >= k,
      s"need nProbe >= 1 and coarseK >= k >= 1, got k=$k nProbe=$nProbe coarseK=$coarseK")
    val cents = readCentroids(spark, path, dim)
    val codebook = broadcast(spark.read.parquet(s"$path/pq_codebook"))
    val nSub = pqNSub(spark.read.parquet(s"$path/pq_codebook"))
    val qn = queries.withColumn("q_norm2", Similarity.norm(col("q_emb")))
    val probed = qn
      .withColumn("probe", explode(slice(
        array_sort(Similarity.cellDistsLit(cents)(col("q_emb"), col("q_norm2"))),
        1, nProbe)))
      .select(col("q_id"), col("probe.cell_id").as("cell_id"))
    // bounded by |queries| x nProbe: a plan-time literal prunes the
    // code AND cell partitions (the [[topK]] discipline)
    val probeCells = probed.select("cell_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val codes = readPqCodes(spark, path, txnSafe)
      .filter(col("cell_id").isin(probeCells: _*))
    // per-query ADC lookup tables — tiny, broadcast
    val dtab = pqSubRows(qn.select(col("q_id"), col("q_emb").as("embedding")),
        "q_id", "q_id", dim, nSub)
      .join(codebook, "sub_id")
      .select(col("q_id"), col("sub_id"), col("cent_id"),
        Similarity.sqDist(col("sv"), col("cv")).as("d"))
    val adc = codes.join(broadcast(probed), "cell_id")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        posexplode(col("codes")).as(Seq("sub_id", "cent_id")))
      .join(broadcast(dtab), Seq("q_id", "sub_id", "cent_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d")).as("adc"))
    val coarse = adc.withColumn("__crk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("vec_id").asc)))
      .filter(col("__crk") <= coarseK)
      .select(col("q_id"), col("vec_id"))
    // the ONLY stage that reads raw embeddings: coarseK survivors per
    // query, from the probed cell partitions
    val cells = readCells(spark, path, txnSafe)
      .filter(col("cell_id").isin(probeCells: _*))
      .select(col("vec_id"), col("embedding"), col("c_norm2"))
    val rer = coarse.join(cells, "vec_id")
      .join(broadcast(qn.select("q_id", "q_emb", "q_norm2")), "q_id")
      .select(col("q_id"), col("vec_id"),
        (Similarity.dot(col("embedding"), col("q_emb")) /
          (col("c_norm2") * col("q_norm2"))).as("cos"))
    Similarity.rankScored(rer, k)
  }

  /** One row per (id, subspace): the fixed-point subvector —
    * [[Similarity.pqTopK]]'s slicing convention over a
    * (idCol, embedding) frame. */
  private def pqSubRows(df: DataFrame, idCol: String, idOut: String,
                        dim: Int, nSub: Int): DataFrame = {
    val sw = dim / nSub
    df.select(col(idCol).as(idOut), Similarity.fpMicro(col("embedding")).as("__fv"))
      .select(col(idOut),
        posexplode(transform(sequence(lit(0), lit(nSub - 1)),
          j => slice(col("__fv"), j * sw + 1, lit(sw)))).as(Seq("sub_id", "sv")))
  }

  /** (vec_id, codes, cell_id): each vector's per-subspace centroid
    * assignment (integer min-by, ties toward the lower centroid)
    * packed into one array — codes.element_at(i+1) = subspace i. */
  private def pqCodesOf(cells: DataFrame, codebook: DataFrame,
                        dim: Int, nSub: Int): DataFrame = {
    val sw = dim / nSub
    cells.select(col("vec_id"), col("cell_id"),
        Similarity.fpMicro(col("embedding")).as("__fv"))
      .select(col("vec_id"), col("cell_id"),
        posexplode(transform(sequence(lit(0), lit(nSub - 1)),
          j => slice(col("__fv"), j * sw + 1, lit(sw)))).as(Seq("sub_id", "sv")))
      .join(broadcast(codebook), "sub_id")
      .withColumn("d", Similarity.sqDist(col("sv"), col("cv")))
      .groupBy(col("vec_id"), col("cell_id"), col("sub_id"))
      .agg(min_by(col("cent_id"), struct(col("d"), col("cent_id"))).as("cent_id"))
      .groupBy(col("vec_id"), col("cell_id"))
      .agg(array_sort(collect_list(struct(col("sub_id"), col("cent_id")))).as("__sc"))
      .select(col("vec_id"),
        transform(col("__sc"), s => s.getField("cent_id")).as("codes"),
        col("cell_id"))
  }

  /** Subspace count recovered from the stored codebook (bounded:
    * ≤ nSub·nCents rows' metadata, one small agg). */
  private def pqNSub(codebook: DataFrame): Int =
    codebook.agg(max(col("sub_id"))).head.getInt(0) + 1

  /** The pq_codes table in the mode it was built with. */
  private def readPqCodes(spark: SparkSession, path: String,
                          txnSafe: Boolean): DataFrame = {
    val df =
      if (txnSafe) graft.sources.TxnLog.read(spark, s"$path/pq_codes")
      else spark.read.parquet(s"$path/pq_codes")
    df.withColumn("cell_id", col("cell_id").cast("long"))
  }

  /** Serve a query batch from the persisted index: probe each query's
    * `nProbe` nearest cells, scan ONLY those partitions, exact-cosine
    * score, deterministic top-k in [[Similarity.bruteForceTopK]]'s
    * output convention.
    *
    * `predicate` is FILTERED vector search — the production "ANN with
    * a metadata WHERE clause": the predicate applies to the candidate
    * rows INSIDE the probed partitions (pushed into the parquet scan,
    * so a selective filter also prunes row groups), and the ranking
    * runs over the survivors — exact post-filter semantics, never a
    * filter over an already-truncated top-k (which silently under-
    * fills k). Queries whose probed∩filtered set is smaller than k
    * return fewer rows, honestly. */
  def topK(spark: SparkSession, path: String, queries: DataFrame,
           dim: Int, k: Int, nProbe: Int = 4,
           txnSafe: Boolean = false,
           predicate: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(k >= 1 && nProbe >= 1, s"need k, nProbe >= 1, got $k, $nProbe")
    val cents = readCentroids(spark, path, dim)
    val probed = queries
      .withColumn("q_norm2", Similarity.norm(col("q_emb")))
      .withColumn("probe", explode(slice(
        array_sort(Similarity.cellDistsLit(cents)(col("q_emb"), col("q_norm2"))),
        1, nProbe)))
      .select(col("q_id"), col("q_emb"), col("q_norm2"),
        col("probe.cell_id").as("cell_id"))
    // the probe set is bounded by |queries| x nProbe (and by nCells):
    // collect it so the cell filter is a PLAN-TIME literal the scan
    // prunes partitions with — a join-derived filter would read every
    // cell and discard rows after the fact
    val probeCells = probed.select("cell_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val cells = readCells(spark, path, txnSafe)
      .filter(col("cell_id").isin(probeCells: _*))
      .filter(predicate.getOrElse(lit(true)))
      .withColumn("cell_id", col("cell_id").cast("long"))
    val scored = cells.join(broadcast(probed), "cell_id")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (Similarity.dot(col("embedding"), col("q_emb")) /
          (col("c_norm2") * col("q_norm2"))).as("cos"))
    Similarity.rankScored(scored, k)
  }
}
