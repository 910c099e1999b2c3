package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the brute-force path broadcasts the (small) query set
  * and scans candidates once — a map-side cross product with a
  * per-partition top-k (window over rank) that shuffles only
  * (query, candidate, score) triples. The LSH path buckets vectors by
  * random-hyperplane sign bits so the scan side shrinks to one bucket
  * per query — the standard recall/latency trade at 100 TB, where
  * brute force over everything is a full-table scan per query batch.
  *
  * All dot products run in double precision with a left-to-right fold
  * (`zip_with` + `aggregate`) — deterministic and engine-portable.
  */
object Similarity {

  /** Double-precision dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every query (broadcast) against every
    * candidate; rank by (score desc, vec_id) for determinism. */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = candidates.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("embedding"), col("q_emb")).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), round(col("cos"), 9).as("cos"))
  }

  /** Deterministic ±1 hyperplane matrix: sign(p,d) = +1 iff
    * md5("p:d") first hex nibble is even. Engine-independent and
    * reproducible without a stored model. */
  private def planeSign(p: Int, d: Column): Column =
    when(conv(substring(md5(concat(lit(p.toString), lit(":"), d.cast("string"))), 1, 1), 16, 10)
      .cast("int") % 2 === 0, 1.0).otherwise(-1.0)

  /** Random-hyperplane LSH bucket id from `nPlanes` sign bits. */
  def lshBucket(emb: Column, dim: Int, nPlanes: Int = 8): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), lit(dim - 1)),
          (x, d) => x.cast("double") * planeSign(p, d)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, 1L << p).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: queries only compare against candidates in the
    * same hyperplane bucket (approximate — trades recall for a
    * bucket-local join instead of a full scan). */
  def lshTopK(candidates: DataFrame, queries: DataFrame, dim: Int,
              k: Int, nPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = candidates.withColumn("bucket", lshBucket(col("embedding"), dim, nPlanes))
    val qb = queries.withColumn("bucket", lshBucket(col("q_emb"), dim, nPlanes))
    val scored = cb.join(broadcast(qb), "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("embedding"), col("q_emb")).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), round(col("cos"), 9).as("cos"))
  }

  /** Random-hyperplane LSH bucket id using planes
    * [seedOffset, seedOffset + nPlanes). */
  def lshBucketSeeded(emb: Column, dim: Int, nPlanes: Int, seedOffset: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), lit(dim - 1)),
          (x, d) => x.cast("double") * planeSign(seedOffset + p, d)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, 1L << p).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Embedding-cosine near-duplicate pairs via multi-table LSH:
    * `nTables` independent hyperplane tables (amplifies recall — a pair
    * is a candidate if it collides in ANY table), verified by exact
    * cosine. Shuffles only (table, bucket, id) triples plus the
    * embeddings of bucket-mates; never the full cross product. */
  def cosineNearDups(df: DataFrame, dim: Int, threshold: Double,
                     nPlanes: Int = 6, nTables: Int = 4): DataFrame = {
    val b = df.select(col("vec_id"), col("embedding"), posexplode(
      array((0 until nTables).map(t =>
        lshBucketSeeded(col("embedding"), dim, nPlanes, t * nPlanes)): _*)))
      .withColumnRenamed("pos", "table_idx")
      .withColumnRenamed("col", "bucket")
    val l = b.select(col("table_idx"), col("bucket"),
      col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val r = b.select(col("table_idx"), col("bucket"),
      col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    l.join(r, Seq("table_idx", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("emb_a"), col("emb_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 9).as("cos"))
      .distinct()
  }
}
