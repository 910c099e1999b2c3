package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffled equi-joins. AQE's skew-join
  * split (on by default in the session factory) handles most cases at
  * runtime; this helper is for the residual ones — a shuffled join
  * whose hot keys AQE can't split (e.g. a single key holding >2 GiB,
  * or non-AQE contexts like streaming micro-batches).
  */
object Skew {

  /** Salted equi-join: the large side scatters each hot key across
    * `nSalts` shuffle partitions via a deterministic salt derived from
    * `saltBy` (any well-distributed large-side column, e.g. a row id);
    * the small side replicates `nSalts` times. Result equals the plain
    * inner join on `key`, but no reducer receives a whole hot key.
    *
    * Cost model: small side grows nSalts x (fine for dimension-sized
    * tables); large side shuffles once either way. Choose nSalts ~=
    * (hot-key row count / target rows per partition).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 nSalts: Int, saltBy: Column): DataFrame = {
    require(nSalts >= 1, "nSalts must be >= 1")
    val l = large.withColumn("__graft_salt", pmod(hash(saltBy), lit(nSalts)))
    val s = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(s, Seq(key, "__graft_salt"), "inner").drop("__graft_salt")
  }
}
