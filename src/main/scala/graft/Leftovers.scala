package graft

import org.apache.spark.sql.SparkSession

/** Block-hygiene diagnostic: run the named queries (full
  * materialization, same as Bench) and print every persisted RDD still
  * registered afterwards, with its creation callsite — the tool behind
  * the `leftover_persisted_rdds` numbers in BENCH_detail.json. Usage:
  *   runMain graft.Leftovers <sfDir> [query ...]
  */
object Leftovers {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.toRdd.count()
      spark.catalog.clearCache()
      val left = spark.sparkContext.getPersistentRDDs
      println(s"[leftovers] $n: ${left.size}")
      left.toSeq.sortBy(_._1).foreach { case (id, r) =>
        println(f"  id=$id%-5d ${r.getStorageLevel.description}%-28s ${r.name}  $r")
      }
      left.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
