package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints `explain("formatted")` for the named
  * queries (or all) against a testdata dir. Usage:
  *   runMain graft.ExplainPlans <sfDir> [query ...]
  */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      // pre-flight advisor: same rules the PlanSpec guards assert
      graft.plans.PlanLint.lint(df) match {
        case Seq() => println("[lint] clean")
        case fs => fs.foreach(f =>
          println(s"[lint] ${f.severity} ${f.rule}: ${f.detail}"))
      }
    }
    spark.stop()
  }
}
