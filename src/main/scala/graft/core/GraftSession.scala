package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory mirroring the reference's Spark tuning
  * (reference: batch_processing_optimized.py:50-78 — AQE, partition
  * coalescing, Kryo; S3A/Arrow knobs dropped: no object store / no
  * Python boundary in a Scala engine).
  *
  * Scale notes: `shuffle.partitions` tracks the local core count here;
  * on a real cluster it should be ~2-3x total executor cores (or left
  * to AQE coalescing from a high initial value). All other settings are
  * scale-neutral.
  */
object GraftSession {

  def builder(appName: String, cores: Int = defaultCores): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.expressions.GraftExtensions)
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
      // nanos timestamp type — read as long, convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption)
      .getOrElse(math.max(4, Runtime.getRuntime.availableProcessors()))
}
