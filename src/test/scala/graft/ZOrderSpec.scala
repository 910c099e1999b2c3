package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ZOrder

class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits (known Morton values)") {
    val df = spark.range(1).select(
      ZOrder.zValue(lit(0L), lit(0L)).as("z00"),
      ZOrder.zValue(lit(1L), lit(0L)).as("z10"),
      ZOrder.zValue(lit(0L), lit(1L)).as("z01"),
      ZOrder.zValue(lit(3L), lit(5L)).as("z35"),
      ZOrder.zValue(lit(65535L), lit(65535L)).as("zmax"))
    val r = df.head()
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 1L)   // x occupies even bits
    assert(r.getLong(2) == 2L)   // y occupies odd bits
    // x=3 (0b11) -> 0b0101; y=5 (0b101) -> 0b010001 << 1 = 0b100010; or = 0b100111 = 39
    assert(r.getLong(3) == 39L)
    assert(r.getLong(4) == (1L << 32) - 1)
  }

  test("z-ordered layout shrinks per-file bounding boxes vs linear sort") {
    import spark.implicits._
    // a grid where x and y are independent: linear sort on x leaves y
    // unconstrained per file; z-order bounds both
    val n = 1 << 12
    val df = spark.range(0, n).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val root = Files.createTempDirectory("graft_zorder").toString
    ZOrder.writeZOrdered(df, s"$root/z", "x", "y", nFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$root/linear")
    val zdf = spark.read.parquet(s"$root/z")
    val lindf = spark.read.parquet(s"$root/linear")
    assert(zdf.count() == n)
    // z-order bounds BOTH dimensions per file (≈16x16 quadrants);
    // linear-on-x leaves y unconstrained (4x64 slabs): same area,
    // radically different pruning. Compare mean per-file y-extent.
    def meanExtent(df: org.apache.spark.sql.DataFrame, c: String): Double =
      df.groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c)) + 1).cast("double").as("ext"))
        .agg(avg(col("ext"))).head().getDouble(0)
    val zy = meanExtent(zdf, "y")
    val liny = meanExtent(lindf, "y")
    assert(zy <= liny / 2,
      s"z-order should bound the unsorted dimension: z y-extent=$zy linear=$liny")
    // a filter on y alone touches most linear files but few z files
    def touched(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("y") === 40).select(input_file_name()).distinct().count()
    val (zt, lt) = (touched(zdf), touched(lindf))
    assert(zt * 2 <= lt, s"y-slice pruning: z touched $zt files, linear $lt")
    // and the point query stays cheap
    val pt = zdf.filter(col("x") === 10 && col("y") === 40)
      .select(input_file_name()).distinct().count()
    assert(pt <= 4, s"point query touched $pt of 16 files")
  }
}
