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

  test("hilbert clustering: the curve is a bijective walk with unit steps; cluster(curve=hilbert) keeps content and prunes; 3 columns refuse") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    import graft.sources.TxnLog
    // drive the ENGINE's own Hilbert expression through a cluster of a
    // full 16x16 grid keyed so buckets == coordinates, then read the
    // walk back: d must be a bijection on [0, 256) and consecutive d
    // must be grid neighbors (|dx|+|dy| = 1) — the locality property
    // z-order lacks (its quadrant seams jump diagonally)
    val root = Files.createTempDirectory("graft_hil").toString + "/t"
    val grid = spark.range(256).selectExpr(
      "id % 16 AS x", "id div 16 AS y", "id AS pay")
    TxnLog.overwrite(grid, root, collectStats = true)
    TxnLog.append(grid.limit(1).selectExpr("15 - x AS x", "15 - y AS y", "999L AS pay"),
      root, collectStats = true) // second dir so cluster has work
    TxnLog.cluster(spark, root, Seq("x", "y"), nDirs = 4, bits = 4,
      curve = "hilbert")
    val after = TxnLog.read(spark, root)
    assert(after.count() == 257)
    // recover the walk: within each dir rows are sorted by (x, y); use
    // the engine again — compare against a reference Hilbert in Scala
    def xy2d(bits: Int, x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val ds = for (x <- 0L until 16L; y <- 0L until 16L) yield xy2d(4, x, y)
    assert(ds.toSet.size == 256, "hilbert index must be a bijection")
    // and the ENGINE's codegen'd fold computes exactly this walk
    val engine = spark.range(256)
      .selectExpr("id % 16 AS x", "id div 16 AS y")
      .select(col("x"), col("y"),
        TxnLog.hilbertIndex(col("x"), col("y"), 4).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0L until 16L).foreach(x => (0L until 16L).foreach(y =>
      assert(engine((x, y)) == xy2d(4, x, y), s"engine diverges at ($x,$y)")))
    val byD = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield xy2d(4, x, y) -> (x, y)).toMap
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $d -> ${d + 1} is not a unit move: ($x1,$y1) -> ($x2,$y2)")
    }
    // pruning: a small x-band proves dirs away on the clustered table
    val (_, skipped, snap) = TxnLog.pruneDirs(spark, root, "x", 0L, 3L)
    assert(skipped.nonEmpty, s"hilbert layout should prune x: 0 of ${snap.size} skipped")
    // the curve is 2-D only — a 3-column ask refuses loudly
    val e = intercept[IllegalArgumentException] {
      TxnLog.cluster(spark, root, Seq("x", "y", "pay"), curve = "hilbert")
    }
    assert(e.getMessage.contains("exactly 2"), e.getMessage)
  }
}
