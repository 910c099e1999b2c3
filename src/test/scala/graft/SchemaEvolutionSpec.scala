package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.TxnLog

/** Metadata-only schema evolution — [[TxnLog.renameColumn]] /
  * [[TxnLog.dropColumn]] via column mapping: bytes on disk keep their
  * creation-time (physical) names, readers translate per their pinned
  * manifest, writers translate back, and stats/Bloom pruning resolves
  * through the mapping. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft_evo").toString + "/t"

  private def dirNames(root: String): Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/data"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
  }

  test("rename is metadata-only: zero data movement, new name served, time travel keeps old names") {
    val root = fresh()
    TxnLog.overwrite(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "n"), root)
    val before = dirNames(root)
    val v = TxnLog.renameColumn(spark, root, "n", "len")
    assert(v == 1L)
    assert(dirNames(root) == before, "a rename must move zero data dirs")
    assert(TxnLog.read(spark, root).columns.toSeq == Seq("id", "s", "len"))
    assert(TxnLog.read(spark, root).orderBy("id").select("len")
      .collect().map(_.getLong(0)).toSeq == Seq(10L, 20L))
    // the pinned pre-rename version serves ITS OWN names
    assert(TxnLog.read(spark, root, asOf = Some(0L)).columns.toSeq == Seq("id", "s", "n"))
    // renaming a column that does not exist refuses loudly
    intercept[IllegalArgumentException] {
      TxnLog.renameColumn(spark, root, "nope", "whatever")
    }
  }

  test("writes after a rename speak the logical name; bytes stay physical; old name refused") {
    val root = fresh()
    TxnLog.overwrite(Seq((1L, "a", 10L)).toDF("id", "s", "n"), root)
    TxnLog.renameColumn(spark, root, "n", "len")
    // append must use the NEW name...
    TxnLog.append(Seq((2L, "b", 20L)).toDF("id", "s", "len"), root)
    val snap = TxnLog.read(spark, root).orderBy("id").collect()
    assert(snap.map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((1L, 10L), (2L, 20L)))
    // ...and the new dir's BYTES carry the physical (creation-time) name
    val newDir = dirNames(root) // both dirs physical-uniform
    newDir.foreach { d =>
      val cols = spark.read.parquet(s"$root/data/$d").columns.toSet
      assert(cols.contains("n") && !cols.contains("len"),
        s"dir $d should store the physical name: $cols")
    }
    // the stale (physical) name is a loud caller bug, never a new column
    val ex = intercept[IllegalArgumentException] {
      TxnLog.append(Seq((3L, "c", 30L)).toDF("id", "s", "n"), root)
    }
    assert(ex.getMessage.contains("RENAMED"))
  }

  test("stats and Bloom pruning resolve through the mapping") {
    val root = fresh()
    val lower = spark.range(0L, 100L).select(col("id"), (col("id") * 10).as("n"))
    val upper = spark.range(100L, 200L).select(col("id"), (col("id") * 10).as("n"))
    TxnLog.overwrite(lower, root, collectStats = true, bloomCols = Seq("id"))
    TxnLog.renameColumn(spark, root, "n", "len")
    TxnLog.renameColumn(spark, root, "id", "doc")
    // post-rename stats-on append writes physical names + physical stats keys
    TxnLog.append(upper.toDF("doc", "len"), root,
      collectStats = true, bloomCols = Seq("doc"))
    // range pruning on the LOGICAL name skips the disjoint dir
    val (keep, skip, all) = TxnLog.pruneDirs(spark, root, "len", 0L, 500L)
    assert(all.size == 2 && keep.size == 1 && skip.size == 1)
    assert(TxnLog.readWhere(spark, root, "len", 0L, 500L).count() == 51L)
    // point lookup through the Bloom on the renamed column
    val pt = TxnLog.readPoint(spark, root, "doc", 150L).collect()
    assert(pt.map(_.getLong(0)).toSeq == Seq(150L))
    // metadata MIN/MAX through the mapping
    assert(TxnLog.fastMinMax(spark, root, "len").contains(("0", "1990")))
  }

  test("dropColumn retires the column: reads exclude it, re-adding refuses, last column refuses") {
    val root = fresh()
    TxnLog.overwrite(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "n"), root)
    TxnLog.dropColumn(spark, root, "s")
    assert(TxnLog.read(spark, root).columns.toSeq == Seq("id", "n"))
    // time travel still serves it
    assert(TxnLog.read(spark, root, asOf = Some(0L)).columns.contains("s"))
    // the retired name cannot come back
    val ex = intercept[IllegalArgumentException] {
      TxnLog.append(Seq((3L, "c", 30L)).toDF("id", "s", "n"), root)
    }
    assert(ex.getMessage.contains("DROPPED"))
    // appends without it are fine
    TxnLog.append(Seq((3L, 30L)).toDF("id", "n"), root)
    assert(TxnLog.read(spark, root).count() == 3L)
    // dropping down to zero columns refuses
    TxnLog.dropColumn(spark, root, "n")
    intercept[IllegalArgumentException] {
      TxnLog.dropColumn(spark, root, "id")
    }
  }

  test("rename refuses under live DVs and referencing CHECKs; drop+rename compose after compact") {
    val root = fresh()
    TxnLog.overwrite(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "n"), root)
    TxnLog.deleteMor(spark, root, col("id") === 2L)
    val ex1 = intercept[IllegalArgumentException] {
      TxnLog.renameColumn(spark, root, "n", "len")
    }
    assert(ex1.getMessage.contains("deletion vector"))
    TxnLog.compact(spark, root) // materializes the DV away
    TxnLog.addCheck(spark, root, "n_pos", "n > 0")
    val ex2 = intercept[IllegalArgumentException] {
      TxnLog.renameColumn(spark, root, "n", "len")
    }
    assert(ex2.getMessage.contains("CHECK"))
    TxnLog.dropCheck(spark, root, "n_pos")
    TxnLog.renameColumn(spark, root, "n", "len")
    assert(TxnLog.read(spark, root).columns.toSeq == Seq("id", "s", "len"))
    assert(TxnLog.read(spark, root).count() == 1L) // the DV'd row stayed deleted
    // rename onto an existing name refuses
    intercept[IllegalArgumentException] {
      TxnLog.renameColumn(spark, root, "s", "len")
    }
  }

  test("copy-on-write delete and merge work on the renamed view; restore reverts names") {
    val root = fresh()
    TxnLog.overwrite(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "s", "n"), root)
    val vRename = TxnLog.renameColumn(spark, root, "n", "len")
    TxnLog.delete(spark, root, col("len") === 20L)
    assert(TxnLog.read(spark, root).orderBy("id").select("len")
      .collect().map(_.getLong(0)).toSeq == Seq(10L, 30L))
    // merge under the logical schema
    TxnLog.merge(Seq((3L, "c2", 33L)).toDF("id", "s", "len"), root, Seq("id"))
    val snap = TxnLog.read(spark, root).orderBy("id").collect()
    assert(snap.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      == Seq((1L, "a", 10L), (3L, "c2", 33L)))
    // every dir on disk still carries the physical name
    dirNames(root).foreach { d =>
      assert(spark.read.parquet(s"$root/data/$d").columns.contains("n"))
    }
    // restore to the pre-rename version serves the old schema again
    TxnLog.restore(spark, root, vRename - 1)
    assert(TxnLog.read(spark, root).columns.toSeq == Seq("id", "s", "n"))
    assert(TxnLog.read(spark, root).count() == 3L)
  }

  test("incremental consumers refuse a range spanning a schema change") {
    val root = fresh()
    TxnLog.overwrite(Seq((1L, "a", 10L)).toDF("id", "s", "n"), root)
    TxnLog.renameColumn(spark, root, "n", "len")
    TxnLog.append(Seq((2L, "b", 20L)).toDF("id", "s", "len"), root)
    val ex = intercept[IllegalArgumentException] {
      TxnLog.changesSince(spark, root, 0L).count()
    }
    assert(ex.getMessage.contains("non-append"))
    intercept[IllegalArgumentException] {
      TxnLog.changeFeed(spark, root, 0L).count()
    }
    // re-baselined AFTER the rename, the feed serves logical names
    val delta = TxnLog.changesSince(spark, root, 1L)
    assert(delta.columns.toSeq == Seq("id", "s", "len"))
    assert(delta.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("addColumn backfills a constant default on old dirs without rewriting them") {
    val root = fresh()
    TxnLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root)
    val before = dirNames(root)
    TxnLog.addColumn(spark, root, "lang", "'und'")
    assert(dirNames(root) == before, "addColumn must move zero data dirs")
    // old rows serve the default; an append with real values wins
    TxnLog.append(Seq((3L, "c", "en")).toDF("id", "s", "lang"), root)
    val rows = TxnLog.read(spark, root).orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2))).toSeq
      == Seq((1L, "und"), (2L, "und"), (3L, "en")))
    // an append still MISSING the column keeps the (write-)default
    TxnLog.append(Seq((4L, "d")).toDF("id", "s"), root)
    assert(TxnLog.read(spark, root).filter(col("id") === 4L)
      .head.getString(2) == "und")
    // time travel before the DDL has no such column
    assert(!TxnLog.read(spark, root, asOf = Some(0L)).columns.contains("lang"))
    // adding an existing column refuses; malformed defaults refuse
    intercept[IllegalArgumentException] {
      TxnLog.addColumn(spark, root, "s", "'x'")
    }
    intercept[Exception] {
      TxnLog.addColumn(spark, root, "bad", "not a ( valid expr")
    }
    // rename carries the default; drop retires it
    TxnLog.renameColumn(spark, root, "lang", "language")
    assert(TxnLog.read(spark, root).filter(col("id") === 1L)
      .head.getAs[String]("language") == "und")
    TxnLog.dropColumn(spark, root, "language")
    assert(!TxnLog.read(spark, root).columns.contains("language"))
  }

  test("changesSince tolerates add_column as metadata; the feed serves the default") {
    val root = fresh()
    TxnLog.overwrite(Seq((1L, "a")).toDF("id", "s"), root)
    TxnLog.addColumn(spark, root, "n", "CAST(0 AS BIGINT)")
    TxnLog.append(Seq((2L, "b", 5L)).toDF("id", "s", "n"), root)
    val delta = TxnLog.changesSince(spark, root, 0L)
    assert(delta.columns.toSeq == Seq("id", "s", "n"))
    assert(delta.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((2L, 5L)))
  }

  test("rename and drop are idempotent under txnIds") {
    val root = fresh()
    TxnLog.overwrite(Seq((1L, "a", 10L)).toDF("id", "s", "n"), root)
    val v1 = TxnLog.renameColumn(spark, root, "n", "len", Some("evo-1"))
    val v2 = TxnLog.renameColumn(spark, root, "n", "len", Some("evo-1"))
    assert(v1 == v2, "a replayed rename must no-op to its original version")
    assert(TxnLog.latestVersion(spark, root) == v1)
    val d1 = TxnLog.dropColumn(spark, root, "s", Some("evo-2"))
    val d2 = TxnLog.dropColumn(spark, root, "s", Some("evo-2"))
    assert(d1 == d2)
  }
}
