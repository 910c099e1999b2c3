package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sources.TxnLog

/** SQL DML over `graft.`path`` tables: every statement must lower onto
  * the existing TxnLog operation — same answers, same commit protocol,
  * same history actions as the API calls they wrap. */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_sql").toString + "/t"

  test("DELETE FROM graft.`path` WHERE — CoW delete, time travel intact") {
    val root = freshRoot()
    (0L until 10L).map(i => (i, s"s$i")).toDF("id", "s")
      .write.format("graft").save(root)
    val out = spark.sql(s"DELETE FROM graft.`$root` WHERE id < 3").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L)) // committed version
    assert(spark.read.format("graft").load(root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == (3L to 9L))
    // the statement ran the real protocol: history shows a replace
    assert(TxnLog.versions(spark, root).map(_._2) == Seq("overwrite", "replace"))
    // pre-delete snapshot still serves
    assert(spark.read.format("graft").option("versionAsOf", 0).load(root).count() == 10L)
    // alias-qualified column references resolve too
    spark.sql(s"DELETE FROM graft.`$root` AS t WHERE t.id = 9")
    assert(spark.read.format("graft").load(root).count() == 6L)
  }

  test("UPDATE graft.`path` SET — assignments see PRE-update values; WHERE scopes; types cast") {
    val root = freshRoot()
    Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("id", "n", "s").write.format("graft").save(root)
    spark.sql(s"UPDATE graft.`$root` SET s = upper(s), n = n + 1 WHERE id >= 2")
    val got = spark.read.format("graft").load(root).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 10L, "a"), (2L, 21L, "B"), (3L, 31L, "C")))
    // SQL swap contract: both assignments read the OLD row
    spark.sql(s"UPDATE graft.`$root` SET id = n, n = id WHERE id = 1")
    val swapped = spark.read.format("graft").load(root)
      .filter(col("s") === "a").head
    assert((swapped.getLong(0), swapped.getLong(1)) == ((10L, 1L)))
    // no WHERE = every row; unknown column refuses loudly
    spark.sql(s"UPDATE graft.`$root` SET s = 'x'")
    assert(spark.read.format("graft").load(root)
      .filter(col("s") === "x").count() == 3L)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$root` SET nope = 1")
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("MERGE INTO graft.`path` — two-clause upsert and the tri-clause NOT MATCHED BY SOURCE DELETE") {
    val root = freshRoot()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .write.format("graft").save(root)
    Seq((2L, "B2"), (9L, "new")).toDF("id", "s").createOrReplaceTempView("graft_sql_src")
    spark.sql(
      s"""MERGE INTO graft.`$root` AS t USING graft_sql_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val afterUpsert = spark.read.format("graft").load(root).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(afterUpsert == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (9L, "new")))
    // tri-clause: unmatched target rows matching the predicate delete
    Seq((2L, "B3")).toDF("id", "s").createOrReplaceTempView("graft_sql_src2")
    spark.sql(
      s"""MERGE INTO graft.`$root` AS t USING graft_sql_src2 AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.id > 5 THEN DELETE""".stripMargin)
    val afterTri = spark.read.format("graft").load(root).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(afterTri == Seq((1L, "a"), (2L, "B3"), (3L, "c"))) // 9 deleted, 1/3 kept
    // WHEN MATCHED THEN DELETE is now a first-class clause (round 16):
    // it routes through the generalized clause path and deletes id=2
    spark.sql(
      s"""MERGE INTO graft.`$root` AS t USING graft_sql_src AS s ON t.id = s.id
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.read.format("graft").load(root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // a shape the engine's key-merge cannot express refuses loudly,
    // naming the supported contract — never silently half-computes
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft.`$root` AS t USING graft_sql_src AS s ON t.id < s.id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(e.getMessage.contains("ON"), e.getMessage)
  }

  test("OPTIMIZE / OPTIMIZE WHERE / OPTIMIZE ZORDER BY lower onto compact/compactWhere/cluster") {
    val root = freshRoot()
    (0 to 5).foreach { i =>
      spark.range(i * 10L, (i + 1) * 10L).toDF("id")
        .select(col("id"), (col("id") * 2).as("v"))
        .write.format("graft")
        .mode(if (i == 0) SaveMode.Overwrite else SaveMode.Append)
        .option("collectStats", "true").save(root)
    }
    val before = TxnLog.versions(spark, root).size
    // scoped compaction: only the 3 dirs covering id in [0, 29] merge
    spark.sql(s"OPTIMIZE graft.`$root` WHERE id BETWEEN 0 AND 29")
    assert(TxnLog.versions(spark, root).last._2 == "replace")
    assert(spark.read.format("graft").load(root).count() == 60L)
    // full compaction
    spark.sql(s"OPTIMIZE graft.`$root`")
    assert(spark.read.format("graft").load(root).count() == 60L)
    // z-order clustering
    spark.sql(s"OPTIMIZE graft.`$root` ZORDER BY (id, v)")
    assert(TxnLog.versions(spark, root).size >= before + 3)
    assert(spark.read.format("graft").load(root).count() == 60L)
  }

  test("RESTORE TO VERSION/TIMESTAMP AS OF and DESCRIBE DETAIL") {
    val root = freshRoot()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.format("graft").save(root)
    Seq((3L, "c")).toDF("id", "s").write.format("graft")
      .mode(SaveMode.Append).save(root)
    spark.sql(s"DELETE FROM graft.`$root` WHERE id = 1")
    assert(spark.read.format("graft").load(root).count() == 2L)
    // restore to the pre-delete snapshot — a NEW commit, history intact
    val v = spark.sql(s"RESTORE graft.`$root` TO VERSION AS OF 1").head.getLong(0)
    assert(v == 3L)
    assert(spark.read.format("graft").load(root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // timestamp form: tomorrow resolves to the latest version (3)
    val tomorrow = java.time.LocalDate.now().plusDays(1).toString
    spark.sql(s"RESTORE TABLE graft.`$root` TO TIMESTAMP AS OF '$tomorrow'")
    assert(spark.read.format("graft").load(root).count() == 3L)
    // DESCRIBE DETAIL == the health report row
    val d = spark.sql(s"DESCRIBE DETAIL graft.`$root`").head
    val h = TxnLog.health(spark, root).head
    assert(d.getLong(0) == h.getLong(0) && d.getLong(2) == h.getLong(2) &&
      d.getLong(3) == h.getLong(3))
  }

  test("CONVERT TO GRAFT adopts a plain parquet dir by reference; SHALLOW CLONE through SQL") {
    val base = Files.createTempDirectory("graft_sql_conv").toString
    val pdir = s"$base/plainpq"
    val root = s"$base/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s").write.parquet(pdir)
    assert(spark.sql(s"CONVERT TO GRAFT parquet.`$pdir` AS graft.`$root`")
      .head.getLong(0) == 0L)
    // the table serves the parquet rows by reference; the original dir
    // stays a valid plain dataset
    assert(spark.read.format("graft").load(root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(spark.read.parquet(pdir).count() == 3L)
    // appends land under the TABLE root, never inside the adopted dir
    Seq((4L, "d")).toDF("id", "s").write.format("graft")
      .mode(SaveMode.Append).save(root)
    assert(spark.read.format("graft").load(root).count() == 4L)
    assert(spark.read.parquet(pdir).count() == 3L)
    // stats were collected: DESCRIBE DETAIL reports coverage on the
    // converted dir (1 of 2 dirs after the stat-less append)
    val cov = spark.sql(s"DESCRIBE DETAIL graft.`$root`")
      .head.getAs[Long]("stats_coverage_bps")
    assert(cov == 5000L, s"expected 1/2 dirs covered, got $cov bps")
    // nested root refuses (its data/ would hide inside the reference)
    val e = intercept[Exception] {
      spark.sql(s"CONVERT TO GRAFT parquet.`$pdir` AS graft.`$pdir/inner`")
    }
    assert(e.getMessage.contains("OUTSIDE"), e.getMessage)
    // …and the converse nesting refuses too: a parquet dir under the
    // ROOT would read as an unreferenced orphan to vacuum's sweep
    // (round-15 advice: a routine VACUUM deleted the adopted dataset)
    val r2 = s"$base/t2"
    val innerPq = s"$r2/data/adopted"
    Seq((7L, "z")).toDF("id", "s").write.parquet(innerPq)
    val e2 = intercept[Exception] {
      spark.sql(s"CONVERT TO GRAFT parquet.`$innerPq` AS graft.`$r2`")
    }
    assert(e2.getMessage.contains("OUTSIDE"), e2.getMessage)
    // belt-and-braces: even a manifest that DOES ext-reference a dir
    // under data/ (older writer) is never swept as an orphan
    val r3 = s"$base/t3"
    val adopted = s"$r3/data/legacy"
    Seq((8L, "y")).toDF("id", "s").write.parquet(adopted)
    TxnLog.tryPublish(
      new org.apache.hadoop.fs.Path(r3).getFileSystem(
        spark.sparkContext.hadoopConfiguration), r3,
      TxnLog.Commit(0L, "convert", Seq(s"ext:$adopted"), None))
    assert(spark.read.format("graft").load(r3).count() == 1L)
    TxnLog.vacuum(spark, r3, retainVersions = 1, orphanMinAgeMs = 0L)
    assert(spark.read.format("graft").load(r3).count() == 1L,
      "vacuum swept an ext-referenced dir resolving under data/")
    // zero-copy clone through SQL, pinned to the pre-append version
    val dst = s"$base/cl"
    spark.sql(s"CREATE TABLE graft.`$dst` SHALLOW CLONE graft.`$root` VERSION AS OF 0")
    assert(spark.read.format("graft").load(dst).count() == 3L)
  }

  test("query-position graft.`path`: SELECT, joins, INSERT INTO (append and OVERWRITE) — the Delta path-table read shape") {
    val root = freshRoot()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.format("graft").save(root)
    // plain SELECT with pushdown-able predicate
    assert(spark.sql(s"SELECT s FROM graft.`$root` WHERE id = 2")
      .head.getString(0) == "b")
    // INSERT INTO routes through the commit protocol (a real version)
    spark.sql(s"INSERT INTO graft.`$root` VALUES (3, 'c')")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root`").head.getLong(0) == 3L)
    assert(TxnLog.versions(spark, root).map(_._2) == Seq("overwrite", "append"))
    // INSERT OVERWRITE resets the table
    spark.sql(s"INSERT OVERWRITE graft.`$root` VALUES (9, 'z')")
    assert(spark.sql(s"SELECT * FROM graft.`$root`").count() == 1L)
    // a graft path as a MERGE SOURCE resolves too
    val src = freshRoot()
    Seq((9L, "Z2"), (10L, "new")).toDF("id", "s").write.format("graft").save(src)
    spark.sql(
      s"""MERGE INTO graft.`$root` AS t USING graft.`$src` AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT * FROM graft.`$root`").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((9L, "Z2"), (10L, "new")))
    // a non-path identifier (no '/') is NOT claimed by the graft
    // rule: it falls through to Spark's own resolution (which itself
    // treats `graft.x` as a direct-on-files query, like `parquet.x`) —
    // the point is the engine never fabricates a relation for it
    val e = intercept[Exception] { spark.sql("SELECT * FROM graft.sometable") }
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.contains("cannot be found") ||
      e.getMessage.contains("UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY"), e.getMessage)
  }

  test("ALTER TABLE: CHECK constraints enforce; RENAME/DROP/ADD COLUMN are metadata-only evolution") {
    val root = freshRoot()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.format("graft").save(root)
    spark.sql(s"ALTER TABLE graft.`$root` ADD CONSTRAINT pos CHECK (id > 0)")
    // the constraint enforces at the next commit
    val e = intercept[Exception] {
      Seq((-5L, "bad")).toDF("id", "s").write.format("graft")
        .mode(SaveMode.Append).save(root)
    }
    assert(e.getMessage.toLowerCase.contains("check") ||
      e.getMessage.contains("pos"), e.getMessage)
    spark.sql(s"ALTER TABLE graft.`$root` DROP CONSTRAINT pos")
    Seq((-5L, "ok-now")).toDF("id", "s").write.format("graft")
      .mode(SaveMode.Append).save(root)
    assert(spark.read.format("graft").load(root).count() == 3L)
    // metadata-only column evolution through SQL
    spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN s TO label")
    assert(spark.read.format("graft").load(root).columns.toSeq == Seq("id", "label"))
    spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMN flag DEFAULT id > 0")
    val rows = spark.read.format("graft").load(root)
      .select("id", "flag").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows(1L) && rows(2L) && !rows(-5L))
    spark.sql(s"ALTER TABLE graft.`$root` DROP COLUMN flag")
    assert(spark.read.format("graft").load(root).columns.toSeq == Seq("id", "label"))
  }

  test("VACUUM RETAIN n VERSIONS and DESCRIBE HISTORY") {
    val root = freshRoot()
    Seq((1L, "a")).toDF("id", "s").write.format("graft").save(root)
    Seq((2L, "b")).toDF("id", "s").write.format("graft")
      .mode(SaveMode.Append).save(root)
    Seq((3L, "c")).toDF("id", "s").write.format("graft")
      .mode(SaveMode.Overwrite).save(root)
    // history through SQL == the API frame
    val viaSql = spark.sql(s"DESCRIBE HISTORY graft.`$root`").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(viaSql == Seq((0L, "overwrite"), (1L, "append"), (2L, "overwrite")))
    // vacuum keeps only the latest version
    spark.sql(s"VACUUM graft.`$root` RETAIN 1 VERSIONS")
    assert(spark.read.format("graft").load(root).count() == 1L)
    intercept[Exception] {
      spark.read.format("graft").option("versionAsOf", 0).load(root).collect()
    }
    ()
  }

  test("named tables: CREATE TABLE … USING graft routes reads, DML, and utility statements") {
    val root = freshRoot()
    Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("id", "n", "s").write.format("graft").save(root)
    spark.sql(s"CREATE TABLE graft_named USING graft LOCATION '$root'")
    try {
      // read by name resolves through the session catalog
      assert(spark.sql("SELECT * FROM graft_named").count() == 3L)
      // DML by name lowers onto the same TxnLog ops as the path form
      spark.sql("UPDATE graft_named SET s = upper(s) WHERE id = 2")
      spark.sql("DELETE FROM graft_named WHERE id = 3")
      spark.sql(
        """MERGE INTO graft_named AS t
          |USING (SELECT 1L AS id, 11L AS n, 'A' AS s
          |       UNION ALL SELECT 9L, 90L, 'i') AS src
          |ON t.id = src.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val got = spark.sql("SELECT id, n, s FROM graft_named ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      assert(got == Seq((1L, 11L, "A"), (2L, 20L, "B"), (9L, 90L, "i")))
      // utility statements accept the name too
      assert(spark.sql("DESCRIBE HISTORY graft_named").collect()
        .map(_.getString(2)).toSeq ==
        Seq("overwrite", "replace", "replace", "replace"))
      spark.sql("OPTIMIZE graft_named")
      spark.sql("VACUUM graft_named RETAIN 1 VERSIONS")
      assert(spark.sql("SELECT count(*) FROM graft_named").head.getLong(0) == 3L)
      // named results stay hash-identical to a path-form read
      assert(spark.sql("SELECT * FROM graft_named ORDER BY id").collect().toSeq ==
        spark.sql(s"SELECT * FROM graft.`$root` ORDER BY id").collect().toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS graft_named")
  }

  test("named tables: CTAS materializes through the ACID writer; INSERT INTO appends") {
    val loc = freshRoot()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").createOrReplaceTempView("ctas_src")
    spark.sql(s"CREATE TABLE ctas_t USING graft LOCATION '$loc' AS SELECT * FROM ctas_src")
    try {
      assert(spark.sql("SELECT * FROM ctas_t").count() == 2L)
      // the CTAS landed as a real TxnLog commit, not a bare parquet dir
      assert(TxnLog.latestVersion(spark, loc) == 0L)
      spark.sql("INSERT INTO ctas_t VALUES (3, 'c')")
      assert(spark.sql("SELECT * FROM ctas_t").count() == 3L)
      assert(TxnLog.versions(spark, loc).map(_._2) == Seq("overwrite", "append"))
    } finally spark.sql("DROP TABLE IF EXISTS ctas_t")
  }

  test("named tables: non-graft names are never hijacked; temp views shadow") {
    // a REAL catalog database named `graft`: DELETE FROM graft.sales
    // must reach Spark's own resolution (and fail with ITS error, not
    // be treated as a TxnLog path named 'sales')
    spark.sql("CREATE DATABASE IF NOT EXISTS graft")
    val ploc = Files.createTempDirectory("graft_sql_pq").toString + "/sales"
    Seq((1L, "x")).toDF("id", "s").write.parquet(ploc)
    spark.sql(s"CREATE TABLE graft.sales USING parquet LOCATION '$ploc'")
    try {
      val e = intercept[Exception] { spark.sql("DELETE FROM graft.sales WHERE id = 1") }
      // Spark's own v1-DML refusal, not a TxnLog missing-table error
      assert(!e.getMessage.contains("TxnLog"), e.getMessage)
      assert(spark.sql("SELECT * FROM graft.sales").count() == 1L)
      // a named ALTER on the parquet table delegates to Spark untouched
      intercept[Exception] { spark.sql("ALTER TABLE graft.sales ADD CONSTRAINT c CHECK (id > 0)") }
      // and DESCRIBE HISTORY on a non-graft name is a plain parse error
      intercept[Exception] { spark.sql("DESCRIBE HISTORY graft.sales") }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft.sales")
      spark.sql("DROP DATABASE IF EXISTS graft")
    }
    // a temp view shadows any same-named graft table: DML targeting
    // the view name must not resolve through the catalog path
    val root = freshRoot()
    Seq((1L, "a")).toDF("id", "s").write.format("graft").save(root)
    spark.sql(s"CREATE TABLE shadowed USING graft LOCATION '$root'")
    try {
      Seq((99L, "view")).toDF("id", "s").createOrReplaceTempView("shadowed")
      val e = intercept[Exception] { spark.sql("DELETE FROM shadowed WHERE id = 1") }
      assert(!e.getMessage.contains("TxnLog"), e.getMessage)
      assert(spark.read.format("graft").load(root).count() == 1L)
      spark.catalog.dropTempView("shadowed")
    } finally spark.sql("DROP TABLE IF EXISTS shadowed")
  }

  test("query-position time travel: VERSION AS OF / TIMESTAMP AS OF ≡ the option form") {
    val root = freshRoot()
    Seq((1L, "a")).toDF("id", "s").write.format("graft").save(root)
    Seq((2L, "b")).toDF("id", "s").write.format("graft")
      .mode(SaveMode.Append).save(root)
    Seq((3L, "c")).toDF("id", "s").write.format("graft")
      .mode(SaveMode.Append).save(root)
    // SQL form == option form at a pinned version
    val sql0 = spark.sql(s"SELECT id, s FROM graft.`$root` VERSION AS OF 1 ORDER BY id")
      .collect().toSeq
    val opt0 = spark.read.format("graft").option("versionAsOf", 1).load(root)
      .select("id", "s").orderBy("id").collect().toSeq
    assert(sql0 == opt0 && sql0.size == 2)
    // timestamp form: pin to the LAST commit's mtime → full table
    val tsMax = new java.io.File(s"$root/_graft_log").listFiles()
      .filter(_.getName.endsWith(".json")).map(_.lastModified).max
    val tsStr = new java.sql.Timestamp(tsMax).toString.stripSuffix(".0")
    val viaTs = spark.sql(
      s"SELECT count(*) AS n FROM graft.`$root` TIMESTAMP AS OF '$tsStr'")
      .head.getLong(0)
    assert(viaTs == 3L, s"TIMESTAMP AS OF '$tsStr' served $viaTs rows")
    // joins against a pinned version work in one statement
    val joined = spark.sql(
      s"""SELECT cur.id FROM graft.`$root` cur
         |LEFT ANTI JOIN graft.`$root` VERSION AS OF 0 old ON cur.id = old.id
         |ORDER BY cur.id""".stripMargin).collect().map(_.getLong(0)).toSeq
    assert(joined == Seq(2L, 3L)) // rows appended after v0
    // named tables time travel too
    spark.sql(s"CREATE TABLE tt_named USING graft LOCATION '$root'")
    try
      assert(spark.sql("SELECT count(*) FROM tt_named VERSION AS OF 0").head.getLong(0) == 1L)
    finally spark.sql("DROP TABLE IF EXISTS tt_named")
  }

  test("table_changes('t', start [, end]) serves the CDF through SQL — path, name, end bound, timestamp bound") {
    val root = freshRoot()
    Seq((1L, "a")).toDF("id", "s").write.format("graft").save(root)             // v0
    Seq((2L, "b")).toDF("id", "s").write.format("graft")
      .mode(SaveMode.Append).save(root)                                          // v1
    spark.sql(s"DELETE FROM graft.`$root` WHERE id = 1")                         // v2
    // path form: every change from v1 on
    val all = spark.sql(s"SELECT id, _change_type, _commit_version FROM table_changes('$root', 1) ORDER BY _commit_version, id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(all == Seq((2L, "insert", 1L), (1L, "delete", 2L)), all.toString)
    // end bound scopes the range
    assert(spark.sql(s"SELECT count(*) FROM table_changes('$root', 1, 1)").head.getLong(0) == 1L)
    // == the option-form read
    val opt = spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", 1).load(root)
      .select("id", "_change_type", "_commit_version").orderBy("_commit_version", "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(opt == all)
    // a catalog-named table resolves too
    spark.sql(s"CREATE TABLE tc_named USING graft LOCATION '$root'")
    try
      assert(spark.sql("SELECT count(*) FROM table_changes('tc_named', 1)").head.getLong(0) == 2L)
    finally spark.sql("DROP TABLE IF EXISTS tc_named")
    // a timestamp start bound resolves at-or-before through log mtimes:
    // the last manifest's own mtime pins the final version
    val tsMax = new java.io.File(s"$root/_graft_log").listFiles()
      .filter(_.getName.endsWith(".json")).map(_.lastModified).max
    val tsStr = new java.sql.Timestamp(tsMax).toString.stripSuffix(".0")
    assert(spark.sql(s"SELECT count(*) FROM table_changes('$root', '$tsStr')").head.getLong(0) >= 1L)
    // a non-graft target is left to Spark's own resolution (unknown
    // function), never half-claimed
    val e = intercept[Exception] { spark.sql("SELECT * FROM table_changes('nope', 1)") }
    assert(!e.getMessage.contains("TxnLog"), e.getMessage)
  }

  test("MERGE clause surface: conditional update, matched delete, multi-clause, explicit insert, NMBS update") {
    val root = freshRoot()
    Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"), (4L, 40L, "d"))
      .toDF("id", "n", "s").write.format("graft").save(root)
    Seq((1L, 100L, "s1"), (2L, 200L, "s2"), (5L, 500L, "s5"), (6L, 6L, "s6"))
      .toDF("id", "n", "s").createOrReplaceTempView("clauses_src")
    // conditional update + matched delete (first-match-wins), explicit-
    // column conditional insert, NMBS conditional update
    spark.sql(
      s"""MERGE INTO graft.`$root` AS t USING clauses_src AS s ON t.id = s.id
         |WHEN MATCHED AND s.n >= 200 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET n = t.n + s.n, s = concat(t.s, s.s)
         |WHEN NOT MATCHED AND s.n > 100 THEN INSERT (id, s) VALUES (s.id, upper(s.s))
         |WHEN NOT MATCHED BY SOURCE AND t.id = 4 THEN UPDATE SET s = 'survivor'
         |""".stripMargin)
    val got = spark.read.format("graft").load(root).orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, 110L, "as1"),     // matched, second clause: n=10+100, s=concat
      // id=2 deleted by the first matched clause (s.n=200 >= 200)
      (3L, 30L, "c"),        // matched nothing in source → untouched
      (4L, 40L, "survivor"), // NMBS conditional update
      (5L, -1L, "S5")        // conditional explicit insert, n NULL-filled
      // id=6 failed the insert condition (n=6 ≤ 100) → not inserted
    ), got.toString)
    // the rewrite rode the real protocol: one replace commit
    assert(TxnLog.versions(spark, root).map(_._2) == Seq("overwrite", "replace"))
    // matched-delete only (no insert clause): pure clause subset works
    spark.sql(
      s"""MERGE INTO graft.`$root` AS t USING clauses_src AS s ON t.id = s.id
         |WHEN MATCHED AND s.s = 's1' THEN DELETE""".stripMargin)
    assert(spark.read.format("graft").load(root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L, 5L))
    // insert-only merge: no rewrite — lands as an append commit
    spark.sql(
      s"""MERGE INTO graft.`$root` AS t USING clauses_src AS s ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT (id, n, s) VALUES (s.id, s.n, s.s)""".stripMargin)
    assert(TxnLog.versions(spark, root).map(_._2).last == "append")
    assert(spark.read.format("graft").load(root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // a source column literally named "matched" must not collide with
    // the internal join marker (it prefixes into the source namespace)
    val root2 = freshRoot()
    Seq((1L, false), (2L, false)).toDF("id", "matched")
      .write.format("graft").save(root2)
    Seq((2L, true), (7L, true)).toDF("id", "matched")
      .createOrReplaceTempView("clauses_mcol")
    spark.sql(
      s"""MERGE INTO graft.`$root2` AS t USING clauses_mcol AS s ON t.id = s.id
         |WHEN MATCHED AND s.matched THEN UPDATE SET matched = s.matched
         |WHEN NOT MATCHED AND s.matched THEN INSERT (id, matched) VALUES (s.id, s.matched)
         |""".stripMargin)
    val got2 = spark.read.format("graft").load(root2).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(got2 == Seq((1L, false), (2L, true), (7L, true)), got2.toString)
  }
}
