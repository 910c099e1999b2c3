package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.plans.Lineage

class LineageSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("lineage traces join + aggregate outputs to their scan columns") {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val q = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    val lin = Lineage.columns(q)
    assert(lin("revenue") == Set("lineitem.parquet.l_extendedprice",
      "lineitem.parquet.l_discount"), lin("revenue"))
    assert(lin("o_orderpriority") == Set("orders.parquet.o_orderpriority"))
  }

  test("lineage resolves through alias chains, windows, and generators") {
    val docs = Tables.documents(spark, dir)
    val q = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"),
        col("source"))
      .withColumn("t2", col("term"))
      .groupBy("source")
      .agg(count(col("t2")).as("n_terms"))
    val lin = Lineage.columns(q)
    assert(lin("n_terms") == Set("documents.parquet.text"), lin("n_terms"))
    assert(lin("source") == Set("documents.parquet.source"))
  }

  test("lineage merges union branches position-wise") {
    val a = Tables.documents(spark, dir).select(col("doc_id").as("k"))
    val b = Tables.embeddings(spark, dir).select(col("vec_id").as("k"))
    val lin = Lineage.columns(a.union(b))
    assert(lin("k") == Set("documents.parquet.doc_id",
      "embeddings.parquet.vec_id"), lin("k"))
  }

  test("lineage of a local relation labels sources as local") {
    val df = Seq((1, "x")).toDF("a", "b").select((col("a") + 1).as("c"))
    val lin = Lineage.columns(df)
    // toDF("a","b") is itself an alias layer over the tuple relation,
    // so the TRUE source is the local relation's _1
    assert(lin("c") == Set("local._1"), lin("c"))
  }
}
