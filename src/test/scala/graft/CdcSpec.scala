package graft

import graft.gold.AtomicTable

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def vals(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().toSeq.sorted

  test("appendedBetween returns exactly the delta rows, from manifests only") {
    val root = tmpDir("cdc")
    val v0 = AtomicTable.append(spark, Seq(1L, 2L).toDF("id"), root)
    val v1 = AtomicTable.append(spark, Seq(3L).toDF("id"), root)
    val v2 = AtomicTable.append(spark, Seq(4L, 5L).toDF("id"), root)
    assert(vals(AtomicTable.appendedBetween(spark, root, v0, v2)) === Seq(3L, 4L, 5L))
    assert(vals(AtomicTable.appendedBetween(spark, root, v1, v2)) === Seq(4L, 5L))
    // -1 = since before the first commit → the whole table
    assert(vals(AtomicTable.appendedBetween(spark, root, -1, v2)) === (1L to 5L))
    // empty range keeps the schema usable
    val empty = AtomicTable.appendedBetween(spark, root, v2, v2)
    assert(empty.count() === 0 && empty.columns.sameElements(Array("id")))
    // the delta read opens only the delta's files
    assert(AtomicTable.appendedBetween(spark, root, v1, v2).inputFiles.length
      < AtomicTable.read(spark, root).inputFiles.length)
  }

  test("appendedBetween refuses ranges crossing a rewrite, allows ranges before it") {
    val root = tmpDir("cdc-rw")
    AtomicTable.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    val v1 = AtomicTable.append(spark, Seq((3L, "c")).toDF("id", "v"), root)
    val v2 = AtomicTable.merge(spark, Seq((2L, "B")).toDF("id", "v"), root, "id")
    intercept[IllegalStateException] {
      AtomicTable.appendedBetween(spark, root, v1, v2)
    }
    // pre-rewrite history remains incrementally readable
    assert(vals(AtomicTable.appendedBetween(spark, root, 0, v1)
      .select("id", "v")) === Seq(3L))
  }
}
