package graft

/** The registry's other boundary (DegenerateCorpusSpec covers 3 rows):
  * a fully EMPTY corpus — 0 rows, real schemas. Every registered query
  * must materialize an empty (or degenerate-but-defined) result, never
  * throw: empty partitions and 0-row source slices are routine at
  * 100 TB, and a query that crashes on them takes the whole stage
  * down.
  */
class EmptyCorpusSpec extends SparkSpec {

  test("every registered query survives an empty corpus") {
    val src = "/root/testdata/sf0.001"
    assume(new java.io.File(src).isDirectory)
    val dir = tmpDir("empty-corpus")
    graft.queries.Tables.names.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, run) =>
        try { run(spark, dir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}")
        }
    }
    assert(failures.isEmpty, s"${failures.size} queries fail on the " +
      s"empty corpus:\n${failures.mkString("\n")}")
  }
}
