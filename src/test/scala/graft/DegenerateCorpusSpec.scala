package graft

/** Robustness net: EVERY registered query must materialize (not
  * necessarily return rows) on a 3-row-per-table corpus. Filters and
  * joins leave empty intermediates everywhere at this size, so the
  * whole registry's null/empty handling — scalar `.head()` patterns,
  * divisions by empty totals, windows over nothing — is exercised in
  * one pass. Schemas come from the real driver corpus (limit 3), so
  * the fixture never drifts from the contract.
  */
class DegenerateCorpusSpec extends SparkSpec {

  test("every registered query survives a 3-row corpus") {
    val src = "/root/testdata/sf0.001"
    assume(new java.io.File(src).isDirectory)
    val dir = tmpDir("degenerate")
    graft.queries.Tables.names.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(3)
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
      s"degenerate corpus:\n${failures.mkString("\n")}")
  }
}
