package graft

import graft.server.ThriftSqlServer

/** Live JDBC round-trip for the Thrift SQL endpoint (reference entry
  * point C — the dbt-serving seam, r6 VERDICT ask #4): start the
  * server over the shared test session, connect with the stock
  * hive-jdbc driver, run a REGISTERED query through the wire, and
  * check the rows equal the in-process result.
  *
  * Self-gating like KafkaIntegrationSpec: where the Spark
  * hive-thriftserver or the hive-jdbc client is off the classpath, or
  * loopback binding is forbidden, the tests CANCEL instead of fail.
  * In this container both jars ship with the Spark distribution, so
  * the spec runs for real — the seam is verified, not just compiled.
  */
class ThriftServerSpec extends SparkSpec {

  private def classpathReady: Boolean =
    scala.util.Try(Class.forName(
      "org.apache.spark.sql.hive.thriftserver.HiveThriftServer2")).isSuccess &&
      scala.util.Try(Class.forName("org.apache.hive.jdbc.HiveDriver")).isSuccess

  /** Connect with retries: HiveServer2 binds its port asynchronously
    * after startWithContext returns.
    */
  private def connect(port: Int): java.sql.Connection = {
    val url = s"jdbc:hive2://127.0.0.1:$port/default"
    var last: Throwable = null
    var tries = 0
    while (tries < 60) {
      try return java.sql.DriverManager.getConnection(url, "anonymous", "")
      catch { case e: Throwable => last = e; tries += 1; Thread.sleep(500) }
    }
    throw new IllegalStateException(s"thrift server never came up on $port", last)
  }

  test("JDBC client runs a registered query through the Thrift endpoint") {
    assume(classpathReady, "hive-thriftserver / hive-jdbc not on classpath")
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val canBind = scala.util.Try(ThriftSqlServer.freePort()).isSuccess
    assume(canBind, "loopback bind forbidden in this sandbox")

    // GLOBAL temp views: visible to every session, so the check holds
    // whether the server shares the session (single.session=true, the
    // production SqlServerMain build) or clones one per connection
    // (the shared test session may predate that static conf — an
    // earlier suite's GraftSession.create wins getOrCreate). The
    // registered query's JDBC rows must equal the in-process collect
    // of the SAME plan.
    val q = SparkEntry.queries("q01_pricing_summary")(spark, dir)
    q.createOrReplaceGlobalTempView("q01_over_thrift")
    // the graft native function resolves at VIEW CREATION in this
    // session; serving it over the wire then proves the server
    // executes the graft Catalyst expression regardless of what the
    // per-connection session has registered
    graft.queries.Tables.load(spark, dir, "lineitem")
      .createOrReplaceGlobalTempView("lineitem_g")
    graft.functions.GraftFunctions.register(spark)
    spark.sql(
      "SELECT graft_cosine(array(cast(1.0 as float), cast(0.0 as float)), " +
        "array(cast(1.0 as float), cast(0.0 as float))) AS cos")
      .createOrReplaceGlobalTempView("cos_probe")
    val expected = q.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

    val port = ThriftSqlServer.freePort()
    val server = ThriftSqlServer.start(spark, port)
    try {
      val conn = connect(port)
      try {
        val st = conn.createStatement()
        val rs = st.executeQuery(
          "SELECT * FROM global_temp.q01_over_thrift")
        val md = rs.getMetaData
        val got = scala.collection.mutable.ListBuffer[String]()
        while (rs.next())
          got += (1 to md.getColumnCount)
            .map(i => String.valueOf(rs.getObject(i))).mkString("|")
        assert(got.nonEmpty, "no rows over the wire")
        assert(got.toSeq.sorted === expected.sorted)

        // a corpus table and a graft native-expression view — the two
        // surfaces a dbt model would touch — served over the same wire
        val rs2 = st.executeQuery(
          "SELECT (SELECT count(*) FROM global_temp.lineitem_g) AS n, " +
            "round(cos, 3) AS cos FROM global_temp.cos_probe")
        assert(rs2.next() && rs2.getLong(1) > 0 && rs2.getDouble(2) === 1.0)
      } finally conn.close()
    } finally server.close()
  }
}
