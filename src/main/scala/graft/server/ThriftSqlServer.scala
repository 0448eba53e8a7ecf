package graft.server

import org.apache.spark.sql.SparkSession

/** JDBC/Thrift SQL endpoint over a graft session — the engine twin of
  * the reference's dbt-serving entry point: the reference runs
  * `HiveThriftServer2` as its container command and points dbt's
  * `method: thrift` profile at port 10000 with binary transport and
  * `auth: NONE` (`/root/reference/docker-compose.yml:60-78`,
  * `pipeline/dbt/ecommerce_analytics/profiles/profiles.yml:4-14`).
  * Here the same server class serves THIS engine's session — every
  * registered table/view and every graft native function
  * (GraftExtensions) is visible to any HiveServer2-protocol client
  * (dbt-spark, beeline, JDBC/ODBC BI tools) exactly as the in-process
  * `spark.sql` surface sees them.
  *
  * Scale posture: the Thrift server is a PROTOCOL front end — queries
  * plan and execute on the session's cluster like any other; nothing
  * result-sized is ever buffered beyond the fetch batch the client
  * pages through. `single.session=true` mirrors the reference's conf
  * (one shared session ⇒ temp views registered at startup are visible
  * to every connection — dbt's working model).
  */
object ThriftSqlServer {

  /** Start a HiveServer2-protocol endpoint on `host:port` serving
    * `spark`'s catalog. Returns a handle whose `close()` stops the
    * service (the SparkSession itself stays up — callers own it).
    *
    * The conf writes go through the session's runtime conf (the
    * server reads `hive.server2.*` from the active SQLContext), so no
    * hive-site.xml is needed — matching the reference's all-flags
    * startup.
    */
  def start(spark: SparkSession, port: Int,
      host: String = "127.0.0.1"): AutoCloseable = {
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", host)
    // binary transport + auth NONE (anonymous SASL-PLAIN — what a
    // stock hive-jdbc URL speaks): the reference profile's
    // `thrift_transport: binary` / `auth: NONE` contract
    spark.sqlContext.setConf("hive.server2.transport.mode", "binary")
    spark.sqlContext.setConf("hive.server2.authentication", "NONE")
    // single.session (one shared session ⇒ startup-registered temp
    // views visible to every connection — the reference's conf and
    // dbt's working model) is a STATIC SQL conf: it only takes effect
    // when set at session BUILD time (SqlServerMain does; TestSpark
    // does). On a pre-existing session this set throws — swallow it
    // and serve with whatever the session was built with.
    try spark.conf.set("spark.sql.hive.thriftserver.single.session", "true")
    catch { case _: Exception => }
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    new AutoCloseable { def close(): Unit = server.stop() }
  }

  /** A free loopback port from the kernel — for specs and ad-hoc
    * servers that must not collide with a fixed 10000.
    */
  def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }
}

/** Standalone server main — the `docker-compose` service twin: bring
  * up a graft session, register the corpus tables, serve until
  * killed. `GRAFT_THRIFT_PORT` (default 10000, the reference's port)
  * and `SPARK_GRAFT_SF_DIR` select the endpoint and the corpus.
  *
  * A dbt profile identical to the reference's (host 127.0.0.1, port
  * 10000, `method: thrift`, `thrift_transport: binary`) connects to
  * this main unchanged.
  */
object SqlServerMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val port = sys.env.getOrElse("GRAFT_THRIFT_PORT", "10000").toInt
    // single.session at BUILD time (static conf) — see start()
    val spark = graft.GraftSession
      .builder("local[*]", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.hive.thriftserver.single.session", "true")
      .getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    graft.queries.Tables.registerAll(spark, dir)
    val server = ThriftSqlServer.start(spark, port)
    System.err.println(s"[graft-sql] serving ${graft.queries.Tables.names.size} " +
      s"tables from $dir on jdbc:hive2://127.0.0.1:$port (Ctrl-C to stop)")
    try Thread.currentThread.join()
    finally server.close()
  }
}
