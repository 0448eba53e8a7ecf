package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.functions.GraftFunctions

class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("native codegen cosine/dot ≡ lambda-builtin formulation, bit-for-bit") {
    val rows = df.select(
      Similarity.cosineNative(col("a"), col("b")).as("nc"),
      Similarity.cosine(col("a"), col("b")).as("hc"),
      Similarity.dotNative(col("a"), col("b")).as("nd"),
      Similarity.dot(col("a"), col("b")).as("hd")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // exact: same eval order
      assert(r.getDouble(2) === r.getDouble(3))
    }
  }

  test("registered in SQL; float arrays arrive via implicit cast") {
    val f = Seq((1L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("id", "x", "y")
    f.createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT graft_cosine(x, y) AS c, graft_dot(x, y) AS d FROM vecs").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) === 14.0)
    // null input → null out (BinaryExpression default null handling)
    assert(spark.sql("SELECT graft_dot(NULL, array(1.0d)) IS NULL AS n")
      .head().getBoolean(0))
  }

  test("zero-norm vectors: cosine is 0.0, never NaN (all eval paths)") {
    // NaN would pass every >= threshold filter and win every desc
    // top-k under Spark's NaN-is-greatest semantics — a padding/dead
    // vector must be similar to nothing instead
    val z = Seq((1L, Array.fill(4)(0.0), Array(1.0, 2.0, 3.0, 4.0)))
      .toDF("id", "a", "b")
    // codegen path (repartition keeps it off ConvertToLocalRelation)
    val r = z.repartition(2).select(
      Similarity.cosineNative(col("a"), col("b")).as("nc"),
      Similarity.cosine(col("a"), col("b")).as("hc"),
      Similarity.cosineNative(col("a"), col("a")).as("zz")).head()
    assert(r.getDouble(0) === 0.0 && r.getDouble(1) === 0.0
      && r.getDouble(2) === 0.0)
    // interpreted path (local relation pre-evaluates driver-side)
    val i = z.select(Similarity.cosineNative(col("a"), col("b"))).head()
    assert(i.getDouble(0) === 0.0)
  }

  test("dirty input fails fast: length mismatch and null elements throw") {
    GraftFunctions.register(spark)
    def failsWith(sql: String, msgPart: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      def has(t: Throwable): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains(msgPart)) || has(t.getCause))
      assert(has(e), s"expected '$msgPart' in: $e")
    }
    // a corrupted 3-element row against a 64-dim query would otherwise
    // return a plausible truncated similarity and pass threshold filters
    failsWith(
      "SELECT graft_cosine(array(1.0d, 2.0d), array(1.0d, 2.0d, 3.0d))",
      "length mismatch")
    failsWith(
      "SELECT graft_dot(array(1.0d), array(1.0d, 2.0d))",
      "length mismatch")
    // a null element would read as 0.0 from unsafe rows (silent) or
    // NPE (interpreted) — both replaced by a named error
    failsWith(
      "SELECT graft_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d))",
      "null vector element")
    // codegen path too (repartition off the local-relation fast path)
    import spark.implicits._
    val bad = Seq((1L, Array(1.0, 2.0), Array(1.0, 2.0, 3.0)))
      .toDF("id", "a", "b").repartition(2)
    val e = intercept[Exception] {
      bad.select(Similarity.dotNative(col("a"), col("b"))).collect()
    }
    def has(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("length mismatch")) || has(t.getCause))
    assert(has(e))
  }

  test("wrong arity gets a named error, not IndexOutOfBounds") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1.0d))").collect()
    }
    def has(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("exactly 2 arguments")) || has(t.getCause))
    assert(has(e), s"got: $e")
  }

  test("expression participates in whole-stage codegen") {
    // repartition prevents ConvertToLocalRelation from pre-evaluating
    // the projection driver-side; AQE finalizes the plan only after
    // execution, so run it before inspecting
    val q = df.repartition(2)
      .select(Similarity.cosineNative(col("a"), col("b")))
    q.collect()
    // AQE renders codegen stages as "*(n) Project" — the star is the
    // WholeStageCodegen marker
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
