package graft

import org.apache.spark.sql.functions._
import graft.ext.{Similarity, Skew}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 1 hot key with 50k rows + 100 cold keys
  private lazy val skewed = spark.range(50000).select(lit("HOT").as("k"),
      (col("id") % 7).cast("double").as("v"))
    .union(spark.range(5000).select(
      concat(lit("cold-"), (col("id") % 100)).as("k"),
      col("id").cast("double").as("v")))

  test("salted sum/count aggregation == plain groupBy") {
    val plain = skewed.groupBy(col("k")).agg(sum("v").as("total"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSumCount(skewed, col("k"), col("v"), buckets = 8)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, (t, n)) =>
      assert(n === plain(k)._2, k)
      assert(math.abs(t - plain(k)._1) < 1e-6 * math.max(1.0, math.abs(plain(k)._1)), k)
    }
  }

  test("salted join == plain join (row multiset)") {
    val right = Seq(("HOT", 1), ("cold-1", 2), ("cold-2", 3)).toDF("k", "tag")
    val plain = skewed.join(right, Seq("k")).groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val salted = Skew.saltedJoin(skewed, right, "k", buckets = 8)
      .groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(salted === plain)
  }
}

class BucketedJoinSpec extends SparkSpec {
  test("bucketed tables co-locate: join plans without a shuffle on either side") {
    import spark.implicits._
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    // at sf0.001 AQE would broadcast the small side and hide the
    // co-location; force the shuffle-join path the property is about
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan = try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      joined.collect()
      joined.queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    // co-located + co-sorted: SortMergeJoin with no exchange below it
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_lineitem")
  }
}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF kNN recall ≥ 0.9 vs brute force at nProbe=8/16 cells") {
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 300).map { i =>
      val center = Array.fill(16)(0.0f)
      center(i % 5) = 1.0f
      (i.toLong, center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.2f))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 20)
    val truth = Similarity.bruteForceKnn(emb, queries, k = 5)
      .select("q_vec", "n_vec").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (indexed, cents) = Similarity.ivfIndex(emb, nCells = 16)
    val got = Similarity.ivfKnn(indexed, cents, queries, k = 5, nProbe = 8)
      .select("q_vec", "n_vec").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall=$recall (${(got & truth).size}/${truth.size})")
  }

  test("IVF index assigns every vector to exactly one of nCells cells") {
    val rnd = new scala.util.Random(9)
    val emb = (0 until 100).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val (indexed, cents) = Similarity.ivfIndex(emb, nCells = 4)
    val cells = indexed.select("cell_id").distinct().collect().map(_.getInt(0))
    assert(indexed.count() === 100)
    assert(cells.forall(c => c >= 0 && c < cents.length))
  }
}

class KafkaEnvelopeSpec extends SparkSpec {
  import java.sql.Timestamp
  import graft.ingest.Silver
  import graft.model.Purchase
  import graft.streaming.StreamingSilver

  test("to_json envelope round-trips through the Silver parser (K7→S1)") {
    import spark.implicits._
    val ts = Timestamp.valueOf("2025-06-01 10:00:00")
    val p = Purchase(ts, "42", "SF03", 5.99, 2, true, 0.10, true, 1.99)
    val envelope = StreamingSilver.toKafkaEnvelope(Seq(p).toDS().toDF())
    assert(envelope.columns.toSeq === Seq("value"))
    val back = Silver.parsePurchases(envelope, ingestionTs = lit(ts)).head()
    assert(back.getAs[String]("transaction_id") === "42")
    assert(back.getAs[Double]("price") === 5.99)
    assert(back.getAs[Timestamp]("transaction_time") === ts)
  }
}
