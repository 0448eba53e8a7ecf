package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Daily-sales analytics + anomaly scoring — the engine twin of
  * `pipeline/ml/anomaly_detection.py`.
  */
object Anomaly {

  /** `SELECT purchase_date, SUM(final_amount), COUNT(transaction_id)
    * GROUP BY purchase_date ORDER BY purchase_date`
    * (`anomaly_detection.py:25-33`). Hash aggregate; partial agg
    * map-side; one shuffle on the date key.
    */
  def dailySales(fct: DataFrame): DataFrame =
    fct.groupBy(col("purchase_date"))
      .agg(
        sum(col("final_amount")).as("daily_total_sales"),
        count(col("transaction_id")).as("daily_transaction_count"))
      .orderBy(col("purchase_date"))

  /** Pluggable scorer with the reference's output contract:
    * `anomaly_score` double (lower = more anomalous) and `is_anomaly`
    * boolean (`anomaly_detection.py:50-52`).
    */
  trait AnomalyScorer extends Serializable {
    def score(daily: DataFrame): DataFrame
  }

  /** Deterministic robust-z scorer with the reference's output
    * contract: same features — log1p of
    * (daily_total_sales, daily_transaction_count) — scored by modified
    * z-score (median/MAD, the 0.6745 consistency constant). Fully
    * SQL-expressible, so q13 stays a hash-checked oracle query
    * (SURVEY.md §2.10 M2); [[IsolationForestScorer]] is the genuine
    * forest equivalent of `anomaly_detection.py:47`.
    *
    * anomaly_score = −max(|z_sales|, |z_count|) (lower = more
    * anomalous, like decision_function); is_anomaly at |z| > cutoff.
    */
  final case class RobustZScorer(cutoff: Double = 3.5) extends AnomalyScorer {
    def score(daily: DataFrame): DataFrame = {
      val feats = daily
        .withColumn("f1", log1p(col("daily_total_sales")))
        .withColumn("f2", log1p(col("daily_transaction_count")))
      val stats = feats.agg(
        expr("percentile(f1, 0.5)").as("med1"),
        expr("percentile(f2, 0.5)").as("med2")).crossJoin(feats)
      // MAD per feature (scalar aggregates; two tiny exchanges)
      val mads = stats
        .agg(
          expr("percentile(abs(f1 - med1), 0.5)").as("mad1"),
          expr("percentile(abs(f2 - med2), 0.5)").as("mad2"),
          avg(abs(col("f1") - col("med1"))).as("meanad1"),
          avg(abs(col("f2") - col("med2"))).as("meanad2"),
          first(col("med1")).as("med1"), first(col("med2")).as("med2"))
      // MAD=0 (an over-half-constant feature) must not null out the
      // whole feature and mask true outliers: fall back to the mean
      // absolute deviation with its consistency constant (Iglewicz &
      // Hoaglin, z = (x−med)/(1.253314·meanAD)); if meanAD is also 0
      // the feature is fully constant and z stays null → coalesce(…,0)
      def z(f: String, med: String, mad: String, meanad: String) =
        when(col(mad) =!= 0.0,
          lit(0.6745) * (col(f) - col(med)) / col(mad))
          .otherwise((col(f) - col(med))
            / nullif(lit(1.253314) * col(meanad), lit(0.0)))
      feats.crossJoin(mads)
        .withColumn("z1", z("f1", "med1", "mad1", "meanad1"))
        .withColumn("z2", z("f2", "med2", "mad2", "meanad2"))
        .withColumn("max_abs_z",
          greatest(coalesce(abs(col("z1")), lit(0.0)),
            coalesce(abs(col("z2")), lit(0.0))))
        .withColumn("anomaly_score", -col("max_abs_z"))
        .withColumn("is_anomaly", col("max_abs_z") > cutoff)
        .select(col("purchase_date"), col("daily_total_sales"),
          col("daily_transaction_count"), col("anomaly_score"),
          col("is_anomaly"))
        .orderBy(col("purchase_date"))
    }
  }

  /** Seeded deterministic Isolation Forest (Liu/Ting/Zhou 2008) — the
    * real counterpart of the reference's
    * `IsolationForest(n_estimators=100, random_state=42)`
    * (`pipeline/ml/anomaly_detection.py:47-52`), same feature prep
    * (log1p of the two daily aggregates) and same output contract:
    * `anomaly_score` = sklearn's decision_function (score_samples −
    * auto offset −0.5; LOWER = more anomalous), `is_anomaly` ⇔
    * anomaly_score < 0.
    *
    * Scale shape: the input is ONE ROW PER CALENDAR DAY (bounded by
    * time, not data volume — a century is 36.5k rows), so fitting on
    * the driver is bounded by domain, not corpus size. That cardinality
    * assumption is the trainer's one load-bearing bound: if the key
    * ever stops being a calendar day (e.g. repurposed per-entity) and
    * distinct keys approach ~10⁶, guard the collect with a seeded
    * `.orderBy(rand(seed)).limit(nTrees * subsample)` — the fit never
    * reads more rows than that anyway, so the cap changes nothing at
    * day scale while keeping the driver safe at any scale. Trees are
    * tiny
    * (ψ ≤ 256 ⇒ depth ≤ 8) and ship to executors inside the scoring
    * closure, which evaluates map-side. With a fixed seed the fit and
    * every score are bit-reproducible run to run.
    */
  final case class IsolationForestScorer(nTrees: Int = 100, seed: Long = 42L,
      subsample: Int = 256) extends AnomalyScorer {
    // fail loudly at construction, not as an ArrayIndexOutOfBounds in
    // grow() (subsample 0) or silent all-NaN scores that never flag
    // (nTrees 0 -> 0/0): the EventGenerator require convention
    require(nTrees >= 1, s"nTrees must be >= 1: $nTrees")
    require(subsample >= 1, s"subsample must be >= 1: $subsample")

    // tree nodes in struct-of-arrays form: feature<0 marks a leaf whose
    // split slot stores the adjusted external-node size term c(n)
    private final class Tree(val feature: Array[Int], val split: Array[Double],
      val left: Array[Int], val right: Array[Int]) extends Serializable

    private def harmonic(i: Int): Double =
      if (i <= 0) 0.0 else math.log(i) + 0.5772156649015329

    /** Average unsuccessful-search path length c(n) in a BST. */
    private def c(n: Int): Double =
      if (n <= 1) 0.0 else 2.0 * harmonic(n - 1) - 2.0 * (n - 1.0) / n

    private def buildTree(data: Array[Array[Double]], rnd: scala.util.Random,
        maxDepth: Int): Tree = {
      val feats = scala.collection.mutable.ArrayBuffer[Int]()
      val splits = scala.collection.mutable.ArrayBuffer[Double]()
      val ls = scala.collection.mutable.ArrayBuffer[Int]()
      val rs = scala.collection.mutable.ArrayBuffer[Int]()
      def grow(idx: Array[Int], depth: Int): Int = {
        val node = feats.length
        feats += -1; splits += 0.0; ls += -1; rs += -1
        val dims = data(0).length
        // leaf when exhausted, singleton, or all points identical
        val constant = (0 until dims).forall { f =>
          idx.forall(i => data(i)(f) == data(idx(0))(f))
        }
        if (depth >= maxDepth || idx.length <= 1 || constant) {
          splits(node) = c(idx.length)
          return node
        }
        // pick a random feature with spread, random cut in (min, max)
        var f = rnd.nextInt(dims)
        var tries = 0
        while (tries < dims &&
            idx.map(i => data(i)(f)).distinct.length <= 1) {
          f = (f + 1) % dims; tries += 1
        }
        val vals = idx.map(i => data(i)(f))
        val (lo, hi) = (vals.min, vals.max)
        val cut = lo + rnd.nextDouble() * (hi - lo)
        val (li, ri) = idx.partition(i => data(i)(f) < cut)
        if (li.isEmpty || ri.isEmpty) { // degenerate cut → leaf
          splits(node) = c(idx.length)
          return node
        }
        feats(node) = f; splits(node) = cut
        ls(node) = grow(li, depth + 1)
        rs(node) = grow(ri, depth + 1)
        node
      }
      grow(data.indices.toArray, 0)
      new Tree(feats.toArray, splits.toArray, ls.toArray, rs.toArray)
    }

    private def pathLength(t: Tree, x: Array[Double]): Double = {
      var node = 0; var depth = 0.0
      while (t.feature(node) >= 0) {
        node = if (x(t.feature(node)) < t.split(node)) t.left(node)
          else t.right(node)
        depth += 1.0
      }
      depth + t.split(node) // leaf's split slot holds c(leafSize)
    }

    def score(daily: DataFrame): DataFrame = {
      val spark = daily.sparkSession
      // coalesce-to-0 AND clamp-at-0: a NULL daily sum must not NPE
      // the driver collect below, and a NEGATIVE total <= -1 (corrupt
      // but complete envelopes, e.g. negative prices) must not either —
      // Spark's log1p returns null for x <= -1, which the coalesce
      // (input-side only) never sees. A negative total carries no
      // magnitude signal in this log-feature space; robust-z still
      // flags it through the raw values, so the scorers stay
      // non-divergent on the same dirty frame.
      val feats = daily
        .withColumn("f1",
          log1p(greatest(coalesce(col("daily_total_sales"), lit(0.0)),
            lit(0.0))))
        .withColumn("f2",
          log1p(greatest(coalesce(
            col("daily_transaction_count").cast("double"), lit(0.0)),
            lit(0.0))))
      // bounded collect: one row per day (see scaladoc). Sorted after
      // collection — collect() order follows partition layout, and the
      // seeded subsample indexes into this array, so an unsorted fit
      // would vary with shuffle-partition config
      val train: Array[Array[Double]] = feats.select(col("f1"), col("f2"))
        .collect().map(r => Array(r.getDouble(0), r.getDouble(1)))
        .sortBy(a => (a(0), a(1)))
      // empty history: nothing to fit — return the (empty) frame with
      // the scorer's schema instead of indexing into a 0-length array
      if (train.isEmpty)
        return feats
          .withColumn("anomaly_score", lit(0.0))
          .withColumn("is_anomaly", lit(false))
          .select(col("purchase_date"), col("daily_total_sales"),
            col("daily_transaction_count"), col("anomaly_score"),
            col("is_anomaly"))
      val rnd = new scala.util.Random(seed)
      val psi = math.min(subsample, train.length)
      val maxDepth = math.ceil(math.log(math.max(psi, 2)) / math.log(2)).toInt
      val trees = Array.fill(nTrees) {
        // seeded subsample without replacement (Fisher–Yates prefix)
        val idx = train.indices.toArray
        var i = 0
        while (i < psi) {
          val j = i + rnd.nextInt(idx.length - i)
          val t = idx(i); idx(i) = idx(j); idx(j) = t
          i += 1
        }
        buildTree(idx.take(psi).map(train), rnd, maxDepth)
      }
      val cPsi = c(psi)
      val scoreUdf = udf { (f1: Double, f2: Double) =>
        val x = Array(f1, f2)
        var s = 0.0
        var t = 0
        while (t < trees.length) { s += pathLength(trees(t), x); t += 1 }
        val eh = s / trees.length
        // psi=1 (single-day history) makes c(psi)=0 and -0/0 = NaN;
        // with one training point isolation is meaningless, so score
        // the neutral 0.5 (⇒ decision 0.0, not anomalous) instead
        val anomalyness =
          if (cPsi > 0) math.pow(2.0, -eh / cPsi) // ∈ (0,1], ↑ = anomalous
          else 0.5
        0.5 - anomalyness // sklearn decision_function with auto offset
      }
      feats
        .withColumn("anomaly_score", scoreUdf(col("f1"), col("f2")))
        .withColumn("is_anomaly", col("anomaly_score") < 0.0)
        .select(col("purchase_date"), col("daily_total_sales"),
          col("daily_transaction_count"), col("anomaly_score"),
          col("is_anomaly"))
        .orderBy(col("purchase_date"))
    }
  }
}
