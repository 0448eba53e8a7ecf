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
  trait AnomalyScorer {
    def score(daily: DataFrame): DataFrame
  }

  /** Deterministic stand-in for the reference's IsolationForest
    * (`anomaly_detection.py:46-52`): same features — log1p of
    * (daily_total_sales, daily_transaction_count) — scored by modified
    * z-score (median/MAD, the 0.6745 consistency constant). sklearn's
    * forest is not reproducible across implementations, so a
    * deterministic robust scorer keeps the oracle harness meaningful
    * (SURVEY.md §2.10 M2); the trait is the seam for a forest port.
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
          first(col("med1")).as("med1"), first(col("med2")).as("med2"))
      feats.crossJoin(mads)
        .withColumn("z1",
          lit(0.6745) * (col("f1") - col("med1")) / nullif(col("mad1"), lit(0.0)))
        .withColumn("z2",
          lit(0.6745) * (col("f2") - col("med2")) / nullif(col("mad2"), lit(0.0)))
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
}
