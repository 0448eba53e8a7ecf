package graft.model

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** Single-source-of-truth entity model (SURVEY.md §1.2/§1.4).
  *
  * The reference triplicates the purchase schema (Python model
  * `pipeline/generator/models/purchase.py:1-25`, Spark StructType
  * `pipeline/spark/streaming_consumer.py:25-35`, repeated in
  * `pipeline/spark/trial.py:29-39`) and drifts on one field name:
  * the producer emits `add_supplements` while the Spark schema and
  * dbt model read `add_supplement` (→ NULL after from_json). Here the
  * schema is derived from one case class; the canonical field name is
  * `add_supplement` and the drift is covered by a regression test.
  */
final case class Purchase(
    transaction_time: Timestamp,
    transaction_id: String,
    product_id: String,
    price: Double,
    quantity: Int,
    is_member: Boolean,
    member_discount: Double,
    add_supplement: Boolean,
    supplement_price: Double)

/** Product dimension — `pipeline/generator/models/product.py:1-30`,
  * seeded from `pipeline/generator/data/products.csv` (propensity =
  * the cumulative `_RangeWeight` column, `producer.py:104`).
  */
final case class Product(
    product_id: String,
    category: String,
    item: String,
    size: String,
    cogs: Double,
    price: Double,
    inventory_level: Int,
    contains_fruit: Boolean,
    contains_veggies: Boolean,
    contains_nuts: Boolean,
    contains_caffeine: Boolean,
    propensity_to_buy: Int)

/** Inventory change event — `pipeline/generator/models/inventory.py:1-14`,
  * emitted on restock (`producer.py:169-181`).
  */
final case class InventoryEvent(
    event_time: Timestamp,
    product_id: String,
    existing_level: Int,
    stock_quantity: Int,
    new_level: Int)

/** Gold fact row — output schema of
  * `pipeline/dbt/.../models/gold/fct_purchases.sql:40-47`.
  */
final case class FactPurchase(
    transaction_id: String,
    product_id: String,
    purchase_date: Date,
    final_amount: Double,
    is_member: Boolean,
    ingestion_timestamp: Timestamp)

/** Daily aggregate + anomaly columns —
  * `pipeline/ml/anomaly_detection.py:25-33,50-52`.
  */
final case class DailySales(
    purchase_date: Date,
    daily_total_sales: Double,
    daily_transaction_count: Long,
    anomaly_score: Double,
    is_anomaly: Boolean)

object Schemas {
  /** Canonical purchase wire schema (what from_json parses). */
  val purchase: StructType = Encoders.product[Purchase].schema
  val product: StructType = Encoders.product[Product].schema
  val inventoryEvent: StructType = Encoders.product[InventoryEvent].schema
  val factPurchase: StructType = Encoders.product[FactPurchase].schema
}

/** The two (deliberately different) money formulas in the reference —
  * SURVEY.md §2.4 F7. Gold's is canonical downstream.
  */
object Money {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.lit

  /** `fct_purchases.sql:35`: supplement added once per transaction,
    * after the discount.
    */
  def goldFinalAmount(price: Double, quantity: Int, memberDiscount: Double,
      supplementPrice: Double): Double =
    price * quantity * (1 - memberDiscount) + supplementPrice

  /** Column form of the same formula — the ONE place it is spelled for
    * DataFrame pipelines (Gold.fctPurchases, streaming windowed sales).
    */
  def goldFinalAmountCol(price: Column, quantity: Column,
      memberDiscount: Column, supplementPrice: Column): Column =
    price * quantity * (lit(1) - memberDiscount) + supplementPrice

  /** `purchase.py:23-25`: supplement per unit, inside the discount,
    * rounded to cents.
    */
  def producerTotalPurchase(price: Double, quantity: Int,
      memberDiscount: Double, supplementPrice: Double): Double =
    math.round(quantity * (price + supplementPrice) * (1 - memberDiscount)
      * 100.0) / 100.0
}
