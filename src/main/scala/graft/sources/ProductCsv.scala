package graft.sources

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Product

/** Product dimension seed loader — the engine twin of the reference's
  * positional CSV read (`pipeline/generator/producer.py:82-113` over
  * `pipeline/generator/data/products.csv`). Header-driven instead of
  * positional, with the reference's `lower(x) == "true"` bool parse
  * (F12, `producer.py:199-200`) and `_RangeWeight` → propensity_to_buy
  * (`producer.py:104`).
  */
object ProductCsv {

  def load(spark: SparkSession, path: String): Dataset[Product] = {
    val raw = spark.read
      .option("header", "true")
      .csv(path)
    raw.select(
        col("ID").as("product_id"),
        col("Category").as("category"),
        col("Item").as("item"),
        col("Size").as("size"),
        col("COGS").cast("double").as("cogs"),
        col("Price").cast("double").as("price"),
        col("Inventory").cast("int").as("inventory_level"),
        boolCol("ContainsFruit").as("contains_fruit"),
        boolCol("ContainsVeggies").as("contains_veggies"),
        boolCol("ContainsNuts").as("contains_nuts"),
        boolCol("ContainsCaffeine").as("contains_caffeine"),
        col("_RangeWeight").cast("int").as("propensity_to_buy"))
      .as[Product](Encoders.product[Product])
  }

  /** `str(value).lower() == "true"` (producer.py:199-200). */
  private def boolCol(name: String) =
    lower(col(name)) === "true"
}
