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
        numCol("COGS", "double").as("cogs"),
        numCol("Price", "double").as("price"),
        numCol("Inventory", "int").as("inventory_level"),
        boolCol("ContainsFruit").as("contains_fruit"),
        boolCol("ContainsVeggies").as("contains_veggies"),
        boolCol("ContainsNuts").as("contains_nuts"),
        boolCol("ContainsCaffeine").as("contains_caffeine"),
        numCol("_RangeWeight", "int").as("propensity_to_buy"))
      .as[Product](Encoders.product[Product])
  }

  /** `str(value).lower() == "true"` (producer.py:199-200): a
    * blank/missing cell is `str(None).lower() != "true"` → FALSE in
    * the reference, so it must load as false here too — a raw NULL
    * would instead crash the non-nullable Boolean encoder field with
    * an opaque deserialization error.
    */
  private def boolCol(name: String) =
    coalesce(lower(col(name)) === "true", lit(false))

  /** Required numeric seed cell: a blank or untypeable value gets a
    * NAMED error naming the column (the reference's float()/int()
    * would raise ValueError there; the unguarded cast here would
    * instead surface as an opaque non-nullable-encoder crash rows
    * later).
    */
  private def numCol(name: String, t: String) = {
    val c = col(name).cast(t)
    when(c.isNull, raise_error(concat(
      lit(s"products.csv: blank or untypeable $name cell: "),
      coalesce(col(name), lit("<missing>"))))).otherwise(c)
  }
}
