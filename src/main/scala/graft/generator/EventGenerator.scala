package graft.generator

import java.sql.Timestamp
import scala.collection.mutable
import scala.util.Random
import graft.model.{InventoryEvent, Product, Purchase}

/** Deterministic, seeded twin of the reference's Kafka producer
  * (`pipeline/generator/producer.py`): weighted product sampling over
  * the cumulative `_RangeWeight` ladder (`producer.py:131-134,203-204`),
  * member / quantity / supplement frequencies from
  * `configuration.ini:12-21`, and the per-product inventory state
  * machine with restock events (`producer.py:157-181`).
  *
  * Differences on purpose (SURVEY.md §7.4):
  *  - injectable base clock + fixed tick instead of wall-clock sleeps,
  *    so runs are reproducible and tests never sleep;
  *  - field name `add_supplement` (canonical) — the reference's
  *    producer-side `add_supplements` spelling is a schema-drift bug;
  *  - the JSON envelope still carries `total_purchase`
  *    (`purchase.py:23-25`) which ingest drops, like the reference.
  */
object EventGenerator {

  final case class Config(
      memberFreq: Int = 3,            // member w.p. 3/10  (configuration.ini:17)
      clubMemberDiscount: Double = 0.10, // configuration.ini:18
      itemQuantityOneFreq: Int = 24,  // quantity: randint(1,30): 30→3, ≤24→1, else 2
      addSuppFreqGroup1: Int = 5,     // product_id startswith SF/SC (producer.py:220-224)
      addSuppFreqGroup2: Int = 2,
      supplementsCost: Double = 1.99, // configuration.ini:21
      minInventory: Int = 10,         // configuration.ini:24
      restockAmount: Int = 15,        // configuration.ini:25
      tickMillis: Long = 500)         // ~2 events/s (producer.py:26-27)

  final case class Output(purchases: Seq[Purchase],
      inventoryEvents: Seq[InventoryEvent],
      finalLevels: Map[String, Int])

  /** Nearest value in the sorted cumulative-weight ladder
    * (`producer.py:203-204` closest_product_match) — binary search
    * instead of the reference's linear argmin; identical result.
    */
  def closestMatch(sorted: IndexedSeq[Int], k: Int): Int = {
    var lo = 0; var hi = sorted.length - 1
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (sorted(mid) < k) lo = mid + 1 else hi = mid
    }
    // lo = first index with value >= k; neighbor below may be closer
    if (lo > 0 && math.abs(sorted(lo - 1) - k) <= math.abs(sorted(lo) - k))
      sorted(lo - 1)
    else sorted(lo)
  }

  /** Generate `n` purchases (plus restock events) starting at `base`.
    * Mirrors the main loop of `producer.py:120-163`.
    */
  def generate(products: Seq[Product], n: Int, seed: Long = 42L,
      base: Timestamp = Timestamp.valueOf("2025-06-01 00:00:00"),
      cfg: Config = Config()): Output = {
    require(products.nonEmpty, "need a product seed")
    // propensity is the cumulative _RangeWeight ladder and doubles as
    // the sampling key — a duplicate value would silently shadow a
    // product in the toMap below (it would never sell and never
    // restock), so fail loudly on a malformed seed instead
    require(products.map(_.propensity_to_buy).distinct.size == products.size,
      "propensity_to_buy values must be unique (cumulative weight ladder)")
    val rnd = new Random(seed)
    val ladder = products.map(_.propensity_to_buy).sorted.toIndexedSeq
    val byPropensity = products.map(p => p.propensity_to_buy -> p).toMap
    val levels = mutable.Map.from(products.map(p => p.product_id -> p.inventory_level))
    val purchases = Seq.newBuilder[Purchase]
    val restocks = Seq.newBuilder[InventoryEvent]

    def randint(lo: Int, hi: Int): Int = lo + rnd.nextInt(hi - lo + 1)

    var i = 0
    while (i < n) {
      val ts = new Timestamp(base.getTime + i * cfg.tickMillis)
      val tsStr = ts.toString
      val isMember = randint(1, 10) <= cfg.memberFreq
      val discount = if (isMember) cfg.clubMemberDiscount else 0.0
      val quantity = {
        val q = randint(1, 30)
        if (q == 30) 3 else if (q <= cfg.itemQuantityOneFreq) 1 else 2
      }
      val propensity = closestMatch(ladder, randint(ladder.head, ladder.last))
      val p = byPropensity(propensity)
      val addSupp = {
        val r = randint(1, 10)
        if (p.product_id.startsWith("SF") || p.product_id.startsWith("SC"))
          r <= cfg.addSuppFreqGroup1
        else r <= cfg.addSuppFreqGroup2
      }
      val suppPrice = if (addSupp) cfg.supplementsCost else 0.0
      purchases += Purchase(ts, math.abs(tsStr.hashCode).toString, p.product_id,
        p.price, quantity, isMember, discount, addSupp, suppPrice)
      // inventory state machine (producer.py:157-181)
      val newLevel = levels(p.product_id) - quantity
      levels(p.product_id) = newLevel
      if (newLevel <= cfg.minInventory) {
        restocks += InventoryEvent(ts, p.product_id, newLevel,
          cfg.restockAmount, newLevel + cfg.restockAmount)
        levels(p.product_id) = newLevel + cfg.restockAmount
      }
      i += 1
    }
    Output(purchases.result(), restocks.result(), levels.toMap)
  }

  /** The Kafka wire format: `json.dumps(vars(message))`
    * (`producer.py:190`) — one JSON object per purchase, including the
    * producer-formula `total_purchase` that ingest drops.
    */
  def toJson(p: Purchase): String = {
    def s(v: String) = "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val total = graft.model.Money.producerTotalPurchase(
      p.price, p.quantity, p.member_discount, p.supplement_price)
    s"""{"transaction_time": ${s(p.transaction_time.toString)}, """ +
      s""""transaction_id": ${s(p.transaction_id)}, """ +
      s""""product_id": ${s(p.product_id)}, """ +
      s""""price": ${p.price}, "quantity": ${p.quantity}, """ +
      s""""is_member": ${p.is_member}, "member_discount": ${p.member_discount}, """ +
      s""""add_supplement": ${p.add_supplement}, """ +
      s""""supplement_price": ${p.supplement_price}, """ +
      s""""total_purchase": $total}"""
  }

  /** A 26-product seed shaped like `products.csv` (4 categories,
    * cumulative _RangeWeight ladder) for tests and local pipeline runs.
    */
  def defaultProducts: Seq[Product] = {
    val specs = Seq(
      ("CS", "Classic Smoothies", 8, 4.99, 1.50),
      ("SF", "Superfruit Smoothies", 6, 5.99, 1.80),
      ("SC", "Supercharged Smoothies", 6, 6.99, 2.00),
      ("IS", "Indulgent Smoothies", 6, 5.49, 1.70))
    var cum = 0
    specs.flatMap { case (pfx, cat, count, price, cogs) =>
      (1 to count).map { i =>
        cum += 3
        Product(f"$pfx$i%02d", cat, s"$cat item $i", "24 oz.", cogs, price,
          75, i % 2 == 0, i % 3 == 0, pfx == "SC", pfx == "SC" && i % 2 == 1,
          cum)
      }
    }
  }
}
