package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.InventoryEvent

/** The inventory restock state machine — the one genuinely stateful
  * computation in the reference, which lives in its *producer*
  * (`pipeline/generator/producer.py:157-181`: decrement level per
  * sale; when level ≤ min_inventory, emit a restock event and add
  * restock_amount). Re-expressed as the idiomatic Spark stateful
  * operator: `flatMapGroupsWithState` keyed by product_id
  * (SURVEY.md §2.9/§2.12).
  */
object Restock {

  final case class Sale(product_id: String, event_time: Timestamp, quantity: Int)
  final case class Level(level: Int)

  val MinInventory = 10   // configuration.ini:24
  val RestockAmount = 15  // configuration.ini:25

  private def step(level: Int, sale: Sale): (Int, Option[InventoryEvent]) = {
    val after = level - sale.quantity
    if (after <= MinInventory)
      (after + RestockAmount, Some(InventoryEvent(sale.event_time,
        sale.product_id, after, RestockAmount, after + RestockAmount)))
    else (after, None)
  }

  /** Streaming: per-product running level across micro-batches.
    * Within a batch, sales are applied in event-time order (Spark
    * hands the group iterator in arrival order, which for a replayed
    * log is not guaranteed — sorting per batch makes the operator
    * deterministic; cross-batch ordering is the source's job).
    */
  def restockStream(sales: Dataset[Sale], initialLevel: Int)
      : Dataset[InventoryEvent] = {
    implicit val outEnc = Encoders.product[InventoryEvent]
    implicit val stEnc = Encoders.product[Level]
    implicit val keyEnc = Encoders.STRING
    sales.groupByKey(_.product_id)
      .flatMapGroupsWithState[Level, InventoryEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Sale], state: GroupState[Level]) =>
          var level = state.getOption.map(_.level).getOrElse(initialLevel)
          val out = Seq.newBuilder[InventoryEvent]
          it.toSeq.sortBy(_.event_time.getTime).foreach { s =>
            val (next, ev) = step(level, s)
            level = next
            ev.foreach(out += _)
          }
          state.update(Level(level))
          out.result().iterator
      }
  }

  /** Batch twin: same state machine over a bounded Dataset, one pass
    * per product group in event-time order. Used by the offline
    * pipeline and for differential testing against the generator's
    * in-process state machine.
    */
  def restockBatch(sales: Dataset[Sale], initialLevel: Int)
      : Dataset[InventoryEvent] = {
    implicit val outEnc = Encoders.product[InventoryEvent]
    implicit val keyEnc = Encoders.STRING
    sales.groupByKey(_.product_id).flatMapGroups {
      (key: String, it: Iterator[Sale]) =>
        var level = initialLevel
        val out = Seq.newBuilder[InventoryEvent]
        it.toSeq.sortBy(_.event_time.getTime).foreach { s =>
          val (next, ev) = step(level, s)
          level = next
          ev.foreach(out += _)
        }
        out.result().iterator
    }
  }
}
