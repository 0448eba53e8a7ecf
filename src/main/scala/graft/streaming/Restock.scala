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
    * Within a batch, sales are applied in event-time order. The
    * per-key buffer here is bounded by ONE MICRO-BATCH of one
    * product's events (trigger-interval-sized), not by history —
    * within-batch event-time ordering inherently needs the whole
    * batch-group (its last-arriving element may be the earliest), and
    * Structured Streaming disallows pre-group local sorts on
    * streaming Datasets. Unbounded replays belong to
    * [[restockBatch]], which secondary-sorts and never materializes a
    * group.
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
          val batch = it.toArray
          // (event_time, quantity) — the SAME total order the batch
          // twin sorts by: a time-only comparator leaves ties in
          // shuffle-arrival order, so a task retry (or a replayed
          // batch) could apply tied sales differently and emit a
          // different restock event than the original attempt
          scala.util.Sorting.stableSort(batch,
            (a: Sale, b: Sale) =>
              a.event_time.getTime < b.event_time.getTime ||
                (a.event_time.getTime == b.event_time.getTime &&
                  a.quantity < b.quantity))
          val out = Seq.newBuilder[InventoryEvent]
          batch.foreach { s =>
            val (next, ev) = step(level, s)
            level = next
            ev.foreach(out += _)
          }
          state.update(Level(level))
          out.result().iterator
      }
  }

  /** Batch twin: the same state machine via SECONDARY SORT — shuffle
    * on product_id, sort each partition by (product_id, event_time),
    * then a single lazy fold that detects key boundaries as it
    * streams. No group is ever materialized: a product with a billion
    * sales costs the same task heap as one with ten (the sort itself
    * is Spark's spillable external sort). This replaces the previous
    * `groupByKey` + `it.toSeq.sortBy` formulation, which buffered an
    * entire product's history per task — an OOM under hot-key skew at
    * scale.
    */
  def restockBatch(sales: Dataset[Sale], initialLevel: Int)
      : Dataset[InventoryEvent] = {
    import org.apache.spark.sql.functions.col
    implicit val outEnc = Encoders.product[InventoryEvent]
    sales
      .repartition(col("product_id"))
      .sortWithinPartitions(col("product_id"), col("event_time"), col("quantity"))
      .mapPartitions { it =>
        var curKey: String = null
        var level = initialLevel
        it.flatMap { s =>
          if (s.product_id != curKey) { curKey = s.product_id; level = initialLevel }
          val (next, ev) = step(level, s)
          level = next
          ev // lazy: emits as it folds, O(1) memory beyond the sort
        }
      }
  }
}
