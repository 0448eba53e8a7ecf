package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.generator.EventGenerator
import graft.model.Money

/** Property-based coverage (SURVEY.md §5 test plan #4) with a
  * deterministic sampler over scalacheck Gens (scalatestplus isn't in
  * the offline cache; fixed seeds keep failures reproducible).
  */
trait Sampling {
  def forAllN[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }
}

class PropertySpec extends AnyFunSuite with Sampling {

  private val money = for {
    price <- Gen.choose(0.0, 1000.0)
    qty <- Gen.choose(1, 10)
    disc <- Gen.oneOf(0.0, 0.10)
    supp <- Gen.oneOf(0.0, 1.99)
  } yield (price, qty, disc, supp)

  test("gold final_amount: non-negative, discount-monotone, supplement-additive") {
    forAllN(money, 200) { case (p, q, d, s) =>
      val v = Money.goldFinalAmount(p, q, d, s)
      assert(v >= 0.0)
      assert(v <= Money.goldFinalAmount(p, q, 0.0, s) + 1e-9)
      assert(math.abs(Money.goldFinalAmount(p, q, d, 0.0) + s - v) < 1e-9)
    }
  }

  test("producer total_purchase: cents-rounded and discount-monotone") {
    forAllN(money, 200) { case (p, q, d, s) =>
      val v = Money.producerTotalPurchase(p, q, d, s)
      assert(math.abs(v * 100 - math.round(v * 100)) < 1e-6)
      assert(v <= Money.producerTotalPurchase(p, q, 0.0, s) + 1e-9)
    }
  }

  test("closestMatch == reference linear argmin for arbitrary ladders") {
    val caseGen = for {
      n <- Gen.choose(1, 30)
      xs <- Gen.listOfN(n, Gen.choose(1, 500))
      k <- Gen.choose(-50, 600)
    } yield (xs.distinct.sorted.toIndexedSeq, k)
    forAllN(caseGen, 300) { case (ladder, k) =>
      val linear = ladder.minBy(v => (math.abs(v - k), v))
      assert(EventGenerator.closestMatch(ladder, k) === linear)
    }
  }

  test("generator: restock invariant holds for arbitrary seeds and sizes") {
    val caseGen = for {
      seed <- Gen.choose(1L, 10000L)
      n <- Gen.choose(50, 500)
    } yield (seed, n)
    forAllN(caseGen, 20) { case (seed, n) =>
      val out = EventGenerator.generate(EventGenerator.defaultProducts, n, seed)
      assert(out.purchases.size === n)
      out.inventoryEvents.foreach { e =>
        assert(e.existing_level <= 10 && e.stock_quantity === 15 &&
          e.new_level === e.existing_level + 15)
      }
    }
  }
}

class SparkPropertySpec extends SparkSpec with Sampling {
  import spark.implicits._
  import graft.ext.Dedup

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta",
    "epsilon", "zeta", "eta", "theta")
  private val textGen = for {
    n <- Gen.choose(0, 40)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  /** Reference implementation of word-3-gram shingles in plain Scala. */
  private def scalaShingles(text: String): Set[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    if (toks.size < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  test("engine shingles ≡ plain-Scala shingles for arbitrary texts (both forms)") {
    forAllN(Gen.listOfN(8, textGen), 10) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val viaExpr = df.withColumn("toks", Dedup.tokens(col("text")))
        .select(col("doc_id"), Dedup.shinglesFromTokens(col("toks")).as("sh"))
        .as[(Long, Seq[String])].collect()
        .map { case (id, sh) => id -> sh.toSet }.toMap
      val viaRows = Dedup.explodedShingles(df, "doc_id", "text")
        .groupBy("doc_id").agg(collect_set(col("s")).as("sh"))
        .as[(Long, Seq[String])].collect()
        .map { case (id, sh) => id -> sh.toSet }.toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val expected = scalaShingles(t)
        assert(viaExpr(i.toLong) === expected, s"expr form, text '$t'")
        assert(viaRows.getOrElse(i.toLong, Set.empty) === expected,
          s"row form, text '$t'")
      }
    }
  }

  test("simhash is invariant to token permutation (multiset property)") {
    val caseGen = for {
      n <- Gen.choose(4, 30)
      ws <- Gen.listOfN(n, Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6"))
      seed <- Gen.choose(0L, 999L)
    } yield (ws, seed)
    forAllN(caseGen, 10) { case (ws, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(ws)
      val df = Seq((1L, ws.mkString(" ")), (2L, shuffled.mkString(" ")))
        .toDF("doc_id", "text")
      val h = Dedup.simhashes(df, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(h(1L) === h(2L))
    }
  }
}
