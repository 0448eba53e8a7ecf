package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract's registry invariants — pure map/seq
  * checks, no Spark session. The registry is FROZEN (156 operator
  * queries + 16 degenerate-corpus gates); these tests make the freeze
  * and the contract's silent failure modes red instead of invisible:
  * a duplicate name drops an entry from the driver maps without a
  * compile error, a headline/probe typo records -1.0 in the bench,
  * and a name with JSON-hostile characters corrupts the hand-
  * assembled contract/diag documents.
  */
class RegistryContractSpec extends AnyFunSuite {

  private val names = SparkEntry.registry.map(_.name)

  test("registry names are unique (a duplicate silently drops an entry)") {
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate registry names: $dups")
    assert(SparkEntry.queries.size === SparkEntry.registry.size)
  }

  test("frozen registry: 156 operator queries + 16 degenerate gates, " +
      "one rows-only entry") {
    assert(names.size === 172)
    assert(names.count(n => n.startsWith("sf0_") || n.startsWith("sf1row_"))
      === 16)
    // every query carries a DuckDB oracle except the trained isolation
    // forest (rows-only by design; value-gated via the q88 agreement
    // oracle + its sha256 self-golden spec)
    val unoracled = names.toSet -- SparkEntry.oracleSql.keySet
    assert(unoracled === Set("q77_anomaly_iforest"))
  }

  test("bench rosters resolve: headlines and scale probes name real queries") {
    val known = SparkEntry.queries.keySet
    val missingHeadlines = SparkEntry.headlines.filterNot(known)
    assert(missingHeadlines.isEmpty, s"headline typo: $missingHeadlines")
    assert(Bench.x10Queries.filterNot(known).isEmpty)
    assert(Bench.x30Queries.filterNot(known).isEmpty)
    // every x30 probe needs an x10 sibling — the adjudicator's
    // cross-scale impossible-work check compares the pair
    assert(Bench.x30Queries.forall(Bench.x10Queries.contains))
    // probes run over the scaled documents/embeddings corpus, so they
    // must also be headline entries' peers in the registry
    assert((Bench.x10Queries ++ Bench.x30Queries).forall(known))
  }

  test("names are JSON-safe identifiers (contract/diag JSON is " +
      "hand-assembled around them)") {
    val bad = names.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"JSON-hostile or non-conventional names: $bad")
  }
}
