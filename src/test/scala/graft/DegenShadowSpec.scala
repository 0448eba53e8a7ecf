package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the shared degenerate-group shadow machinery (the
  * sf0/sf1row driver gates route every oracle through it — a silent
  * rewrite bug here would mis-bind a table in BOTH boundary groups).
  * Pure string-level: no Spark session needed.
  */
class DegenShadowSpec extends AnyFunSuite {

  private val empty: String => String =
    t => s"SELECT * FROM main.$t WHERE FALSE"

  test("plain SELECT gains a WITH prefix rebinding every table") {
    val out = DegenShadow.shadow("SELECT * FROM lineitem", empty)
    assert(out.startsWith("WITH "))
    // every table shadowed exactly once, each over main.<t>
    Tables.names.foreach { t =>
      assert(out.contains(s"$t AS (SELECT * FROM main.$t WHERE FALSE)"),
        s"missing shadow for $t")
    }
    assert(out.endsWith("SELECT * FROM lineitem"))
  }

  test("WITH originals splice after the shadows, keeping one WITH") {
    val out = DegenShadow.shadow(
      "WITH x AS (SELECT 1) SELECT * FROM x, orders", empty)
    assert(out.startsWith("WITH "))
    // the original's own CTE survives, after the shadow list
    assert(out.indexOf("x AS (SELECT 1)") >
      out.indexOf("orders AS (SELECT * FROM main.orders WHERE FALSE)"))
    // no nested/second WITH introduced
    assert("(?i)\\bWITH\\b".r.findAllIn(out).size === 1)
  }

  test("WITH RECURSIVE originals keep the RECURSIVE modifier first") {
    val out = DegenShadow.shadow(
      "WITH RECURSIVE r AS (SELECT 1) SELECT * FROM r, nation", empty)
    assert(out.startsWith("WITH RECURSIVE "))
    assert("(?i)\\bRECURSIVE\\b".r.findAllIn(out).size === 1)
  }

  test("an oracle whose CTE shadows a table name fails FAST at build") {
    val e = intercept[IllegalArgumentException] {
      DegenShadow.shadow(
        "WITH part AS (SELECT 1 AS x) SELECT * FROM part", empty)
    }
    assert(e.getMessage.contains("part"))
  }

  test("matching is case-insensitive and word-bounded") {
    // 'PART AS (' must trip the guard; 'counterpart AS (' must not
    intercept[IllegalArgumentException] {
      DegenShadow.shadow("WITH PART AS (SELECT 1) SELECT 1", empty)
    }
    DegenShadow.shadow(
      "WITH counterpart AS (SELECT 1) SELECT * FROM counterpart", empty)
  }

  test("both degenerate groups are built from the one shared slice") {
    assert(Sf0Queries.all.map(_.name) ===
      DegenShadow.picks.map("sf0_" + _))
    assert(Sf1RowQueries.all.map(_.name) ===
      DegenShadow.picks.map("sf1row_" + _))
    // every pick resolves and carries an oracle (the groups exist to
    // be DRIVER-gated; a pick without an oracle would silently demote
    // to rows-only)
    DegenShadow.picks.foreach { p =>
      assert(DegenShadow.baseByName(p).oracle.isDefined, s"$p lost its oracle")
    }
  }
}
