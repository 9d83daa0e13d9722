package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lockstep rules for the tracked BENCH_HISTORY.jsonl (VERDICT r18
  * #2) — the sf0.1 counterpart of BudgetsSpec's SF1_HISTORY lockstep.
  * Cleanliness used to be adjudicated in prose (the r18 2164 s driver
  * line sat unmarked in the same file budget re-bases and
  * bench_compare.py draw from); these invariants make the
  * adjudication machine-readable and non-droppable.
  */
class BenchHistorySpec extends AnyFunSuite {

  private lazy val nodes = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val src = scala.io.Source.fromFile("BENCH_HISTORY.jsonl", "UTF-8")
    try src.getLines().filter(_.trim.nonEmpty).map(mapper.readTree).toVector
    finally src.close()
  }

  test("every line parses and is stamped") {
    assert(nodes.nonEmpty, "no BENCH_HISTORY lines")
    nodes.foreach { n =>
      assert(n.path("ts").asLong(0L) > 0, s"unstamped line: $n")
      assert(n.has("queries"), s"line without per-query map: ts ${n.path("ts")}")
    }
    // stamped in append order — an in-place amendment must not reorder
    val ts = nodes.map(_.path("ts").asLong)
    assert(ts == ts.sorted, "BENCH_HISTORY lines out of timestamp order")
  }

  test("every line with trips carries a contended adjudication (VERDICT r18 #2)") {
    // a non-empty over_budget (or contended) map without the run-level
    // boolean is the r18 failure mode: 47 environmental trips the
    // artifact could not defend. New Bench code always emits
    // `contended_run` (derived from at-trip calibration); the two
    // legacy trip lines were retro-adjudicated in r19 and carry a
    // documented note. A future line that trips without adjudication
    // fails HERE, at commit time.
    nodes.foreach { n =>
      val trips = n.path("over_budget").size() + n.path("contended").size()
      if (trips > 0)
        assert(n.has("contended_run"),
          s"ts ${n.path("ts")}: $trips trip(s) but no contended_run adjudication — " +
            "Bench must record at-trip calibration (or the line needs a " +
            "documented retro-adjudication)")
    }
  }

  test("retro-adjudicated legacy lines carry their evidence note") {
    nodes.filter(n => n.path("contended_run").asBoolean(false) && !n.has("trip_calib"))
      .foreach { n =>
        assert(n.path("contended_note").asText("").length > 40,
          s"ts ${n.path("ts")}: contended_run=true without at-trip calibration " +
            "requires a contended_note explaining the retro-adjudication")
      }
  }

  test("the budget gate applies only at the pricing SF") {
    // Budgets.seconds is priced at sf0.1; a sweep on any other corpus
    // must not record budget trips — streaming/packing queries carry
    // fixed per-run overhead that does not shrink with data size, so
    // an sf0.001 smoke sweep false-trips them against sf0.1 budgets
    // (the ts 1786903179 line, retro-adjudicated with its trips moved
    // to `off_pricing_trips` and a contended_note). Bench now skips
    // the gate off-pricing (`budget_gated`); this locks the invariant
    // so a mis-gated line can never again read as regression evidence.
    nodes.filterNot(_.path("sf").asText("").endsWith("sf0.1")).foreach { n =>
      assert(n.path("over_budget").size() == 0 && n.path("contended").size() == 0,
        s"ts ${n.path("ts")}: off-pricing sweep (sf ${n.path("sf")}) carries " +
          "budget trips — the sf0.1-priced gate must not apply")
      if (n.has("off_pricing_trips"))
        assert(n.path("contended_note").asText("").length > 40,
          s"ts ${n.path("ts")}: off_pricing_trips requires an evidence note")
    }
  }

  test("contended runs are the known set or newer (no silent unflagging)") {
    // the two r18 lines adjudicated contaminated by judge forensics
    // must STAY flagged — a regeneration that drops the flag would
    // re-admit their readings to re-bases
    val flagged = nodes.filter(_.path("contended_run").asBoolean(false))
      .map(_.path("ts").asLong).toSet
    // 1787113283 is the r19 closing sweep retro-adjudicated in r20 as
    // host-FLATTERED (VERDICT r19 what's-wrong #4): untouched queries
    // 3-5x faster than both adjacent same-code runs at near-identical
    // calib — its per-query values must stay out of re-bases/ratchets
    assert(Set(1786877276L, 1786897551L, 1787113283L).subsetOf(flagged),
      s"the adjudicated non-clean lines must remain flagged; found $flagged")
  }
}
