package graft

import org.scalatest.funsuite.AnyFunSuite

/** BASELINE.md is the human-facing budget table; [[Budgets]] is what
  * Bench enforces. They must agree, and every query must be budgeted.
  */
class BudgetsSpec extends AnyFunSuite {

  private lazy val mdRows: Map[String, Double] = {
    val src = scala.io.Source.fromFile("BASELINE.md", "UTF-8")
    // the budget table ends where the sf1 scaling-sweep section starts
    // — that section's per-query table has the same row shape but its
    // last column is a ratio, not a budget
    try src.getLines()
      .takeWhile(!_.startsWith("## sf1"))
      .filter(l => l.startsWith("| ") && !l.startsWith("| query") && !l.startsWith("|--"))
      .map(_.split("\\|").map(_.trim))
      .collect { case cols if cols.length >= 5 => cols(1) -> cols(4).toDouble }
      .toMap
    finally src.close()
  }

  test("every SparkEntry query has a budget") {
    val missing = SparkEntry.queries.keySet -- Budgets.seconds.keySet
    assert(missing.isEmpty, s"unbudgeted queries: $missing — add to Budgets and BASELINE.md")
  }

  test("BASELINE.md table and Budgets.seconds are in lockstep") {
    assert(mdRows.nonEmpty, "no budget rows parsed from BASELINE.md")
    assert(mdRows == Budgets.seconds,
      s"only in md: ${mdRows.keySet -- Budgets.seconds.keySet}; " +
        s"only in scala: ${Budgets.seconds.keySet -- mdRows.keySet}; " +
        s"value diffs: ${mdRows.collect { case (k, v) if Budgets.seconds.get(k).exists(_ != v) => k }}")
  }

  test("every query budgeted >= 2s carries an sf1 scaling-gate entry") {
    // VERDICT r13 #1b: the gate rule is "every query > 2 s at sf0.1 is
    // scale-gated"; t23 landed in r13's final snapshot commit AFTER the
    // gate-extension pass and silently missed coverage. This invariant
    // makes the drift impossible: an expensive query (where superlinear
    // scaling hides) must have an sf1MaxRatio allowance the moment its
    // budget is set.
    val missing = Budgets.seconds.collect {
      case (k, b) if b >= 2.0 && !Budgets.sf1MaxRatio.contains(k) => k
    }
    assert(missing.isEmpty,
      s"queries budgeted >= 2s without an sf1MaxRatio gate entry: ${missing.toSeq.sorted}")
  }

  test("every sf1 gate entry names a real query with a sane allowance") {
    val unknown = Budgets.sf1MaxRatio.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"sf1MaxRatio keys not in SparkEntry.queries: $unknown")
    Budgets.sf1MaxRatio.foreach { case (k, r) =>
      assert(r >= 8.0 && r <= 16.0,
        s"$k sf1 allowance $r outside the [8, 16] regime (8 = linear-plus-" +
          "jitter default; above it needs a documented output-growth argument)")
    }
  }

  test("budgets are sane: positive, floored at 0.5s") {
    Budgets.seconds.foreach { case (k, b) =>
      assert(b >= 0.5, s"$k budget $b below the 0.5s jitter floor")
      assert(b < 60.0, s"$k budget $b implausibly large")
    }
  }
}
