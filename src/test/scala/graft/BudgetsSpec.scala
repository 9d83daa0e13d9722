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

  test("budgets are sane: positive, floored at 0.5s") {
    Budgets.seconds.foreach { case (k, b) =>
      assert(b >= 0.5, s"$k budget $b below the 0.5s jitter floor")
      assert(b < 60.0, s"$k budget $b implausibly large")
    }
  }
}
