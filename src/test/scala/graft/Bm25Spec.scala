package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec

/** s14_bm25 against an independent in-JVM BM25 reference: the whole
  * pipeline (tokenize → tf/df → integer idf via the shift-and-square
  * milli-log → cleared-fraction tf part → top-20) recomputed in plain
  * Scala over the collected sf0.001 corpus, compared EXACTLY — the
  * integer contract means zero tolerance, same discipline as
  * PropertySpec's surpMilli fold check.
  */
/** Scalar -log2(num/den) in milli-bits — independent re-derivation of
  * TextAnalysis.surpMilliSpark (shift-and-square, 10 steps). Shared by
  * [[Bm25Spec]] and [[HybridSpec]]'s in-JVM BM25 references.
  */
object TestMilliLog {
  def apply(num: Long, den: Long): Long = {
    val m2 = 1L << text.TextAnalysis.PplShift
    val top = 2L << text.TextAnalysis.PplShift
    val e = java.lang.Long.toBinaryString(den / num).length - 1L
    var m = (den * m2) / (num * (1L << e))
    var f = 0L
    for (_ <- 1 to text.TextAnalysis.PplSteps) {
      val msq = (m * m) / m2
      if (msq >= top) { f = f * 2 + 1; m = msq / 2 }
      else { f = f * 2; m = msq }
    }
    e * 1000 + (f * 1000) / 1024
  }
}

class Bm25Spec extends SparkSpec {

  private def milliLog(num: Long, den: Long): Long = TestMilliLog(num, den)

  private def referenceTop20: Seq[(Long, Long, Long, Long)] = {
    val corpus = Tables.documents(spark, sf)
      .filter(col("doc_id").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase
        .split("\\s+").filter(_.nonEmpty).toSeq))
    val n = corpus.length.toLong
    val s = corpus.map(_._2.length.toLong).sum
    val a = (2 * s + n) / (2 * n)
    val q = sim.Bm25.QueryTerms
    val tf = for {
      (id, toks) <- corpus
      t <- q
      c = toks.count(_ == t).toLong if c > 0
    } yield (id, t, c, toks.length.toLong)
    val idf = tf.groupBy(_._2).map { case (t, rows) =>
      t -> milliLog(2 * rows.length + 1, 2 * n + 2)
    }
    tf.groupBy(_._1).map { case (id, rows) =>
      val score = rows.map { case (_, t, c, len) =>
        (idf(t) * (44 * a * c)) / (20 * a * c + 6 * a + 18 * len)
      }.sum
      (id, rows.length.toLong, rows.head._4, score)
    }.toSeq.sortBy { case (id, _, _, sc) => (-sc, id) }.take(20)
  }

  test("s14 top-20 equals the independent integer BM25 reference exactly") {
    val df = SparkEntry.queries("s14_bm25")(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSeq
    val want = referenceTop20
    assert(got == want, s"\n got: $got\nwant: $want")
    // sanity on the reference itself: the rare plant term dominates —
    // at least one 'dup' doc in the top ranks, scores strictly positive
    assert(want.forall(_._4 > 0))
  }

  test("s14 plan: zero corpus-sized shuffles, two scans, bounded top-k") {
    val df = SparkEntry.queries("s14_bm25")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // the final top-20 must be TakeOrderedAndProject (bounded
    // per-partition heaps), never a global Sort
    assert(collectInPlan(plan) { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "top-20 is not a TakeOrderedAndProject")
    // document rows never shuffle: the only exchanges are the one-row
    // stats partial→final aggregate and the |Q|-row idf collapse
    val shuffles = collectInPlan(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 2,
      s"expected ≤2 metadata-sized shuffles (stats + idf collapse), got ${shuffles.size}")
    // stats-then-score = exactly two corpus scans, no more (a third
    // means a constants branch re-derived the corpus lineage)
    val scans = collectInPlan(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 2, s"expected 2 corpus scans, got ${scans.size}")
  }
}
