package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.CartesianProductExec
import graft.sim.Hybrid

/** s15_hybrid_rrf: each arm checked against an independent contract —
  * the dense arm must be s1's ranking verbatim (prefix equality with
  * the s1 query output), the lexical arm must equal an in-JVM
  * BM25-query-by-document reference exactly — and the fusion must be
  * the integer RRF arithmetic it claims, recomputable from the output
  * rows alone.
  */
class HybridSpec extends SparkSpec {

  test("dense arm = s1's ranking for the query doc (prefix equality)") {
    val dense = Hybrid.denseArm(spark, sf).collect()
      .map(r => (r.getAs[Long]("dense_rank"), r.getAs[Long]("doc_id")))
      .sortBy(_._1)
    assert(dense.nonEmpty && dense.length <= Hybrid.ArmK)
    assert(dense.map(_._1).toSeq == (1L to dense.length).toSeq,
      "dense ranks are not 1..k dense")
    val s1Rows = SparkEntry.queries("s1_knn_brute")(spark, sf)
      .filter(col("q_id") === Hybrid.QueryDoc).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id")))
      .sortBy(_._1)
    // s1 is top-10, the arm is top-20: the first 10 must agree 1:1
    assert(dense.take(s1Rows.length).toSeq == s1Rows.toSeq,
      "dense arm diverges from s1's ranking")
  }

  test("lexical arm equals the in-JVM BM25 query-by-document reference") {
    val corpus = Tables.documents(spark, sf)
      .filter(col("doc_id").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase
        .split("\\s+").filter(_.nonEmpty).toSeq))
    val qvocab = corpus.find(_._1 == Hybrid.QueryDoc).get._2.toSet
    val n = corpus.length.toLong
    val sTok = corpus.map(_._2.length.toLong).sum
    val a = (2 * sTok + n) / (2 * n)
    val tf = for {
      (id, toks) <- corpus
      t <- qvocab.toSeq
      c = toks.count(_ == t).toLong if c > 0
    } yield (id, t, c, toks.length.toLong)
    val idf = tf.groupBy(_._2).map { case (t, rows) =>
      t -> TestMilliLog(2 * rows.length + 1, 2 * n + 2)
    }
    val want = tf.filter(_._1 != Hybrid.QueryDoc).groupBy(_._1).map {
      case (id, rows) =>
        val score = rows.map { case (_, t, c, len) =>
          (idf(t) * (44 * a * c)) / (20 * a * c + 6 * a + 18 * len)
        }.sum
        (id, score)
    }.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(Hybrid.ArmK)
      .zipWithIndex.map { case ((id, _), i) => (id, i + 1L) }
    val got = Hybrid.lexArm(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("lex_rank")))
      .sortBy(_._2)
    assert(got.toSeq == want, s"\n got: ${got.toSeq}\nwant: $want")
  }

  test("fusion is the integer RRF it claims, recomputable from the output") {
    val lex = Hybrid.lexArm(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lex_rank")).toMap
    val dense = Hybrid.denseArm(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dense_rank")).toMap
    val df = SparkEntry.queries("s15_hybrid_rrf")(spark, sf)
    val out = df.collect()
    assert(out.length == 10)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      def term(m: Map[Long, Long]): Long =
        m.get(id).map(rk => 1000000L / (Hybrid.RrfC + rk)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_milli") == term(lex) + term(dense),
        s"doc $id: rrf_milli does not match its arms")
      // the rank columns mirror the arm memberships (null = missed arm)
      assert(Option(r.getAs[Any]("lex_rank")).map(_.asInstanceOf[Long]) == lex.get(id))
      assert(Option(r.getAs[Any]("dense_rank")).map(_.asInstanceOf[Long]) == dense.get(id))
    }
    // the output is THE top-10 of the full fused candidate set
    val full = (lex.keySet ++ dense.keySet).toSeq.map { id =>
      val sc = lex.get(id).map(rk => 1000000L / (Hybrid.RrfC + rk)).getOrElse(0L) +
        dense.get(id).map(rk => 1000000L / (Hybrid.RrfC + rk)).getOrElse(0L)
      (id, sc)
    }.sortBy { case (id, sc) => (-sc, id) }.take(10)
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_milli"))).toSeq == full)
    // a doc present in BOTH arms exists and outranks single-arm docs of
    // comparable per-arm rank (the point of fusion) — at spec scale the
    // overlap is data-dependent, so only assert when it exists
    val both = out.filter(r => lex.contains(r.getAs[Long]("doc_id")) &&
      dense.contains(r.getAs[Long]("doc_id")))
    both.foreach { r =>
      assert(r.getAs[Long]("rrf_milli") > 1000000L / (Hybrid.RrfC + 1),
        "a both-arms doc should beat any single-arm doc's maximum")
    }
    // plan hygiene: the only nested-loop joins are one-row scalar
    // crosses; nothing corpus-sized goes cartesian
    df.collect()
    val cart = collectInPlan(df.queryExecution.executedPlan) {
      case c: CartesianProductExec => c
    }
    assert(cart.isEmpty, "cartesian product in the fused plan")
  }
}
