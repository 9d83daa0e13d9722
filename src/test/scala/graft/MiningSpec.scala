package graft

import org.apache.spark.sql.functions._
import graft.sim.Mining

/** s16_hard_negatives: the lexical candidates checked per query
  * against an independent in-JVM BM25 reference, the cosine against
  * an in-JVM sequential fold (the FloatDot order), and the verdict
  * against its own threshold — plus the non-degeneracy the operator
  * exists for: both populations present.
  */
class MiningSpec extends SparkSpec {

  private lazy val out = SparkEntry.queries("s16_hard_negatives")(spark, sf).collect()

  test("lexical candidates equal the in-JVM multi-query BM25 reference") {
    val corpus = Tables.documents(spark, sf)
      .filter(col("doc_id").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase
        .split("\\s+").filter(_.nonEmpty).toSeq))
    val n = corpus.length.toLong
    val sTok = corpus.map(_._2.length.toLong).sum
    val a = (2 * sTok + n) / (2 * n)
    val qvocab = corpus.filter(_._1 < Mining.NQueries)
      .map { case (id, ts) => id -> ts.toSet }.toMap
    val union = qvocab.values.flatten.toSet
    val tf = for {
      (id, toks) <- corpus
      t <- union.toSeq
      c = toks.count(_ == t).toLong if c > 0
    } yield (id, t, c, toks.length.toLong)
    val idf = tf.groupBy(_._2).map { case (t, rows) =>
      t -> TestMilliLog(2 * rows.length + 1, 2 * n + 2)
    }
    val want = (for {
      (qid, vocab) <- qvocab.toSeq
      (id, byDoc) <- tf.filter(r => r._1 != qid && vocab(r._2)).groupBy(_._1).toSeq
    } yield {
      val score = byDoc.map { case (_, t, c, len) =>
        (idf(t) * (44 * a * c)) / (20 * a * c + 6 * a + 18 * len)
      }.sum
      (qid, id, score)
    }).groupBy(_._1).flatMap { case (qid, rows) =>
      rows.sortBy { case (_, id, sc) => (-sc, id) }.take(Mining.LexK)
        .zipWithIndex.map { case ((_, id, sc), i) => (qid, i + 1L, id, sc) }
    }.toSeq.sorted
    val got = out.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("lex_rank"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("score_milli"))).toSeq.sorted
    assert(got == want, s"\n got: $got\nwant: $want")
  }

  test("cosine matches the in-JVM sequential fold and the verdict its threshold") {
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
        s
      }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    out.foreach { r =>
      val want = cos(emb(r.getAs[Long]("q_id")), emb(r.getAs[Long]("doc_id")))
      val got = r.getAs[Double]("cos")
      assert(got == want, s"cos mismatch for (${r.getAs[Long]("q_id")}, " +
        s"${r.getAs[Long]("doc_id")}): $got vs $want")
      assert(r.getAs[Boolean]("is_hard_negative") == (got < Mining.HardNegTau))
    }
  }

  test("shape: dense ranks per query, bounded output, both populations present") {
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (0L until Mining.NQueries).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= Mining.LexK)
      assert(rows.map(_.getAs[Long]("lex_rank")).sorted.toSeq ==
        (1L to rows.length).toSeq, s"query $q: ranks not dense 1..k")
    }
    // the threshold splits non-degenerately — hard negatives exist AND
    // lexical matches with positive embedding agreement exist (the
    // DuckDB probe measured −0.39..+0.31, median ~0)
    assert(out.exists(_.getAs[Boolean]("is_hard_negative")))
    assert(out.exists(!_.getAs[Boolean]("is_hard_negative")))
  }
}
