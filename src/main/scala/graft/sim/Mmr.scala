package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QFn, Tables}
import graft.functions.VectorFunctions

/** s20: MMR diversification of the hybrid candidate set — Maximal
  * Marginal Relevance (Carbonell & Goldstein 1998), the standard
  * re-ranker between retrieval and the context window: a fused top-k
  * that returns five paraphrases of the same answer wastes four
  * context slots, so selection greedily trades relevance against
  * similarity to what is already selected:
  *
  *   pick argmax over remaining candidates of
  *     λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)
  *
  * Candidates = s15's fused top-10 ([[Hybrid.s15]] VERBATIM — the
  * t15/s19 composition rule), rel = its integer rrf_milli, sim = the
  * engine-exact embedding cosine quantized to milli
  * (round(cos·1000) — the s8 round-to-integer discipline, so every
  * comparison in the selection loop is INTEGER: λ=0.7 scores as
  * mmr_deci = 7·rrf_milli − 3·penalty_milli, no float ordering
  * anywhere). A candidate without an embedding cannot be scored for
  * similarity and drops from diversification (inner join — both
  * engines agree by construction). Five rounds unrolled; the first
  * pick is pure argmax-relevance (empty selected set ⇒ zero penalty).
  *
  * Scale: the candidate set is ≤ k rows by construction (s15's LIMIT
  * 10) — the s8-centroids metadata size class — so the pairwise sims
  * and the five selection rounds are broadcast-trivial at ANY corpus
  * size; all corpus-sized work happens inside s15's proven arms. The
  * oracle splices s15's full CTE chain verbatim and unrolls the same
  * five-round recurrence (the s8-Lloyd unrolling discipline), so the
  * compare pins the greedy selection itself, not a proxy.
  */
object Mmr {

  /** Selections per query context (slots in the window). */
  private[graft] val MmrK = 5

  private[sim] def s20(s: SparkSession, d: String): DataFrame = {
    // ONE evaluation of the corpus-sized work: s15's arms + the
    // embedding join run once and collect ≤ 10 (doc, rel, embedding)
    // rows — the s8-centroids metadata size class, bounded by s15's
    // LIMIT. (A 5-round DataFrame recurrence re-evaluates the whole
    // fused subtree once per round per reference — measured 112 s vs
    // 1.9 s at sf0.1.) The greedy fold then runs on the driver over
    // ≤ 10 candidates; cosine is the SAME sequential double fold the
    // native expression computes (bit-identical — the repo's
    // cross-engine float rule), quantized HALF_UP to milli.
    val cand = Hybrid.s15(s, d).select(col("doc_id"), col("rrf_milli"))
      .join(Tables.embeddings(s, d)
        .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
      .sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def simMilli(a: Array[Float], b: Array[Float]): Long =
      java.math.BigDecimal.valueOf(
          dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))) * 1000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
    val chosen = scala.collection.mutable.Set[Long]()
    for (r <- 1 to MmrK) {
      val scored = cand.filter(c => !chosen(c._1)).map { case (doc, rel, emb) =>
        val penalty =
          if (chosen.isEmpty) 0L
          else cand.filter(c => chosen(c._1)).map(c => simMilli(emb, c._3)).max
        (doc, rel, penalty, 7L * rel - 3L * penalty)
      }
      if (scored.nonEmpty) {
        val (doc, rel, pen, deci) = scored.minBy { case (d0, _, _, s0) => (-s0, d0) }
        selected += ((r.toLong, doc, rel, pen, deci))
        chosen += doc
      }
    }
    import s.implicits._
    selected.toSeq
      .toDF("mmr_rank", "doc_id", "rrf_milli", "penalty_milli", "mmr_deci")
      .orderBy(col("mmr_rank"))
  }

  private def s20Sql: String = {
    val arm = Hybrid.s15Sql
    val cut = graft.SqlSplice.lastIdx(arm, "\nSELECT COALESCE(l.doc_id")
    val prefix = arm.substring(0, cut)
    val fusedSelect = arm.substring(cut + 1)
    val sb = new StringBuilder
    sb ++= s"""$prefix,
       |fus AS ($fusedSelect),
       |cemb AS (
       |  SELECT f.doc_id, f.rrf_milli, e.embedding
       |  FROM fus f JOIN embeddings e ON e.vec_id = f.doc_id),
       |sims AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db,
       |    CAST(round(${Knn.duckCos("a.embedding", "b.embedding")} * 1000) AS BIGINT) AS sim_milli
       |  FROM cemb a JOIN cemb b ON a.doc_id <> b.doc_id),
       |acc1 AS (
       |  SELECT doc_id, rrf_milli, CAST(0 AS BIGINT) AS penalty_milli,
       |    7 * rrf_milli AS mmr_deci, CAST(1 AS BIGINT) AS mmr_rank
       |  FROM cemb
       |  QUALIFY ROW_NUMBER() OVER (ORDER BY 7 * rrf_milli DESC, doc_id) = 1)""".stripMargin
    for (r <- 2 to MmrK) {
      sb ++= s""",
       |sel$r AS (
       |  SELECT c.doc_id, c.rrf_milli, mx.penalty_milli,
       |    7 * c.rrf_milli - 3 * mx.penalty_milli AS mmr_deci,
       |    CAST($r AS BIGINT) AS mmr_rank
       |  FROM cemb c
       |  JOIN (
       |    SELECT sm.da AS doc_id, MAX(sm.sim_milli) AS penalty_milli
       |    FROM sims sm JOIN acc${r - 1} a ON sm.db = a.doc_id
       |    GROUP BY sm.da) mx USING (doc_id)
       |  WHERE c.doc_id NOT IN (SELECT doc_id FROM acc${r - 1})
       |  QUALIFY ROW_NUMBER() OVER (
       |    ORDER BY 7 * c.rrf_milli - 3 * mx.penalty_milli DESC, c.doc_id) = 1),
       |acc$r AS (
       |  SELECT doc_id, rrf_milli, penalty_milli, mmr_deci, mmr_rank FROM acc${r - 1}
       |  UNION ALL
       |  SELECT doc_id, rrf_milli, penalty_milli, mmr_deci, mmr_rank FROM sel$r)""".stripMargin
    }
    sb ++= s"""
       |SELECT mmr_rank, doc_id, rrf_milli, penalty_milli, mmr_deci
       |FROM acc$MmrK ORDER BY mmr_rank""".stripMargin
    sb.result()
  }

  val queries: Map[String, QFn] = Map("s20_mmr_diversify" -> (s20 _))
  val oracles: Map[String, String] = Map("s20_mmr_diversify" -> s20Sql)
}
