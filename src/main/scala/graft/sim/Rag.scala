package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QFn

/** s19: the composed retrieval DAG as ONE query (VERDICT r14 #7) —
  * the t15-composition discipline applied to the retrieval family.
  * For the standing query document ([[Hybrid.QueryDoc]]), the
  * pipeline a RAG serving stack actually runs:
  *
  *   1. doc ranking, hybrid: the lexical arm is s15's BM25
  *      query-by-document ([[Hybrid.lexArm]] VERBATIM, top-20) and
  *      the dense arm is s11's PERSISTED-index probe ([[Knn.s11]]
  *      verbatim — staged centroids, 2 probed cells, directory-pruned
  *      inverted lists; top-5 is its ranking contract), fused by the
  *      same integer RRF arithmetic s15 ships
  *      (Σ 1000000 div (60 + rank), missing arm contributes 0);
  *   2. context assembly, chunk-granular: the fused top-10 docs join
  *      t25's overlap chunks ([[graft.text.TextAnalysis.t25]]
  *      VERBATIM — embedding-window geometry, global chunk ids, char
  *      offsets), and each doc returns its best chunk by query-token
  *      overlap (count of chunk token positions in the query doc's
  *      vocabulary; ties to the earliest chunk) — the (doc_id,
  *      char_start, char_len) triple is exactly what a serving layer
  *      feeds the LLM as a citation-addressable context window.
  *
  * Wiring is pinned by the oracle, which SPLICES the member oracles:
  * s15Sql's lexical CTE chain (docs→ltop) verbatim, s4Sql's ivfCtes
  * probe chain verbatim (s11's registered oracle), t25Sql's window
  * chain verbatim as a `chunks` CTE, plus only the fusion/assembly
  * SQL written here — so a drift in ANY member's arithmetic breaks
  * s19's hash match too (the t15 rule: composition adds wiring, never
  * re-derives stages).
  *
  * Scale: stage 1 is the two arms' proven shapes (vocab broadcast +
  * thinned token stream; staged index + pruned lists); stage 2 joins
  * the corpus-sized chunk relation against a BROADCAST 10-row winner
  * set, so only winners' chunks surface, the overlap count aggregates
  * map-side over ≤ 10 docs × chunks/doc rows, and the argmax window
  * partitions by doc over those bounded groups. No corpus-sized
  * shuffle beyond what t25 itself plans.
  */
object Rag {

  private[sim] def s19(s: SparkSession, d: String): DataFrame = {
    val q = Hybrid.QueryDoc
    // stage 1: hybrid doc ranking (lex = s15's arm, dense = s11's probe)
    val lex = Hybrid.lexArm(s, d)
    val dense = Knn.s11(s, d).filter(col("q_id") === q)
      .select(col("vec_id").as("doc_id"), col("rank").as("dense_rank"))
    val fused = lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
        (coalesce(expr(s"1000000 div (${Hybrid.RrfC} + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div (${Hybrid.RrfC} + dense_rank)"), lit(0L)))
          .as("rrf_milli"))
      .orderBy(col("rrf_milli").desc, col("doc_id")).limit(10)
    // stage 2: chunk-granular context assembly over t25's windows
    val cand = graft.text.TextAnalysis.t25(s, d)
      .join(broadcast(fused), Seq("doc_id"))
    // the query vocabulary is ONE document's distinct tokens — a
    // 1-row collect_set broadcast, so the overlap count is a per-row
    // codegen'd HOF over the winners' chunks (an explode + groupBy +
    // join-back here would evaluate the whole cand subtree — t25 AND
    // both arms — twice: measured 9.1 s vs 3.9 s at sf0.1)
    val qvocab = graft.Tables.documents(s, d)
      .filter(col("doc_id") === q)
      .select(explode_outer(expr(Bm25.TsE)).as("tok"))
      .filter(col("tok").isNotNull)
      .agg(collect_set(col("tok")).as("qv"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("n_overlap").desc, col("chunk_seq"))
    cand.crossJoin(broadcast(qvocab))
      .withColumn("n_overlap", expr(
        "CAST(size(filter(split(lower(chunk_text), ' '), t -> array_contains(qv, t))) AS BIGINT)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"), col("rrf_milli"),
        col("chunk_id"), col("chunk_seq"), col("char_start"), col("char_len"),
        col("n_overlap"), col("chunk_text"))
      .orderBy(col("rrf_milli").desc, col("doc_id"))
  }

  private def s19Sql: String = {
    val q = Hybrid.QueryDoc
    val armLex = Hybrid.s15Sql
    // lexical chain verbatim: everything before s15's brute dense arm
    val lexCtes = graft.SqlSplice.beforeFirst(armLex, ",\nqv AS")
    // t25's window chain verbatim, rewrapped as a `chunks` CTE
    val t25 = graft.text.TextAnalysis.t25Sql
    val t25Body = t25.substring("WITH ".length,
      graft.SqlSplice.lastIdx(t25, "\nSELECT doc_id,"))
    val t25Select = t25.substring(
        graft.SqlSplice.lastIdx(t25, "\nSELECT doc_id,") + 1)
      .replace(" ORDER BY doc_id, chunk_seq", "")
    s"""$lexCtes,
       |${Knn.ivfCtes},
       |$t25Body,
       |chunks AS ($t25Select),
       |dtop AS (
       |  SELECT vec_id AS doc_id,
       |    ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS dense_rank
       |  FROM scored
       |  WHERE q_id = $q AND cos IS NOT NULL AND NOT isnan(cos)
       |  QUALIFY dense_rank <= 5),
       |fused AS (
       |  SELECT COALESCE(l.doc_id, dn.doc_id) AS doc_id, l.lex_rank, dn.dense_rank,
       |    COALESCE(1000000 // (${Hybrid.RrfC} + l.lex_rank), 0) +
       |    COALESCE(1000000 // (${Hybrid.RrfC} + dn.dense_rank), 0) AS rrf_milli
       |  FROM ltop l FULL OUTER JOIN dtop dn ON l.doc_id = dn.doc_id
       |  ORDER BY rrf_milli DESC, doc_id LIMIT 10),
       |cand AS (
       |  SELECT f.doc_id, f.lex_rank, f.dense_rank, f.rrf_milli,
       |    ch.chunk_id, ch.chunk_seq, ch.char_start, ch.char_len, ch.chunk_text
       |  FROM fused f JOIN chunks ch USING (doc_id)),
       |ctoks AS (
       |  SELECT chunk_id, u.tok
       |  FROM cand, unnest(string_split(lower(chunk_text), ' ')) AS u(tok)),
       |ovc AS (
       |  SELECT chunk_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
       |  FROM ctoks WHERE tok IN (SELECT tok FROM q) GROUP BY chunk_id)
       |SELECT doc_id, lex_rank, dense_rank, rrf_milli, chunk_id, chunk_seq,
       |  char_start, char_len, n_overlap, chunk_text
       |FROM (
       |  SELECT c2.doc_id, c2.lex_rank, c2.dense_rank, c2.rrf_milli,
       |    c2.chunk_id, c2.chunk_seq, c2.char_start, c2.char_len,
       |    COALESCE(o2.n_overlap, 0) AS n_overlap, c2.chunk_text
       |  FROM cand c2 LEFT JOIN ovc o2 USING (chunk_id))
       |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
       |  ORDER BY n_overlap DESC, chunk_seq) = 1
       |ORDER BY rrf_milli DESC, doc_id""".stripMargin
  }

  /** s21: end-to-end recall contract for the composed RAG DAG
    * (VERDICT r15 #4): every index stage carries its own recall
    * contract (s5 LSH, s6 IVF, s13 range), but s19's COMPOSITION had
    * none — this is the go/no-go number a serving stack reads before
    * trusting the staged index inside the full pipeline. Truth is the
    * brute-force hybrid top-10: [[Hybrid.s15]] VERBATIM (the same
    * lexical arm + s1's brute dense ranking, fused by the same
    * integer RRF). Candidate is the document set [[s19]] actually
    * returns through its persisted-index dense arm. Output is the s5
    * shape collapsed to the standing query: (n_true, n_found,
    * recall).
    *
    * Scale: measurement cost is the two pipelines themselves (both
    * proven shapes); the comparison is a 10×10-row left join. Oracle:
    * the shared lexical chain + s15's brute dense CTEs verbatim (tru)
    * and s19's persisted-index probe chain verbatim (ann, the ivfCtes
    * + the same fusion wiring s19Sql ships) — so drift in EITHER
    * pipeline's arithmetic, or in the recall between them, breaks the
    * hash match.
    */
  private[sim] def s21(s: SparkSession, d: String): DataFrame = {
    val tru = Hybrid.s15(s, d).select(col("doc_id"))
    val ann = s19(s, d).select(col("doc_id")).withColumn("hit", lit(1L))
    tru.join(ann, Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .withColumn("recall", col("n_found").cast("double") / col("n_true"))
  }

  private def s21Sql: String = {
    val arm = Hybrid.s15Sql
    val lexCtes = graft.SqlSplice.beforeFirst(arm, ",\nqv AS")
    val cut = graft.SqlSplice.lastIdx(arm, "\nSELECT COALESCE(l.doc_id")
    val bruteCtes = arm.substring(graft.SqlSplice.firstIdx(arm, ",\nqv AS"), cut)
    val fusedSelect = arm.substring(cut + 1)
    s"""$lexCtes$bruteCtes,
       |tru AS ($fusedSelect),
       |${Knn.ivfCtes},
       |adtop AS (
       |  SELECT vec_id AS doc_id,
       |    ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS dense_rank
       |  FROM scored
       |  WHERE q_id = ${Hybrid.QueryDoc} AND cos IS NOT NULL AND NOT isnan(cos)
       |  QUALIFY dense_rank <= 5),
       |ann AS (
       |  SELECT COALESCE(l.doc_id, dn.doc_id) AS doc_id
       |  FROM ltop l FULL OUTER JOIN adtop dn ON l.doc_id = dn.doc_id
       |  ORDER BY COALESCE(1000000 // (${Hybrid.RrfC} + l.lex_rank), 0) +
       |           COALESCE(1000000 // (${Hybrid.RrfC} + dn.dense_rank), 0) DESC,
       |           COALESCE(l.doc_id, dn.doc_id)
       |  LIMIT 10)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
       |  CAST(SUM(CASE WHEN a.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       |  CAST(SUM(CASE WHEN a.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS recall
       |FROM tru t LEFT JOIN ann a ON a.doc_id = t.doc_id""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "s19_rag_pipeline" -> (s19 _),
    "s21_rag_recall" -> (s21 _))
  val oracles: Map[String, String] = Map(
    "s19_rag_pipeline" -> s19Sql,
    "s21_rag_recall" -> s21Sql)
}
