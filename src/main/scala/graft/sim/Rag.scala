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

  private[sim] def s19(s: SparkSession, d: String): DataFrame =
    s19From(Hybrid.lexArm(s, d), s, d)

  /** [[s19]] over a PREBUILT lexical arm (see [[Hybrid.s15From]] —
    * s21/s25 share one materialized arm between truth and candidate
    * pipelines; r20, guide §2.4). */
  private[sim] def s19From(lex: DataFrame, s: SparkSession, d: String): DataFrame = {
    val q = Hybrid.QueryDoc
    // stage 1: hybrid doc ranking (lex = s15's arm, dense = s11's probe)
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
    // r20 (guide §2.4): both pipelines contain the identical lexArm
    // subtree — materialize it once (≤ ArmK = 20 rows) and feed both.
    val lex = Hybrid.lexArm(s, d).localCheckpoint()
    val tru = Hybrid.s15From(lex, s, d).select(col("doc_id"))
    val ann = s19From(lex, s, d).select(col("doc_id")).withColumn("hit", lit(1L))
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

  /** The ≤10-row (rrf_milli DESC, doc_id) rank assembly — the lexArm
    * idiom (collect, comparator sort, posexplode; never a Window over
    * an unbounded partition), shared by s25's truth and candidate
    * rankings. Input must be bounded by construction (both inputs are
    * LIMIT-10 fusions). */
  private def rankOf(df: DataFrame): DataFrame =
    df.agg(collect_list(struct(col("rrf_milli"), col("doc_id"))).as("cand"))
      .withColumn("sorted", expr(
        """array_sort(cand, (l, r) ->
          |  CASE WHEN l.rrf_milli > r.rrf_milli THEN -1
          |       WHEN l.rrf_milli < r.rrf_milli THEN 1
          |       WHEN l.doc_id < r.doc_id THEN -1
          |       WHEN l.doc_id > r.doc_id THEN 1 ELSE 0 END)""".stripMargin))
      .select(posexplode(col("sorted")).as(Seq("pos", "c")))
      .select(col("c.doc_id").as("doc_id"), (col("pos") + 1).cast("long").as("rank"))

  /** s25: ranking-quality metrics for the composed RAG DAG (VERDICT
    * r16 #3) — s21 reports recall only, but MRR and nDCG@10 are the
    * numbers a retrieval eval actually publishes: recall says the
    * right documents surfaced, these say they surfaced in the right
    * ORDER. Truth and candidate are s21's exact plumbing (brute hybrid
    * [[Hybrid.s15]] vs the persisted-index pipeline [[s19]], both
    * VERBATIM); relevance is binary membership in the truth top-10,
    * the standard eval convention when no graded judgments exist.
    *
    * All arithmetic is integer so the oracle is exact (the t14/t19/
    * t21 discipline): reciprocal rank as `1000000 div first_rank`
    * micro-units, and nDCG's discount 1/log2(rank+1) through t21's
    * shift-and-square binary log ([[graft.text.TextAnalysis
    * .surpMilliSpark]] — gain_micro = 10⁹ div log2_milli(rank+1), a
    * 10-row table both engines derive through the identical integer
    * recurrence). The ONLY double is the final ndcg = dcg/idcg, an
    * exact division of two exact integers — bit-identical across
    * engines. idcg is nonzero by construction (the truth fusion always
    * ranks 10 docs on this corpus; n_true ≥ 1 whenever s15 returns).
    *
    * Scale: measurement cost is the two pipelines themselves (proven
    * shapes); everything after is ≤10-row metadata — the rank
    * assemblies are bounded collects, the discount table is 10 rows,
    * and the final assembly crossJoins four 1-row aggregates (the
    * repo's driver-metadata discipline). A spec cross-pins
    * (n_true, n_rel) to s21's (n_true, n_found) on the same run and
    * recomputes MRR/nDCG from first principles in the JVM.
    */
  private[sim] def s25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // r20 (guide §2.4): tru and cand are ≤10-row fusions of the two
    // full retrieval pipelines (brute hybrid; composed staged-index
    // DAG). Lazily, tru was re-planned under THREE consumers (truCnt's
    // two uses + the hits semi-join) and cand under two — the plan ran
    // both pipelines multiple times and weighed 3,774 formatted lines
    // (the suite's largest). One localCheckpoint each (10 rows) runs
    // each pipeline exactly once; every metric reads the materialized
    // rows.
    val lex = Hybrid.lexArm(s, d).localCheckpoint()
    val tru = Hybrid.s15From(lex, s, d).select(col("doc_id")).localCheckpoint()
    val cand = rankOf(s19From(lex, s, d).select(col("doc_id"), col("rrf_milli")))
      .localCheckpoint()
    // 1/log2(r+1) discounts for ranks 1..10 in integer micro-units,
    // via the shared shift-and-square log (fold form == unrolled
    // chain, PropertySpec-pinned)
    val disc = (1L to 10L).toDF("rnum")
      .select(col("rnum"), lit(1L).as("num"), (col("rnum") + 1L).as("den"))
      .select(col("rnum"), expr(graft.text.TextAnalysis.surpMilliSpark).as("log2_milli"))
      .select(col("rnum"), expr("CAST(1000000000 AS BIGINT) div log2_milli").as("gain_micro"))
    val truCnt = tru.agg(count(lit(1)).as("n_true"))
    val candCnt = cand.agg(count(lit(1)).as("n_cand"))
    val hits = cand.join(tru, Seq("doc_id"), "left_semi")
    val hitStats = hits.join(broadcast(disc), col("rank") === col("rnum"), "left")
      .agg(count(lit(1)).as("n_rel"),
        coalesce(min(col("rank")), lit(0L)).as("first_rank"),
        coalesce(sum(col("gain_micro")), lit(0L)).as("dcg_micro"))
    val idcg = disc.crossJoin(broadcast(truCnt))
      .filter(col("rnum") <= least(col("n_true"), lit(10L)))
      .agg(sum(col("gain_micro")).as("idcg_micro"))
    truCnt.crossJoin(candCnt).crossJoin(hitStats).crossJoin(idcg)
      .select(col("n_true"), col("n_cand"), col("n_rel"), col("first_rank"),
        when(col("first_rank") > 0, expr("1000000 div first_rank"))
          .otherwise(lit(0L)).as("rr_micro"),
        col("dcg_micro"), col("idcg_micro"),
        (col("dcg_micro").cast("double") / col("idcg_micro")).as("ndcg"))
  }

  private def s25Sql: String = {
    val arm = Hybrid.s15Sql
    val lexCtes = graft.SqlSplice.beforeFirst(arm, ",\nqv AS")
    val cut = graft.SqlSplice.lastIdx(arm, "\nSELECT COALESCE(l.doc_id")
    val bruteCtes = arm.substring(graft.SqlSplice.firstIdx(arm, ",\nqv AS"), cut)
    val fusedSelect = arm.substring(cut + 1)
    val m2 = 1L << graft.text.TextAnalysis.PplShift
    val top = 2L << graft.text.TextAnalysis.PplShift
    val steps = graft.text.TextAnalysis.PplSteps
    // the t21 shift-and-square log, unrolled over the 10-row rank
    // relation (l0..lN — st0..stN is taken by the spliced idf chain)
    val logChain = {
      val sb = new StringBuilder
      sb ++= s"""dl0 AS (
         |  SELECT rnum, length(bin(den // num)) - 1 AS e,
         |    (den * $m2) // (num * (1::BIGINT << (length(bin(den // num)) - 1))) AS m,
         |    0::BIGINT AS f
         |  FROM rnk)""".stripMargin
      for (r <- 1 to steps) {
        sb ++= s""",
         |dl$r AS (SELECT rnum, e,
         |  CASE WHEN (m * m) // $m2 >= $top THEN ((m * m) // $m2) // 2
         |       ELSE (m * m) // $m2 END AS m,
         |  f * 2 + CASE WHEN (m * m) // $m2 >= $top THEN 1 ELSE 0 END AS f
         |  FROM dl${r - 1})""".stripMargin
      }
      sb.result()
    }
    s"""$lexCtes$bruteCtes,
       |tru AS ($fusedSelect),
       |trr AS (SELECT doc_id FROM tru),
       |${Knn.ivfCtes},
       |adtop AS (
       |  SELECT vec_id AS doc_id,
       |    ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS dense_rank
       |  FROM scored
       |  WHERE q_id = ${Hybrid.QueryDoc} AND cos IS NOT NULL AND NOT isnan(cos)
       |  QUALIFY dense_rank <= 5),
       |annr AS (
       |  SELECT doc_id,
       |    CAST(ROW_NUMBER() OVER (ORDER BY rrf_milli DESC, doc_id) AS BIGINT) AS rank
       |  FROM (
       |    SELECT COALESCE(l.doc_id, dn.doc_id) AS doc_id,
       |      COALESCE(1000000 // (${Hybrid.RrfC} + l.lex_rank), 0) +
       |      COALESCE(1000000 // (${Hybrid.RrfC} + dn.dense_rank), 0) AS rrf_milli
       |    FROM ltop l FULL OUTER JOIN adtop dn ON l.doc_id = dn.doc_id
       |    ORDER BY rrf_milli DESC, doc_id LIMIT 10)),
       |rnk AS (SELECT CAST(u.r AS BIGINT) AS rnum, CAST(1 AS BIGINT) AS num,
       |  CAST(u.r + 1 AS BIGINT) AS den
       |  FROM (SELECT unnest(generate_series(1, 10)) AS r) u),
       |$logChain,
       |disc AS (SELECT rnum,
       |  CAST(1000000000 AS BIGINT) // (e * 1000 + (f * 1000) // 1024) AS gain_micro
       |  FROM dl$steps),
       |hits AS (SELECT a.rank FROM annr a JOIN trr t ON t.doc_id = a.doc_id),
       |hs AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rel,
       |    CAST(COALESCE(MIN(rank), 0) AS BIGINT) AS first_rank
       |  FROM hits),
       |dcg AS (
       |  SELECT CAST(COALESCE(SUM(d.gain_micro), 0) AS BIGINT) AS dcg_micro
       |  FROM hits h JOIN disc d ON d.rnum = h.rank),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM trr),
       |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand FROM annr),
       |idcg AS (
       |  SELECT CAST(SUM(d.gain_micro) AS BIGINT) AS idcg_micro
       |  FROM disc d, nt WHERE d.rnum <= LEAST(nt.n_true, 10))
       |SELECT nt.n_true, nc.n_cand, hs.n_rel, hs.first_rank,
       |  CASE WHEN hs.first_rank > 0 THEN 1000000 // hs.first_rank
       |       ELSE CAST(0 AS BIGINT) END AS rr_micro,
       |  dcg.dcg_micro, idcg.idcg_micro,
       |  CAST(dcg.dcg_micro AS DOUBLE) / idcg.idcg_micro AS ndcg
       |FROM nt, nc, hs, dcg, idcg""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "s19_rag_pipeline" -> (s19 _),
    "s21_rag_recall" -> (s21 _),
    "s25_rank_metrics" -> (s25 _))
  val oracles: Map[String, String] = Map(
    "s19_rag_pipeline" -> s19Sql,
    "s21_rag_recall" -> s21Sql,
    "s25_rank_metrics" -> s25Sql)
}
