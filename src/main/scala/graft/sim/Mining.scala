package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QFn, Tables}
import graft.functions.VectorFunctions
import graft.plans.TopK

/** s16: hard-negative mining for embedding-model training — the
  * training-data operator the retrieval family exists to feed (DPR,
  * Karpukhin et al. 2020, arXiv:2004.04906 §3.2; Sentence-BERT): for
  * each training query, the best negatives are candidates a LEXICAL
  * ranker scores high but whose embedding disagrees — lexically
  * plausible, semantically unrelated. Random negatives are trivially
  * separable; BM25-mined hard negatives are what makes the contrastive
  * gradient informative.
  *
  * Per standing query doc (s1's five, `doc_id < 5`): BM25
  * query-by-document top-[[LexK]] (s14's integer arithmetic over the
  * query's vocabulary), then the query↔candidate embedding cosine
  * (s1's exact per-row fold), and the verdict `is_hard_negative` =
  * cos < [[HardNegTau]]. τ = 0: non-positive embedding agreement.
  * Measured on the corpus (DuckDB probe, both sf0.001 and sf0.01):
  * candidate cosines span −0.39..+0.31 with median ≈ 0, so the
  * threshold splits both populations non-degenerately — the flag is
  * falsifiable in either direction.
  *
  * Scale shape: the union query vocabulary (5 docs' distinct tokens)
  * broadcasts; the corpus token stream thins against it BEFORE the
  * (doc, tok) shuffle; tf is aggregated ONCE query-independently and
  * the (tok → q_id) expansion joins the vocab-sized broadcast AFTER
  * the aggregate (never multiplying the corpus-sized stream by the
  * query count); per-query top-k runs through [[TopK.perKey]]'s
  * partial+final bounded heaps (the one shuffle moves survivors, not
  * candidates); the ≤ queries×k winner set broadcasts into ONE
  * thinned embeddings scan for the cosine — output is bounded by
  * queries×k at any corpus size.
  */
object Mining {

  /** s1's standing query population (`vec_id < 5` ≡ `doc_id < 5`). */
  private[graft] val NQueries = 5L

  /** Lexical candidate depth per query. */
  private[graft] val LexK = 20

  /** Hard-negative verdict: embedding agreement at or below zero —
    * data-informed (see scaladoc); a named constant so query and
    * oracle cannot drift. */
  private[graft] val HardNegTau = 0.0

  private[graft] def s16(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id").isNotNull)
    // (q_id, tok): the query docs' distinct tokens — metadata-sized
    val qterms = docs.filter(col("doc_id") < NQueries)
      .select(col("doc_id").as("q_id"),
        explode_outer(expr(Bm25.TsE)).as("tok"))
      .filter(col("tok").isNotNull).distinct()
    val vocab = qterms.select("tok").distinct()
    // corpus token stream thinned to the union vocabulary before the
    // shuffle; tf/len aggregated once, query-independently
    val hits = docs
      .select(col("doc_id"), expr(Bm25.TsE).as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("long").as("len"),
        explode_outer(col("ts")).as("tok"))
      .join(broadcast(vocab), Seq("tok"))
    val tf = hits.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"), min(col("len")).as("len"))
    val stats = docs
      .select(expr("regexp_count(text, '\\\\S+')").cast("long").as("len"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("s_tok"))
    val consts = Bm25.idfConsts(tf, stats)
    // expand to (q_id, doc, tok) AFTER the tf aggregate, score, roll up
    val scored = tf
      .join(broadcast(qterms), Seq("tok"))
      .filter(col("doc_id") =!= col("q_id"))
      .join(broadcast(consts), Seq("tok"))
      .select(col("q_id"), col("doc_id"), expr(Bm25.StermExpr).as("sterm"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("sterm")).as("score_milli"))
    // per-query top-k via bounded heaps, rank assembly on the <= k
    // survivors (the rankTopK idiom — no Window)
    val ranked = TopK.perKey(scored, Seq("q_id"), "score_milli", "doc_id", LexK)
      .groupBy(col("q_id"))
      .agg(collect_list(struct(col("score_milli"), col("doc_id"))).as("cand"))
      .withColumn("sorted", expr(
        """array_sort(cand, (l, r) ->
          |  CASE WHEN l.score_milli > r.score_milli THEN -1
          |       WHEN l.score_milli < r.score_milli THEN 1
          |       WHEN l.doc_id < r.doc_id THEN -1
          |       WHEN l.doc_id > r.doc_id THEN 1 ELSE 0 END)""".stripMargin))
      .select(col("q_id"), posexplode(col("sorted")).as(Seq("pos", "c")))
      .select(col("q_id"), col("c.doc_id").as("doc_id"),
        (col("pos") + 1).cast("long").as("lex_rank"),
        col("c.score_milli").as("score_milli"))
    // embedding agreement for the bounded winner set: the candidates
    // broadcast into ONE thinned embeddings scan; zero-norm guard
    // mirrors s1 (the oracle's NOT isnan predicate is the same rule)
    val e = Tables.embeddings(s, d)
      .withColumn("norm", sqrt(VectorFunctions.dot("embedding", "embedding")))
      .filter(col("norm") > 0)
    val qe = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        col("norm").as("norm_q"))
    e.join(broadcast(ranked), e("vec_id") === ranked("doc_id"))
      .join(broadcast(qe), Seq("q_id"))
      .select(col("q_id"), col("doc_id"), col("lex_rank"), col("score_milli"),
        (VectorFunctions.dot("qe", "embedding") / (col("norm_q") * col("norm")))
          .as("cos"))
      .withColumn("is_hard_negative", col("cos") < HardNegTau)
      .orderBy(col("q_id"), col("lex_rank"))
  }

  private def s16Sql: String = {
    val m2 = 1L << graft.text.TextAnalysis.PplShift
    val top = 2L << graft.text.TextAnalysis.PplShift
    val steps = graft.text.TextAnalysis.PplSteps
    def fold(a: String, b: String): String =
      "list_reduce(list_transform(generate_series(1, 64), " +
        s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (acc, x) -> acc + x)"
    val sb = new StringBuilder
    sb ++= s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL),
       |toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS ts FROM docs),
       |q AS (SELECT DISTINCT t.doc_id AS q_id, u.tok AS tok
       |      FROM toks t, unnest(t.ts) AS u(tok) WHERE t.doc_id < $NQueries),
       |lens AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS len FROM toks),
       |sc AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len) AS BIGINT) AS s_tok FROM lens),
       |tf AS (
       |  SELECT t.doc_id, u.tok AS tok, CAST(COUNT(*) AS BIGINT) AS tf,
       |    MIN(CAST(len(t.ts) AS BIGINT)) AS len
       |  FROM toks t, unnest(t.ts) AS u(tok)
       |  WHERE u.tok IN (SELECT DISTINCT tok FROM q) GROUP BY 1, 2),
       |dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
       |idf0 AS (SELECT tok, df * 2 + 1 AS num, n_docs * 2 + 2 AS den FROM dfq, sc),
       |st0 AS (
       |  SELECT tok, length(bin(den // num)) - 1 AS e,
       |    (den * $m2) // (num * (1::BIGINT << (length(bin(den // num)) - 1))) AS m,
       |    0::BIGINT AS f
       |  FROM idf0)""".stripMargin
    for (r <- 1 to steps) {
      sb ++= s""",
       |st$r AS (SELECT tok, e,
       |  CASE WHEN (m * m) // $m2 >= $top THEN ((m * m) // $m2) // 2
       |       ELSE (m * m) // $m2 END AS m,
       |  f * 2 + CASE WHEN (m * m) // $m2 >= $top THEN 1 ELSE 0 END AS f
       |  FROM st${r - 1})""".stripMargin
    }
    sb ++= s""",
       |idf AS (SELECT tok, e * 1000 + (f * 1000) // 1024 AS idf_milli FROM st$steps),
       |av AS (SELECT (2 * s_tok + n_docs) // (2 * n_docs) AS a FROM sc),
       |lscored AS (
       |  SELECT qq.q_id, f.doc_id,
       |    CAST(SUM((i.idf_milli * (44 * v.a * f.tf)) //
       |        (20 * v.a * f.tf + 6 * v.a + 18 * f.len)) AS BIGINT) AS score_milli
       |  FROM tf f JOIN q qq USING (tok) JOIN idf i USING (tok), av v
       |  WHERE f.doc_id <> qq.q_id GROUP BY 1, 2),
       |ltop AS (
       |  SELECT q_id, doc_id, score_milli,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |                       ORDER BY score_milli DESC, doc_id) AS lex_rank
       |  FROM lscored QUALIFY lex_rank <= $LexK),
       |cosj AS (
       |  SELECT l.q_id, l.doc_id, CAST(l.lex_rank AS BIGINT) AS lex_rank,
       |    l.score_milli,
       |    ${fold("eq.embedding", "ed.embedding")} /
       |      (sqrt(${fold("eq.embedding", "eq.embedding")}) *
       |       sqrt(${fold("ed.embedding", "ed.embedding")})) AS cos
       |  FROM ltop l
       |  JOIN embeddings eq ON eq.vec_id = l.q_id
       |  JOIN embeddings ed ON ed.vec_id = l.doc_id)
       |SELECT q_id, doc_id, lex_rank, score_milli, cos,
       |  cos < $HardNegTau AS is_hard_negative
       |FROM cosj WHERE cos IS NOT NULL AND NOT isnan(cos)
       |ORDER BY q_id, lex_rank""".stripMargin
    sb.result()
  }

  val queries: Map[String, QFn] = Map("s16_hard_negatives" -> (s16 _))
  val oracles: Map[String, String] = Map("s16_hard_negatives" -> s16Sql)
}
