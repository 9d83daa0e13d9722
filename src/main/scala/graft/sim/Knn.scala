package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QFn, Tables}
import graft.functions.VectorFunctions
import graft.plans.TopK

/** Similarity search s1–s3 (SURVEY.md §2) over `embeddings`.
  *
  * s1 is the brute-force baseline (per-query scan — at cluster scale
  * the query set broadcasts and the corpus never shuffles); s2 is the
  * LSH-bucketed scale path (probe only the query's bucket); s3 is the
  * IVF building block (centroid assignment).
  */
object Knn {

  /** The DuckDB mirror of VectorFunctions.dot — same sequential fold. */
  private def duckDot(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, 64),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (acc, x) -> acc + x)""".stripMargin

  private def duckCos(a: String, b: String): String =
    s"${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)}))"

  /** Final ranking of a scored candidate set (columns `q_id`, `vec_id`,
    * `cos`, plus `payload`): global top-`k` per query by (cos DESC,
    * vec_id ASC), with a 1-based `rank` column.
    *
    * The scale-critical part is NOT a `row_number` window — that ships
    * every scored candidate for a query to ONE task and fully sorts it
    * (the spilling-sort failure mode at 100 TB). Instead:
    *
    *  1. [[graft.plans.TopK.perKey]]: bounded k-heaps, O(n log k)
    *     streaming. The operator plans as partial+final stages, so
    *     each map partition thins its candidates to a local per-query
    *     top-k BEFORE the shuffle — the exchange moves at most
    *     partitions·k rows per query, never the scored volume, and no
    *     single task ever buffers a query's candidate set;
    *  2. rank assembly inside a per-query aggregate: collect the ≤ k
    *     survivors, array_sort with an explicit (cos DESC, vec_id ASC)
    *     comparator, posexplode — no Window node anywhere, and the
    *     sorted array is k elements, never candidate-count elements.
    */
  private[graft] def rankTopK(scored: DataFrame, k: Int, payload: Seq[String]): DataFrame = {
    // A zero-norm embedding scores NaN (0/0) cosine. The heap's
    // interpreted double ordering ranks NaN GREATEST (it would be
    // selected), while the array_sort comparator below treats NaN as
    // equal to everything (neither > nor < holds) — selection and rank
    // assignment would disagree. Degenerate vectors are not meaningful
    // neighbors; drop them before ranking so both stages see one order.
    // The DuckDB oracles (s1Sql/s2Sql/s4Sql) carry the SAME predicate
    // (`cos IS NOT NULL AND NOT isnan(cos)`), so query and oracle agree
    // by contract — not by the test corpus happening to lack zero-norm
    // vectors. (DuckDB orders NaN greatest too; unmirrored, a zero-norm
    // vector would rank 1 in the oracle and be absent here.)
    val clean = scored.filter(col("cos").isNotNull && !isnan(col("cos")))
    val top = TopK.perKey(clean, Seq("q_id"), "cos", "vec_id", k)
    val fields = Seq("vec_id", "cos") ++ payload
    top.groupBy(col("q_id"))
      .agg(collect_list(struct(fields.map(col): _*)).as("cand"))
      .withColumn("sorted", expr(
        """array_sort(cand, (l, r) ->
          |  CASE WHEN l.cos > r.cos THEN -1 WHEN l.cos < r.cos THEN 1
          |       WHEN l.vec_id < r.vec_id THEN -1 WHEN l.vec_id > r.vec_id THEN 1
          |       ELSE 0 END)""".stripMargin))
      .select(col("q_id"), posexplode(col("sorted")).as(Seq("pos", "c")))
      .select((Seq(col("q_id"), (col("pos") + 1).cast("long").as("rank")) ++
        fields.map(f => col("c." + f).as(f))): _*)
  }

  /** s1: brute-force cosine top-10 per query vector. The query side is
    * tiny and broadcast; the corpus never shuffles for scoring, and the
    * ranking runs through partial+final bounded heaps (see [[rankTopK]]).
    */
  private def s1(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      // corpus norms once per vector; spread the scan before the
      // per-candidate dot loop
      .repartition(s.sessionState.conf.numShufflePartitions)
      .withColumn("norm_e", sqrt(VectorFunctions.dot("embedding", "embedding")))
      // zero-norm guard BEFORE the cosine division: under ANSI mode
      // (Spark 4 default) 0/0 THROWS rather than scoring NaN, so a
      // degenerate embedding must be excluded here, not merely dropped
      // by rankTopK's NaN filter (which stays as non-ANSI defense).
      // The oracles' NOT isnan(cos) predicate is the same exclusion.
      .filter(col("norm_e") > 0)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("norm_e").as("norm_q"))
    val scored = broadcast(q)
      .join(e, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (VectorFunctions.dot("qe", "embedding") / (col("norm_q") * col("norm_e"))).as("cos"))
    rankTopK(scored, 10, Seq.empty)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val s1Sql =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.q_id, e.vec_id,
       |    ${duckCos("q.qe", "e.embedding")} AS cos
       |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id)
       |SELECT q_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank,
       |       vec_id, cos
       |FROM scored
       |WHERE cos IS NOT NULL AND NOT isnan(cos)
       |QUALIFY rank <= 10
       |ORDER BY q_id, rank""".stripMargin

  /** Oracle-side bucket dims: pinned to the DEFAULT width, because the
    * SQL string is generated once at class load. The query side reads
    * the same default unless `graft.lsh.signBits` overrides it (sized
    * via [[VectorFunctions.signBitsFor]] for larger corpora — only in
    * deployments that don't run the oracle gate). */
  private val lshDims = VectorFunctions.defaultSignDims

  /** s2: LSH-bucketed ANN — hyperplane-sign bucket (sessionSignDims,
    * default 8 bits), then brute-force only within the query's bucket.
    * The bucket key is a per-row expression; the probe join is an
    * equi-join on it.
    */
  private def s2(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .repartition(s.sessionState.conf.numShufflePartitions)
      .withColumn("bucket",
        VectorFunctions.signBucket("embedding", VectorFunctions.sessionSignDims(s)))
      .withColumn("norm_e", sqrt(VectorFunctions.dot("embedding", "embedding")))
      .filter(col("norm_e") > 0) // ANSI zero-norm guard (see s1)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        col("bucket"), col("norm_e").as("norm_q"))
    val scored = broadcast(q)
      .join(e, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("bucket"), col("vec_id"),
        (VectorFunctions.dot("qe", "embedding") / (col("norm_q") * col("norm_e"))).as("cos"))
    rankTopK(scored, 3, Seq("bucket"))
      .select(col("q_id"), col("bucket"), col("vec_id"), col("cos"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val s2BucketSql = lshDims
    .map(i => s"(CASE WHEN embedding[$i] > 0 THEN '1' ELSE '0' END)").mkString(" || ")

  private val s2Sql =
    s"""WITH b AS (
       |  SELECT vec_id, embedding, $s2BucketSql AS bucket
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qe, bucket FROM b WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.q_id, b.bucket, b.vec_id,
       |    ${duckCos("q.qe", "b.embedding")} AS cos
       |  FROM q JOIN b ON q.bucket = b.bucket AND b.vec_id <> q.q_id)
       |SELECT q_id, bucket, vec_id, cos,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |FROM scored
       |WHERE cos IS NOT NULL AND NOT isnan(cos)
       |QUALIFY rank <= 3
       |ORDER BY q_id, rank""".stripMargin

  /** s3: IVF cell assignment — per-label centroids, each vector assigned
    * to its nearest centroid by L2.
    *
    * Determinism: centroid components are cross-row sums, so they use
    * integer nano-units (round(x·1e9) summed as BIGINT — exact and
    * order-independent); distances are per-row array folds against the
    * assembled centroid vectors (sequential doubles, bit-identical on
    * any cluster). The centroid table is tiny and broadcast; assignment
    * is one pass over vectors.
    */
  /** Per-label centroid vectors (tiny: one row per cell), exact via
    * integer nano-unit sums. Shared by s3 (assignment) and s4 (probe).
    */
  private def centroidArrays(e: DataFrame): DataFrame = {
    val dims = e.select(col("vec_id"), col("label"),
      posexplode(col("embedding")).as(Seq("i", "x")))
    val cents = dims.groupBy(col("label").as("cell"), col("i"))
      .agg(sum(round(col("x").cast("double") * 1e9).cast("long")).as("c_nano"),
        count(lit(1)).as("cnt"))
      .withColumn("c", col("c_nano").cast("double") / (lit(1e9) * col("cnt")))
    cents.groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("i"), col("c")))).as("ic"))
      .select(col("cell"), expr("transform(ic, s -> s.c)").as("carr"))
  }

  /** Nearest-centroid assignment: one broadcast pass over vectors,
    * keeping `extra` payload columns.
    *
    * The argmin is a `min_by` HASH AGGREGATE, not a per-vector window:
    * partial aggregation collapses the ncells candidate rows of each
    * vector map-side (they are co-located — the cross join preserves
    * the input partitioning), so the shuffle carries one row per vector
    * and nothing is ever sorted. `cell` is unique per (vec_id,
    * centroid) row, so the (dist, cell) order key is total and the
    * argmin deterministic.
    */
  private def assign(e: DataFrame, centArr: DataFrame, extra: Seq[String]): DataFrame = {
    val payload = Seq("label", "cell", "dist") ++ extra
    e.crossJoin(broadcast(centArr))
      .select((Seq(col("vec_id"), col("label"), col("cell"),
        VectorFunctions.l2sq("embedding", "carr").as("dist")) ++ extra.map(col)): _*)
      .groupBy(col("vec_id"))
      .agg(min_by(struct(payload.map(col): _*), struct(col("dist"), col("cell"))).as("_m"))
      .select((col("vec_id") +: payload.map(f => col("_m." + f).as(f))): _*)
  }

  private def s3(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .repartition(s.sessionState.conf.numShufflePartitions)
    assign(e, centroidArrays(e), Seq.empty)
      .select(col("vec_id"), col("label"), col("cell").as("assigned_cell"), col("dist"))
      .orderBy(col("vec_id"))
  }

  private val s3Sql =
    """WITH dims AS (
      |  SELECT vec_id, label, g.i, CAST(embedding[g.i] AS DOUBLE) AS x
      |  FROM embeddings, generate_series(1, 64) AS g(i)),
      |cents AS (
      |  SELECT label AS cell, i,
      |    CAST(SUM(CAST(round(x * 1e9) AS BIGINT)) AS DOUBLE) / (1e9 * COUNT(*)) AS c
      |  FROM dims GROUP BY label, i),
      |centarr AS (
      |  SELECT cell, list(c ORDER BY i) AS carr FROM cents GROUP BY cell),
      |dists AS (
      |  SELECT e.vec_id, e.label, c.cell,
      |    list_reduce(list_transform(generate_series(1, 64),
      |      i -> (CAST(e.embedding[i] AS DOUBLE) - c.carr[i]) * (CAST(e.embedding[i] AS DOUBLE) - c.carr[i])),
      |      (acc, x) -> acc + x) AS dist
      |  FROM embeddings e CROSS JOIN centarr c)
      |SELECT vec_id, label, cell AS assigned_cell, dist
      |FROM dists
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1
      |ORDER BY vec_id""".stripMargin

  /** s4: IVF probe search — the query ranks cells by centroid distance,
    * probes the `nprobe`=2 nearest, and brute-forces cosine only against
    * corpus vectors ASSIGNED to those cells. The scale path of IVF ANN:
    * the corpus is scanned once for assignment (shuffle-free broadcast
    * pass) and each query touches ~nprobe/ncells of it; queries, cells
    * and probe pairs all broadcast.
    */
  private def s4(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .repartition(s.sessionState.conf.numShufflePartitions)
    val centArr = centroidArrays(e)
    val corpus = assign(e.withColumn("norm_e", sqrt(VectorFunctions.dot("embedding", "embedding")))
        .filter(col("norm_e") > 0), // ANSI zero-norm guard (see s1)
        centArr, Seq("embedding", "norm_e"))
      .select(col("vec_id"), col("cell").as("assigned_cell"), col("embedding"), col("norm_e"))
    val wc = Window.partitionBy(col("q_id")).orderBy(col("qdist"), col("cell"))
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(centArr))
      .select(col("q_id"), col("qe"), col("cell"),
        VectorFunctions.l2sq("qe", "carr").as("qdist"))
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= 2)
      .select(col("q_id"), col("qe"), col("cell").as("probe_cell"))
      .withColumn("norm_q", sqrt(VectorFunctions.dot("qe", "qe")))
      .filter(col("norm_q") > 0) // ANSI zero-norm guard (see s1)
    val scored = broadcast(probes)
      .join(corpus, col("probe_cell") === col("assigned_cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("assigned_cell"),
        (VectorFunctions.dot("qe", "embedding") / (col("norm_q") * col("norm_e"))).as("cos"))
    rankTopK(scored, 5, Seq("assigned_cell"))
      .select(col("q_id"), col("rank"), col("vec_id"), col("assigned_cell"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** The IVF pipeline CTE chain ending in scored(q_id, vec_id,
    * assigned_cell, cos) — shared verbatim by the s4 oracle and the s6
    * recall oracle, so the two necessarily measure the same index. */
  private val ivfCtes =
    s"""dims AS (
       |  SELECT vec_id, label, g.i, CAST(embedding[g.i] AS DOUBLE) AS x
       |  FROM embeddings, generate_series(1, 64) AS g(i)),
       |cents AS (
       |  SELECT label AS cell, i,
       |    CAST(SUM(CAST(round(x * 1e9) AS BIGINT)) AS DOUBLE) / (1e9 * COUNT(*)) AS c
       |  FROM dims GROUP BY label, i),
       |centarr AS (
       |  SELECT cell, list(c ORDER BY i) AS carr FROM cents GROUP BY cell),
       |l2 AS (
       |  SELECT e.vec_id, e.embedding, c.cell,
       |    list_reduce(list_transform(generate_series(1, 64),
       |      i -> (CAST(e.embedding[i] AS DOUBLE) - c.carr[i]) * (CAST(e.embedding[i] AS DOUBLE) - c.carr[i])),
       |      (acc, x) -> acc + x) AS dist
       |  FROM embeddings e CROSS JOIN centarr c),
       |corpus AS (
       |  SELECT vec_id, embedding, cell AS assigned_cell FROM l2
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, embedding AS qe, cell AS probe_cell FROM l2
       |  WHERE vec_id < 5
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) <= 2),
       |scored AS (
       |  SELECT p.q_id, c.vec_id, c.assigned_cell,
       |    ${duckCos("p.qe", "c.embedding")} AS cos
       |  FROM probes p JOIN corpus c
       |    ON p.probe_cell = c.assigned_cell AND c.vec_id <> p.q_id)""".stripMargin

  private val s4Sql =
    s"""WITH $ivfCtes
       |SELECT q_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank,
       |       vec_id, assigned_cell, cos
       |FROM scored
       |WHERE cos IS NOT NULL AND NOT isnan(cos)
       |QUALIFY rank <= 5
       |ORDER BY q_id, rank""".stripMargin

  /** s5: ANN recall@3 — the standard quality metric for an
    * approximate index: per query, the fraction of the TRUE top-3
    * (s1's brute-force ranking) that the LSH-bucketed path (s2)
    * actually returned. A production pipeline runs exactly this
    * measurement on a query sample before trusting an ANN index at
    * corpus scale; here it doubles as an executable contract tying the
    * approximate operator to its exact reference. Both sides are the
    * existing operators; the comparison is a tiny (queries x k)
    * semi-join plus one aggregate — measurement cost is the two
    * rankings themselves, nothing quadratic.
    */
  private def s5(s: SparkSession, d: String): DataFrame =
    recallVs(
      s1(s, d).filter(col("rank") <= 3).select(col("q_id"), col("vec_id")),
      s2(s, d).select(col("q_id"), col("vec_id")))

  /** Per-query recall of an approximate ranking against a truth
    * ranking — the shared engine of s5 (LSH index) and s6 (IVF index).
    * A tiny (queries × k) semi-join plus one aggregate; measurement
    * cost is the two rankings themselves, nothing quadratic.
    */
  private def recallVs(tru: DataFrame, ann: DataFrame): DataFrame = {
    val nTrue = tru.groupBy(col("q_id")).agg(count(lit(1)).as("n_true"))
    val nFound = tru.join(ann, Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_found"))
    nTrue.join(nFound, Seq("q_id"), "left")
      .select(col("q_id"), col("n_true"),
        coalesce(col("n_found"), lit(0L)).as("n_found"))
      .withColumn("recall", col("n_found").cast("double") / col("n_true"))
      .orderBy(col("q_id"))
  }

  /** Brute-force truth CTE `tru(q_id, vec_id)` at top-`k` — the s1
    * ranking (same NaN/ANSI predicate as s1Sql) that both recall
    * oracles (s5/s6) compare their approximate index against. */
  private def truTopSql(k: Int): String =
    s"""tru AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, e.vec_id, ${duckCos("q.qe", "e.embedding")} AS cos
       |    FROM (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5) q
       |    JOIN embeddings e ON e.vec_id <> q.q_id)
       |  WHERE cos IS NOT NULL AND NOT isnan(cos)
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= $k)""".stripMargin

  /** Recall tail over tru/ann CTEs — the SQL mirror of [[recallVs]]. */
  private val recallTailSql =
    """nt AS (SELECT q_id, COUNT(*) AS n_true FROM tru GROUP BY q_id),
      |nf AS (
      |  SELECT t.q_id, COUNT(*) AS n_found
      |  FROM tru t JOIN ann a ON a.q_id = t.q_id AND a.vec_id = t.vec_id
      |  GROUP BY t.q_id)
      |SELECT nt.q_id, nt.n_true,
      |  CAST(COALESCE(nf.n_found, 0) AS BIGINT) AS n_found,
      |  CAST(COALESCE(nf.n_found, 0) AS DOUBLE) / nt.n_true AS recall
      |FROM nt LEFT JOIN nf ON nf.q_id = nt.q_id
      |ORDER BY nt.q_id""".stripMargin

  private val s5Sql =
    s"""WITH ${truTopSql(3)},
       |b AS (
       |  SELECT vec_id, embedding, $s2BucketSql AS bucket
       |  FROM embeddings),
       |ann AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, bb.vec_id, ${duckCos("q.qe", "bb.embedding")} AS cos
       |    FROM (SELECT vec_id AS q_id, embedding AS qe, bucket FROM b WHERE vec_id < 5) q
       |    JOIN b bb ON bb.bucket = q.bucket AND bb.vec_id <> q.q_id)
       |  WHERE cos IS NOT NULL AND NOT isnan(cos)
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= 3),
       |$recallTailSql""".stripMargin

  /** s6: IVF recall@5 — s5's quality contract for the OTHER index. s5
    * measures the LSH bucket path; this measures the IVF probe path
    * (s4) against the same brute-force truth (s1), per query vector.
    * Recall here is governed by nprobe (s4 probes 2 of the cells) —
    * the knob a production IVF deployment actually tunes: raising
    * nprobe trades scan fraction for recall, and THIS query is the
    * measurement that justifies the setting before trusting the index
    * at corpus scale. Shares [[recallVs]] with s5; the oracle shares
    * s4's whole CTE chain, so query and contract measure one index.
    */
  private def s6(s: SparkSession, d: String): DataFrame =
    recallVs(
      s1(s, d).filter(col("rank") <= 5).select(col("q_id"), col("vec_id")),
      s4(s, d).select(col("q_id"), col("vec_id")))

  private val s6Sql =
    s"""WITH ${truTopSql(5)},
       |$ivfCtes,
       |ann AS (
       |  SELECT q_id, vec_id FROM scored
       |  WHERE cos IS NOT NULL AND NOT isnan(cos)
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= 5),
       |$recallTailSql""".stripMargin

  /** s7: SQ8 (int8 scalar quantization) recall@3 — the memory-side ANN
    * lever the LSH/IVF family doesn't cover: at 100 TB of float32
    * embeddings the scoring scan is BANDWIDTH-bound, and storing each
    * dimension as an 8-bit code against per-dimension corpus min/max
    * cuts the scanned bytes 4×. The quantizer here is the standard
    * affine SQ8: one tiny stats pass (64-row min/max aggregate,
    * broadcast), codes = floor((x−mn)/(mx−mn)·255), decode back to
    * float32 at scoring time so the hot path stays the codegen'd
    * [[VectorFunctions.dot]] — exactly how a production scorer runs
    * (decode-and-FMA over codes, never materializing a float corpus).
    * `floor`, not `round`: floor is bit-identical across engines while
    * round's half-way rule differs, and the constant-dimension guard
    * (mx == mn → code 0) keeps the division ANSI-safe.
    *
    * The query is the recall contract for that compression: top-3 by
    * QUANTIZED cosine vs s1's exact truth, per query — the measurement
    * that justifies 4× less scan bandwidth before trusting it. Shares
    * [[recallVs]]/[[rankTopK]] with s5/s6; the oracle mirrors the
    * quantize-decode arithmetic exactly (same floor, same float32
    * cast), so the driver compare pins the full SQ8 arithmetic, not
    * just the recall numbers.
    */
  private def s7(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .repartition(s.sessionState.conf.numShufflePartitions)
    val stats = e.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
    val statArr = stats
      .agg(array_sort(collect_list(struct(col("i"), col("mn"), col("mx")))).as("sarr"))
      .select(expr("transform(sarr, t -> t.mn)").as("mnarr"),
        expr("transform(sarr, t -> t.mx)").as("mxarr"))
    val recon = expr(
      """transform(sequence(1, 64), i -> CAST(
        |  CASE WHEN element_at(mxarr, i) > element_at(mnarr, i)
        |    THEN element_at(mnarr, i)
        |      + floor((CAST(element_at(embedding, i) AS DOUBLE) - element_at(mnarr, i))
        |          / (element_at(mxarr, i) - element_at(mnarr, i)) * 255)
        |        / 255 * (element_at(mxarr, i) - element_at(mnarr, i))
        |    ELSE element_at(mnarr, i) END AS FLOAT))""".stripMargin)
    val eq = e.crossJoin(broadcast(statArr))
      .select(col("vec_id"), recon.as("recon"))
      .withColumn("norm_e", sqrt(VectorFunctions.dot("recon", "recon")))
      .filter(col("norm_e") > 0) // ANSI zero-norm guard (see s1)
    val q = eq.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("recon").as("qr"), col("norm_e").as("norm_q"))
    val scored = broadcast(q)
      .join(eq, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (VectorFunctions.dot("qr", "recon") / (col("norm_q") * col("norm_e"))).as("cos"))
    val ann = rankTopK(scored, 3, Seq.empty).select(col("q_id"), col("vec_id"))
    recallVs(
      s1(s, d).filter(col("rank") <= 3).select(col("q_id"), col("vec_id")),
      ann)
  }

  private val s7Sql =
    s"""WITH ${truTopSql(3)},
       |dims AS (
       |  SELECT g.i, CAST(embedding[g.i] AS DOUBLE) AS x
       |  FROM embeddings, generate_series(1, 64) AS g(i)),
       |mmx AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM dims GROUP BY i),
       |sarr AS (SELECT list(mn ORDER BY i) AS mnarr, list(mx ORDER BY i) AS mxarr FROM mmx),
       |recon AS (
       |  SELECT e.vec_id,
       |    list_transform(generate_series(1, 64), i -> CAST(
       |      CASE WHEN s.mxarr[i] > s.mnarr[i]
       |        THEN s.mnarr[i]
       |          + floor((CAST(e.embedding[i] AS DOUBLE) - s.mnarr[i])
       |              / (s.mxarr[i] - s.mnarr[i]) * 255)
       |            / 255 * (s.mxarr[i] - s.mnarr[i])
       |        ELSE s.mnarr[i] END AS FLOAT)) AS r
       |  FROM embeddings e CROSS JOIN sarr s),
       |ann AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, c.vec_id, ${duckCos("q.qr", "c.r")} AS cos
       |    FROM (SELECT vec_id AS q_id, r AS qr FROM recon WHERE vec_id < 5) q
       |    JOIN recon c ON c.vec_id <> q.q_id)
       |  WHERE cos IS NOT NULL AND NOT isnan(cos)
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= 3),
       |$recallTailSql""".stripMargin

  val queries: Map[String, QFn] = Map(
    "s7_sq8_recall" -> (s7 _),
    "s1_knn_brute" -> (s1 _),
    "s2_ann_lsh" -> (s2 _),
    "s3_ivf_cells" -> (s3 _),
    "s4_ivf_probe" -> (s4 _),
    "s5_ann_recall" -> (s5 _),
    "s6_ivf_recall" -> (s6 _))

  val oracles: Map[String, String] = Map(
    "s7_sq8_recall" -> s7Sql,
    "s1_knn_brute" -> s1Sql,
    "s2_ann_lsh" -> s2Sql,
    "s3_ivf_cells" -> s3Sql,
    "s4_ivf_probe" -> s4Sql,
    "s5_ann_recall" -> s5Sql,
    "s6_ivf_recall" -> s6Sql)
}
