package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QFn, Tables}
import graft.functions.VectorFunctions
import graft.plans.TopK
import graft.operators.Spread._

/** Similarity search s1–s3 (SURVEY.md §2) over `embeddings`.
  *
  * s1 is the brute-force baseline (per-query scan — at cluster scale
  * the query set broadcasts and the corpus never shuffles); s2 is the
  * LSH-bucketed scale path (probe only the query's bucket); s3 is the
  * IVF building block (centroid assignment).
  */
object Knn {

  /** The DuckDB mirror of VectorFunctions.dot — same sequential fold. */
  private[sim] def duckDot(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, 64),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (acc, x) -> acc + x)""".stripMargin

  private[sim] def duckCos(a: String, b: String): String =
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
  private def s1(s: SparkSession, d: String): DataFrame =
    rankTopK(bruteScored(s, d), 10, Seq.empty)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("q_id"), col("rank"))

  /** The brute-force scoring shared by s1 (top-k truth), s13's range
    * truth, and s15's dense arm ([[Hybrid.denseArm]]): broadcast query
    * side, corpus never shuffles for scoring. */
  /** `corpusPred`: optional metadata predicate on the CANDIDATE side
    * only (queries always draw from the full corpus) — the filtered
    * brute truth s23 ranks against. None leaves s1's shape untouched. */
  private[sim] def bruteScored(s: SparkSession, d: String,
      corpusPred: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val e = Tables.embeddings(s, d)
      // corpus norms once per vector; spread the scan before the
      // per-candidate dot loop
      .spreadToCores
      .withColumn("norm_e", sqrt(VectorFunctions.dot("embedding", "embedding")))
      // zero-norm guard BEFORE the cosine division: under ANSI mode
      // (Spark 4 default) 0/0 THROWS rather than scoring NaN, so a
      // degenerate embedding must be excluded here, not merely dropped
      // by rankTopK's NaN filter (which stays as non-ANSI defense).
      // The oracles' NOT isnan(cos) predicate is the same exclusion.
      .filter(col("norm_e") > 0)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("norm_e").as("norm_q"))
    val corpus = corpusPred.fold(e)(p => e.filter(p))
    broadcast(q)
      .join(corpus, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (VectorFunctions.dot("qe", "embedding") / (col("norm_q") * col("norm_e"))).as("cos"))
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
      .spreadToCores
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

  private[sim] val s2BucketSql = lshDims
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
      .spreadToCores
    assign(e, centroidArrays(e), Seq.empty)
      .select(col("vec_id"), col("label"), col("cell").as("assigned_cell"), col("dist"))
      .sortWithinPartitions(col("vec_id"))
  }

  /** s3's assignment CTE chain ending in
    * `ivfassigned(vec_id, label, cell, dist)` — shared verbatim by the
    * s3 and s26 oracles (the UrlVerdictCtes discipline). */
  private[graft] val IvfAssignCtes =
    """dims AS (
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
      |  FROM embeddings e CROSS JOIN centarr c),
      |ivfassigned AS (
      |  SELECT vec_id, label, cell, dist FROM dists
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1)""".stripMargin

  private val s3Sql =
    s"""WITH $IvfAssignCtes
      |SELECT vec_id, label, cell AS assigned_cell, dist
      |FROM ivfassigned
      |ORDER BY vec_id""".stripMargin

  /** s26: the IVF index-health report — the per-cell diagnostics a
    * vector-index deployment reads before trusting (or rebuilding) an
    * index (FAISS's imbalance_factor + quantization-error stats, as a
    * query): per cell, its occupancy (n_vecs), occupancy ratio vs the
    * uniform share (n·ncells/N — >1 hot, 0 dead: hot cells make probe
    * latency skew, dead cells waste the nlist budget), and the
    * quantization error mass (Σ‖x−c‖², the k-means objective — the
    * number that says whether centroids still fit the data after
    * drift, cf. s17's delta segments). Cells come from the centroid
    * list LEFT-joined to assignments, so a dead cell REPORTS (the
    * whole point of the health check), not vanishes.
    *
    * Exactness: per-row dist is the engine-bit-identical fold
    * (VectorFunctions scaladoc); the cross-ROW error mass is summed in
    * integer nano-units (`round(dist·1e9)` per row, then an exact long
    * sum — the documented cross-row float rule); ratios divide exact
    * longs (1e9·n is double-exact well past any cell size here).
    *
    * Scale: one broadcast assignment pass (the s3 machinery shared
    * verbatim), one bounded per-cell aggregate, two 1-row scalars
    * crossJoined broadcast — the report is ncells rows.
    */
  private def s26(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .spreadToCores
    val cents = centroidArrays(e)
    val assigned = assign(e, cents, Seq.empty)
    val stats = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("cast(round(dist * 1e9) as bigint)")).as("sq_err_nano"))
    val totals = assigned.agg(count(lit(1)).as("n_total"))
    val ncells = cents.groupBy().agg(count(lit(1)).as("ncells"))
    cents.select(col("cell"))
      .join(stats, Seq("cell"), "left")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(ncells))
      .select(col("cell"),
        coalesce(col("n_vecs"), lit(0L)).as("n_vecs"),
        ((coalesce(col("n_vecs"), lit(0L)) * col("ncells")).cast("double") /
          col("n_total")).as("occupancy_ratio"),
        coalesce(col("sq_err_nano"), lit(0L)).as("sq_err_nano"),
        when(col("n_vecs").isNotNull,
          col("sq_err_nano").cast("double") / (lit(1e9) * col("n_vecs")))
          .as("mean_sq_err"))
      .orderBy(col("cell"))
  }

  private val s26Sql =
    s"""WITH $IvfAssignCtes,
      |cellstats AS (
      |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |    CAST(SUM(CAST(round(dist * 1e9) AS BIGINT)) AS BIGINT) AS sq_err_nano
      |  FROM ivfassigned GROUP BY cell),
      |itot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM ivfassigned),
      |inc AS (SELECT CAST(COUNT(*) AS BIGINT) AS ncells FROM centarr)
      |SELECT c.cell,
      |  COALESCE(s.n_vecs, 0) AS n_vecs,
      |  CAST(COALESCE(s.n_vecs, 0) * ncells AS DOUBLE) / n_total AS occupancy_ratio,
      |  COALESCE(s.sq_err_nano, 0) AS sq_err_nano,
      |  CASE WHEN s.n_vecs IS NOT NULL
      |       THEN CAST(s.sq_err_nano AS DOUBLE) / (1e9 * s.n_vecs) END AS mean_sq_err
      |FROM centarr c
      |LEFT JOIN cellstats s ON s.cell = c.cell, itot, inc
      |ORDER BY c.cell""".stripMargin

  /** s4: IVF probe search — the query ranks cells by centroid distance,
    * probes the `nprobe`=2 nearest, and brute-forces cosine only against
    * corpus vectors ASSIGNED to those cells. The scale path of IVF ANN:
    * the corpus is scanned once for assignment (shuffle-free broadcast
    * pass) and each query touches ~nprobe/ncells of it; queries, cells
    * and probe pairs all broadcast.
    */
  private def s4(s: SparkSession, d: String): DataFrame =
    rankTopK(ivfScored(s, d), 5, Seq("assigned_cell"))
      .select(col("q_id"), col("rank"), col("vec_id"), col("assigned_cell"), col("cos"))
      .orderBy(col("q_id"), col("rank"))

  /** The IVF probe scoring shared by s4 (top-k), s6 (recall, via s4),
    * s12 (range search) and s22 (filtered search): assign the corpus
    * to cells, probe the 2 nearest cells per query, score cosine over
    * probed cells only. `corpusPred`: optional metadata predicate on
    * the candidate side — applied BEFORE assignment/scoring (the
    * filter commutes with both, so pushing it to the scan is free
    * selectivity: admissible vectors only ever pay the argmin and the
    * probe join). Centroids and queries always read the FULL corpus —
    * a production index is built once, filters vary per query. */
  private def ivfScored(s: SparkSession, d: String,
      corpusPred: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val e = Tables.embeddings(s, d)
      .spreadToCores
    val centArr = centroidArrays(e)
    val eCorp = corpusPred.fold(e)(p => e.filter(p))
    val corpus = assign(eCorp.withColumn("norm_e", sqrt(VectorFunctions.dot("embedding", "embedding")))
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
    broadcast(probes)
      .join(corpus, col("probe_cell") === col("assigned_cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("assigned_cell"),
        (VectorFunctions.dot("qe", "embedding") / (col("norm_q") * col("norm_e"))).as("cos"))
  }

  /** The IVF pipeline CTE chain ending in scored(q_id, vec_id,
    * assigned_cell, cos) — shared verbatim by the s4 oracle and the s6
    * recall oracle, so the two necessarily measure the same index. */
  private[sim] val ivfCtes =
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
  private[sim] def recallVs(tru: DataFrame, ann: DataFrame): DataFrame = {
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
  private[sim] def truTopSql(k: Int): String =
    s"""tru AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, e.vec_id, ${duckCos("q.qe", "e.embedding")} AS cos
       |    FROM (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5) q
       |    JOIN embeddings e ON e.vec_id <> q.q_id)
       |  WHERE cos IS NOT NULL AND NOT isnan(cos)
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= $k)""".stripMargin

  /** Recall tail over tru/ann CTEs — the SQL mirror of [[recallVs]]. */
  private[sim] val recallTailSql =
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

  /** s12: range search — ALL neighbors with cosine ≥ τ, through the
    * IVF probe. The other retrieval surface a production vector index
    * serves (FAISS `range_search`): dedup and contamination sweeps ask
    * "everything closer than τ", not "the top k" — the result set is
    * density-bound, not k-bound, so it grows with the corpus while
    * top-k saturates. Reuses [[ivfScored]] verbatim (same cells, same
    * probes, same cosine arithmetic — the oracle shares s4/s6's CTE
    * chain, so all three measure ONE index); the only new plan node is
    * the threshold filter, which Catalyst pushes below the rank-free
    * output (no window, no heap — range search is cheaper than top-k).
    * τ is compared on bit-identical doubles in both engines (s4's
    * hash-match pins the arithmetic), so the predicate is engine-exact.
    */
  private[graft] val RangeTau = 0.25

  private def s12(s: SparkSession, d: String): DataFrame =
    ivfScored(s, d)
      .filter(col("cos").isNotNull && !isnan(col("cos")) && col("cos") >= RangeTau)
      .select(col("q_id"), col("vec_id"), col("assigned_cell"), col("cos"))
      // density-bound output grows with the corpus — local sort only
      // (the global-Sort convention for corpus-sized outputs)
      .sortWithinPartitions(col("q_id"), col("vec_id"))

  private val s12Sql =
    s"""WITH $ivfCtes
       |SELECT q_id, vec_id, assigned_cell, cos FROM scored
       |WHERE cos IS NOT NULL AND NOT isnan(cos) AND cos >= $RangeTau
       |ORDER BY q_id, vec_id""".stripMargin

  /** s13: range-search recall — s5/s6's quality contract for the
    * range surface: per query, the fraction of ALL true τ-neighbors
    * (brute-force thresholded scan, [[bruteScored]]) that the IVF
    * range path (s12) returned. Range recall is the metric FAISS
    * documents for `range_search` evaluation, and it stresses the
    * index differently from recall@k: misses concentrate in the
    * τ-boundary shell where neighbors sit in unprobed cells, so this
    * measurement — not recall@k — is what justifies an nprobe setting
    * before a dedup/contamination sweep trusts the index. */
  private def s13(s: SparkSession, d: String): DataFrame = {
    val tru = bruteScored(s, d)
      .filter(col("cos").isNotNull && !isnan(col("cos")) && col("cos") >= RangeTau)
      .select(col("q_id"), col("vec_id"))
    recallVs(tru, s12(s, d).select(col("q_id"), col("vec_id")))
  }

  private val s13Sql =
    s"""WITH tru AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, e.vec_id, ${duckCos("q.qe", "e.embedding")} AS cos
       |    FROM (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5) q
       |    JOIN embeddings e ON e.vec_id <> q.q_id)
       |  WHERE cos IS NOT NULL AND NOT isnan(cos) AND cos >= $RangeTau),
       |$ivfCtes,
       |ann AS (
       |  SELECT q_id, vec_id FROM scored
       |  WHERE cos IS NOT NULL AND NOT isnan(cos) AND cos >= $RangeTau),
       |$recallTailSql""".stripMargin

  /** s22's metadata predicate: admissible candidates are the even
    * labels — ~50% selectivity on this corpus (probed: 244/256 at
    * sf0.01), so the filtered and excluded populations are both
    * non-degenerate at every SF (the t16 discipline). A production
    * filter (tenant, language, freshness) is the same shape: any
    * per-row predicate on the index's payload columns. */
  private[graft] val FilterPredSql = "label % 2 = 0"

  /** s22: filtered vector search — ANN under a metadata predicate,
    * the capability every production vector store ships (FAISS
    * IDSelector, pgvector/Vespa filtered queries): top-k among only
    * the ADMISSIBLE corpus vectors. The classic correctness trap is
    * post-filtering a plain top-k (it underfills: filtering s4's
    * top-5 by a 50% predicate leaves ~2.5 hits); the correct operator
    * filters FIRST, then ranks k among survivors — which is also the
    * efficient Spark plan: the predicate pushes to the corpus scan,
    * so excluded vectors never pay the argmin assignment or the
    * probe join ([[ivfScored]]'s corpusPred). The index itself stays
    * filter-agnostic — centroids and probe selection read the full
    * corpus, because a real index is built once and filters vary per
    * query. Oracle: the SAME ivfCtes chain with the predicate applied
    * AFTER scoring (filtering commutes with scoring, so the values
    * pin while the Spark side keeps the pushed-down plan).
    */
  private def s22(s: SparkSession, d: String): DataFrame =
    rankTopK(ivfScored(s, d, Some(expr(FilterPredSql))), 5, Seq("assigned_cell"))
      .select(col("q_id"), col("rank"), col("vec_id"), col("assigned_cell"), col("cos"))
      .orderBy(col("q_id"), col("rank"))

  private val s22Sql =
    s"""WITH $ivfCtes,
       |fsc AS (
       |  SELECT sc.q_id, sc.vec_id, sc.assigned_cell, sc.cos
       |  FROM scored sc JOIN embeddings em ON em.vec_id = sc.vec_id
       |  WHERE em.$FilterPredSql)
       |SELECT q_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank,
       |       vec_id, assigned_cell, cos
       |FROM fsc
       |WHERE cos IS NOT NULL AND NOT isnan(cos)
       |QUALIFY rank <= 5
       |ORDER BY q_id, rank""".stripMargin

  /** s23: filtered-search recall@3 — the quality contract for s22
    * (the s5/s6/s13 discipline): per query, the fraction of the TRUE
    * filtered top-3 (brute-force cosine over ONLY the admissible
    * corpus — [[bruteScored]] with the same predicate) that the
    * filtered IVF path returned. Filtered recall stresses the index
    * differently from plain recall@k: under a selective predicate the
    * admissible neighbors thin out per cell, so the fixed nprobe=2
    * probe covers a smaller admissible candidate pool — this
    * measurement is what justifies an nprobe setting for a FILTERED
    * workload before serving trusts it. */
  private def s23(s: SparkSession, d: String): DataFrame = {
    val tru = rankTopK(
        bruteScored(s, d, Some(expr(FilterPredSql))), 3, Seq.empty)
      .select(col("q_id"), col("vec_id"))
    recallVs(tru, s22(s, d).select(col("q_id"), col("vec_id")))
  }

  private val s23Sql =
    s"""WITH tru AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, e.vec_id, ${duckCos("q.qe", "e.embedding")} AS cos
       |    FROM (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5) q
       |    JOIN embeddings e ON e.vec_id <> q.q_id AND e.$FilterPredSql)
       |  WHERE cos IS NOT NULL AND NOT isnan(cos)
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= 3),
       |$ivfCtes,
       |ann AS (
       |  SELECT sc.q_id, sc.vec_id FROM scored sc
       |  JOIN embeddings em ON em.vec_id = sc.vec_id
       |  WHERE em.$FilterPredSql AND sc.cos IS NOT NULL AND NOT isnan(sc.cos)
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY sc.q_id ORDER BY sc.cos DESC, sc.vec_id) <= 5),
       |$recallTailSql""".stripMargin

  /** s24's probe-depth ceiling: 4 of the 10 cells — deep enough that
    * the curve's knee is visible at every SF, shallow enough that the
    * sweep costs ≤ 2× the nprobe=2 search (the expansion is pairs ×
    * visible depths, bounded by MaxProbe × the nprobe=MaxProbe pool). */
  private[graft] val MaxProbe = 4

  /** s24: the nprobe tuning curve — recall@5 AND scan cost per probe
    * depth, in ONE pass (the FAISS `nprobe` sweep every IVF deployment
    * runs before picking its operating point; s6/s23 measure a single
    * point, this is the curve those points live on). For each
    * nprobe ∈ 1..[[MaxProbe]]: the candidates examined (n_scored — the
    * cost axis) and the fraction of the brute top-5 found in that
    * depth's top-5 (the quality axis — s6's recall@5, so the curve's
    * nprobe=2 point IS s6's number, spec-pinned).
    *
    * Execution: the corpus is assigned ONCE and each query's cells
    * ranked ONCE; every scored pair carries the minimum depth that
    * sees it (crn of its probe cell), so the whole curve is ONE probe
    * join + a ≤ MaxProbe-way explode — not MaxProbe separate searches
    * (pairs re-rank per depth through the same partial+final bounded
    * [[graft.plans.TopK]] heaps, keyed (q_id, nprobe)). Recall is
    * monotone non-decreasing in nprobe BY CONSTRUCTION (depth N's
    * candidate pool contains depth N−1's; spec-pinned) — a production
    * reader picks the knee. Oracle: the same chain with the explode as
    * a range join (u.n >= crn), tru from the shared [[truTopSql]].
    */
  private def s24(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .spreadToCores
    val centArr = centroidArrays(e)
    val corpus = assign(e.withColumn("norm_e", sqrt(VectorFunctions.dot("embedding", "embedding")))
        .filter(col("norm_e") > 0), centArr, Seq("embedding", "norm_e"))
      .select(col("vec_id"), col("cell").as("assigned_cell"), col("embedding"), col("norm_e"))
    val wc = Window.partitionBy(col("q_id")).orderBy(col("qdist"), col("cell"))
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(centArr))
      .select(col("q_id"), col("qe"), col("cell"),
        VectorFunctions.l2sq("qe", "carr").as("qdist"))
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= MaxProbe)
      .select(col("q_id"), col("qe"), col("cell").as("probe_cell"), col("crn"))
      .withColumn("norm_q", sqrt(VectorFunctions.dot("qe", "qe")))
      .filter(col("norm_q") > 0)
    val scoredAll = broadcast(probes)
      .join(corpus, col("probe_cell") === col("assigned_cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("crn"), col("vec_id"),
        (VectorFunctions.dot("qe", "embedding") / (col("norm_q") * col("norm_e"))).as("cos"))
    // a pair is visible at every depth >= its probe cell's rank
    // (BIGINT to match the oracle's generate_series)
    val expanded = scoredAll
      .withColumn("nprobe", explode(expr(
        s"sequence(CAST(crn AS BIGINT), CAST($MaxProbe AS BIGINT))")))
    val ann = graft.plans.TopK.perKey(
        expanded.filter(col("cos").isNotNull && !isnan(col("cos"))),
        Seq("q_id", "nprobe"), "cos", "vec_id", 5)
      .select(col("nprobe"), col("q_id"), col("vec_id"))
    val tru = rankTopK(bruteScored(s, d), 5, Seq.empty)
      .select(col("q_id"), col("vec_id"))
    val nScored = expanded.groupBy(col("nprobe")).agg(count(lit(1)).as("n_scored"))
    val nFound = ann.join(tru, Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("nprobe")).agg(count(lit(1)).as("n_found"))
    val nTrue = tru.agg(count(lit(1)).as("n_true"))
    nScored
      .crossJoin(broadcast(nTrue))
      .join(nFound, Seq("nprobe"), "left")
      .select(col("nprobe"), col("n_scored"), col("n_true"),
        coalesce(col("n_found"), lit(0L)).as("n_found"))
      .withColumn("recall", col("n_found").cast("double") / col("n_true"))
      .orderBy(col("nprobe"))
  }

  private val s24Sql =
    s"""WITH ${truTopSql(5)},
       |dims AS (
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
       |  FROM embeddings e CROSS JOIN centarr c
       |  -- zero-norm guard mirroring the Spark side's norm_e > 0 /
       |  -- norm_q > 0 filters (ADVICE r16: s24's n_scored is the raw
       |  -- scored-set SIZE, so the guard must agree by contract, not
       |  -- because the corpus happens to lack zero vectors; l2 feeds
       |  -- both corpus and probes, matching the Spark filters' scope,
       |  -- while cents stays unfiltered exactly like centroidArrays).
       |  -- sum-of-squares > 0 is fold-order-exact in both engines.
       |  WHERE list_reduce(list_transform(e.embedding,
       |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x) > 0),
       |corpus AS (
       |  SELECT vec_id, embedding, cell AS assigned_cell FROM l2
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, embedding AS qe, cell AS probe_cell,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS crn
       |  FROM l2 WHERE vec_id < 5
       |  QUALIFY crn <= $MaxProbe),
       |sc AS (
       |  SELECT p.q_id, p.crn, c.vec_id,
       |    ${duckCos("p.qe", "c.embedding")} AS cos
       |  FROM probes p JOIN corpus c
       |    ON p.probe_cell = c.assigned_cell AND c.vec_id <> p.q_id),
       |ex AS (
       |  SELECT s2.q_id, s2.vec_id, s2.cos, u.n AS nprobe
       |  FROM sc s2 JOIN (SELECT unnest(generate_series(1, $MaxProbe)) AS n) u
       |    ON u.n >= s2.crn),
       |ann AS (
       |  SELECT nprobe, q_id, vec_id FROM ex
       |  WHERE cos IS NOT NULL AND NOT isnan(cos)
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY nprobe, q_id ORDER BY cos DESC, vec_id) <= 5),
       |ns AS (SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_scored FROM ex GROUP BY nprobe),
       |nf AS (
       |  SELECT a.nprobe, CAST(COUNT(*) AS BIGINT) AS n_found
       |  FROM ann a JOIN tru t ON t.q_id = a.q_id AND t.vec_id = a.vec_id
       |  GROUP BY a.nprobe),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM tru)
       |SELECT ns.nprobe, ns.n_scored, nt.n_true,
       |  CAST(COALESCE(nf.n_found, 0) AS BIGINT) AS n_found,
       |  CAST(COALESCE(nf.n_found, 0) AS DOUBLE) / nt.n_true AS recall
       |FROM ns CROSS JOIN nt LEFT JOIN nf ON nf.nprobe = ns.nprobe
       |ORDER BY ns.nprobe""".stripMargin

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
      .spreadToCores
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

  /** s8's Lloyd cap: the Spark loop runs to centroid fixpoint and
    * throws past this many rounds (d7's loud-cap discipline — a
    * non-converged clustering must never silently ship); the DuckDB
    * oracle unrolls EXACTLY this many rounds. The two agree by
    * construction: once assignments stop changing, every further round
    * is a no-op (same members → same means → same argmin), so a
    * convergence-stopped Spark result equals the fixed-R oracle for
    * any convergence round ≤ R — and a corpus that genuinely needs
    * more than R rounds fails loudly on the Spark side rather than
    * diverging quietly. Warm-started from the per-label centroids
    * ([[kmeansSeeds]]), observed fixpoints: 13 rounds at sf0.001, 10
    * at sf0.01, 23 at sf0.1 (the oscillating tail is 2-3 boundary
    * vectors trading owners), so 40 carries real margin while the
    * unrolled oracle stays cheap at the sf0.01 gate. */
  private val KmeansMaxRounds = 40

  /** Deterministic k-means TRAINING-SAMPLE bound: the Lloyd loop
    * trains on `vec_id < KmeansTrainCap` and only the final
    * [[argminCell]] projection touches the full corpus — the sampling
    * split s8's scaladoc always argued for, now implemented rather
    * than deferred to "at 100 TB". At oracle scale (sf ≤ 0.1 has
    * vec_id < 2000) the filter is the identity, so the oracle's
    * values are unchanged; at sf1 (10×) the un-sampled loop needed
    * 190 rounds to reach the exact fixpoint (near-boundary membership
    * churn grows with corpus density) — unbounded rounds-to-fixpoint
    * is exactly what a bounded train sample exists to prevent, and a
    * fixed-size sample keeps the round count (and the oracle's
    * fixed-depth unrolling) scale-independent. */
  private[graft] val KmeansTrainCap = 2000L

  /** k-means seeds: the per-label nano-mean centroids
    * ([[centroidArrays]] — exactly s3/s4's index cells), so s8 IS the
    * refinement step a real IVF build runs on top of its initial
    * partition: deterministic, SQL-expressible (the s3Sql cents CTE),
    * never empty at round 0, and balanced from round 0 (cold
    * data-point seeds produced lopsided cells that made nprobe
    * recall unmeasurable — see KnnRankSpec). k = label cardinality
    * (10 here); unlike q27's layout-only bucket conf, k changes the
    * OUTPUT, so it is not conf-overridable. */
  private def kmeansSeeds(e: DataFrame): DataFrame =
    centroidArrays(e).select(col("cell").cast("long").as("cell"), col("carr"))

  /** Per-row nearest-centroid argmin over LITERAL centroids: one
    * `least` over k (dist, cell) structs, each dist a codegen'd
    * [[graft.functions.FloatDoubleL2Sq]] against a typedlit centroid —
    * a pure projection, ZERO shuffle (the broadcast-join + min_by
    * form still shuffles one row per vector; with k·64 doubles
    * fitting in the plan, nothing needs to move at all). `least` on
    * structs is lexicographic, so (dist, cell) is the same
    * deterministic total order the oracle's ORDER BY dist, cell uses. */
  private[graft] def argminCell(cent: Array[(Long, Array[Double])]): Column =
    least(cent.toIndexedSeq.map { case (cell, arr) =>
      struct(
        VectorFunctions.l2sq(col("embedding"), typedlit(arr.toSeq)).as("dist"),
        lit(cell).as("cell"))
    }: _*)

  /** Collect a (cell, carr) centroid frame to the driver, id-sorted —
    * k rows of 64 doubles, the metadata-collect class. Shared by
    * [[lloyd]]'s train loop and [[indexCentroids]]. */
  private def collectCent(df: DataFrame): Array[(Long, Array[Double])] =
    df.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)

  /** The collected (cell, centroid) set of the per-label nano-mean
    * index cells ([[kmeansSeeds]] — exactly s3/s4/s11's cells), for
    * callers that assign via [[argminCell]]'s literal zero-shuffle
    * projection (st21's streaming admission path). */
  private[graft] def indexCentroids(s: SparkSession, d: String): Array[(Long, Array[Double])] =
    collectCent(kmeansSeeds(Tables.embeddings(s, d)
      .spreadToCores))

  /** One Lloyd round over the persisted primitive-array corpus: a
    * single shuffle-free `RDD.aggregate` whose accumulator is the
    * k×(64 nano-sums + count) long matrix — integer nano-units make
    * the cross-row sums exact and order-independent (the
    * [[centroidArrays]] discipline), so partition/merge order cannot
    * perturb the means. This is the one imperative-loop carve-out in
    * the engine, and it is the canonical one (MLlib's KMeans runs the
    * same shape): an iterative numeric solver re-planning a DataFrame
    * per round paid ~0.5 s/round of Catalyst analysis + codegen +
    * multi-stage scheduling — 15 s of fixed overhead at 30 rounds —
    * where this is one ~50 ms stage per round, and at 100 TB the train
    * loop runs over a SAMPLE anyway (see [[s8]]).
    *
    * Arithmetic is replicated bit-for-bit from the SQL forms so the
    * unrolled DuckDB oracle stays exact:
    *  - argmin: the same sequential `acc += (float→double − double)²`
    *    fold as [[graft.functions.FloatDoubleL2Sq]], strict `<` over
    *    cells in ascending order = ties to the lowest cell, exactly
    *    `least(struct(dist, cell))` / `ORDER BY dist, cell`;
    *  - nano units: `BigDecimal.valueOf(x·1e9).setScale(0, HALF_UP)`
    *    then truncate — the exact codegen of Spark's `round(double)`
    *    followed by `cast(long)`, which DuckDB's `round` matches (the
    *    pattern every exact aggregate in this repo already pins).
    *
    * A cell that lost every member has count 0 here; the driver-side
    * merge keeps its previous centroid (the oracle's LEFT JOIN
    * COALESCE). */
  private def lloydRound(vecs: org.apache.spark.rdd.RDD[Array[Float]],
      cent: Array[(Long, Array[Double])]): Map[Long, Array[Double]] = {
    val k = cent.length
    val centArrs = cent.map(_._2)
    val agg = vecs.aggregate(Array.fill(k)(new Array[Long](65)))(
      (acc, v) => {
        var best = 0
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          val ca = centArrs(c)
          var dAcc = 0.0
          var i = 0
          while (i < 64) {
            val d = v(i).toDouble - ca(i)
            dAcc += d * d
            i += 1
          }
          if (dAcc < bestD) { bestD = dAcc; best = c }
          c += 1
        }
        val row = acc(best)
        var i = 0
        while (i < 64) {
          row(i) += java.math.BigDecimal.valueOf(v(i).toDouble * 1e9)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
          i += 1
        }
        row(64) += 1L
        acc
      },
      (a, b) => {
        var c = 0
        while (c < k) {
          val ra = a(c); val rb = b(c)
          var i = 0
          while (i <= 64) { ra(i) += rb(i); i += 1 }
          c += 1
        }
        a
      })
    cent.indices.iterator.flatMap { c =>
      val row = agg(c)
      val cnt = row(64)
      if (cnt == 0L) None
      else Some(cent(c)._1 ->
        Array.tabulate(64)(i => row(i).toDouble / (1e9 * cnt)))
    }.toMap
  }

  /** Lloyd iteration to centroid fixpoint — the canonical k-means
    * execution shape: centroids are METADATA (k·64 doubles), held on
    * the driver between rounds and shipped into each round's single
    * shuffle-free aggregate ([[lloydRound]]) as task-closure
    * literals; the corpus is persisted ONCE as primitive arrays and
    * never collected, and no per-round lineage accumulates, so there
    * is nothing to checkpoint. d7's loop discipline carries over:
    * per-round movement diagnostic, loud cap ([[KmeansMaxRounds]]).
    *
    * Convergence = exact centroid equality (doubles round-trip the
    * driver bit-identically; deterministic arithmetic makes the
    * fixpoint exact, no epsilon). Centroid fixpoint lags assignment
    * fixpoint by ≤ 1 round, so the fixed-R oracle equivalence argument
    * (see [[KmeansMaxRounds]]) holds unchanged.
    *
    * Returns (final assignments, learned centroid frame, rounds).
    */
  private[graft] def lloyd(e: DataFrame,
      stats: Option[scala.collection.mutable.Map[String, Long]] = None)
      : (DataFrame, DataFrame, Int) = {
    val s = e.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("carr",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false))))
    def centDf(c: Array[(Long, Array[Double])]): DataFrame = {
      import scala.jdk.CollectionConverters._
      s.createDataFrame(
        c.map { case (cell, arr) =>
          org.apache.spark.sql.Row(cell, arr.toSeq) }.toSeq.asJava, schema)
    }
    // materialize the corpus ONCE: every round re-reading the parquet
    // scan + repartition through a fresh lineage measured ~2x the whole
    // loop's cost; rounds read the checkpointed partitions instead
    val eMat = e.localCheckpoint()
    // seeds + train loop run on the bounded deterministic sample
    // (see KmeansTrainCap); only finalAssign touches the full corpus
    val eTrain = eMat.filter(col("vec_id") < KmeansTrainCap)
    // the train-loop view: primitive float arrays, persisted so each
    // round is one cache-read aggregate (see lloydRound)
    val vecs = eTrain.select(col("embedding")).rdd
      .map(_.getSeq[Float](0).toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cent = collectCent(kmeansSeeds(eTrain))
    var converged = false
    var iter = 0
    while (!converged && iter < KmeansMaxRounds) {
      val byCell = lloydRound(vecs, cent)
      // empty cells keep their previous centroid (oracle: LEFT JOIN)
      val next = cent.map { case (cell, arr) => (cell, byCell.getOrElse(cell, arr)) }
      val moved = next.zip(cent).count { case ((_, a1), (_, a2)) =>
        !java.util.Arrays.equals(a1, a2) }
      stats.foreach(_.update(s"s8_centroid_moved_r${iter + 1}", moved.toLong))
      converged = moved == 0
      cent = next
      iter += 1
    }
    vecs.unpersist(blocking = false)
    if (!converged)
      throw new IllegalStateException(
        s"s8 Lloyd did not converge within $iter rounds — the oracle unrolls " +
          s"exactly $KmeansMaxRounds rounds, so a deeper corpus must raise " +
          "KmeansMaxRounds in BOTH engines, never ship a moving clustering")
    stats.foreach(_.update("s8_iterations", iter.toLong))
    val finalAssign = eMat
      .select(col("vec_id"), argminCell(cent).as("_m"))
      .select(col("vec_id"), col("_m.cell").as("cell"), col("_m.dist").as("dist"))
    (finalAssign, centDf(cent), iter)
  }

  /** s8: learned IVF centroids — k-means (Lloyd) over the embedding
    * corpus, replacing s3/s4's per-label AVERAGE centroids with
    * centroids the data itself chose (VERDICT r9 #5: a real IVF index
    * trains its cells; per-label averaging presumes labels partition
    * the space well). The query output is the converged per-cell
    * assignment statistics — membership count, min member id, and the
    * summed squared distance in exact nano-units (the k-means
    * objective, cross-row-summed without float drift) — so the driver
    * compare pins the full iterative computation, not a summary.
    *
    * Scale shape per round: centroids are k×64 doubles in the task
    * closure; the round is ONE shuffle-free aggregate over the
    * persisted corpus returning a k×65 long matrix — per-partition
    * partials, no exchange, no per-round Catalyst work
    * ([[lloydRound]]). At 100 TB you run the same loop on a uniform
    * sample to train, then one final [[argminCell]] projection pass
    * over the full corpus (which is how the final assignment below is
    * computed anyway) — the sampling split is why the train loop's
    * per-round cost never needs to touch full scale.
    */
  private def s8(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .spreadToCores
    val (assigned, _, _) = lloyd(e)
    assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"),
        min(col("vec_id")).as("min_vec_id"),
        sum(round(col("dist") * 1e9).cast("long")).as("sum_dist_nano"))
      .orderBy(col("cell"))
  }

  /** s8 oracle: the SAME Lloyd recurrence unrolled [[KmeansMaxRounds]]
    * times (DuckDB's recursive CTEs cannot aggregate over the
    * recursive relation, so fixed-depth unrolling is the relational
    * form; post-convergence rounds are no-ops — see KmeansMaxRounds).
    * Generated, not hand-written: every round is the same
    * means → COALESCE-merge → argmin triple. */
  private val s8Sql: String = {
    def dist(carr: String) =
      s"""list_reduce(list_transform(generate_series(1, 64),
         |      i -> (CAST(e.embedding[i] AS DOUBLE) - $carr[i]) * (CAST(e.embedding[i] AS DOUBLE) - $carr[i])),
         |      (acc, x) -> acc + x)""".stripMargin
    val sb = new StringBuilder
    // emb is MATERIALIZED: 50+ CTE references to the raw `embeddings`
    // view would each open the parquet file and exhaust the process's
    // file descriptors; materializing pins ONE scan. Each round's
    // c/a CTEs are MATERIALIZED too: c{r} is referenced twice (by
    // c{r+1} and a{r}), so default inlining doubles the expression
    // tree per round — 2^25 blowup, the planner never returns.
    // tr = the bounded deterministic train sample (identity at oracle
    // scale — see KmeansTrainCap); every training CTE reads tr, and
    // only the final full-corpus assignment afin reads emb
    sb.append(
      s"""WITH emb AS MATERIALIZED (SELECT vec_id, embedding, label FROM embeddings),
         |tr AS MATERIALIZED (SELECT vec_id, embedding, label FROM emb
         |  WHERE vec_id < $KmeansTrainCap),
         |c0 AS (
         |  SELECT cell, list(c ORDER BY i) AS carr FROM (
         |    SELECT CAST(label AS BIGINT) AS cell, g.i,
         |      CAST(SUM(CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE)
         |        / (1e9 * COUNT(*)) AS c
         |    FROM tr, generate_series(1, 64) AS g(i) GROUP BY label, g.i)
         |  GROUP BY cell),
         |a0 AS (
         |  SELECT e.vec_id, c.cell, ${dist("c.carr")} AS dist
         |  FROM tr e CROSS JOIN c0 c
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY dist, c.cell) = 1)""".stripMargin)
    for (r <- 1 to KmeansMaxRounds) {
      sb.append(
        s""",
           |m$r AS (
           |  SELECT a.cell, g.i,
           |    CAST(SUM(CAST(round(CAST(e.embedding[g.i] AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE)
           |      / (1e9 * COUNT(*)) AS c
           |  FROM a${r - 1} a JOIN tr e ON e.vec_id = a.vec_id,
           |       generate_series(1, 64) AS g(i)
           |  GROUP BY a.cell, g.i),
           |c$r AS MATERIALIZED (
           |  SELECT p.cell, COALESCE(n.carr, p.carr) AS carr
           |  FROM c${r - 1} p LEFT JOIN (
           |    SELECT cell, list(c ORDER BY i) AS carr FROM m$r GROUP BY cell) n
           |    ON n.cell = p.cell),
           |a$r AS MATERIALIZED (
           |  SELECT e.vec_id, c.cell, ${dist("c.carr")} AS dist
           |  FROM tr e CROSS JOIN c$r c
           |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY dist, c.cell) = 1)""".stripMargin)
    }
    sb.append(
      s""",
         |afin AS (
         |  SELECT e.vec_id, c.cell, ${dist("c.carr")} AS dist
         |  FROM emb e CROSS JOIN c$KmeansMaxRounds c
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY dist, c.cell) = 1)
         |SELECT cell, COUNT(*) AS n_members, MIN(vec_id) AS min_vec_id,
         |  CAST(SUM(CAST(round(dist * 1e9) AS BIGINT)) AS BIGINT) AS sum_dist_nano
         |FROM afin GROUP BY cell ORDER BY cell""".stripMargin)
    sb.toString
  }

  /** s8 regression diagnosis (the d7Diag sibling): per-round moved
    * counts, rounds to fixpoint, final cell count. A jump in
    * `s8_iterations` means the corpus's cluster structure deepened;
    * a round whose moved count plateaus without reaching 0 would be
    * the oscillation case the loud cap converts into a failure. */
  def s8Diag(s: SparkSession, d: String): Map[String, Long] = {
    val m = scala.collection.mutable.Map.empty[String, Long]
    val e = Tables.embeddings(s, d)
      .spreadToCores
    val (assigned, _, _) = lloyd(e, Some(m))
    m("s8_cells") = assigned.select(col("cell")).distinct().count()
    m.toMap
  }

  /** IVF probe recall with LEARNED cells (KnnRankSpec): s4's probe
    * path re-run over [[lloyd]] centroids instead of per-label
    * averages, measured against s1's truth — the re-measurement
    * VERDICT r9 #5 asked for before trusting the learned index. */
  private[graft] def learnedProbeRecall(s: SparkSession, d: String,
      nprobe: Int = 2): DataFrame = {
    val e = Tables.embeddings(s, d)
      .spreadToCores
    val (_, centArr, _) = lloyd(e)
    val corpus = assign(
      e.withColumn("norm_e", sqrt(VectorFunctions.dot("embedding", "embedding")))
        .filter(col("norm_e") > 0),
      centArr, Seq("embedding", "norm_e"))
      .select(col("vec_id"), col("cell").as("assigned_cell"), col("embedding"), col("norm_e"))
    val wc = Window.partitionBy(col("q_id")).orderBy(col("qdist"), col("cell"))
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(centArr))
      .select(col("q_id"), col("qe"), col("cell"),
        VectorFunctions.l2sq("qe", "carr").as("qdist"))
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= nprobe)
      .select(col("q_id"), col("qe"), col("cell").as("probe_cell"))
      .withColumn("norm_q", sqrt(VectorFunctions.dot("qe", "qe")))
      .filter(col("norm_q") > 0)
    val scored = broadcast(probes)
      .join(corpus, col("probe_cell") === col("assigned_cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (VectorFunctions.dot("qe", "embedding") / (col("norm_q") * col("norm_e"))).as("cos"))
    val ann = rankTopK(scored, 5, Seq.empty).select(col("q_id"), col("vec_id"))
    recallVs(
      s1(s, d).filter(col("rank") <= 5).select(col("q_id"), col("vec_id")),
      ann)
  }

  /** s9: Product-Quantization recall@3 — the ANN compression family's
    * last lever. SQ8 (s7) cuts scan bytes 4×; PQ cuts them 32×: each
    * 64-dim float32 vector stores as 8 four-bit codes (one per 8-dim
    * subspace, 16 centroids each), and scoring never decodes — the
    * standard ADC (asymmetric distance computation) precomputes, per
    * query, the partial dot of the query's subvector with every
    * centroid (a queries×8×16 lookup table, broadcast), and a
    * candidate's score is the sum of 8 table lookups keyed by its
    * codes. The scan side therefore reads CODES only; at 100 TB of
    * embeddings that is the difference between scanning 3 TB and
    * scanning 100.
    *
    * Codebook: per-subspace nano-mean seeds (cell = vec_id % 16 — the
    * deterministic, SQL-expressible initial partition) refined by
    * EXACTLY ONE Lloyd round in both engines. Fixpoint training is
    * [[lloyd]]'s already-demonstrated machinery (s8) applied per
    * subspace; one pinned round keeps the oracle's unrolling finite
    * while still exercising the assign→re-mean→re-assign arithmetic
    * the driver compare must pin. At 100 TB the codebook trains on a
    * sample and only the final linear encode pass touches the corpus
    * (the s8 split).
    *
    * Production shape, faithfully: PQ generates CANDIDATES (top-20 by
    * exact-integer ADC score — nano-unit longs, so cross-row sums are
    * order-free), then the ≤ 20 survivors re-rank by exact cosine —
    * ADC recalls coarsely, the re-rank restores ordering quality, and
    * recall@3 vs s1's truth measures the whole two-stage pipeline.
    * All assignment argmins are min-struct hash aggregates (map-side
    * partials, no window on any candidate path), both codebook tables
    * are bounded broadcasts (8×16 rows), and the ADC aggregate sums
    * longs.
    */
  /** The PQ machinery shared by s9 and s10: 8×8-dim subvectors, the
    * seed codebook (cell = vec_id % 16), EXACTLY ONE Lloyd round, the
    * per-vector 4-bit codes, and the per-query ADC lookup table (one
    * exact-nano partial dot per (query, sub, cell) — 8×16 rows per
    * query, broadcast). Returns (codes, lut). Design rationale in s9's
    * scaladoc; [[pqCtes]] is the verbatim SQL mirror both oracles
    * share, so the two queries necessarily pin the same codebook.
    */
  private[sim] def pqParts(e: DataFrame): (DataFrame, DataFrame) = {
    // subvectors: (vec_id, sub 0..7, svec = dims [sub*8+1 .. sub*8+8])
    val subv = e.select(col("vec_id"), posexplode(expr(
      "transform(sequence(0, 7), su -> slice(embedding, su * 8 + 1, 8))"))
      .as(Seq("sub", "svec")))
    def nanoMeans(rows: DataFrame): DataFrame = rows
      .select(col("sub"), col("cell"), posexplode(col("svec")).as(Seq("j", "x")))
      .groupBy(col("sub"), col("cell"), col("j"))
      .agg(sum(round(col("x").cast("double") * 1e9).cast("long")).as("c_nano"),
        count(lit(1)).as("cnt"))
      .withColumn("c", col("c_nano").cast("double") / (lit(1e9) * col("cnt")))
      .groupBy(col("sub"), col("cell"))
      .agg(array_sort(collect_list(struct(col("j"), col("c")))).as("jc"))
      .select(col("sub"), col("cell"), expr("transform(jc, t -> t.c)").as("carr"))
    // r20 (guide §2.4): the 8×16-row codebooks are MATERIALIZED once
    // (localCheckpoint — the propagateMinLabels discipline). Lazily,
    // `c1` (seeds + one Lloyd round, each a full corpus pass) was
    // re-planned under BOTH its consumers (codes and lut) and `seeds`
    // twice more inside c1 — the final plan executed duplicated
    // corpus-wide subvector passes for two passes of real work
    // (profiled at sf0.1/32c: s9 54 summed task-seconds for a 4.0 s
    // wall, s10 77, s34 72 — the 16-way cell expansion made each
    // duplicated pass the PQ family's task-time dominator). Both
    // tables are 128 rows at ANY corpus size.
    val seeds = nanoMeans(subv.withColumn("cell", col("vec_id") % 16))
      .localCheckpoint()
    // r19: the native codegen'd FloatDoubleL2Sq — the same sequential
    // fold (bit-identical result, its scaladoc's contract) as the
    // interpreted aggregate(zip_with(...)) lambda it replaces. The old
    // HOF form evaluated per (vector, sub, cell) join row through the
    // interpreted HigherOrderFunction path with per-element
    // allocations; the 16-way cell expansion made it the PQ family's
    // dominant task time (profiled 35-58 s summed task seconds across
    // s9/s10/s33/s34 at sf0.1).
    val l2sub = VectorFunctions.l2sq(col("svec"), col("carr"))
    def assignSub(cb: DataFrame): DataFrame = subv
      .join(broadcast(cb), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("svec"), col("cell"), l2sub.as("dist"))
      .groupBy(col("vec_id"), col("sub"))
      // svec is functionally dependent on the group key — first() is
      // deterministic here; (dist, cell) is a total order (cell unique
      // per candidate row), matching the oracle's ORDER BY dist, cell
      .agg(min(struct(col("dist"), col("cell"))).as("m"), first(col("svec")).as("svec"))
      .select(col("vec_id"), col("sub"), col("m.cell").as("cell"), col("svec"))
    // one Lloyd round: re-mean over round-0 assignment; empty cells
    // keep their seed (the s8 COALESCE rule)
    val m1 = nanoMeans(assignSub(seeds))
    val c1 = seeds.withColumnRenamed("carr", "p_carr")
      .join(m1.withColumnRenamed("carr", "n_carr"), Seq("sub", "cell"), "left")
      .select(col("sub"), col("cell"), coalesce(col("n_carr"), col("p_carr")).as("carr"))
      .localCheckpoint()
    val codes = assignSub(c1).select(col("vec_id"), col("sub"), col("cell").as("code"))
    // ADC lookup table: per (query, sub, cell) partial dot, exact nanos
    val lut = subv.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("sub"), col("svec").as("qs"))
      .join(broadcast(c1), Seq("sub"))
      .select(col("q_id"), col("sub"), col("cell"), expr(
        """cast(round(aggregate(zip_with(qs, carr, (a, b) -> cast(a as double) * b),
          |  cast(0 as double), (acc, x) -> acc + x) * 1e9) as long)""".stripMargin).as("pdot"))
    (codes, lut)
  }

  /** Exact-cosine re-rank of a bounded (q_id, vec_id) candidate set to
    * top-`k` — the shared tail of the two-stage PQ pipelines (s9/s10):
    * candidates are ≤ 20 per query, so both joins are tiny, and the
    * ranking reuses [[rankTopK]]'s heap machinery. */
  private def exactRerank(e: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    val en = e.withColumn("norm_e", sqrt(VectorFunctions.dot("embedding", "embedding")))
      .filter(col("norm_e") > 0)
    val q = en.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("norm_e").as("norm_q"))
    val rescored = cand.join(en, Seq("vec_id")).join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        (VectorFunctions.dot("qe", "embedding") / (col("norm_q") * col("norm_e"))).as("cos"))
    rankTopK(rescored, k, Seq.empty).select(col("q_id"), col("vec_id"))
  }

  private def s9(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .spreadToCores
    val (codes, lut) = pqParts(e)
    val adc = codes
      .join(broadcast(lut), codes("sub") === lut("sub") && col("code") === lut("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("pdot")).as("score"))
    val cand = TopK.perKey(adc, Seq("q_id"), "score", "vec_id", 20)
      .select(col("q_id"), col("vec_id"))
    // exact re-rank of the ≤ 20 ADC survivors (s1's cosine + guards)
    val ann = exactRerank(e, cand, 3)
    recallVs(
      s1(s, d).filter(col("rank") <= 3).select(col("q_id"), col("vec_id")),
      ann)
  }

  /** s10: the COMPOSED IVF+PQ index — the production FAISS shape
    * (VERDICT r10 #3). s4 prunes cells and s9 compresses bytes; a real
    * deployment does BOTH: the query probes its nprobe=2 nearest IVF
    * cells, ADC-scores (s9's codebooks) ONLY the vectors assigned to
    * those cells, and exact-reranks the top-20 ADC survivors to top-3.
    * Recall@3 vs s1's brute-force truth is the whole-pipeline quality
    * contract — the go/no-go number a production index ships against.
    *
    * Scale story, multiplied: IVF probing bounds the SCAN FRACTION
    * (~nprobe/ncells of the corpus per query) and PQ bounds the BYTES
    * PER CANDIDATE (codes, 32× smaller than float32) — at 100 TB the
    * ADC pass reads ~nprobe/ncells × 3 TB instead of 100 TB. The cell
    * restriction is an equi-join on (assigned_cell = probe_cell) —
    * candidates flow FROM the cell index INTO the code join, so
    * vectors outside probed cells are never ADC-scored (the oracle
    * pins this: scoring extra cells would change the ADC top-20 and
    * the recall values). All broadcasts are bounded (centroids,
    * probe pairs, 8×16-row LUTs); the corpus-sized sides only ever
    * equi-join, and the codebook trains on a sample at scale (s8's
    * split — only the linear encode pass touches the full corpus).
    */
  private def s10(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .spreadToCores
    val centArr = centroidArrays(e)
    // the cell index: vec_id → assigned cell (no embedding payload —
    // the ADC path reads CODES, never the float corpus)
    val cells = assign(e, centArr, Seq.empty)
      .select(col("vec_id"), col("cell").as("assigned_cell"))
    // query probes: the 2 nearest cells by centroid L2 (s4's rule)
    val wc = Window.partitionBy(col("q_id")).orderBy(col("qdist"), col("cell"))
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(centArr))
      .select(col("q_id"), col("cell"), VectorFunctions.l2sq("qe", "carr").as("qdist"))
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= 2)
      .select(col("q_id"), col("cell").as("probe_cell"))
    // candidate set = the cell semi-join: only vectors in probed cells
    val cand0 = cells
      .join(broadcast(probes),
        col("assigned_cell") === col("probe_cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
    val (codes, lut) = pqParts(e)
    val lutR = lut.select(col("q_id").as("l_qid"), col("sub").as("l_sub"),
      col("cell").as("l_cell"), col("pdot"))
    val adc = cand0.join(codes, Seq("vec_id"))
      .join(broadcast(lutR),
        col("q_id") === col("l_qid") && col("sub") === col("l_sub") &&
          col("code") === col("l_cell"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("pdot")).as("score"))
    val cand = TopK.perKey(adc, Seq("q_id"), "score", "vec_id", 20)
      .select(col("q_id"), col("vec_id"))
    val ann = exactRerank(e, cand, 3)
    recallVs(
      s1(s, d).filter(col("rank") <= 3).select(col("q_id"), col("vec_id")),
      ann)
  }

  /** s9 oracle: the identical seed → one-round → encode → ADC →
    * re-rank chain. Subvector slices are 1-based inclusive in DuckDB
    * (`embedding[a:b]`); every mean uses the nano-unit sum, every fold
    * is a sequential list_reduce, and the ADC score is an exact BIGINT
    * sum — the whole PQ arithmetic is pinned, not just the recall. */
  /** The PQ CTE chain (sub → seeds → one Lloyd round → codes → lut) —
    * the verbatim SQL mirror of [[pqParts]], shared by the s9 and s10
    * oracles so both pin the same codebook arithmetic. */
  private[sim] val pqCtes: String = {
    def subL2(v: String, c: String) =
      s"""list_reduce(list_transform(generate_series(1, 8),
         |      i -> (CAST($v[i] AS DOUBLE) - $c[i]) * (CAST($v[i] AS DOUBLE) - $c[i])),
         |      (acc, x) -> acc + x)""".stripMargin
    s"""sub AS (
       |  SELECT vec_id, g.sub, embedding[g.sub * 8 + 1 : g.sub * 8 + 8] AS svec
       |  FROM embeddings, generate_series(0, 7) AS g(sub)),
       |sd AS (
       |  SELECT sub, vec_id % 16 AS cell, j.j, CAST(svec[j.j] AS DOUBLE) AS x
       |  FROM sub, generate_series(1, 8) AS j(j)),
       |seeds AS (
       |  SELECT sub, cell, list(c ORDER BY j) AS carr FROM (
       |    SELECT sub, cell, j,
       |      CAST(SUM(CAST(round(x * 1e9) AS BIGINT)) AS DOUBLE) / (1e9 * COUNT(*)) AS c
       |    FROM sd GROUP BY sub, cell, j)
       |  GROUP BY sub, cell),
       |a0 AS (
       |  SELECT vec_id, sub, cell FROM (
       |    SELECT v.vec_id, v.sub, s.cell, ${subL2("v.svec", "s.carr")} AS dist
       |    FROM sub v JOIN seeds s ON s.sub = v.sub)
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, cell) = 1),
       |m1 AS (
       |  SELECT sub, cell, list(c ORDER BY j) AS carr FROM (
       |    SELECT a.sub, a.cell, j.j,
       |      CAST(SUM(CAST(round(CAST(v.svec[j.j] AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE)
       |        / (1e9 * COUNT(*)) AS c
       |    FROM a0 a JOIN sub v ON v.vec_id = a.vec_id AND v.sub = a.sub,
       |         generate_series(1, 8) AS j(j)
       |    GROUP BY a.sub, a.cell, j.j)
       |  GROUP BY sub, cell),
       |c1 AS (
       |  SELECT p.sub, p.cell, COALESCE(n.carr, p.carr) AS carr
       |  FROM seeds p LEFT JOIN m1 n ON n.sub = p.sub AND n.cell = p.cell),
       |codes AS (
       |  SELECT vec_id, sub, cell AS code FROM (
       |    SELECT v.vec_id, v.sub, c.cell, ${subL2("v.svec", "c.carr")} AS dist
       |    FROM sub v JOIN c1 c ON c.sub = v.sub)
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, cell) = 1),
       |lut AS (
       |  SELECT q.vec_id AS q_id, c.sub, c.cell,
       |    CAST(round(list_reduce(list_transform(generate_series(1, 8),
       |      i -> CAST(q.svec[i] AS DOUBLE) * c.carr[i]), (acc, x) -> acc + x) * 1e9) AS BIGINT) AS pdot
       |  FROM sub q JOIN c1 c ON c.sub = q.sub WHERE q.vec_id < 5)""".stripMargin
  }

  /** The shared exact-rerank tail (cand → ann): ≤ 20 survivors per
    * query re-ranked by exact cosine to top-3 — [[exactRerank]]'s
    * mirror, used by both PQ oracles. */
  private val pqRerankAnnSql: String =
    s"""ann AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT c.q_id, c.vec_id, ${duckCos("qq.embedding", "e.embedding")} AS cos
       |    FROM cand c
       |    JOIN embeddings e ON e.vec_id = c.vec_id
       |    JOIN embeddings qq ON qq.vec_id = c.q_id)
       |  WHERE cos IS NOT NULL AND NOT isnan(cos)
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= 3)""".stripMargin

  private val s9Sql: String =
    s"""WITH ${truTopSql(3)},
       |$pqCtes,
       |adc AS (
       |  SELECT l.q_id, k.vec_id, CAST(SUM(l.pdot) AS BIGINT) AS score
       |  FROM codes k JOIN lut l ON l.sub = k.sub AND l.cell = k.code
       |  WHERE k.vec_id <> l.q_id
       |  GROUP BY l.q_id, k.vec_id),
       |cand AS (
       |  SELECT q_id, vec_id FROM adc
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) <= 20),
       |$pqRerankAnnSql,
       |$recallTailSql""".stripMargin

  /** s10 oracle: the identical IVF cell chain ([[ivfCtes]] — corpus
    * assignment + query probes) composed with the identical PQ chain
    * ([[pqCtes]]); the cell restriction is the cand0 join, so a query
    * implementation that ADC-scored vectors OUTSIDE its probed cells
    * would change the top-20 and fail the driver compare. */
  private val s10Sql: String =
    s"""WITH ${truTopSql(3)},
       |$ivfCtes,
       |$pqCtes,
       |cand0 AS (
       |  SELECT p.q_id, c.vec_id FROM probes p JOIN corpus c
       |    ON c.assigned_cell = p.probe_cell AND c.vec_id <> p.q_id),
       |adc AS (
       |  SELECT c0.q_id, c0.vec_id, CAST(SUM(l.pdot) AS BIGINT) AS score
       |  FROM cand0 c0
       |  JOIN codes k ON k.vec_id = c0.vec_id
       |  JOIN lut l ON l.q_id = c0.q_id AND l.sub = k.sub AND l.cell = k.code
       |  GROUP BY c0.q_id, c0.vec_id),
       |cand AS (
       |  SELECT q_id, vec_id FROM adc
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) <= 20),
       |$pqRerankAnnSql,
       |$recallTailSql""".stripMargin

  /** Index-logic version: bump when the persisted layout or the
    * centroid/assignment rule changes, so stale staged indexes can
    * never serve a newer search path (the d16/st9 freshness rule). */
  private val IvfIndexVersion = "ivf1"
  private val IvfDeltaVersion = "ivfdelta1"

  /** The arriving batch's vectors — d18's planted derivation verbatim
    * (Dedup.scala d18: every 10th vector, per-dimension ±2e-3 tilt,
    * float-rounded identically in both engines). */
  private[sim] val PerturbedBatchExpr =
    """cast(transform(sequence(1, 64),
      |  i -> cast(element_at(embedding, i) as double)
      |       + 1e-3 * cast(i % 5 - 2 as double)) as array<float>)""".stripMargin

  /** s11: the PERSISTED IVF index — the offline-build / online-search
    * split every production ANN system has and s3–s10 (which rebuild
    * per query) do not: a nightly job writes the index ONCE, and
    * every search after that touches only index files.
    *
    *   - BUILD (staged, freshness-markered like d16's manifests):
    *     centroid arrays to `centroids/`, and the corpus as INVERTED
    *     LISTS — (vec_id, embedding, norm) PARTITIONED BY assigned
    *     cell. The inverted-list file layout IS Hive partitioning:
    *     q29's directory-pruning lever applied to vector search.
    *   - SEARCH: queries meet the broadcast centroids for their 2
    *     nearest cells; the probed cell set (a ≤ nq·2-row
    *     metadata-sized driver list, like q36's file list) prunes the
    *     inverted-list scan at the DIRECTORY level (PartitionFilters,
    *     plan-pinned), and scoring runs s4's exact rule over only the
    *     probed lists.
    *
    * Search results are byte-identical to s4 (same centroid rule,
    * same probe rule, same ranking) — the oracle is s4's SQL VERBATIM
    * and a spec pins s11 == s4 row-for-row, so persistence provably
    * changes WHERE the index lives, never what search returns. At
    * 100 TB the build is one pass; each search reads
    * nprobe/ncells of the corpus bytes, and the cell directories
    * bound that I/O physically, not just logically.
    */
  /** Stage the persisted IVF index (centroids + cell-partitioned
    * inverted lists) for corpus `d`, freshness-markered; returns the
    * index directory. Shared by s11 (search) and s17 (incremental
    * batch append — which treats this artifact as IMMUTABLE and adds
    * a delta segment beside it).
    */
  private def ensureIvfIndex(s: SparkSession, d: String): java.nio.file.Path = {
    val src = java.nio.file.Paths.get(d, "embeddings.parquet")
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_ivfindex_" + graft.StagePath.corpusToken(d))
    java.nio.file.Files.createDirectories(dir)
    val marker = dir.resolve("_src_meta")
    val meta = graft.StagePath.srcMeta(d, src, IvfIndexVersion)
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == meta &&
      java.nio.file.Files.exists(dir.resolve("centroids")) &&
      java.nio.file.Files.exists(dir.resolve("lists"))
    if (!fresh) {
      val e = Tables.embeddings(s, d)
        .spreadToCores
      val centArr = centroidArrays(e)
      // ADVICE r18: both artifacts stage via write-to-temp + rename
      // (the r13 dedup-manifest discipline) — an in-place overwrite
      // after a version bump let a concurrent warm reader observe a
      // half-written directory behind the old marker window.
      graft.StagePath.atomicSwapDir(dir.resolve("centroids")) { tmp =>
        centArr.write.mode("overwrite").parquet(tmp.toString)
      }
      graft.StagePath.atomicSwapDir(dir.resolve("lists")) { tmp =>
        assign(e.withColumn("norm_e", sqrt(VectorFunctions.dot("embedding", "embedding")))
            .filter(col("norm_e") > 0), // ANSI zero-norm guard (see s1)
            centArr, Seq("embedding", "norm_e"))
          .select(col("vec_id"), col("embedding"), col("norm_e"),
            col("cell").as("assigned_cell"))
          .write.mode("overwrite").partitionBy("assigned_cell")
          .parquet(tmp.toString)
      }
      java.nio.file.Files.write(marker, meta.getBytes("UTF-8"))
    }
    dir
  }

  /** The persisted-index probe side: each query ranks the staged
    * centroids and keeps its 2 nearest cells (norm guard as in s1).
    * Shared by s11 and s17. */
  private def indexProbes(s: SparkSession, d: String, centArr: DataFrame): DataFrame = {
    val wc = Window.partitionBy(col("q_id")).orderBy(col("qdist"), col("cell"))
    Tables.embeddings(s, d).filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(centArr))
      .select(col("q_id"), col("qe"), col("cell"),
        VectorFunctions.l2sq("qe", "carr").as("qdist"))
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= 2)
      .select(col("q_id"), col("qe"), col("cell").as("probe_cell"))
      .withColumn("norm_q", sqrt(VectorFunctions.dot("qe", "qe")))
      .filter(col("norm_q") > 0)
  }

  /** Score broadcast probes against pruned inverted lists and rank
    * top-5 per query — the shared tail of s11/s17. */
  private def rankProbed(probes: DataFrame, lists: DataFrame): DataFrame = {
    val scored = broadcast(probes)
      .join(lists, col("probe_cell") === col("assigned_cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("assigned_cell"),
        (VectorFunctions.dot("qe", "embedding") / (col("norm_q") * col("norm_e"))).as("cos"))
    rankTopK(scored, 5, Seq("assigned_cell"))
      .select(col("q_id"), col("rank"), col("vec_id"),
        col("assigned_cell"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  private[graft] def s11(s: SparkSession, d: String): DataFrame = {
    val dir = ensureIvfIndex(s, d)
    val centArr = s.read.parquet(dir.resolve("centroids").toString)
    val probes = indexProbes(s, d, centArr)
    // the probed cell set: metadata-sized (≤ nq·nprobe rows) — the
    // same class of driver-held listing as q36's pruned file list
    val probedCells = probes.select(col("probe_cell")).distinct()
      .collect().map(_.get(0))
    val lists = s.read.parquet(dir.resolve("lists").toString)
      // partition-column inference must land on the table's cell type
      // (int32), not leave it to directory-name parsing luck
      .withColumn("assigned_cell", col("assigned_cell").cast("int"))
      .filter(col("assigned_cell").isin(probedCells.toIndexedSeq: _*))
    rankProbed(probes, lists)
  }

  /** s17: incremental index maintenance — batch APPEND to the
    * persisted IVF index without a rebuild (the production shape:
    * FAISS `add` / Milvus-style delta segments; centroids are
    * retrained rarely and OFFLINE, arriving vectors assign against
    * the FROZEN centroids and land in a new segment). The d12/d20
    * incremental-admission discipline applied to ANN:
    *
    *   - the base index ([[ensureIvfIndex]]) is IMMUTABLE — the batch
    *     never rewrites it (an in-place append would silently corrupt
    *     s11's staged artifact and every reader racing the write);
    *   - the arriving batch (d18's planted derivation: every 10th
    *     vector perturbed, re-keyed past the corpus — batch ids
    *     provably disjoint) assigns against the PERSISTED centroids —
    *     batch-sized work, one broadcast pass, nothing corpus-sized
    *     recomputed — and lands as a cell-partitioned DELTA segment
    *     with its own freshness marker;
    *   - search probes the same 2 cells and scans base ∪ delta lists,
    *     both directory-pruned to the probed cells.
    *
    * Because assignment is per-vector independent given frozen
    * centroids, incremental ≡ from-scratch EXACTLY (no relaxation —
    * stronger than d20's star-contraction argument); the spec asserts
    * result equality against a from-scratch assignment of the union,
    * and the oracle recomputes base-corpus centroids + union
    * assignment + probe + rank in SQL.
    */
  private def s17(s: SparkSession, d: String): DataFrame = {
    val dir = ensureIvfIndex(s, d)
    val centArr = s.read.parquet(dir.resolve("centroids").toString)
    // delta segment: staged beside (never inside) the base index
    val src = java.nio.file.Paths.get(d, "embeddings.parquet")
    val delta = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_ivfdelta_" + graft.StagePath.corpusToken(d))
    java.nio.file.Files.createDirectories(delta)
    val marker = delta.resolve("_src_meta")
    // ADVICE r14: fold the BASE index version into the delta marker —
    // the delta stores assignments computed against the persisted
    // centroids, so a centroid/assignment-rule bump (IvfIndexVersion)
    // must invalidate staged deltas too, or a warm tmpdir delta would
    // silently mix old-rule assignments with a new-rule base.
    val meta = graft.StagePath.srcMeta(d, src, IvfIndexVersion + ":" + IvfDeltaVersion)
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == meta &&
      java.nio.file.Files.exists(delta.resolve("lists"))
    if (!fresh) {
      val batch = Tables.embeddings(s, d).filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          lit(null).cast("int").as("label"),
          expr(PerturbedBatchExpr).as("embedding"))
      // ADVICE r18: staged via temp + rename like the base index
      graft.StagePath.atomicSwapDir(delta.resolve("lists")) { tmp =>
        assign(batch
            .withColumn("norm_e", sqrt(VectorFunctions.dot("embedding", "embedding")))
            .filter(col("norm_e") > 0),
            centArr, Seq("embedding", "norm_e"))
          .select(col("vec_id"), col("embedding"), col("norm_e"),
            col("cell").as("assigned_cell"))
          .write.mode("overwrite").partitionBy("assigned_cell")
          .parquet(tmp.toString)
      }
      java.nio.file.Files.write(marker, meta.getBytes("UTF-8"))
    }
    val probes = indexProbes(s, d, centArr)
    val probedCells = probes.select(col("probe_cell")).distinct()
      .collect().map(_.get(0))
    def segment(p: java.nio.file.Path): DataFrame =
      s.read.parquet(p.resolve("lists").toString)
        .withColumn("assigned_cell", col("assigned_cell").cast("int"))
        .filter(col("assigned_cell").isin(probedCells.toIndexedSeq: _*))
        .select("vec_id", "embedding", "norm_e", "assigned_cell")
    rankProbed(probes, segment(dir).unionByName(segment(delta)))
  }

  /** The from-scratch comparator for s17's spec: the SAME centroids
    * (base corpus) and ONE assignment pass over the union — no
    * staging, no segments. Incremental must equal this exactly. */
  private[graft] def s17FromScratch(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .spreadToCores
    val centArr = centroidArrays(e)
    val batch = Tables.embeddings(s, d).filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        lit(null).cast("int").as("label"),
        expr(PerturbedBatchExpr).as("embedding"))
    val aug = e.select("vec_id", "label", "embedding").unionByName(batch)
    val corpus = assign(aug
        .withColumn("norm_e", sqrt(VectorFunctions.dot("embedding", "embedding")))
        .filter(col("norm_e") > 0), centArr, Seq("embedding", "norm_e"))
      .select(col("vec_id"), col("embedding"), col("norm_e"),
        col("cell").as("assigned_cell"))
    rankProbed(indexProbes(s, d, centArr), corpus)
  }

  /** s17's oracle: base-corpus centroids (the frozen persisted index),
    * union-corpus assignment, probe, rank — the ivfCtes chain with the
    * batch spliced into `aug` and `dims` pinned to the BASE corpus. */
  private val s17Sql =
    s"""WITH base AS (SELECT vec_id, label, embedding FROM embeddings),
       |planted AS (
       |  SELECT vec_id + 1000000 AS vec_id,
       |    CAST(list_transform(generate_series(1, 64),
       |      i -> CAST(embedding[i] AS DOUBLE) + 1e-3 * CAST(i % 5 - 2 AS DOUBLE))
       |      AS FLOAT[]) AS embedding
       |  FROM base WHERE vec_id % 10 = 0),
       |aug AS (SELECT vec_id, embedding FROM base
       |        UNION ALL SELECT vec_id, embedding FROM planted),
       |dims AS (
       |  SELECT vec_id, label, g.i, CAST(embedding[g.i] AS DOUBLE) AS x
       |  FROM embeddings, generate_series(1, 64) AS g(i)),
       |cents AS (
       |  SELECT label AS cell, i,
       |    CAST(SUM(CAST(round(x * 1e9) AS BIGINT)) AS DOUBLE) / (1e9 * COUNT(*)) AS c
       |  FROM dims GROUP BY label, i),
       |centarr AS (SELECT cell, list(c ORDER BY i) AS carr FROM cents GROUP BY cell),
       |l2 AS (
       |  SELECT e.vec_id, e.embedding, c.cell,
       |    list_reduce(list_transform(generate_series(1, 64),
       |      i -> (CAST(e.embedding[i] AS DOUBLE) - c.carr[i]) * (CAST(e.embedding[i] AS DOUBLE) - c.carr[i])),
       |      (acc, x) -> acc + x) AS dist
       |  FROM aug e CROSS JOIN centarr c),
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
       |    ON p.probe_cell = c.assigned_cell AND c.vec_id <> p.q_id)
       |SELECT q_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank,
       |       vec_id, assigned_cell, cos
       |FROM scored
       |WHERE cos IS NOT NULL AND NOT isnan(cos)
       |QUALIFY rank <= 5
       |ORDER BY q_id, rank""".stripMargin

  /** s18's sample budget: sized against the measured sf0.01 cell-size
    * distribution (46–57 members over 10 learned cells) so the
    * per-cell quota ⌈520/10⌉ = 52 lands INSIDE it — five cells are
    * smaller than the quota (take-all branch) and five larger (cut
    * branch), so both arms of min(|cell|, quota) are exercised and
    * falsifiable at oracle scale (the t16 discipline). A production
    * budget is the training-set size target; it stays constant as the
    * corpus grows, which is the point — sampling cost scales with the
    * BUDGET, not the corpus. */
  private[graft] val ClusterSampleBudget = 520L

  /** s18: cluster-balanced sampling over the learned k-means cells —
    * the SemDeDup §5 / diversity-sampling follow-on (VERDICT r14 #5):
    * d18 prunes duplicates WITHIN a cluster, but nothing rebalanced
    * ACROSS clusters — a raw uniform sample reproduces the corpus's
    * cluster skew, over-representing the dominant modes exactly where
    * training data needs diversity. Per cell the quota is
    * min(|cell|, ⌈budget/ncells⌉), selected in deterministic
    * content-hash order (t11's md5 discipline — reproducible across
    * runs, partitioning and engines, no RNG state).
    *
    * Execution: s8's learned assignment ([[lloyd]] — the cells are
    * TRAINED, not the label prior), one metadata-sized scalar for the
    * learned cell count, then the per-cell cut through
    * [[graft.plans.TopK]]'s partial+final bounded heaps — no
    * per-cell sort, no row_number window shipping a whole cell to one
    * task; the shuffle carries ≤ partitions·ncells·quota survivor
    * rows (t11's scale shape keyed by the learned cells). Oracle:
    * s8's unrolled Lloyd chain spliced verbatim through `afin`, plus
    * the QUALIFY cut — the sampling arithmetic is checked against the
    * SAME training fixpoint the operator computed.
    */
  private def s18(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .spreadToCores
    val (assigned, centroids, _) = lloyd(e)
    // learned cell count = the TRAINED centroid count — metadata lloyd
    // already holds (a k-row LocalRelation; counting it runs no corpus
    // work). ADVICE r15 #3: the previous COUNT(DISTINCT cell) over the
    // final assignment re-ran the full argmin projection just for this
    // scalar (and a localCheckpoint of the assignment measured SLOWER
    // at sf0.1, 1.89 vs 1.68 s isolated — and is corpus-sized state at
    // 100 TB). Identical whenever every centroid wins ≥ 1 vector
    // (true at every SF here, parity-checked); a permanently-empty
    // cell would under-fill the budget by one quota — the conservative
    // direction for a diversity sampler. Quota uses integer ceil so
    // both engines share the arithmetic.
    val ncells = centroids.count()
    require(ncells > 0, s"s18: no cells learned over $d")
    val quota = ((ClusterSampleBudget + ncells - 1) / ncells).toInt
    val sel = assigned.select(col("cell"), col("vec_id"),
      md5(concat(lit("csamp:"), col("vec_id").cast("string")).cast("binary")).as("h"))
    graft.plans.TopK.perKey(sel, Seq("cell"), "h", "vec_id", quota)
      .sortWithinPartitions(col("cell"), col("h"))
  }

  private val s18Sql = {
    val prefix = graft.SqlSplice.before(s8Sql, "\nSELECT cell,")
    s"""$prefix,
       |sel AS (SELECT cell, vec_id, md5('csamp:' || CAST(vec_id AS VARCHAR)) AS h
       |  FROM afin),
       |nc AS (SELECT COUNT(*) AS ncells FROM c$KmeansMaxRounds)
       |SELECT cell, vec_id, h FROM (
       |  SELECT s.cell, s.vec_id, s.h,
       |    ROW_NUMBER() OVER (PARTITION BY s.cell ORDER BY s.h DESC, s.vec_id) AS pick,
       |    nc.ncells
       |  FROM sel s CROSS JOIN nc)
       |WHERE pick <= ($ClusterSampleBudget + ncells - 1) // ncells
       |ORDER BY cell, h DESC""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "s18_cluster_sample" -> (s18 _),
    "s17_ivf_incremental" -> (s17 _),
    "s22_filtered_search" -> (s22 _),
    "s23_filtered_recall" -> (s23 _),
    "s24_nprobe_curve" -> (s24 _),
    "s12_range_search" -> (s12 _),
    "s13_range_recall" -> (s13 _),
    "s11_ivf_persist" -> (s11 _),
    "s10_ivfpq_recall" -> (s10 _),
    "s9_pq_recall" -> (s9 _),
    "s8_kmeans" -> (s8 _),
    "s7_sq8_recall" -> (s7 _),
    "s1_knn_brute" -> (s1 _),
    "s2_ann_lsh" -> (s2 _),
    "s3_ivf_cells" -> (s3 _),
    "s26_index_health" -> (s26 _),
    "s4_ivf_probe" -> (s4 _),
    "s5_ann_recall" -> (s5 _),
    "s6_ivf_recall" -> (s6 _))

  val oracles: Map[String, String] = Map(
    "s18_cluster_sample" -> s18Sql,
    "s17_ivf_incremental" -> s17Sql,
    "s22_filtered_search" -> s22Sql,
    "s23_filtered_recall" -> s23Sql,
    "s24_nprobe_curve" -> s24Sql,
    "s12_range_search" -> s12Sql,
    "s13_range_recall" -> s13Sql,
    "s10_ivfpq_recall" -> s10Sql,
    "s9_pq_recall" -> s9Sql,
    "s8_kmeans" -> s8Sql,
    "s7_sq8_recall" -> s7Sql,
    "s1_knn_brute" -> s1Sql,
    "s2_ann_lsh" -> s2Sql,
    "s3_ivf_cells" -> s3Sql,
    "s26_index_health" -> s26Sql,
    "s4_ivf_probe" -> s4Sql,
    "s11_ivf_persist" -> s4Sql,
    "s5_ann_recall" -> s5Sql,
    "s6_ivf_recall" -> s6Sql)
}
