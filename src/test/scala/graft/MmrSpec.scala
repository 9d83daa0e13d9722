package graft

import org.apache.spark.sql.functions._

/** s20 pins: the greedy MMR selection must equal an independent
  * recompute whose cosine goes through the NATIVE expression path
  * (VectorFunctions.dot inside a DataFrame), not the operator's JVM
  * fold — passing both ways proves the fold ≡ expression bit-equality
  * the operator's exactness rests on — and the similarity term must be
  * demonstrably live.
  */
class MmrSpec extends SparkSpec {

  private lazy val out =
    SparkEntry.queries("s20_mmr_diversify")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private lazy val cand: Array[(Long, Long)] =
    graft.sim.Hybrid.s15(spark, sf).select("doc_id", "rrf_milli")
      .join(Tables.embeddings(spark, sf).select(col("vec_id").as("doc_id")), Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** Pairwise sim_milli via the NATIVE expression path. */
  private lazy val sims: Map[(Long, Long), Long] = {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val ids = cand.map(_._1).toSeq
    val a = e.filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id").as("da"), col("embedding").as("ea"))
    val b = e.filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id").as("db"), col("embedding").as("eb"))
    a.crossJoin(b).filter(col("da") =!= col("db"))
      .select(col("da"), col("db"),
        round(graft.functions.VectorFunctions.dot("ea", "eb") /
          (sqrt(graft.functions.VectorFunctions.dot("ea", "ea")) *
            sqrt(graft.functions.VectorFunctions.dot("eb", "eb"))) * 1000)
          .cast("long").as("sim_milli"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("s20 equals the independently recomputed greedy (native-expression cosines)") {
    val chosen = scala.collection.mutable.ArrayBuffer[Long]()
    val expected = (1 to graft.sim.Mmr.MmrK).flatMap { r =>
      val remaining = cand.filter(c => !chosen.contains(c._1))
      if (remaining.isEmpty) None
      else {
        val scored = remaining.map { case (doc, rel) =>
          val pen = if (chosen.isEmpty) 0L
            else chosen.map(s0 => sims((doc, s0))).max
          (doc, rel, pen, 7L * rel - 3L * pen)
        }
        val best = scored.minBy { case (d0, _, _, s0) => (-s0, d0) }
        chosen += best._1
        Some((r.toLong, best._1, best._2, best._3, best._4))
      }
    }
    assert(out.toSeq == expected, s"greedy drift:\n got ${out.toSeq}\nwant $expected")
  }

  test("s20's similarity term is live and the first pick is pure argmax-relevance") {
    assert(out.head._1 == 1L && out.head._4 == 0L)
    val top = cand.minBy { case (d0, rel) => (-rel, d0) }
    assert(out.head._2 == top._1, "rank 1 is not the most relevant candidate")
    assert(out.tail.exists(_._4 != 0L), "no selection ever paid a similarity penalty")
  }
}
