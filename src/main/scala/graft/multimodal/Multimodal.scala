package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QFn, Tables}

/** Multimodal-column operators m1–m2 (SURVEY.md §2): media as opaque
  * binary columns with typed metadata, plus deterministic frame
  * sampling. The decode step itself is stubbed (see [[DecodeStub]]) —
  * media codecs are external, as model inference is in the reference —
  * but the Spark-side plumbing (binary schema, per-row metadata,
  * partition-parallel sampling) is real.
  */
object Multimodal {

  /** m1: binary payload + typed metadata. Document text stands in for
    * image bytes; "dimensions" are deterministic functions of the
    * payload (the shape a real decoder would fill in). Per-row, no
    * shuffle.
    */
  private def m1(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        substring(regexp_replace(base64(col("payload")), "\r\n", ""), 1, 16).as("b64_head"),
        (lit(64) + octet_length(col("payload")) % 512).cast("int").as("width"),
        (lit(64) + (octet_length(col("payload")) * 7) % 512).cast("int").as("height"),
        when(octet_length(col("payload")) % 3 === 0, lit("png"))
          .when(octet_length(col("payload")) % 3 === 1, lit("jpeg"))
          .otherwise(lit("webp")).as("format"))
      .orderBy(col("doc_id"))

  private val m1Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  substring(to_base64(encode(text)), 1, 16) AS b64_head,
      |  CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS width,
      |  CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INTEGER) AS height,
      |  CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'png'
      |       WHEN octet_length(encode(text)) % 3 = 1 THEN 'jpeg'
      |       ELSE 'webp' END AS format
      |FROM documents ORDER BY doc_id""".stripMargin

  /** m2: every-Nth frame sampling per stream (user) in event-time
    * order — the video-frame subsampling pattern. One shuffle on the
    * stream key; linear scan per partition.
    */
  private def m2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("tus"))
      .withColumn("frame_idx", row_number().over(w).cast("long"))
      .filter((col("frame_idx") % 10) === 1)
      .select(col("user_id"), col("frame_idx"), col("event_id"), col("tus"))
      .orderBy(col("user_id"), col("frame_idx"))
  }

  private val m2Sql =
    """WITH f AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tus,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS frame_idx
      |  FROM events)
      |SELECT user_id, frame_idx, event_id, tus
      |FROM f WHERE frame_idx % 10 = 1
      |ORDER BY user_id, frame_idx""".stripMargin

  /** m3: fixed-size chunking of a binary payload (the audio-window /
    * image-tile pattern): each document's bytes split into 64-byte
    * chunks with per-chunk fingerprints. Generate-positions + explode,
    * linear, no shuffle.
    */
  private def m3(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(1, length(text), 64), i -> substring(text, i, 64))"))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk").cast("binary")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val m3Sql =
    """SELECT doc_id, i // 64 AS chunk_idx,
      |  CAST(length(substring(text, i + 1, 64)) AS BIGINT) AS chunk_len,
      |  md5(substring(text, i + 1, 64)) AS chunk_md5
      |FROM (SELECT doc_id, text,
      |        unnest(generate_series(0, length(text) - 1, 64)) AS i
      |      FROM documents)
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** m4: chunk-level cross-document dedup (content-defined-chunking
    * style): fingerprints shared by ≥2 documents expose repeated
    * byte-ranges — watermarks, boilerplate headers, copied segments —
    * that whole-file hashing misses. One shuffle on the 16-byte
    * fingerprint; chunks themselves never shuffle.
    */
  private def m4(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, length(text), 64), i -> substring(text, i, 64))"))
          .as("chunk"))
      .groupBy(md5(col("chunk").cast("binary")).as("chunk_md5"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc_id"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("chunk_md5"))

  private val m4Sql =
    """WITH c AS (
      |  SELECT doc_id, md5(substring(text, i + 1, 64)) AS chunk_md5
      |  FROM (SELECT doc_id, text,
      |          unnest(generate_series(0, length(text) - 1, 64)) AS i
      |        FROM documents))
      |SELECT chunk_md5, COUNT(*) AS n_occurrences,
      |  COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc_id
      |FROM c GROUP BY chunk_md5 HAVING COUNT(DISTINCT doc_id) >= 2
      |ORDER BY chunk_md5""".stripMargin

  val queries: Map[String, QFn] = Map(
    "m1_binary_meta" -> (m1 _),
    "m2_frame_sample" -> (m2 _),
    "m3_chunking" -> (m3 _),
    "m4_chunk_dedup" -> (m4 _))

  val oracles: Map[String, String] = Map(
    "m1_binary_meta" -> m1Sql,
    "m2_frame_sample" -> m2Sql,
    "m3_chunking" -> m3Sql,
    "m4_chunk_dedup" -> m4Sql)
}
