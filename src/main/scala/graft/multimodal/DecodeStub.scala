package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed media record: opaque bytes + metadata. */
case class MediaRecord(doc_id: Long, payload: Array[Byte])

/** Decoded features a real decoder would produce. */
case class MediaFeatures(doc_id: Long, width: Int, height: Int, meanLuma: Double)

/** Decode / feature-extract stub over `mapPartitions`.
  *
  * Image/audio codec libraries are not available in this environment,
  * so the decoder body is a deterministic fake; the distributed shape
  * is the real thing: a typed Dataset pipeline where each partition
  * initializes its "decoder" once and streams records through it —
  * exactly how a JNI/FFI codec would be driven per executor. Swap
  * `fakeDecode` for a real codec and nothing else changes.
  */
object DecodeStub {

  /** Deterministic stand-in for a codec: dimensions and luminance
    * derived from the byte content. */
  private[multimodal] def fakeDecode(rec: MediaRecord): MediaFeatures = {
    val n = rec.payload.length
    var acc = 0L
    var i = 0
    while (i < n) { acc += (rec.payload(i) & 0xff); i += 1 }
    MediaFeatures(
      doc_id = rec.doc_id,
      width = 64 + (n % 512),
      height = 64 + ((n * 7) % 512),
      meanLuma = if (n == 0) 0.0 else acc.toDouble / n / 255.0)
  }

  def decode(records: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    records.mapPartitions { it =>
      // per-partition decoder init would go here (JNI handle, etc.)
      it.map(fakeDecode)
    }
  }
}
