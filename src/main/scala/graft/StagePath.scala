package graft

/** Naming for persisted per-corpus staging directories (the BPE merge
  * table, d16's manifests, d20's label store, s11's IVF index, the
  * bucketed/partitioned/z-ordered table layouts).
  *
  * Each cache lives under `java.io.tmpdir` in a directory derived from
  * the corpus path and is guarded by a `_src_meta` freshness marker.
  * The derivation must be collision-free: the r12 advice observed that
  * `Integer.toHexString(path.hashCode)` (32 bits, and `String.hashCode`
  * is trivially collidable) combined with a size+mtime-only marker
  * could silently serve one corpus's staged artifact to another. Both
  * halves are fixed here: the directory token is a 128-bit MD5 of the
  * full path, and [[srcMeta]] embeds the path itself in the marker —
  * a collision now requires two different paths to produce the same
  * MD5 AND carry the same marker string containing their own distinct
  * paths, i.e. it cannot happen silently.
  */
object StagePath {

  /** 32-hex-char MD5 of the corpus path — the per-corpus directory
    * token. MD5 is fine here: this is a partition key, not a security
    * boundary, and it matches the engines' shared md5() used elsewhere. */
  def corpusToken(d: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** The freshness-marker payload for a staged artifact derived from
    * `src` (a file inside corpus `d`): size, mtime, the staging logic's
    * version token, and the corpus path itself (so even a directory-
    * token collision cannot validate a stale marker). */
  def srcMeta(d: String, src: java.nio.file.Path, version: String): String =
    s"${java.nio.file.Files.size(src)}:" +
      java.nio.file.Files.getLastModifiedTime(src).toMillis + s":$version:$d"
}
