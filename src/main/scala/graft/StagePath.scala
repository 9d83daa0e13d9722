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

  /** Stage a directory-shaped artifact via write-to-temp + rename
    * (ADVICE r13: two concurrent processes on the same corpus could
    * race a re-sweep's multi-second `mode("overwrite")` parquet write
    * against a warm reader). `write` produces the artifact at a temp
    * sibling on the same filesystem; the previous artifact is then
    * deleted and the temp renamed into place with ATOMIC_MOVE. The
    * exposure shrinks from the full Spark write to the delete+rename
    * instant — not perfectly atomic (POSIX cannot atomically replace a
    * non-empty directory), but combined with the marker-written-last
    * rule a concurrent reader can no longer observe a half-written
    * parquet directory behind a valid marker. Stagers that assemble
    * per-file (the streaming landing dirs) already move files into
    * place individually and don't need this. */
  def atomicSwapDir(dst: java.nio.file.Path)(write: java.nio.file.Path => Unit): Unit = {
    val tmp = dst.resolveSibling(dst.getFileName.toString + "_swap_tmp")
    val old = dst.resolveSibling(dst.getFileName.toString + "_swap_old")
    deleteRecursively(tmp)
    write(tmp)
    // ADVICE r14: move the previous artifact ASIDE (a rename, near-
    // instant) rather than deleting it before the swap — a crash
    // between the old delete and the new rename used to leave a valid
    // marker pointing at a missing artifact, safe only because every
    // freshness predicate independently re-tests artifact existence.
    // That contract still holds (and callers MUST keep testing
    // existence — a marker alone is never proof of an artifact), but
    // the unrecoverable window is now two renames, not a recursive
    // delete; the old dir is reaped after the swap lands.
    deleteRecursively(old)
    if (java.nio.file.Files.exists(dst)) java.nio.file.Files.move(dst, old)
    try java.nio.file.Files.move(tmp, dst,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      java.nio.file.Files.move(tmp, dst)
    }
    deleteRecursively(old)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }

  /** The freshness-marker payload for a staged artifact derived from
    * `src` (a file inside corpus `d`): size, mtime, the staging logic's
    * version token, and the corpus path itself (so even a directory-
    * token collision cannot validate a stale marker). */
  def srcMeta(d: String, src: java.nio.file.Path, version: String): String =
    s"${java.nio.file.Files.size(src)}:" +
      java.nio.file.Files.getLastModifiedTime(src).toMillis + s":$version:$d"
}
