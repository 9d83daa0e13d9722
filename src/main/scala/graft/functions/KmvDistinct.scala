package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002,
  * RANDOM '02 "Counting distinct elements in a data stream") as a
  * native Catalyst aggregate — the engine's DETERMINISTIC sibling of
  * `approx_count_distinct`. Unlike HLL++ (whose register layout and
  * bias tables are engine-private, forcing q26 to a rows-only oracle
  * for 17 rounds), KMV over a FIXED hash is exactly reproducible in
  * ANSI SQL: the caller supplies the hash value (a 40-bit md5 slice
  * both engines compute identically), the sketch keeps the k smallest
  * DISTINCT hash values, and the estimate is pure integer arithmetic —
  *
  *   n < k  (saw fewer than k distinct hashes)  -> n          (exact)
  *   else   est = (k-1) * 2^40 / (h_k + 1)                (floor div)
  *
  * where h_k is the k-th smallest distinct hash (the +1 guards the
  * measure-zero h_k = 0 and is applied on both engines). Relative
  * error ~ 1/sqrt(k) (~3% at k = 1024).
  *
  * Scale: the aggregation state is a bounded sorted set (<= k longs =
  * 8 KiB at k = 1024) regardless of group cardinality, and merge is a
  * set-union-keep-k — partials combine map-side, so the shuffle
  * carries one sketch per group per task where exact countDistinct
  * shuffles every distinct key. This is the same one-pass mergeable
  * contract as q25's value histogram and t31's count-min rows; the
  * DuckDB oracle reproduces the estimate with a rank window over
  * distinct hashes (tiny at test SF; the SKETCH is the engine path).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, "KMV needs k >= 2")

  /** Hash domain: callers pass conv(substring(md5(..), 1, 10), 16, 10)
    * — 10 hex digits = 40 bits, so (k-1) * 2^40 stays far inside Long
    * (2^50 at k = 1024) for the integer-division estimate. */
  val HashMax: Long = 1L << 40

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // admit only if it could be among the k smallest (cheap reject
      // keeps the common-case update O(1) comparisons + one set probe)
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { if (buf.add(h)) buf.pollLast() }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    var continue = true
    while (it.hasNext && continue) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { if (buf.add(h)) buf.pollLast() }
      // `other` is sorted ascending: once an element fails the
      // admission test, every later one fails it too
      else continue = false
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size() < k) buf.size().toLong
    else (k - 1).toLong * HashMax / (buf.last() + 1L)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct requires a BIGINT hash input, got $other")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `kmv_distinct(hashCol, k)` as a DataFrame aggregate column. */
  def apply(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvDistinct(ColumnBridge.expression(hash), k).toAggregateExpression())
}
