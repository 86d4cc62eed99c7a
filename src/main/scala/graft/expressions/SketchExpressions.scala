package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch aggregate (SURVEY.md §7.4
  * custom path (b): a Catalyst aggregate, not a UDAF).
  *
  * Keeps the k smallest DISTINCT values of an already-hashed long column —
  * O(k) state per group regardless of input size, and the partial/merge
  * path is a set union + trim, so map-side combine does most of the work
  * before the shuffle. Returns the kept values ascending as `array<bigint>`;
  * the estimate `(k-1)·2⁶⁰ / kth_min` is plain column arithmetic on top
  * (`SketchFunctions.kmvEstimate`), which keeps the aggregate itself
  * engine-replayable: DuckDB reproduces the kept set with a row_number
  * window over distinct hashes, with no floating point inside the agg.
  *
  * Why not approx_count_distinct: HLL sketches are engine-specific binary
  * state — nothing outside Spark can verify or merge them. KMV over the
  * portable md5 hash ([[PortableHash60]]) is exact integer arithmetic any
  * engine replays, the property the whole dedup/sampling family is built
  * on, at the cost of O(k) instead of O(log log n) state.
  *
  * Unlike the reference's exact pandas `nunique` (aeon loads whole streams
  * in memory, e.g. `aeon/io/api.py:154-160`), a 100 TB corpus needs
  * cardinality at bounded memory: the sketch is mergeable across
  * partitions, files, and days (union the arrays, re-trim to k).
  */
case class KmvMinHashes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= (1 << 20),
    s"kmv_minhashes needs 2 <= k <= 2^20 (fixed sketch memory), got $k")

  override def prettyName: String = "kmv_minhashes"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an already-hashed BIGINT column " +
        s"(use portable_hash60), got ${other.sql}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Bounded insert: ignore values above the current k-th minimum. */
  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last && buf.add(v)) { buf.pollLast(); () }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator() // TreeSet iterates ascending
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
