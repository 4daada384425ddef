package graft.etl.expressions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded top-k aggregate: the k smallest values of `child` (by the
  * type's natural ordering — rank descending by negating the sort key),
  * returned as an ascending array.
  *
  * This is the aggregation shape a per-group quota needs at scale. The
  * window formulation (`row_number().over(Window.partitionBy(group))`)
  * has no map-side partial aggregation: every row of a hot group
  * funnels through one task (the `lineDedup` r6 failure class, and AQE
  * skew handling does not apply to Window). `collect_list` + sort +
  * slice aggregates, but its buffer holds EVERY value of the group
  * until the final slice — a hot group's reduce task still materializes
  * the whole group. This aggregate's buffer never exceeds k elements in
  * ANY mode: each map task keeps at most k per group (partial), merge
  * combines two ≤k buffers into one (partial-merge/final), so a
  * quota'd group costs O(k · tasks) memory and the shuffle carries at
  * most k values per group per map task — a hot key is structurally
  * incapable of concentrating load.
  *
  * Null inputs are ignored (standard SQL aggregate semantics); a group
  * with no non-null input yields an empty array, never null. Ties are
  * broken by nothing here — callers who need determinism make the key
  * a total order (e.g. append a unique id field to the sort struct),
  * exactly as they would for `ORDER BY`.
  *
  * The buffer serializes through `UnsafeProjection` on a single-field
  * row per element (the standard typed-aggregate spill format), so any
  * orderable type — including the sort-key + payload structs
  * [[graft.ops.Sampling.topKPerGroup]] packs — round-trips exactly.
  */
case class BoundedTopK(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(k > 0, s"bounded_top_k: k must be positive, got $k")

  // deferred to resolution time: the constructor runs on unresolved
  // children during analyzer tree transforms, where dataType throws
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (RowOrdering.isOrderable(child.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bounded_top_k: input type ${child.dataType.catalogString} is not orderable")
    }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): ArrayBuffer[Any] =
    new ArrayBuffer[Any](math.min(k, 16))

  /** Insert keeping `buf` ascending and |buf| ≤ k. Values ≥ the
    * current k-th smallest are rejected before copying, so a full
    * buffer does no allocation on the (overwhelmingly common at scale)
    * non-qualifying row. */
  private def insert(buf: ArrayBuffer[Any], v: Any): ArrayBuffer[Any] = {
    if (buf.size == k && ord.compare(v, buf.last) >= 0) return buf
    val copied = InternalRow.copyValue(v)
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.compare(buf(mid), copied) <= 0) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, copied)
    if (buf.size > k) buf.remove(buf.size - 1)
    buf
  }

  override def update(buf: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v == null) buf else insert(buf, v)
  }

  override def merge(buf: ArrayBuffer[Any], other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    // `other` elements were copied on their own insert; re-inserting
    // compares first and copies only qualifiers (copyValue on an
    // already-detached value is a cheap clone, correctness-neutral).
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  @transient private lazy val serProj =
    UnsafeProjection.create(Array(child.dataType))

  override def serialize(buf: ArrayBuffer[Any]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    dos.writeInt(buf.size)
    val row = new GenericInternalRow(1)
    buf.foreach { v =>
      row.update(0, v)
      val bytes = serProj(row).getBytes // getBytes copies out of the shared buffer
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(storage: Array[Byte]): ArrayBuffer[Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = new ArrayBuffer[Any](n)
    val row = new UnsafeRow(1)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      row.pointTo(bytes, len)
      buf += InternalRow.copyValue(row.get(0, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)
}
