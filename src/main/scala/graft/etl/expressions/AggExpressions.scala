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

/** The SpaceSaving stream-summary buffer (Metwally et al. 2005,
  * "Efficient computation of frequent and top-k elements in data
  * streams"): at most `capacity` monitored keys, each with an
  * overestimated count and the error bound of that overestimate —
  * `count − err ≤ true ≤ count`, so `err == 0` certifies an exact
  * count. A full buffer evicts its min-count entry on a new key,
  * crediting the evictee's count as the newcomer's error.
  *
  * Keys are hashed for O(1) update and indexed by (count, key-order)
  * for O(log m) min eviction; stored keys are detached copies (inputs
  * arrive on reused unsafe buffers). */
private[graft] final class SpaceSavingSummary(val capacity: Int,
    ord: Ordering[Any]) {
  final class Entry(val key: Any) {
    var count: Long = 0L
    var err: Long = 0L
  }
  val entries = new java.util.HashMap[Any, Entry]()
  private val cmp = new java.util.Comparator[Entry] {
    def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Long.compare(a.count, b.count)
      if (c != 0) c else ord.compare(a.key, b.key)
    }
  }
  private val byCount = new java.util.TreeSet[Entry](cmp)

  /** Upper bound on the true count of any UNMONITORED key: the min
    * monitored count once full, 0 while every seen key is monitored. */
  def minCount: Long =
    if (entries.size < capacity) 0L else byCount.first().count

  /** Credit `inc` occurrences (with `errInc` of them uncertain) to
    * `key`, evicting the min-count entry if the key is new and the
    * buffer full (eviction adds the evictee's count to BOTH — the
    * SpaceSaving overestimate rule). */
  def add(key: Any, inc: Long, errInc: Long): Unit = {
    val existing = entries.get(key)
    if (existing != null) {
      byCount.remove(existing)
      existing.count += inc
      existing.err += errInc
      byCount.add(existing)
    } else {
      var base = 0L
      if (entries.size >= capacity) {
        val min = byCount.pollFirst()
        entries.remove(min.key)
        base = min.count
      }
      val e = new Entry(InternalRow.copyValue(key))
      e.count = base + inc
      e.err = base + errInc
      entries.put(e.key, e)
      byCount.add(e)
    }
  }

  /** Entries sorted by (count desc, key asc) — deterministic given the
    * buffer's content. */
  def sorted: Array[Entry] = {
    val arr = new Array[Entry](entries.size)
    var i = arr.length - 1
    val it = byCount.iterator()
    while (it.hasNext) { arr(i) = it.next(); i -= 1 }
    arr
  }

  /** The mergeable-summaries rule (Agarwal et al. 2012): a key absent
    * from one side is credited that side's [[minCount]] as pure error
    * (the tight upper bound on what it could have counted there), the
    * union trims back to capacity keeping the largest (count desc,
    * key-order tie). Shared by the aggregate's distributed merge and
    * the streaming twin's cross-batch carry — the rule cannot fork. */
  def mergeWith(other: SpaceSavingSummary): SpaceSavingSummary = {
    val minA = minCount
    val minB = other.minCount
    val merged = new java.util.ArrayList[(Any, Long, Long)](
      entries.size + other.entries.size)
    val itA = entries.values().iterator()
    while (itA.hasNext) {
      val a = itA.next()
      val b = other.entries.get(a.key)
      if (b != null) merged.add((a.key, a.count + b.count, a.err + b.err))
      else merged.add((a.key, a.count + minB, a.err + minB))
    }
    val itB = other.entries.values().iterator()
    while (itB.hasNext) {
      val b = itB.next()
      if (entries.get(b.key) == null)
        merged.add((b.key, b.count + minA, b.err + minA))
    }
    val arr = new Array[(Any, Long, Long)](merged.size())
    merged.toArray(arr.asInstanceOf[Array[Object]])
    java.util.Arrays.sort(arr.asInstanceOf[Array[Object]],
      new java.util.Comparator[Object] {
        def compare(x: Object, y: Object): Int = {
          val a = x.asInstanceOf[(Any, Long, Long)]
          val b = y.asInstanceOf[(Any, Long, Long)]
          val c = java.lang.Long.compare(b._2, a._2)
          if (c != 0) c else ord.compare(a._1, b._1)
        }
      })
    val out = new SpaceSavingSummary(capacity, ord)
    var i = 0
    while (i < arr.length && i < capacity) {
      out.add(arr(i)._1, arr(i)._2, arr(i)._3)
      i += 1
    }
    out
  }
}

/** SpaceSaving heavy-hitters aggregate: a bounded-memory summary of
  * the most frequent values of `child`, as
  * `array<struct<key, cnt, err>>` sorted by (cnt desc, key) —
  * `cnt − err ≤ true count ≤ cnt`, and every key with true count
  * above the summary's min is guaranteed monitored. The one-pass
  * "top domains / top n-grams over the whole corpus" primitive: an
  * exact `groupBy(key).count.orderBy.limit` shuffles EVERY distinct
  * key (crawl-scale vocabularies are corpus-sized); this summary is
  * O(capacity) per task in every aggregation mode and merges like any
  * partial aggregate.
  *
  * The distributed merge is the mergeable-summaries rule (Agarwal et
  * al. 2012): a key absent from one side is credited that side's
  * `minCount` as pure error (the tight upper bound on what it could
  * have counted there), then the union trims back to capacity.
  * Summary TAILS therefore depend on partition merge order (inherent
  * to the sketch family); rows with `err == 0` carry exact,
  * order-independent counts — consumers gate on it (see
  * `tx_heavy_hitters`, which emits certified rows only).
  *
  * Null inputs are ignored; an all-null group yields an empty array. */
case class SpaceSavingTopK(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSummary]
  with UnaryLike[Expression] {

  require(capacity > 0,
    s"space_saving_top_k: capacity must be positive, got $capacity")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (RowOrdering.isOrderable(child.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"space_saving_top_k: input type ${child.dataType.catalogString} is not orderable")
    }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key", child.dataType,
        nullable = false),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("err",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "space_saving_top_k"

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): SpaceSavingSummary =
    new SpaceSavingSummary(capacity, ord)

  override def update(buf: SpaceSavingSummary, input: InternalRow): SpaceSavingSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v, 1L, 0L)
    buf
  }

  override def merge(buf: SpaceSavingSummary, other: SpaceSavingSummary): SpaceSavingSummary =
    buf.mergeWith(other)

  override def eval(buf: SpaceSavingSummary): Any =
    new GenericArrayData(buf.sorted.map { e =>
      val row = new GenericInternalRow(3)
      row.update(0, e.key)
      row.update(1, e.count)
      row.update(2, e.err)
      row
    }.toArray[Any])

  @transient private lazy val serProj = UnsafeProjection.create(Array(
    child.dataType, org.apache.spark.sql.types.LongType,
    org.apache.spark.sql.types.LongType))

  override def serialize(buf: SpaceSavingSummary): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    val es = buf.sorted
    dos.writeInt(es.length)
    val row = new GenericInternalRow(3)
    es.foreach { e =>
      row.update(0, e.key)
      row.update(1, e.count)
      row.update(2, e.err)
      val bytes = serProj(row).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(storage: Array[Byte]): SpaceSavingSummary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = new SpaceSavingSummary(capacity, ord)
    val row = new UnsafeRow(3)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      row.pointTo(bytes, len)
      buf.add(InternalRow.copyValue(row.get(0, child.dataType)),
        row.getLong(1), row.getLong(2))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}
