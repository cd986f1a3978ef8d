package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native k-minimum-values sketch AGGREGATE — the
  * `TypedImperativeAggregate` tier of the extension ladder (scalar
  * codegen expressions like [[IDot]] cover per-row kernels; this is
  * the per-GROUP kernel): one pass over the raw hash stream keeps the
  * k smallest DISTINCT values in a bounded ordered set, with map-side
  * partial aggregation and an O(k) merge — where the declarative
  * formulation ([[graft.ops.TextAnalysis.kmvDistinct]], kept as the
  * parity reference) needs a distinct, two salted window passes and a
  * re-merge to avoid a single-task sort. At 100 TB the difference is
  * one hash-partitioned aggregate whose shuffle carries ≤ k longs per
  * (group, map task) versus shuffling every distinct hash.
  *
  * The returned value is the ASCENDING array of the ≤ k minima — the
  * sketch itself, so callers read the k-th smallest for the
  * Bar-Yossef estimate, persist the array as an artifact, or merge
  * two sketches by `array_sort(slice(concat, ...))`. Determinism:
  * inputs are md5-derived non-null longs ([[Hashes.h32]] discipline),
  * the set is value-ordered, and ties cannot exist in a set — the
  * array is bit-identical in any engine, hence DuckDB-checkable.
  *
  * State is bounded (≤ k boxed longs) and serialized as 8k bytes;
  * nulls are skipped (SQL aggregate convention). */
case class KmvSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 1 && k <= (1 << 20), s"kmv k out of range: $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // skip values already past the current k-th minimum: O(log k)
      // membership work only for candidates
      if (buf.size < k || h < buf.last()) {
        buf.add(h)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (b1.size < k || h < b1.last()) {
        b1.add(h)
        if (b1.size > k) b1.pollLast()
      }
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv expects a BIGINT input, got ${child.dataType}")
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_kmv"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}
