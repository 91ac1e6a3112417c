package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a
  * `TypedImperativeAggregate` (SURVEY.md §4: the mutable-buffer aggregate
  * tier, the shape used for HLL/quantile/theta sketches).
  *
  * Buffer = the k smallest 64-bit hashes seen; estimate = (k-1) / kth-min
  * (normalized to [0,1]). Buffers merge by union+truncate — associative and
  * commutative, so Spark runs it partial+final like any hash aggregate and
  * sketches can be OR-ed across days/partitions at 100 TB without rescans.
  * Spark's own HLL++ (`approx_count_distinct`) is the production choice;
  * this demonstrates the extension point with a sketch Spark doesn't ship.
  */
case class KmvDistinct(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def hash64(v: Any): Long = v match {
    case s: UTF8String => org.apache.spark.unsafe.hash.Murmur3_x86_32
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42).toLong << 32 |
      (org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 43).toLong & 0xffffffffL)
    case l: Long => scala.util.hashing.byteswap64(l)
    case i: Int => scala.util.hashing.byteswap64(i.toLong)
    case other => scala.util.hashing.byteswap64(other.hashCode().toLong)
  }

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // map to non-negative by dropping the sign bit (keeps order semantics)
      val h = hash64(v) & Long.MaxValue
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[Long], b: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (a.size < k) a.add(h)
      else if (h < a.last()) { a.add(h); if (a.size > k) a.pollLast() }
    }
    a
  }

  override def eval(buf: java.util.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      val kth = buf.last().toDouble / Long.MaxValue.toDouble
      math.round((k - 1) / kth)
    }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvDistinct =
    copy(child = c.head)
}

object KmvFunctions {
  /** Register `kmv_distinct(col[, k])` in the session's function registry. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("kmv_distinct")
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
        (children: Seq[Expression]) => {
          if (children.isEmpty || children.size > 2)
            throw new IllegalArgumentException(
              s"kmv_distinct(col[, k]) expects 1 or 2 arguments but got ${children.size}")
          val k = if (children.length > 1)
            children(1).eval(null).asInstanceOf[Number].intValue() else 256
          KmvDistinct(children.head, k).toAggregateExpression()
        })
    }
  }
}
