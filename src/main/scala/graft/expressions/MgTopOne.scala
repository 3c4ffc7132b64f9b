package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded approximate top-1 aggregate: the most frequent value of a
  * string column by a Misra–Gries summary of at most `k − 1` counters —
  * O(k) memory per partial buffer NO MATTER the column's cardinality,
  * unlike `mode()`, whose partial state holds every distinct value seen
  * by the partition (ADVICE r16: a high-cardinality key feed made the
  * "free" observe()-riding profile refresh carry unbounded memory —
  * exactly the feed where the profile concludes "no skew").
  *
  * Guarantees (Misra–Gries, and the mergeability theorem of Agarwal et
  * al., "Mergeable Summaries", PODS'12 — same algebra as
  * [[graft.operators.SketchOps.mgSketch]]/`mgMerge`): every counter
  * undercounts its item's true frequency by at most n/k, and any item
  * with true share > 1/k is guaranteed retained. With the default
  * k = 32 the returned item is therefore the EXACT mode whenever the
  * true mode's share exceeds the runner-up's by more than ~2n/32 ≈ 6% —
  * far tighter than the ≥ 50%-share signal the skew profile thresholds
  * on ([[graft.operators.SkewOps.observeProfile]]). Ties and
  * within-error rivals resolve to the lexicographically smallest item,
  * so the result is deterministic given the same multiset (mode() makes
  * no such promise). Null inputs are ignored; an all-null/empty group
  * returns null.
  *
  * Used inside `observe()` (CollectMetrics evaluates imperative
  * aggregates through AggregatingAccumulator, which serializes typed
  * buffers between partials — [[serialize]]/[[deserialize]] below) and
  * registered as SQL function `graft_mg_top1` for standalone use.
  */
case class MgTopOne(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"graft_mg_top1: k must be at least 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mg_top1 requires a string column, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mg_top1"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1L)
        case None if buf.size < k - 1 => buf.update(item, 1L)
        case None =>
          // classic MG decrement-all on a full summary: every counter
          // (and, implicitly, the unseen newcomer) loses one — O(k)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { ki =>
            val n = buf(ki) - 1L
            if (n <= 0L) dead += ki else buf.update(ki, n)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, n) =>
      buf.update(item, buf.getOrElse(item, 0L) + n)
    }
    if (buf.size > k - 1) {
      // re-trim to k−1: subtract the k-th largest combined count from
      // every counter, drop ≤ 0 (the mergeable-summaries step — error
      // bounds add, the n/k guarantee survives any rollup depth)
      val ck = buf.values.toArray.sorted(Ordering.Long.reverse)(k - 1)
      val dead = buf.iterator.collect {
        case (item, n) if n - ck <= 0L => item
      }.toList
      dead.foreach(buf.remove)
      buf.keysIterator.toList.foreach(item => buf.update(item, buf(item) - ck))
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    if (buf.isEmpty) null
    else {
      var bestItem: String = null
      var bestN = Long.MinValue
      buf.foreach { case (item, n) =>
        if (n > bestN || (n == bestN && item < bestItem)) {
          bestItem = item; bestN = n
        }
      }
      UTF8String.fromString(bestItem)
    }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, n) =>
      val b = item.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val size = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgTopOne =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgTopOne =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgTopOne =
    copy(child = newChild)
}
