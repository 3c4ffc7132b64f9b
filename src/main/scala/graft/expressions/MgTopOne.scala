package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The shared Misra–Gries summary algebra behind [[MgTopOne]] and
  * [[MgTopK]]: a bounded map of at most `k − 1` counters — O(k) memory
  * per partial buffer NO MATTER the column's cardinality, unlike
  * `mode()`, whose partial state holds every distinct value seen by the
  * partition (ADVICE r16: a high-cardinality key feed made the "free"
  * observe()-riding profile refresh carry unbounded memory — exactly
  * the feed where the profile concludes "no skew").
  *
  * Guarantees (Misra–Gries, and the mergeability theorem of Agarwal et
  * al., "Mergeable Summaries", PODS'12 — same algebra as
  * [[graft.operators.SketchOps.mgSketch]]/`mgMerge`): every counter
  * undercounts its item's true frequency by at most n/k, and any item
  * with true share > 1/k is guaranteed retained. Used inside
  * `observe()` (CollectMetrics evaluates imperative aggregates through
  * AggregatingAccumulator, which serializes typed buffers between
  * partials — [[serialize]]/[[deserialize]] below).
  */
trait MgSummaryAgg
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  def k: Int

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType}")
  override def nullable: Boolean = true

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

  /** Summary items ranked count desc, ties lexicographically asc —
    * deterministic given the same multiset (mode() makes no such
    * promise).
    */
  protected def ranked(buf: mutable.HashMap[String, Long]): Seq[String] =
    buf.toSeq.sortBy { case (item, n) => (-n, item) }.map(_._1)

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
}

/** Bounded approximate top-1 aggregate: the most frequent value of a
  * string column by the [[MgSummaryAgg]] Misra–Gries summary. With the
  * default k = 32 the returned item is the EXACT mode whenever the
  * true mode's share exceeds the runner-up's by more than ~2n/32 ≈ 6% —
  * far tighter than the ≥ 50%-share signal the skew profile thresholds
  * on ([[graft.operators.SkewOps.observeProfile]]). Ties and
  * within-error rivals resolve to the lexicographically smallest item.
  * Null inputs are ignored; an all-null/empty group returns null.
  * Registered as SQL function `graft_mg_top1`.
  */
case class MgTopOne(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends MgSummaryAgg {

  require(k >= 2, s"graft_mg_top1: k must be at least 2, got $k")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_mg_top1"

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    if (buf.isEmpty) null
    else UTF8String.fromString(ranked(buf).head)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgTopOne =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgTopOne =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgTopOne =
    copy(child = newChild)
}

/** Bounded approximate top-N aggregate: the up-to-`topN` most frequent
  * values of a string column (count desc, ties lexicographic asc) from
  * the same [[MgSummaryAgg]] summary — the multi-hot-key form of
  * [[MgTopOne]] (VERDICT r17 item 7: a feed with TWO comparable hot
  * sites must surface both so the skew plan can weigh their SUMMED
  * share, not just the winner's). Same guarantee: any key with share
  * > 1/k is retained, so every decision-relevant hot key appears;
  * near-tie tail items may be approximate, which the exact sum-when
  * re-count downstream resolves. Empty/all-null group returns an empty
  * array. Registered as SQL function `graft_mg_topk`.
  */
case class MgTopK(
    child: Expression,
    k: Int,
    topN: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends MgSummaryAgg {

  require(k >= 2, s"graft_mg_topk: k must be at least 2, got $k")
  require(topN >= 1 && topN <= k - 1,
    s"graft_mg_topk: topN must be in 1..${k - 1}, got $topN")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_mg_topk"

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      ranked(buf).take(topN).map(UTF8String.fromString).toArray[Any])

  override def withNewMutableAggBufferOffset(newOffset: Int): MgTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgTopK =
    copy(child = newChild)
}
