package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact top-k-per-group as a real AGGREGATE, not a window.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY s DESC)` shuffles the
  * ENTIRE input to rank it and caps parallelism at the number of
  * groups — fine when the window input is already small, a scale
  * hazard when it isn't (few groups x huge input = one task per
  * group sorting everything). As a TypedImperativeAggregate the
  * same result costs one hash aggregate: each map task keeps a
  * k-bounded heap per group, the shuffle moves at most k rows per
  * (group, partition), and the merge is heap-union. Spark has no
  * native top-k aggregate; this is the standard bounded-state
  * design (e.g. Spark's own ApproximatePercentile buffer pattern).
  *
  * Rank order is the TOTAL order (score DESC, payload ASC) — ties
  * cannot make the result partitioning-dependent, so the aggregate
  * is deterministic and safe for hash-compared gates.
  *
  * Output: ARRAY<STRUCT<payload STRING, score DOUBLE>> sorted
  * best-first; callers posexplode for (rank, payload, score) rows.
  */
case class TopKByScore(
    score: Expression,
    payload: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k >= 1, "topKByScore needs k >= 1")

  override def left: Expression = score
  override def right: Expression = payload
  override def prettyName: String = "graft_topk_by_score"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, payload.dataType) match {
      case (DoubleType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (s, p) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (DOUBLE score, STRING payload), got ($s, $p) — cast explicitly")
    }
  override def dataType: DataType = ArrayType(
    new StructType().add("payload", StringType).add("score", DoubleType),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val p = payload.eval(input)
    // Rows with a null score or payload are EXCLUDED from the ranking.
    // NB this deliberately DIFFERS from `row_number() OVER (ORDER BY s
    // DESC, p ASC)`, where SQL null ordering would rank them (nulls
    // LAST for s DESC, FIRST for p ASC): an output row with a null key
    // is useless to every current caller. Callers wanting SQL null
    // ordering must coalesce() their inputs first.
    if (s != null && p != null) {
      buf.offer(s.asInstanceOf[Double], p.asInstanceOf[UTF8String])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach((s, p) => buf.offer(s, p, copied = true))
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = buf.sortedBest.map { case (s, p) =>
      InternalRow(p, s)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (s, p) =>
      out.writeDouble(s)
      val bytes = p.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.offer(s, UTF8String.fromBytes(b), copied = true)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, payload = newRight)
}

/** k-bounded buffer: a binary heap ordered worst-first under the total
  * rank order (score ASC, payload DESC), so `peek()` is the next
  * eviction. A heap, not a TreeSet: equal (score, payload) pairs are
  * distinct rows and must each occupy a rank, exactly as the window
  * formulation ranks them. Payload strings are COPIED on insert
  * (`update` hands us pointers into a reused scan row buffer).
  */
final class TopKBuffer(k: Int) {
  // worst-first: lower score first; equal scores put the LATER payload
  // first (payload DESC) because rank ties prefer the smaller payload
  private val heap = new java.util.PriorityQueue[(Double, UTF8String)](k,
    new java.util.Comparator[(Double, UTF8String)] {
      override def compare(a: (Double, UTF8String), b: (Double, UTF8String)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else b._2.compareTo(a._2)
      }
    })

  def size: Int = heap.size()

  def offer(s: Double, p: UTF8String, copied: Boolean = false): Unit = {
    if (heap.size() < k) {
      heap.add((s, if (copied) p else p.copy()))
    } else {
      val worst = heap.peek()
      // strictly better than the current worst under (score DESC,
      // payload ASC). Double.compare, not primitive >/==: primitives
      // make NaN incomparable (silently dropped here, ranked FIRST by
      // the window's s DESC), where Double.compare orders NaN above
      // every value — consistent with Spark's sort order for doubles.
      val c = java.lang.Double.compare(s, worst._1)
      val better = c > 0 || (c == 0 && p.compareTo(worst._2) < 0)
      if (better) {
        heap.poll()
        heap.add((s, if (copied) p else p.copy()))
      }
    }
  }

  def foreach(f: (Double, UTF8String) => Unit): Unit = {
    val it = heap.iterator()
    while (it.hasNext) { val e = it.next(); f(e._1, e._2) }
  }

  /** Best-first (score DESC, payload ASC) — the emit order. Double
    * .compare keeps the comparator a total order under NaN (primitive
    * !=/> on NaN violates the sort contract and can throw in TimSort).
    */
  def sortedBest: Seq[(Double, UTF8String)] = {
    val arr = heap.toArray(new Array[(Double, UTF8String)](heap.size()))
    arr.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c > 0 else a._2.compareTo(b._2) < 0
    }.toSeq
  }
}

object TopKAgg {
  /** `topKByScore(score, payload, k)` aggregate column: the k best
    * (score DESC, payload ASC) pairs per group as a sorted array.
    */
  def topKByScore(score: Column, payload: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TopKByScore(
        org.apache.spark.sql.graftbridge.Bridge.expression(score),
        org.apache.spark.sql.graftbridge.Bridge.expression(payload),
        k).toAggregateExpression())
}
