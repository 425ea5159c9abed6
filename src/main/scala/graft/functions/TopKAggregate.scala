package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k as a typed imperative aggregate — the one "below the public
  * API" piece SURVEY.md §4 deferred from round 1.
  *
  * Why an aggregate instead of `row_number() OVER (PARTITION BY g ORDER BY s
  * DESC) <= k` (the [[graft.ops.Windows]] version, `q_win_topk_per_group`):
  * the window plan shuffles EVERY row to its group's partition and sorts the
  * whole partition, O(n log n) per group and O(n) network. This aggregate
  * keeps an O(k) heap per group, combines map-side (ObjectHashAggregate with
  * a partial_ phase), and ships only k pairs per group across the shuffle —
  * at 100 TB that is the difference between moving the table and moving the
  * answer. Results are deterministic: rank by (score DESC, id ASC).
  *
  * SQL: `topk_pairs(score, id, k)` → `array<struct<score:double,id:bigint>>`
  * sorted by the rank order ([[TopKFunctions.registerOn]]).
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // type-check at analysis time: without this, a wrong-typed argument (e.g.
  // an integer score column) passes the analyzer and dies mid-task with a
  // ClassCastException in update() instead of a proper AnalysisException
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs score must be DOUBLE, got ${scoreExpr.dataType.sql}")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs id must be BIGINT, got ${idExpr.dataType.sql}")
    else if (!kExpr.foldable ||
        (kExpr.dataType != IntegerType && kExpr.dataType != LongType))
      TypeCheckResult.TypeCheckFailure("topk_pairs k must be an INT literal")
    else kExpr.eval(InternalRow.empty) match {
      // value check at analysis time: k <= 0 would silently return empty
      // arrays for every group, NULL would throw mid-task in update(), and
      // a BIGINT above Int.MaxValue would truncate in toInt — back to the
      // silent-empty behavior this check exists to prevent
      case i: Int if i > 0 => TypeCheckResult.TypeCheckSuccess
      case l: Long if l > 0 && l <= Int.MaxValue => TypeCheckResult.TypeCheckSuccess
      case null => TypeCheckResult.TypeCheckFailure("topk_pairs k must not be NULL")
      case v => TypeCheckResult.TypeCheckFailure(
        s"topk_pairs k must be a positive INT-range value, got $v")
    }
  }

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"topk_pairs k: $other")
  }

  // head of the queue = the WORST retained pair (lowest score, then largest
  // id), so exceeding k is fixed by one dequeue()
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by { case (s, id) => (-s, id) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null) {
      buf.enqueue((s.asInstanceOf[Double], id.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { p => b1.enqueue(p); if (b1.size > k) b1.dequeue() }
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toSeq.sortBy { case (s, id) => (-s, id) }
    new GenericArrayData(sorted.map { case (s, id) => InternalRow(s, id) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, id) => out.writeDouble(s); out.writeLong(id) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}

object TopKFunctions {
  /** Register `topk_pairs(score double, id bigint, k const)`; idempotent. */
  def registerOn(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_pairs",
      exprs => TopKPairs(exprs(0), exprs(1), exprs(2)),
      "built-in")
}
