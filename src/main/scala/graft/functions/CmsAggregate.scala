package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a typed imperative
  * aggregate — the streaming-sketch tier of the extension ladder beside
  * [[TopKPairs]]: CONSTANT state (depth×width longs) regardless of input
  * cardinality, map-side combined (ObjectHashAggregate partial_ phase),
  * merged by elementwise addition. At 100 TB the exact heavy-hitter count
  * (`groupBy(word)`) shuffles the vocabulary; the sketch ships 2 KB per
  * partition and never underestimates (est ≥ true is the CMS guarantee).
  *
  * The caller supplies each row's DEPTH bucket indices as an `array<int>`
  * column (md5-derived in [[graft.ops.Tokenize]]) rather than this class
  * hashing internally — keeping the hash definition in Column expressions
  * is what lets the DuckDB oracle reproduce the sketch cell-for-cell.
  *
  * SQL: `cms_sketch(buckets array<int>)` → `array<bigint>` of depth×width
  * cells, row-major (cell d·width+b = count of rows whose depth-d bucket
  * was b). Estimate of a key = min over d of its cells.
  */
case class CmsSketch(
    bucketsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import CmsSketch.{Depth, Width}

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    bucketsExpr.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_sketch buckets must be ARRAY<INT>, got ${other.sql}")
    }
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = bucketsExpr.eval(input).asInstanceOf[ArrayData]
    if (arr != null) {
      require(arr.numElements() == Depth,
        s"cms_sketch expects $Depth bucket indices, got ${arr.numElements()}")
      var d = 0
      while (d < Depth) {
        val b = arr.getInt(d)
        require(b >= 0 && b < Width, s"cms_sketch bucket $b outside [0, $Width)")
        buf(d * Width + b) += 1
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(Depth * Width)(in.readLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(bucketsExpr)
  override def withNewMutableAggBufferOffset(offset: Int): CmsSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(bucketsExpr = newChildren(0))
}

object CmsSketch {
  /** Sketch geometry — fixed so the oracle, the estimate reader, and the
    * aggregate can never disagree on cell addressing. */
  val Depth = 4
  val Width = 64
}

object CmsFunctions {
  /** Register `cms_sketch(buckets array<int>)`; idempotent. */
  def registerOn(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_sketch",
      exprs => CmsSketch(exprs.head),
      "built-in")
}
