package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{graftshim => shim}
import org.apache.spark.unsafe.types.UTF8String

/** Heavy hitters with BOUNDED state: Apache DataSketches frequent-items
  * (Misra–Gries / space-saving family) as a Catalyst
  * `TypedImperativeAggregate` — the top-terms question t7 answers with a
  * vocab-sized exchange, answered instead with a fixed-size mergeable
  * sketch. At 100 TB the distinct-token space is billions of entries; the
  * exact groupBy's exchange is vocabulary-sized, while this buffer is
  * ≤ `maxMapSize` entries per partial NO MATTER the cardinality, the
  * shuffle moves one sketch image per partition, and merge is the sketch's
  * own combine — the same bounded-state contract as the x10c HLL distinct
  * state, here for the frequency question.
  *
  * Guarantee (the published Misra–Gries bound): with map size m, every
  * estimate satisfies `lb ≤ true ≤ ub` with `ub − lb ≤ ε·N` for
  * ε = 3.5/m ([[ItemsSketch.getEpsilon]]), and `NO_FALSE_NEGATIVES`
  * returns EVERY item whose true count exceeds the sketch's maximum error
  * (≤ ε·N a-priori). Estimates themselves are stream-order-dependent —
  * never hash-gate them; gate the bound, e8d-style (the `t27` row emits
  * exact counts plus a driver-asserted `within_tol`).
  */
object FreqItems {

  private def serde = new ArrayOfStringsSerDe()

  /** The published a-priori error fraction for a given map size (3.5/m) —
    * exposed so callers and oracles use the sketch's own constant.
    */
  def epsilon(maxMapSize: Int): Double = ItemsSketch.getEpsilon(maxMapSize)

  /** Aggregate a string column into a frequent-items sketch image
    * (binary). One fixed-size buffer per partial; map-side combine.
    */
  def freqSketch(c: Column, maxMapSize: Int): Column =
    shim.toColumn(FreqSketchAgg(shim.toExpression(c.cast("string")),
      maxMapSize).toAggregateExpression())

  /** Merge previously materialized sketch images (binary) — the state
    * fold for sharded/daily heavy-hitter states (the x10b lifecycle
    * shape): union of per-shard sketches ≡ the one-pass sketch's bounds.
    */
  def freqSketchUnion(c: Column, maxMapSize: Int): Column =
    shim.toColumn(FreqSketchUnionAgg(shim.toExpression(c),
      maxMapSize).toAggregateExpression())

  /** Decode a sketch image to its `NO_FALSE_NEGATIVES` frequent-items
    * list: `array<struct<token,estimate,lower,upper>>`, ordered (estimate
    * desc, token asc). Runs on ≤ |groups| rows — decode is not a hot path.
    */
  def freqItems(c: Column): Column =
    shim.toColumn(FreqSketchItems(shim.toExpression(c)))

  private[functions] def deser(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  private[functions] def ser(sk: ItemsSketch[String]): Array[Byte] =
    sk.toByteArray(serde)
}

/** Frequent-items sketch over raw string values. Buffer = the sketch
  * itself (≤ maxMapSize entries, power of 2 per the DataSketches
  * contract); output = its serialized image.
  */
case class FreqSketchAgg(child: Expression, maxMapSize: Int,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    "freq_sketch: maxMapSize must be a power of 2, >= 8")

  // SQL path safety: the registry builder passes raw args — reject
  // non-string input at ANALYSIS time instead of the executor throwing
  // ClassCastException mid-job (round-13 self-review; the SQL builder
  // also casts, this is the backstop for direct Expression construction)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch expects STRING input, got ${child.dataType.catalogString}")

  override def prettyName: String = "freq_sketch"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(b1: ItemsSketch[String], b2: ItemsSketch[String]): ItemsSketch[String] =
    b1.merge(b2)

  override def eval(buf: ItemsSketch[String]): Any = FreqItems.ser(buf)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] = FreqItems.ser(buf)
  override def deserialize(storage: Array[Byte]): ItemsSketch[String] =
    FreqItems.deser(storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

/** Union of materialized sketch images: each input row is a serialized
  * sketch; the buffer folds them with the sketch's own merge.
  */
case class FreqSketchUnionAgg(child: Expression, maxMapSize: Int,
                              override val mutableAggBufferOffset: Int = 0,
                              override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    "freq_sketch_union: maxMapSize must be a power of 2, >= 8")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_union expects BINARY sketch images, got ${child.dataType.catalogString}")

  override def prettyName: String = "freq_sketch_union"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.merge(FreqItems.deser(v.asInstanceOf[Array[Byte]]))
    else buf
  }

  override def merge(b1: ItemsSketch[String], b2: ItemsSketch[String]): ItemsSketch[String] =
    b1.merge(b2)

  override def eval(buf: ItemsSketch[String]): Any = FreqItems.ser(buf)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] = FreqItems.ser(buf)
  override def deserialize(storage: Array[Byte]): ItemsSketch[String] =
    FreqItems.deser(storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchUnionAgg =
    copy(child = newChild)
}

/** Sketch image → `NO_FALSE_NEGATIVES` frequent-items list. Eval-only
  * (CodegenFallback): runs once per group row, never in a per-input hot
  * path, so codegen would buy nothing.
  */
case class FreqSketchItems(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_items expects a BINARY sketch image, got ${child.dataType.catalogString}")

  override def prettyName: String = "freq_sketch_items"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lower", LongType, nullable = false),
    StructField("upper", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val sk = FreqItems.deser(input.asInstanceOf[Array[Byte]])
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
    new GenericArrayData(rows.map { r =>
      val out = new GenericInternalRow(4)
      out.update(0, UTF8String.fromString(r.getItem))
      out.setLong(1, r.getEstimate)
      out.setLong(2, r.getLowerBound)
      out.setLong(3, r.getUpperBound)
      out: Any
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FreqSketchItems =
    copy(child = newChild)
}
