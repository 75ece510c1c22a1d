package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.{graftshim => shim}

/** SURVEY §7.3's documented opt-in: EXACT median as a Catalyst
  * `TypedImperativeAggregate` — the escape hatch for "exact + scale both
  * demanded" in the aggregate family (built-in `median` is the default at
  * test scale, `approx_percentile` the sketch for 100 TB; this closes the
  * remaining corner).
  *
  * Buffer = a (value → count) hash map, so memory is O(DISTINCT values per
  * group), not O(rows): a 10-billion-row group over cent-quantized prices
  * or integer quantities carries a few thousand map entries per partial
  * buffer, and the shuffle moves those counts, never rows (the same
  * partial/merge shape as the built-in `percentile`'s internal counts map —
  * here as the documented, user-extensible Catalyst form). True exact
  * median over UNBOUNDED-cardinality doubles is inherently O(distinct) in
  * one pass in any engine; when distinct ≈ rows, that is the price of
  * exactness — use the approx sketch instead.
  *
  * Semantics match built-in `median`/DuckDB `median` exactly: nulls
  * skipped, empty → null, odd n → the middle value, even n →
  * `lo + (hi - lo) / 2.0` — the same interpolation form Spark's
  * `Percentile` and DuckDB `quantile_cont` evaluate, so the even case is
  * bit-identical to both engines (and immune to the `(lo + hi)` overflow
  * corner when both middles exceed MaxDouble/2).
  *
  * Memory note under graft sessions: Session raises
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` to 2048
  * (sized for graft's BOUNDED sketch buffers), so a task can hold up to
  * 2048 of these maps before sort fallback. On high-cardinality groupings
  * over high-diversity values, bracket the executing action with
  * `Session.withConf(spark, "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "128")(...)`
  * to restore the early (slow-but-safe) sort fallback.
  */
case class ExactMedianAgg(child: Expression,
                          override val mutableAggBufferOffset: Int = 0,
                          override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Double, java.lang.Long]]
  with UnaryLike[Expression] {

  type Buf = java.util.HashMap[java.lang.Double, java.lang.Long]

  override def prettyName: String = "exact_median"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val k = java.lang.Double.valueOf(v.asInstanceOf[Double])
      val prev = buf.get(k)
      buf.put(k, java.lang.Long.valueOf(if (prev == null) 1L else prev.longValue() + 1L))
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.forEach { (k: java.lang.Double, v: java.lang.Long) =>
      val prev = b1.get(k)
      b1.put(k, java.lang.Long.valueOf(
        if (prev == null) v.longValue() else prev.longValue() + v.longValue()))
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    if (buf.isEmpty) null
    else {
      val m = buf.size()
      val keys = new Array[Double](m)
      val it = buf.keySet().iterator()
      var i = 0
      while (it.hasNext) { keys(i) = it.next().doubleValue(); i += 1 }
      java.util.Arrays.sort(keys)
      var n = 0L
      buf.values().forEach((v: java.lang.Long) => n += v.longValue())
      // 0-based middle indices: odd n → both are (n-1)/2; even n → n/2-1, n/2
      val loIdx = (n - 1) / 2
      val hiIdx = n / 2
      var cum = 0L
      var lo = Double.NaN
      var hi = Double.NaN
      var j = 0
      while (j < m && cum <= hiIdx) {
        val c = buf.get(java.lang.Double.valueOf(keys(j))).longValue()
        if (cum <= loIdx && loIdx < cum + c) lo = keys(j)
        if (cum <= hiIdx && hiIdx < cum + c) hi = keys(j)
        cum += c
        j += 1
      }
      // lo + (hi-lo)/2 is the interpolation both reference engines compute
      // for the even case ((lo+hi)/2 can differ in the last ulp and
      // overflows to +inf when both middles exceed MaxDouble/2)
      lo + (hi - lo) / 2.0
    }
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size())
    buf.forEach { (k: java.lang.Double, v: java.lang.Long) =>
      out.writeDouble(k.doubleValue()); out.writeLong(v.longValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(storage))
    val size = in.readInt()
    val buf = new Buf(math.max(16, size * 2))
    var i = 0
    while (i < size) {
      buf.put(java.lang.Double.valueOf(in.readDouble()),
        java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactMedianAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactMedianAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ExactMedianAgg =
    copy(child = newChild)
}

object ExactMedian {
  /** Column form: `exactMedian(col)` — exact median of a numeric column
    * with an O(distinct-values) counts-map buffer. Parity with built-in
    * `median` pinned in AggSpec; grouped-aggregate oracle row
    * `g9_exact_median`.
    */
  def exactMedian(c: Column): Column =
    shim.toColumn(ExactMedianAgg(shim.toExpression(c.cast("double"))).toAggregateExpression())
}
