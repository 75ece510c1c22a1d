package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, LongType}

/** Intersection size of two SORTED `array<bigint>` columns via a two-pointer
  * merge — O(|a|+|b|), no allocation, whole-stage codegen.
  *
  * This is the exact-verify kernel for the set-similarity operators
  * (`Dedup.ngramJaccardPairs` / `minhashNearDups`): documents are reduced
  * once to sorted arrays of 8-byte shingle hashes, and every candidate pair
  * is verified with this merge instead of `array_intersect` on string
  * arrays (which hashes and allocates per call). Inputs MUST be sorted
  * ascending (`array_sort` at set-build time); duplicates count once per
  * matched occurrence on both sides.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements(); val n2 = y.numElements()
    var i = 0; var j = 0; var cnt = 0L
    while (i < n1 && j < n2) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { cnt += 1; i += 1; j += 1 }
    }
    cnt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n1 = $a.numElements(); int $n2 = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $n1 && $j < $n2) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $cnt++; $i++; $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ArrayOps {
  /** Column API: intersection size of two sorted `array<bigint>` columns. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    graftshim.toColumn(SortedIntersectSize(graftshim.toExpression(a), graftshim.toExpression(b)))

  /** `explode` for computed arrays whose ELEMENTS are never null (shingle
    * hashes, split tokens, band structs — every hot explode input in this
    * library): `explode_outer` + drop the null row, which is semantically
    * identical to `explode` for such arrays (empty/null arrays emit one
    * null row, immediately dropped) but immune to Catalyst's
    * `InferFiltersFromGenerate`. That rule turns `Generate(explode(e))`
    * into `Filter(size(e) > 0 AND isnotnull(e))` below the generate, and
    * predicate pushdown then inlines the array's full defining expression
    * through every Project — the computed array is evaluated THREE times
    * per row, twice inside a non-codegen Filter (measured 70× on the
    * trigram-shingle explode at 100×; see `Session`'s exclusion note).
    * graft-built sessions exclude the rule globally; this shape keeps the
    * operators fast under sessions graft did not build. Do NOT use when
    * array elements can be null — those rows would be dropped.
    */
  def explodeDense(df: org.apache.spark.sql.DataFrame, keep: Seq[Column],
                   arr: Column, as: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, explode_outer}
    df.select(keep :+ explode_outer(arr).as(as): _*).filter(col(as).isNotNull)
  }
}
