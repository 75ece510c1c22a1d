package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** G3 — the reference's arbitrary-function global-aggregate surface.
  *
  * Reference (`/root/reference/src/dataframe.py:207-212`): `DataFrame.agg`
  * takes ANY `Callable[[List], Any]` and applies it to the whole column —
  * its entire UDF/UDAF surface. A literal port (collect the column to the
  * driver, apply a closure) is the #1 scale anti-pattern, so the Spark
  * mapping is the typed `Aggregator[IN, BUF, OUT]`: the caller supplies the
  * same arbitrary logic decomposed into (zero, reduce, merge, finish), and
  * Spark runs it DISTRIBUTED — partial buffers map-side, one shuffle of
  * buffers, never of rows. Any reference callable that is a fold (all the
  * practical ones) transliterates directly; a non-decomposable callable has
  * no scalable equivalent in ANY engine.
  *
  * [[fromFold]] builds the Aggregator from plain closures — the
  * arbitrary-"callable" entry point; [[midrange]] / [[spread]] / [[geomean]]
  * are worked examples used by the oracle queries and tests.
  */
object CustomAgg {

  /** Build a typed Aggregator over a double column from fold closures.
    * Nulls are skipped before `red` (matching the reference's numeric-only
    * filter, `dataframe.py:48`).
    */
  def fromFold[B: Encoder](z: B,
                           red: (B, Double) => B,
                           mrg: (B, B) => B,
                           fin: B => Option[Double]): Aggregator[java.lang.Double, B, Option[Double]] =
    new Aggregator[java.lang.Double, B, Option[Double]] {
      override def zero: B = z
      override def reduce(b: B, a: java.lang.Double): B =
        if (a == null) b else red(b, a.doubleValue())
      override def merge(b1: B, b2: B): B = mrg(b1, b2)
      override def finish(b: B): Option[Double] = fin(b)
      override def bufferEncoder: Encoder[B] = implicitly[Encoder[B]]
      override def outputEncoder: Encoder[Option[Double]] = ExpressionEncoder[Option[Double]]()
    }

  private implicit val bufEnc: Encoder[(Double, Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaLong)

  /** Midrange = (min + max) / 2. Order-independent (exact across engines). */
  val midrange: Aggregator[java.lang.Double, (Double, Double, Long), Option[Double]] =
    fromFold[(Double, Double, Long)](
      z = (Double.PositiveInfinity, Double.NegativeInfinity, 0L),
      red = { case ((lo, hi, n), v) => (math.min(lo, v), math.max(hi, v), n + 1) },
      mrg = { case ((l1, h1, n1), (l2, h2, n2)) => (math.min(l1, l2), math.max(h1, h2), n1 + n2) },
      fin = { case (lo, hi, n) => if (n == 0) None else Some((lo + hi) / 2.0) })

  /** Spread = max - min. Order-independent (exact across engines). */
  val spread: Aggregator[java.lang.Double, (Double, Double, Long), Option[Double]] =
    fromFold[(Double, Double, Long)](
      z = (Double.PositiveInfinity, Double.NegativeInfinity, 0L),
      red = { case ((lo, hi, n), v) => (math.min(lo, v), math.max(hi, v), n + 1) },
      mrg = { case ((l1, h1, n1), (l2, h2, n2)) => (math.min(l1, l2), math.max(h1, h2), n1 + n2) },
      fin = { case (lo, hi, n) => if (n == 0) None else Some(hi - lo) })

  /** Geometric mean of positive values = exp(avg(ln x)) — a fold the
    * reference would write as a lambda over the column list.
    */
  val geomean: Aggregator[java.lang.Double, (Double, Double, Long), Option[Double]] =
    fromFold[(Double, Double, Long)](
      z = (0.0, 0.0, 0L),
      red = { case ((s, u, n), v) => if (v > 0) (s + math.log(v), u, n + 1) else (s, u, n) },
      mrg = { case ((s1, u1, n1), (s2, u2, n2)) => (s1 + s2, u1 + u2, n1 + n2) },
      fin = { case (s, _, n) => if (n == 0) None else Some(math.exp(s / n)) })

  /** Column form of an Aggregator over a (nullable) double column. */
  def asColumn(agg: Aggregator[java.lang.Double, _, Option[Double]], c: Column): Column =
    udaf(agg, Encoders.DOUBLE).apply(c.cast("double"))

  /** Global aggregate with arbitrary fold functions — the reference's
    * `DataFrame.agg({col: callable})` surface, distributed. Output columns
    * named `{name}_{col}` per the reference convention.
    */
  def customGlobalAgg(df: DataFrame,
                      spec: Seq[(String, String, Aggregator[java.lang.Double, _, Option[Double]])]): DataFrame = {
    require(spec.nonEmpty, "customGlobalAgg: empty spec")
    val exprs = spec.map { case (name, c, agg) => asColumn(agg, col(c)).as(s"${name}_$c") }
    df.agg(exprs.head, exprs.tail: _*)
  }

  /** Grouped form of [[customGlobalAgg]]: the same arbitrary fold functions
    * per group key — beyond the reference's global-only surface
    * (`dataframe.py:207-212`), but the natural composition once groupBy
    * exists. The `udaf` columns run DISTRIBUTED exactly like the global
    * form: partial buffers map-side per (partition, group), one shuffle of
    * buffers keyed by group. Null group keys form their own group (G1
    * semantics, matching [[Agg.groupAgg]]).
    */
  def customGroupAgg(df: DataFrame, keys: Seq[String],
                     spec: Seq[(String, String, Aggregator[java.lang.Double, _, Option[Double]])]): DataFrame = {
    require(keys.nonEmpty, "customGroupAgg: empty keys (use customGlobalAgg)")
    require(spec.nonEmpty, "customGroupAgg: empty spec")
    val exprs = spec.map { case (name, c, agg) => asColumn(agg, col(c)).as(s"${name}_$c") }
    df.groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }
}
