package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (Test / fork := true →
  * a single forked JVM runs all suites; per-suite sessions would pay ~5 s
  * of SparkContext startup each).
  */
object TestSpark {
  lazy val spark: SparkSession = Session.get(cores = 4)
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Rows of a single-column result as a sorted list (order-insensitive). */
  def sortedSeq[T](xs: Seq[T])(implicit ord: Ordering[T]): Seq[T] = xs.sorted

  def approx(a: Double, b: Double, eps: Double = 1e-9): Boolean = math.abs(a - b) <= eps
}
