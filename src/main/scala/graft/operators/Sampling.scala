package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reproducible corpus sampling for training-data pipelines.
  *
  * `rand()`-based sampling is nondeterministic across runs, engines, and
  * task retries — useless for reproducible dataset construction. These
  * samplers decide membership from an md5-derived 60-bit hash of the row's
  * id plus a seed: the same (id, seed) is kept or dropped identically on
  * any engine with an md5 (oracle-checkable in SQL), under any
  * partitioning, on any retry. Embarrassingly parallel — a narrow filter,
  * no shuffle, pushed work is one hash per row.
  */
object Sampling {

  private val HashSpace = 1L << 60

  /** Keep ~`fraction` of rows, decided by hash(id, seed). */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          seed: Long = 0L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    val threshold = (BigDecimal(fraction) * BigDecimal(HashSpace)).toLong
    df.filter(
      Text.tokenHash60(concat(col(idCol).cast("string"), lit(s"_$seed"))) < threshold)
  }

  /** Fixed-size per-group quota sample: the `k` rows of each group with the
    * smallest id-hash (ties broken by id) — "keep 10k docs per language"
    * corpus balancing. Deterministic and engine-portable like the fraction
    * samplers: membership is a pure function of (id, seed, k). One shuffle
    * to co-locate groups, per-group sort of hashes; groups are the
    * parallelism unit (same shape as sessionization — fine when groups are
    * many, the corpus-balancing case).
    */
  def quotaSample(df: DataFrame, idCol: String, groupCol: String, k: Int,
                  seed: Long = 0L): DataFrame = {
    require(k >= 1, "quotaSample: k must be >= 1")
    val h = Text.tokenHash60(concat(col(idCol).cast("string"), lit(s"_q$seed")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("_qrn", row_number().over(w))
      .filter(col("_qrn") <= k)
      .drop("_qrn")
  }

  /** Stratified variant: per-stratum keep fractions (e.g. per-language
    * corpus balancing). Strata absent from the map are dropped.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double], seed: Long = 0L): DataFrame = {
    require(fractions.nonEmpty, "stratifiedSample: empty fractions")
    val h = Text.tokenHash60(concat(col(idCol).cast("string"), lit(s"_$seed")))
    val threshold = fractions.foldLeft(lit(-1L)) { case (acc, (stratum, f)) =>
      when(col(stratumCol) === stratum,
        lit((BigDecimal(f) * BigDecimal(HashSpace)).toLong)).otherwise(acc)
    }
    df.filter(h < threshold)
  }
}
