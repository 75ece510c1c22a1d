package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core relational operators with the reference's edge semantics.
  *
  * Everything here is a thin, declarative combinator over `Dataset` — the
  * plan stays lazy so Catalyst can push filters/projections into the scan
  * and whole-stage-codegen the pipeline. No operator in this file causes a
  * shuffle except [[sortValues]]/[[distinctSorted]] (global sort) — by
  * design: filters and projections must stay narrow at 100 TB.
  */
object Ops {

  /** F1 — WHERE. The reference takes a materialized boolean mask
    * (`/root/reference/src/dataframe.py:155-173`); here the predicate is a
    * Column expression so Catalyst can push it into the parquet/CSV scan
    * (visible as `PushedFilters` in `.explain`).
    */
  def filter(df: DataFrame, predicate: Column): DataFrame = df.filter(predicate)

  /** P1 — SELECT with drop-missing semantics: requested names not present
    * are silently dropped (`/root/reference/src/dataframe.py:139-153`);
    * empty request or nothing present is an error.
    */
  def select(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "select: empty column list")
    val present = columns.filter(df.columns.toSet)
    require(present.nonEmpty, s"select: none of ${columns.mkString(",")} exist")
    df.select(present.map(col): _*)
  }

  /** O1 — single-key stable sort with the reference's null placement:
    * ascending → nulls LAST, descending → nulls FIRST
    * (`/root/reference/src/dataframe.py:175-184` sorts on `(is None, v)`).
    * Note these are the OPPOSITE of Spark's defaults, hence the explicit
    * variants. Spark's sort is a range-partitioned distributed sort — no
    * single-node bottleneck at scale.
    */
  def sortValues(df: DataFrame, by: String, ascending: Boolean = true): DataFrame =
    df.orderBy(if (ascending) col(by).asc_nulls_last else col(by).desc_nulls_first)

  /** A2 — IS NOT NULL filter (`/root/reference/app.py:117-120`). */
  def dropNullRows(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNotNull)

  /** A4 — IN-set membership (`/root/reference/app.py:388`). */
  def isInSet(df: DataFrame, column: String, values: Seq[Any]): DataFrame =
    df.filter(col(column).isin(values: _*))

  /** A5 — BETWEEN range filter (`/root/reference/app.py:296-299`). */
  def between(df: DataFrame, column: String, lo: Any, hi: Any): DataFrame =
    df.filter(col(column).between(lit(lo), lit(hi)))

  /** A6 — distinct dimension values, sorted (`/root/reference/app.py:143`).
    * Partial (map-side) distinct happens before the shuffle, so the
    * exchange carries only unique values per partition.
    */
  def distinctSorted(df: DataFrame, column: String): DataFrame =
    df.select(column).distinct().orderBy(col(column).asc_nulls_last)

  /** A12 — LIMIT (`/root/reference/app.py:399-402`). Spark plans a
    * LocalLimit-per-partition + single GlobalLimit — no full materialize.
    */
  def limit(df: DataFrame, n: Int): DataFrame = df.limit(n)

  /** A12 variant — deterministic top-N: total order (with unique tiebreak
    * column supplied by the caller) then limit. Spark executes as
    * TakeOrderedAndProject — a per-partition top-N heap + driver merge,
    * never a full global sort.
    */
  def topN(df: DataFrame, n: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(n)

  /** A13 — rename (`/root/reference/app.py:178-184`). */
  def rename(df: DataFrame, mapping: (String, String)*): DataFrame =
    mapping.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** A1 — required-column schema validation (`/root/reference/app.py:86-115`). */
  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.toSet)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(",")}")
    df
  }

  // Set operations — absent from the reference (SURVEY §2.3 scope
  // boundary) but part of the complete relational surface this library
  // ships. All three are SET semantics (DISTINCT), matching SQL
  // UNION/INTERSECT/EXCEPT. unionAll is the multiset form (SQL UNION ALL)
  // — a zero-shuffle concatenation of partitions.

  def union(a: DataFrame, b: DataFrame): DataFrame = a.union(b).distinct()

  def unionAll(a: DataFrame, b: DataFrame): DataFrame = a.union(b)

  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)

  def except(a: DataFrame, b: DataFrame): DataFrame = a.except(b)

  /** X8 — snapshot diff: the primitive that drives INCREMENTAL
    * reprocessing. Given yesterday's and today's snapshot of a keyed
    * table, emit only the delta: keys present only in `newDf` (`added`),
    * only in `oldDf` (`removed`), or in both with differing content
    * (`changed`). Unchanged rows are not emitted — downstream stages
    * (re-embedding, re-indexing, re-scoring) consume the delta instead of
    * the full corpus.
    *
    * Scale shape: each side reduces to (key, 16-byte md5 fingerprint of
    * the content columns) BEFORE the full-outer join, so the exchange
    * carries ~24 bytes/row regardless of document size — diffing two
    * 100 TB snapshots shuffles GBs, not TBs. One shuffle per side keyed
    * by `idCol` (zero if both snapshots are bucketed on the key).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "snapshotDiff: empty content column list")
    def fp(df: DataFrame) =
      md5(concat_ws("\u0001", contentCols.map(df(_)): _*))
    val o = oldDf.select(col(idCol), fp(oldDf).as("_ofp"))
    val n = newDf.select(col(idCol), fp(newDf).as("_nfp"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_ofp").isNull, "added")
          .when(col("_nfp").isNull, "removed")
          .when(col("_ofp") =!= col("_nfp"), "changed")
          .as("change"))
      .where(col("change").isNotNull)
  }

  /** X8c — apply a keyed changeset: the CONSUMER of [[snapshotDiff]]'s
    * delta. `changes` carries (idCol, change ∈ added|removed|changed,
    * content columns matching `base`); the result is base with removed
    * keys dropped, changed keys replaced, added keys inserted — i.e.
    * yesterday's snapshot + the delta reconstructs today's, which is how
    * a 100 TB corpus consumes an upstream revision without receiving the
    * full new copy.
    *
    * Scale shape: ONE join, with the changeset referenced ONCE — an
    * anti-join + union formulation would plant the (possibly expensive)
    * delta subtree in the plan twice, and Spark does not dedupe common
    * subplans without a materialization (measured on the x8c gate: the
    * whole diff ran twice). A full outer on the key decides each row in
    * place: no changeset match → base row passes; removed → dropped;
    * added/changed → the delta's content wins. The changeset is
    * delta-sized, so the join typically broadcasts (left outer is enough
    * when the delta is pre-filtered to known keys, but full outer also
    * surfaces 'added' keys, which have no base row); base content crosses
    * the usual one keyed exchange at most — zero with catalog-bucketed
    * inputs, as in the x8b diff.
    */
  def applyChangeset(base: DataFrame, changes: DataFrame, idCol: String): DataFrame = {
    require(changes.columns.contains("change"), "applyChangeset: missing change column")
    val contentCols = base.columns.toIndexedSeq
    val renamed = changes.select(col(idCol) +: col("change") +:
      contentCols.filterNot(_ == idCol).map(c => col(c).as(s"_new_$c")): _*)
    base.join(renamed, Seq(idCol), "full_outer")
      .filter(col("change").isNull || col("change") =!= "removed")
      .select(contentCols.map { c =>
        if (c == idCol) col(c)
        else when(col("change").isNotNull, col(s"_new_$c")).otherwise(col(c)).as(c)
      }: _*)
  }

  /** X9 — declarative data-quality expectations over a corpus, evaluated
    * in ONE aggregate pass (the ingest gate a 100 TB pipeline runs before
    * accepting a batch — the "expectations" pattern of data-validation
    * frameworks, expressed as conditional sums). Two rule shapes:
    *   - row rules: a boolean Column; a row violates when the predicate is
    *     false OR null (SQL three-valued logic would otherwise let a null
    *     slip past both the rule and its negation);
    *   - uniqueness rules: a column name; violations = non-null rows minus
    *     distinct values (0 ⇔ unique).
    * Output is long-format (rule, violations, n_rows) — one row per rule.
    *
    * Scale shape: every rule folds into the SAME single aggregate
    * (conditional sums partial-aggregate map-side; distinct counts ride
    * the same Expand), so k rules cost one corpus scan, not k. The stack
    * to long format happens on the one-row result — driver-free,
    * corpus-free.
    */
  def expectations(df: DataFrame, rowRules: Seq[(String, Column)],
                   uniqueCols: Seq[String] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueCols.nonEmpty, "expectations: no rules")
    val names = rowRules.map(_._1) ++ uniqueCols.map(c => s"unique_$c")
    require(names.distinct.size == names.size, "expectations: duplicate rule names")
    require(names.forall(n => !n.contains("`")),
      "expectations: rule names must not contain backquotes")
    val aggs = count(lit(1)).as("_n") +:
      (rowRules.map { case (name, p) =>
        coalesce(sum(when(p.isNull || !p, 1L).otherwise(0L)), lit(0L)).as(s"_v_$name")
      } ++ uniqueCols.map { c =>
        (count(col(c)) - countDistinct(col(c))).as(s"_v_unique_$c")
      })
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = names
      .map(n => s"'${n.replace("'", "''")}', `_v_$n`").mkString(", ")
    row.select(
      expr(s"stack(${names.size}, $stackArgs) AS (rule, violations)"),
      col("_n").as("n_rows"))
  }
}
