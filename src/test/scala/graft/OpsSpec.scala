package graft

import graft.operators.Ops
import org.apache.spark.sql.functions._

/** F1/P1/O1/A-series edge semantics pinned to the reference. */
class OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1, Some("b")), (2, Some("a")), (3, None), (4, Some("c"))
  ).toDF("id", "s")

  test("select silently drops missing names, keeps present ones (dataframe.py:139-153)") {
    val out = Ops.select(df, Seq("id", "no_such_column"))
    assert(out.columns.toSeq == Seq("id"))
  }

  test("select errors when NO requested column exists or list is empty (dataframe.py:143,151)") {
    intercept[IllegalArgumentException](Ops.select(df, Seq("nope", "nada")))
    intercept[IllegalArgumentException](Ops.select(df, Seq.empty))
  }

  test("sort ascending puts nulls LAST — opposite of Spark's default (dataframe.py:180)") {
    val out = Ops.sortValues(df, "s").select("id").as[Int].collect().toSeq
    assert(out == Seq(2, 1, 4, 3), "null row must sort last ascending")
  }

  test("sort descending puts nulls FIRST (dataframe.py:180)") {
    val out = Ops.sortValues(df, "s", ascending = false).select("id").as[Int].collect().toSeq
    assert(out == Seq(3, 4, 1, 2), "null row must sort first descending")
  }

  test("dropNullRows keeps only non-null (app.py:117-120)") {
    assert(Ops.dropNullRows(df, "s").count() == 3)
  }

  test("isInSet membership (app.py:388)") {
    val out = Ops.isInSet(df, "s", Seq("a", "c")).select("id").as[Int].collect().toSet
    assert(out == Set(2, 4))
  }

  test("between is inclusive on both ends (app.py:296-299)") {
    val t = Seq(0, 5, 10, 15).toDF("v")
    val out = Ops.between(t, "v", 5, 10).as[Int].collect().toSet
    assert(out == Set(5, 10))
  }

  test("distinctSorted returns unique sorted values (app.py:143)") {
    val t = Seq("b", "a", "b", "c", "a").toDF("v")
    assert(Ops.distinctSorted(t, "v").as[String].collect().toSeq == Seq("a", "b", "c"))
  }

  test("topN is deterministic given a total order (app.py:399-402)") {
    val t = Seq((1, 5.0), (2, 5.0), (3, 9.0)).toDF("id", "v")
    val out = Ops.topN(t, 2, col("v").desc, col("id").asc).select("id").as[Int].collect().toSeq
    assert(out == Seq(3, 1), "tie on v broken by ascending id")
  }

  test("rename maps old to new names (app.py:178-184)") {
    assert(Ops.rename(df, "s" -> "name").columns.toSeq == Seq("id", "name"))
  }

  test("requireColumns passes when present, fails listing the missing (app.py:86-115)") {
    Ops.requireColumns(df, Seq("id", "s"))
    val e = intercept[IllegalArgumentException](Ops.requireColumns(df, Seq("id", "ghost")))
    assert(e.getMessage.contains("ghost"))
  }

  test("set operations use SET semantics; unionAll keeps duplicates") {
    val a = Seq(1, 2, 2, 3).toDF("v")
    val b = Seq(3, 4).toDF("v")
    assert(Ops.union(a, b).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    assert(Ops.unionAll(a, b).count() == 6)
    assert(Ops.intersect(a, b).as[Int].collect().toSeq == Seq(3))
    assert(Ops.except(a, b).as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("snapshotDiff: added/removed/changed only — unchanged rows never emitted (X8)") {
    val old = Seq((1L, "same"), (2L, "was this"), (3L, "gone")).toDF("id", "body")
    val neu = Seq((1L, "same"), (2L, "now this"), (4L, "fresh")).toDF("id", "body")
    val out = Ops.snapshotDiff(old, neu, "id", Seq("body"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // multi-column content: boundary shifts between columns are changes
    val o2 = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val n2 = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    assert(Ops.snapshotDiff(o2, n2, "id", Seq("x", "y")).count() == 1)
    // identical snapshots diff to nothing
    assert(Ops.snapshotDiff(old, old, "id", Seq("body")).count() == 0)
  }

  test("filter composes: filter(p).filter(q) == filter(p && q) (SURVEY 5.3)") {
    val t = (1 to 100).toDF("v")
    val a = Ops.filter(Ops.filter(t, col("v") > 10), col("v") < 50).count()
    val b = Ops.filter(t, col("v") > 10 && col("v") < 50).count()
    assert(a == b && a == 39)
  }

  test("applyChangeset: diff -> apply reconstructs the new snapshot; empty delta is identity (X8c)") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "body")
    val neu = Seq((1L, "a"), (3L, "C2"), (4L, "d")).toDF("id", "body") // drop 2, change 3, add 4
    val diff = Ops.snapshotDiff(old, neu, "id", Seq("body"))
    val changes = diff.join(neu, Seq("id"), "left").select(col("id"), col("change"), col("body"))
    val rebuilt = Ops.applyChangeset(old, changes, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rebuilt.toSeq == Seq((1L, "a"), (3L, "C2"), (4L, "d")))
    // empty changeset: base passes through untouched
    val empty = changes.where(lit(false))
    assert(Ops.applyChangeset(old, empty, "id").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    intercept[IllegalArgumentException] {
      Ops.applyChangeset(old, old, "id") // no change column
    }
  }

  test("expectations: one pass, 3VL-safe row rules, uniqueness by distinct gap (X9)") {
    val t = Seq(
      (1L, Some(10), "en"),   // ok
      (2L, Some(-5), "en"),   // violates v_pos
      (3L, None, "de"),       // null predicate -> violates v_pos too
      (3L, Some(7), "de")     // duplicate id
    ).toDF("id", "v", "lang")
    val out = Ops.expectations(t,
      Seq("v_pos" -> (col("v") > 0)), uniqueCols = Seq("id", "lang"))
      .orderBy("rule").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq == Seq(
      ("unique_id", 1L, 4L),    // 4 non-null ids, 3 distinct
      ("unique_lang", 2L, 4L),  // 4 non-null langs, 2 distinct
      ("v_pos", 2L, 4L)))       // false + null both count
    // empty corpus: every rule reports 0 violations over 0 rows
    val empty = Ops.expectations(t.where(lit(false)),
      Seq("v_pos" -> (col("v") > 0)), uniqueCols = Seq("id")).collect()
    assert(empty.length == 2 && empty.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
    // all rules ride ONE aggregate: a single scan in the plan
    val p = Ops.expectations(t, Seq("a" -> (col("v") > 0), "b" -> col("lang").isNotNull),
      uniqueCols = Seq("id")).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"rules must fold into one aggregate, not join:\n$p")
    intercept[IllegalArgumentException] { Ops.expectations(t, Nil, Nil) }
    intercept[IllegalArgumentException] {
      Ops.expectations(t, Seq("unique_id" -> (col("v") > 0)), Seq("id"))
    }
  }
}
