package graft

import java.nio.file.Files

import graft.sources.CsvSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** S1–S4: the reference CSV scan semantics that r2 shipped untested
  * (`/root/reference/src/csv_parser.py:19-46, 49-79`).
  */
class CsvSourceSpec extends SparkTestBase {

  private def writeCsv(lines: String*): String = {
    val dir = Files.createTempDirectory("graft_csv")
    Files.writeString(dir.resolve("part.csv"), lines.mkString("\n"))
    dir.toString
  }

  test("S2: quoted fields keep embedded separators; doubled quotes escape (csv_parser.py:19-46)") {
    val path = writeCsv(
      "id,text",
      "1,\"hello, world\"",
      "2,\"she said \"\"hi\"\" twice\"")
    val out = CsvSource.read(spark, path).orderBy("id").collect()
    assert(out(0).getString(1) == "hello, world")
    assert(out(1).getString(1) == "she said \"hi\" twice")
  }

  test("S1: short rows pad with null; long rows truncate to header width (csv_parser.py:71-75)") {
    val path = writeCsv(
      "a,b,c",
      "1,2",          // short: c -> null
      "4,5,6,7")      // long: 7 dropped
    val out = CsvSource.read(spark, path).orderBy("a").collect()
    assert(out(0).isNullAt(2), "short row pads missing trailing column with null")
    assert(out(1) == Row(4, 5, 6), "long row truncated to schema width")
  }

  test("S1: blank lines are skipped (csv_parser.py:64-66)") {
    val path = writeCsv("a,b", "1,x", "", "2,y", "")
    assert(CsvSource.read(spark, path).count() == 2)
  }

  test("S3: per-column inference — int, float, string; empty cell -> null (csv_parser.py:6-16)") {
    val path = writeCsv(
      "i,f,s,n",
      "1,1.5,abc,",
      "2,2.5,def,x")
    val df = CsvSource.read(spark, path)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("i").isInstanceOf[org.apache.spark.sql.types.IntegerType.type]
      || types("i") == LongType, s"int column inferred numeric, got ${types("i")}")
    assert(types("f") == DoubleType)
    assert(types("s") == StringType)
    assert(df.orderBy("i").collect()(0).isNullAt(3), "empty cell reads as null")
  }

  test("S3/S4: a mixed int/str column becomes StringType; try_cast bridges aggregation (SURVEY 7.4.1)") {
    val path = writeCsv("k,v", "a,1", "a,notnum", "a,3")
    val df = CsvSource.read(spark, path)
    assert(df.schema("v").dataType == StringType)
    val sum = graft.operators.Agg.groupAgg(df, Seq("k"), Seq("v" -> Seq("sum", "count")))
      .collect()(0)
    assert(sum.getDouble(1) == 4.0, "non-numeric cells skipped by sum")
    assert(sum.getLong(2) == 3, "count stays row-count")
  }

  test("S1: configurable delimiter (app.py:203-212)") {
    val path = writeCsv("a;b", "1;x", "2;y")
    val out = CsvSource.read(spark, path, sep = ";").orderBy("a").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("x", "y"))
  }

  test("readWithSchema: explicit-schema fast path gives identical rows (SURVEY 7.5)") {
    val path = writeCsv("a,b", "1,x", "2,y")
    val inferred = CsvSource.read(spark, path)
    val explicit = CsvSource.readWithSchema(spark, path, inferred.schema)
    assert(explicit.collect().toSet == inferred.collect().toSet)
  }
}
