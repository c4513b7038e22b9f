package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Formats

/** Multi-format round-trips: same rows, same types (schema passed
  * explicitly for the row formats). */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("parquet/orc/json/csv round-trip the orders table") {
    val src = Tables.orders(spark, TestSpark.sf0001)
    val expected = src.orderBy("o_orderkey").collect()
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      val path = TestSpark.tmpDir(s"fmt-$fmt") + "/t"
      Formats.write(src, path, fmt)
      val back = Formats.read(spark, path, fmt, Some(src.schema))
        .orderBy("o_orderkey").collect()
      assert(back.length == expected.length, fmt)
      assert(back.head.getAs[Double]("o_totalprice") ==
        expected.head.getAs[Double]("o_totalprice"), fmt)
      assert(back.last.getAs[Long]("o_orderkey") ==
        expected.last.getAs[Long]("o_orderkey"), fmt)
    }
  }

  test("partitioned multi-format write keeps partition column") {
    val src = Tables.customer(spark, TestSpark.sf0001)
    val path = TestSpark.tmpDir("fmt-part") + "/t"
    Formats.write(src, path, "orc", partitionCols = Seq("c_mktsegment"))
    val back = Formats.read(spark, path, "orc")
    assert(back.count() == src.count())
    assert(back.select("c_mktsegment").distinct().count() ==
      src.select("c_mktsegment").distinct().count())
  }

  test("csv quarantine: malformed rows isolated, good rows parsed") {
    import java.nio.file.{Files, Paths}
    val dir = TestSpark.tmpDir("csv-quarantine")
    Files.writeString(Paths.get(dir, "data.csv"),
      Seq(
        "id,price",
        "1,10.5",
        "2,not_a_number",  // malformed double
        "3,30.0").mkString("\n"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, price DOUBLE")
    val df = graft.sources.Formats.readCsvQuarantine(spark, dir, schema)
    import org.apache.spark.sql.functions.col
    // Spark disallows scans whose only referenced column is
    // _corrupt_record (same restriction JsonApi.corruptRecords works
    // around): always reference a data column alongside it.
    val good = df.filter(col("price").isNotNull &&
      col("_corrupt_record").isNull)
    val bad = df.filter(col("price").isNull &&
      col("_corrupt_record").isNotNull)
    assert(good.count() == 2)
    val badRows = bad.select("id", "_corrupt_record").collect()
    assert(badRows.length == 1)
    assert(badRows.head.getString(1).contains("not_a_number"))
  }

  test("unsupported format rejected") {
    intercept[IllegalArgumentException] {
      Formats.write(Tables.region(spark, TestSpark.sf0001), "/tmp/x", "xml")
    }
  }
}
