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

  test("unsupported format rejected") {
    intercept[IllegalArgumentException] {
      Formats.write(Tables.region(spark, TestSpark.sf0001), "/tmp/x", "xml")
    }
  }
}
