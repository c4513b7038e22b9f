package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must EXECUTE on a corpus with the right
  * schemas but zero rows. "Return no rows" is fine; throwing is not.
  *
  * This generalizes the round-7 `connectedComponents` NPE (ADVICE
  * medium): `sum` over an empty frame is null, `.head()` on an empty
  * aggregate throws, a query-vector `first()` on an empty corpus
  * throws — none of which the data-bearing gate fixtures can catch. At
  * 100 TB an engine meets empty inputs constantly (a fresh partition,
  * a filter that matched nothing, a quarantined source), and a
  * pipeline that crashes on nothing-to-do is not production-grade.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Schema-identical zero-row mirror of every table. Raw
    * `spark.read` (not Tables.load) so the written parquet keeps the
    * driver's physical schemas — e.g. events' INT64 timestamp, which
    * Tables.events must still convert on the empty frame. */
  lazy val emptyDir: String = {
    val d = TestSpark.tmpDir("empty_sf")
    for (t <- Tables.names) {
      spark.read.parquet(s"${TestSpark.sf0001}/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  test("every registered query survives a zero-row corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch {
          case e: Throwable =>
            Some(s"$name threw ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on empty input:\n${failures.mkString("\n")}")
  }
}
