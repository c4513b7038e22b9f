package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + spot-checks for every registered query at sf0.001 (full
  * oracle equivalence runs in the driver's DuckDB gate; mirrored
  * locally by tools/check_correctness.py at sf0.01). */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every registered query executes and is non-degenerate") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, TestSpark.sf0001).count()
          if (n == 0) Some(s"$name returned 0 rows") else None
        } catch {
          case e: Throwable => Some(s"$name threw ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("every oracle key has a query; aliases consistent") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"orphan oracles: ${ok diff qk}")
  }

  test("registry names are unique (a Map would shadow silently)") {
    val names = graft.queries.Registry.all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, xs) if xs.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  test("w1 heap plan is frame-equal to the window-rank reference") {
    // the headline w1 runs on a bounded collect_top_k heap; the window
    // row_number formulation is the semantic definition — same rows,
    // same order, including ties at the k boundary
    val heap = SparkEntry.queries("w1_topk_per_group")(spark, TestSpark.sf0001)
      .collect().toSeq
    val window = graft.queries.WindowQueries
      .w1WindowPlan(spark, TestSpark.sf0001).collect().toSeq
    assert(heap == window,
      s"heap=${heap.take(5)} window=${window.take(5)}")
  }

  test("flagship entry returns segment revenue") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 5) // five market segments
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("spot values at sf0.001") {
    import org.apache.spark.sql.functions._
    val q = SparkEntry.queries
    assert(q("a1_count")(spark, TestSpark.sf0001).head().getLong(0) == 6000)
    assert(q("a7_distinct")(spark, TestSpark.sf0001)
      .head().getAs[Long]("n_prio") == 5)
    val topPrice = q("o1_topk_order")(spark, TestSpark.sf0001)
      .agg(max("o_totalprice")).head().getDouble(0)
    val trueMax = Tables.orders(spark, TestSpark.sf0001)
      .agg(max("o_totalprice")).head().getDouble(0)
    assert(topPrice == trueMax)
  }
}
