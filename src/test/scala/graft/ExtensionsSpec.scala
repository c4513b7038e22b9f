package graft

import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions wiring: the custom expressions and the
  * cartesian guard must survive `newSession()` (fresh session state,
  * no imperative registration ran) — the property that matters on a
  * shared cluster where sessions are minted per user/job. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("extension-injected functions resolve in a fresh newSession") {
    val s2 = spark.newSession()
    // No GraftFunctions.register(s2) call anywhere: resolution proves
    // the spark.sql.extensions path, not temp-function registration.
    val q = "SELECT simhash64(array('hello', 'world')) AS h, " +
      "text_hash('hello') AS t, array_dot(array(1.0D, 2.0D), " +
      "array(3.0D, 4.0D)) AS d"
    val row = s2.sql(q).collect().head
    assert(row.getLong(0) != 0L)
    assert(row.getDouble(2) == 11.0)
    // equals the values computed through the registered-function path
    assert(row == spark.sql(q).collect().head)
    // round-6 sketch probes resolve through the same injection
    assert(!s2.sql(
      "SELECT bloom_might_contain(CAST('' AS BINARY), 1L, 3) AS b")
      .collect().head.getBoolean(0))
    import org.apache.spark.sql.functions.{col, xxhash64}
    s2.range(0, 10)
      .agg(graft.functions.CountMinExprs
        .cm_agg(xxhash64(col("id")), 2, 64).as("sk"))
      .createOrReplaceTempView("cm_ext_t")
    assert(s2.sql(
      "SELECT cm_estimate(sk, xxhash64(5L), 2, 64) AS e FROM cm_ext_t")
      .collect().head.getLong(0) >= 1L)
    // the bounded top-k heap aggregate rides the injector too
    s2.range(0, 20).createOrReplaceTempView("topk_ext_t")
    val topk = s2.sql(
      """SELECT collect_top_k(named_struct('v', id), 3, false) AS t
         FROM topk_ext_t""").collect().head.getSeq[Any](0)
    assert(topk.length == 3)
  }

  test("cartesian guard rejects unkeyed joins at analysis time when enabled") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.failOnCartesian", "true")
    val thrown = intercept[Exception] {
      s2.sql("SELECT * FROM range(3) a JOIN range(3) b").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(thrown).exists(
      _.isInstanceOf[GraftExtensions.CartesianDisallowedException]),
      s"wrong failure: $thrown")
    // keyed join still fine
    assert(s2.sql(
      "SELECT * FROM range(3) a JOIN range(3) b ON a.id = b.id")
      .collect().length == 3)
  }

  test("cartesian guard descends into subquery plans") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.failOnCartesian", "true")
    val thrown = intercept[Exception] {
      s2.sql("""SELECT * FROM range(3) WHERE id IN
                (SELECT a.id FROM range(2) a JOIN range(2) b)""").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(thrown).exists(
      _.isInstanceOf[GraftExtensions.CartesianDisallowedException]),
      s"subquery cartesian slipped through: $thrown")
  }

  test("cartesian guard exempts deliberate broadcast cross joins (ANN path)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.failOnCartesian", "true")
    // the engine's own query-vector pattern: crossJoin(broadcast(tiny))
    val out = SparkEntry.queries("ann_cosine_topk")(s2, TestSpark.sf0001)
    assert(out.collect().length == 10)
  }

  test("a hint buried below an unrelated join does not exempt the guard") {
    import org.apache.spark.sql.functions.broadcast
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.failOnCartesian", "true")
    import s2.implicits._
    // left side legitimately broadcasts a dim INSIDE a keyed join; the
    // TOP-LEVEL join is still unconditioned and must be rejected — a
    // subtree-wide hint search would wrongly exempt it
    val dim = Seq((1L, "x")).toDF("id", "name")
    val left = s2.range(5).join(broadcast(dim), "id")
    val right = s2.range(4).toDF("rid")
    val thrown = intercept[Exception] { left.crossJoin(right).collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(thrown).exists(
      _.isInstanceOf[GraftExtensions.CartesianDisallowedException]),
      s"deep hint bypassed the guard: $thrown")
    // the same shape with the hint on the join's OWN input stays
    // exempt (left resolves to the one dim-matched row × 4 right rows)
    assert(left.crossJoin(broadcast(right)).collect().length == 4)
  }

  test("unary operators above a hint keep the exemption (Filter/Limit)") {
    import org.apache.spark.sql.functions.broadcast
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.failOnCartesian", "true")
    import s2.implicits._
    val dim = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    // broadcast() first, then filter/limit stacked above the hint —
    // the guard must walk the unary chain down to the ResolvedHint
    val out = s2.range(3)
      .crossJoin(broadcast(dim).filter($"name" === "x").limit(1))
      .collect()
    assert(out.length == 3)
  }
}
