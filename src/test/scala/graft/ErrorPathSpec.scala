package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ProfileQueries
import graft.sources.JsonApi

/** Error-path behavior (reference test_permissions.py analog):
  * missing inputs fail fast and explicitly; sketchy inputs degrade
  * gracefully. */
class ErrorPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("discover on a nonexistent root returns empty, not an error") {
    assert(JsonApi.discover(spark, "/root/repo/target/does-not-exist").isEmpty)
  }

  test("readRaw with no directories fails fast with a clear message") {
    val e = intercept[IllegalArgumentException] {
      JsonApi.readRaw(spark, Seq.empty)
    }
    assert(e.getMessage.contains("no input directories"))
  }

  test("preflight: nonexistent input fails in well under a second") {
    val out = TestSpark.tmpDir("preflight-out")
    val t0 = System.nanoTime()
    val e = intercept[graft.sources.Preflight.PreflightException] {
      graft.cli.Main.run(spark, Array("convert",
        "/root/repo/target/no-such-input", "--output-path", out))
    }
    val ms = (System.nanoTime() - t0) / 1e6
    assert(e.getMessage.contains("does not exist"))
    assert(e.getMessage.contains("no-such-input"))
    assert(ms < 1000, s"preflight took ${ms}ms — must fail before any job")
  }

  test("preflight: output path that is a FILE fails before any work") {
    val root = TestSpark.tmpDir("preflight-badout")
    val outFile = s"$root/occupied"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), "x")
    val fixture = TestSpark.tmpDir("preflight-in")
    graft.sources.FixtureTree.writeComments(fixture, nDockets = 1,
      commentsPerDocket = 1)
    val t0 = System.nanoTime()
    val e = intercept[graft.sources.Preflight.PreflightException] {
      graft.cli.Main.run(spark, Array("convert", fixture,
        "--output-path", outFile))
    }
    val ms = (System.nanoTime() - t0) / 1e6
    assert(e.getMessage.contains("not a directory"))
    assert(ms < 1000, s"preflight took ${ms}ms")
  }

  test("preflight passes on a readable input and writable output") {
    val fixture = TestSpark.tmpDir("preflight-ok-in")
    graft.sources.FixtureTree.writeComments(fixture, nDockets = 1,
      commentsPerDocket = 1)
    val out = s"${TestSpark.tmpDir("preflight-ok-out")}/nested/derived"
    graft.sources.Preflight.check(spark, fixture, out) // must not throw
    // probe file is cleaned up
    assert(!new java.io.File(s"$out/.graft_preflight_probe").exists())
  }

  test("preflight: two-input verbs probe their SECOND path up front") {
    // a typo'd REF/BENCH path must fail as an actionable
    // PreflightException before any job, not a raw Spark error mid-run
    val in = TestSpark.tmpDir("preflight-two-in")
    Tables.documents(spark, TestSpark.sf0001).limit(5)
      .write.mode("overwrite").parquet(in)
    val out = TestSpark.tmpDir("preflight-two-out")
    for (args <- Seq(
        Array("dedup-incremental", in, "/root/repo/target/no-such-ref", out),
        Array("decontaminate", in, "/root/repo/target/no-such-bench", out))) {
      val t0 = System.nanoTime()
      val e = intercept[graft.sources.Preflight.PreflightException] {
        graft.cli.Main.run(spark, args)
      }
      val ms = (System.nanoTime() - t0) / 1e6
      assert(e.getMessage.contains("no-such-"), e.getMessage)
      assert(ms < 1000, s"${args(0)} second-input preflight took ${ms}ms")
    }
  }

  test("convert on an empty tree fails fast") {
    val empty = TestSpark.tmpDir("empty-tree")
    val e = intercept[IllegalArgumentException] {
      graft.cli.Main.run(spark, Array("convert", empty))
    }
    assert(e.getMessage.contains("no dockets found"))
  }

  test("approx distinct within the configured rsd of exact") {
    val row = SparkEntry.queries("a7x_approx_distinct")(
      spark, TestSpark.sf0001).head()
    val exact = SparkEntry.queries("a7_distinct")(spark, TestSpark.sf0001)
      .head().getAs[Long]("n_cust")
    assert(row.getAs[Long]("exact_cust") == exact,
      "exact path inside a7x disagrees with a7_distinct")
    assert(row.getAs[Boolean]("within_tol"),
      "HLL estimate drifted outside the 15% tolerance band")
  }

  test("profile handles a single-column and an empty-result table") {
    import spark.implicits._
    val one = Seq(1, 2, 2, 3).toDF("x")
    val got = ProfileQueries.profile(one).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_nonnull") == 4)
    assert(got.head.getAs[Long]("n_distinct") == 3)
    val empty = ProfileQueries.profile(one.filter($"x" > 100)).collect()
    assert(empty.head.getAs[Long]("n_nonnull") == 0)
  }

  test("dedup-lines / dedup-spans on an empty corpus exit cleanly") {
    import spark.implicits._
    // zero-row parquet input: the sink skips the write (skip-if-empty)
    // and the verbs must report 0 removed instead of NPE-ing on a
    // null sum or re-reading a never-written output path
    val in = TestSpark.tmpDir("cli-empty-corpus") + "/in"
    Seq.empty[(Long, String)].toDF("doc_id", "text")
      .write.mode("overwrite").parquet(in)
    val ldOut = TestSpark.tmpDir("cli-empty-corpus-ld") + "/out"
    graft.cli.Main.run(spark, Array("dedup-lines", in, ldOut))
    val sdOut = TestSpark.tmpDir("cli-empty-corpus-sd") + "/out"
    graft.cli.Main.run(spark, Array("dedup-spans", in, sdOut))
  }

  test("round-8 operators reject invalid arguments up front") {
    import spark.implicits._
    val docs = Seq((1L, "a b c", "web")).toDF("doc_id", "text", "source")
    val vals = Seq(1.0).toDF("value")
    intercept[IllegalArgumentException] {
      graft.llm.Drift.psiNumeric(vals, vals, "value", nBins = 0)
    }
    intercept[IllegalArgumentException] {
      graft.llm.LanguageModel.bpeTopMerges(docs, nMerges = 0)
    }
    intercept[IllegalArgumentException] {
      graft.llm.LanguageModel.oovRateBySource(docs, vocabSize = 0)
    }
    // misnamed columns fail at analysis, not with a late runtime error
    intercept[org.apache.spark.sql.AnalysisException] {
      graft.llm.Curate.coverageAudit(docs, docs, vecIdCol = "no_such_col")
        .collect()
    }
  }
}
