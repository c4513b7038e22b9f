package graft.tools

import graft.{GraftSession, Tables}

/** Attributes "Broadcasting large task binary" warnings (≥1 MiB
  * serialized stage plans — the overhead BENCH tails flagged since
  * round 12) to specific queries, under bench conditions (cached
  * tables, AQE off, 8 shuffle partitions). Round-14 recorded run
  * (SCALE_PROBES.md): ZERO large binaries across all 14 headline
  * queries — the warnings in full-suite runs come from LLM-family
  * queries whose plans embed bounded model literals (centroid/
  * codebook arrays), not from the comparables; the headline x10
  * ratios are scheduling floor, which the x100 spot tier shows
  * amortizing. Run:
  * `sbt "runMain graft.tools.TaskBinaryProbe [sfDir]"`.
  */
object TaskBinaryProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = graft.SparkEntry.queries
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "67108864")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4194304")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).cache())
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val app = new AbstractAppender("graft-capture", null, null, false,
        Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("Broadcasting large task binary")) captured.add(m)
      }
    }
    app.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    ctx.getConfiguration.getRootLogger
      .addAppender(app, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()

    for (n <- graft.Bench.headline) {
      captured.clear()
      queries(n)(spark, sfDir).count()
      queries(n)(spark, sfDir).count() // the warm pass bench times
      val sizes = captured.toArray.map(_.toString)
        .flatMap("""size ([0-9.]+ [KM]iB)""".r
          .findFirstMatchIn(_).map(_.group(1)))
      println(s"PROBE taskbin query=$n n=${sizes.length} " +
        s"sizes=[${sizes.mkString(", ")}]")
    }
    spark.stop()
  }
}
