package graft.tools

/** Dump `.explain("formatted")` for a list of declared queries to
  * files — the optimization rounds' before/after plan evidence
  * (`plans/r18/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q1,q2,…>
  *
  * Each query's frame is BUILT (side-effecting fixture setup included,
  * same as the bench) and its formatted plan written to
  * `<outDir>/<name>_<suffix>.txt`. No timing — plans only.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, list) = args
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = graft.GraftSession.get()
    val queries = graft.SparkEntry.queries
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      require(queries.contains(n), s"unknown query: $n")
      val df = queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
