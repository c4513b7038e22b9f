package graft.sources

import java.io.IOException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Pre-flight filesystem checks for long conversions: verify the input
  * is readable and the output is writable BEFORE launching any job.
  *
  * The reference runs the same probes up front
  * (convert_to_iceberg.py:1197-1242, PERMISSION_HANDLING.md:9-59)
  * because the alternative is a 150k-docket convert dying hours in on
  * a write-denied output directory. Probes go through the Hadoop
  * FileSystem API, so they exercise exactly the credentials/path
  * scheme (local, s3a, …) the job itself will use.
  */
object Preflight {

  /** Thrown by [[check]]; message names the path and the failed probe. */
  final class PreflightException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  private def fail(msg: String, cause: Throwable = null): Nothing =
    throw new PreflightException(s"pre-flight check failed: $msg", cause)

  /** Probe `input` for existence + read/list access and `output` for
    * create+write+delete access. Throws [[PreflightException]] with an
    * actionable message on the first failed probe; returns silently
    * when both pass. Runs driver-side in O(1) filesystem calls. */
  def check(spark: SparkSession, input: String, output: String): Unit = {
    checkInput(spark, input)
    checkOutput(spark, output)
  }

  /** Read-only arm of [[check]]: existence + read/list access on one
    * input path. Verbs with a SECOND input (the frozen reference of
    * dedup-incremental, the benchmark corpus of decontaminate) probe
    * it with this before launching, so a typo'd path surfaces as an
    * actionable PreflightException up front instead of a raw Spark
    * error mid-job. */
  def checkInput(spark: SparkSession, input: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new Path(input)
    val inFs = in.getFileSystem(conf)
    val st =
      try {
        if (!inFs.exists(in))
          fail(s"input path does not exist: $input")
        inFs.getFileStatus(in)
      } catch {
        case e: IOException =>
          fail(s"input path is not accessible: $input (${e.getMessage})", e)
      }
    try {
      // listing (dir) / opening (file) is the actual read permission
      if (st.isDirectory) inFs.listStatus(in)
      else inFs.open(in).close()
    } catch {
      case e: IOException =>
        fail(s"input path is not readable: $input (${e.getMessage})", e)
    }
  }

  /** Write arm of [[check]]: create + write + delete access probes on
    * the output directory. */
  def checkOutput(spark: SparkSession, output: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val outDir = new Path(output)
    val outFs = outDir.getFileSystem(conf)
    try {
      if (outFs.exists(outDir) && !outFs.getFileStatus(outDir).isDirectory)
        fail(s"output path exists and is not a directory: $output")
      if (!outFs.exists(outDir) && !outFs.mkdirs(outDir))
        fail(s"cannot create output directory: $output")
      // test-write + delete: the exact operation every task will do
      val probe = new Path(outDir, ".graft_preflight_probe")
      val os = outFs.create(probe, true)
      os.write('x'); os.close()
      if (!outFs.delete(probe, false))
        fail(s"cannot delete probe file under output: $output")
    } catch {
      case e: PreflightException => throw e
      case e: IOException =>
        fail(s"output path is not writable: $output (${e.getMessage})", e)
    }
  }
}
