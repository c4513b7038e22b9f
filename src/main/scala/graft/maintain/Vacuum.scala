package graft.maintain

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Orphan cleanup for the maintenance swaps ([[Swap]]): a crash can
  * strand `_compacting` / `_upserting` / `_zordering` tmp dirs (a
  * half-written replacement nothing references) and `_precompact` /
  * `_preupsert` / `_prezorder` backups (handled per-table by
  * `Swap.recover`, but only when that table's next maintenance run
  * happens). Vacuum sweeps a whole warehouse root in one driver-side
  * listing pass: restores backups whose table is missing, clears stale
  * backups, deletes orphan tmp dirs.
  *
  * Scale: pure namenode/object-store metadata operations — one list of
  * the root plus one rename-or-delete per orphan; no data is read.
  */
object Vacuum {

  private val TmpSuffixes = Seq("_compacting", "_upserting", "_zordering")
  private val BackupSuffixes = Seq("_precompact", "_preupsert", "_prezorder")

  final case class VacuumReport(
      removedTmp: Seq[String],
      recoveredTables: Seq[String],
      clearedBackups: Seq[String])

  /** Sweep the direct children of `root`. Safe to run while no
    * maintenance job is active on the same tables (the same constraint
    * the swaps themselves carry). */
  def vacuum(spark: SparkSession, root: String): VacuumReport = {
    val rootPath = new Path(root)
    val fs: FileSystem =
      rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val children = fs.listStatus(rootPath).filter(_.isDirectory)
      .map(_.getPath).toSeq
    val names = children.map(_.getName).toSet

    val removedTmp = children.filter { p =>
      TmpSuffixes.exists(p.getName.endsWith)
    }.map { p =>
      if (!fs.delete(p, true))
        throw new Swap.SwapFailedException(s"could not delete orphan $p")
      p.toString
    }

    val (recovered, cleared) = children
      .flatMap { p =>
        BackupSuffixes.find(p.getName.endsWith).map { suffix =>
          (p, p.getName.stripSuffix(suffix))
        }
      }
      .partition { case (_, base) => !names.contains(base) }
    recovered.foreach { case (backup, base) =>
      Swap.recover(fs, new Path(rootPath, base), backup)
    }
    cleared.foreach { case (backup, base) =>
      Swap.recover(fs, new Path(rootPath, base), backup)
    }
    VacuumReport(
      removedTmp,
      recovered.map { case (_, base) => new Path(rootPath, base).toString },
      cleared.map { case (backup, _) => backup.toString })
  }
}
