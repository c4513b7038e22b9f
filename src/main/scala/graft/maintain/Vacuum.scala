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
  // which backup a given tmp dir's swap would have created — used to
  // decide whether a tmp-suffixed dir is plausibly a swap leftover
  private val TmpToBackup = Map(
    "_compacting" -> "_precompact",
    "_upserting" -> "_preupsert",
    "_zordering" -> "_prezorder")

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

    // Delete a tmp-suffixed dir ONLY when it is plausibly a swap
    // leftover: its base table exists (crash before replace) or the
    // matching backup exists (crash mid-replace). A table that merely
    // happens to be NAMED like a tmp dir (e.g. `logs_upserting` with
    // no `logs` or `logs_preupsert` sibling) is real user data — warn
    // and leave it.
    val removedTmp = children.flatMap { p =>
      TmpSuffixes.find(p.getName.endsWith).flatMap { suffix =>
        val base = p.getName.stripSuffix(suffix)
        val plausible = base.nonEmpty &&
          (names.contains(base) || names.contains(base + TmpToBackup(suffix)))
        if (plausible) {
          if (!fs.delete(p, true))
            throw new Swap.SwapFailedException(s"could not delete orphan $p")
          Some(p.toString)
        } else {
          System.err.println(s"[graft] warning: $p has a maintenance tmp " +
            "suffix but no base table or backup exists — not a swap " +
            "leftover; left in place")
          None
        }
      }
    }

    // group backups per base table: a dir named exactly a bare suffix
    // (empty base) is not a swap leftover and must not derail the
    // sweep; two divergent backups of one missing table must not have
    // the loser silently deleted — restore one (deterministic suffix
    // order), leave the rest in place with a warning.
    val byBase = children
      .flatMap { p =>
        BackupSuffixes.find(p.getName.endsWith).map { suffix =>
          (p.getName.stripSuffix(suffix), suffix, p)
        }
      }
      .filter { case (base, _, _) => base.nonEmpty }
      .groupBy { case (base, _, _) => base }
      .toSeq.sortBy { case (base, _) => base }

    val recovered = Seq.newBuilder[String]
    val cleared = Seq.newBuilder[String]
    byBase.foreach { case (base, backups) =>
      val basePath = new Path(rootPath, base)
      val ordered = backups.sortBy { case (_, suffix, _) =>
        BackupSuffixes.indexOf(suffix)
      }
      if (names.contains(base)) {
        // live table: every backup is a stale post-swap copy
        ordered.foreach { case (_, _, backup) =>
          Swap.recover(fs, basePath, backup)
          cleared += backup.toString
        }
      } else {
        val (_, _, chosen) = ordered.head
        Swap.recover(fs, basePath, chosen)
        recovered += basePath.toString
        ordered.tail.foreach { case (_, _, extra) =>
          System.err.println(s"[graft] warning: $extra also backs the " +
            s"restored $basePath but DIVERGES from the chosen backup; " +
            "left in place for manual inspection")
        }
      }
    }
    VacuumReport(removedTmp, recovered.result(), cleared.result())
  }
}
