package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  InMemoryFileIndex, LogicalRelation}

import graft.maintain.Manifest

/** Optimizer rule that turns the file-level min/max manifest
  * ([[graft.maintain.Manifest]]) into automatic scan pruning — the
  * "metadata half of a table format" wired into ordinary
  * `spark.read.parquet` + `.filter(...)` plans, which is how every
  * registered query reads.
  *
  * Opt-in via `spark.graft.manifestPruning=true` (default off: the
  * rule consults manifest metadata — a tiny parquet read + one FS
  * listing — during optimization, which only pays for itself on
  * multi-file tables with selective range predicates).
  *
  * Shape: `Filter(cond, LogicalRelation(parquet))` where the
  * relation's single root directory carries a manifest. Range/equality
  * conjuncts over manifested columns (`c >= lit`, `c < lit`,
  * `c === lit`, either operand order; open bounds treated as closed —
  * conservative) become per-column [lo, hi] bounds; files whose
  * manifest range cannot overlap ALL bounds are dropped from the scan
  * by swapping in an `InMemoryFileIndex` over the surviving files. The
  * original Filter stays on top — file pruning is necessary, not
  * sufficient — so results are bit-identical with the rule on or off
  * (pinned by ManifestSpec).
  *
  * Safety posture, in order:
  *  - candidate selection is [[Manifest.candidateFilesBounded]], which
  *    keeps null-stats files, keeps files appended since the last
  *    manifest build, and drops manifest rows for vanished files;
  *  - partitioned tables are skipped (partition pruning already does
  *    this job there; mixing explicit file lists with partition
  *    discovery buys complexity, not I/O);
  *  - a rewrite only happens when at least one file is actually
  *    dropped, so the fixpoint optimizer batch stabilizes after one
  *    application (the pruned relation's roots are data files, which
  *    carry no manifest — the rule cannot re-match its own output);
  *  - any failure (stale manifest schema, FS hiccup) logs and leaves
  *    the plan untouched.
  */
case class ManifestPruneRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!session.conf.get(ManifestPruneRule.ConfKey, "false").toBoolean)
      plan
    else
      plan.transformDown {
        case f @ Filter(cond, l: LogicalRelation) =>
          l.relation match {
            case fsRel: HadoopFsRelation =>
              tryPrune(cond, l, fsRel)
                .map(pl => Filter(cond, pl)).getOrElse(f)
            case _ => f
          }
      }

  private def tryPrune(
      cond: Expression,
      l: LogicalRelation,
      fsRel: HadoopFsRelation): Option[LogicalRelation] =
    try {
      val roots = fsRel.location.rootPaths
      if (roots.length != 1 || fsRel.partitionSchema.nonEmpty) None
      else {
        val path = roots.head.toString
        Manifest.columnsIfPresent(session, path).flatMap { mCols =>
          val manifested = mCols.toSet
          // (column, lo?, hi?) bounds and IN-lists from the Filter's
          // conjuncts — the shared extractor ([[FilterBounds]],
          // conservative by construction)
          val bounds = FilterBounds.boundsOf(cond, manifested.contains)
          val inLists = FilterBounds.inListsOf(cond, manifested.contains)
          if (bounds.isEmpty && inLists.isEmpty) None
          else {
            val files = Manifest.candidateFilesBounded(
              session, path, bounds, inLists)
            val total = fsRel.location.inputFiles.length
            if (files.size >= total) None // nothing pruned — no rewrite
            else {
              logInfo(s"manifest pruning $path: ${files.size}/$total " +
                s"files survive ${bounds.map(_._1).mkString(",")} bounds")
              val idx = new InMemoryFileIndex(
                session, files.map(new Path(_)),
                fsRel.options + ("basePath" -> path),
                Some(fsRel.dataSchema))
              Some(l.copy(relation =
                fsRel.copy(location = idx)(session)))
            }
          }
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"manifest pruning skipped: ${e.getMessage}")
        None
    }
}

object ManifestPruneRule {
  val ConfKey = "spark.graft.manifestPruning"
}
