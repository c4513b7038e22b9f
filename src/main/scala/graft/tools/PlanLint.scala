package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, HigherOrderFunction, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, GenerateExec, ProjectExec, SortExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Static physical-plan linter: the checks PlanSpec pins for the
  * built-in queries, packaged as a reusable audit any user query can
  * run BEFORE burning cluster hours. At 100 TB the plan is the
  * product — a cartesian, a single-partition funnel, or an
  * unpartitioned window is a cluster-killer that local tests at
  * sf0.01 will happily pass. `lint` returns findings; `assertClean`
  * throws, for use as a deploy gate or test assertion.
  *
  * Deliberately heuristic: a finding is a flag for a human (or a
  * test) — rules err toward no false ERRORs on the engine's own 110
  * registered queries (PlanLintSpec pins exactly that), with WARN for
  * shapes that are sometimes legitimate.
  */
object PlanLint {

  sealed trait Severity
  case object Error extends Severity
  case object Warn extends Severity
  case object Info extends Severity

  final case class Finding(
      severity: Severity, rule: String, detail: String) {
    override def toString: String =
      s"[$severity] $rule: $detail"
  }

  /** Unwrap AQE so rules see the real operators. Before execution
    * `executedPlan` of the adaptive node is its initial plan; after an
    * action it is the final re-optimized one — lint accepts either
    * (the conservative initial plan only over-reports). */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val here = unwrap(p)
    here +: here.children.flatMap(walk) ++:
      here.subqueries.flatMap(walk)
  }

  def lint(df: DataFrame): Seq[Finding] =
    lintPlan(df.queryExecution.executedPlan)

  def lintPlan(root: SparkPlan): Seq[Finding] = {
    val nodes = walk(root)
    val findings = Seq.newBuilder[Finding]

    // 1. Cartesian products: quadratic work AND all-to-one-executor
    // data movement. A BroadcastNestedLoopJoin is the bounded cousin
    // (one side broadcast): legitimate against a deliberately tiny
    // frame (ANN query rows, bloom sketches), lethal otherwise — WARN.
    nodes.foreach {
      case c: CartesianProductExec =>
        findings += Finding(Error, "cartesian",
          s"CartesianProductExec: ${c.simpleStringWithNodeId()}")
      case b: BroadcastNestedLoopJoinExec if b.condition.isEmpty =>
        findings += Finding(Warn, "nested-loop-cross",
          "BroadcastNestedLoopJoin without condition — fine only if " +
            "the broadcast side is a deliberately tiny frame")
      case _ => ()
    }

    // 2. Single-partition funnels: a shuffle into ONE partition
    // serializes the whole dataset through one task. TakeOrdered/limit
    // shapes don't plan this; global Sort and unpartitioned Window do.
    nodes.foreach {
      case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition =>
        findings += Finding(Warn, "single-partition-exchange",
          "Exchange SinglePartition — the stage above it runs as ONE " +
            "task (scalar aggregates over pre-reduced input are fine; " +
            "anything data-sized is not)")
      case w: WindowExec if w.partitionSpec.isEmpty =>
        findings += Finding(Error, "global-window",
          "Window with empty PARTITION BY — every row flows through " +
            "one task; partition the window or use a join-based rewrite")
      case s: SortExec if s.global &&
          !nodes.exists(_.isInstanceOf[TakeOrderedAndProjectExec]) =>
        findings += Finding(Info, "global-sort",
          "global Sort (rangepartitioned, parallel; verify a LIMIT " +
            "didn't intend TakeOrderedAndProject instead)")
      case _ => ()
    }

    // 3. Codegen fallbacks in row-at-a-time operators: an interpreted
    // expression inside Filter/Project evaluates row-by-row with
    // boxing — fine in a one-row aggregate, hot-loop poison in a scan.
    nodes.foreach {
      case f: FilterExec if hasFallback(f.condition) =>
        findings += Finding(Warn, "codegen-fallback",
          s"Filter condition not codegen-able: ${f.condition.sql}")
      case pr: ProjectExec
          if pr.projectList.exists(hasFallback) =>
        findings += Finding(Warn, "codegen-fallback",
          "Project contains non-codegen expression(s): " +
            pr.projectList.filter(hasFallback).map(_.sql).mkString(", "))
      case _ => ()
    }

    // 4. Filter directly above a parquet scan that pushed nothing
    // down: either the predicate is unpushable (udf-ish, codegen
    // fallback — see rule 3) or pushdown broke. Partition-pruned or
    // data-filtered scans don't trigger.
    nodes.foreach {
      case f: FilterExec => f.child match {
        case scan: FileSourceScanExec
            if scan.dataFilters.isEmpty &&
              scan.partitionFilters.isEmpty &&
              scan.relation.fileFormat.toString.contains("Parquet") =>
          findings += Finding(Warn, "unpushed-filter",
            "Filter sits on a parquet scan with no pushed/partition " +
              s"filters: ${f.condition.sql} — predicate not reaching " +
              "the reader")
        case _ => ()
      }
      case _ => ()
    }

    // 5. Generate over a non-trivial INLINE computed array: the
    // measured winnowPairs trap (SURVEY §4 — 26 s vs 0.7 s at sf0.1).
    // The cost model is (array-expression tree size × output
    // fan-out); an explode over an attribute, or over a small inline
    // expression (posexplode of minhash bands, a bigram struct
    // builder), is fine — a heavyweight array pipeline inlined into
    // the generator is not: stage it as a column behind a
    // materialization barrier (localCheckpoint of the tiny
    // (id, array) frame) before exploding. Invisible in plan SHAPE —
    // this rule is the static tripwire wall-clock used to be.
    nodes.foreach {
      case g: GenerateExec =>
        g.generator.children.foreach { child =>
          val w = nodeCount(child)
          if (!child.isInstanceOf[Attribute] && w > GenerateInlineMax)
            findings += Finding(Warn, "generate-inline-array",
              s"Generate over an inline computed array ($w expression " +
                "nodes) — the array tree re-evaluates with the " +
                "generator; stage it as a column behind a " +
                "materialization barrier before exploding: " +
                trunc(child.sql))
        }
      case _ => ()
    }

    // 6. HOF lambda referencing a non-cheap OUTER expression: the
    // measured ngrams/winnowing-minima trap (SURVEY §4 — lambda
    // bodies inline their outer references, so a lambda-invariant
    // subtree re-evaluates once per ELEMENT: O(T²) per row for a
    // T-sized array over a T-sized invariant). Cheap invariants
    // (an attribute, a literal, size(attr)) are fine; a big computed
    // array indexed from inside the lambda is not — stage it as a
    // column attribute in a PRIOR projection, or move it to HOF
    // ARGUMENT position (zip_with(bigExpr, …)), where it evaluates
    // once per row.
    nodes.foreach { n =>
      n.expressions.foreach { root =>
        root.foreach {
          case hof: HigherOrderFunction =>
            hof.functions.foreach {
              case LambdaFunction(body, _, _) =>
                val w = maxInvariantWeight(body)
                if (w > HofInvariantMax)
                  findings += Finding(Warn, "hof-outer-reference",
                    s"HOF lambda references a lambda-invariant subtree " +
                      s"of $w expression nodes — it re-evaluates per " +
                      "array ELEMENT; stage it in a prior projection " +
                      "or move it to HOF argument position: " +
                      trunc(body.sql))
              case _ => ()
            }
          case _ => ()
        }
      }
    }

    // 7. Shuffle inventory (Info): every Exchange is a full
    // materialization of its input — the first number to minimize.
    val exchanges = nodes.count {
      case _: ShuffleExchangeExec => true
      case _ => false
    }
    if (exchanges > 0)
      findings += Finding(Info, "shuffle-count",
        s"$exchanges shuffle exchange(s) in the plan")

    findings.result()
  }

  private def hasFallback(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.exists {
      case _: CodegenFallback => true
      case _ => false
    }

  /** Tuning knobs for rules 5/6, calibrated against MEASUREMENTS on
    * the engine's own queries: the winnowing fingerprint pipeline
    * inlined into an explode (~100+ nodes, the 26 s incident) must
    * trip; `text_top_ngrams`' bigram zip_with chain (50 nodes) and
    * the KLL explode (53) were re-measured round 14 at sf0.1 as
    * staging-neutral (0.78 s inline vs 0.75 s staged) and must stay
    * quiet. The HOF bound is lower because the invariant re-evaluates
    * per ELEMENT (fan-out multiplies the tree), not per row. */
  val GenerateInlineMax = 80
  val HofInvariantMax = 24

  private def nodeCount(e: Expression): Int =
    1 + e.children.map(nodeCount).sum

  /** The largest lambda-invariant subtree (expression nodes) a lambda
    * body re-evaluates per element: a subtree free of ALL lambda
    * variables evaluates to the same value for every element, so its
    * full tree cost is paid once per element instead of once per row.
    * Literals and attributes are weight-1 (cheap to re-read). */
  private def maxInvariantWeight(body: Expression): Int = {
    def hasVar(e: Expression): Boolean =
      e.exists(_.isInstanceOf[NamedLambdaVariable])
    def go(e: Expression): Int =
      if (!hasVar(e)) nodeCount(e)
      else if (e.children.isEmpty) 0
      else e.children.map(go).max
    go(body)
  }

  private def trunc(s: String, n: Int = 160): String =
    if (s.length <= n) s else s.take(n) + "…"

  /** Throw if the plan has findings at or above `failAt`. */
  def assertClean(df: DataFrame, failAt: Severity = Error): Unit = {
    val rank: Severity => Int =
      { case Error => 2; case Warn => 1; case Info => 0 }
    val bad = lint(df).filter(f => rank(f.severity) >= rank(failAt))
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"PlanLint: ${bad.size} finding(s) at/above $failAt:\n" +
          bad.mkString("\n"))
  }
}
