package graft.plans

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan,
  LessThanOrEqual, Literal}
import org.apache.spark.sql.types.DataType

/** Shared conjunct→range-bounds extraction for the metadata-pruning
  * optimizer rules ([[ManifestPruneRule]], [[SnapshotPruneRule]]).
  *
  * Walks a Filter condition's AND-conjuncts and collects, per
  * referenced column, the tightest-first `[lo?, hi?]` bound implied by
  * direct `attr <op> literal` / `literal <op> attr` comparisons. Open
  * bounds are treated as closed (conservative: pruning keeps a
  * possibly-extra file, never drops a needed one); multiple bounds on
  * one side keep the first seen — any single conjunct's bound is a
  * correct prune. OR branches, casts, and function-wrapped attributes
  * are deliberately NOT matched: a bound the extractor cannot prove is
  * a bound it must not prune on.
  */
object FilterBounds {

  /** Literal's Catalyst-internal value (UTF8String, epoch micros, …)
    * converted to the external JVM form (String, java.sql.Timestamp /
    * Instant, …) callers compare against metadata. */
  private def external(v: Any, dt: DataType): Any =
    CatalystTypeConverters.createToScalaConverter(dt)(v)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  /** Per-column `(lo?, hi?)` bounds from `cond`'s conjuncts, insertion
    * ordered. `interesting` filters collection to the columns the
    * caller has metadata for. */
  def boundsOf(cond: Expression, interesting: String => Boolean)
      : Seq[(String, Option[Any], Option[Any])] = {
    val bounds = scala.collection.mutable.LinkedHashMap
      .empty[String, (Option[Any], Option[Any])]
    def add(name: String, lo: Option[Any], hi: Option[Any]): Unit =
      if (interesting(name)) {
        val (l0, h0) = bounds.getOrElse(name, (None, None))
        bounds(name) = (l0.orElse(lo), h0.orElse(hi))
      }
    conjuncts(cond).foreach {
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        add(a.name, Some(external(v, dt)), None)
      case GreaterThan(a: AttributeReference, Literal(v, dt)) =>
        add(a.name, Some(external(v, dt)), None)
      case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        add(a.name, None, Some(external(v, dt)))
      case LessThan(a: AttributeReference, Literal(v, dt)) =>
        add(a.name, None, Some(external(v, dt)))
      case EqualTo(a: AttributeReference, Literal(v, dt)) =>
        add(a.name, Some(external(v, dt)), Some(external(v, dt)))
      case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        add(a.name, None, Some(external(v, dt)))
      case GreaterThan(Literal(v, dt), a: AttributeReference) =>
        add(a.name, None, Some(external(v, dt)))
      case LessThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        add(a.name, Some(external(v, dt)), None)
      case LessThan(Literal(v, dt), a: AttributeReference) =>
        add(a.name, Some(external(v, dt)), None)
      case EqualTo(Literal(v, dt), a: AttributeReference) =>
        add(a.name, Some(external(v, dt)), Some(external(v, dt)))
      case _ => ()
    }
    bounds.toSeq.map { case (c, (lo, hi)) => (c, lo, hi) }
  }
}
