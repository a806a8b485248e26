package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

import graft.core.GeoMath

/** Predicate DERIVATION (SURVEY.md §5): Catalyst pushes filters it is
  * given, but cannot invent them. A point-in-polygon test with a literal
  * polygon implies cheap lon/lat range bounds (the polygon's bbox ⊇ the
  * polygon), and range predicates on stored columns reach the parquet
  * row-group/page statistics — pruning most of a 100 TB scan before the
  * expensive ray-cast runs. This rule ANDs those derived bounds onto any
  * Filter containing a foldable-WKT [[StContainsWkt]].
  *
  * Idempotent under the optimizer's fixed-point batches: derived conjuncts
  * already present (semantically) are not re-added.
  *
  * Soundness: bounds are derived ONLY from PIP predicates that are
  * TOP-LEVEL CONJUNCTS of the filter condition. A StContainsWkt buried
  * under OR / NOT / CASE does not imply the bbox bounds for the whole
  * condition (`pip(..) OR x` admits rows outside the polygon's bbox), so
  * those are left alone.
  */
object DerivePipBBox extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = splitConjuncts(cond)
      val derived = existing.collect {
        case StContainsWkt(wkt, lon, lat) if wkt.foldable && wkt.eval(null) != null =>
          val rings = GeoMath.parseWktPolygon(wkt.eval(null).asInstanceOf[UTF8String].toString)
          val outer = rings.head
          val lons = outer.indices.collect { case i if i % 2 == 0 => outer(i) }
          val lats = outer.indices.collect { case i if i % 2 == 1 => outer(i) }
          Seq[Expression](
            GreaterThanOrEqual(lon, Literal(lons.min)), LessThanOrEqual(lon, Literal(lons.max)),
            GreaterThanOrEqual(lat, Literal(lats.min)), LessThanOrEqual(lat, Literal(lats.max)))
      }.flatten
      val fresh = derived.filterNot(d => existing.exists(_.semanticEquals(d)))
      if (fresh.isEmpty) f
      else Filter(fresh.foldLeft(cond)(And(_, _)), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
