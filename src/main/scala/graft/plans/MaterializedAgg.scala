package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{avg => _, col, count, lit, max, min, sum}

/** Transparent materialized-aggregate rewrite — the Catalyst rule that
  * makes the gold layer *serve* silver-aggregate queries instead of
  * merely duplicating them (reference intent: gold tables ARE
  * pre-aggregations of silver, `/root/reference/docs/data_model.md`
  * gold sections; Spark itself ships no MV rewrite, so this is the
  * genuinely-custom-rule case of SURVEY §4's extension ladder).
  *
  * A registered summary records: source table path, a summary table
  * holding `cnt` plus `sum_/min_/max_/cnt_` columns per measure at a
  * grouping grain, and that grain's columns. The optimizer rule then
  * rewrites any logical `Aggregate` over the *source* scan whose
  *   - grouping keys are plain source columns within the grain,
  *   - filters (if any) touch only grain columns, and
  *   - aggregates are sum/min/max/avg/count(measure) or count(*)
  * into the equivalent re-aggregation of the summary table:
  * sum→sum(sum_m), min→min(min_m), max→max(max_m), count(*)→sum(cnt),
  * count(m)→sum(cnt_m), avg→sum(sum_m)/sum(cnt_m). Output names AND
  * expression ids are preserved, so parent operators never notice; a
  * rewrite whose result type would differ (e.g. decimal sums, whose
  * re-aggregated precision widens) bails instead.
  *
  * At 100 TB this is the difference between every dashboard query
  * re-scanning the fact table and those queries reading a summary
  * 4-6 orders of magnitude smaller: the rewritten plan's scan is the
  * summary parquet, pruned and pushed down like any other scan. The
  * rule is opt-in per source table (`register`), costs one map lookup
  * per Aggregate node when idle, and never fires twice (the rewritten
  * plan aggregates the summary path, which is not a registered
  * source). Correct only while the summary is in sync with its source
  * — `register` is therefore called by the maintenance stage right
  * after the gold rebuild, and any writer path should `deregister`
  * first (same contract as Delta MVs / Databricks query rewrite).
  *
  * Two attachment paths, mirroring [[graft.functions.NativeFunctions]]:
  * `GraftExtensions` injects the rule cluster-wide via
  * `spark.sql.extensions`; [[attach]] adds it to an existing session's
  * `experimental.extraOptimizations` for ad-hoc use and tests.
  */
object MaterializedAgg {

  private final case class Summary(rootPaths: Set[String],
                                   summary: LogicalRelation,
                                   groupCols: Set[String],
                                   measures: Set[String])

  // keyed by the canonical root-path set of the SOURCE scan
  private val registry = new ConcurrentHashMap[Set[String], Summary]()

  private def rootsOf(plan: LogicalPlan): Option[Set[String]] = plan match {
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          // keep scheme AND authority (stripping them would collide
          // same-pathed tables on different filesystems and serve one's
          // aggregates from the other's summary) but normalize null vs
          // empty authority: a DataFrame read stringifies as
          // file:/tmp/x while a catalog LOCATION is file:///tmp/x —
          // same filesystem, different raw URI strings
          Some(fs.location.rootPaths.map { p =>
            val u = p.toUri
            val auth = Option(u.getAuthority).getOrElse("")
            s"${Option(u.getScheme).getOrElse("")}://$auth${u.getPath}"
          }.toSet)
        case _ => None
      }
    case _ => None
  }

  /** Build the conventional summary frame for `groupCols`/`measures`:
    * one row per group with cnt, sum_m, min_m, max_m, cnt_m. Write it
    * wherever the gold layer lives, then [[register]] it. */
  def build(src: DataFrame, groupCols: Seq[String],
            measures: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +: measures.flatMap { m =>
      Seq(sum(col(m)).as(s"sum_$m"), min(col(m)).as(s"min_$m"),
          max(col(m)).as(s"max_$m"), count(col(m)).as(s"cnt_$m"))
    }
    src.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Register `summaryPath` as the materialization of
    * `sourcePath.groupBy(groupCols).agg(...)` over `measures`. */
  def register(spark: SparkSession, sourcePath: String, summaryPath: String,
               groupCols: Seq[String], measures: Seq[String]): Unit = {
    val srcPlan = spark.read.parquet(sourcePath).queryExecution.analyzed
    val sumPlan = spark.read.parquet(summaryPath).queryExecution.analyzed
    (rootsOf(srcPlan), sumPlan) match {
      case (Some(roots), lr: LogicalRelation) =>
        val have = lr.output.map(_.name.toLowerCase).toSet
        val need = "cnt" +: measures.flatMap(m => Seq(
          s"sum_$m", s"min_$m", s"max_$m", s"cnt_$m").map(_.toLowerCase))
        val missing = need.filterNot(have)
        require(missing.isEmpty,
          s"summary at $summaryPath lacks column(s) ${missing.mkString(", ")}" +
          s" — build it with MaterializedAgg.build")
        registry.put(roots, Summary(roots, lr,
          groupCols.map(_.toLowerCase).toSet,
          measures.map(_.toLowerCase).toSet))
      case _ => throw new IllegalArgumentException(
        s"both $sourcePath and $summaryPath must be parquet scans")
    }
  }

  def deregister(spark: SparkSession, sourcePath: String): Unit =
    rootsOf(spark.read.parquet(sourcePath).queryExecution.analyzed)
      .foreach(registry.remove)

  def clear(): Unit = registry.clear()

  /** Partition-scoped summary maintenance: after a source change
    * touching partition values `changed` (the pipeline knows its
    * batch's partitions), recompute ONLY those summary partitions and
    * atomically replace them, then re-register (the cached summary
    * relation holds a file listing that the swap invalidates). The
    * summary table must be partitioned by the leading group column,
    * which must be the source's partition column — the EtlMain layout
    * (both keyed on `date`). Cost: one pruned scan of the affected
    * source partitions + the partition swap — O(affected), never a
    * full rebuild; the incremental twin of the register-after-rebuild
    * contract. Limit inherited from [[graft.tables.LakehouseTable
    * .replacePartitions]]: a changed partition whose source rows were
    * ALL deleted produces no replacement rows and would keep its stale
    * summary — callers with delete-capable sources (CDC apply_changes)
    * should full-rebuild instead; the e-commerce pipeline's upserts
    * never delete. */
  def refresh(source: graft.tables.LakehouseTable,
              summary: graft.tables.LakehouseTable,
              groupCols: Seq[String], measures: Seq[String],
              changed: Seq[Any]): Unit = {
    require(summary.partitionCols == Seq(groupCols.head),
      s"summary must be partitioned by the leading group column " +
      s"${groupCols.head}, got ${summary.partitionCols}")
    if (changed.isEmpty) return
    // deregister FIRST: the rebuild below is itself an Aggregate over
    // the registered source — left registered, the rewrite rule would
    // serve it from the stale summary, recomputing the summary from
    // itself (the classic MV self-reference loop)
    deregister(source.spark, source.path)
    val slice = source.read
      .filter(col(groupCols.head).isInCollection(changed))
    summary.replacePartitions(build(slice, groupCols, measures))
    register(source.spark, source.path, summary.path, groupCols, measures)
  }

  /** Attach the rewrite to an existing session (idempotent). */
  def attach(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(Rewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ Rewrite

  object Rewrite extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else plan.transform {
        case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
      }

    /** The aggregate's child, unwrapped down to the source scan plus
      * any residual Filter (column-pruning Projects of bare attribute
      * refs are transparent; anything computed bails). */
    private def unwrap(p: LogicalPlan)
        : Option[(LogicalRelation, Option[Expression])] = p match {
      case lr: LogicalRelation => Some((lr, None))
      case Filter(c, lr: LogicalRelation) => Some((lr, Some(c)))
      case Project(pl, lr: LogicalRelation)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        Some((lr, None))
      case Project(pl, Filter(c, lr: LogicalRelation))
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        Some((lr, Some(c)))
      case _ => None
    }

    private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
      val (lr, filterOpt) = unwrap(agg.child) match {
        case Some(x) => x
        case None    => return None
      }
      val spec = rootsOf(lr).flatMap(r => Option(registry.get(r))) match {
        case Some(s) => s
        case None    => return None
      }
      // fresh expression ids per use — the same summary may serve
      // several aggregates in one query plan
      val fresh = spec.summary.newInstance()
      val sumAttr: Map[String, AttributeReference] =
        fresh.output.map(a => a.name.toLowerCase -> a).toMap

      def groupAttr(name: String): Option[AttributeReference] =
        if (spec.groupCols(name.toLowerCase)) sumAttr.get(name.toLowerCase)
        else None

      // filters may only constrain grain columns (the summary has no
      // finer rows to re-filter)
      val newFilter: Option[Expression] = filterOpt match {
        case None => None
        case Some(cond) =>
          // deterministic is load-bearing: rand() has an EMPTY
          // reference set (vacuously within the grain) but filters
          // source ROWS in the original and whole GROUPS after the
          // rewrite — silently different results
          val ok = cond.deterministic &&
            cond.references.forall(a => groupAttr(a.name).isDefined)
          if (!ok) return None
          Some(cond.transform {
            case a: AttributeReference => groupAttr(a.name).get
          })
      }

      val newGroups: Seq[Expression] = agg.groupingExpressions.map {
        case a: AttributeReference => groupAttr(a.name).getOrElse(return None)
        case _                     => return None // computed keys: bail
      }

      def measureCol(e: Expression, prefix: String): Option[AttributeReference] =
        e match {
          case a: AttributeReference if spec.measures(a.name.toLowerCase) =>
            sumAttr.get(s"$prefix${a.name.toLowerCase}")
          case _ => None
        }

      def rewriteFn(fn: AggregateFunction): Option[Expression] = fn match {
        case Count(es) if es.forall(e => e.foldable && !e.nullable) =>
          // count(*) / count(1): sum of the stored group counts; the
          // coalesce keeps the empty-source global aggregate at 0, the
          // exact value Count returns there
          sumAttr.get("cnt").map(c =>
            Coalesce(Seq(new Sum(c).toAggregateExpression(), Literal(0L))))
        case Count(Seq(e)) =>
          measureCol(e, "cnt_").map(c =>
            Coalesce(Seq(new Sum(c).toAggregateExpression(), Literal(0L))))
        case Sum(e, ansi) =>
          measureCol(e, "sum_").map(c => Sum(c, ansi).toAggregateExpression())
        case Min(e) =>
          measureCol(e, "min_").map(c => Min(c).toAggregateExpression())
        case Max(e) =>
          measureCol(e, "max_").map(c => Max(c).toAggregateExpression())
        case Average(e, _) =>
          // exact for int-family measures (stored sums are exact longs,
          // one final divide); for doubles the reduction order differs
          // from row-at-a-time avg by at most an ulp, same as any
          // partial-aggregation layout change
          for {
            s <- measureCol(e, "sum_")
            c <- measureCol(e, "cnt_")
          } yield new Divide(
            Cast(new Sum(s).toAggregateExpression(), DoubleTypeRef),
            Cast(new Sum(c).toAggregateExpression(), DoubleTypeRef))
        case _ => None
      }

      val newResult: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case a: AttributeReference =>
          val g = groupAttr(a.name).getOrElse(return None)
          if (g.dataType != a.dataType) return None
          Alias(g, a.name)(exprId = a.exprId)
        case al @ Alias(ae: AggregateExpression, name)
            if !ae.isDistinct && ae.filter.isEmpty =>
          val e = rewriteFn(ae.aggregateFunction).getOrElse(return None)
          if (e.dataType != al.dataType) return None // widened types: bail
          Alias(e, name)(exprId = al.exprId)
        // grouping keys may also surface aliased (SELECT k AS g)
        case al @ Alias(a: AttributeReference, name) =>
          val g = groupAttr(a.name).getOrElse(return None)
          if (g.dataType != al.dataType) return None
          Alias(g, name)(exprId = al.exprId)
        case _ => return None
      }

      // explicit pruning Project: only the summary columns the rewrite
      // touches reach the scan (ColumnPruning already ran by the time
      // user-provided rules fire)
      val used = (newGroups.flatMap(_.references) ++
                  newResult.flatMap(_.references) ++
                  newFilter.toSeq.flatMap(_.references))
        .map(_.exprId).toSet
      val pruned = Project(fresh.output.filter(a => used(a.exprId)), fresh)
      val child = newFilter.map(f => Filter(f, pruned)).getOrElse(pruned)
      Some(Aggregate(newGroups, newResult, child, None))
    }
  }

  // Cast target for the avg rewrite without importing the types object
  // wholesale (Sum/Min/Max above are catalyst aggregates, not columns)
  private val DoubleTypeRef = org.apache.spark.sql.types.DoubleType
}
