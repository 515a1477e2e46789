package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types._

import graft.storage.StatsSkipping.ColRange

/** DEFAULT-path manifest stats skipping: an optimizer rule that rewrites
  * `Filter(pred, scan)` over any parquet relation whose data directory
  * carries a Graft `_stats` sidecar to scan ONLY the files whose
  * recorded per-column [min, max] can intersect the predicate — so an
  * ordinary `spark.table("t").filter(...)` (or SQL `WHERE`) on a
  * committed, range/Z-clustered table plans a query-proportional file
  * subset with no Graft API in the query at all. This is the Delta-log
  * behavior the reference's `CLUSTER BY` relies on
  * (`scripts/gold/fact_order_items.sql:9`): cluster at write, every
  * selective read prunes.
  *
  * Registered two ways: `spark.sql.extensions=graft.ext.GraftExtensions`
  * at session build, or [[StatsSkipping.installRule]] on a live session
  * (`spark.experimental.extraOptimizations` — runs after the operator
  * optimization batches, so filters are already pushed down next to the
  * scan when it fires).
  *
  * STRICTLY A SKIP, NEVER A FILTER: the `Filter` stays in place above
  * the pruned scan and every row of every surviving file still flows
  * through it — an over-broad survivor set costs IO, never correctness.
  * Conservative everywhere: only conjuncts of the shapes
  * `attr (=|>|>=|<|<=) literal`, `literal (...) attr`, `attr IN (...)`
  * and `attr BETWEEN` (which arrives as two conjuncts) on bare
  * attributes prune; casts, functions, disjunctions and every other
  * shape contribute nothing. A file with no stats row for a constrained
  * column always survives. Relations with partition columns are left to
  * Spark's own partition pruning (the sidecar requires a flat layout).
  *
  * Scale: the decision reads ONE cached sidecar per table version (a
  * getFileStatus probe per query once warm) instead of a footer GET per
  * file — at a million files this is the difference between planning in
  * milliseconds and planning in minutes.
  */
object StatsSkippingRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, lr: LogicalRelation) =>
      pruned(cond, lr).map(Filter(cond, _)).getOrElse(f)
  }

  private def pruned(cond: Expression,
      lr: LogicalRelation): Option[LogicalRelation] = lr.relation match {
    case rel: HadoopFsRelation
      if rel.fileFormat.isInstanceOf[
          org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] =>
      val spark = rel.sparkSession
      val files = rel.location.inputFiles
      if (files.isEmpty) return None
      // One sidecar per distinct parent directory (a pruned re-visit
      // lists the files themselves as roots — their parent is still the
      // stats-bearing version directory, so the rule is idempotent and
      // reaches a fixpoint on the second pass).
      val parents = files.map(f => new Path(f).getParent.toString).distinct
      val statsByDir: Map[String, Map[String, Map[String, ColRange]]] =
        parents.flatMap { p =>
          val dir = new Path(p)
          if (!StatsSkipping.probeAllowed(spark, dir)) None
          else StatsSkipping.loadStats(spark, dir).map(p -> _)
        }.toMap
      if (statsByDir.isEmpty) return None
      // The stat type each constrained column compares under — taken
      // from the sidecar itself (one type per column per table; a
      // mixed-type column never prunes).
      val colTpe: Map[String, String] = statsByDir.values
        .flatMap(_.values).flatten
        .groupBy(_._1).flatMap { case (c, rs) =>
          val ts = rs.map(_._2.tpe).toSet
          if (ts.size == 1) Some(c -> ts.head) else None
        }
      if (colTpe.isEmpty) return None
      val bounds = extractBounds(cond, colTpe)
      if (bounds.isEmpty) return None
      val surviving = files.filter { fp =>
        val p = new Path(fp)
        val fileStats: Map[String, ColRange] = statsByDir
          .getOrElse(p.getParent.toString, Map.empty)
          .getOrElse(p.getName, Map.empty)
        bounds.forall { case (c, (lo, hi)) =>
          fileStats.get(c).forall(r => StatsSkipping.intersects(r, lo, hi))
        }
      }
      if (surviving.length == files.length) None
      else if (rel.partitionSchema.isEmpty) {
        val idx = new InMemoryFileIndex(spark,
          surviving.map(new Path(_)).toSeq, rel.options,
          Some(rel.dataSchema))
        Some(lr.copy(relation =
          rel.copy(location = idx)(spark)))
      } else {
        // PARTITIONED relation (sidecars written per leaf directory by
        // StatsSkipping.indexLeafDirs): the rebuilt index must carry
        // the PARTITION VALUES, which live in directory names — so the
        // original index's partition spec (already partition-pruned by
        // Spark's own rules, which run before this batch) is narrowed
        // to the directories that still hold a surviving file and
        // handed to the new index explicitly. Partition pruning first,
        // sidecar skipping second — the two compose, Delta-style. A
        // non-partitioning-aware index shape bails (conservative).
        import org.apache.spark.sql.execution.datasources.{PartitioningAwareFileIndex, PartitionSpec}
        rel.location match {
          case pa: PartitioningAwareFileIndex =>
            val spec = pa.partitionSpec()
            val survivingDirs = surviving
              .map(f => new Path(f).getParent.toString).toSet
            val prunedSpec = PartitionSpec(spec.partitionColumns,
              spec.partitions.filter(p =>
                survivingDirs.contains(p.path.toString)))
            val idx = new InMemoryFileIndex(spark,
              surviving.map(new Path(_)).toSeq, rel.options,
              Some(rel.dataSchema),
              userSpecifiedPartitionSpec = Some(prunedSpec))
            Some(lr.copy(relation = rel.copy(location = idx)(spark)))
          case _ => None
        }
      }
    case _ => None
  }

  /** Per-column [lo, hi] envelope (decoded to the column's stat type)
    * implied by the predicate's understood conjuncts. Strict bounds are
    * relaxed to inclusive — sound for pruning, marginally over-broad.
    */
  private def extractBounds(cond: Expression,
      colTpe: Map[String, String]
      ): Map[String, (Option[Any], Option[Any])] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val perCol = scala.collection.mutable.Map
      .empty[String, (Option[Any], Option[Any])]
    def tight(tpe: String, a: Option[Any], b: Option[Any],
        takeMax: Boolean): Option[Any] = (a, b) match {
      case (Some(x), Some(y)) =>
        val c = StatsSkipping.cmp(tpe, x, y)
        Some(if ((c >= 0) == takeMax) x else y)
      case (x, y) => x.orElse(y)
    }
    // A decoded bound must live in the recorded stat type's domain — a
    // sidecar written under an OLD schema (evolution changed the
    // column's type) must mean "no pruning", never a ClassCastException
    // inside the optimizer.
    def fits(tpe: String, v: Any): Boolean = tpe match {
      case "long" => v.isInstanceOf[Long]
      case "double" => v.isInstanceOf[Double]
      case "decimal" => v.isInstanceOf[java.math.BigDecimal]
      case "string" => v.isInstanceOf[Array[Byte]]
      case _ => false
    }
    def add(col: String, lo: Option[Any], hi: Option[Any]): Unit =
      colTpe.get(col).foreach { tpe =>
        if (lo.forall(fits(tpe, _)) && hi.forall(fits(tpe, _))) {
          val (l0, h0) = perCol.getOrElse(col, (None, None))
          perCol(col) = (tight(tpe, l0, lo, takeMax = true),
            tight(tpe, h0, hi, takeMax = false))
        }
      }
    conjuncts(cond).foreach {
      case EqualTo(a: AttributeReference, l: Literal) =>
        lit(a, l).foreach(v => add(a.name, Some(v), Some(v)))
      case EqualTo(l: Literal, a: AttributeReference) =>
        lit(a, l).foreach(v => add(a.name, Some(v), Some(v)))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        lit(a, l).foreach(v => add(a.name, Some(v), None))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        lit(a, l).foreach(v => add(a.name, Some(v), None))
      case LessThan(a: AttributeReference, l: Literal) =>
        lit(a, l).foreach(v => add(a.name, None, Some(v)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        lit(a, l).foreach(v => add(a.name, None, Some(v)))
      case GreaterThan(l: Literal, a: AttributeReference) =>
        lit(a, l).foreach(v => add(a.name, None, Some(v)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        lit(a, l).foreach(v => add(a.name, None, Some(v)))
      case LessThan(l: Literal, a: AttributeReference) =>
        lit(a, l).foreach(v => add(a.name, Some(v), None))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        lit(a, l).foreach(v => add(a.name, Some(v), None))
      case In(a: AttributeReference, vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        // Envelope of the IN-list: [min, max] — conservative for a
        // sparse list, exact for the dense lists clustering produces.
        colTpe.get(a.name).foreach { tpe =>
          val decoded = vs.flatMap(v => lit(a, v.asInstanceOf[Literal]))
          if (decoded.size == vs.size && decoded.forall(fits(tpe, _))) {
            val sorted = decoded.sortWith(StatsSkipping.cmp(tpe, _, _) < 0)
            add(a.name, Some(sorted.head), Some(sorted.last))
          }
        }
      case _ => () // not understood: contributes no bound (conservative)
    }
    perCol.toMap
  }

  /** A predicate literal decoded into the attribute's STAT-type domain
    * — None (no pruning from this conjunct) when the literal is null or
    * the (column type, literal type) pair has no exact mapping. The
    * mapping is exact by construction: catalyst stores DateType as epoch
    * days and TimestampType as epoch micros, the same integers the
    * parquet footers record.
    */
  private def lit(a: AttributeReference, l: Literal): Option[Any] =
    if (l.value == null) None
    else (a.dataType, l.dataType, l.value) match {
      case (t1, t2, v) if t1 != t2 => None // optimizer inserts casts, not this
      case (ByteType | ShortType | IntegerType | LongType | DateType,
        _, v) => Some(v.toString.toLong)
      case (TimestampType | TimestampNTZType, _, v: Long) => Some(v)
      case (FloatType, _, v: Float) => Some(v.toDouble)
      case (DoubleType, _, v: Double) => Some(v)
      case (_: DecimalType, _, v: org.apache.spark.sql.types.Decimal) =>
        Some(v.toJavaBigDecimal)
      case (StringType, _, v) =>
        Some(v.toString.getBytes("UTF-8"))
      case _ => None
    }
}
