package graft.plans

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types._

import graft.analytics.Similarity
import graft.functions.{DuckRound, VecDot}

/** One registered similarity store: the serve-side artifacts
  * (assignment store + frozen quantizer + covering radii, all
  * collected/persisted at registration so plan construction at
  * rewrite time runs ZERO jobs) plus the corpus leaf they cover.
  * Obtained from [[RewriteSimTopK.register]]; pass back to
  * `unregister` when the store retires. */
final class SimStoreHandle private[plans] (
    val label: String,
    private[plans] val corpusLeaf: LogicalPlan,
    private[plans] val store: DataFrame,
    private[plans] val quant: Array[(Long, Array[Double], Double)],
    private[plans] val radii: Map[Long, Double],
    private[plans] val nProbe0: Int) {
  private[plans] val hits = new AtomicLong(0L)
  /** How many times the rewrite substituted this store's serve plan. */
  def hitCount: Long = hits.get
}

/** Optimizer rule: rewrite the brute-force cosine top-k pattern
  * ([[Similarity.bruteForceTopK]]'s exact plan shape —
  *
  * {{{
  *   Project [qid, nid, sim, cast(rn as bigint) AS rnk]
  *     Filter rn <= k
  *       Window [row_number() over (partition by qid
  *                                  order by sim DESC, nid ASC)]
  *         Project [qid, nid, duckround(vecdot(qv,nv)/(qn·nn), 6) AS sim]
  *           Join Inner, qid <> nid
  *             corpus.select(vec_id AS nid, embedding AS nv, ‖nv‖ AS nn)
  *             queries.select(… AS qid, … AS qv, ‖qv‖ AS qn)
  * }}}
  *
  * ) into the store-served bound-pruned plan
  * ([[Similarity.exactTopKFromStoreModel]]) when a registered store
  * covers the scanned corpus. The substitute is EXACT — the
  * triangle-inequality cell bound only ever discards rows that
  * provably cannot reach the top-k — so the rewrite is
  * semantics-preserving on any data distribution (the one spelled-out
  * exception: a zero-norm vector makes the brute spelling THROW under
  * ANSI ÷0 where the served plan yields null sims ranked last — the
  * rewrite assumes the spelling's own precondition). Approximate
  * serving (IVF-PQ, q153/q154) stays an explicit opt-in carrying
  * q98's recall audit; the planner never substitutes approximation.
  *
  * Declines — the rewrite fires only when it is provably
  * semantics-preserving, and RewriteSimTopKSpec pins each decline:
  *  - no registered store covers the corpus leaf (or the corpus side
  *    carries a Filter beyond the optimizer's inferred IsNotNull — a
  *    filtered corpus is NOT the stored corpus);
  *  - the score is not the canonical rounded cosine (plain dot, a
  *    different rounding scale, missing normalization);
  *  - the window computes anything beyond the single row_number, its
  *    ordering differs from (sim DESC NULLS LAST, nid ASC), or the
  *    rank survives into downstream expressions beyond the
  *    filter-then-cast shape;
  *  - the join is not the inner self-exclusion `qid <> nid`.
  *
  * Same philosophy as [[RewriteWindowTopK]]: users keep the
  * declarative spelling; the optimizer picks the served plan.
  * Activated via GraftExtensions.
  */
object RewriteSimTopK extends Rule[LogicalPlan] with PredicateHelper {

  private val entries =
    new java.util.concurrent.CopyOnWriteArrayList[SimStoreHandle]

  /** Register a persisted IVF assignment store (vec_id, cid,
    * embedding) + its frozen centroids as the serve path for
    * `corpus`. Collects the quantizer and the per-cell covering radii
    * ONCE (model-sized, one job) so rewrite-time plan construction is
    * pure. The caller owns the store's lifecycle (persist/checkpoint
    * before registering; `unregister` when it retires). */
  def register(corpus: DataFrame, store: DataFrame, centroids: DataFrame,
               nProbe0: Int = 2, label: String = "sim-store"): SimStoreHandle = {
    val leaves = corpus.queryExecution.analyzed.collectLeaves()
    require(leaves.length == 1,
      s"RewriteSimTopK.register: corpus must scan exactly one relation, got ${leaves.length}")
    val h = new SimStoreHandle(label, leaves.head, store,
      Similarity.collectModel(centroids),
      Similarity.cellRadii(store, centroids), nProbe0)
    entries.add(h)
    h
  }

  def unregister(h: SimStoreHandle): Unit = entries.remove(h)

  def clear(): Unit = entries.clear()

  /** File-source leaves compare by (format, root paths, schema) — two
    * `spark.read.parquet(p)` calls build distinct FileIndex instances
    * that never compare equal, but they scan the same table. Other
    * leaves (LocalRelation, LogicalRDD) compare canonicalized. */
  private def leafKey(leaf: LogicalPlan): Option[String] = leaf match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        Some(fs.fileFormat.getClass.getName + "|" +
          fs.location.rootPaths.map(_.toString).sorted.mkString(",") + "|" +
          lr.output.map(a => a.name + ":" + a.dataType.catalogString).mkString(","))
      case _ => None
    }
    case _ => None
  }

  private def sameCorpus(a: LogicalPlan, b: LogicalPlan): Boolean =
    (leafKey(a), leafKey(b)) match {
      case (Some(x), Some(y)) => x == y
      case _ => a.canonicalized == b.canonicalized
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (entries.isEmpty) plan
    else plan.transform {
      case p @ Project(plist, Filter(cond, w: Window)) =>
        tryRewrite(p, plist, cond, w).getOrElse(p)
    }

  private def tryRewrite(p: Project, plist: Seq[NamedExpression],
                         cond: Expression, w: Window): Option[LogicalPlan] = {
    for {
      // exactly one rank alias cast(rn as bigint), three passthroughs
      (rnkAlias, weRef) <- plist.collect {
        case a @ Alias(Cast(we: AttributeReference, LongType, _, _), _) => (a, we)
      } match {
        case Seq(one) if plist.length == 4 => Some(one)
        case _ => None
      }
      k <- cond match {
        case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
          if a.exprId == weRef.exprId && k >= 1 => Some(k)
        case _ => None
      }
      // the window computes exactly the one row_number the filter consumes
      _ <- w.windowExpressions match {
        case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _))
          if a.toAttribute.exprId == weRef.exprId => Some(())
        case _ => None
      }
      qAttr <- w.partitionSpec match {
        case Seq(a: AttributeReference) => Some(a)
        case _ => None
      }
      (sAttr, nAttr) <- w.orderSpec match {
        case Seq(SortOrder(s: AttributeReference, Descending, NullsLast, _),
                 SortOrder(n: AttributeReference, Ascending, NullsFirst, _)) =>
          Some((s, n))
        case _ => None
      }
      // the passthrough columns are exactly (qid, nid, sim)
      _ <- {
        val pass = plist.collect { case a: AttributeReference => a.exprId }
        if (pass.toSet == Set(qAttr.exprId, nAttr.exprId, sAttr.exprId) &&
            pass.length == 3) Some(()) else None
      }
      // strip Spark's own sort-based group-limit (see RewriteWindowTopK)
      inner = w.child match {
        case wgl: WindowGroupLimit if wgl.limit >= k => wgl.child
        case c => c
      }
      (simAlias, join) <- inner match {
        case Project(pl, j: Join) if pl.length == 3 =>
          val attrs = pl.collect { case a: AttributeReference => a.exprId }
          pl.collect { case a: Alias => a } match {
            case Seq(al) if al.toAttribute.exprId == sAttr.exprId &&
                attrs.toSet == Set(qAttr.exprId, nAttr.exprId) => Some((al, j))
            case _ => None
          }
        case _ => None
      }
      // the score must be the canonical rounded cosine
      (qv, nv, qn, nn) <- simAlias.child match {
        case DuckRound(Divide(VecDot(a: AttributeReference, b: AttributeReference),
                              Multiply(c: AttributeReference, d: AttributeReference, _),
                              _), 6) => Some((a, b, c, d))
        case _ => None
      }
      _ <- join.joinType match { case Inner => Some(()); case _ => None }
      _ <- join.condition match {
        case Some(Not(EqualTo(x: AttributeReference, y: AttributeReference)))
          if Set(x.exprId, y.exprId) == Set(qAttr.exprId, nAttr.exprId) => Some(())
        case _ => None
      }
      (qSide, cSide) <-
        if (join.left.outputSet.contains(qAttr) &&
            join.right.outputSet.contains(nAttr)) Some((join.left, join.right))
        else if (join.right.outputSet.contains(qAttr) &&
                 join.left.outputSet.contains(nAttr)) Some((join.right, join.left))
        else None
      entry <- matchCorpusSide(cSide, nAttr, nv, nn)
      qPlan <- matchQuerySide(qSide, qAttr, qv, qn)
    } yield {
      val spark = entry.store.sparkSession
      val queries = DatasetBridge.ofRows(spark, qPlan)
      val served = Similarity.exactTopKFromStoreModel(
          queries, entry.store, entry.quant, entry.radii, k, entry.nProbe0)
        .queryExecution.optimizedPlan
      val byName = served.output.map(a => a.name -> a).toMap
      entry.hits.incrementAndGet()
      logInfo(s"RewriteSimTopK: serving top-$k from store '${entry.label}'")
      Project(plist.map {
        case a: AttributeReference if a.exprId == qAttr.exprId =>
          Alias(byName("qid"), a.name)(exprId = a.exprId)
        case a: AttributeReference if a.exprId == nAttr.exprId =>
          Alias(byName("nid"), a.name)(exprId = a.exprId)
        case a: AttributeReference =>
          Alias(byName("sim"), a.name)(exprId = a.exprId)
        case a: Alias =>
          Alias(byName("rnk"), a.name)(exprId = a.exprId)
      }, served)
    }
  }

  /** corpus side: Project[vec_id AS nid, embedding AS nv, ‖·‖ AS nn]
    * over (inferred IsNotNull filter |) a leaf a registered store
    * covers. Any OTHER filter means the scanned corpus is not the
    * stored corpus → decline. */
  private def matchCorpusSide(side: LogicalPlan, nAttr: AttributeReference,
                              nv: AttributeReference,
                              nn: AttributeReference): Option[SimStoreHandle] =
    side match {
      case Project(pl, child) if pl.length == 3 =>
        for {
          vecId <- pl.collectFirst {
            case a @ Alias(v: AttributeReference, _)
              if a.toAttribute.exprId == nAttr.exprId => v
          }
          emb <- pl.collectFirst {
            case a @ Alias(v: AttributeReference, _)
              if a.toAttribute.exprId == nv.exprId => v
          }
          _ <- pl.collectFirst {
            case a @ Alias(Sqrt(VecDot(e1: AttributeReference, e2: AttributeReference)), _)
              if a.toAttribute.exprId == nn.exprId &&
                 e1.exprId == emb.exprId && e2.exprId == emb.exprId => ()
          }
          // the store is keyed by the corpus's (vec_id, embedding)
          _ <- if (vecId.name == "vec_id" && emb.name == "embedding") Some(()) else None
          leaf <- child match {
            case f: Filter
              if splitConjunctivePredicates(f.condition)
                .forall { case IsNotNull(_: AttributeReference) => true; case _ => false } =>
              Some(f.child)
            case l if l.children.isEmpty => Some(l)
            case _ => None
          }
          _ <- if (leaf.children.isEmpty) Some(()) else None
          entry <- {
            val it = entries.iterator()
            var found: Option[SimStoreHandle] = None
            while (found.isEmpty && it.hasNext) {
              val e = it.next()
              if (sameCorpus(leaf, e.corpusLeaf)) found = Some(e)
            }
            found
          }
        } yield entry
      case _ => None
    }

  /** query side: Project[… AS qid, … AS qv, ‖qv‖ AS qn] over any
    * subplan. Returns the (vec_id, embedding) plan the serve path
    * takes as its query set. */
  private def matchQuerySide(side: LogicalPlan, qAttr: AttributeReference,
                             qv: AttributeReference,
                             qn: AttributeReference): Option[LogicalPlan] =
    side match {
      case Project(pl, child) if pl.length == 3 =>
        for {
          qidE <- pl.collectFirst {
            case a: Alias if a.toAttribute.exprId == qAttr.exprId => a.child
          }
          qvE <- pl.collectFirst {
            case a: Alias if a.toAttribute.exprId == qv.exprId => a.child
          }
          _ <- pl.collectFirst {
            case a @ Alias(Sqrt(VecDot(e1, e2)), _)
              if a.toAttribute.exprId == qn.exprId &&
                 e1.semanticEquals(qvE) && e2.semanticEquals(qvE) => ()
          }
        } yield Project(Seq(
          Alias(qidE, "vec_id")(), Alias(qvE, "embedding")()), child)
      case _ => None
    }
}
