package graft.plans

import java.util.concurrent.CopyOnWriteArrayList

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, AttributeReference, Literal, NamedExpression, NullsLast, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}

import graft.functions.CosineDistance
import graft.ops.AnnIndex

/** Opt-in ANN plan substitution — SURVEY §7's one optional `Rule` stretch
  * (brief preference (c): extend the planner only where built-ins can't).
  *
  * A brute-force vector top-k is the plan
  * `GlobalLimit k (Sort [cos_dist asc] (Project [id, cos_dist] scan))`.
  * When the scanned relation has a REGISTERED [[AnnIndex]] and the session
  * opts in (`spark.graft.ann.autoProbe=true`), this rule swaps the whole
  * subtree for the index's `probeTopK` plan — scanning `nprobe` centroid
  * buckets instead of every vector, the classic vector-database index
  * substitution.
  *
  * The rewrite is APPROXIMATE (an IVF probe can miss true neighbors in
  * unprobed buckets), which is why it is conf-gated off by default and
  * never applied implicitly: exactly the contract every vector store
  * documents for index-backed search. Matching is deliberately narrow —
  * ascending cosine-distance-to-literal sort, optional id tie-break,
  * projection of exactly (id, distance), relation canonically equal to the
  * registered one — anything else is left untouched.
  */
object AnnCatalog {

  /** A registered substitution: when the brute-force shape matches `plan`,
    * `probe(qvec, k)` supplies the replacement frame — any index tier
    * whose probe returns `(idCol, cos_dist)` rows plugs in (IVF
    * [[AnnIndex.probeTopK]], at-rest PQ ADC rerank, graph beam probe).
    */
  final case class Entry(plan: LogicalPlan, idCol: String, vecCol: String,
      probe: (Array[Double], Int) => DataFrame) {
    /** Spliced-plan memo per (query vector, k): the SAME logical query is
      * optimized more than once per materialization (`.explain` /
      * plan-assertion then execution each build a fresh QueryExecution,
      * and every `df.write`/`df.count` re-optimizes from the logical
      * plan), and without this memo each pass re-RUNS the probe — for the
      * driver-beam graph tier that doubled the gate's wall (measured
      * 0.98 s → the probe itself is ~0.3-0.4 s per execution). The
      * registered relation is immutable for the registration's lifetime
      * (the index was built over it; a re-registration is a new Entry, so
      * a new memo), which makes the cached plan safe to re-splice. The
      * memo holds bounded k-row LocalRelations / probe join plans, not
      * data-scale state — but a long-lived registration serving many
      * DISTINCT query vectors would still grow it without bound, so it is
      * size-capped: past [[AnnCatalog.MemoMaxEntries]] new (qvec, k) pairs
      * run uncached (the cache exists to dedup re-optimizations of the
      * SAME query, which land immediately after the first pass).
      */
    private[plans] val memo =
      new scala.collection.concurrent.TrieMap[(Seq[Double], Int), LogicalPlan]

    private[plans] def memoized(qvec: Array[Double], k: Int)
        (run: => LogicalPlan): LogicalPlan = {
      val key = (qvec.toSeq, k)
      memo.get(key) match {
        case Some(p) => p
        case None =>
          val p = run
          if (memo.size < AnnCatalog.MemoMaxEntries) memo.putIfAbsent(key, p)
          p
      }
    }
  }

  /** Per-entry probe-plan memo cap (distinct (qvec, k) pairs). */
  private[plans] val MemoMaxEntries = 256

  private val entries = new CopyOnWriteArrayList[Entry]()

  /** Register `df` (the exact frame the index was built over) as probe-able.
    * Matching uses the canonicalized analyzed plan, so a re-read of the
    * same source matches too.
    */
  def register(df: DataFrame, idCol: String, vecCol: String, index: AnnIndex,
      nprobe: Int = 4): Unit =
    registerProbe(df, idCol, vecCol, (q, k) => index.probeTopK(q, k, nprobe))

  /** Register an arbitrary probe tier for `df`: `probe(qvec, k)` must
    * return a `(idCol, cos_dist)` frame ordered (dist asc nulls-last, id
    * asc) and limited to k — the contract every probe in graft.ops
    * already satisfies. This is how the at-rest PQ and graph-index tiers
    * ride the same brute-force-shaped query substitution as IVF.
    */
  def registerProbe(df: DataFrame, idCol: String, vecCol: String,
      probe: (Array[Double], Int) => DataFrame): Unit =
    entries.add(Entry(df.queryExecution.analyzed.canonicalized, idCol, vecCol,
      probe))

  def clear(): Unit = entries.clear()

  private[plans] def lookup(plan: LogicalPlan): Option[Entry] =
    entries.asScala.find(_.plan == plan.canonicalized)
}

object AnnProbeRule {
  /** Session opt-in flag; harnesses reset it (with [[AnnCatalog.clear]])
    * after a probe-substituted frame is materialized.
    */
  val ConfKey = "spark.graft.ann.autoProbe"

  /** Re-entrancy guard: while `entry.probe` runs (on the planning thread),
    * every micro-plan the probe itself builds — the graph walk's per-round
    * point reads, the PQ rerank join — passes back through this rule.
    * None of them can match (their shapes aren't a registered brute-force
    * scan), but each GlobalLimit+Sort+Project candidate would still pay a
    * catalog lookup with a plan CANONICALIZATION — measured ~0.5 s of pure
    * rule overhead inside one graph probe. Probes are driver-side and
    * planned on the calling thread, so a thread-local flag is exact.
    */
  private[plans] val inProbe = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = java.lang.Boolean.FALSE
  }
}

case class AnnProbeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  val ConfKey = AnnProbeRule.ConfKey

  private def enabled: Boolean =
    spark.conf.getOption(ConfKey).contains("true")

  private def literalVector(l: Literal): Option[Array[Double]] = l match {
    case Literal(data: ArrayData, ArrayType(DoubleType, _)) =>
      Some(data.toDoubleArray())
    case Literal(data: ArrayData, ArrayType(FloatType, _)) =>
      Some(data.toFloatArray().map(_.toDouble))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || AnnProbeRule.inProbe.get) return plan
    // plan instances spliced into THIS traversal (identity): two matching
    // subtrees for the same (qvec, k) in one query must not both receive
    // the identical memoized plan instance — its internal exprIds would
    // then appear twice in one optimized tree, risking ambiguous attribute
    // resolution. On a collision the probe re-runs uncached (fresh
    // exprIds), exactly the pre-memo behavior; the memo's purpose —
    // deduping re-OPTIMIZATIONS of the same query — is unaffected, since
    // each re-optimization is a fresh apply() with an empty set.
    val spliced = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.transformDown {
      case gl @ GlobalLimit(Literal(k: Int, IntegerType),
          LocalLimit(_, Sort(orders, true,
            Project(projList, child), _))) if k > 0 =>
        // the spliced probe plan never re-matches: its Sort+Limit sits over
        // a semi-join, not a registered relation
        rewrite(k, orders, projList, child, spliced).getOrElse(gl)
    }
  }

  /** The narrow match + splice; None leaves the plan untouched. */
  private def rewrite(k: Int, orders: Seq[SortOrder],
      projList: Seq[NamedExpression], child: LogicalPlan,
      spliced: java.util.Set[LogicalPlan]): Option[LogicalPlan] = {
    val resolver = spark.sessionState.conf.resolver
    for {
      entry <- AnnCatalog.lookup(child)
      // projection must be exactly (id attribute, distance alias), and the
      // distance must be computed over the REGISTERED vector column — a
      // top-k over a different array column of the same relation (a second
      // embedding, quantized codes) must not be answered by this index
      distAlias <- projList.collectFirst {
        case a @ Alias(CosineDistance(v: AttributeReference, l: Literal), _)
            if literalVector(l).isDefined && resolver(v.name, entry.vecCol) => a
      }
      idAttr <- projList.collectFirst {
        case ar: AttributeReference if resolver(ar.name, entry.idCol) => ar
      }
      if projList.size == 2
      // sort: distance ascending nulls-last first, optionally the id as
      // tie-break. probeTopK orders asc_nulls_last, so a NullsFirst sort
      // (plain .asc) would change where null-distance rows land — reject it
      if orders.nonEmpty && orders.head.direction == Ascending &&
        orders.head.nullOrdering == NullsLast &&
        orders.head.child.references.subsetOf(
          org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(distAlias.toAttribute)))
      if orders.drop(1).forall(o => o.direction == Ascending &&
        o.child.references.subsetOf(
          org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(idAttr))))
      if orders.size <= 2
      qvec <- distAlias.child match {
        case CosineDistance(_, l: Literal) => literalVector(l)
        case _ => None
      }
    } yield {
      def runProbe: LogicalPlan = {
        AnnProbeRule.inProbe.set(true)
        try entry.probe(qvec, k).queryExecution.optimizedPlan
        finally AnnProbeRule.inProbe.set(false)
      }
      val memoPlan = entry.memoized(qvec, k)(runProbe)
      // intra-plan duplicate of the same memoized instance → fresh probe
      val probePlan = if (spliced.add(memoPlan)) memoPlan else runProbe
      val idOut = probePlan.output.find(_.name == entry.idCol).get
      val distOut = probePlan.output.find(_.name == "cos_dist").get
      // preserve the original output attributes (names AND exprIds) so
      // downstream operators keep resolving
      val outProj = projList.map {
        case ar: AttributeReference if ar.name == entry.idCol =>
          Alias(idOut, ar.name)(exprId = ar.exprId)
        case a: Alias => Alias(distOut, a.name)(exprId = a.exprId)
        case other => other
      }
      Project(outProj, probePlan)
    }
  }
}
