package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, Literal, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** TOP-K-PER-KEY as a first-class Catalyst operator — the whole-operator
  * extension tier (logical node + planner strategy + physical operator,
  * registered through `SparkSessionExtensions`) for the one query shape
  * every ranked retrieval in this engine repeats: "the k best rows per
  * key" (queue heads, kNN result lists, per-customer top orders).
  *
  * Why not `row_number().over(window)`: Spark's window operator SORTS
  * every partition of the full input after shuffling ALL of it — at
  * 100 TB the shuffle carries the whole corpus and each reducer sorts
  * its slice, only to discard all but k rows per key. This operator
  * runs in two phases, mirroring partial aggregation:
  *
  *   1. partial (pre-shuffle): every input partition keeps a bounded
  *      heap of at most k rows per key it sees — O(n log k) with NO
  *      sort, emitting ≤ k·keys_in_partition survivors;
  *   2. final (post-shuffle): survivors shuffle clustered by key
  *      (Catalyst's EnsureRequirements inserts the exchange from the
  *      declared ClusteredDistribution) and the same bounded-heap pass
  *      produces the exact per-key top k.
  *
  * The shuffle therefore carries at most k·distinct_keys·partitions
  * rows instead of the corpus, and nothing is ever fully sorted. The
  * result is exact (not approximate) for any deterministic total order;
  * callers must include a tie-break column, same as the window form.
  * Memory: the partial phase holds k rows per distinct key per
  * partition — the same cardinality envelope as hash-aggregation's
  * pre-shuffle combine.
  *
  * API: `GraftOps.topKPerKey(df, keys, k, orderSpec*)` — implemented
  * over the PUBLIC hint surface (`df.hint("graft_topk", ...)`) plus an
  * injected resolution rule, so no private Spark API is touched. The
  * helper fails fast if the extension is not installed in the session
  * (an unresolved hint would otherwise be silently dropped).
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Rewrites `hint("graft_topk", k, "key:<col>", "+<col>"/"-<col>"...)`
  * into the TopKPerKey logical node once the child is resolved. */
case class ResolveTopKHint(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case UnresolvedHint(name, params, child)
        if name.equalsIgnoreCase("graft_topk") && child.resolved =>
      val strs = params.collect { case Literal(s, _) if s != null => s.toString }
      val k = params.collectFirst { case Literal(i: Int, _) => i }
        .getOrElse(throw new IllegalArgumentException("graft_topk: missing k"))
      def attr(c: String): Attribute = child.output
        .find(a => conf.resolver(a.name, c))
        .getOrElse(throw new IllegalArgumentException(
          s"graft_topk: column $c not in ${child.output.map(_.name)}"))
      val keys = strs.filter(_.startsWith("key:")).map(s => attr(s.drop(4)))
      val order = strs.filter(s => s.startsWith("+") || s.startsWith("-")).map { s =>
        SortOrder(attr(s.drop(1)), if (s.startsWith("+")) Ascending else Descending)
      }
      require(keys.nonEmpty && order.nonEmpty, "graft_topk: needs keys and order")
      TopKPerKey(keys, order, k, child)
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // partial (map-side prune) feeding final (exact, post-exchange) —
      // EnsureRequirements inserts the key-clustered shuffle between
      // them; if the child is already clustered on the keys the
      // exchange is elided and both passes run co-located.
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap under the sort order: head = current WORST of the kept
      // rows, evicted when a better row arrives and the heap is full
      val heaps = new java.util.HashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var h = heaps.get(key)
        if (h == null) {
          h = mutable.PriorityQueue.empty(rowOrd)
          heaps.put(key.copy(), h)
        }
        if (h.size < limit) h.enqueue(row.copy())
        else if (rowOrd.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row.copy()) }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Session extension installing the hint rule + planner strategy:
  * `.config("spark.sql.extensions", classOf[GraftExtensions].getName)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(ResolveTopKHint)
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectResolutionRule(ResolveAllPairsHint)
    e.injectPlannerStrategy(_ => AllPairsStrategy)
  }
}

object GraftOps {
  /** The k best rows per key under `orderSpec` ("+col" ascending,
    * "-col" descending; include a tie-break for a total order). */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], k: Int, orderSpec: String*): DataFrame = {
    val params: Seq[Any] = Seq(k) ++ keyCols.map("key:" + _) ++ orderSpec
    val out = df.hint("graft_topk", params: _*)
    // an unresolved hint in a session without GraftExtensions would be
    // silently DROPPED (returning un-pruned rows) — fail instead
    val planned = out.queryExecution.optimizedPlan
    require(planned.collectFirst { case t: TopKPerKey => t }.isDefined,
      "graft_topk hint was not resolved - session lacks GraftExtensions " +
        "(set spark.sql.extensions=graft.plans.GraftExtensions)")
    out
  }

  /** Fused all-pairs cosine: every (stream, bcast) pair with
    * `dot >= threshold`; `ltOnly` keeps only streamId < bcastId (the
    * dedup-pair convention). Children must each be exactly
    * (id BIGINT, vec ARRAY<DOUBLE>); the second argument broadcasts. */
  def allPairsCosine(stream: DataFrame, bcast: DataFrame, threshold: Double,
      ltOnly: Boolean): DataFrame = {
    val params: Seq[Any] =
      if (ltOnly) Seq(threshold, "lt") else Seq(threshold)
    val out = stream.crossJoin(bcast).hint("graft_allpairs", params: _*)
    val planned = out.queryExecution.optimizedPlan
    require(planned.collectFirst { case a: AllPairsCosine => a }.isDefined,
      "graft_allpairs hint was not resolved - session lacks GraftExtensions " +
        "(set spark.sql.extensions=graft.plans.GraftExtensions)")
    out
  }
}
