package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Literal, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** ALL-PAIRS COSINE as a first-class Catalyst operator — the fused
  * broadcast similarity join Spark cannot express efficiently: a
  * `broadcast(a).join(b, cond)` with a vector dot product in the
  * projection plans as BroadcastNestedLoopJoin, which Spark NEVER
  * whole-stage-codegens; every candidate pair materializes a joined row
  * and evaluates the dot through `ArrayData` getters before the
  * threshold can reject it.
  *
  * This operator fuses pair enumeration, the dot product, and the
  * threshold into one tight loop over PRIMITIVE double[] arrays:
  *
  *   - the right (smaller) side broadcasts via Catalyst's own
  *     `BroadcastDistribution(IdentityBroadcastMode)` — the planner
  *     inserts the `BroadcastExchange`, so AQE/reuse still apply;
  *   - each task decodes the broadcast rows ONCE into id/vector
  *     primitive arrays (not per streamed row);
  *   - rejected pairs allocate nothing: no joined row, no ArrayData
  *     box — just the running double accumulator.
  *
  * The dot folds sequentially ascending over `min(|a|,|b|)` elements —
  * bit-identical to the `graft_dot` expression and the DuckDB oracle's
  * `list_dot_product`, so swapping the BNLJ formulation for this
  * operator changes no result (AllPairsSpec asserts exact equality).
  *
  * At 100 TB the stream side stays fully partition-parallel with zero
  * shuffle; the broadcast side is the query/probe set (bounded by
  * construction). For corpus×corpus similarity use the bucketed LSH
  * path (`sim_bucketed_pairs`) — this operator is the exact-scoring
  * tier: query batches, verification stages, re-ranking.
  *
  * API: `GraftOps.allPairsCosine(stream, bcast, threshold, ltOnly)` —
  * public hint surface over a cross join (same pattern as
  * [[TopKPerKey]]), no private Spark API.
  */
case class AllPairsCosine(
    threshold: Double,
    ltOnly: Boolean,
    left: LogicalPlan,
    right: LogicalPlan,
    cosAttr: Attribute = AttributeReference("cos", DoubleType, nullable = false)())
  extends BinaryNode {

  override def output: Seq[Attribute] =
    Seq(left.output.head, right.output.head, cosAttr)

  // ColumnPruning consults `references` for what this node consumes:
  // every child column (id AND vector) is load-bearing
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AllPairsCosine =
    copy(left = newLeft, right = newRight)
}

/** Rewrites `a.crossJoin(b).hint("graft_allpairs", threshold[, "lt"])`
  * into the AllPairsCosine logical node. Children must each expose
  * exactly (id BIGINT, vec ARRAY<DOUBLE>). */
case class ResolveAllPairsHint(spark: SparkSession) extends Rule[LogicalPlan] {
  private def ok(p: LogicalPlan): Boolean = p.output.length == 2 &&
    p.output.head.dataType == LongType &&
    (p.output(1).dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case UnresolvedHint(name, params, j @ Join(l, r, _, None, _))
        if name.equalsIgnoreCase("graft_allpairs") && j.resolved =>
      val threshold = params.collectFirst {
        case Literal(d: Double, _) => d
      }.getOrElse(throw new IllegalArgumentException(
        "graft_allpairs: missing threshold"))
      val lt = params.exists {
        case Literal(s, _) if s != null => s.toString == "lt"
        case _ => false
      }
      require(ok(l) && ok(r), "graft_allpairs: children must be " +
        s"(id BIGINT, vec ARRAY<DOUBLE>); got ${l.output} / ${r.output}")
      AllPairsCosine(threshold, lt, l, r)
  }
}

object AllPairsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AllPairsCosine(th, lt, l, r, cos) =>
      AllPairsCosineExec(th, lt, cos, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AllPairsCosineExec(
    threshold: Double,
    ltOnly: Boolean,
    cosAttr: Attribute,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    Seq(left.output.head, right.output.head, cosAttr)

  // right side broadcasts as raw rows; EnsureRequirements inserts the
  // BroadcastExchange (visible in explain, reusable across the plan)
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val th = threshold
    val lt = ltOnly
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { iter =>
      // decode the broadcast rows ONCE per task into primitive arrays
      val rel = bcast.value
      val m = rel.length
      val ids = new Array[Long](m)
      val vecs = new Array[Array[Double]](m)
      var j = 0
      while (j < m) {
        ids(j) = rel(j).getLong(0)
        vecs(j) = rel(j).getArray(1).toDoubleArray()
        j += 1
      }
      // sort the broadcast side by id: in ltOnly mode each streamed row
      // then scores only the suffix ids(k) > ida (binary-searched start)
      // instead of testing-and-skipping half the pairs — the output set
      // is order-insensitive, so the permutation is free
      if (lt && m > 1) {
        val order = Array.range(0, m).sortBy(ids)
        val sIds = new Array[Long](m)
        val sVecs = new Array[Array[Double]](m)
        var p = 0
        while (p < m) { sIds(p) = ids(order(p)); sVecs(p) = vecs(order(p)); p += 1 }
        System.arraycopy(sIds, 0, ids, 0, m)
        System.arraycopy(sVecs, 0, vecs, 0, m)
      }
      // first index with ids(k) > x over the (lt-sorted) ids
      def upperBound(x: Long): Int = {
        var lo = 0; var hi = m
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (ids(mid) <= x) lo = mid + 1 else hi = mid
        }
        lo
      }
      // SIMD-friendly layout: when every broadcast vector has the same
      // dimension (the embedding-table case — always true here), pack
      // them into ONE contiguous double[] with stride d. The scoring
      // kernel then reads sequential memory instead of chasing m object
      // pointers, and blocks 4 vectors per pass so each load of the
      // streamed va(i) feeds 4 independent accumulators — the classic
      // GEMM micro-kernel shape C2's auto-vectorizer and OoO hardware
      // both exploit. Per-pair fold order is untouched (i ascending,
      // one acc per pair), so results stay bit-identical to graft_dot
      // and the DuckDB oracle (AllPairsSpec pins this).
      val d = if (m > 0) vecs(0).length else 0
      val uniform = m > 0 && vecs.forall(_.length == d)
      val flat = if (uniform) {
        val f = new Array[Double](m * d)
        var k = 0
        while (k < m) {
          System.arraycopy(vecs(k), 0, f, k * d, d)
          k += 1
        }
        f
      } else null
      val proj = UnsafeProjection.create(
        Array[org.apache.spark.sql.types.DataType](LongType, LongType, DoubleType))
      val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      val hitIds = new Array[Long](m)
      val hitCos = new Array[Double](m)
      iter.flatMap { row =>
        val ida = row.getLong(0)
        val va = row.getArray(1).toDoubleArray()
        var nHits = 0
        val kStart = if (lt) upperBound(ida) else 0
        if (flat != null && va.length == d) {
          // blocked kernel: 4 broadcast vectors per sweep of va
          val m4 = kStart + ((m - kStart) & ~3)
          var k = kStart
          while (k < m4) {
            val b0 = k * d; val b1 = b0 + d; val b2 = b1 + d; val b3 = b2 + d
            var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
            var i = 0
            while (i < d) {
              val x = va(i)
              a0 += x * flat(b0 + i); a1 += x * flat(b1 + i)
              a2 += x * flat(b2 + i); a3 += x * flat(b3 + i)
              i += 1
            }
            if (a0 >= th && (!lt || ida < ids(k))) {
              hitIds(nHits) = ids(k); hitCos(nHits) = a0; nHits += 1
            }
            if (a1 >= th && (!lt || ida < ids(k + 1))) {
              hitIds(nHits) = ids(k + 1); hitCos(nHits) = a1; nHits += 1
            }
            if (a2 >= th && (!lt || ida < ids(k + 2))) {
              hitIds(nHits) = ids(k + 2); hitCos(nHits) = a2; nHits += 1
            }
            if (a3 >= th && (!lt || ida < ids(k + 3))) {
              hitIds(nHits) = ids(k + 3); hitCos(nHits) = a3; nHits += 1
            }
            k += 4
          }
          while (k < m) {
            val b = k * d
            var acc = 0.0
            var i = 0
            while (i < d) { acc += va(i) * flat(b + i); i += 1 }
            if (acc >= th && (!lt || ida < ids(k))) {
              hitIds(nHits) = ids(k); hitCos(nHits) = acc; nHits += 1
            }
            k += 1
          }
        } else {
          // ragged-dimension fallback: scalar loop over the object arrays
          var k = kStart
          while (k < m) {
            if (!lt || ida < ids(k)) {
              val vb = vecs(k)
              val n = math.min(va.length, vb.length)
              var acc = 0.0
              var i = 0
              while (i < n) { acc += va(i) * vb(i); i += 1 }
              if (acc >= th) {
                hitIds(nHits) = ids(k); hitCos(nHits) = acc; nHits += 1
              }
            }
            k += 1
          }
        }
        val total = nHits
        new Iterator[InternalRow] {
          private var p = 0
          override def hasNext: Boolean = p < total
          override def next(): InternalRow = {
            out.setLong(0, ida); out.setLong(1, hitIds(p)); out.setDouble(2, hitCos(p))
            p += 1
            proj(out)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AllPairsCosineExec =
    copy(left = newLeft, right = newRight)
}
