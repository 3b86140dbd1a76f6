package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components engine: the pointer-jumping fixpoint and the
  * partition-local union-find contraction must agree on every graph
  * shape — in particular the CHAIN, the shape the contraction exists
  * for (a chain of length L needs ~log2(L) global rounds raw, but only
  * ~log2(partitions-it-spans) after per-partition contraction). */
class CCSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def bidir(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain graph: contraction and raw fixpoint agree, all label to min") {
    val chain = (1L until 64L).map(i => (i, i + 1))
    val edges = bidir(chain).repartition(8) // chain spans many partitions
    val raw = labelsOf(queries.DedupQueries.pointerJumpCC(edges))
    val pre = labelsOf(queries.DedupQueries.pointerJumpCC(
      queries.DedupQueries.localUnionFindEdges(edges)))
    assert(raw == pre)
    assert(raw.keySet == (1L to 64L).toSet)
    assert(raw.values.toSet == Set(1L), "every chain node labels to the min id")
  }

  test("mixed components: cliques + chains + isolated pairs agree") {
    val clique = for {
      a <- 100L to 105L; b <- 100L to 105L if a < b
    } yield (a, b)
    val chain = (200L until 230L).map(i => (i, i + 1))
    val pairs = clique ++ chain ++ Seq((300L, 301L), (400L, 401L))
    val edges = bidir(pairs).repartition(5)
    val raw = labelsOf(queries.DedupQueries.pointerJumpCC(edges))
    val pre = labelsOf(queries.DedupQueries.pointerJumpCC(
      queries.DedupQueries.localUnionFindEdges(edges)))
    assert(raw == pre)
    assert((100L to 105L).forall(n => raw(n) == 100L))
    assert((200L to 230L).forall(n => raw(n) == 200L))
    assert(raw(301L) == 300L && raw(401L) == 400L)
  }

  test("contracted edge set of a within-partition chain is depth 1") {
    // one partition holding the whole chain: after contraction every
    // node must point straight at the min — the property that removes
    // rounds from the global fixpoint
    val chain = (1L until 33L).map(i => (i, i + 1))
    val edges = bidir(chain).coalesce(1)
    val star = queries.DedupQueries.localUnionFindEdges(edges)
      .where(col("src") =!= lit(1L)).select("src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(star.forall(_._2 == 1L),
      s"non-star edge survived contraction: ${star.filterNot(_._2 == 1L).take(5).toSeq}")
  }
}
