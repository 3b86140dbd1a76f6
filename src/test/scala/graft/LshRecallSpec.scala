package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The LSH recall evals, both forms, against a plain-Scala
  * recomputation at sf0.001. The EXHAUSTIVE form (all-pairs Jaccard
  * ground truth — quadratic by construction) lives here spec-side; the
  * registry carries only the sampled production form
  * (dedup_lsh_recall_sampled), whose exact set this spec proves is
  * precisely the both-endpoints-sampled subset of the exhaustive one. */
class LshRecallSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("exhaustive eval == plain-Scala all-pairs recomputation; sampled twin is its exact subset") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
      .where(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // distinct 3-word shingles, the graft_shingles3 currency
    val sets: Map[Long, Set[String]] = docs.map { case (id, txt) =>
      id -> txt.split(" ").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    }.toMap
    val ids = sets.keys.toSeq.sorted
    val exact = (for {
      ai <- ids.indices; bi <- (ai + 1) until ids.length
      a = ids(ai); b = ids(bi)
      inter = (sets(a) & sets(b)).size if inter > 0
      if inter.toDouble / (sets(a).size + sets(b).size - inter) >= 0.3
    } yield (a, b)).toSet
    val lsh = DedupQueries.lshVerifiedPairs(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val row = DedupQueries.exhaustiveLshRecall(spark, sf).head()
    val nHit = exact.count(lsh.contains)
    assert(row.getLong(0) == exact.size && row.getLong(1) == lsh.size &&
      row.getLong(2) == nHit,
      s"exhaustive eval (${row.toSeq}) diverges from the Scala " +
        s"recomputation (${exact.size}, ${lsh.size}, $nHit)")
    assert(exact.nonEmpty, "the fixture must carry true near-dup pairs")
    assert(math.abs(row.getDouble(3) - nHit.toDouble / exact.size) < 1e-12)
    // the sampled registry twin: its ground truth is exactly the
    // both-endpoints-in-the-40%-shard subset
    def sampled(id: Long) = id % 1000003L * 2654435761L % 100 < 40
    val sExact = exact.filter { case (a, b) => sampled(a) && sampled(b) }
    val sRow = SparkEntry.queries("dedup_lsh_recall_sampled")(spark, sf).head()
    assert(sRow.getLong(0) == sExact.size &&
      sRow.getLong(2) == sExact.count(lsh.contains),
      s"sampled twin (${sRow.toSeq}) is not the sampled subset " +
        s"(${sExact.size}, ${sExact.count(lsh.contains)})")
    assert(sRow.getLong(1) == lsh.size,
      "the sampled twin's LSH side is the production pipeline, unsampled")
  }
}
