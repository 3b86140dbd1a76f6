package graft

import graft.operators.{CurationRun, DeltaIngest, TrainingExport}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The curate → train last mile: deterministic epoch shuffle + L-token
  * sequence packing over the curated layout's live train slice, sealed
  * by a manifest. The spec proves the packing against a from-scratch
  * reconstruction: per shard, the exported sequences concatenated in
  * seq_id order must equal the shard's docs' tokens concatenated in
  * (k, doc_id) write order — token-for-token. */
class TrainingExportSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"texp_$name").toString

  // globally-unique 5-char words per doc (gate-passing by construction:
  // sum(len) == 5n passes chars<=5n; unique vocab -> no dedup interference)
  private def words(key: Long, n: Int): Vector[String] =
    (0 until n).map { j =>
      val s = java.lang.Long.toString(key * 64 + j, 36)
      "0" * (5 - s.length) + s
    }.toVector

  private case class Doc(id: Long, ws: Vector[String]) {
    def text: String = ws.mkString(" ")
  }

  private def toDF(docs: Seq[Doc]): DataFrame =
    docs.map(d => (d.id, d.text, "en", "web", d.text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // varied lengths so docs straddle sequence boundaries
  private val docs = (0 until 80).map(k => Doc(100 + k, words(100 + k, 20 + k % 23)))

  private lazy val layout = {
    val in = tmp("in"); val out = tmp("out")
    toDF(docs).coalesce(2).write.mode("overwrite")
      .parquet(s"$in/documents.parquet")
    CurationRun.run(spark, in, out)
    out
  }

  private def key(id: Long, seed: Long): Long =
    (id + seed) % 1000003L * 2654435761L % 1048573L

  private def liveTrainDocs(out: String): Seq[(Long, Vector[String])] =
    spark.read.parquet(s"$out/final").where(col("split") === "train")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toVector)).toSeq

  /** from-scratch expectation: per shard, docs in (k, doc_id) order,
    * tokens concatenated, cut into L chunks. */
  private def expectedShards(out: String, nShards: Int, l: Int,
      seed: Long): Map[Int, Vector[Vector[String]]] =
    liveTrainDocs(out)
      .map { case (id, ws) => (key(id, seed), id, ws) }
      .groupBy(t => (t._1 % nShards).toInt)
      .map { case (sh, ds) =>
        val stream = ds.sortBy(t => (t._1, t._2)).flatMap(_._3).toVector
        sh -> stream.grouped(l).map(_.toVector).toVector
      }

  private def exportedShards(dir: String): Map[Int, Vector[Vector[String]]] =
    spark.read.parquet(s"$dir/shards")
      .select("shard", "seq_id", "tokens").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[String](2).toVector))
      .groupBy(_._1)
      .map { case (sh, rows) =>
        sh -> rows.sortBy(_._2).map(_._3).toVector
      }

  test("packed shards reconstruct exactly: every token once, in write order") {
    val dir = tmp("exact")
    val rep = TrainingExport.export(spark, layout, dir, nShards = 4,
      seqLen = 64, seed = 0L)
    val exp = expectedShards(layout, 4, 64, 0L)
    val got = exportedShards(dir)
    assert(got.keySet == exp.keySet, s"shard sets: ${got.keySet} vs ${exp.keySet}")
    for (sh <- exp.keySet)
      assert(got(sh) == exp(sh), s"shard $sh token stream diverged")
    val nTok = liveTrainDocs(layout).map(_._2.size.toLong).sum
    assert(rep.nTokens == nTok && rep.nDocs == liveTrainDocs(layout).size,
      s"$rep vs $nTok tokens")
    assert(rep.nSeqs == exp.values.map(_.size).sum, s"$rep")
  }

  test("every sequence is full length except the last per shard") {
    val dir = tmp("full")
    TrainingExport.export(spark, layout, dir, nShards = 4, seqLen = 64)
    val rows = spark.read.parquet(s"$dir/shards")
      .select("shard", "seq_id", "n_tokens").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val lastSeq = rows.groupBy(_._1).map { case (sh, rs) => sh -> rs.map(_._2).max }
    for ((sh, seq, n) <- rows)
      if (seq != lastSeq(sh)) assert(n == 64, s"shard $sh seq $seq has $n tokens")
      else assert(n >= 1 && n <= 64, s"shard $sh tail seq has $n tokens")
  }

  test("same seed reproduces identical shards; a new seed permutes but conserves") {
    val d1 = tmp("seed_a"); val d2 = tmp("seed_b"); val d3 = tmp("seed_c")
    TrainingExport.export(spark, layout, d1, nShards = 4, seqLen = 64, seed = 7L)
    TrainingExport.export(spark, layout, d2, nShards = 4, seqLen = 64, seed = 7L)
    TrainingExport.export(spark, layout, d3, nShards = 4, seqLen = 64, seed = 8L)
    assert(exportedShards(d1) == exportedShards(d2), "same seed must be byte-stable")
    assert(exportedShards(d1) != exportedShards(d3), "a new seed must reshuffle")
    def multiset(m: Map[Int, Vector[Vector[String]]]): Map[String, Int] =
      m.values.flatten.flatten.groupBy(identity).map { case (w, g) => w -> g.size }
    assert(multiset(exportedShards(d1)) == multiset(exportedShards(d3)),
      "an epoch reshuffle conserves the token multiset")
  }

  test("a sealed export replays as a metadata-only no-op") {
    val dir = tmp("seal")
    val rep = TrainingExport.export(spark, layout, dir, nShards = 4, seqLen = 64)
    // canary: if the replay recomputed, the overwrite would remove it
    val canary = new java.io.File(s"$dir/shards/canary")
    assert(canary.createNewFile())
    val rep2 = TrainingExport.export(spark, layout, dir, nShards = 4, seqLen = 64)
    assert(rep2 == rep, s"$rep2 != $rep")
    assert(canary.exists(), "replay must not touch sealed data")
  }

  test("a crash before the manifest re-runs to identical bytes") {
    val dir = tmp("crash")
    TrainingExport.export(spark, layout, dir, nShards = 4, seqLen = 64)
    val want = exportedShards(dir)
    // simulate the crash window: shards landed, manifest never did
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete()
    }
    rmrf(new java.io.File(s"$dir/export_manifest.parquet"))
    val rep2 = TrainingExport.export(spark, layout, dir, nShards = 4, seqLen = 64)
    assert(exportedShards(dir) == want, "re-run must converge to the same bytes")
    assert(rep2.nSeqs == want.values.map(_.size).sum)
  }

  test("verify audits the sealed bytes: clean export passes, a lost shard fails its row") {
    val dir = tmp("verify")
    TrainingExport.export(spark, layout, dir, nShards = 4, seqLen = 64)
    val clean = TrainingExport.verify(spark, dir).collect()
    assert(clean.length == 4 && clean.forall(_.getBoolean(1)),
      s"a clean export must verify: ${clean.mkString(";")}")
    // lose one shard's files (the partial-loss failure mode verify
    // exists to catch)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete()
    }
    val victim = clean.head.getInt(0)
    rmrf(new java.io.File(s"$dir/shards/shard=$victim"))
    val after = TrainingExport.verify(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(!after(victim), "a lost shard must fail verification")
    assert(after.filter(_._1 != victim).values.forall(identity),
      s"other shards must still pass: $after")
    // the WHOLE shards directory lost: every non-empty manifest row
    // fails cleanly (ok=false) instead of the audit throwing
    rmrf(new java.io.File(s"$dir/shards"))
    val gone = TrainingExport.verify(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(gone.size == 4 && gone.values.forall(!_),
      s"a lost shards dir must fail every row: $gone")
  }

  test("composes with DeltaIngest: the export reads the FOLDED layout") {
    // fresh layout so the shared one stays pristine
    val in = tmp("d_in"); val out = tmp("d_out")
    toDF(docs).coalesce(2).write.mode("overwrite")
      .parquet(s"$in/documents.parquet")
    CurationRun.run(spark, in, out)
    DeltaIngest.buildIndex(spark, out)
    // beat one live train doc with a longer twin; append one fresh doc
    val victim = liveTrainDocs(out).maxBy(_._1)
    val winner = Doc(9001, victim._2 ++ words(9001, 4))
    val fresh = Doc(9002, words(9002, 25))
    DeltaIngest.ingestDelta(spark, toDF(Seq(winner, fresh)), out)
    val dir = tmp("d_exp")
    TrainingExport.export(spark, out, dir, nShards = 4, seqLen = 64)
    val got = exportedShards(dir)
    val exp = expectedShards(out, 4, 64, 0L)
    assert(got == exp, "export after an ingest must match the edited layout")
    assert(!liveTrainDocs(out).exists(_._1 == victim._1),
      "the beaten doc must be out of the live train slice the export reads")
  }
}
