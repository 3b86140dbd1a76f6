package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data export: the write side of the pipeline. Shards must be
  * size-bounded (a loader wants many same-sized files, not one giant
  * and one tiny), split/source-partitioned for pruning, and
  * deterministic. All of it is plain DataFrameWriter surface —
  * maxRecordsPerFile + partitionBy — this spec pins that the engine
  * actually produces that layout. */
class ExportSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("sharded export bounds records per file and partitions by split") {
    val out = TestSpark.tmpRoot("graft-export")
    val split = (abs(hash(col("doc_id"))) % 100 < 80)
    spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("split", when(split, "train").otherwise("holdout"))
      .repartition(2)
      .sortWithinPartitions("doc_id")
      .write.option("maxRecordsPerFile", 100)
      .partitionBy("split").mode("overwrite").parquet(out)

    val files = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (d.getName, f)))
    assert(files.map(_._1).distinct.sorted.toSeq ==
      Seq("split=holdout", "split=train"))
    // every shard respects the record bound
    for ((_, f) <- files) {
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 100, s"${f.getName} has $n rows > 100")
    }
    // nothing lost, nothing duplicated
    val back = spark.read.parquet(out)
    assert(back.count() == 500)
    assert(back.select("doc_id").distinct().count() == 500)
    // split pruning reaches the directory level
    val p = back.where(col("split") === "train")
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(split"), p)
  }
}
