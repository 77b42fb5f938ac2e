package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Compaction

/** The small-file compaction pass: exact planned file counts, content
  * equality, partition-scoped rewrites (a batch touches nothing else), and
  * the fragmentation-first batch ordering.
  */
class TableCompactionSpec extends SparkSpec {

  private def freshTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // a deliberately fragmented table: tiny files × many per partition
    Tables.events(spark, sf001)
      .select(col("event_type"), col("event_id"), col("user_id"), col("value"))
      .repartition(40)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    dir
  }

  private def contentKey(dir: String): Seq[String] =
    spark.read.parquet(dir)
      .select(col("event_type"), col("event_id"), col("user_id"), col("value"))
      .collect().map(_.toString).sorted.toSeq

  test("compaction hits the planned per-partition file count and preserves content") {
    val dir = freshTable()
    val before = Compaction.partitionStats(spark, dir, "event_type")
    assert(before.nonEmpty && before.forall(_._3 > 10),
      s"fixture should be fragmented, got $before")
    val want = contentKey(dir)
    // pick the target so partitions plan 2–4 files each (not 1 — a single
    // coalesced file would not exercise the splitting path)
    val target = math.max(1L, before.map(_._2).max / 3)
    Compaction.compactToTargetBytes(spark, dir, "event_type", target)
    val after = Compaction.partitionStats(spark, dir, "event_type")
    assert(after.map(_._1) == before.map(_._1), "partition set must be unchanged")
    after.foreach { case (value, _, files) =>
      val bytesBefore = before.find(_._1 == value).get._2
      val planned = math.max(1L, (bytesBefore + target - 1) / target).toInt
      assert(files == planned, s"partition $value: $files files, planned $planned")
      assert(files < before.find(_._1 == value).get._3, s"partition $value not compacted")
    }
    assert(contentKey(dir) == want, "compaction must not change table content")
  }

  test("a partition-batch rewrite touches only its batch; worstFirst ranks by excess files") {
    val dir = freshTable()
    val before = Compaction.partitionStats(spark, dir, "event_type")
    val target = math.max(1L, before.map(_._2).max / 3)
    // every partition is fragmented, so all rank in the batch ordering
    val order = Compaction.worstFirst(spark, dir, "event_type", target)
    assert(order.toSet == before.map(_._1).toSet, s"all fragmented: $order")
    val want = contentKey(dir)
    val batch = order.take(1)
    Compaction.compactToTargetBytes(spark, dir, "event_type", target, Some(batch))
    val after = Compaction.partitionStats(spark, dir, "event_type")
    after.foreach { case (value, _, files) =>
      val b = before.find(_._1 == value).get
      if (batch.contains(value))
        assert(files < b._3, s"batched partition $value should be rewritten")
      else
        assert(files == b._3, s"out-of-batch partition $value must be untouched")
    }
    assert(contentKey(dir) == want, "batch rewrite must not change table content")
    // full passes CONVERGE: each merge re-compresses smaller, which can
    // lower the next plan, but byte totals shrink monotonically so the
    // fixed point arrives in a few passes — and once every partition is at
    // its plan, a further pass is a TRUE no-op (the skip guard: same
    // stats, same file names, no I/O churn)
    var prev = Compaction.partitionStats(spark, dir, "event_type")
    var iters = 0
    var converged = false
    while (!converged && iters < 5) {
      Compaction.compactToTargetBytes(spark, dir, "event_type", target)
      val cur = Compaction.partitionStats(spark, dir, "event_type")
      converged = cur == prev
      prev = cur; iters += 1
    }
    assert(converged, s"compaction failed to reach a fixed point in $iters passes: $prev")
    prev.foreach { case (value, bytes, files) =>
      val planned = math.max(1L, (bytes + target - 1) / target).toInt
      assert(files == planned, s"fixed point off-plan for $value: $files vs $planned")
    }
    assert(contentKey(dir) == want)
  }

  test("partition values with URI-escaped characters compact (stats unescape the dir names)") {
    // values whose directory names Hive-escape (space, colon) — before the
    // unescape fix the pruning filter matched zero rows and the rewrite was
    // a silently-retried no-op that never converged
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_esc").toString
    spark.range(2000)
      .select((col("id") % 3).cast("int").as("k"), col("id").as("v"))
      .withColumn("part", element_at(
        array(lit("a b"), lit("c:d"), lit("plain")), col("k") + 1))
      .drop("k")
      .repartition(12)
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    val before = Compaction.partitionStats(spark, dir, "part")
    // the listing must surface the LOGICAL values, not the escaped names
    assert(before.map(_._1).toSet == Set("a b", "c:d", "plain"), s"got $before")
    val want = spark.read.parquet(dir).select(col("v"), col("part"))
      .collect().map(_.toString).sorted.toSeq
    Compaction.compactToTargetBytes(spark, dir, "part", Long.MaxValue)
    val after = Compaction.partitionStats(spark, dir, "part")
    after.foreach { case (value, _, files) =>
      assert(files == 1, s"partition '$value' not compacted: $files files") }
    assert(spark.read.parquet(dir).select(col("v"), col("part"))
      .collect().map(_.toString).sorted.toSeq == want)
  }
}
