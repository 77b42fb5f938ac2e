package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction: rewrite a partitioned parquet table so each
  * partition holds ⌈bytes/target⌉ files of ≈ target size — the first
  * operational task the owner of a 100 TB table performs (streaming sinks,
  * incremental upserts, and over-parallel writers all fragment tables into
  * KB-scale files whose open/footer cost eventually dominates scans).
  *
  * Mechanics, Spark-first:
  *   1. MEASURE, don't guess: current bytes per partition come from the
  *      filesystem listing (driver-side, bounded by partition count — the
  *      same listing every table format's metadata layer maintains).
  *   2. Target file count: max(1, ceil(bytes / targetBytes)) per partition.
  *   3. One rewrite job per fragmented partition — the file-group unit
  *      every production rewrite (Hive compaction, Iceberg
  *      rewrite_data_files) uses: a PARTITION-PRUNED scan (only that
  *      partition's files are read), round-robin `repartition(n)` (exactly
  *      n write tasks → exactly n output files; a hash-salt single-pass
  *      variant cannot promise the count — salt buckets collide into
  *      shared tasks and merge), and an idempotent dynamic-partition
  *      overwrite that touches ONLY the rewritten partition.
  *   4. The batch materializes via `localCheckpoint` before the write:
  *      Spark (correctly) refuses to overwrite a path it is still reading
  *      from, and the checkpoint bounds that read-before-write window to
  *      the partition being rewritten — which is why `selectedPartitions`
  *      exists: at 100 TB the pass runs over bounded batches of the MOST
  *      fragmented partitions (the `worstFirst` ordering), never the whole
  *      table in one job.
  *
  * Failure containment: each partition's rewrite is its own job + dynamic
  * overwrite, so a mid-pass failure leaves completed partitions compacted,
  * untouched partitions intact, and the pass re-runnable from the top
  * (re-compacting an already-compact partition is a no-op rewrite).
  *
  * Compression makes output sizes approximate (bytes are measured on
  * compressed input and rewritten files re-compress) — the contract is the
  * FILE COUNT and content equality, which TableCompactionSpec asserts.
  */
object Compaction {

  /** Per-partition (value, bytes, files) from the filesystem listing.
    * Directory names are Hive-URI-escaped on disk (`a b` → `a%20b`);
    * the returned value is UNESCAPED so it can be compared against the
    * DataFrame column — otherwise a partition whose value contains a
    * special character would never match the pruning filter and the
    * rewrite would be a silently-retried no-op. */
  def partitionStats(spark: SparkSession, tableDir: String, partitionCol: String)
      : Seq[(String, Long, Int)] = {
    val root = new java.io.File(tableDir)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(s"$partitionCol="))
      .map { d =>
        val parts = Option(d.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        (org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
           .unescapePathName(d.getName.stripPrefix(s"$partitionCol=")),
          parts.map(_.length()).sum, parts.length)
      }.toSeq.sortBy(_._1)
  }

  /** The partitions a bounded compaction batch should spend its budget on:
    * fragmented ones first (most files over the planned count). */
  def worstFirst(spark: SparkSession, tableDir: String, partitionCol: String,
      targetBytes: Long): Seq[String] =
    partitionStats(spark, tableDir, partitionCol)
      .map { case (v, bytes, files) =>
        (v, files - math.max(1L, (bytes + targetBytes - 1) / targetBytes)) }
      .filter(_._2 > 0)
      .sortBy { case (v, excess) => (-excess, v) }
      .map(_._1)

  /** Rewrite `tableDir` (parquet, partitioned by `partitionCol`) to
    * ⌈bytes/targetBytes⌉ files per partition. `selectedPartitions`
    * restricts the pass to a batch of partition values (None = all). */
  def compactToTargetBytes(spark: SparkSession, tableDir: String,
      partitionCol: String, targetBytes: Long,
      selectedPartitions: Option[Seq[String]] = None): Unit = {
    require(targetBytes > 0)
    val stats = partitionStats(spark, tableDir, partitionCol)
    val chosen = selectedPartitions match {
      case Some(vals) => stats.filter(s => vals.contains(s._1))
      case None       => stats
    }
    chosen.foreach { case (value, bytes, files) =>
      val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      // already at plan → skip: re-compaction must be a no-op, not a
      // pointless rewrite (and compression means every rewrite perturbs
      // bytes — without this guard a "stable" table would churn forever)
      if (files != nFiles)
      spark.read.parquet(tableDir)
        .filter(col(partitionCol) === value)   // partition-pruned scan
        .localCheckpoint()                     // release the source files before overwrite
        .repartition(nFiles)                   // exactly n write tasks → n files
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol)
        .parquet(tableDir)
    }
  }
}
