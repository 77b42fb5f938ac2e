package graft.pipeline

import org.apache.spark.sql.{Column, SparkSession}
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

  // ---- Table maintenance tier 2: clustering rewrite for data skipping ----
  //
  // Compaction fixes FILE SIZES; these rewrites fix FILE STATS. A table
  // written in arrival order scatters every key range across every file, so
  // the per-file (and per-row-group) min/max statistics that parquet
  // footers, Iceberg manifests, and Delta checkpoints all carry prune
  // nothing — a selective predicate still opens every file. Re-clustering
  // on the query columns makes those same statistics selective:
  // `rewrite_data_files(sort_order)` in Iceberg, `OPTIMIZE ZORDER BY` in
  // Delta. TableClusteringSpec PROVES the effect (files-whose-stats-match
  // drop from all to ~1 under an equality probe, content hash unchanged).
  //
  // Both rewrites target a NEW directory: at 100 TB the rewrite is a
  // shuffle job whose output must land before readers switch over
  // (metadata swap in a table format; directory swap here) — an in-place
  // overwrite would need the whole table checkpointed in executor storage.

  /** Range-cluster `srcDir` into `destDir` on `cols`: ONE range exchange
    * (sampled split points, the scalable production plan — no driver
    * materialization) into exactly `nFiles` write tasks, rows sorted within
    * each file so row-group stats inside a file are selective too.
    * Single-column data skipping; for two query columns see [[zOrderBy]].
    */
  def clusterByRange(spark: SparkSession, srcDir: String, destDir: String,
      cols: Seq[String], nFiles: Int): Unit = {
    require(cols.nonEmpty && nFiles > 0)
    spark.read.parquet(srcDir)
      .repartitionByRange(nFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(destDir)
  }

  /** Morton (Z-order) bucket of two numeric columns: each value is scaled
    * to a `bits`-bit bucket over its observed [lo, hi] range, then the two
    * bucket's bits are interleaved — nearby (x, y) pairs share z-prefixes,
    * so range-partitioning on z gives BOTH columns narrow per-file stats.
    * Codegen'd shift/mask arithmetic, no UDF. */
  private[graft] def zValue(x: Column, y: Column,
      loX: Double, hiX: Double, loY: Double, hiY: Double, bits: Int): Column = {
    def bucket(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit((1L << bits) - 1), greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * ((1L << bits) - 1))
          .cast("long")))
    val (xb, yb) = (bucket(x, loX, hiX), bucket(y, loY, hiY))
    (0 until bits).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order rewrite on exactly two numeric columns — use when queries
    * filter on EITHER column: a plain sort on (x, y) gives x perfect stats
    * but leaves y scattered, while the interleaved-bit order gives both
    * columns ~√nFiles-selective per-file ranges. Column ranges for the
    * bucket scaling come from one tiny min/max aggregate over the source
    * (two scalars per column — a metadata read in a real table format).
    * Same shape as [[clusterByRange]] otherwise: one range exchange on the
    * z-value into `nFiles` sorted files, landed in `destDir`. */
  def zOrderBy(spark: SparkSession, srcDir: String, destDir: String,
      colX: String, colY: String, nFiles: Int, bits: Int = 16): Unit = {
    require(colX != colY && nFiles > 0 && bits > 0 && bits <= 30)
    val df = spark.read.parquet(srcDir)
    val r = df.agg(
      min(col(colX).cast("double")), max(col(colX).cast("double")),
      min(col(colY).cast("double")), max(col(colY).cast("double"))).head()
    // Empty source or an all-null cluster column: there is no range to
    // interleave and every layout is trivially clustered — land the rows
    // (possibly zero) as-is instead of dereferencing a null aggregate.
    if ((0 to 3).exists(r.isNullAt)) {
      df.write.mode("overwrite").parquet(destDir)
      return
    }
    val z = zValue(col(colX), col(colY),
      r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(destDir)
  }
}
