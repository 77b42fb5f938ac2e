package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Compaction

/** Clustering rewrites for data skipping (table maintenance tier 2): the
  * proof is on the per-file min/max statistics themselves — the numbers a
  * parquet footer / Iceberg manifest / Delta checkpoint prunes with. A
  * probe value "matches" a file when it falls inside that file's [min, max]
  * range for the column; files-matched IS the scanned-file count a
  * stats-aware reader pays for the predicate.
  */
class TableClusteringSpec extends SparkSpec {

  /** 40 000 rows forming an exact 200×200 (a, b) grid, written in arrival
    * order (round-robin over 16 files) — the layout every query column's
    * stats are useless in: each file spans ~the whole range of BOTH a and b.
    */
  private def scatteredTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cluster_src").toString
    spark.range(40000)
      .select(col("id"),
        (col("id") % 200).as("a"),
        (floor(col("id") / 200).cast("long") % 200).as("b"))
      .repartition(16)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cluster_$tag").toString

  /** Per-file (min, max) of `c` — exactly the stats a reader skips on. */
  private def fileStats(dir: String, c: String): Seq[(Double, Double)] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = spark.read.parquet(f.toString)
          .agg(min(col(c).cast("double")), max(col(c).cast("double"))).head()
        (r.getDouble(0), r.getDouble(1))
      }

  private def filesMatched(stats: Seq[(Double, Double)], v: Double): Int =
    stats.count { case (lo, hi) => lo <= v && v <= hi }

  private def contentKey(dir: String): Seq[String] =
    spark.read.parquet(dir).select(col("id"), col("a"), col("b"))
      .collect().map(_.toString).sorted.toSeq

  test("range clustering: a selective predicate matches ~1 file's stats instead of all; content unchanged") {
    val src = scatteredTable()
    val want = contentKey(src)
    val before = fileStats(src, "a")
    assert(before.size == 16)
    // arrival order: EVERY file's range contains the probe — zero skipping
    assert(filesMatched(before, 100.0) == 16,
      s"fixture not scattered: ${filesMatched(before, 100.0)}/16 match")
    val dst = tmp("range")
    Compaction.clusterByRange(spark, src, dst, Seq("a"), 16)
    val after = fileStats(dst, "a")
    assert(after.size == 16, s"planned 16 files, got ${after.size}")
    // clustered: the probe falls in ≤ 2 files (1 + a possible range-boundary
    // straddle) — a 8×+ drop in scanned files for the same predicate
    assert(filesMatched(after, 100.0) <= 2,
      s"clustered layout still scans ${filesMatched(after, 100.0)}/16 files")
    assert(contentKey(dst) == want, "rewrite must not change table content")
  }

  test("z-order: BOTH columns' stats prune; a plain composite sort only prunes the leading column") {
    val src = scatteredTable()
    val want = contentKey(src)
    val sortedDir = tmp("sorted")
    val zDir = tmp("zorder")
    Compaction.clusterByRange(spark, src, sortedDir, Seq("a", "b"), 16)
    Compaction.zOrderBy(spark, src, zDir, "a", "b", 16)
    val (probeA, probeB) = (100.0, 100.0)
    // composite sort: leading column near-perfect, trailing column useless
    // (every a-slice contains the full b range on this grid)
    assert(filesMatched(fileStats(sortedDir, "a"), probeA) <= 2)
    assert(filesMatched(fileStats(sortedDir, "b"), probeB) == 16,
      "grid fixture should leave the trailing sort column unprunable")
    // z-order: 16 files tile the (a, b) grid ~4×4, so each single-column
    // probe matches ~4 files ideally; equal-count z-range boundaries don't
    // align to tile edges, so allow up to ~2× ideal — the CLAIM is that
    // both columns prune (≪ 16), not that either is perfect
    val zStatsA = fileStats(zDir, "a")
    val zStatsB = fileStats(zDir, "b")
    Seq(50.0, 100.0, 150.0).foreach { p =>
      val zA = filesMatched(zStatsA, p)
      val zB = filesMatched(zStatsB, p)
      assert(zA <= 10 && zB <= 10,
        s"z-order should bound both probes at $p: a=$zA b=$zB")
      assert(zA + zB < 18, // a composite sort pays 2 + 16 on this grid
        s"z-order no better than a composite sort at $p: a=$zA b=$zB")
    }
    assert(contentKey(zDir) == want, "z-order rewrite must not change table content")
  }

  test("zValue interleaving is monotone-local: quadrant prefixes order before low bits") {
    import graft.pipeline.Compaction.zValue
    val rows = spark.range(4).select(
        (col("id") % 2).as("x"), floor(col("id") / 2).cast("long").as("y"))
      .select(col("x"), col("y"),
        zValue(col("x"), col("y"), 0.0, 1.0, 0.0, 1.0, 1).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // 1-bit Morton order: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3
    assert(rows((0L, 0L)) == 0L && rows((1L, 0L)) == 1L &&
           rows((0L, 1L)) == 2L && rows((1L, 1L)) == 3L, s"bad morton: $rows")
  }
}
