package graft.assets

import org.apache.hadoop.fs.Path
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The corpus-index ASSET layer (round 16) — the production form of the
  * round-15 session memos: a derived index (the q158 hot-shingle df index,
  * the shared shingle relation, the verified MinHash pair index, trained
  * codebooks) is built ONCE per corpus version, persisted as a parquet
  * artifact beside the pipeline, and LOADED by every later job over the
  * same corpus — the reference's append-only `reports/` artifact model
  * (`app.py:107-122`) applied to the index tier, and what a 1000-executor
  * deployment actually does: no job re-aggregates 100 TB to recover an
  * index the previous job already materialized.
  *
  * Addressing: `<root>/<corpus-signature>/<tag>_v<version>` where the
  * corpus signature hashes the corpus directory's file inventory
  * (name, length, mtime — a filesystem METADATA read, no data scan), so a
  * regenerated corpus can never serve a stale artifact, and `version` is a
  * code-layout constant its owner bumps whenever the asset's computation
  * changes. Writes are write-to-temp + atomic rename with a `_SUCCESS`
  * completeness marker: a crashed build leaves only an ignored temp dir,
  * and a concurrent winner's artifact is adopted rather than clobbered.
  *
  * Root resolution: conf [[AssetStore.DirConf]]; unset defaults to
  * `<java.io.tmpdir>/graft_assets`, empty/`off` disables persistence
  * entirely (pure in-session memo — what PlanAudit and the scale probes
  * run, so they keep auditing/measuring the BUILD plans rather than a
  * parquet scan of someone else's artifact).
  */
object AssetStore {

  val DirConf = "graft.assets.dir"

  /** A per-[[SparkSession]] memo with a leak-free lifecycle. Weak keys give
    * identity semantics (SparkSession does not override equals) and protect
    * against `identityHashCode` aliasing after GC — but weak keys ALONE do
    * not make entries collectible when the values hold `Dataset`s, because
    * a Dataset strongly references its session: the value→key path pins the
    * entry (and every memoized corpus-sized frame) for the JVM's life. The
    * fix is explicit lifecycle removal: the first memo access for a session
    * registers a listener on its SparkContext, and `onApplicationEnd`
    * (fired by `session.stop()`) drops the whole entry — the frames are
    * released at exactly the moment their executor-side storage dies.
    * Sessions sharing one context (`newSession()`) are each dropped when
    * that shared context stops.
    */
  final class SessionMemo[K, V] {
    private val maps = new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[K, V]]()

    private def mapOf(spark: SparkSession) = maps.synchronized {
      var m = maps.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[K, V]()
        maps.put(spark, m)
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
            dropSession(spark)
        })
      }
      m
    }

    /** Memoized build; the build runs under the map's per-bin lock (same
      * single-flight contract as the round-15 computeIfAbsent memos). */
    def getOrBuild(spark: SparkSession, key: K)(build: => V): V =
      mapOf(spark).computeIfAbsent(key, _ => build)

    /** Lifecycle removal — invoked by the context-stop listener; exposed so
      * AssetStoreSpec can assert the cleanup without stopping the shared
      * test context. */
    def dropSession(spark: SparkSession): Unit =
      maps.synchronized { maps.remove(spark) }

    private[graft] def entryCount(spark: SparkSession): Int = maps.synchronized {
      val m = maps.get(spark)
      if (m == null) 0 else m.size
    }
  }

  /** None = persistence disabled (memo-only). */
  def assetsRoot(spark: SparkSession): Option[String] =
    spark.conf.getOption(DirConf) match {
      case Some("") | Some("off") => None
      case Some(d)                => Some(d)
      case None =>
        Some(new java.io.File(
          System.getProperty("java.io.tmpdir"), "graft_assets").getPath)
    }

  // signature is a per-(session, dir) memo: one FS metadata listing per
  // corpus per session, and a corpus regenerated MID-session is out of
  // contract everywhere in the engine already
  private val sigMemo = new SessionMemo[String, String]

  /** Fingerprint of the corpus directory's file inventory: every top-level
    * file (and the files one level inside top-level subdirectories — the
    * multi-part parquet layout) contributes (path, length, mtime). A
    * metadata read at any scale. */
  def corpusSignature(spark: SparkSession, dir: String): String =
    sigMemo.getOrBuild(spark, dir) {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val entries = scala.collection.mutable.ArrayBuffer[String]()
      fs.listStatus(p).foreach { s =>
        if (s.isFile)
          entries += s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}"
        else
          fs.listStatus(s.getPath).filter(_.isFile).foreach { c =>
            entries += s"${s.getPath.getName}/${c.getPath.getName}:${c.getLen}:${c.getModificationTime}"
          }
      }
      val raw = dir + "|" + entries.sorted.mkString(";")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(raw.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.take(8).map(b => f"$b%02x").mkString
    }

  // spec hook: how many artifact BUILDS this JVM has performed
  private[graft] val buildCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The load-or-build seam. With persistence enabled, returns a plain
    * parquet scan of the artifact — building (and atomically publishing) it
    * first if this corpus version doesn't have one yet. Disabled, returns
    * `build` unchanged (the caller's memo/caching discipline applies).
    *
    * The returned frame is ALWAYS the on-disk scan in enabled mode — the
    * build JVM and every later cold session consume byte-identical input
    * (AssetStoreSpec's build ≡ load law), and the consumer plan above the
    * asset contains no corpus-sized aggregate to re-run.
    */
  def loadOrBuild(spark: SparkSession, dir: String, tag: String, version: Int)
      (build: => DataFrame): DataFrame =
    assetsRoot(spark) match {
      case None => build
      case Some(root) =>
        val sig = corpusSignature(spark, dir)
        val path = new Path(root, s"$sig/${tag}_v$version")
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        def complete = fs.exists(new Path(path, "_SUCCESS"))
        if (!complete) {
          val tmp = new Path(root,
            s"$sig/.${tag}_v$version.tmp-${java.util.UUID.randomUUID}")
          build.write.mode("overwrite").parquet(tmp.toString)
          // an artifact dir WITHOUT the marker is a corpse (crashed JVM died
          // between rename and nothing — rename is atomic — so in practice:
          // a manual copy); clear it rather than failing the rename forever
          if (fs.exists(path) && !complete) fs.delete(path, true)
          if (!fs.rename(tmp, path)) {
            // lost a publish race: adopt the winner's artifact
            fs.delete(tmp, true)
            require(complete,
              s"asset publish failed and no complete artifact at $path")
          } else {
            buildCount.incrementAndGet()
            if (spark.conf.getOption("graft.assets.prune").forall(_.toBoolean))
              markAndPrune(fs, new Path(root), sig, dir)
          }
        }
        spark.read.parquet(path.toString)
    }

  /** Retention: each signature dir carries a `_CORPUS` marker naming the
    * corpus directory it was derived from; publishing an artifact under a
    * NEW signature best-effort deletes this corpus's SUPERSEDED signature
    * trees (the corpus was regenerated — their artifacts can never be
    * served again, only leak disk). Conf `graft.assets.prune=false`
    * disables (e.g. blue/green jobs intentionally pinned to an older
    * corpus version mid-transition). */
  private def markAndPrune(fs: org.apache.hadoop.fs.FileSystem, root: Path,
      sig: String, dir: String): Unit = {
    try {
      val marker = new Path(root, s"$sig/_CORPUS")
      if (!fs.exists(marker)) {
        val out = fs.create(marker, true)
        out.write(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
      }
      fs.listStatus(root).filter(_.isDirectory).foreach { s =>
        val other = s.getPath.getName
        if (other != sig) {
          val m = new Path(s.getPath, "_CORPUS")
          if (fs.exists(m)) {
            val in = fs.open(m)
            val b = new Array[Byte](math.min(65536L, fs.getFileStatus(m).getLen).toInt)
            val n = in.read(b); in.close()
            if (n > 0 && new String(b, 0, n,
                java.nio.charset.StandardCharsets.UTF_8) == dir)
              fs.delete(s.getPath, true)
          }
        }
      }
    } catch { case _: java.io.IOException => () } // best-effort only
  }
}
