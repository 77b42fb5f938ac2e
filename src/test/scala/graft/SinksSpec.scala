package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Letter, Sinks}

/** Sink surface (S6–S10): partitioned archive write with pruned read-back,
  * side-effecting delivery with the skip-if-unconfigured gate.
  */
class SinksSpec extends SparkSpec {

  test("archive sink partitions by sanitized client and prunes on read-back") {
    val out = java.nio.file.Files.createTempDirectory("graft_archive").toString
    val letters = Letter.letters(spark, sf001)
    Sinks.archiveLetters(letters, out)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("client_dir=")))
    assert(dirs.forall(!_.contains(" ")), "partition values are sanitized")

    val firstClient = letters.select(col("client_name")).limit(1).collect()(0).getString(0)
    val pruned = Sinks.readClientArchive(spark, out, firstClient)
    assert(pruned.count() > 0)
    assert(pruned.select(col("client_name")).distinct().count() == 1)

    // idempotent re-archive (the reference's overwrite-by-name semantics)
    Sinks.archiveLetters(letters, out)
    assert(spark.read.parquet(out).count() == letters.count())
  }

  test("delivery sink sends once per record; unconfigured transport is a no-op") {
    val letters = Letter.letters(spark, sf001)
    assert(Sinks.deliverLetters(letters, None) == 0L)

    val counting = new Sinks.Transport {
      override def send(recipient: String, subject: String, body: String): Unit = {
        require(recipient != null && subject.endsWith(".pdf") && body.startsWith("Date: "))
      }
    }
    val sent = Sinks.deliverLetters(letters, Some(counting))
    assert(sent == letters.count())
  }
}
