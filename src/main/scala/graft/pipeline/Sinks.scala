package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Formatters

/** Sink surface (SURVEY.md §2.1 S6–S10): the reference's archive/email
  * fan-out re-expressed as Spark writes.
  *
  *  - S9 archive sink: the reference copies artifacts into
  *    `{client}/{address}/` directories (app.py:107-119) — that directory
  *    layout *is* a partitioned write: `partitionBy(client, address)` gives
  *    the same tree plus partition pruning on read-back.
  *  - S10 email sink: side-effecting per-record delivery with
  *    skip-if-unconfigured (app.py:131-133) — `foreachPartition` with one
  *    client per partition (the executor-resource pattern; never per row).
  *  - S6/S8 letter/artifact delivery: the rendered `letter_text` column
  *    written as text/parquet.
  *
  * These are exercised by `SinksSpec` (they produce files/effects, not rows —
  * not part of the oracle query surface, per SURVEY §7.4 risk 5).
  */
object Sinks {

  /** S9: archive the rendered letters partitioned by client — sanitized
    * partition values, idempotent overwrite-by-key (dynamic partition
    * overwrite), exactly the reference's re-generation semantics.
    */
  def archiveLetters(letters: DataFrame, outDir: String): Unit =
    letters
      .withColumn("client_dir", Formatters.sanitizeName(col("client_name")))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("client_dir")
      .parquet(outDir)

  /** Read-back with partition pruning: one client's archive only. */
  def readClientArchive(spark: SparkSession, outDir: String, client: String): DataFrame =
    spark.read.parquet(outDir)
      .filter(col("client_dir") === Formatters.sanitizeName(lit(client)))

  /** A pluggable per-record delivery transport (the SMTP boundary). */
  trait Transport extends Serializable {
    def send(recipient: String, subject: String, body: String): Unit
  }

  /** S10: side-effecting delivery sink. One transport per *partition*
    * (the reference's never-per-request session, crs_ui_bot.py:57-70);
    * config-gated no-op when unconfigured (app.py:131-133).
    */
  def deliverLetters(letters: DataFrame, transport: Option[Transport]): Long =
    transport match {
      case None => 0L // skip-if-unconfigured: archive-only partial success
      case Some(t) =>
        val count = letters.sparkSession.sparkContext.longAccumulator("letters_sent")
        letters.select(col("client_name"), col("pdf_filename"), col("letter_text"))
          .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
            // per-partition transport setup would go here (lazy connection)
            rows.foreach { r =>
              t.send(r.getString(0), r.getString(1), r.getString(2))
              count.add(1)
            }
          }
        count.value
    }
}
