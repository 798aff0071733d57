package graft.catalog

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * SQL-text execution with the reference's result-shaping contract — the
 * engine-side re-creation of the agent's execute-sql tool
 * (reference: lambda/webbackend/agent_processor.py:136-171):
 *
 *  - results up to [[InlineRowCap]] rows are returned inline
 *    (agent_processor.py:43 `MAX_INLINE_RESULT_ROWS = 300`);
 *  - larger results are truncated to a [[PreviewRows]]-row preview and the
 *    FULL result is exported as a downloadable header CSV
 *    (agent_processor.py:563-610 preview at :576, export at :174-216).
 *
 * The inline cap is enforced with `LIMIT cap+1` pushed into the plan (via
 * `take`), so an accidental `SELECT *` over a 100 TB table materializes 301
 * rows on the driver, never the table.
 */
object QueryService {

  val InlineRowCap = 300
  val PreviewRows = 20

  /**
   * Structural SELECT-only guard. The reference enforces read-only SQL by
   * prompt (agent_processor.py:118-128 tells the model "only SELECT"); an
   * engine must enforce it structurally. `spark.sql` EAGERLY executes
   * commands (DROP/INSERT/SET run inside the call), so the check parses the
   * text first and rejects any plan containing a command or DML node before
   * anything executes.
   */
  private[catalog] def requireReadOnly(spark: SparkSession, text: String): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, ParsedStatement}
    val parsed = spark.sessionState.sqlParser.parsePlan(text)
    val offending = parsed.collectFirst {
      case c: Command             => c.nodeName
      case i: InsertIntoStatement => i.nodeName
      // DDL/DML that parses to a statement node (CREATE TABLE AS, etc.)
      // rather than a Command; plain queries never parse to ParsedStatement.
      case s: ParsedStatement     => s.nodeName
    }
    offending.foreach { node =>
      throw new IllegalArgumentException(
        s"read-only SQL surface: rejected non-query statement ($node)")
    }
  }

  case class ShapedResult(
      columns: Seq[String],
      inline: Seq[Row], // ≤ InlineRowCap rows; preview when truncated
      truncated: Boolean,
      totalRows: Option[Long], // counted only when truncated (extra job)
      csvPath: Option[String])

  /** Execute SQL text against the registered catalog views (SELECT-only). */
  def sql(spark: SparkSession, text: String): DataFrame = {
    requireReadOnly(spark, text)
    spark.sql(text)
  }

  /**
   * Execute + shape. `exportDir`: where to write the full CSV when the
   * result exceeds the inline cap (the reference's presigned-S3-download
   * analog); no export dir → truncated results return the preview only.
   */
  def execute(spark: SparkSession, text: String,
              exportDir: Option[String] = None): ShapedResult = {
    requireReadOnly(spark, text)
    val df = spark.sql(text)
    val probe = df.take(InlineRowCap + 1)
    if (probe.length <= InlineRowCap) {
      ShapedResult(df.columns.toSeq, probe.toSeq, truncated = false, None, None)
    } else {
      // ONE execution for export + row count: the observed metric rides the
      // CSV write job instead of a separate df.count() that would re-run an
      // arbitrary (possibly expensive) plan a third time. Without an export
      // dir nothing else executes the plan, so the count job remains.
      val csvAndCount: (Option[String], Long) = exportDir match {
        case Some(dir) =>
          val path = s"$dir/export-${math.abs(text.hashCode)}"
          val obs = new org.apache.spark.sql.Observation()
          // Partitioned write: every input partition exports in parallel
          // (each part file carries its own header). A coalesce(1) here
          // would funnel a 10^9-row export through one task; the directory
          // IS the download artifact, mirroring a multipart S3 export.
          df.observe(obs, count(lit(1)).as("n_rows"))
            .write.mode("overwrite").option("header", "true").csv(path)
          // the observation arrives via the (async) execution-listener bus;
          // bounded wait, with the old count() as a never-wrong fallback
          val n = try {
            val row = scala.concurrent.Await.result(obs.future,
              scala.concurrent.duration.Duration(10, "s"))
            row.getLong(row.fieldIndex("n_rows"))
          } catch { case _: java.util.concurrent.TimeoutException => df.count() }
          (Some(path), n)
        case None => (None, df.count())
      }
      ShapedResult(df.columns.toSeq, probe.take(PreviewRows).toSeq,
        truncated = true, Some(csvAndCount._2), csvAndCount._1)
    }
  }

  /** The shaped preview as a DataFrame (for the driver's frame compare):
    * preview rows + (total_rows, truncated) bookkeeping columns. */
  def previewFrame(spark: SparkSession, text: String): DataFrame = {
    val df = spark.sql(text)
    val shaped = execute(spark, text)
    val preview = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(
        shaped.inline).asJava),
      df.schema)
    preview
      .withColumn("total_rows", lit(shaped.totalRows.getOrElse(shaped.inline.size.toLong)))
      .withColumn("truncated", lit(shaped.truncated))
  }
}
