package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.testgen.WebCorpus

/**
 * Semantic catalog: registers every engine table as a temp view and carries
 * the table/column comment model the reference's text2sql agent introspects.
 *
 * The reference stores its semantic model as Glue table/column comments
 * (reference: lib/data-storage.ts:60-386 — e.g. the MatchID join-hint
 * comments at :201-211 and :367-379) and the agent reads them back via
 * get-table-info before writing SQL (lambda/webbackend/agent_processor.py:613-753).
 * Spark temp views carry no comment metadata, so the model lives here beside
 * the registration and is exposed through [[describeTable]] /
 * [[semanticModel]] — the same introspection surface, engine-side.
 */
object Catalog {

  case class ColumnDoc(name: String, comment: String)
  case class TableDoc(name: String, comment: String, columns: Seq[ColumnDoc])

  /** Driver parquet tables + the corpus tables, with the comment model. */
  val tables: Seq[TableDoc] = Seq(
    TableDoc("region", "geographic regions", Seq(
      ColumnDoc("r_regionkey", "region key"), ColumnDoc("r_name", "region name"))),
    TableDoc("nation", "nations, each belonging to a region", Seq(
      ColumnDoc("n_nationkey", "nation key"), ColumnDoc("n_name", "nation name"),
      ColumnDoc("n_regionkey", "joins region.r_regionkey"))),
    TableDoc("customer", "customer master; one row per customer", Seq(
      ColumnDoc("c_custkey", "customer key; joins orders.o_custkey"),
      ColumnDoc("c_name", "customer display name"),
      ColumnDoc("c_mktsegment", "market segment the customer belongs to"))),
    TableDoc("supplier", "supplier master", Seq(
      ColumnDoc("s_suppkey", "supplier key; joins lineitem.l_suppkey"),
      ColumnDoc("s_name", "supplier name"))),
    TableDoc("part", "item/part master; one row per sellable item", Seq(
      ColumnDoc("p_partkey", "item key; joins lineitem.l_partkey"),
      ColumnDoc("p_brand", "brand label"), ColumnDoc("p_type", "item type label"))),
    TableDoc("orders", "purchase orders; one row per order", Seq(
      ColumnDoc("o_orderkey", "order key; joins lineitem.l_orderkey"),
      ColumnDoc("o_custkey", "purchasing customer; joins customer.c_custkey"),
      ColumnDoc("o_totalprice", "order total price"),
      ColumnDoc("o_orderdate", "order date"),
      ColumnDoc("o_orderstatus", "order status code"))),
    TableDoc("lineitem", "order line items; finest-grained purchase fact", Seq(
      ColumnDoc("l_orderkey", "joins orders.o_orderkey"),
      ColumnDoc("l_partkey", "joins part.p_partkey"),
      ColumnDoc("l_suppkey", "joins supplier.s_suppkey"),
      ColumnDoc("l_quantity", "units purchased"),
      ColumnDoc("l_extendedprice", "extended price"))),
    TableDoc("events", "behavioral event stream", Seq(
      ColumnDoc("event_id", "event id"), ColumnDoc("event_type", "event type tag"),
      ColumnDoc("ts", "event timestamp"), ColumnDoc("props", "JSON properties"))),
    TableDoc("documents", "text corpus for training-data ops", Seq(
      ColumnDoc("doc_id", "document id"), ColumnDoc("text", "document body"),
      ColumnDoc("lang", "language tag"), ColumnDoc("source", "origin tag"),
      ColumnDoc("n_chars", "body length in characters"))),
    TableDoc("embeddings", "vector embeddings for similarity search", Seq(
      ColumnDoc("vec_id", "vector id"), ColumnDoc("embedding", "float vector"),
      ColumnDoc("label", "generator label"))),
    TableDoc("pages", "Common-Crawl-style web pages (two sources)", Seq(
      ColumnDoc("url", "page url — the ER RecordId"),
      ColumnDoc("warc_ts", "crawl timestamp"),
      ColumnDoc("html", "raw page bytes"),
      ColumnDoc("text", "expected extracted text"),
      ColumnDoc("lang", "page language"),
      ColumnDoc("source", "main|sub; pages of the same entity share a MatchID "
        + "after resolution — same-entity rows must be joined through the "
        + "integrated table, not url equality"))))

  /**
   * Register all tables as temp views over the scale dir + materialized
   * corpus, and the graft SQL functions — after this, arbitrary SQL text
   * (the reference's execute-sql tool) runs via `spark.sql`.
   */
  def register(spark: SparkSession, sfDir: String): Unit = {
    for (t <- tables if t.name != "pages") {
      val p = s"$sfDir/${t.name}.parquet"
      if (new java.io.File(p).exists())
        spark.read.parquet(p).createOrReplaceTempView(t.name)
    }
    WebCorpus.pagesMaterialized(spark, sfDir).createOrReplaceTempView("pages")
    graft.functions.GraftFunctions.register(spark)
  }

  /**
   * Register a published snapshot table (see
   * [[graft.publish.Downstream.publishAtomic]]) as a temp view resolving
   * through its manifest — the SQL-text surface then queries the atomic
   * `latest` snapshot like any other table (the reference's
   * integrated_customer registration, lib/data-storage.ts:155-217). Re-call
   * after a publish to move the view to the new snapshot.
   *
   * Vacuum interaction: the view binds to the CONCRETE snapshots/vN
   * directory resolved at registration. `publishSnapshot(retain = k)`
   * eventually deletes that directory, after which the stale view fails
   * with file-not-found rather than degrading to the latest snapshot —
   * re-register on publish (or keep `retain` above the longest view
   * lifetime). This mirrors Iceberg semantics: a reader pinned to an
   * expired snapshot errors once `expire_snapshots` removes its files.
   */
  def registerPublished(spark: SparkSession, name: String, tableDir: String): Unit =
    graft.publish.Downstream.readLatest(spark, tableDir).createOrReplaceTempView(name)

  /** Introspection: (column, dtype, comment) for one table — the engine-side
    * analog of the agent's get-table-info tool. */
  def describeTable(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val doc = tables.find(_.name == table)
      .getOrElse(throw new IllegalArgumentException(s"unknown table $table"))
    val comments = doc.columns.map(c => c.name -> c.comment).toMap
    spark.table(table).schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, comments.getOrElse(f.name, "")))
      .toDF("col_name", "data_type", "comment")
  }

  /** The full semantic model as a frame (table, table_comment, column,
    * column_comment) — what a text2sql agent would prompt with. */
  def semanticModel(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tables.flatMap(t => t.columns.map(c => (t.name, t.comment, c.name, c.comment)))
      .toDF("table_name", "table_comment", "col_name", "col_comment")
  }
}
