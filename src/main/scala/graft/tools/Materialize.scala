package graft.tools

/** Dev tool: materialize the seeded corpus to parquet for bench runs. */
object Materialize {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create(32, "materialize")
    graft.testgen.WebCorpus.pages(spark, args(0).toLong).toDF()
      .write.mode("overwrite").parquet(args(1))
    spark.stop()
  }
}
