package graft.tools

/** Dev tool: time one or more SparkEntry queries standalone at a given sf
  * dir — best-of-N after one warmup pass, printed per query. Separates "the
  * operator is slow" from "the bench window was slow" when a headline
  * number looks off (usage: QueryTime <sfDir> <reps> <query...>). */
object QueryTime {
  def main(args: Array[String]): Unit = {
    // validate BEFORE paying session + corpus warmup (ADVICE r5: an unknown
    // name used to throw a bare NoSuchElementException after the warmup)
    if (args.length < 3) {
      System.err.println("usage: QueryTime <sfDir> <reps> <query...>\n" +
        s"queries: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val sfDir = args(0)
    val reps = args(1).toIntOption.getOrElse {
      System.err.println(s"reps must be an int, got '${args(1)}'"); sys.exit(2)
    }
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}\n" +
        s"valid: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val spark = graft.GraftSession.create(32, "graft-qtime")
    graft.testgen.WebCorpus.pagesMaterialized(spark, sfDir)
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm: codegen + JIT + page cache
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qtime] $name best=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
