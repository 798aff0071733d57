package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._

class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.create(4, "graft-ext-test")

  test("self-similarity folds to a literal in the optimized plan") {
    import spark.implicits._
    val df = Seq("hello world", "foo bar").toDF("t")
      .select(jaro_winkler(col("t"), col("t")).as("jw"),
        token_jaccard(col("t"), col("t")).as("tj"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("jaro_winkler"),
      s"jaro_winkler(t, t) should fold away:\n$optimized")
    assert(!optimized.contains("token_jaccard"),
      s"token_jaccard(t, t) should fold away:\n$optimized")
    // results unchanged
    assert(df.collect().forall(r => r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0))
  }

  test("fold preserves null-intolerant semantics for nullable input") {
    import spark.implicits._
    val df = Seq(Some("x y"), None).toDF("t")
      .select(jaro_winkler(col("t"), col("t")).as("jw"))
    val got = df.collect()
    assert(got(0).getDouble(0) == 1.0)
    assert(got(1).isNullAt(0), "null input must stay null after folding")
  }

  test("distinct arguments are not folded") {
    // non-local source so ConvertToLocalRelation can't pre-evaluate the plan
    val df = spark.range(3)
      .select(concat(lit("abc"), col("id")).as("a"), concat(lit("abd"), col("id")).as("b"))
      .select(jaro_winkler(col("a"), col("b")).as("jw"))
    assert(df.queryExecution.optimizedPlan.toString.contains("jaro_winkler"))
    assert(df.head().getDouble(0) < 1.0)
  }
}
