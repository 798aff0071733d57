package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-SHAPE regression pins for the scale-critical exchange elisions the
 * resolve pipeline relies on (each was worth a full stream shuffle in the
 * round-4 work-halving measurements). These are properties of Catalyst's
 * EnsureRequirements planning, not of our code — a Spark upgrade or an
 * innocent-looking refactor can silently re-add the exchanges, and only a
 * plan assertion catches that before a benchmark does.
 */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def shuffles(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    plan.collect { case _: ShuffleExchangeExec => 1 }.sum
  }

  /** big enough that autoBroadcast cannot hide a missing exchange */
  private def noBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  import spark.implicits._

  test("dedupPairs: dedup aggregate and the first main_id join both reuse the one repartition") {
    noBroadcast {
      val raw = Seq((1L, 10L), (1L, 10L), (2L, 20L)).toDF("main_id", "sub_id")
      val dim = Seq((1L, "a"), (2L, "b")).toDF("main_id", "t")
      val deduped = pipeline.EntityResolution.dedupPairs(raw)
      // repartition(main_id) is the ONLY shuffle: HashPartitioning on a
      // subset of the dedup keys satisfies the aggregate's clustered
      // distribution (all copies of a pair share main_id)
      assert(shuffles(deduped) == 1,
        s"dedup must ride the repartition exchange-free:\n${deduped.queryExecution}")
      // ... and the aggregate's output partitioning satisfies the next
      // equi-join on main_id: only the dim side adds an exchange
      val joined = deduped.join(dim, "main_id")
      assert(shuffles(joined) == 2,
        s"join on main_id must reuse the dedup partitioning:\n${joined.queryExecution}")
    }
  }

  test("consecutive equi-joins on the same key share the stream's exchange") {
    noBroadcast {
      val fact = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      val d1 = Seq((1L, "a")).toDF("id", "p")
      val d2 = Seq((1L, "b")).toDF("id", "q")
      // fact + d1 + d2 exchanges; NOT a fourth for the second join's stream
      val joined = fact.join(d1, Seq("id"), "left").join(d2, Seq("id"), "left")
      assert(shuffles(joined) == 3,
        s"second same-key join must not re-shuffle the stream:\n${joined.queryExecution}")
    }
  }

  test("CC one-pass stars: one exchange per large-star, two per small-star") {
    noBroadcast {
      // STRUCTURAL pin — raw exchange nodes in the plan TREE, not
      // canonically-distinct ones: small-star's former two-branch union
      // planned its window subtree twice and relied on AQE's reuse-stage
      // dedup to keep it one shuffle at runtime; the single-branch
      // conditional projection holds the count by plan shape alone, so the
      // pin no longer depends on AQE staying on
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
      // large-star = the window min's ClusteredDistribution(src) only — the
      // former groupBy.min + self-join shape planned two full-stream
      // exchanges here
      assert(shuffles(cluster.ConnectedComponents.largeStar(edges)) == 1,
        "large-star must plan exactly the window exchange")
      // small-star = window(hi) + output distinct — the former shape paid
      // four (input distinct, groupBy, join, output distinct)
      assert(shuffles(cluster.ConnectedComponents.smallStar(edges)) == 2,
        "small-star must plan window + distinct only")
      // one full CC half-iteration pair composes to exactly three
      val iter = cluster.ConnectedComponents.smallStar(
        cluster.ConnectedComponents.largeStar(edges))
      assert(shuffles(iter) == 3,
        s"half-iteration pair must shuffle 3 distinct streams:\n${iter.queryExecution}")
      // and the same counts with AQE OFF — the shape is the contract
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        // rebuilt inside the block: a Dataset's queryExecution is cached, so
        // the frames above would reuse their AQE-on plans
        assert(shuffles(cluster.ConnectedComponents.smallStar(edges)) == 2,
          "small-star exchange count must hold without AQE reuse-stage dedup")
        assert(shuffles(cluster.ConnectedComponents.smallStar(
          cluster.ConnectedComponents.largeStar(edges))) == 3,
          "half-iteration exchange count must hold without AQE")
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
  }

  test("integrated shape: window over cid adds exactly one stream exchange after the id joins") {
    noBroadcast {
      val recs = Seq((1L, "u1"), (2L, "u2")).toDF("id", "url")
      val comp = Seq((1L, 7L)).toDF("id", "component")
      val conf = Seq((1L, 0.9)).toDF("id", "best_score")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("cid")
      val out = recs.join(comp, Seq("id"), "left").join(conf, Seq("id"), "left")
        .withColumn("cid", coalesce(col("component"), col("id")))
        .withColumn("MatchID", min("url").over(w))
      // stream(id) + comp + conf + window(cid) = 4; the groupBy+join-back
      // shape this replaced planned 5 and re-executed the first join
      assert(shuffles(out) == 4,
        s"integrated stream must be exchanged exactly twice:\n${out.queryExecution}")
    }
  }
}
