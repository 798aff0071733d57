package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.cluster.ConnectedComponents

class ClusterSpec extends AnyFunSuite with PropChecks {
  lazy val spark = TestSpark.spark

  /** Driver-side union-find oracle. */
  private def unionFind(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def runCC(edges: Seq[(String, String)]): Map[String, String] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    val out = ConnectedComponents.run(df).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // roots map to themselves implicitly
    out
  }

  test("large-star/small-star matches union-find on random graphs") {
    val genEdges = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 80)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (f"n$a%03d", f"n$b%03d"))
    } yield es.filter(e => e._1 != e._2)
    check(Prop.forAll(genEdges) { es =>
      es.isEmpty || {
        val expected = unionFind(es).filter { case (k, v) => k != v }
        val got = runCC(es)
        got == expected
      }
    }, minTests = 20)
  }

  test("long chain collapses to one component (log-round convergence)") {
    import spark.implicits._
    val chain = (0 until 200).map(i => (f"c$i%04d", f"c${i + 1}%04d"))
    val out = runCC(chain)
    assert(out.values.toSet == Set("c0000"))
    assert(out.keySet == (1 to 200).map(i => f"c$i%04d").toSet)
  }

  test("star with celebrity hub stays linear and correct") {
    val star = (1 until 500).map(i => (f"s$i%04d", "s0000"))
    val out = runCC(star)
    assert(out.values.toSet == Set("s0000"))
  }

  test("MatchID partition refinement: components equal transitive closure of edges") {
    import spark.implicits._
    // two disjoint triangles + an isolated edge
    val es = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("p", "q"))
    val got = runCC(es)
    assert(got == Map("b" -> "a", "c" -> "a", "y" -> "x", "z" -> "x", "q" -> "p"))
  }
}
