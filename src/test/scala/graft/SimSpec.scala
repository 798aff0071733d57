package graft

import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sim

trait PropChecks { self: AnyFunSuite =>
  def check(p: Prop, minTests: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests).withInitialSeed(42L), p)
    assert(res.passed, res.status.toString)
  }
}

class SimSpec extends AnyFunSuite with PropChecks {

  test("jaro-winkler reference values") {
    assert(math.abs(Sim.jaroWinkler("MARTHA", "MARHTA") - 0.9611111) < 1e-6)
    assert(math.abs(Sim.jaroWinkler("DWAYNE", "DUANE") - 0.84) < 1e-6)
    assert(math.abs(Sim.jaroWinkler("DIXON", "DICKSONX") - 0.8133333) < 1e-6)
    assert(Sim.jaroWinkler("", "") == 1.0)
    assert(Sim.jaroWinkler("abc", "") == 0.0)
  }

  test("jaro-winkler properties: identity, symmetry, bounds") {
    check(Prop.forAll { (a: String, b: String) =>
      val s = Sim.jaroWinkler(a, b)
      s >= 0.0 && s <= 1.0 &&
        math.abs(s - Sim.jaroWinkler(b, a)) < 1e-12 &&
        Sim.jaroWinkler(a, a) == 1.0
    })
  }

  test("token jaccard: identity, symmetry, bounds, disjoint") {
    assert(Sim.tokenJaccard("a b c", "a b c") == 1.0)
    assert(Sim.tokenJaccard("a b", "c d") == 0.0)
    assert(math.abs(Sim.tokenJaccard("a b c d", "a b c x") - 0.6) < 1e-12)
    check(Prop.forAll { (a: String, b: String) =>
      val s = Sim.tokenJaccard(a, b)
      s >= 0.0 && s <= 1.0 && math.abs(s - Sim.tokenJaccard(b, a)) < 1e-12
    })
  }

  test("token jaccard is whitespace- and order-insensitive (set semantics)") {
    assert(Sim.tokenJaccard("a  b\tc", "c b a") == 1.0)
    assert(Sim.tokenJaccard("a a a b", "a b") == 1.0)
  }

  test("minhash: deterministic, and similar docs collide more") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy cat again and again today"
    val c = "completely different words entirely unrelated content here now ok"
    def sig(s: String) = Sim.minHashSig(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), 2, 16).toLongArray()
    assert(sig(a).sameElements(sig(a)))
    val ab = sig(a).zip(sig(b)).count { case (x, y) => x == y }
    val ac = sig(a).zip(sig(c)).count { case (x, y) => x == y }
    assert(ab > ac)
  }

  test("simhash: deterministic; near duplicates are hamming-close") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val b = a.replace("gamma", "gampa")
    val c = "one two three four five six seven eight nine ten " * 5
    assert(Sim.simHash(a) == Sim.simHash(a))
    assert(Sim.hamming64(Sim.simHash(a), Sim.simHash(b)) <
      Sim.hamming64(Sim.simHash(a), Sim.simHash(c)))
  }

  test("expressions agree with kernels through the DataFrame API (codegen path)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.functions.col
    val in = Seq(("martha stewart cooking", "marhta stewart cooking"),
      ("a b c d", "a b c x"))
    val rows = in.toDF("x", "y").select(
      jaro_winkler(col("x"), col("y")).as("jw"),
      token_jaccard(col("x"), col("y")).as("tj"),
      simhash64(col("x")).as("sh")).collect()
    rows.zip(in).foreach { case (r, (x, y)) =>
      assert(math.abs(r.getDouble(0) - Sim.jaroWinkler(x, y)) < 1e-12)
      assert(math.abs(r.getDouble(1) - Sim.tokenJaccard(x, y)) < 1e-12)
      assert(r.getLong(2) == Sim.simHash(x))
    }
  }
}
