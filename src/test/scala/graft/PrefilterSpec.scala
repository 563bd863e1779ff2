package graft

import org.apache.spark.sql.functions._

import graft.operators.Prefilter

/** Bloom semi-join reduction (q44): transparency vs the plain join,
  * actual pruning, and the false-positive contract.
  */
class PrefilterSpec extends SparkSuite {
  import spark.implicits._

  private def fact = (1L to 1000L).map(i => (i % 100, s"f$i")).toDF("k", "payload")
  private def dim = Seq((3L, "a"), (17L, "b"), (42L, "c")).toDF("dk", "name")

  test("bloom-prefiltered join is row-identical to the plain join") {
    val plain = fact.join(dim, $"k" === $"dk")
      .collect().map(_.toSeq).toSet
    val bloomed = Prefilter.bloomPrefilteredJoin(fact, dim, "k", "dk", expectedKeys = 10)
      .collect().map(_.toSeq).toSet
    assert(bloomed == plain && plain.size == 30)
  }

  test("the bloom actually prunes non-matching fact rows before the join") {
    val bits = Prefilter.keyBloom(dim, "dk", expectedKeys = 10, fpp = 0.01)
    val kept = fact.filter(Prefilter.mightContain(bits, $"k")).count()
    // 30 true matches; at fpp=1% the 970 absent-key rows admit only a few strays
    assert(kept >= 30 && kept <= 30 + 100)
  }

  test("false-positive rate honors the sizing formula") {
    val keys = (1L to 1000L).map(i => Tuple1(i)).toDF("dk")
    val bits = Prefilter.keyBloom(keys, "dk", expectedKeys = 1000, fpp = 0.03)
    val absent = (100001L to 110000L).map(i => Tuple1(i)).toDF("k")
    val fp = absent.filter(Prefilter.mightContain(bits, $"k")).count()
    assert(fp.toDouble / 10000 < 0.03 * 3, s"fp rate ${fp / 10000.0} way over target")
  }

  test("empty dim yields an empty join, not a full scan pass-through") {
    val none = dim.filter($"dk" < 0)
    assert(Prefilter.bloomPrefilteredJoin(fact, none, "k", "dk", expectedKeys = 10).count() == 0)
  }
}
