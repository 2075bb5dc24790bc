package graft

import graft.functions.CharEntropyExpr
import org.apache.spark.sql.functions._

/** Char-entropy quality signal: hand-computed fixtures, the degenerate
  * cases, and a fuzz sweep where the engine column must equal a naive
  * local replay of the integer-carrier formula. */
class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  private def ref(s: String): Long = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0L
    val counts = cps.groupBy(identity).values.map(_.length.toDouble)
    val sumLp = counts.toSeq.sorted
      .map(c => Math.round(c * Math.log(c) * 1e6)).sum
    Math.round(Math.log(n.toDouble) * 1e6) - sumLp / n
  }

  test("fixtures: uniform, single-run, empty") {
    assert(CharEntropyExpr.entropyE6(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab")) === 693147L)
    assert(CharEntropyExpr.entropyE6(
      org.apache.spark.unsafe.types.UTF8String.fromString("aaaa")) === 0L)
    assert(CharEntropyExpr.entropyE6(
      org.apache.spark.unsafe.types.UTF8String.fromString("")) === 0L)
    // natural text sits near ln(alphabet); a mash of one char is near zero
    val nat = CharEntropyExpr.entropyE6(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "the quick brown fox jumps over the lazy dog"))
    assert(nat > 2500000L && nat < 3500000L, nat)
  }

  test("engine column equals the local replay on a fuzz sweep") {
    val rnd = new scala.util.Random(7)
    val alphabet = "aabbccddee  zzz019é!".toCharArray
    val cases = (0 until 400).map { i =>
      (i.toLong, (0 until rnd.nextInt(120)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = cases.toDF("id", "t").repartition(7)
      .select($"id", CharEntropyExpr($"t").as("e"))
      .as[(Long, Long)].collect().toMap
    cases.foreach { case (id, s) =>
      assert(got(id) === ref(s), s"id=$id")
    }
  }

  test("order-free: sumLp is a sum of pre-rounded longs, so permutations agree") {
    val a = "mississippi river banks"
    val b = new String(a.toCharArray.sorted)
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(a)
    val v = org.apache.spark.unsafe.types.UTF8String.fromString(b)
    assert(CharEntropyExpr.entropyE6(u) === CharEntropyExpr.entropyE6(v))
  }
}
