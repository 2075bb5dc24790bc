package graft

import graft.functions.{StripAccentsExpr, TextFns}
import org.apache.spark.sql.functions._

/** CCNet-style normalization: worked examples, ASCII passthrough, the
  * Java-reference fuzz replay (the same agreement the DuckDB oracle checks
  * with strip_accents), and idempotence. */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private def normalize(ss: Seq[String]): Seq[String] =
    ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "t")
      .select($"id", TextFns.normalizeText($"t").as("n"))
      .as[(Long, String)].collect().sortBy(_._1).map(_._2).toSeq

  test("normalizeText: accents, case, digits, whitespace — worked examples") {
    assert(normalize(Seq(
      "Café au Lait",
      "naïve ñandú Ü çedilla",
      "Agent 007 met 12 spies",
      "runs\t of \n\n whitespace ",
      "",
      "   ")) === Seq(
      "cafe au lait",
      "naive nandu u cedilla",
      "agent 000 met 00 spies",
      "runs of whitespace",
      "",
      ""))
  }

  test("strip_accents_g: ASCII passthrough is identity, marks drop, idempotent") {
    val got = Seq((1L, "plain ascii stays!"), (2L, "crème brûlée"),
        (3L, "ñ ö ç à è ú"))
      .toDF("id", "t").select($"id", StripAccentsExpr($"t").as("s"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "plain ascii stays!")
    assert(got(2L) === "creme brulee")
    assert(got(3L) === "n o c a e u")
  }

  test("native kernel == chained-column reference, byte for byte") {
    val alphabet =
      ("abzABZ0159áÁéÉíñÑüÜçÇàèö .\t\n\f\r-!@#" + "  ").toCharArray
    val rnd = new scala.util.Random(11)
    val cases = (0 until 600).map { i =>
      (i.toLong, (0 until rnd.nextInt(60)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val both = cases.toDF("id", "t").repartition(9)
      .select($"id", TextFns.normalizeText($"t").as("n"),
        TextFns.normalizeTextCols($"t").as("r"))
      .as[(Long, String, String)].collect()
    assert(both.length === 600)
    both.foreach { case (id, n, r) =>
      assert(n === r, s"id=$id ${cases(id.toInt)._2.map(_.toInt)}")
    }
  }

  test("normalizeText: fuzz vs a Java-reference replay, and idempotence") {
    def ref(s: String): String = {
      val low = s.toLowerCase(java.util.Locale.ROOT)
      val nfd = java.text.Normalizer.normalize(low,
        java.text.Normalizer.Form.NFD)
      val stripped = nfd.filter(ch =>
        Character.getType(ch) != Character.NON_SPACING_MARK)
      stripped.map(ch => if (ch >= '0' && ch <= '9') '0' else ch)
        .replaceAll("\\s+", " ").trim
    }
    val alphabet =
      "abzABZ0159áÁéÉíñÑüÜçÇàèöskyüß .\t\n-!@".toCharArray
    val rnd = new scala.util.Random(42)
    val cases = (0 until 500).map { i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = cases.toDF("id", "t").repartition(7)
      .select($"id", TextFns.normalizeText($"t").as("n"))
      .as[(Long, String)].collect().toMap
    cases.foreach { case (id, s) =>
      assert(got(id) === ref(s), s"id=$id input=${s.map(_.toInt)}")
    }
    // idempotence: normalizing the normalized corpus is a fixpoint
    val again = cases.map { case (id, s) => (id, got(id)) }
      .toDF("id", "t")
      .select($"id", TextFns.normalizeText($"t").as("n"))
      .as[(Long, String)].collect().toMap
    cases.foreach { case (id, _) => assert(again(id) === got(id)) }
  }
}
