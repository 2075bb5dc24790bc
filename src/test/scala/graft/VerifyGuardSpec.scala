package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins the Verify shrinkage guard (r7 verdict item 4): a query that throws must
  * surface in the returned failure ledger — never silently vanish from the
  * correctness artifact the way r7's 9 ts-broken queries did. */
class VerifyGuardSpec extends SparkSpec {

  test("runQueries reports throwing queries and still writes the healthy ones") {
    val out = java.nio.file.Files.createTempDirectory("verify-guard").toString
    val good: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).toDF("id")
    val bad: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("forced failure for the guard spec")
    val failed = Verify.runQueries(spark, "/unused", out,
      Map("q_good" -> good, "q_bad" -> bad))
    assert(failed.keySet == Set("q_bad"))
    assert(failed("q_bad").contains("forced failure"))
    assert(new java.io.File(s"$out/q_good").exists(),
      "healthy queries must still be dumped when a sibling fails")
    assert(spark.read.parquet(s"$out/q_good").count() == 3)
  }

  test("runQueries returns empty on an all-green map") {
    val out = java.nio.file.Files.createTempDirectory("verify-guard2").toString
    val failed = Verify.runQueries(spark, "/unused", out,
      Map("q_ok" -> ((s: SparkSession, _: String) => s.range(1).toDF("id"))))
    assert(failed.isEmpty)
  }
}
