package graft

import org.apache.spark.sql.functions._

/** ScaleGen writes the amplified bench corpora — if its key shifting is
  * wrong, every sf1 number is measured on a broken join graph, so the
  * invariants are pinned: row counts multiply, keys stay unique, foreign
  * keys resolve within replicas, and the base replica survives verbatim
  * (query slices like vec_id < 10 keep their original meaning). */
class ScaleGenSpec extends SparkSpec {
  import spark.implicits._

  test("amplification: counts multiply, keys unique, joins resolve, base intact") {
    val out = java.nio.file.Files.createTempDirectory("scalegen").toString
    ScaleGen.main(Array("/root/testdata/sf0.001", out, "3"))
    def t(n: String) = spark.read.parquet(s"$out/$n.parquet")
    def src(n: String) = spark.read.parquet(s"/root/testdata/sf0.001/$n.parquet")

    // counts: dims pass through, facts triple
    assert(t("region").count() == src("region").count())
    assert(t("nation").count() == src("nation").count())
    for (n <- Seq("customer", "orders", "lineitem", "events", "documents",
        "embeddings"))
      assert(t(n).count() == 3 * src(n).count(), n)

    // shifted keys stay unique
    assert(t("orders").select("o_orderkey").distinct().count() ==
      t("orders").count())
    assert(t("documents").select("doc_id").distinct().count() ==
      t("documents").count())

    // referential integrity: every lineitem still joins exactly one order,
    // and the join cardinality triples with the data (no cross-replica edges)
    val joined = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == t("lineitem").count())
    val srcJoined = src("lineitem")
      .join(src("orders"), col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == 3 * srcJoined.count())

    // the base replica is verbatim: fixed query slices keep their meaning
    val baseVec = t("embeddings").filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    val srcVec = src("embeddings").filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    assert(baseVec == srcVec)

    // replicas carry verbatim payloads: distinct texts don't grow
    assert(t("documents").select("text").distinct().count() ==
      src("documents").select("text").distinct().count())
  }
}
