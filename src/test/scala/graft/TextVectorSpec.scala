package graft

import graft.functions.{RollingHash64, TextFns, VectorFns}
import org.apache.spark.sql.functions._

class TextVectorSpec extends SparkSpec {
  import spark.implicits._

  test("words lowercases, trims, drops empties") {
    val w = Seq("  The  quick   Fox ").toDF("t")
      .select(TextFns.words($"t").as("w")).as[Seq[String]].head()
    assert(w == Seq("the", "quick", "fox"))
  }

  test("native sorted_hashed_shingles == HOF column pipeline (incl. non-ASCII)") {
    val texts = Seq(
      "The quick brown Fox jumps over the lazy dog",
      "  leading and trailing   whitespace\tand\ttabs  ",
      "der schnelle braune Fuchs springt über den FLUSS",
      "这 是 一个 中文 文本 的 测试 样本",
      "repeat repeat repeat repeat repeat",
      "two words",
      "one",
      "")
    for (n <- Seq(1, 2, 3)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val both = df.select($"id",
          TextFns.sortedHashedShingles($"t", n).as("native"),
          TextFns.sortedHashedShinglesCols($"t", n).as("cols"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n id=${r.getLong(0)}: native != column pipeline")
      }
    }
    // real corpus sweep: every document at sf0.001 agrees
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
        TextFns.sortedHashedShingles($"text", 3).as("a"),
        TextFns.sortedHashedShinglesCols($"text", 3).as("b"))
      .filter($"a" =!= $"b").count()
    assert(diff == 0)
  }

  test("native distinct string shingles == HOF column pipeline (incl. empty-short)") {
    val texts = Seq(
      "The quick brown Fox jumps over the lazy dog",
      "  leading and trailing   whitespace\tand\ttabs  ",
      "a b a b a b", // duplicate shingles: first-occurrence order must hold
      "über ÜBER über", "两 个 字", "two words", "one", "")
    for (n <- Seq(1, 2, 3, 5)) {
      val both = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
        .select($"id",
          TextFns.stringShingles($"t", n).as("native"),
          array_distinct(TextFns.wordShingles(TextFns.words($"t"), n))
            .as("cols"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n id=${r.getLong(0)}: native != column pipeline " +
            s"(${r.getSeq[String](1)} vs ${r.getSeq[String](2)})")
      }
    }
    // real corpus sweep: every document at sf0.001 agrees
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
        TextFns.stringShingles($"text", 5).as("a"),
        array_distinct(TextFns.wordShingles(TextFns.words($"text"), 5)).as("b"))
      .filter(!($"a" <=> $"b")).count()
    assert(diff == 0)
  }

  test("native positional shingles == HOF transform pipeline (order + values)") {
    val texts = Seq(
      "The quick brown Fox jumps over the lazy dog",
      "a b a b a b",                    // repeated windows must repeat in place
      "über ÜBER über", "two words", "one", "")
    for (n <- Seq(1, 2, 3, 5)) {
      val both = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
        .select($"id",
          TextFns.positionalShingles($"t", n).as("native"),
          transform(TextFns.wordShingles(TextFns.words($"t"), n),
            g => xxhash64(g)).as("cols"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n id=${r.getLong(0)}")
      }
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
        TextFns.positionalShingles($"text", 20).as("a"),
        transform(TextFns.wordShingles(TextFns.words($"text"), 20),
          g => xxhash64(g)).as("b"))
      .filter(!($"a" <=> $"b")).count()
    assert(diff == 0)
  }

  test("native hyperplane_bucket == HOF column form on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for ((planes, off) <- Seq((6, 0), (12, 24))) {
      val diff = emb.select(
          VectorFns.hyperplaneBucket($"embedding", planes, off).as("nat"),
          VectorFns.hyperplaneBucketCols($"embedding", planes, off).as("ref"))
        .filter($"nat" =!= $"ref").count()
      assert(diff == 0, s"planes=$planes offset=$off")
    }
  }

  test("native nearest_cells == HOF column form on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val prepped = emb.select($"vec_id",
        graft.functions.VectorFns.quantize($"embedding").as("cv"))
      .withColumn("cn", graft.functions.VectorFns.normLong($"cv"))
    val cents = prepped.orderBy(xxhash64($"vec_id"), $"vec_id").limit(16)
      .select($"vec_id".as("centroid_id"), $"cv".as("centv"), $"cn".as("centn"))
      .agg(collect_list(struct($"centroid_id", $"centv", $"centn")).as("cents"))
    for (take <- Seq(1, 4, 16)) {
      val diff = prepped.crossJoin(broadcast(cents))
        .select(
          graft.operators.Similarity.nearestCellIds($"cents", $"cv", $"cn", take).as("nat"),
          graft.operators.Similarity.nearestCellIdsCols($"cents", $"cv", $"cn", take).as("ref"))
        .filter($"nat" =!= $"ref").count()
      assert(diff == 0, s"take=$take")
    }
  }

  test("degenerate vectors (zero-norm, NaN/Inf components) don't crash the native kernels") {
    // zero-norm corpus vector → cos = 0/0 = NaN inside nearest_cells;
    // NaN/Inf components hit the quantizer in hyperplane_bucket. The column
    // references pass NaN through (Spark round) — the native kernels must
    // complete, not throw NumberFormatException from BigDecimal.valueOf.
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f, 0.0f)),
      (2L, Array(Float.NaN, 1.0f, 2.0f)),
      (3L, Array(Float.PositiveInfinity, -1.0f, 0.5f)),
      (4L, Array(0.1f, 0.2f, 0.3f))).toDF("vec_id", "embedding")
    // hyperplane_bucket over all rows completes and is deterministic
    val buckets = vecs.select($"vec_id",
        VectorFns.hyperplaneBucket($"embedding", 12, 0).as("b"))
      .orderBy($"vec_id").as[(Long, Int)].collect()
    assert(buckets.length == 4)
    // and still agrees with the column reference (both saturate NaN→0, ±Inf→min/max)
    val diff = vecs.select(
        VectorFns.hyperplaneBucket($"embedding", 12, 0).as("nat"),
        VectorFns.hyperplaneBucketCols($"embedding", 12, 0).as("ref"))
      .filter($"nat" =!= $"ref").count()
    assert(diff == 0)
    // nearest_cells with a zero-norm query AND a zero-norm centroid completes
    val prepped = vecs.select($"vec_id",
        VectorFns.quantize($"embedding").as("cv"))
      .withColumn("cn", VectorFns.normLong($"cv"))
    val cents = prepped
      .select($"vec_id".as("centroid_id"), $"cv".as("centv"), $"cn".as("centn"))
      .agg(collect_list(struct($"centroid_id", $"centv", $"centn")).as("cents"))
    val assigned = prepped.crossJoin(broadcast(cents))
      .select($"vec_id",
        graft.operators.Similarity.nearestCellIds($"cents", $"cv", $"cn", 2).as("cells"))
      .collect()
    assert(assigned.length == 4)
    assigned.foreach(r => assert(r.getSeq[Long](1).length == 2))
  }

  test("native quantized_dot == HOF column form on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
      .select(graft.functions.VectorFns.quantize($"embedding").as("q"))
    val pairs = emb.as("x").crossJoin(emb.as("y"))
    val diff = pairs.select(
        graft.functions.VectorFns.dotLong($"x.q", $"y.q").as("native"),
        graft.functions.VectorFns.dotLongCols($"x.q", $"y.q").as("cols"))
      .filter($"native" =!= $"cols").count()
    assert(diff == 0)
  }

  test("wordShingles yields n-grams; short docs yield empty") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextFns.wordShingles(TextFns.words($"t"), 3).as("s"))
      .as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextFns.wordShingles(TextFns.words($"t"), 3).as("s"))
      .as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("tokenCount: letter runs + digit singletons + symbols") {
    val n = Seq("Hello world42 x!").toDF("t")
      .select(TextFns.tokenCount($"t").as("n")).as[Int].head()
    // hello, world, 4, 2, x, ! -> 6
    assert(n == 6)
  }

  test("langIdPredict: earlier language wins ties; markers score") {
    val p1 = Seq("der und die x").toDF("t")
      .select(TextFns.langIdPredict($"t")).as[String].head()
    assert(p1 == "de")
    val tie = Seq("xyz qrs").toDF("t") // all scores 0 -> first lang wins
      .select(TextFns.langIdPredict($"t")).as[String].head()
    assert(tie == "en")
  }

  test("fingerprintSha is word-order and repetition insensitive") {
    val fps = Seq("b a a b", "a b").toDF("t")
      .select(TextFns.fingerprintSha($"t").as("f")).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("quantized cosine ~ exact double cosine; self-cosine == 1") {
    val a = Array(0.1f, 0.2f, 0.3f)
    val b = Array(0.3f, 0.1f, 0.2f)
    val df = Seq((a, b)).toDF("a", "b")
      .select(VectorFns.cosine($"a", $"b").as("ab"),
        VectorFns.cosine($"a", $"a").as("aa"))
    val (ab, aa) = df.as[(Double, Double)].head()
    val exact = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    assert(math.abs(ab - exact) < 1e-5)
    assert(math.abs(aa - 1.0) < 1e-12)
  }

  test("cosineFromQuantized is bit-identical to cosine on raw vectors") {
    val vecs = Seq(
      (Array(0.11f, -0.52f, 0.33f, 0.9f), Array(0.77f, 0.2f, -0.4f, 0.01f)))
      .toDF("a", "b")
    val plain = vecs.select(VectorFns.cosine($"a", $"b")).as[Double].head()
    val fast = vecs.select(
      VectorFns.cosineFromQuantized(
        VectorFns.quantize($"a"), VectorFns.quantize($"b"),
        VectorFns.normLong(VectorFns.quantize($"a")),
        VectorFns.normLong(VectorFns.quantize($"b")))).as[Double].head()
    assert(plain == fast) // exactly equal, not approximately
  }

  test("rolling_hash64: eval == codegen == reference impl; SQL registration") {
    RollingHash64.register(spark)
    val expected = RollingHash64.hashBytes("hello".getBytes("UTF-8"))
    val viaSql = spark.sql("SELECT rolling_hash64('hello') AS h")
      .as[Long].head()
    assert(viaSql == expected)
    // codegen path over a column (whole-stage codegen on)
    val viaCol = Seq("hello", "world").toDF("t")
      .selectExpr("rolling_hash64(t) AS h").as[Long].collect()
    assert(viaCol(0) == expected)
    assert(viaCol(1) == RollingHash64.hashBytes("world".getBytes("UTF-8")))
    // null safety
    val n = Seq(Option.empty[String]).toDF("t")
      .selectExpr("rolling_hash64(t)").collect()
    assert(n(0).isNullAt(0))
  }
}
