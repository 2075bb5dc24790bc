package graft.operators

import graft.functions.{RollingHash64, TextFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed quality-classifier training and scoring over hashed
  * bag-of-words features — the fastText-style document filter every modern
  * pretraining pipeline runs (GPT-3 / LLaMA filter Common Crawl by a linear
  * classifier's score against a trusted reference corpus; the reference
  * repo's validation predicates are the same gate at time-series scale).
  *
  * Everything is integer-exact where cross-engine/cross-run determinism
  * matters:
  *  - Features are EXACT token counts per FNV-hashed bucket (`dim`-bounded).
  *  - `marginScore` takes integer (e3-scaled) weights and emits the exact
  *    integer dot product — associative, partition-order-independent,
  *    SQL-reproducible (q85's oracle re-derives the FNV bucketing and the
  *    margins byte-for-byte).
  *  - `trainLogistic` runs full-batch gradient descent with QUANTIZED
  *    carriers: weights live as e6 integers, per-document residuals
  *    `round((sigmoid(margin) - y)·1e6)` are rounded to integers BEFORE the
  *    gradient aggregate, so every shuffle carries integers and the learned
  *    weights are bit-identical under any partitioning — a local single-core
  *    reference implementation reproduces the distributed run exactly
  *    (spec-pinned). Deterministic training is not a toy nicety: it is what
  *    makes a 1000-executor run auditable and resumable.
  *
  * Scale shape: the feature frame is one explode + one map-combinable count
  * aggregate (shuffle keyed on (doc, bucket), bounded by docs·dim not by
  * token occurrences). Each training iteration is two aggregates — margins
  * by doc (the weight vector rides along as a plan literal, dim-bounded),
  * then gradient by bucket (dim rows out) — and one dim-sized driver
  * collect. The model never exceeds `dim` longs; nothing corpus-scale ever
  * sits on the driver. */
object Classifier {

  /** Feature bucket of a token: FNV-1a 64 mod dim (non-negative). */
  private def bucket(token: Column, dim: Int): Column =
    pmod(RollingHash64(token), lit(dim.toLong)).cast("int")

  /** Hashed bag-of-words: one row per (id, bucket) with the EXACT token
    * occurrence count. `extra` columns (e.g. the label) are carried through
    * the aggregate unchanged. */
  def hashedBow(docs: DataFrame, idCol: String, textCol: String, dim: Int,
                extra: Seq[String] = Nil): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    // few-file guard before the tokenize/explode kernel (r11 audit)
    Dedup.ensureParallel(docs.select((col(idCol) +: extra.map(col) :+
        col(textCol)): _*))
      .select((col(idCol) +: extra.map(col) :+
        explode(TextFns.words(col(textCol))).as("__t")): _*)
      .withColumn("__b", bucket(col("__t"), dim))
      .groupBy((col(idCol) +: extra.map(col) :+ col("__b")): _*)
      .agg(count(lit(1)).as("__cnt"))
  }

  /** Exact integer classifier margin: Σ count(bucket) · wE3(bucket), with
    * `weights` a (bucket, w_e3) frame of e3-scaled integer weights —
    * dim-bounded, broadcast. The real-valued margin is `margin_e3 / 1e3`;
    * ranking and thresholding work on the integer directly. Tokenless
    * documents have no features and drop, as in every occurrence scorer. */
  def marginScore(docs: DataFrame, idCol: String, textCol: String,
                  weights: DataFrame, dim: Int): DataFrame =
    hashedBow(docs, idCol, textCol, dim)
      .join(broadcast(weights.select(col("bucket").as("__b"),
        col("w_e3"))), Seq("__b"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_tokens"),
        sum(col("__cnt") * coalesce(col("w_e3"), lit(0L))).as("margin_e3"))

  /** Full-batch logistic-regression training with quantized carriers; returns
    * the learned e6-scaled integer weight vector (index = bucket).
    *
    * Update rule per iteration, all from integers the cluster computed:
    * `wE6[b] -= round(lr · gradE6[b] / n)` where `gradE6[b] =
    * Σ_docs residual_e6(doc) · cnt(doc, b)` and `residual_e6 =
    * round((sigmoid(marginE6 / 1e6) - y) · 1e6)` (Spark HALF_UP rounding).
    * `lr` is the real learning rate; labels are 0/1 in `labelCol`. */
  def trainLogistic(docs: DataFrame, idCol: String, textCol: String,
                    labelCol: String, dim: Int, iters: Int,
                    lr: Double): Array[Long] = {
    import org.apache.spark.storage.StorageLevel
    val feats = hashedBow(docs, idCol, textCol, dim, extra = Seq(labelCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = feats.select(col(idCol)).distinct().count()
    require(n > 0, "cannot train on an empty corpus")
    val w = trainLogisticOnFeats(feats, idCol, labelCol, dim, iters, lr, n)
    feats.unpersist(blocking = false)
    w
  }

  /** The shared GD core over a PREPARED (id, [extra], __b, __cnt) feature
    * frame — `trainLogistic`'s loop, reused by the multi-class one-vs-rest
    * trainer so K heads share one tokenize/hash pass. `labelCol` must be
    * 0/1-valued in `feats`. */
  private def trainLogisticOnFeats(feats: DataFrame, idCol: String,
                                   labelCol: String, dim: Int, iters: Int,
                                   lr: Double, n: Long): Array[Long] = {
    val wE6 = new Array[Long](dim)
    for (_ <- 0 until iters) {
      // margin_e6 per doc: exact integer dot of counts with the current
      // weights (a dim-sized plan literal — effectively a broadcast)
      val wLit = typedlit(wE6.toSeq)
      val resid = feats
        .groupBy(col(idCol), col(labelCol))
        .agg(sum(col("__cnt") * element_at(wLit, col("__b") + 1))
          .as("__m_e6"))
        .select(col(idCol),
          round((lit(1.0) / (lit(1.0) + exp(-col("__m_e6") / 1e6)) -
            col(labelCol).cast("double")) * 1e6).cast("long").as("__r_e6"))
      // gradient by bucket: integer carrier, map-combinable, dim rows out
      val grad = feats.join(resid, Seq(idCol))
        .groupBy(col("__b"))
        .agg(sum(col("__r_e6") * col("__cnt")).as("__g"))
        .collect()
      for (row <- grad) {
        val b = row.getInt(0)
        wE6(b) -= math.round(lr * row.getLong(1) / n)
      }
    }
    wE6
  }

  // ---- Multi-class language ID (the fastText-LID shape, r14) ----

  /** Hashed char-n-gram bag — the LID feature frame: one row per
    * (id, bucket) with the exact n-gram occurrence count over
    * `lower(trim(text))`, n in [nMin, nMax] (see
    * [[graft.functions.CharNgramBucketsExpr]]; q131's oracle re-derives
    * every bucket from `substr` + the q85 FNV walk). Same scale shape as
    * [[hashedBow]]: one compiled row-pass + one map-combinable count
    * aggregate, shuffle bounded by docs·dim. */
  def hashedCharNgrams(docs: DataFrame, idCol: String, textCol: String,
                       nMin: Int, nMax: Int, dim: Int,
                       extra: Seq[String] = Nil): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    Dedup.ensureParallel(docs.select((col(idCol) +: extra.map(col) :+
        col(textCol)): _*))
      .select((col(idCol) +: extra.map(col) :+
        explode(graft.functions.CharNgramFns.charNgramBuckets(
          lower(trim(col(textCol))), nMin, nMax, dim)).as("__b")): _*)
      .groupBy((col(idCol) +: extra.map(col) :+ col("__b")): _*)
      .agg(count(lit(1)).as("__cnt"))
  }

  /** Exact integer margins per (doc, language): Σ cnt(bucket) ·
    * w_e3(lang, bucket) with `weights` a (lang, bucket, w_e3) frame —
    * K·dim rows, broadcast. `n_grams` is the doc's total n-gram count
    * (weights are dense per language, so it is language-invariant and
    * rides the same aggregate). Gram-less documents (text shorter than
    * nMin codepoints) have no features and drop, the occurrence-scorer
    * convention. */
  def multiclassMargins(docs: DataFrame, idCol: String, textCol: String,
                        weights: DataFrame, nMin: Int, nMax: Int,
                        dim: Int): DataFrame =
    hashedCharNgrams(docs, idCol, textCol, nMin, nMax, dim)
      .join(broadcast(weights.select(col("lang"), col("bucket").as("__b"),
        col("w_e3"))), Seq("__b"))
      .groupBy(col(idCol), col("lang"))
      .agg(sum(col("__cnt")).as("n_grams"),
        sum(col("__cnt") * col("w_e3")).as("margin_e3"))

  /** Argmax language per document (highest margin; ties break to the
    * lexicographically smallest language — deterministic, oracle-able).
    * Returns (id, lang, margin_e3). */
  def predictLanguage(docs: DataFrame, idCol: String, textCol: String,
                      weights: DataFrame, nMin: Int, nMax: Int,
                      dim: Int): DataFrame =
    multiclassMargins(docs, idCol, textCol, weights, nMin, nMax, dim)
      .groupBy(col(idCol))
      .agg(min(struct((-col("margin_e3")).as("n"), col("lang").as("l")))
        .as("__w"))
      .select(col(idCol), col("__w.l").as("lang"),
        (-col("__w.n")).as("margin_e3"))

  /** One-vs-rest multi-class training over a SHARED char-n-gram feature
    * frame: one tokenize/hash pass, K quantized-GD heads (the
    * [[trainLogistic]] core — integer carriers, bit-identical under any
    * partitioning). Returns label → e6-scaled weight vector, labels in
    * lexicographic order. The fastText-LID shape: hashed subword features,
    * linear heads, argmax serve. */
  def trainMulticlass(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: String, nMin: Int, nMax: Int, dim: Int,
                      iters: Int, lr: Double): Seq[(String, Array[Long])] = {
    import org.apache.spark.storage.StorageLevel
    val feats = hashedCharNgrams(docs, idCol, textCol, nMin, nMax, dim,
      extra = Seq(labelCol)).persist(StorageLevel.MEMORY_AND_DISK)
    val n = feats.select(col(idCol)).distinct().count()
    require(n > 0, "cannot train on an empty corpus")
    val labels = feats.select(col(labelCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val out = labels.map { l =>
      val bin = feats.withColumn("__y",
        (col(labelCol).cast("string") === lit(l)).cast("int"))
      l -> trainLogisticOnFeats(bin, idCol, "__y", dim, iters, lr, n)
    }
    feats.unpersist(blocking = false)
    out
  }

  /** The (lang, bucket, w_e3) weights frame [[multiclassMargins]] serves
    * from, out of [[trainMulticlass]]'s e6 vectors (e6 → e3 by integer
    * division — LID margins are rank statistics, the 1e-3 tail is noise).
    * DENSE on purpose (K·dim rows, broadcast-sized): the margin join
    * matches every (doc-bucket, lang) pair, so every scored doc gets a
    * margin for every language and `n_grams` is language-invariant —
    * sparse weights would silently drop (doc, lang) combinations whose
    * grams all miss that language's non-zero buckets. */
  def multiclassWeightsFrame(spark: org.apache.spark.sql.SparkSession,
                             model: Seq[(String, Array[Long])]): DataFrame = {
    import spark.implicits._
    model.flatMap { case (l, w) =>
      w.iterator.zipWithIndex.map { case (v, b) => (l, b, v / 1000L) }
    }.toDF("lang", "bucket", "w_e3")
  }
}
