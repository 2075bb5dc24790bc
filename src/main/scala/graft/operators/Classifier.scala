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
    feats.unpersist(blocking = false)
    wE6
  }
}
