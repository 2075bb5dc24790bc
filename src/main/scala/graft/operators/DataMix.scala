package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data-mixture construction: per-stratum (source/domain/language)
  * downsampling with exact, reproducible membership — how a training corpus is
  * re-weighted ("2 parts web, 1 part code, 0.1 part forums") without a random
  * number generator in sight.
  *
  * Membership is decided by a Knuth multiplicative hash of the row id — pure
  * 64-bit integer arithmetic (id·2654435761 mod 2³²), so the SAME rows are chosen
  * under any partitioning, any engine, any run. Sampling is a narrow filter: no
  * shuffle, fully pushdown-friendly, and the fraction is exact-in-expectation
  * with per-id determinism (re-runs and incremental loads agree on every row). */
object DataMix {

  /** Uniform [0, 1) hash of an integer id: (id * 2654435761) mod 2^32 / 2^32.
    * Knuth's multiplicative constant; exact integer ops only. */
  def hash01(id: Column): Column =
    pmod(id * lit(2654435761L), lit(4294967296L)).cast("double") / 4294967296.0

  /** Keep each row iff hash01(id) < fraction(stratum). Strata absent from
    * `fractions` use `defaultFraction`. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hash01(col(idCol)) < frac)
  }

  /** Mixture report: per stratum, total rows vs deterministically sampled rows —
    * the audit artifact that accompanies any mixture definition. */
  def mixtureReport(df: DataFrame, idCol: String, strataCol: String,
                    fractions: Map[String, Double],
                    defaultFraction: Double = 1.0): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_total"),
        count(when(hash01(col(idCol)) < frac, 1)).as("n_sampled"))
  }
}
