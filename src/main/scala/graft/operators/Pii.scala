package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection / redaction for training-data pipelines (the
  * Dolma/CCNet-style scrub pass every pretraining corpus goes through
  * before release): regex detectors for emails, phone numbers, IPv4
  * addresses and SSN-shaped ids, with a chained-replace redactor.
  *
  * Pure codegen'd Column composition (`rlike` / `regexp_replace`, no
  * UDFs), so the scrub is a map-only stage: no shuffle, linear in corpus
  * bytes, and exactly expressible in the DuckDB oracle (patterns are
  * shared verbatim — both engines speak the common regex subset used
  * here: character classes, bounded repetition, no backrefs or
  * lookaround, which RE2 lacks).
  *
  * Redaction applies patterns in [[patterns]] order on both engines, so
  * overlapping matches resolve identically.
  */
object Pii {

  /** (name, regex, replacement) — regex kept to the Java/RE2 common
    * subset. Order matters and is part of the contract: email before ip
    * (a dotted-digit domain must redact as email, not ip), id before
    * phone (disjoint shapes today, but the order pins behavior). */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("id", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<ID>"),
    ("phone", "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ip", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"))

  /** per-type boolean detectors, one rlike each */
  def flags(text: Column): Seq[(String, Column)] =
    patterns.map { case (n, p, _) => n -> text.rlike(p) }

  /** scrubbed text: every match of every pattern replaced by its
    * sentinel, in declaration order */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, p, r)) => regexp_replace(c, p, r) }

  /** Luhn-validated payment-card redaction (the checksum pass a regex
    * cannot express — any 16-digit id would false-positive; see
    * [[graft.functions.TextKernels.redactCards]]). Separate from
    * [[redact]] because DuckDB cannot replay the checksum: the regex
    * patterns stay oracle-checkable, this stays spec-gated. */
  def redactCards(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.RedactCards(
        org.apache.spark.sql.graft.Bridge.expression(text)))

  /** number of redactions performed = sentinel occurrences in the
    * scrubbed text (sentinels cannot occur pre-scrub: '<'/'>' are not in
    * any pattern's alphabet) */
  def redactionCount(redacted: Column): Column =
    patterns.map { case (_, _, r) =>
      ((length(redacted) - length(replace(redacted, lit(r), lit("")))) /
        r.length).cast("int")
    }.reduce(_ + _)

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    * et al. 2007 — the release-gate check for quasi-identifier
    * combinations): one row per equivalence class over `quasiCols`
    * with its size and the count of distinct `sensitiveCol` values;
    * a class re-identifies (k-violation) when fewer than k rows share
    * the quasi tuple, and leaks (l-violation) when the class carries
    * fewer than l distinct sensitive values. ONE hash aggregate over
    * the quasi tuple — map-side combined, output bounded by the class
    * count, never a self-join. */
  def kAnonymity(df: org.apache.spark.sql.DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int = 5, l: Int = 2): org.apache.spark.sql.DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, "k and l must be positive")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_violation", col("class_size") < k)
      .withColumn("l_violation", col("n_sensitive") < l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the release-gate ladder after [[kAnonymity]]'s k and l:
    * a class can be k-large and l-diverse yet still leak when its
    * sensitive-value DISTRIBUTION skews far from the table's. Distance
    * is the ordered-domain EMD of the paper's numeric formulation:
    * Σ|cumP − cumQ| / (m−1) over the m ordered distinct sensitive
    * values, where P is the class distribution and Q the global one.
    *
    * `sensitiveCol` should be bounded-cardinality (bucket a continuous
    * attribute first — deciles make m=10); the class × domain frame is
    * then classes·m rows. Data-sized work is ONE (quasi, sensitive)
    * hash aggregate; the domain and global distribution broadcast, the
    * cum windows run per class over m rows. Zero-observed values are
    * cross-filled — dropping them would understate the distance
    * exactly where the leak is worst. FULL oracle.
    *
    * Returns one row per class: quasi cols + `(class_size, emd,
    * t_violation)`, emd 6dp. */
  def tCloseness(df: org.apache.spark.sql.DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, t: Double): org.apache.spark.sql.DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    import org.apache.spark.sql.expressions.Window
    val qc = quasiCols.map(col)
    val obs = df.groupBy(qc :+ col(sensitiveCol).as("__s"): _*)
      .agg(count(lit(1)).as("__o"))
    val domain = obs.groupBy(col("__s")).agg(sum(col("__o")).as("__nq"))
    val global = domain.crossJoin(broadcast(
      domain.agg(sum(col("__nq")).cast("double").as("__n"),
        count(lit(1)).as("__m"))))
    val classes = obs.groupBy(qc: _*).agg(sum(col("__o")).as("class_size"))
    val wCum = Window.partitionBy(qc: _*).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    classes.crossJoin(broadcast(global))
      .join(obs, quasiCols :+ "__s", "left")
      .withColumn("__cp", sum(coalesce(col("__o"), lit(0L)).cast("double") /
        col("class_size")).over(wCum))
      .withColumn("__cq", sum(col("__nq").cast("double") / col("__n")).over(wCum))
      .groupBy(qc :+ col("class_size"): _*)
      .agg(round(sum(abs(col("__cp") - col("__cq"))) /
        greatest(max(col("__m")) - lit(1.0), lit(1.0)), 6).as("emd"))
      .withColumn("t_violation", col("emd") > t)
  }

  /** Laplace-noised count release in the shape of the DP counting
    * mechanism (Dwork et al. 2006): per-key counts plus Laplace(Δf/ε)
    * noise, Δf = 1. The noise is a PRF of `(key, seed)` — md5 →
    * inverse-CDF — so the release is reproducible across engines given
    * the seed, which is why a data card can re-verify its published
    * aggregates. PRIVACY CAVEAT: the guarantee is only as good as the
    * seed's secrecy. With a secret seed the noise is unpredictable to
    * an observer (computational-DP posture); with a PUBLISHED seed
    * anyone can recompute the noise from the key and subtract it, so
    * the release is reproducible pseudo-noise and NOT a differential-
    * privacy guarantee. There is deliberately no default seed — the
    * caller must decide (and protect) it. One hash aggregate; the
    * noise is a map-side expression on the (bounded) key frame.
    * Returns `(key, n, n_dp)`. */
  def dpNoisedCounts(df: org.apache.spark.sql.DataFrame, keyCol: String,
      epsilon: Double, seed: Long): org.apache.spark.sql.DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val b = 1.0 / epsilon
    // hash-uniform in [0,1): first 8 md5 hex chars / 2^32
    val u = (conv(substring(md5(concat(col(keyCol), lit("|" + seed))), 1, 8),
      16, 10).cast("double") / 4294967296.0) - 0.5
    val noise = -lit(b) * signum(u) *
      log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(u)))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_dp", round(col("n") + noise, 4))
  }

  /** Entropy ℓ-diversity audit (Machanavajjhala et al. 2007 §3) — the
    * rung between [[kAnonymity]]'s DISTINCT-count ℓ and
    * [[tCloseness]]'s distributional distance: a class with ℓ distinct
    * sensitive values still leaks when one value owns ~all its rows;
    * entropy ℓ-diversity demands H(class) ≥ ln(ℓ), i.e. effective
    * ℓ = e^H ≥ ℓ (e^H = the "number of equally-likely values the class
    * behaves like").
    *
    * ONE (quasi, sensitive) hash aggregate is the data-sized stage; the
    * class re-agg folds Σ o·ln o algebraically (the [[Profiling
    * .keyProfile]] entropy shape — never a second pass). FULL oracle.
    * Returns per class: quasi cols + (class_size, entropy,
    * effective_l, l_violation), 6dp. */
  def entropyLDiversity(df: org.apache.spark.sql.DataFrame,
      quasiCols: Seq[String], sensitiveCol: String,
      l: Double): org.apache.spark.sql.DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(l >= 1, "l must be >= 1")
    val qc = quasiCols.map(col)
    val obs = df.groupBy(qc :+
        coalesce(col(sensitiveCol).cast("string"), lit("\u0000null")).as("__s"): _*)
      .agg(count(lit(1)).as("__o"))
    val h = log(col("class_size").cast("double")) -
      col("__nlogn") / col("class_size")
    obs.groupBy(qc: _*)
      .agg(sum(col("__o")).as("class_size"),
        sum(col("__o").cast("double") * log(col("__o").cast("double")))
          .as("__nlogn"))
      .select(qc :+ col("class_size") :+
        round(h, 6).as("entropy") :+
        round(exp(h), 6).as("effective_l") :+
        (exp(h) < l).as("l_violation"): _*)
  }
}
