package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Information-theoretic corpus audits: mutual information between
  * categorical columns (the feature-selection / redundancy check a
  * curation pipeline runs before training a filter model) and the
  * Zipf slope of the token-frequency distribution (the classic
  * "does this corpus look like natural language" fingerprint —
  * heavily synthetic or boilerplate corpora deviate from slope ≈ -1).
  *
  * Scale shape: one hash aggregate over the category pair (or token)
  * does ALL the data-sized work; every subsequent join/aggregate runs
  * on the category-cardinality frame (|X|·|Y| rows, or the bounded
  * top-K vocabulary), broadcast where joined.
  */
object InfoTheory {

  /** Mutual information I(X;Y) in bits between two categorical
    * columns, plus the marginal entropies and H(Y|X) — one row:
    * `(mi_bits, h_x, h_y, h_y_given_x)`. NULL categories participate
    * as their own class (coalesced to a sentinel) so the decomposition
    * H(Y|X) = H(X,Y) - H(X) holds exactly over all rows. */
  def categoricalMi(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df
      .select(coalesce(col(xCol).cast("string"), lit("\u0000null")).as("x"),
        coalesce(col(yCol).cast("string"), lit("\u0000null")).as("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).cast("double").as("nxy"))
    // everything below runs on |X|·|Y| rows
    val total = joint.agg(sum(col("nxy")).as("n"))
    val mx = joint.groupBy(col("x")).agg(sum(col("nxy")).as("nx"))
    val my = joint.groupBy(col("y")).agg(sum(col("nxy")).as("ny"))
    val mi = joint
      .join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(total))
      .agg(
        sum(col("nxy") / col("n") *
          log2(col("nxy") * col("n") / (col("nx") * col("ny")))).as("mi"),
        (-sum(col("nxy") / col("n") * log2(col("nxy") / col("n")))).as("hxy"))
    val hx = mx.crossJoin(broadcast(total))
      .agg((-sum(col("nx") / col("n") * log2(col("nx") / col("n")))).as("hx"))
    val hy = my.crossJoin(broadcast(total))
      .agg((-sum(col("ny") / col("n") * log2(col("ny") / col("n")))).as("hy"))
    mi.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(
        round(col("mi"), 6).as("mi_bits"),
        round(col("hx"), 6).as("h_x"),
        round(col("hy"), 6).as("h_y"),
        round(col("hxy") - col("hx"), 6).as("h_y_given_x"))
  }

  /** Zipf-law fit over the top-`topK` whitespace tokens: OLS slope and
    * R² of log10(frequency) against log10(rank). One row:
    * `(n_tokens, slope, r2)`. The token aggregate is the only
    * data-sized stage; the rank window runs on the bounded top-K frame
    * ([[BoundedWindow]]-enforced ≤ topK rows). */
  def zipfSlope(df: DataFrame, textCol: String, topK: Int = 1000): DataFrame = {
    val top = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(topK)
    val ranked = BoundedWindow.rank(top, "rank", topK, zeroBased = false,
      col("n").desc, col("token"))
    ranked
      .select(log10(col("rank").cast("double")).as("lr"),
        log10(col("n").cast("double")).as("lf"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(expr("regr_slope(lf, lr)"), 6).as("slope"),
        round(expr("regr_r2(lf, lr)"), 6).as("r2"))
  }

  /** Gini coefficient of the token-frequency distribution per group —
    * the Lorenz-curve concentration audit ("what fraction of the corpus
    * is its handful of most common words"): 0 = every type equally
    * frequent, →1 = mass concentrated in a few types. Complements
    * [[zipfSlope]] (which fits the SHAPE; Gini measures the
    * INEQUALITY) for corpus-mix fingerprinting.
    *
    * Uses the exact rank form on counts sorted ascending (rank i,
    * count c_i): G = 2·Σ i·c_i / (n·Σc) − (n+1)/n. Ranks within tied
    * counts are interchangeable (Σ i·c_i invariant on tie blocks), so
    * the statistic is deterministic under any tiebreak — FULL oracle.
    *
    * Scale shape: ONE (group, token) hash aggregate does all the
    * data-sized work; the rank window runs per group on the
    * vocabulary-sized count frame. */
  def tokenGini(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col(groupCol).as("grp"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("grp")).orderBy(col("c"), col("token"))
    counts
      .withColumn("i", row_number().over(w))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        sum(col("i") * col("c")).as("ic"))
      .select(col("grp"), col("n_types"), col("n_tokens"),
        round(lit(2.0) * col("ic") / (col("n_types") * col("n_tokens")) -
          (col("n_types") + lit(1.0)) / col("n_types"), 6).as("gini"))
  }

  /** Distinctive terms per source via weighted log-odds with an
    * informative Dirichlet prior (Monroe, Colaresi & Quinn 2008 —
    * "Fightin' Words"; the corpus-comparison statistic that fixes both
    * tf-idf's rare-word bias and plain log-odds' variance blowup):
    * for word w in source i vs the REST of the corpus j,
    *   δ_w = ln((y_iw+a_w)/(n_i+a0−y_iw−a_w)) − ln((y_jw+a_w)/(n_j+a0−y_jw−a_w)),
    *   z_w = δ_w / sqrt(1/(y_iw+a_w) + 1/(y_jw+a_w)),
    * with the prior a_w = a0·y_w/n proportional to corpus frequency.
    * Returns the top-`k` z terms per source (z desc, term tiebreak).
    *
    * Scale shape: one (source, term) hash aggregate is the only
    * data-sized stage; term totals derive from it (vocab-sized re-agg),
    * source totals + the grand total broadcast; the per-source top-k
    * ranks on the vocab-sized z frame. Only terms PRESENT in the
    * source are scored (absent terms have negative δ and can never
    * reach a positive top-k). */
  def logOddsTerms(docs: DataFrame, srcCol: String, textCol: String,
      k: Int, alpha0: Double = 1000.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = docs
      .select(col(srcCol).as("src"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("src"), col("term"))
      .agg(count(lit(1)).cast("double").as("yi"))
    val termTot = st.groupBy(col("term")).agg(sum(col("yi")).as("yw"))
    val srcTot = st.groupBy(col("src")).agg(sum(col("yi")).as("ni"))
    val grand = termTot.agg(sum(col("yw")).as("n_all"))
    val aw = lit(alpha0) * col("yw") / col("n_all")
    val yj = col("yw") - col("yi")
    val nj = col("n_all") - col("ni")
    val delta =
      log((col("yi") + aw) / (col("ni") + alpha0 - col("yi") - aw)) -
      log((yj + aw) / (nj + alpha0 - yj - aw))
    val z = delta / sqrt(lit(1.0) / (col("yi") + aw) + lit(1.0) / (yj + aw))
    val scored = st
      .join(termTot, "term")
      .join(broadcast(srcTot), "src")
      .crossJoin(broadcast(grand))
      .select(col("src"), col("term"), round(z, 6).as("z"))
    val w = Window.partitionBy(col("src")).orderBy(col("z").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("rank"), col("term"), col("z"))
  }

  /** Word burstiness (Church & Gale 1995): the Fano factor (variance /
    * mean of per-doc counts over the docs CONTAINING the word) — the
    * corpus-linguistics audit that separates topical content words
    * (bursty: absent mostly, heavy where present) from function words
    * (Poisson-ish: everywhere at steady rate). Complements the Zipf
    * slope (frequency SHAPE) and [[tokenGini]] (frequency INEQUALITY)
    * with the document-dispersion axis; a synthetic corpus whose
    * "content" words aren't bursty fails this fingerprint.
    *
    * Scale shape: ONE (doc, token) hash agg is the data-sized stage;
    * per-token moments re-agg from it (vocab-sized). Restricted to
    * tokens in ≥ `minDf` docs so the sample variance is meaningful.
    * Returns (token, df, n_total, mean_tf, fano) — FULL oracle. */
  def burstiness(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int = 50): DataFrame = {
    val dt = docs
      .select(col(idCol).as("d"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("d"), col("token"))
      .agg(count(lit(1)).cast("double").as("c"))
    dt.groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        sum(col("c")).cast("long").as("n_total"),
        avg(col("c")).as("__mean"),
        var_samp(col("c")).as("__var"))
      .filter(col("df") >= minDf)
      .select(col("token"), col("df"), col("n_total"),
        round(col("__mean"), 6).as("mean_tf"),
        round(col("__var") / col("__mean"), 6).as("fano"))
  }

  /** DoReMi-flavored domain reweighting (Xie et al. 2023's recipe,
    * with the repo's add-0.5 bigram LM standing in for the trained
    * proxy/reference pair): per domain, the EXCESS bits-per-bigram of
    * the corpus-generalist LM over the domain-specialist LM — how much
    * a one-size-fits-all model underserves the domain — exponentiated
    * through a `tau`-tempered softmax and blended with uniform by
    * `epsilon` (DoReMi's smoothing): w_d = (1−ε)·softmax(excess/τ)_d
    * + ε/K. Domains whose text a generalist models WORSE relative to
    * their own structure get upweighted.
    *
    * Scale shape: the two LM replays share ONE (domain, bigram)
    * exploded pass — global counts are a re-agg of per-domain counts,
    * never a second corpus scan; scoring joins on bigram/unigram keys
    * (data-sized hash joins), and everything after the per-domain avg
    * runs on the K-row domain frame. FULL oracle. */
  def doremiWeights(docs: DataFrame, srcCol: String, textCol: String,
      tau: Double = 0.5, epsilon: Double = 0.1): DataFrame = {
    require(tau > 0, "tau must be positive")
    require(epsilon >= 0 && epsilon <= 1, "epsilon must be in [0,1]")
    val w = TextAnalysis.tokens(col(textCol))
    // bigram explode + five count joins are FLOP-bound over a narrow
    // scan — spread it (core.Par; was 51 single-task stages at bench
    // scale)
    val bg = graft.core.Par.spread(docs)
      .select(col(srcCol).as("src"), w.as("__w"))
      .select(col("src"), posexplode(col("__w")).as(Seq("i", "w1")),
        size(col("__w")).as("__n"), col("__w"))
      .filter(col("i") < col("__n") - 1)
      .select(col("src"), col("w1"),
        concat(col("w1"), lit(" "), element_at(col("__w"), col("i") + 2)).as("bgs"))
    // per-domain counts; global = re-agg (one corpus pass total)
    val uniD = bg.groupBy(col("src"), col("w1")).agg(count(lit(1)).as("ud"))
    val bcD = bg.groupBy(col("src"), col("bgs")).agg(count(lit(1)).as("bd"))
    val vD = uniD.groupBy(col("src")).agg(count(lit(1)).as("nvd"))
    val uniG = uniD.groupBy(col("w1")).agg(sum(col("ud")).as("ug"))
    val bcG = bcD.groupBy(col("bgs")).agg(sum(col("bd")).as("bg"))
    val vG = uniG.agg(count(lit(1)).as("nvg"))
    val scored = bg
      .join(bcD, Seq("src", "bgs")).join(uniD, Seq("src", "w1"))
      .join(bcG, "bgs").join(uniG, "w1")
      .crossJoin(broadcast(vG)).join(broadcast(vD), "src")
      .select(col("src"),
        (-log2((col("bg") + 0.5) / (col("ug") + lit(0.5) * col("nvg")))).as("bits_g"),
        (-log2((col("bd") + 0.5) / (col("ud") + lit(0.5) * col("nvd")))).as("bits_d"))
    val perDomain = scored.groupBy(col("src"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(col("bits_g")).as("__bg"), avg(col("bits_d")).as("__bd"))
      .withColumn("excess_bits", col("__bg") - col("__bd"))
    val k = perDomain.agg(count(lit(1)).as("__k"),
      sum(exp(col("excess_bits") / tau)).as("__z"))
    perDomain.crossJoin(broadcast(k))
      .select(col("src"), col("n_bigrams"),
        round(col("__bg"), 6).as("generalist_bits"),
        round(col("__bd"), 6).as("specialist_bits"),
        round(col("excess_bits"), 6).as("excess_bits"),
        round(lit(1.0 - epsilon) * exp(col("excess_bits") / tau) / col("__z") +
          lit(epsilon) / col("__k"), 6).as("weight"))
  }

  /** Per-source token-distribution divergence vs the whole corpus:
    * Jensen-Shannon divergence (nats, bounded [0, ln 2]) between each
    * source's unigram distribution p and the corpus-wide distribution q
    * (which INCLUDES the source — the "how unlike the mixture is this
    * ingredient" curation audit; an outlier source is boilerplate, spam,
    * or a different register worth inspecting before mixing).
    *
    * Scale shape: ONE (source, term) hash aggregate does all the
    * data-sized work; the corpus term table derives from it (vocab-sized
    * re-agg), per-source totals broadcast. Terms the source does NOT
    * contain are never materialized: their total JS contribution is
    * 0.5·ln2·(1 − Σ_present q), folded in algebraically — no
    * source × vocabulary cross join exists. */
  def sourceDivergence(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    val st = docs
      .select(col(srcCol).as("src"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("src"), col("term"))
      .agg(count(lit(1)).cast("double").as("c"))
    val corpus = st.groupBy(col("term")).agg(sum(col("c")).as("ct"))
    val srcTot = st.groupBy(col("src")).agg(sum(col("c")).as("n_src"))
    val total = corpus.agg(sum(col("ct")).as("n_all"))
    val p = col("c") / col("n_src")
    val q = col("ct") / col("n_all")
    val m = (p + q) / 2.0
    st.join(corpus, "term")
      .join(broadcast(srcTot), "src")
      .crossJoin(broadcast(total))
      .groupBy(col("src"))
      .agg(
        sum(p / 2.0 * log(p / m) + q / 2.0 * log(q / m)).as("js_present"),
        sum(q).as("q_present"),
        count(lit(1)).cast("long").as("n_terms"),
        first(col("n_src")).cast("long").as("n_tokens"))
      .select(col("src"),
        round(col("js_present") + (lit(1.0) - col("q_present")) * math.log(2.0) / 2.0,
          6).as("js"),
        col("n_terms"), col("n_tokens"))
  }
}
