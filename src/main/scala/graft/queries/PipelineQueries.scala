package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.operators.{TextAnalysis => TA}

/** Round-11 corpus-pipeline additions: map-side quality signals
  * (code-point entropy, blocklist ratios), sentence-level boilerplate
  * statistics, CCNet-style perplexity bucketing, and length-bucketed
  * batch planning. Every query here carries a FULL DuckDB oracle —
  * the Spark side is plain Column composition (plus one codegen'd
  * native kernel for entropy), so the semantics replay 1:1 in SQL.
  */
object PipelineQueries extends QueryModule {

  /** corpus-real blocklist (the synthetic fixture's vocabulary is the
    * 31 DB words, so the "unwanted" terms must come from it) */
  private val blocklist = Seq("slow", "dup", "big")

  def qs: Seq[(String, Q)] = Seq(

    // ---- code-point Shannon entropy (Dolma/Gopher-style gibberish
    // signal): near-0 for repeated filler, ~log2(alphabet) for random
    // junk. One codegen'd O(n) kernel per row — a pure map over the
    // 100 TB scan, no shuffle. Oracle replays the distribution with
    // string_split(text,'') (DuckDB's unit is the code point — a
    // combining mark splits SEPARATELY from its base, matching the
    // kernel's codePointAt walk). The fixture corpus is ASCII, so a
    // planted row (doc_id −1, UNIONed identically on both sides) pins
    // the unit of counting: e + U+0301 (combining acute) twice and a
    // non-BMP emoji — 6 code points, 4 grapheme clusters. A grapheme-
    // or UTF-16-unit engine would hash-mismatch on this row.
    "q_text_entropy" -> Q(
      (s, dir) => {
        val planted = s.range(1).select(lit(-1L).as("doc_id"),
          // e+U+0301 (combining acute), x, U+1F600 (non-BMP), e+U+0301 —
        // escapes, so no editor/NFC pass can recompose the sequence
        lit("e\u0301x\uD83D\uDE00e\u0301").as("text"))
        table(s, dir, "documents")
          .filter(col("doc_id") < 200)
          .select(col("doc_id").cast("long").as("doc_id"), col("text"))
          .unionByName(planted)
          .select(col("doc_id"),
            length(col("text")).cast("long").as("n_cp"),
            round(gf.char_entropy(col("text")), 6).as("entropy"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH src AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id < 200
             |  UNION ALL
             |  SELECT -1, 'e' || chr(769) || 'x' || chr(128512) || 'e' || chr(769)),
             |c AS (SELECT doc_id, unnest(string_split(text,'')) AS ch FROM src),
             |f AS (SELECT doc_id, ch, count(*)::DOUBLE AS n FROM c GROUP BY 1, 2),
             |tot AS (SELECT doc_id, sum(n) AS t FROM f GROUP BY 1)
             |SELECT doc_id, CAST(t AS BIGINT) AS n_cp,
             |  round(sum(-(n/t) * log2(n/t)), 6) AS entropy
             |FROM f JOIN tot USING (doc_id)
             |GROUP BY doc_id, t ORDER BY doc_id""".stripMargin.replace('\n', ' ')),
      doc = "code-point Shannon entropy per doc — codegen kernel, map-side"),

    // ---- blocklist ratio filter (C4's wordlist stage; RefinedWeb/
    // FineWeb run it ahead of model scoring): the list rides in the
    // plan as an array literal, the count is a codegen'd higher-order
    // filter — map-side, shuffle-free.
    "q_text_blocklist" -> Q(
      (s, dir) => TA.blocklistScore(table(s, dir, "documents"),
          "doc_id", "text", blocklist, threshold = 0.1)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents)
              |SELECT doc_id, len(w) AS n_tokens,
              |  len(list_filter(w, x -> x IN (${blocklist.map(b => s"'$b'").mkString(",")}))) AS n_blocked,
              |  round(len(list_filter(w, x -> x IN (${blocklist.map(b => s"'$b'").mkString(",")})))
              |    * 1.0 / greatest(len(w), 1), 6) AS blocked_frac,
              |  round(len(list_filter(w, x -> x IN (${blocklist.map(b => s"'$b'").mkString(",")})))
              |    * 1.0 / greatest(len(w), 1), 6) >= 0.1 AS flagged
              |FROM t ORDER BY doc_id""".stripMargin.replace('\n', ' ')),
      doc = "blocklisted-token ratio + flag per doc — array-literal filter, map-side"),

    // ---- winnowing fingerprints (Schleimer et al. 2003 / MOSS): from
    // each sliding window of 4 gram hashes keep the minimum (rightmost
    // tie) — a sparse position-robust signature with the guarantee that
    // any shared run of >= window+k−1 tokens shares a fingerprint. The
    // md5-60bit fold replays in SQL, so selection is fully
    // oracle-checked (min/max fingerprint pin the actual hash values).
    "q_text_winnow" -> Q(
      (s, dir) => TA.winnowFingerprints(table(s, dir, "documents"),
          "doc_id", "text", k = 3, window = 4)
        .select(col("id").as("doc_id"), col("n_grams"),
          size(col("fingerprints")).cast("long").as("n_fp"),
          when(size(col("fingerprints")) > 0,
            element_at(col("fingerprints"), 1)).as("min_fp"),
          when(size(col("fingerprints")) > 0,
            element_at(col("fingerprints"), -1)).as("max_fp"))
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
              |g AS (SELECT doc_id, greatest(len(w) - 2, 0) AS m,
              |  CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1),
              |    gi -> ${hex60Sql("md5(array_to_string(w[gi:gi+2], ' '))")})
              |  ELSE [] END AS gs FROM t),
              |sel AS (SELECT doc_id, m, CASE WHEN m >= 1 THEN
              |  list_sort(list_distinct(list_transform(range(1, greatest(m - 3, 1) + 1),
              |    j -> list_reduce(list_prepend([9223372036854775807, CAST(0 AS BIGINT)],
              |      list_transform(range(j, least(j + 3, m) + 1), p -> [gs[p], p])),
              |      (a, b) -> CASE WHEN b[1] <= a[1] THEN b ELSE a END)[1])))
              |  ELSE [] END AS fps FROM g)
              |SELECT doc_id, CAST(m AS BIGINT) AS n_grams, len(fps)::BIGINT AS n_fp,
              |  CASE WHEN len(fps) > 0 THEN fps[1] END AS min_fp,
              |  CASE WHEN len(fps) > 0 THEN fps[-1] END AS max_fp
              |FROM sel ORDER BY doc_id""".stripMargin.replace('\n', ' ')),
      doc = "winnowing (MOSS) fingerprint selection — sparse copy-detection signatures"),

    // ---- phrase-dictionary tagging (the multi-word blocklist stage):
    // nested ("scan slow" ⊃ "slow") and single-word phrases matched in
    // ONE Aho-Corasick pass per doc, word-boundary aware. The oracle
    // replays every occurrence with an exact substr position scan (all
    // occurrences, same [0-9A-Za-z_] boundary class), so the automaton
    // is hash-checked against first principles, not another automaton.
    "q_text_keywords" -> Q(
      (s, dir) => TA.keywordTag(table(s, dir, "documents"),
          "doc_id", "text",
          Seq("scan slow", "slow", "table hash", "big order", "dup"))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id")),
      Some("""WITH p AS (SELECT * FROM (VALUES ('scan slow'), ('slow'),
             |  ('table hash'), ('big order'), ('dup')) AS t(ph)),
             |occ AS (SELECT d.doc_id, p.ph
             |  FROM documents d, p,
             |    unnest(range(1, len(d.text) - len(p.ph) + 2)) AS r(i)
             |  WHERE substr(d.text, CAST(i AS INT), len(p.ph)) = p.ph
             |  AND (i = 1 OR NOT regexp_matches(
             |    substr(d.text, CAST(i - 1 AS INT), 1), '[0-9A-Za-z_]'))
             |  AND (i + len(p.ph) > len(d.text) OR NOT regexp_matches(
             |    substr(d.text, CAST(i + len(p.ph) AS INT), 1), '[0-9A-Za-z_]'))),
             |agg AS (SELECT doc_id, count(*) AS n_hits,
             |  count(DISTINCT ph) AS n_phrases FROM occ GROUP BY doc_id)
             |SELECT d.doc_id, coalesce(a.n_hits, 0)::BIGINT AS n_hits,
             |  coalesce(a.n_phrases, 0)::BIGINT AS n_phrases,
             |  coalesce(a.n_hits, 0) >= 1 AS flagged
             |FROM documents d LEFT JOIN agg a USING (doc_id)
             |ORDER BY doc_id""".stripMargin.replace('\n', ' ')),
      doc = "Aho-Corasick phrase-dictionary tagging — one automaton pass per doc"),

    // ---- sentence-level statistics (the sentence-granularity cousin
    // of RefinedWeb line dedup): the fixture corpus has no punctuation,
    // so the query first sentence-ifies deterministically (every ' the '
    // becomes a boundary — same regexp_replace in both engines), then
    // reports per-doc sentence count, mean words/sentence, and the
    // fraction of sentences shared with ≥2 docs (boilerplate signal).
    "q_text_sentences" -> Q(
      (s, dir) => {
        val d = table(s, dir, "documents")
          .withColumn("sent_text",
            regexp_replace(col("text"), " the ", ". "))
        TA.sentenceStats(d, "doc_id", "sent_text")
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, regexp_replace(text, ' the ', '. ', 'g') AS st FROM documents),
             |sp AS (SELECT doc_id, list_filter(list_transform(
             |  string_split_regex(st, '[.!?]+'), x -> trim(x)), x -> x <> '') AS ss FROM d),
             |ex AS (SELECT doc_id, len(ss) AS n_sent, unnest(ss) AS sent
             |       FROM sp WHERE len(ss) > 0),
             |fr AS (SELECT sent, count(DISTINCT doc_id) AS n_docs FROM ex GROUP BY 1)
             |SELECT doc_id, n_sent,
             |  round(avg(len(string_split(sent,' '))), 6) AS avg_sent_words,
             |  round(avg(CASE WHEN n_docs >= 2 THEN 1.0 ELSE 0.0 END), 6) AS dup_sent_frac
             |FROM ex JOIN fr USING (sent)
             |GROUP BY doc_id, n_sent ORDER BY doc_id""".stripMargin.replace('\n', ' ')),
      doc = "sentence count / mean length / cross-doc dup fraction per doc"),

    // ---- CCNet perplexity buckets (Wenzek et al. 2020): score every
    // doc with the corpus bigram LM, then split each language into
    // head/middle/tail perplexity terciles — the classic quality
    // stratification before sampling. ntile runs on the 6dp-rounded
    // score (float summation order differs across engines) with doc_id
    // as the tiebreaker, so bucket assignment is engine-exact.
    // Scores come from the MAINTAINED count artifact (IndexStore
    // lm_counts — r11 flagged the inline retrain: two corpus explodes
    // per run for state that already persists); the arithmetic is
    // identical by construction, so the inline-replay oracle holds.
    "q_ccnet_buckets" -> Q(
      (s, dir) => {
        val d = table(s, dir, "documents")
        val IS = graft.operators.IndexStore
        val scored = TA.bigramLmFromCounts(
          IS.lmBigrams(s, dir), IS.lmUnigrams(s, dir), d, "doc_id", "text")
        val j = scored.join(
          d.select(col("doc_id").as("id"), col("lang")), "id")
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("bits_per_bigram"), col("id"))
        j.withColumn("b", ntile(3).over(w))
          .withColumn("bucket", element_at(
            array(lit("head"), lit("middle"), lit("tail")), col("b")))
          .groupBy(col("lang"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            round(avg(col("bits_per_bigram")), 6).as("avg_bits"))
          .orderBy(col("lang"), col("bucket"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
             |uni AS (SELECT w1, count(*) AS u FROM (SELECT unnest(w) AS w1 FROM t) GROUP BY w1),
             |v AS (SELECT count(*) AS nv FROM uni),
             |bg AS (SELECT doc_id, w[i]||' '||w[i+1] AS bgs, w[i] AS w1
             |       FROM t, unnest(range(1, len(w))) AS r(i)),
             |bc AS (SELECT bgs, count(*) AS b FROM bg GROUP BY bgs),
             |sc AS (SELECT doc_id, -log2((b + 0.5) / (u + 0.5 * nv)) AS bits
             |       FROM bg JOIN bc USING (bgs) JOIN uni USING (w1) CROSS JOIN v),
             |ds AS (SELECT doc_id, round(avg(bits), 6) AS bpb FROM sc GROUP BY doc_id),
             |l AS (SELECT ds.doc_id, d.lang, ds.bpb, ntile(3) OVER (
             |  PARTITION BY d.lang ORDER BY ds.bpb, ds.doc_id) AS b
             |  FROM ds JOIN documents d USING (doc_id))
             |SELECT lang, CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
             |  ELSE 'tail' END AS bucket,
             |  count(*) AS n_docs, round(avg(bpb), 6) AS avg_bits
             |FROM l GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin.replace('\n', ' ')),
      doc = "CCNet head/middle/tail perplexity terciles per language"),

    // ---- length-bucketed batch planning: group docs into 128-token
    // buckets and account the padding waste of batching each bucket to
    // its ceiling — the standard dataloader prep that motivates
    // sequence packing (q_pack_concat). One map + one bounded-key agg.
    "q_length_buckets" -> Q(
      (s, dir) => {
        val d = table(s, dir, "documents")
          .select(col("doc_id"), TA.estTokenCount(col("text")).as("nt"))
        d.withColumn("bucket_lo", (floor(col("nt") / lit(128)) * 128).cast("long"))
          .groupBy(col("bucket_lo"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nt")).cast("long").as("sum_tokens"),
            sum(col("bucket_lo") + lit(128L) - col("nt")).cast("long")
              .as("padding_waste"))
          .orderBy(col("bucket_lo"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |  len(string_split(text,' ')) + CAST(ceil(length(text)/16.0) AS INT) AS nt
             |  FROM documents),
             |b AS (SELECT doc_id, nt, CAST(floor(nt/128.0)*128 AS BIGINT) AS bucket_lo FROM d)
             |SELECT bucket_lo, count(*) AS n_docs,
             |  sum(nt)::BIGINT AS sum_tokens,
             |  sum(bucket_lo + 128 - nt)::BIGINT AS padding_waste
             |FROM b GROUP BY bucket_lo ORDER BY bucket_lo""".stripMargin.replace('\n', ' ')),
      doc = "128-token length buckets with padding-waste accounting"),

    // ---- skip-gram (center, context) pairs (Mikolov 2013): the
    // word2vec training input table — map-side offset gather over the
    // materialized token array, one explode, never a positions self-join
    "q_skipgram_pairs" -> Q(
      (s, dir) => TA.skipGramPairs(
          table(s, dir, "documents").filter(col("doc_id") < 30),
          "doc_id", "text", window = 2)
        .orderBy(col("doc_id"), col("pos"), col("context")),
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents WHERE doc_id < 30),
             |p AS (SELECT doc_id, i AS pos, w[i] AS center, len(w) AS n, w FROM t, unnest(range(1, len(w)+1)) AS r(i)),
             |c AS (SELECT doc_id, pos, center, w[CAST(pos + o AS INT)] AS context
             |  FROM p, unnest([-2, -1, 1, 2]) AS u(o)
             |  WHERE pos + o >= 1 AND pos + o <= n)
             |SELECT doc_id, pos, center, context FROM c
             |ORDER BY doc_id, pos, context""".stripMargin.replace('\n', ' ')),
      doc = "skip-gram (center, context) pairs at window 2 (word2vec input table)"),

    // ---- negative sampling (Mikolov 2013 unigram^0.75): k hash-PRF
    // draws per pair invert the broadcast noise CDF — reproducible
    // across engines/partitions/epochs, SQL-replayable
    "q_negative_samples" -> Q(
      (s, dir) => {
        val d = table(s, dir, "documents")
        val pairs = TA.skipGramPairs(d.filter(col("doc_id") < 10),
          "doc_id", "text", window = 2)
        val vocab = d.select(explode(TA.tokens(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("c"))
        graft.operators.Sampling.negativeSamples(
            pairs, "doc_id", "pos", vocab, "token", "c", k = 2)
          .orderBy(col("doc_id"), col("pos"), col("context"), col("neg_j"))
      },
      Some {
        val uu = uuOpenSql("md5(doc_id || ':' || pos || ':' || j || ':neg')")
        s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents WHERE doc_id < 10),
           |p AS (SELECT doc_id, i AS pos, w[i] AS center, len(w) AS n, w FROM t, unnest(range(1, len(w)+1)) AS r(i)),
           |pr AS (SELECT doc_id, pos, center, w[CAST(pos + o AS INT)] AS context
           |  FROM p, unnest([-2, -1, 1, 2]) AS u(o)
           |  WHERE pos + o >= 1 AND pos + o <= n),
           |v AS (SELECT token, count(*) AS c FROM (SELECT unnest(string_split(text,' ')) AS token FROM documents) GROUP BY 1),
           |wgt AS (SELECT token AS tk, pow(c::DOUBLE, 0.75) AS wt FROM v),
           |z AS (SELECT sum(wt) AS z FROM wgt),
           |cdf AS (SELECT tk,
           |  sum(wt) OVER (ORDER BY tk ROWS UNBOUNDED PRECEDING)/z.z AS hi,
           |  sum(wt) OVER (ORDER BY tk ROWS UNBOUNDED PRECEDING)/z.z - wt/z.z AS lo
           |  FROM wgt, z),
           |d AS (SELECT doc_id, pos, center, context, j AS neg_j, $uu AS u
           |  FROM pr, unnest([1, 2]) AS nj(j))
           |SELECT doc_id, pos, center, context, neg_j, cdf.tk AS negative
           |FROM d JOIN cdf ON u > lo AND u <= hi
           |ORDER BY doc_id, pos, context, neg_j""".stripMargin.replace('\n', ' ')
      },
      doc = "k=2 negative-sampling draws per skip-gram pair (unigram^0.75 CDF inversion)"),

    // ---- BERT MLM masking plan (Devlin 2019 80/10/10): every draw is
    // a hashUniform PRF of (doc, pos, role), so the masking REPLAYS in
    // SQL — selection, action split, and the random-token index all
    // hash-exact. One posexplode, three map-side kernels, no shuffle.
    "q_mlm_mask" -> Q(
      (s, dir) => TA.mlmMask(
          table(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", maskProb = 0.15)
        .orderBy(col("doc_id"), col("pos")),
      Some {
        def uu(role: String) =
          uuSql(s"md5(doc_id || ':' || pos || ':$role:mlm')")
        s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents WHERE doc_id < 300),
           |p AS (SELECT doc_id, i AS pos, w[i] AS token, len(w) AS n, w FROM t, unnest(range(1, len(w)+1)) AS r(i)),
           |sel AS (SELECT doc_id, pos, token, n, w, ${uu("sel")} AS us, ${uu("act")} AS ua, ${uu("pos")} AS up FROM p)
           |SELECT doc_id, pos, token,
           |CASE WHEN ua <= 0.8 THEN 'mask' WHEN ua <= 0.9 THEN 'random' ELSE 'keep' END AS action,
           |CASE WHEN ua <= 0.8 THEN '[MASK]' WHEN ua <= 0.9 THEN w[CAST(ceil(up * n) AS INT)] ELSE token END AS out
           |FROM sel WHERE us < 0.15 ORDER BY doc_id, pos""".stripMargin.replace('\n', ' ')
      },
      doc = "BERT-style 80/10/10 MLM masking plan — every draw a hash PRF, SQL-replayable"),

    // ---- fill-in-the-middle transform (Bavarian 2022): hash-chosen
    // apply coin + two character cut points -> PSM reordering with
    // sentinels; pure map, replays via substr in SQL.
    "q_fim_transform" -> Q(
      (s, dir) => TA.fimTransform(
          table(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", fimRate = 0.5)
        .orderBy(col("doc_id")),
      Some {
        def uu(role: String) = uuOpenSql(s"md5(doc_id || ':$role:fim')")
        s"""WITH b AS (SELECT doc_id, text, length(text) AS L,
           |  (${uu("apply")} < 0.5 AND length(text) > 1) AS fim_applied,
           |  CAST(floor(${uu("cut1")} * length(text)) AS INT) AS c1,
           |  CAST(floor(${uu("cut2")} * length(text)) AS INT) AS c2
           |  FROM documents WHERE doc_id < 300)
           |SELECT doc_id, fim_applied,
           |CASE WHEN fim_applied THEN least(c1, c2) END AS lo,
           |CASE WHEN fim_applied THEN greatest(c1, c2) END AS hi,
           |CASE WHEN fim_applied THEN '<|fim_pre|>' || substr(text, 1, least(c1, c2))
           |  || '<|fim_suf|>' || substr(text, greatest(c1, c2) + 1)
           |  || '<|fim_mid|>' || substr(text, least(c1, c2) + 1, greatest(c1, c2) - least(c1, c2))
           |ELSE text END AS out
           |FROM b ORDER BY doc_id""".stripMargin.replace('\n', ' ')
      },
      doc = "FIM PSM transform with hash-deterministic cut points (code-LM augmentation)"),

    // ---- unigram-LM tokenizer training (Kudo 2018, SentencePiece's
    // model) — the EM sibling of q_bpe_merges: float EM has no SQL
    // replay, so UnigramSpec gates it (likelihood monotonicity,
    // planted-morpheme recovery, coverage, determinism at 9dp)
    // ---- the q_sketch_stats_exact split pattern (r15 verdict Next
    // #3) applied to unigram training: the SEED inventory — chars plus
    // the most frequent weighted substrings — is exact integer math
    // over the word table and replays fully in SQL; only the float EM
    // refinement over it (q_unigram_pieces below) stays spec-gated.
    "q_unigram_seed" -> Q(
      (s, dir) => graft.operators.Unigram
        .seedCounts(table(s, dir, "documents"), "text")
        .orderBy(col("c").desc, col("p")).limit(200)
        .select(col("p").as("piece"), col("c")),
      Some("""WITH words AS (SELECT w, count(*)::BIGINT AS c FROM (
             |  SELECT unnest(regexp_split_to_array(text, '\s+')) AS w FROM documents)
             |  WHERE length(w) > 0 GROUP BY w),
             |s1 AS (SELECT w, c, unnest(range(0, length(w))) AS si FROM words),
             |s2 AS (SELECT w, c, si, unnest(range(1, 7)) AS lj FROM s1),
             |subs AS (SELECT substr(w, (si + 1)::INT, lj::INT) AS p, sum(c)::BIGINT AS c
             |  FROM s2 WHERE si + lj <= length(w) GROUP BY 1),
             |seedset AS (
             |  SELECT p, c FROM subs WHERE length(p) = 1
             |  UNION ALL
             |  SELECT p, c FROM (SELECT p, c FROM subs WHERE length(p) > 1 AND c >= 2
             |    ORDER BY c DESC, p LIMIT 20000))
             |SELECT p AS piece, c FROM seedset
             |ORDER BY c DESC, piece LIMIT 200""".stripMargin.replace('\n', ' ')),
      doc = "unigram seed-vocab inventory: exact weighted substring counts (the SQL-replayable half of q_unigram_pieces)"),

    "q_unigram_pieces" -> Q(
      (s, dir) => {
        import s.implicits._
        val d = table(s, dir, "documents")
        graft.operators.Unigram.train(d, "text", vocabSize = 64, emRounds = 2)
          .pieces
          .map(p => (p.piece, BigDecimal(p.logProb)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("piece", "log_prob")
          .orderBy(col("log_prob").desc, col("piece"))
      },
      None,
      doc = "unigram-LM tokenizer training; EM over the word table, spec-gated"),

    // ---- unigram APPLY: Viterbi-encode docs against the TRAINED
    // pieces (broadcast table, map-side, no shuffle). FULL oracle via
    // artifact replay (r15 verdict Next #3): the EM-fitted piece table
    // persists with full double precision (IndexStore.unigram64) and
    // the oracle re-derives the ENTIRE Viterbi DP from first
    // principles in SQL — per distinct word, a recursive CTE carries
    // the best/backpointer arrays position by position (the ≤6
    // candidates per position pivot to scalar columns; argmax with the
    // engine's exact longest-piece-first tie-break as a CASE cascade),
    // then a second recursion backtracks the segmentation and docs
    // reassemble by word position. Left-to-right path sums make the
    // float scores association-order identical in both engines.
    // (Deliberately lambda-free inside the recursions: DuckDB 1.0's
    // recursive-CTE + list-lambda combination returns wrong folds on
    // ~7% of fresh connections — measured, prototyped around.)
    "q_unigram_encode" -> Q(
      (s, dir) => {
        val d = table(s, dir, "documents")
        graft.operators.Unigram
          .encodeDocs(d.filter(col("doc_id") < 40), "doc_id", "text",
            graft.operators.IndexStore.unigramPieces(s, dir))
          .select(col("id").as("doc_id"),
            concat_ws(" ", col("pieces")).as("pieces"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE
             |P AS (SELECT piece, log_prob
             |  FROM read_parquet('__UNIGRAM_ARTIFACT__/pieces/*.parquet')),
             |d40 AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
             |warr AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM d40),
             |wordpos AS (SELECT doc_id, i AS ord, ws[i] AS w
             |  FROM warr, unnest(range(1, len(ws) + 1)) t(i)
             |  WHERE length(ws[i]) > 0),
             |words AS (SELECT DISTINCT w FROM wordpos),
             |sub1 AS (SELECT w, unnest(range(0, length(w))) AS j FROM words),
             |sub2 AS (SELECT w, j, unnest(range(1, 7)) AS L FROM sub1),
             |subs AS (SELECT w, j, L, j + L AS i, substr(w, (j+1)::INT, L::INT) AS piece
             |  FROM sub2 WHERE j + L <= length(w)),
             |cand AS MATERIALIZED (
             |  SELECT s.w, s.i,
             |    max(CASE WHEN s.L = 1 THEN p.log_prob END) AS lp1,
             |    max(CASE WHEN s.L = 2 THEN p.log_prob END) AS lp2,
             |    max(CASE WHEN s.L = 3 THEN p.log_prob END) AS lp3,
             |    max(CASE WHEN s.L = 4 THEN p.log_prob END) AS lp4,
             |    max(CASE WHEN s.L = 5 THEN p.log_prob END) AS lp5,
             |    max(CASE WHEN s.L = 6 THEN p.log_prob END) AS lp6
             |  FROM subs s JOIN P p USING (piece) GROUP BY s.w, s.i),
             |dp(w, i, best, bk) AS (
             |  SELECT w, 0::BIGINT, [0.0::DOUBLE], [(-1.0)::DOUBLE] FROM words
             |  UNION ALL
             |  SELECT w, i + 1, list_append(best, bi), list_append(bk, ki) FROM (
             |    SELECT w, i, best, bk, v1, v2, v3, v4, v5, v6,
             |      GREATEST(coalesce(v6, '-Infinity'::DOUBLE), coalesce(v5, '-Infinity'::DOUBLE),
             |               coalesce(v4, '-Infinity'::DOUBLE), coalesce(v3, '-Infinity'::DOUBLE),
             |               coalesce(v2, '-Infinity'::DOUBLE), coalesce(v1, '-Infinity'::DOUBLE)) AS bi,
             |      CASE WHEN v6 IS NOT NULL AND v6 >= coalesce(v5, '-Infinity'::DOUBLE) AND v6 >= coalesce(v4, '-Infinity'::DOUBLE) AND v6 >= coalesce(v3, '-Infinity'::DOUBLE) AND v6 >= coalesce(v2, '-Infinity'::DOUBLE) AND v6 >= coalesce(v1, '-Infinity'::DOUBLE) THEN (i - 5)::DOUBLE
             |           WHEN v5 IS NOT NULL AND v5 >= coalesce(v4, '-Infinity'::DOUBLE) AND v5 >= coalesce(v3, '-Infinity'::DOUBLE) AND v5 >= coalesce(v2, '-Infinity'::DOUBLE) AND v5 >= coalesce(v1, '-Infinity'::DOUBLE) THEN (i - 4)::DOUBLE
             |           WHEN v4 IS NOT NULL AND v4 >= coalesce(v3, '-Infinity'::DOUBLE) AND v4 >= coalesce(v2, '-Infinity'::DOUBLE) AND v4 >= coalesce(v1, '-Infinity'::DOUBLE) THEN (i - 3)::DOUBLE
             |           WHEN v3 IS NOT NULL AND v3 >= coalesce(v2, '-Infinity'::DOUBLE) AND v3 >= coalesce(v1, '-Infinity'::DOUBLE) THEN (i - 2)::DOUBLE
             |           WHEN v2 IS NOT NULL AND v2 >= coalesce(v1, '-Infinity'::DOUBLE) THEN (i - 1)::DOUBLE
             |           WHEN v1 IS NOT NULL THEN (i)::DOUBLE
             |           ELSE -1.0 END AS ki
             |    FROM (
             |      SELECT d.w, d.i AS i, d.best AS best, d.bk AS bk,
             |        CASE WHEN d.i - 4 >= 1 AND c.lp6 IS NOT NULL AND NOT isinf(d.best[d.i - 4]) THEN d.best[d.i - 4] + c.lp6 END AS v6,
             |        CASE WHEN d.i - 3 >= 1 AND c.lp5 IS NOT NULL AND NOT isinf(d.best[d.i - 3]) THEN d.best[d.i - 3] + c.lp5 END AS v5,
             |        CASE WHEN d.i - 2 >= 1 AND c.lp4 IS NOT NULL AND NOT isinf(d.best[d.i - 2]) THEN d.best[d.i - 2] + c.lp4 END AS v4,
             |        CASE WHEN d.i - 1 >= 1 AND c.lp3 IS NOT NULL AND NOT isinf(d.best[d.i - 1]) THEN d.best[d.i - 1] + c.lp3 END AS v3,
             |        CASE WHEN d.i >= 1 AND c.lp2 IS NOT NULL AND NOT isinf(d.best[d.i]) THEN d.best[d.i] + c.lp2 END AS v2,
             |        CASE WHEN c.lp1 IS NOT NULL AND NOT isinf(d.best[d.i + 1]) THEN d.best[d.i + 1] + c.lp1 END AS v1
             |      FROM dp d LEFT JOIN cand c ON c.w = d.w AND c.i = d.i + 1
             |      WHERE d.i < length(d.w)) x) y),
             |fin AS MATERIALIZED (SELECT w, best, bk FROM dp WHERE i = length(w)),
             |bt(w, p, pieces) AS (
             |  SELECT w, length(w)::BIGINT, []::VARCHAR[] FROM fin
             |  WHERE NOT isinf(best[length(w) + 1])
             |  UNION ALL
             |  SELECT b.w, CAST(f.bk[CAST(b.p AS INT) + 1] AS BIGINT),
             |    list_prepend(substr(b.w, CAST(f.bk[CAST(b.p AS INT) + 1] AS INT) + 1,
             |      CAST(b.p AS INT) - CAST(f.bk[CAST(b.p AS INT) + 1] AS INT)), b.pieces)
             |  FROM bt b JOIN fin f USING (w) WHERE b.p > 0),
             |perword AS (
             |  SELECT f.w, CASE WHEN isinf(f.best[length(f.w) + 1]) THEN f.w ELSE t.encoded END AS enc
             |  FROM fin f LEFT JOIN (SELECT w, array_to_string(pieces, ' ') AS encoded
             |                        FROM bt WHERE p = 0) t USING (w)),
             |agg AS (SELECT wp.doc_id, string_agg(pw.enc, ' ' ORDER BY wp.ord) AS pieces
             |  FROM wordpos wp JOIN perword pw USING (w) GROUP BY wp.doc_id)
             |SELECT d.doc_id, coalesce(a.pieces, '') AS pieces
             |FROM d40 d LEFT JOIN agg a USING (doc_id)
             |ORDER BY doc_id""".stripMargin.replace('\n', ' ')),
      doc = "Viterbi piece encoding against the persisted trained vocabulary (oracle replays the full DP + backtrack in SQL from the same artifact)")
  )
}
