package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{IndexStore, InvertedIndex}

/** Inverted/numeric index search surface (SURVEY.md §2.9 text indexes,
  * §4.1 filter→index rewrite). The text queries answer the filter from
  * the PERSISTED posting table ([[IndexStore]]) via semi-join
  * composition — the Spark-native equivalent of the reference's
  * roaring-bitmap index short-circuit; the oracle checks the *result*
  * matches a plain scan.
  */
object IndexQueries extends QueryModule {

  override def qs: Seq[(String, Q)] = Seq(

    // CONTAINS(col, a) AND CONTAINS(col, b) answered from the inverted index
    "q_inverted_contains_all" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val idx = IndexStore.inverted(s, dir)
        InvertedIndex.searchDocs(docs, "doc_id",
            InvertedIndex.containsAll(idx, Seq("vector", "spark")))
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE list_contains(string_split(lower(text), ' '), 'vector')
             |AND list_contains(string_split(lower(text), ' '), 'spark')
             |ORDER BY doc_id""".stripMargin.replace('\n', ' '))),

    // typo-tolerant CONTAINS: the query term expands against the
    // vocabulary-sized distinct-term table via PassJoin blocking, then
    // matched terms drive the plain postings union
    "q_fuzzy_contains" -> Q(
      (s, dir) => InvertedIndex.fuzzyContains(
          IndexStore.inverted(s, dir), "vectr", maxDist = 1)
        .orderBy(col("doc_id"), col("term")),
      Some("""WITH v AS (SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS term
             |  FROM documents),
             |m AS (SELECT term, levenshtein(term, 'vectr') AS dist FROM v
             |      WHERE term <> '' AND levenshtein(term, 'vectr') <= 1),
             |p AS (SELECT DISTINCT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS term
             |      FROM documents)
             |SELECT DISTINCT p.doc_id, p.term, m.dist FROM p JOIN m USING (term)
             |ORDER BY doc_id, term""".stripMargin.replace('\n', ' ')),
      doc = "edit-distance-1 typo-tolerant term search via vocabulary expansion"),

    // consecutive-words phrase query over a positional posting table:
    // occurrences offset-normalize to a base position, k distinct
    // correct offsets = a phrase hit (one filter + one hash-agg, no
    // k-way self-join). Corpus is single-space [a-z0-9] text, so the
    // oracle is an exact padded-substring match.
    "q_phrase_search" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val pos = InvertedIndex.buildPositional(docs, "doc_id", "text")
        InvertedIndex.searchDocs(docs, "doc_id",
            InvertedIndex.phraseMatch(pos, Seq("stream", "table", "hash")))
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE ' ' || text || ' ' LIKE '% stream table hash %'
             |ORDER BY doc_id""".stripMargin.replace('\n', ' ')),
      doc = "positional-index phrase match for consecutive words"),

    // JSON path equality answered from the persisted JSON index
    // (JsonIndex, types.pyi:220; bluesky_queries.sql:12-40): probe
    // (path, md5(value)) postings, semi-join ids back to the table
    "q_json_indexed" -> Q(
      (s, dir) => {
        val events = table(s, dir, "events")
        val idx = IndexStore.json(s, dir)
        InvertedIndex.searchDocs(events, "event_id",
            InvertedIndex.jsonEquals(idx, "$.k", "42"))
          .select(col("event_id"), col("user_id"), col("event_type"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, event_type FROM events
             |WHERE json_extract_string(props, '$.k') = '42'
             |ORDER BY event_id""".stripMargin.replace('\n', ' '))),

    // OR of posting sets (union), aggregated per language
    "q_inverted_contains_any" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val idx = IndexStore.inverted(s, dir)
        InvertedIndex.searchDocs(docs, "doc_id",
            InvertedIndex.containsAny(idx, Seq("vector", "stream")))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
             |FROM documents
             |WHERE list_contains(string_split(lower(text), ' '), 'vector')
             |OR list_contains(string_split(lower(text), ' '), 'stream')
             |GROUP BY lang ORDER BY lang""".stripMargin.replace('\n', ' '))),

    // numeric secondary index: BETWEEN answered by index + semi-join
    "q_numeric_index_range" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events")
        val idx = InvertedIndex.buildNumeric(ev, "event_id", "value")
        InvertedIndex.searchDocs(ev, "event_id",
            InvertedIndex.numericWhere(idx, col("value").between(99.0, 100.0)))
          .select(col("event_id"), col("event_type"), round(col("value"), 6).as("value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, event_type, round(value,6) AS value FROM events
             |WHERE value BETWEEN 99.0 AND 100.0
             |ORDER BY event_id""".stripMargin.replace('\n', ' ')))
  )
}
