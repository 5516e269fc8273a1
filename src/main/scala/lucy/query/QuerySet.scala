package lucy.query

import lucy.LucySpec

/** The reference query set (FIXTURES.md §3): the frozen 20 r1 queries
  * (10 AND + 10 OR covering single tail/head terms, 2–4 mixed-term
  * queries, stopword-only and stopword-laden input, duplicate terms,
  * absent terms, punctuation/case normalization, k ∈ {1, 10, 100}),
  * extended in r2 with phrase and prefix queries (stopword elision,
  * absent-term phrase, broad + narrow prefixes), and in r3 with
  * head-term combinations whose Σ df crosses the scatter-gather
  * ceiling at bench scale (distributed-shape coverage, VERDICT r2 #2).
  * Goldens generated from LucySpec via NaiveSearch live in
  * src/test/resources/golden_queries.json (SURVEY.md §5.2
  * rank-identity); earlier rounds' golden lines stay byte-frozen —
  * extensions only append.
  */
object QuerySet {

  case class Q(id: String, query: String, mode: QueryMode.Value, k: Int)

  val reference: Seq[Q] = Seq(
    Q("and_tail1", "varint", QueryMode.And, 10),
    Q("and_head1", "spark", QueryMode.And, 10),
    Q("and_2mixed", "spark varint", QueryMode.And, 10),
    Q("and_3mixed", "spark shuffle delta", QueryMode.And, 10),
    Q("and_4terms", "index posting term query", QueryMode.And, 10),
    Q("and_stoplade", "the spark and shuffle", QueryMode.And, 10),
    Q("and_dupterms", "spark spark shuffle", QueryMode.And, 10),
    Q("and_absent", "spark zzzmissing", QueryMode.And, 10),
    Q("and_k1", "merge sort", QueryMode.And, 1),
    Q("and_k100", "partition", QueryMode.And, 100),
    Q("or_tail2", "snippet anchor", QueryMode.Or, 10),
    Q("or_headstop", "spark the", QueryMode.Or, 10),
    Q("or_2tail", "wand heap", QueryMode.Or, 10),
    Q("or_3mixed", "compaction watermark stream", QueryMode.Or, 10),
    Q("or_4tail", "catalyst codegen tungsten columnar", QueryMode.Or, 10),
    Q("or_stoponly", "the and of", QueryMode.Or, 10),
    Q("or_punct", "Spark, SHUFFLE!", QueryMode.Or, 10),
    Q("or_absent", "zzzmissing qqqnope", QueryMode.Or, 10),
    Q("or_k1", "pruning", QueryMode.Or, 1),
    Q("or_k100", "bucket salting skew", QueryMode.Or, 100),
    // r2: phrase queries (adjacency in the post-stopword position stream)
    Q("phrase_head2", "spark shuffle", QueryMode.Phrase, 10),
    Q("phrase_tail2", "wand heap", QueryMode.Phrase, 10),
    Q("phrase_stopelide", "spark the shuffle", QueryMode.Phrase, 10),
    Q("phrase_absent", "spark zzzmissing", QueryMode.Phrase, 10),
    Q("phrase_dup", "spark spark", QueryMode.Phrase, 10),
    // r2: prefix queries (ascending-term expansion, capped)
    Q("prefix_wa", "wa", QueryMode.Prefix, 10),
    Q("prefix_s", "s", QueryMode.Prefix, 25),
    // r3 (VERDICT r2 #2): head-term combinations sized so Σ raw df
    // exceeds the 2^20 scatter-gather ceiling at the 270k-doc driver
    // bench corpus (each head term df ≈ N) — BENCH phases B/C then
    // exercise the BUCKET-EXCHANGE shape, not only the gather path.
    // and_head3x sits near the crossover: gathered at 270k, exchanged
    // at the 1.8M campaign scale.
    Q("and_head3x", "spark shuffle index", QueryMode.And, 10),
    Q("and_head5x", "spark shuffle index posting query", QueryMode.And, 10),
    Q("or_head6x", "spark shuffle index posting query merge", QueryMode.Or, 100))

  require(reference.map(_.id).distinct.length == reference.length)
  require(reference.count(_.mode == QueryMode.And) == 12)
  require(reference.count(_.mode == QueryMode.Or) == 11)
  require(reference.count(_.mode == QueryMode.Phrase) == 5)
  require(reference.count(_.mode == QueryMode.Prefix) == 2)
}
