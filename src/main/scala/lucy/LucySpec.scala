package lucy

import java.util.Locale

/** Normative spec for the engine (SURVEY.md §8, frozen v1).
  *
  * The reference (amyxzhang/lucy.js) is unavailable in this sandbox
  * (SURVEY.md §0), so this object is the single source of truth for
  * tokenization, stopwording, BM25 parameters, docId assignment, and
  * tie-breaking. Both the fast index/WAND path and the naive
  * DataFrame oracle implement exactly this spec; rank-identity is
  * enforced between them (SURVEY.md §5.2).
  *
  * Everything here is a pure function: no wall clock, no unseeded
  * randomness, ASCII-only text rules. Keep ALL constants here so a
  * future reconciliation against the real reference (SURVEY.md §0.1)
  * is a one-object change.
  */
object LucySpec {

  // ---- BM25 parameters (SURVEY.md §8.4) -------------------------------
  val k1: Double = 1.2
  val b: Double = 0.75
  val defaultK: Int = 10

  // ---- tokenizer parameters (SURVEY.md §8.2) ---------------------------
  val maxTokenLen: Int = 64
  val stemming: Boolean = false // Porter behind this flag if reconciliation demands

  /** Frozen classic English stopword list (SURVEY.md §8.2). */
  val stopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
    "to", "was", "were", "will", "with", "this", "but", "they", "have",
    "had", "what", "when", "where", "who")

  /** Sorted form for SQL oracles (stable IN-list text). */
  val stopwordsSqlList: String = stopwords.toSeq.sorted.map(w => s"'$w'").mkString(", ")

  /** Prefix queries expand to at most this many corpus terms, taken in
    * ascending term order (deterministic, oracle-expressible; the Lucene
    * maxClauseCount analog).
    */
  val maxPrefixExpand: Int = 128

  // ---- index layout (SURVEY.md §8.3, §4.3) -----------------------------
  val blockSize: Int = 128
  val seed: Long = 42L
  /** docs-per-salt threshold: a term gets ceil(df / saltDfThreshold) salts, capped. */
  val saltDfThreshold: Long = 1L << 20
  val maxSalts: Int = 16

  // ---- tokenization (SURVEY.md §8.2) -----------------------------------

  /** Lowercase → split on runs outside [a-z0-9] → drop empty, >64-char,
    * stopword tokens. Returns tokens in document order (duplicates kept;
    * docLen = result length). Stemming (Porter, behind the frozen-OFF
    * `stemming` flag) applies AFTER the stopword/length filters, so the
    * flag flip never changes which tokens exist, only their surface form.
    */
  def tokenize(text: String): Array[String] = tokenizeWith(text, stemming)

  def tokenizeWith(text: String, stem: Boolean): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val lower = text.toLowerCase(Locale.ROOT)
    val out = Array.newBuilder[String]
    var i = 0
    val n = lower.length
    while (i < n) {
      // skip separators
      while (i < n && !isTokenChar(lower.charAt(i))) i += 1
      val start = i
      while (i < n && isTokenChar(lower.charAt(i))) i += 1
      if (i > start) {
        val tok = lower.substring(start, i)
        if (tok.length <= maxTokenLen && !stopwords.contains(tok))
          out += (if (stem) lucy.text.PorterStemmer.stem(tok) else tok)
      }
    }
    out.result()
  }

  @inline private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** Query-side token set: distinct terms, ascending lexicographic order
    * (the normative BM25 summation order, SURVEY.md §8.4/§8.6).
    */
  def queryTerms(query: String): Array[String] =
    tokenize(query).distinct.sorted

  // ---- BM25 (SURVEY.md §8.4) -------------------------------------------

  /** Lucene-style idf, always ≥ 0.
    *
    * StrictMath.log, NOT Math.log: Spark's `ln` Column expression
    * evaluates via StrictMath semantics and the two differ by 1 ULP on
    * some inputs (verified in-session: ln(1.6)). Bit-identical scores
    * between the scalar WAND kernel and the Column-based naive engine
    * (SURVEY.md §4.3) require one pinned log implementation.
    */
  def idf(df: Long, n: Long): Double =
    StrictMath.log((n - df + 0.5) / (df + 0.5) + 1.0)

  /** Per-(term,doc) impact — the idf-free part of the BM25 addend. */
  def impact(tf: Long, docLen: Long, avgdl: Double): Double =
    tf.toDouble / (tf + k1 * (1.0 - b + b * docLen / avgdl))

  /** One BM25 addend. Full doc score = Σ addends in ascending term order. */
  def bm25Addend(tf: Long, docLen: Long, df: Long, n: Long, avgdl: Double): Double =
    idf(df, n) * (k1 + 1.0) * impact(tf, docLen, avgdl)

  /** Upper bound of impact() for a given tf and the minimum docLen in a
    * block — used for block-max WAND pruning (impact is monotonically
    * increasing in tf and decreasing in docLen).
    */
  def impactUpperBound(maxTf: Long, minDocLen: Long, avgdl: Double): Double =
    impact(maxTf, minDocLen, avgdl)

  // ---- docId assignment (SURVEY.md §8.5) ---------------------------------

  /** Deterministic 63-bit docId from the url. Matches Spark's
    * xxhash64(url) & Long.MaxValue (Spark's XxHash64 expression uses
    * seed 42 over UTF-8 bytes; XxHash64Spec asserts the equality).
    */
  def docIdForUrl(url: String): Long =
    XxHash64.hashUtf8(url, seed) & Long.MaxValue

  // ---- deterministic PRNG for fixtures (FIXTURES.md §1/§5) ---------------

  /** splitmix64 finalizer — pure function mixing. */
  def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4B290L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Pure stream: rnd(i, j) for row i, draw j. */
  def rnd(i: Long, j: Long): Long =
    mix64(mix64(seed ^ (i * 0xD1B54A32D192ED03L)) ^ (j * 0x8CB92BA72F3D8DD7L))

  /** Uniform double in [0, 1) from a raw 64-bit draw. */
  def unitDouble(raw: Long): Double = (raw >>> 11) * 1.1102230246251565e-16
}

/** Pure-Scala XXH64 (public algorithm, Cyan4973/xxHash spec).
  * Implemented from the published specification so docId assignment
  * works identically on the driver (golden generation, query planning)
  * and in Spark columns (`xxhash64`, seed 42); XxHash64Spec property-
  * tests the two against each other.
  */
object XxHash64 {
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  def hashUtf8(s: String, seed: Long): Long =
    hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  def hash(data: Array[Byte], seed: Long): Long = hash(data, data.length, seed)

  /** Hash of the first `len` bytes — lets hot loops reuse one scratch
    * buffer instead of allocating a sized array per hash (the minhash
    * signature pass, r5). Identical output to hash(data.take(len)).
    */
  def hash(data: Array[Byte], len: Int, seed: Long): Long = {
    var i = 0
    var h: Long = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i + 32 <= len) {
        v1 = round(v1, readLong(data, i))
        v2 = round(v2, readLong(data, i + 8))
        v3 = round(v3, readLong(data, i + 16))
        v4 = round(v4, readLong(data, i + 24))
        i += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2)
      h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }
    h += len
    while (i + 8 <= len) {
      h ^= round(0L, readLong(data, i))
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h ^= (readInt(data, i) & 0xFFFFFFFFL) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h ^= (data(i) & 0xFFL) * P5
      h = java.lang.Long.rotateLeft(h, 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  @inline private def round(acc: Long, input: Long): Long =
    java.lang.Long.rotateLeft(acc + input * P2, 31) * P1

  @inline private def mergeRound(hIn: Long, vIn: Long): Long = {
    val v = round(0L, vIn)
    (hIn ^ v) * P1 + P4
  }

  @inline private def readLong(d: Array[Byte], i: Int): Long =
    (d(i) & 0xFFL) | ((d(i + 1) & 0xFFL) << 8) | ((d(i + 2) & 0xFFL) << 16) |
      ((d(i + 3) & 0xFFL) << 24) | ((d(i + 4) & 0xFFL) << 32) |
      ((d(i + 5) & 0xFFL) << 40) | ((d(i + 6) & 0xFFL) << 48) |
      ((d(i + 7) & 0xFFL) << 56)

  @inline private def readInt(d: Array[Byte], i: Int): Int =
    (d(i) & 0xFF) | ((d(i + 1) & 0xFF) << 8) | ((d(i + 2) & 0xFF) << 16) |
      ((d(i + 3) & 0xFF) << 24)
}
