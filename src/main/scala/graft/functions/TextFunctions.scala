package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis / fingerprinting primitives for the LLM-data-pipeline
  * operators (north-star layer; no counterpart in the reference, which has no
  * text ops beyond regex extraction — log_mining_analysis.py:24-28).
  *
  * Everything here is built from Catalyst higher-order functions over array
  * columns — no UDFs, no driver round-trips, so every operator stays a pure
  * narrow map over the scan and distributes trivially.
  *
  * ANSI-safety: Spark 4 enables ANSI mode by default, so all hash arithmetic
  * is kept overflow-free (affine minhash transforms work mod p = 2^31-1;
  * rolling fingerprints mod 1e9+7).
  */
object TextFunctions {

  /** Java-regex whitespace, spelled out: `\s` means exactly this class in
    * Java but RE2 (DuckDB) excludes U+000B, so the explicit class is the only
    * form both engines read identically. Oracle SQL uses the same literal.
    */
  private[graft] val WS = " \\t\\n\\x0B\\f\\r"

  /** Whitespace tokens, trimmed (empty-token-free on normal text). */
  def tokens(c: Column): Column = split(trim(c), s"[$WS]+")

  /** BPE-style pre-tokens: the GPT-2-family pre-tokenizer shape —
    * apostrophe suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs, residual whitespace — as one ordered-alternation
    * regex. Deliberately RE2-compatible (no lookahead, ASCII classes) so
    * the DuckDB oracle evaluates the IDENTICAL pattern: every character
    * lands in exactly one alternative, making counts engine-independent.
    * `n_tokens = size(bpeTokens(text))` is the corpus "fertility"
    * numerator used to budget tokenizer costs in training-data pipelines.
    */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(c,
      lit(s"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9$WS]+|[$WS]+"), lit(0))

  /** w-token shingles as strings; empty array when the doc is shorter than w. */
  def tokenShingles(toks: Column, w: Int): Column =
    when(size(toks) < w, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w)))))

  /** Gopher-style repetition signal (Rae et al. 2021, appendix A1.1
    * analogue): the duplicated fraction of word n-grams — (grams −
    * distinct grams) / grams, 0.0 for docs shorter than n tokens. High
    * values mark boilerplate/spam documents a training-data pipeline
    * filters out.
    *
    * Distinct grams are counted via the compiled [[shingleHashSet]]
    * kernel (one FNV pass per row, ~10× the throughput of building
    * string grams with `transform`+`array_distinct`, measured at x10);
    * its per-token separator fold gives hashes the same identity as
    * ' '-joined gram strings, so the count equals the DuckDB oracle's
    * `list_distinct` over string grams up to in-document 64-bit
    * collisions — the same negligible-odds argument the MinHash/Jaccard
    * oracles already rest on. Narrow, scan-local, no shuffle; a single
    * division keeps the double bit-identical to the oracle's.
    */
  def dupGramFrac(text: Column, n: Int): Column = {
    val total = greatest(lit(0), size(tokens(text)) - lit(n - 1))
    when(total === 0, lit(0.0))
      .otherwise((total - size(shingleHashSet(text, n))).cast("double") / total)
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  /** Distinct 64-bit hashes of the w-token shingles — the document's
    * shingle set, used by MinHash/Jaccard dedup. Compiled per-row kernel
    * (expressions.ShingleHashSet); collision probability over 64 bits is
    * negligible at any corpus size we target.
    */
  def shingleHashSet(text: Column, w: Int): Column =
    toCol(expressions.ShingleHashSet(toExpr(tokens(text)), w))

  /** MinHash signature: k minima of seeded affine transforms of the shingle
    * hashes, mod 2^31-1 (overflow-free under ANSI mode). One compiled pass
    * over the in-row array — no shuffle, no per-element interpretation.
    */
  def minhashSignature(shingleHashes: Column, k: Int, seed: Long = 42L): Column =
    toCol(expressions.MinHashSig(toExpr(shingleHashes), k, seed))

  /** LSH band keys: one mixed 64-bit key per r-slice of the signature.
    * Docs sharing any band key become dedup candidates.
    */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    toCol(expressions.MinHashBandKeys(toExpr(sig), bands, rowsPerBand))

  /** Estimated Jaccard from two signatures: fraction of agreeing positions. */
  def estimatedJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / size(sigA)

  /** Exact Jaccard over two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** 64-bit SimHash over a token array column: bit b is set iff the sum of
    * (+1/-1) votes from each token hash's bit b is positive. Compiled
    * per-row kernel (expressions.SimHash64).
    */
  def simhash64(toksColName: String): Column =
    toCol(expressions.SimHash64(toExpr(col(toksColName))))

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** FNV-1a-64 of a string column's UTF-8 bytes — the single-sourced hash
    * stream (expressions.HashUtil) as a scalar function; the primitive
    * behind [[graft.operators.Relational.hashSplit]]'s partition-stable
    * bucketing, re-derivable per character in DuckDB for ASCII input.
    */
  def fnv64(c: Column): Column = toCol(expressions.Fnv64(toExpr(c)))

  /** Avalanche-corrected FNV (fmix64 finalizer) for bit-position consumers
    * — see [[expressions.FnvMixed64]].
    */
  def fnvMixed64(c: Column): Column =
    toCol(expressions.FnvMixed64(toExpr(c)))

  /** Unicode NFC canonical normalization (expressions.NfcNormalize) — the
    * ingest-time canonicalizer that makes byte-keyed operators (exact
    * dedup, shingle hashes, content-hash splits) see canonically-equivalent
    * text as equal bytes. Codegen'd; already-NFC input is returned
    * zero-copy. Oracle twin: DuckDB's `nfc_normalize`.
    */
  def nfcNormalize(c: Column): Column = toCol(expressions.NfcNormalize(toExpr(c)))

  /** Overlapping character chunks — the RAG/pretraining chunker: windows
    * of `size` chars every `stride` chars (stride ≤ size ⇒ consecutive
    * chunks overlap by size − stride), always at least one chunk per doc.
    * n_chunks = max(1, ceil((len − (size − stride)) / stride)); chunk i
    * covers the 1-based substring [i·stride + 1, i·stride + size], the
    * final chunk truncating at the text end. Returns
    * array<struct<chunk_id,start,chunk>> — pure per-row array math, no
    * shuffle; q77's DuckDB oracle replays the identical arithmetic.
    */
  def chunks(text: Column, size: Int, stride: Int): Column = {
    require(size >= 1 && stride >= 1 && stride <= size,
      s"chunks: need 1 <= stride <= size, got size=$size stride=$stride")
    val n = length(text)
    val nChunks = greatest(lit(1L),
      floor((n - lit(size - stride) + lit(stride - 1)) /
        lit(stride.toDouble)).cast("long"))
    transform(sequence(lit(0L), nChunks - 1), i =>
      struct(i.as("chunk_id"), (i * stride + 1).as("start"),
        text.substr((i * stride + 1).cast("int"), lit(size)).as("chunk")))
  }

  /** Polynomial rolling-hash fingerprint of the full text, mod 1e9+7.
    * Deterministic, overflow-free, and reproducible in any engine with a
    * left fold (the DuckDB oracle mirrors it with list_reduce).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      filter(split(text, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => pmod(acc * 31 + ascii(ch), lit(1000000007L)))

  /** Winnowing fingerprint set (MOSS scheme): any shared substring of
    * length ≥ k+w-1 between two documents yields a shared fingerprint —
    * the containment-style complement to whole-document polynomial
    * fingerprints. Compiled kernel (expressions.WinnowFingerprints).
    */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    toCol(expressions.WinnowFingerprints(toExpr(text), k, w))

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: broadcast as literals into the plan.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une"),
    "es" -> Seq("el", "los", "las", "una", "es", "y", "que"),
    "it" -> Seq("il", "di", "che", "per", "con", "non", "una"))

  /** Predicted language: argmax of per-language marker-token hit counts,
    * 'und' when nothing matches. Ties break lexicographically larger-lang
    * (struct max), deterministically.
    */
  def langId(toks: Column): Column = {
    val scored = array(langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(
        size(filter(toks, t => array_contains(typedlit(ms), t))).as("score"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_max(scored)
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** PII patterns for scrub-before-training redaction, deliberately
    * RE2-compatible (ASCII classes, no lookaround, no backreferences) so
    * the engine (Java regex) and the q72 DuckDB oracle (RE2) read the
    * IDENTICAL pattern — the bpeTokens trick applied to PII. `\b` is safe:
    * both engines define word chars as [A-Za-z0-9_]. Single source for
    * [[redactPii]], the q72 counts, AND the oracle SQL.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    "phone" -> "\\b[0-9]{3}-[0-9]{4}\\b")

  /** Redact all PII matches with `<KIND>` placeholders, applied in
    * [[piiPatterns]] order (email first: once redacted, `<EMAIL>` contains
    * no digits, so the ipv4/phone passes can never re-match inside it —
    * the same sequential semantics the oracle replays). Pure narrow
    * projection; chained codegen'd regexp_replace, no shuffle.
    */
  def redactPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (kind, pat)) =>
      regexp_replace(acc, pat, s"<${kind.toUpperCase}>")
    }

  /** Stopword set for the Gopher-style "contains ≥ 2 distinct stopwords"
    * filter rule (Rae et al. 2021 use a 8-word English function-word set;
    * this is the subset with nonzero support in the fixture vocabulary so
    * the rule discriminates). Single source for the engine rule AND the
    * q65 DuckDB oracle — interpolated into the SQL like langMarkers.
    */
  val gopherStops: Seq[String] = Seq("the", "a", "and", "of", "to", "with")

  /** Quality-scoring measures: chars, words, mean word length, alpha ratio,
    * stopword ratio — the length/punct/stopword heuristics of C4-style
    * corpus filtering, as one narrow projection.
    */
  def qualityStats(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val nChars = length(text)
    val nWords = size(toks)
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", ""))
    val stopHits = size(filter(toks,
      t => array_contains(typedlit(langMarkers("en")), t)))
    Seq(
      nChars.cast("long").as("n_chars_m"),
      nWords.cast("long").as("n_words"),
      (alpha.cast("double") / nChars).as("alpha_ratio"),
      (stopHits.cast("double") / nWords).as("stopword_ratio"))
  }
}
