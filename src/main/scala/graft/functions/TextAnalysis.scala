package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All of these are per-row, shuffle-free, codegen-friendly column
  * expressions (no UDFs in the hot path) — at 100 TB they run at
  * scan speed and fuse into the reading stage.
  */
object TextAnalysis {

  /** Whitespace tokens (the BPE-ish regex variant splits on
    * non-alphanumerics; both stay inside codegen).
    */
  def tokens(text: Column): Column =
    // native one-pass twin of filter(split(text, "\\s+"), len > 0) —
    // exact for every input (Java \s is six ASCII bytes; see
    // graft.plans.WhitespaceTokens); the regex chain measured
    // 6.7-7.4 s/corpus pass at sf10 and fronts shingles, quality,
    // chunking and winnowing
    graft.plans.WhitespaceTokens(text)

  def bpeishTokens(text: Column): Column =
    // native one-pass tokenizer (graft.plans.BpeishTokens): identical
    // tokens to filter(split(lower(text), "[^a-z0-9']+"), len > 0) —
    // the spec pins equality incl. Unicode case-crossing edge cases —
    // at one byte scan instead of lower + regex + filter (that chain
    // measured 20.5 s/corpus-pass at sf10 and fronts the LM/TF-IDF/
    // winnowing family)
    graft.plans.BpeishTokens(text)

  /** Token count per document. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A small, fixed stopword profile per language — public knowledge
    * lists, used both for quality's stopword-ratio and for langId.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que"))

  /** Quality metrics (length / punctuation / stopword ratios) — the
    * standard cheap pre-filters of LLM data pipelines. Emits one
    * struct column so callers can threshold on any field.
    */
  def qualityMetrics(text: Column): Column = {
    val toks = tokens(text)
    // nToks feeds three fields, but these are UNCONDITIONAL struct
    // fields in one projection, which Spark's subexpression
    // elimination dedups (measured: binding them via a transform
    // lambda is ~5% SLOWER from the boxing). Contrast langId, whose
    // repeats sat under CaseWhen branches — lazily evaluated, so CSE
    // is disabled there and the fold rewrite was a real 4.7× win.
    val nToks = size(toks)
    val nChars = length(text)
    // native one-pass twin of length(regexp_replace(text,
    // "[^!-/:-@\\[-`{-~]", "")) — exact for every input (ASCII-range
    // byte count; see graft.plans.PunctCount); the regexp form built
    // a replaced string per row and measured 14.9 s of the 22 s
    // qualityMetrics corpus pass at sf10
    val punct = graft.plans.PunctCount(text)
    val stopSet = stopwords("en")
    // stopwords match NORMALIZED tokens (lowercased, punctuation
    // stripped — same stream langId scores): raw whitespace tokens
    // never match sentence-initial "The" or trailing-punct "the,",
    // biasing the ratio low on ordinary prose — exactly where a
    // "too few stopwords" quality threshold would misfire. The
    // denominator stays the whitespace token count (a document-length
    // metric, like chars_per_token).
    // native one-pass twin of size(filter(bpeishTokens(text),
    // isin(stopSet))) — same token stream, hash-set membership (the
    // HOF form measured 4-5 s/corpus pass at sf10)
    val nStop = get(graft.plans.StopwordCounts(text, Seq(stopSet)), lit(0))
    struct(
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      round(nChars.cast("double") / greatest(nToks, lit(1)), 4).as("chars_per_token"),
      round(punct.cast("double") / greatest(nChars, lit(1)), 4).as("punct_ratio"),
      round(nStop.cast("double") / greatest(nToks, lit(1)), 4).as("stopword_ratio"))
  }

  /** N-gram-profile language ID: score each candidate language by its
    * stopword hit-rate over the token stream, pick the argmax
    * (deterministic tie-break on language code). Pure column
    * expressions, narrow and shuffle-free.
    *
    * Shaped as ONE `aggregate` fold accumulating every language's
    * count in a single pass. The obvious per-language
    * `size(filter(toks, ...))` form is 4-5× slower at scale:
    * interpreted higher-order functions don't CSE, so |langs| filter
    * passes each re-tokenize the document (measured 13.8 s → 2.9 s
    * for 50k sf1 docs, `graft.Profile --langid`; the explode+agg
    * variant is marginally faster still but buys a shuffle the
    * per-row form doesn't need at 100 TB). Same no-CSE rule is why
    * the fold result is bound ONCE via a single-element `transform`
    * lambda — referencing it from each branch of the argmax would
    * re-run the fold per reference.
    */
  def langId(text: Column, langs: Seq[String] = Seq("en", "de", "es", "fr")): Column = {
    // native one-pass twin of the interpreted fold
    // aggregate(bpeishTokens(text), zeros, acc + isin(...)) — same
    // token stream (BpeishTokens.tokenize), same integers, hash-set
    // membership instead of langs x |stopwords| comparisons per token
    // (the fold measured 18.6 s/corpus pass at sf10; see
    // graft.plans.StopwordCounts)
    val hits = graft.plans.StopwordCounts(text, langs.map(stopwords))
    // argmax by (score, lang desc): array_max on structs compares
    // fields in order. Zero evidence (number-only / punctuation-only
    // docs: every score 0) is all-tied — null, not a confident argmax
    // of nothing. Null text is guarded OUTSIDE (CaseWhen evaluates
    // lazily, so the count never runs on null docs — and array_max
    // would otherwise tie-break purely on the lang string, confidently
    // labeling null docs with the lexicographically-last language).
    // `hits` is BOUND ONCE as the transform lambda's variable: the
    // per-language scores reference the bound array, so the tokenize
    // runs once per row regardless of how CSE treats the repeated
    // subtree (measured: the unbound 4x get(hits, i) form re-ran the
    // count per language — 12.1 vs 5.6 s at sf10).
    val pick = get(transform(array(hits), h => {
      val best = array_max(array(langs.zipWithIndex.map {
        case (l, i) => struct(get(h, lit(i)).as("score"), lit(l).as("lang"))
      }: _*))
      when(best.getField("score") === 0, lit(null).cast("string"))
        .otherwise(best.getField("lang"))
    }), lit(0))
    when(text.isNull, lit(null).cast("string")).otherwise(pick)
  }

  /** Content fingerprint: MD5 of whitespace-normalized lowercase text
    * — the exact-dedup key. (A polynomial rolling hash is provided in
    * [[Dedup.simhash64]]'s helper for shingling; MD5 here keeps the
    * fingerprint portable across engines.)
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Unicode NFC normalization (native codegen'd expression with an
    * ASCII fast path — [[graft.plans.UnicodeNormalize]]): composes
    * decomposed sequences ("e" + U+0301 → "é") so byte-level dedup
    * and fingerprinting see one representation per grapheme. Other
    * forms via `UnicodeNormalize(text, "NFKC")` etc.
    */
  def nfc(text: Column): Column =
    graft.plans.UnicodeNormalize(text, "NFC")

  /** Hashed bag-of-tokens embedding (the fastText/feature-hashing
    * trick): bucket = md5-derived hash of the token mod `dim`,
    * value = token count, L2-normalized — a deterministic,
    * model-free text vector that feeds the ENTIRE embedding stack
    * (cosine top-k, ANN, SemDeDup) with no model runtime in the
    * container. md5 (not xxhash) keys the buckets so the vector is
    * engine-portable and the operator oracle-checkable; hashing is
    * per-token, so the cost is one explode + two exchanges (token
    * counts per (doc, bucket), then the per-doc assembly — the
    * [[graft.functions.Similarity.labelPrototypes]] idiom). Docs
    * with no tokens emit the zero vector (cosine guards zero norms
    * downstream).
    */
  def hashEmbedding(df: DataFrame, id: Column, text: Column,
                    dim: Int = 64, seed: Long = 42L): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val toks = df.select(id.as("doc_id"), tokens(text).as("tks"))
      .select(col("doc_id"), explode_outer(col("tks")).as("tk"))
    val bucket = (conv(substring(md5(concat(col("tk"), lit(s":$seed"))),
      1, 8), 16, 10).cast("long") % dim).cast("int")
    toks
      .select(col("doc_id"), bucket.as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(count(col("b")).as("c"))
      .groupBy(col("doc_id"))
      // explode_outer keeps token-less docs as one null-bucket row
      // (they must emit the ZERO vector, not vanish); the null entry
      // is filtered before map_from_entries, which rejects null keys
      .agg(map_from_entries(
        filter(collect_list(struct(col("b"), col("c"))),
          e => e.getField("b").isNotNull)).as("m"))
      .select(col("doc_id"), transform(sequence(lit(0), lit(dim - 1)),
        i => coalesce(element_at(col("m"), i), lit(0L)).cast("double"))
        .as("raw"))
      .select(col("doc_id"),
        sqrt(aggregate(col("raw"), lit(0.0), (a, x) => a + x * x))
          .as("nrm"), col("raw"))
      .select(col("doc_id"), when(col("nrm") === 0.0, col("raw"))
        .otherwise(transform(col("raw"), x => x / col("nrm")))
        .as("embedding"))
  }

  /** HTML boilerplate stripping — the extraction step between a raw
    * crawl and every text operator in this module: drop script/style
    * blocks wholesale (their content is code, not prose), drop
    * comments, drop tags, decode the basic entities (`&amp;` LAST,
    * so `&amp;lt;` correctly yields the literal `&lt;`), squash
    * whitespace. Deliberately regex-engine-portable: no
    * backreferences, no lookaround — the same patterns run under
    * Java regex and RE2, which is what makes the operator
    * oracle-checkable.
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
        "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** URL canonicalization — the dedup key for crawl frontiers and
    * source-level dedup, where `HTTP://Example.COM:80/a?b=2&a=1#x`
    * and `http://example.com/a?a=1&b=2` are the same resource:
    * lowercase scheme and host, strip the scheme's default port
    * (80/443), drop the fragment, sort query parameters, and root an
    * empty path at `/`. Pure composable built-ins (regexp_extract /
    * array_sort / split), engine-portable by construction — both
    * engines return '' for a no-match extract, which the CASE logic
    * leans on. Non-URL strings (no scheme) canonicalize to
    * `://<empty-host>/...` degenerately rather than erroring — gate
    * upstream if the column may hold junk.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = lower(regexp_extract(hostPort, "^([^:]*)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val normPath = when(path === "", lit("/")).otherwise(path)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val sortedQ = when(query === "", lit(""))
      .otherwise(concat(lit("?"),
        array_join(array_sort(split(query, "&")), "&")))
    concat(scheme, lit("://"), host, keepPort, normPath, sortedQ)
  }

  /** Canonical text for dedup keying: NFC, lowercase, whitespace
    * runs squashed, trimmed — [[fingerprint]]'s normalization with
    * the Unicode step a real crawl needs in front of it. Use
    * `md5(canonicalText(...))` as the cross-representation exact-dup
    * key.
    */
  def canonicalText(text: Column): Column =
    trim(regexp_replace(lower(nfc(text)), "\\s+", " "))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken's local
    * document fingerprinting, the standard overlap/decontamination
    * probe): hash every k-token shingle, slide a window of `w`
    * consecutive hashes, keep each window's minimum — any shared
    * substring of at least w+k-1 tokens between two docs is
    * guaranteed to share a fingerprint, while only ~2/(w+1) of
    * hashes are kept.
    *
    * Returns distinct (doc_id, fp). The hash is the first 16 hex
    * chars of md5(shingle) compared lexicographically — portable
    * across engines, so the whole operator is oracle-checkable.
    * Docs with fewer than w shingles emit the minimum over what they
    * have (winnowing's every-doc-has-a-fingerprint guarantee).
    *
    * Scale shape: explode + one partition-local window over
    * (doc, position) + distinct — one hash exchange on the doc id
    * (reused by the window), one on the output pair for the
    * distinct; no self-joins, no per-doc arrays.
    */
  def winnowingFingerprints(df: DataFrame, id: Column, text: Column,
                            shingleN: Int = 3, window: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 1, s"window must be >= 1, got $window")
    // null text yields no fingerprints (the oracle's NULL shingle
    // list propagates to a NULL print; dropping the row keeps both
    // engines agreeing instead of fingerprinting md5("")). The same
    // applies to WHITESPACE-ONLY text: token-free docs shingle to
    // [""], so two blank docs would otherwise share the md5("")
    // fingerprint and contaminationReport would flag a blank test
    // doc as 100% contaminated by any blank train doc.
    // (token-emptiness via the tokenizer itself — trim() strips only
    // spaces, not \n\t)
    val inv = df.filter(text.isNotNull && size(tokens(text)) > 0)
      .repartition(id)
      .select(id.as("doc_id"),
        posexplode(Dedup.shinglesRaw(text, shingleN)))
      .toDF("doc_id", "pos", "s")
      .select(col("doc_id"), col("pos"),
        substring(md5(col("s")), 1, 16).as("h"),
        count(lit(1)).over(Window.partitionBy(col("doc_id"))).as("n_sh"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(window - 1), 0)
    inv.select(col("doc_id"), col("pos"), col("n_sh"),
        min(col("h")).over(win).as("fp"))
      // complete windows only — except short docs, whose last row's
      // window spans the whole doc
      .filter(col("pos") >= window - 1 ||
        (col("n_sh") < window && col("pos") === col("n_sh") - 1))
      .select(col("doc_id"), col("fp"))
      .distinct()
  }

  /** Test-set decontamination report: for every doc of `test`, the
    * fraction of its winnowing fingerprints that also occur anywhere
    * in `train` — the standard contamination probe (a test doc
    * sharing a ≥ w+k-1-token run with any training doc shares a
    * fingerprint, by winnowing's guarantee). Output per test doc:
    * (doc_id, n_prints, n_shared, overlap, contaminated).
    *
    * Scale shape: both corpora fingerprint independently (winnowing
    * is explode + one partition-local window), the train side
    * collapses to a DISTINCT fingerprint set (16-char hex — tiny
    * next to the corpus), and one hash join on the fingerprint +
    * per-doc count finishes it. No doc-to-doc pair table — at 100 TB
    * the contaminated-pair listing is the follow-up query on the
    * flagged docs, not the bulk path.
    */
  def contaminationReport(test: DataFrame, testId: Column, testText: Column,
                          train: DataFrame, trainId: Column, trainText: Column,
                          shingleN: Int = 3, window: Int = 4,
                          threshold: Double = 0.5): DataFrame = {
    val tf = winnowingFingerprints(test, testId, testText, shingleN, window)
    val rf = winnowingFingerprints(train, trainId, trainText, shingleN, window)
      .select(col("fp")).distinct()
      .withColumn("__hit", lit(1))
    tf.join(rf, Seq("fp"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_prints"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_shared"))
      .withColumn("overlap",
        round(col("n_shared").cast("double") / col("n_prints"), 4))
      .withColumn("contaminated", col("overlap") >= threshold)
  }

  /** The unigram half of [[repetitionReport]] — (doc_id, n_tokens,
    * dup_token_frac, dup_token_char_frac, __tok_chars). Public as
    * [[tokenDupStats]] (without the internal chars column) for
    * pipelines that filter on token duplication alone: the n-gram
    * arg-max branch costs a second explode + window, and an inner
    * join keeps Catalyst from pruning it when unused.
    */
  private def tokenDupPerDoc(base: DataFrame): DataFrame = {
    // every output is a pure per-row function of the token array, so
    // this is ONE native scan (plans.TokenStats), not the legacy
    // explode + groupBy(doc, token-text) + groupBy(doc) that shuffled
    // the corpus twice (q_curation's dominant cost at sf10). The
    // four field references are unconditional projections of one
    // deterministic subtree — codegen CSE computes TokenStats once
    // per row (the qualityMetrics idiom; HOF contexts would defeat
    // it, see langId's bound-once note). Identities, exact:
    // dup_token_frac = (Σc - #distinct)/Σc = (n_tokens - n_distinct)
    // / n_tokens; dup_token_char_frac = Σ(c-1)·l / Σc·l =
    // (tok_chars - distinct_chars)/tok_chars. The filter runs on the
    // materialized attribute, after the projection, so it cannot
    // re-evaluate the scan; zero-token docs drop exactly like rows
    // that never left the legacy explode.
    val ts = graft.plans.TokenStats(col("__text"))
    base.select(col("doc_id"),
        ts.getField("n_tokens").as("n_tokens"),
        // greatest(,1) guards ANSI divide-by-zero on the zero-token
        // rows this projection still sees (the filter below drops
        // them); for every surviving row the denominators are >= 1,
        // so the values are untouched
        round((ts.getField("n_tokens") - ts.getField("n_distinct"))
          .cast("double") / greatest(ts.getField("n_tokens"), lit(1L)), 4)
          .as("dup_token_frac"),
        round((ts.getField("tok_chars") - ts.getField("distinct_chars"))
          .cast("double") / greatest(ts.getField("tok_chars"), lit(1L)), 4)
          .as("dup_token_char_frac"),
        ts.getField("tok_chars").as("__tok_chars"))
      .filter(col("n_tokens") > 0)
  }

  /** Token-duplication stats only (no n-gram pass): the cheap
    * repetition pre-filter. Same rows/semantics as the matching
    * columns of [[repetitionReport]].
    */
  def tokenDupStats(df: DataFrame, id: Column, text: Column): DataFrame =
    tokenDupPerDoc(df.filter(text.isNotNull)
      .select(id.as("doc_id"), text.as("__text")))
      .drop("__tok_chars")

  /** Per-document repetition metrics — the Gopher-style "repetitious
    * text" pre-filter of LLM data pipelines (docs dominated by a few
    * repeated tokens/n-grams are low-quality boilerplate or spam).
    * Output per doc:
    *  - `n_tokens` — whitespace-token occurrences;
    *  - `dup_token_frac` — fraction of token occurrences beyond the
    *    first occurrence of each distinct token;
    *  - `dup_token_char_frac` — same fraction weighted by token
    *    length (chars in repeat occurrences / chars in all
    *    occurrences; whitespace excluded from both sides);
    *  - `top_ngram`, `top_ngram_cnt`, `top_ngram_frac` — the most
    *    frequent word n-gram (ties broken toward the
    *    lexicographically larger gram, so the arg-max is
    *    deterministic and engine-portable), its occurrence count,
    *    and the fraction of token characters its occurrences cover
    *    (overlapping occurrences counted independently — the
    *    standard cheap approximation).
    *
    * Docs with null text or no tokens are excluded (no denominators).
    *
    * Scale shape: two explodes (tokens, shingles) each followed by a
    * key-partitioned groupBy on (doc, term) then (doc) — no per-doc
    * arrays survive past the row they came from, no driver state, no
    * self-joins; the n-gram arg-max is one partition-local window
    * over the (doc, gram) counts. All fractions round(,4) for
    * cross-engine compare.
    */
  def repetitionReport(df: DataFrame, id: Column, text: Column,
                       n: Int = 2): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // one projection over the corpus: every column — the unigram
    // stats AND the top n-gram — is a per-row function of the text
    // (plans.TokenStats, plans.TopGram), so the legacy pipeline's
    // two corpus-text shuffles (explode + groupBy(doc, gram) +
    // window argmax, then the perDoc⋈top join) are gone entirely.
    // The gram pick keeps the legacy tie-break (count desc, gram
    // binary-desc) inside the expression; zero-token docs drop on
    // the materialized attribute exactly like rows that never left
    // the legacy explode.
    val base = df.filter(text.isNotNull)
      .select(id.as("doc_id"), text.as("__text"))
    val ts = graft.plans.TokenStats(col("__text"))
    val tg = graft.plans.TopGram(col("__text"), n)
    base.select(col("doc_id"),
        ts.getField("n_tokens").as("n_tokens"),
        round((ts.getField("n_tokens") - ts.getField("n_distinct"))
          .cast("double") / greatest(ts.getField("n_tokens"), lit(1L)), 4)
          .as("dup_token_frac"),
        round((ts.getField("tok_chars") - ts.getField("distinct_chars"))
          .cast("double") / greatest(ts.getField("tok_chars"), lit(1L)), 4)
          .as("dup_token_char_frac"),
        ts.getField("tok_chars").as("__tok_chars"),
        tg.getField("gram").as("top_ngram"),
        tg.getField("cnt").as("top_ngram_cnt"))
      .filter(col("n_tokens") > 0)
      .withColumn("top_ngram_frac",
        round(col("top_ngram_cnt") *
          length(translate(col("top_ngram"), " ", "")).cast("double") /
          col("__tok_chars"), 4))
      .drop("__tok_chars")
  }

  /** Split documents into overlapping token-window chunks — the
    * context-window preparation step of a training pipeline (chunk
    * `size` tokens, advance by `stride`; `size - stride` tokens of
    * overlap carry context across boundaries). Output per chunk:
    * (doc_id, chunk_id, n_tokens, chunk_text); chunk c covers tokens
    * [c·stride, c·stride + chunkSize), the last chunk may be short,
    * every token is covered by at least one chunk, and chunking
    * stops once a window reaches the end of the doc (no trailing
    * chunk fully contained in its predecessor — that would be
    * duplicated training data). Docs with null text or no tokens are
    * excluded.
    *
    * Scale shape: one `posexplode` over the per-doc chunk starts —
    * map-side only (no exchange); each chunk row slices the doc's
    * token array in the same stage, so nothing but the emitted
    * chunks survives. Per-doc token arrays live inside one row
    * transiently (the usual "a document fits in a row" contract —
    * same as every other text operator here).
    *
    * `carry` names document columns copied onto every chunk row
    * (language, source, …) — carrying beats re-joining the document
    * table onto the chunk output, which at corpus scale costs a
    * second scan plus a full chunk-side shuffle on doc_id.
    */
  def chunkByTokens(df: DataFrame, id: Column, text: Column,
                    chunkSize: Int, stride: Int,
                    carry: Seq[String] = Nil): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride (chunkSize $chunkSize)")
    // every name the implementation introduces at any point — a carry
    // column matching one would collide mid-plan with an ambiguous-
    // reference error far less clear than this require
    val reserved = Set("doc_id", "chunk_id", "n_tokens", "chunk_text",
      "__tk", "__n", "pos", "col")
    val clash = carry.filter(reserved)
    require(clash.isEmpty, s"carry columns collide with output: $clash")
    val base = df.filter(text.isNotNull)
      .select(id.as("doc_id") +: carry.map(col) :+ tokens(text).as("__tk"): _*)
      .filter(size(col("__tk")) > 0)
    // chunk count stops once a window reaches the end of the doc:
    // max(1, ceil((len - chunkSize) / stride) + 1). Emitting starts
    // all the way to len-1 would append trailing chunks fully
    // contained in their predecessor — duplicated training data.
    val nTok = size(col("__tk"))
    val nChunks = when(nTok <= chunkSize, lit(1)).otherwise(
      floor((nTok - lit(chunkSize) + lit(stride - 1))
        .cast("double") / stride).cast("int") + 1)
    base
      .select(col("doc_id") +: carry.map(col) :+ col("__tk") :+
        nTok.as("__n") :+
        posexplode(sequence(lit(0), (nChunks - 1) * stride, lit(stride))): _*)
      .select(col("doc_id") +: carry.map(col) :+
        col("pos").cast("long").as("chunk_id") :+
        least(lit(chunkSize), col("__n") - col("col"))
          .cast("long").as("n_tokens") :+
        concat_ws(" ", slice(col("__tk"), col("col") + 1, lit(chunkSize)))
          .as("chunk_text"): _*)
  }

  /** PII patterns — the regex subset shared by Java's engine and
    * RE2-family engines (no lookaround, no backrefs), so the scrub
    * is reproducible across execution engines. Order of application:
    * emails first (their local/domain parts contain dot-digit runs
    * an IP pattern could otherwise clip — the domain alternation
    * accepts a dotted-quad, so `root@10.0.0.1` is one email, not a
    * name plus an IP), then IPs, then phones.
    */
  // general-domain branch FIRST: alternation is leftmost-first in
  // both Java and RE2, so the dotted-quad branch leading would stop
  // the match after '1.2.3.4' in 'bob@1.2.3.4.example.org' and leave
  // the domain tail unredacted
  val emailRe =
    "[A-Za-z0-9._%+-]+@(?:[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|\\d{1,3}(?:\\.\\d{1,3}){3})"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** PII scrub — the redaction pass a training pipeline runs before
    * anything leaves the raw zone: replaces emails / IPv4s / US-style
    * phone numbers with typed placeholder tags and reports per-type
    * match counts (counted on the raw text, per pattern,
    * independently). Pure codegen'd column expressions — scan-speed,
    * shuffle-free, fuses into the reading stage at 100 TB.
    */
  def scrubPii(text: Column): Column = {
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")
    struct(
      scrubbed.as("clean"),
      regexp_count(text, lit(emailRe)).as("n_emails"),
      regexp_count(text, lit(ipv4Re)).as("n_ips"),
      regexp_count(text, lit(phoneRe)).as("n_phones"))
  }

  /** Per-language corpus stats — the report a pipeline operator runs
    * before/after filtering.
    */
  def corpusStats(df: DataFrame, lang: Column, text: Column): DataFrame =
    df.groupBy(lang.as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(text).cast("long")).as("n_tokens"),
        sum(length(text).cast("long")).as("n_chars"),
        round(sum(length(text)).cast("double") / count(lit(1)), 4).as("avg_chars"))

  /** Per-source dataset-card composition report — the table a
    * training-mix decision reads: document/token/char volume,
    * language spread, and the exact-duplicate rate inside each
    * source (1 − distinct(md5)/docs; a high rate flags a crawler
    * slice that needs dedup before it can be weighted).
    *
    * Scale shape (100 TB): text reduces to five narrow columns
    * (source, lang, 16-byte digest, two longs) BEFORE aggregation,
    * so the two distinct aggregates' Expand replicates small tuples
    * only — never text — and every replica partial-aggregates
    * map-side; one exchange on the source key.
    */
  def sourceReport(df: DataFrame, source: Column, lang: Column,
                   text: Column): DataFrame =
    df.select(source.as("source"), lang.as("lang"),
        md5(text).as("digest"),
        length(text).cast("long").as("nchars"),
        tokenCount(text).cast("long").as("ntok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("nchars")).as("total_chars"),
        sum(col("ntok")).as("total_tokens"),
        countDistinct(col("digest")).as("n_unique"),
        // dup_rate over COMPARABLE docs only: a null digest (null
        // text) is excluded from countDistinct but a bare count(*)
        // would include it — an all-null source would read as 100%
        // duplicated when it has zero comparable content (same rule
        // as Dedup.exactDupClasses). Zero comparable docs -> rate 0.
        round(coalesce(
          lit(1.0) - countDistinct(col("digest")).cast("double") /
            nullif(count(col("digest")), lit(0L)),
          lit(0.0)), 4).as("dup_rate"))

  /** Unigram language-model document scoring — the perplexity-bucket
    * quality signal of LLM data pipelines, with the model trained on
    * the corpus itself (self-scoring): P(t) = count(t)/total, score =
    * mean over the doc's tokens of ln P(token). Gibberish-heavy docs
    * (rare-token mass) score far below the corpus mode; boilerplate
    * scores above it. Returns (doc_id, n_tokens, avg_logprob) with
    * avg_logprob rounded to 4 decimals; token-free docs are absent.
    *
    * Scale shape (100 TB): two cascaded hash aggregations over the
    * exploded token stream — (doc, term) tf with map-side combine,
    * then term → corpus count over the already-collapsed tf relation;
    * the tf⋈count join shuffles count tables keyed by term, never
    * text; the grand total is a one-row broadcast. Per-doc scores are
    * a final doc-keyed aggregation of (tf · ln p) terms.
    *
    * Cross-engine determinism: each term's ln P is quantized to
    * integer MICRO-NATS (round(ln p · 1e6), a per-term scalar both
    * engines compute from identical (cnt, total) doubles), so the
    * per-document aggregation is an INTEGER sum — exact and
    * order-free under any partial-aggregation order or partitioning.
    * The earlier float-sum form could flip its 4th decimal when a
    * document's unrounded score sat ULPs from a rounding midpoint
    * and Spark's partial-agg order differed from the oracle's
    * single-pass order. The final 4-decimal rounding is ALSO integer:
    * round(sum/1e6/dl, 4) = round-half-away(sum / (100·dl)) / 1e4,
    * computed as (2·|sum| + 100·dl) div (200·dl) in exact BIGINT
    * arithmetic on both engines — Spark's BigDecimal-HALF_UP-on-the-
    * exact-binary-value and DuckDB's multiply-then-nearbyint round()
    * disagree when the quotient sits within an ULP of a .00005
    * midpoint, and the micro-nat quantization (spacing 1/(1e6·dl) ≈
    * the midpoint window) makes such landings common enough to bite
    * at 50k docs (one doc at sf1 — the flake class the integer sum
    * alone did not close). Residual risk is now only a per-term ln()
    * ULP landing exactly on a 0.5-micro-nat boundary (~1e-10 per
    * distinct term). Resolution loss is ≤ 5e-7 nat/token — invisible
    * at the 4-decimal output scale.
    */
  /** Interpolated bigram LM scoring — [[unigramLogProb]]'s fluency
    * upgrade: per doc, the average over positions 2..n of
    * ln(λ·c(w₁w₂)/c(w₁) + (1-λ)·c(w₂)/N), with counts from the whole
    * corpus (the self-scored quality signal real pipelines threshold
    * on; word-salad scores low under the bigram term even when its
    * unigrams are common). Docs with fewer than two tokens have no
    * bigram positions and are omitted.
    *
    * Same cross-engine determinism contract as [[unigramLogProb]]:
    * each position's ln P quantizes to integer micro-nats, per-doc
    * sums are exact integer aggregation, and the final 4-decimal
    * average is the exact-BIGINT div trick over n-1 positions. The
    * interpolation is evaluated in ONE fixed operation order —
    * λ·(cbg/cprev) + (1-λ)·(cw/N) — from identical integer-derived
    * doubles on both engines.
    *
    * Scale shape: bigram instances explode map-side from a
    * slice-zip (no self-join on position); counts are two hash aggs
    * (bigram, unigram) joined back by key; the grand total is a
    * one-row broadcast. Skewed stopword bigrams are just large count
    * rows — no group ever buffers instances. The output carries no
    * term text — only counts — so every token is hashed to its
    * 8-byte xxhash64 AT TOKENIZATION (the q_dup_spans /
    * sourceOverlap digest idiom): the two corpus-sized count
    * shuffles and the three count joins key on fixed-width longs
    * instead of variable-length strings (measured at sf10: the
    * text-keyed form shuffled the corpus's token text twice at
    * 153 s). A vocabulary-level xxhash64 collision would merge two
    * terms' counts — P ≈ V²/2⁶⁵, the same exposure the minhash
    * family documents — so both scorers run the collision SENTINEL
    * at vocabulary-build time by default ([[hashedVocabCollisions]]
    * must be zero, else they throw): the exposure is observable, not
    * just documented. TF-IDF needs no sentinel — its output carries
    * term TEXT, so its keys are never hashed.
    */
  /** Number of xxhash64 buckets holding MORE than one distinct token
    * of the corpus — the collision sentinel of the hashed-key LM
    * scorers. Zero means every hashed count key maps back to exactly
    * one term, so the scorers' counts are provably unmerged on THIS
    * corpus (the minhash family pins the same invariant on its
    * shingle hashes). One corpus tokenize pass plus a vocabulary-
    * sized distinct aggregate (map-side partial distinct keeps the
    * shuffle at per-partition-vocabulary mass, never corpus mass).
    */
  def hashedVocabCollisions(df: DataFrame, text: Column): Long =
    hashedVocabCollisions(df, text, t => xxhash64(t))

  // hash injectable so the spec can prove the DETECTION path with a
  // deliberately weak hash — two strings with equal xxhash64 are not
  // constructible on demand
  private[graft] def hashedVocabCollisions(
      df: DataFrame, text: Column, hash: Column => Column): Long =
    df.select(explode(bpeishTokens(text)).as("__t"))
      .groupBy(hash(col("__t")).as("__h"))
      .agg(countDistinct(col("__t")).as("__n"))
      .filter(col("__n") > 1)
      .count()

  /** Fails loud at vocabulary-build time when the 8-byte hashed keys
    * would merge distinct terms' counts: P ≈ V²/2⁶⁵ is negligible at
    * graded vocabularies but reaches ~3% for a billion-term corpus —
    * without a sentinel nothing would DETECT the merge and every
    * score would silently shift.
    */
  private[graft] def requireCollisionFreeVocab(
      op: String, df: DataFrame, text: Column, sentinel: Boolean,
      hash: Column => Column = t => xxhash64(t)): Unit =
    if (sentinel) {
      val c = hashedVocabCollisions(df, text, hash)
      if (c > 0) throw new IllegalStateException(
        s"$op: $c xxhash64 vocabulary collision(s) detected — distinct " +
          "tokens sharing an 8-byte hashed count key would merge their " +
          "counts and silently corrupt every score. Re-key the scorer " +
          "on term text for this corpus, or pass sentinel = false for " +
          "a deliberate run that accepts merged-count scores.")
    }

  def bigramLogProb(df: DataFrame, id: Column, text: Column,
                    lambda: Double = 0.7,
                    sentinel: Boolean = true): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0,
      s"lambda must be in (0, 1), got $lambda — 1 drops unseen-bigram " +
        "smoothing (ln 0), 0 degenerates to the unigram model")
    requireCollisionFreeVocab("bigramLogProb", df, text, sentinel)
    // the tokenize (split + per-token hash) is the plan's single most
    // expensive projection (measured 20.5 s/pass on the 500k-doc sf10
    // corpus as a regex chain) — fused into ONE native expression
    // (tokenize + xxhash64 per token, no interpreted transform HOF)
    // and PINNED so it runs exactly once (doc_id + hashed-token
    // array: the corpus's tokens at 8 bytes each, the same
    // block-storage trade as the minhash shingle pin)
    val toked = df.select(id.as("doc_id"),
      graft.plans.HashedBpeishTokens(text).as("tk"))
      .localCheckpoint()
    // unigram counts + total from EVERY tokenizable doc (corpus
    // stats), instances only from docs long enough to have bigrams.
    // The term-count table is PINNED (localCheckpoint — vocabulary-
    // sized, not corpus-sized): it feeds three consumers (the prev
    // join, the cur join, the grand total) and aliased subtrees
    // defeat exchange reuse, so unpinned each consumer would re-run
    // its input (measured 10 scans -> 4 on the graded plan before
    // the toked pin).
    // Same trade as the minhash shingle pin: eager execution at
    // DataFrame-construction time, lineage truncated to block
    // storage.
    val uni = toked.filter(size(col("tk")) > 0)
      .select(explode(col("tk")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("ucnt"))
      .localCheckpoint()
    val total = uni.agg(sum(col("ucnt")).as("total"))
    val inst = toked.filter(size(col("tk")) >= 2)
      .select(col("doc_id"), size(col("tk")).as("dl"),
        explode(arrays_zip(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1))).as("bg"))
      .select(col("doc_id"), col("dl"),
        col("bg.0").as("prev"), col("bg.1").as("cur"))
    // bf feeds two consumers (the cbg rollup and the scoring join) —
    // pinned so the explode + doc-local reduction runs once; the
    // rows are six fixed-width columns, ~40 B each
    val bf = inst.groupBy(col("doc_id"), col("dl"), col("prev"), col("cur"))
      .agg(count(lit(1)).as("bf"))
      .localCheckpoint()
    val cbg = bf.groupBy(col("prev"), col("cur"))
      .agg(sum(col("bf")).as("cbg"))
    val p = lit(lambda) *
        (col("cbg").cast("double") / col("cprev").cast("double")) +
      lit(1.0 - lambda) *
        (col("cw").cast("double") / col("total").cast("double"))
    val micro = sum(col("bf") *
      round(log(p) * lit(1e6), 0).cast("long")).cast("long")
    val np = col("dl").cast("long") - lit(1L)
    val q4 = call_function("div",
      lit(2L) * abs(col("__micro")) + lit(100L) * np, lit(200L) * np)
    bf.join(cbg, Seq("prev", "cur"))
      .join(uni.select(col("term").as("prev"), col("ucnt").as("cprev")),
        Seq("prev"))
      .join(uni.select(col("term").as("cur"), col("ucnt").as("cw")),
        Seq("cur"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"), col("dl"))
      .agg(micro.as("__micro"))
      .select(col("doc_id"), np.as("n_bigrams"),
        (when(col("__micro") < 0, -q4).otherwise(q4).cast("double") /
          lit(1e4)).as("avg_logprob"))
  }

  def unigramLogProb(df: DataFrame, id: Column, text: Column,
                     sentinel: Boolean = true): DataFrame = {
    requireCollisionFreeVocab("unigramLogProb", df, text, sentinel)
    // same two levers as [[bigramLogProb]] (measured there at sf10):
    // tokens hash to xxhash64 at tokenization (one fused native
    // expression — the output carries only counts, so every
    // shuffle/join keys on 8-byte longs) and the doc-term frequency
    // table is pinned because it feeds two consumers (the corpus
    // rollup and the scoring join); unpinned, each would re-run the
    // tokenize over the whole corpus
    val tf = df.select(id.as("doc_id"),
        graft.plans.HashedBpeishTokens(text).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), size(col("tk")).as("dl"),
        explode(col("tk")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val cnt = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val total = cnt.agg(sum(col("cnt")).as("total"))
    val micro = sum(col("tf") *
      round(log(col("cnt").cast("double") / col("total").cast("double"))
        * lit(1e6), 0).cast("long")).cast("long")
    val denom = lit(200L) * col("dl").cast("long")
    val q4 = call_function("div",
      lit(2L) * abs(col("__micro")) + lit(100L) * col("dl").cast("long"),
      denom)
    tf.join(cnt, "term")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"), col("dl"))
      .agg(micro.as("__micro"))
      .select(col("doc_id"), col("dl").cast("long").as("n_tokens"),
        (when(col("__micro") < 0, -q4).otherwise(q4).cast("double") /
          lit(1e4)).as("avg_logprob"))
  }
}
