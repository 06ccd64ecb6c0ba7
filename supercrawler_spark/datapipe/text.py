"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All four are pure Spark column expressions (whole-stage codegen, no Python),
so they scale linearly with the corpus and have exact ANSI-SQL twins for the
DuckDB oracle. Tokenization convention everywhere: lowercase, split on
whitespace runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["la", "el", "de", "que", "los"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "les", "des", "est", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],  # pinyin-ish markers
}

EN_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]

# lang_id's marker→index literal map requires globally unique markers
assert len({w for ws in LANG_MARKERS.values() for w in ws}) \
    == sum(len(ws) for ws in LANG_MARKERS.values()), \
    "LANG_MARKERS words must be unique across languages"


def tokens(col) -> Column:
    """Whitespace tokens of lowercased text (empty-string safe)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def token_count(col) -> Column:
    return F.size(tokens(col))


def bpe_ish_tokens(col) -> Column:
    """BPE-ish pre-tokenization: word pieces and individual punctuation
    marks (`[a-z0-9_]+|[^\\s a-z0-9_]`), the regex analog of a byte-pair
    tokenizer's pre-split — counts subword-boundary units rather than
    whitespace words. Pure JVM regexp (explicit ASCII classes so the Java
    and RE2 engines agree for the oracle)."""
    return F.regexp_extract_all(F.lower(col),
                                F.lit(r"[a-z0-9_]+|[^\sa-z0-9_]"), F.lit(0))


def bpe_token_count(col) -> Column:
    return F.size(bpe_ish_tokens(col))


ROLL_MOD = 2147483647   # 2^31 - 1 (prime); keeps acc*base + h inside int64
ROLL_BASE = 131


def rolling_fingerprint(col) -> Column:
    """Order-sensitive document fingerprint: a Rabin-Karp-style polynomial
    rolling hash folded over the token stream with a higher-order
    ``aggregate`` — one JVM pass, no Python, exact DuckDB twin via
    list_reduce. Unlike the normalization fingerprint (md5 of collapsed
    text) this is incremental: hash(doc + token) derives from hash(doc),
    the building block for streaming/shingle fingerprints."""
    from .dedup import md5_long  # local import; dedup imports this module
    toks = tokens(col)
    h = lambda t: md5_long(t) % F.lit(ROLL_MOD)  # noqa: E731
    return F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(ROLL_BASE) + h(t)) % F.lit(ROLL_MOD))


def _count_token(col, word: str) -> Column:
    """Occurrences of a whole token in lowercased text, via array filter
    (exact token match, not substring)."""
    return F.size(F.filter(tokens(col), lambda t: t == F.lit(word)))


def lang_score(col, lang: str) -> Column:
    """Marker-stopword hit count for one language."""
    markers = LANG_MARKERS[lang]
    expr = F.lit(0)
    for w in markers:
        expr = expr + _count_token(col, w)
    return expr


def lang_id(col) -> Column:
    """Highest-scoring marker language; 'und' when no marker hits.
    Deterministic tie-break: language name ascending.

    Single pass: ONE tokens() array, mapped token→lang-index through a
    literal marker map, nulls (non-markers, the vast majority) filtered
    out BEFORE the counting aggregate — so the 5-wide accumulator rebuild
    runs only on marker hits, not on every token. (Earlier forms measured:
    one filter(tokens(...)) per marker re-derives the split 25x via
    CollapseProject ~3x slower; a 25-when accumulator over ALL tokens
    pays the array rebuild per token.)"""
    langs = sorted(LANG_MARKERS)
    # markers are unique across languages (asserted at import below)
    marker_idx = F.create_map(*[
        lit for i, lang in enumerate(langs)
        for w in LANG_MARKERS[lang] for lit in (F.lit(w), F.lit(i))])
    hits = F.filter(
        F.transform(tokens(col), lambda t: F.element_at(marker_idx, t)),
        lambda x: x.isNotNull())

    def step(acc, idx):
        return F.transform(
            acc, lambda c, j: F.when(j == idx, c + 1).otherwise(c))

    def pick(counts):
        # argmax INSIDE the aggregate's finish lambda: `counts` is a
        # lambda variable (a cheap leaf), so the ~2x-per-language
        # references below don't each duplicate the whole map+filter+
        # aggregate subtree in the expression tree the way a Column
        # reference would (r6: the duplicated form carried ~10 copies of
        # the 50-literal marker map — guide §7.3 "gigantic expression
        # trees"). Same comparisons, same tie-break, same result.
        best = F.lit(langs[0])
        best_score = counts[0]
        for i, lang in enumerate(langs[1:], start=1):
            cond = counts[i] > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, counts[i]).otherwise(best_score)
        return F.when(best_score > 0, best).otherwise(F.lit("und"))

    return F.aggregate(hits, F.array(*[F.lit(0)] * len(langs)), step, pick)


def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Length/punctuation/stopword-ratio quality features + a composite
    score in [0,1] (the usual crawl-corpus quality gate)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count(t)
    # one token-array traversal for all stopword hits (see lang_id note);
    # size(filter(isin)) short-circuits per token instead of folding a
    # 10-when sum through an accumulator
    stop_hits = F.size(F.filter(
        tokens(t), lambda tok: tok.isin(*EN_STOPWORDS)))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    stop_ratio = F.round(stop_hits / F.greatest(n_tok, F.lit(1)).cast("double"), 4)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)).cast("double"), 4)
    upper_ratio = F.round(n_upper / F.greatest(n_chars, F.lit(1)).cast("double"), 4)
    mean_tok_len = F.round(
        F.length(F.regexp_replace(t, r"\s+", "")) /
        F.greatest(n_tok, F.lit(1)).cast("double"), 4)
    # composite: in-range token length, some stopwords, low punct/upper noise
    score = (
        F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio < 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(upper_ratio < 0.3, F.lit(0.1)).otherwise(F.lit(0.0)))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_q"),
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        upper_ratio.alias("upper_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        F.round(score, 4).alias("quality_score"),
    )


def fingerprint(col) -> Column:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed, trimmed text — exact-dup detection that survives
    formatting noise."""
    normalized = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(normalized)


# -- PII scrubbing (crawl-corpus redaction gate) ------------------------------
# RE2-compatible patterns (no lookaround) so the Java engine and an ANSI-SQL
# oracle (DuckDB/RE2) match byte-for-byte
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9][0-9 ()\-]{6,14}[0-9]"


def pii_counts(col) -> tuple[Column, Column, Column]:
    """(n_emails, n_ipv4, n_phones) match counts — JVM regexp only."""
    return (F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL), F.lit(0))),
            F.size(F.regexp_extract_all(col, F.lit(PII_IPV4), F.lit(0))),
            F.size(F.regexp_extract_all(col, F.lit(PII_PHONE), F.lit(0))))


def redact_pii(col) -> Column:
    """Replace emails / IPv4 addresses / international phone numbers with
    typed placeholder tokens — the standard pre-training redaction pass.
    Order matters: emails first (an email never contains an IP-shaped
    host after redaction), then IPs, then phones."""
    out = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


def repetition_ratio(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Gopher-style repetition signal: the frequency share of the MOST
    repeated word n-gram (max n-gram count / total n-gram count). Boiler-
    plate and templated spam score high; clean prose scores ~1/#ngrams.
    One exploded two-level aggregation (count per (doc, gram) → max+sum
    per doc), all JVM; docs with fewer than n tokens score 0.0."""
    from .dedup import shingles_of_tokens

    sh = (df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
          .select(F.col(id_col),
                  F.explode_outer(shingles_of_tokens(F.col("_toks"), n))
                  .alias("gram")))
    counts = sh.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    agg = counts.groupBy(id_col).agg(
        F.max(F.when(F.col("gram").isNotNull(), F.col("c"))).alias("mx"),
        F.sum(F.when(F.col("gram").isNotNull(), F.col("c"))
              .otherwise(F.lit(0))).alias("tot"))
    ratio = F.when(F.col("tot") > 0,
                   F.round(F.col("mx") / F.col("tot").cast("double"), 4)) \
             .otherwise(F.lit(0.0))
    return agg.select(F.col(id_col), F.col("tot").alias("n_ngrams"),
                      ratio.alias("repetition_ratio"))


def unigram_logprob_score(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          round_to: int = 4) -> DataFrame:
    """CCNet-style perplexity proxy: score each document by the mean
    negative log-probability of its tokens under the CORPUS unigram
    distribution — high scores = rare-token-heavy documents (gibberish,
    boilerplate tables, non-language), low scores = common fluent text.
    Classic pretraining-quality signal when no LM is available.

    Two-pass corpus-global shape: one exploded aggregation builds the
    unigram counts, the token stream rejoins it on the token key (shuffle
    on token — at web scale the vocabulary is too large to broadcast),
    then a per-doc mean. All JVM; exact ANSI-SQL twin in
    __spark_entry__.oracle_sql. Token-less docs score NULL with n_tok 0."""
    toks = df.select(F.col(id_col),
                     F.explode_outer(tokens(F.col(text_col))).alias("tok"))
    # materialize the vocabulary once: the scalar total below executes the
    # full explode+groupBy, and without this the scored join would run the
    # identical aggregation a second time (the dominant cost at corpus
    # scale)
    freq = (toks.filter(F.col("tok").isNotNull())
                .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
                .localCheckpoint(eager=True))
    total = freq.agg(F.sum("cnt").alias("t")).first()["t"]
    total = int(total) if total is not None else 0
    scored = (toks.join(freq, "tok", "left")
              .groupBy(id_col)
              .agg(F.round(-F.avg(F.log(F.col("cnt")
                                        / F.lit(float(max(total, 1))))),
                           round_to).alias("avg_neg_logp"),
                   F.count(F.col("tok")).alias("n_tok")))
    return scored.select(id_col, "avg_neg_logp", "n_tok")
