"""Text-analysis operators for training-data pipelines.

None of these exist in the reference (its text handling stops at label
formatting); they are the 100 TB-pipeline extensions required by the
build spec: language-ID, quality scoring, token counting, document
fingerprinting. Everything is built-in-function only (JVM, codegen) —
no Python in the hot path, so a 100 TB documents table streams through
scan→project with zero shuffles.
"""

from __future__ import annotations

# Module-level on purpose: pandas_udf resolves the 'pd.Series' type
# hints of the BPE merge/segment UDFs through this module's globals
# (same constraint documented in operators/similarity.py).
import pandas as pd  # noqa: F401

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish tokenizer regex: runs of letters, runs of digits, or a single
# non-space symbol — the standard pre-tokenization split used before BPE.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword anchors (kept for stopword_ratio consumers).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "que", "es"],
}

# Character-trigram profiles (classic Cavnar–Trenkle-style top-trigram
# anchors, ASCII-only so the regex scan is byte-for-byte identical in
# Spark's Java regex and DuckDB's RE2: same-length alternatives make the
# non-overlapping scan engine-independent). Spaces encoded as \s in the
# compiled pattern.
LANG_TRIGRAM_PROFILES: dict[str, list[str]] = {
    "en": [" th", "the", "he ", "ed ", "ing", "ng ", " an", "and", "nd ",
           " of", "of ", " to", "to ", "er ", " in", " a ", "at "],
    "de": ["der", "ein", "ich", "sch", "die", "und", "ung", "cht",
           " ge", "gen", "ber", " zu"],
    "fr": ["ent", " le", "le ", "les", " et", "et ", "que", " qu",
           "ait", "ons", "eur", "oir"],
    "es": ["os ", "los", " el", "el ", "que", " qu", "ión", "ado",
           " es", "sta", "nte", "ara"],
}

# Han-script ratio stands in for a zh trigram profile: CJK text is
# identified by codepoint range, not latin trigrams.
CJK_CHAR_CLASS = "[" + chr(0x4E00) + "-" + chr(0x9FFF) + "]"


def trigram_pattern(grams: list[str]) -> str:
    return "|".join(g.replace(" ", r"\s") for g in grams)


def words(text: Column) -> Column:
    """Whitespace tokenization → ARRAY<STRING>, empties dropped."""
    return F.filter(
        F.transform(F.split(F.trim(text), r"\s+"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def word_count(text: Column) -> Column:
    return F.size(words(text))


def token_count(text: Column) -> Column:
    """BPE-ish token count via the pre-tokenization regex."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[.,!?;:]"), F.lit(0)))


def stopword_ratio(text: Column, markers: list[str]) -> Column:
    """Fraction of words that are marker stopwords (single pass regex)."""
    pat = r"\b(" + "|".join(markers) + r")\b"
    hits = F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))
    n = word_count(text)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_features(text: Column) -> list[Column]:
    """Quality-scoring feature set: word count, BPE-ish token count,
    punctuation count, mean word length. Aliased for direct select()."""
    n_words = word_count(text)
    return [
        n_words.alias("n_words"),
        token_count(text).alias("n_tokens"),
        punct_count(text).alias("n_punct"),
        F.when(
            n_words > 0, F.length(F.regexp_replace(text, r"\s+", "")).cast("double") / n_words
        )
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
    ]


def trigram_score(text: Column, grams: list[str]) -> Column:
    """Fraction of trigram positions hit by a language's profile: count
    of non-overlapping profile-trigram matches over (char_len - 2).
    Builtin-only — one regexp scan per language, zero shuffles."""
    hits = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(trigram_pattern(grams)), F.lit(0))
    )
    return hits.cast("double") / F.greatest(F.length(text) - 2, F.lit(1))


def cjk_score(text: Column) -> Column:
    hits = F.size(F.regexp_extract_all(text, F.lit(CJK_CHAR_CLASS), F.lit(0)))
    return hits.cast("double") / F.greatest(F.length(text) - 2, F.lit(1))


def lang_id(text: Column, threshold: float = 0.02) -> Column:
    """Character-n-gram language ID: each language scores the density of
    its profile trigrams (Han-codepoint density for zh); the argmax wins
    if above threshold, else 'und'. Deterministic tie-break: array_max
    over (score, lang) structs ties to the lexicographically largest
    code — the oracle replays this with ORDER BY score DESC, lang DESC."""
    scored = F.array(
        *[
            F.struct(
                trigram_score(text, grams).alias("score"), F.lit(lang).alias("lang")
            )
            for lang, grams in LANG_TRIGRAM_PROFILES.items()
        ],
        F.struct(cjk_score(text).alias("score"), F.lit("zh").alias("lang")),
    )
    best = F.array_max(scored)
    return F.when(best["score"] >= threshold, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of case-folded, whitespace-collapsed
    text. Stable across engines (both Spark and DuckDB emit lowercase
    hex md5), so near-identical formatting variants collide."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def heavy_hitters(df: DataFrame, text_col: str, top_n: int = 25) -> DataFrame:
    """Corpus-wide top-N token frequencies — the vocabulary census a
    tokenizer-training or stopword-mining pass starts from.

    Plan shape at 100 TB: explode(words) is a per-row projection; the
    count groupBy gets a map-side partial aggregation (the token key
    space is Zipfian, so partials collapse most of the volume before
    the shuffle); the final top-N plans as TakeOrderedAndProject, never
    a global sort. Ties break on the token string so the result is a
    total order both engines agree on."""
    toks = df.select(
        F.explode(words(F.lower(F.col(text_col)))).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(top_n)
    )


def _plain_words(text: Column) -> Column:
    """Lambda-free lowercase word array (safe to reference inside other
    higher-order-function lambdas — see shingles() in dedup.py for the
    Catalyst nested-lambda mis-binding this avoids). array_remove (not
    F.filter + lambda, which would break the lambda-free contract)
    drops the [''] that split yields on empty/whitespace-only text, so
    n_words is 0 there — matching the oracles' list_filter(x <> '')."""
    return F.array_remove(F.split(F.trim(F.lower(text)), r"\s+"), "")


def _dup_ngram_frac(w: Column, n: int) -> Column:
    """Fraction of word n-grams that are duplicates of an earlier one:
    1 - distinct/total. Pure array ops — per-row, zero shuffle."""
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total,
    ).otherwise(F.lit(0.0))


def repetition_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dup_2gram: float = 0.2,
    max_dup_3gram: float = 0.18,
) -> DataFrame:
    """Gopher-style repetition quality filter (Rae et al. 2021 §A1.1):
    documents dominated by repeated n-grams are boilerplate/spam-like
    and get keep=0. Computed entirely with array builtins per row —
    at 100 TB this is a map-only scan, no shuffle, no Python."""
    w = _plain_words(F.col(text_col))
    d2 = _dup_ngram_frac(w, 2)
    d3 = _dup_ngram_frac(w, 3)
    return df.select(
        F.col(id_col),
        F.size(w).alias("n_words"),
        d2.alias("dup_2gram_frac"),
        d3.alias("dup_3gram_frac"),
        ((d2 <= max_dup_2gram) & (d3 <= max_dup_3gram)).cast("int").alias("keep"),
    )


# PII patterns: ASCII-conservative so Java regex (Spark) and RE2
# (DuckDB) agree byte-for-byte — no backreferences, no lookaround.
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_REGEX = r"https?://[^\s]+"
PHONE_REGEX = r"[+(]?[0-9][0-9()\s-]{7,}[0-9]"


def pii_counts(text: Column) -> list[Column]:
    return [
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_REGEX), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(URL_REGEX), F.lit(0))).alias("n_urls"),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_REGEX), F.lit(0))).alias("n_phones"),
    ]


def pii_redact(text: Column) -> Column:
    """Scrub emails, then URLs, then phone-like digit runs (order
    matters: the earlier replacements cannot create later matches —
    the placeholder tokens contain no digits or '@'). Map-only."""
    out = F.regexp_replace(text, EMAIL_REGEX, "<EMAIL>")
    out = F.regexp_replace(out, URL_REGEX, "<URL>")
    return F.regexp_replace(out, PHONE_REGEX, "<PHONE>")


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 64,
    stride: int = 56,
) -> DataFrame:
    """Sliding-window document chunking (context-window preparation:
    fixed-size word chunks with chunk_size - stride words of overlap).
    The chunk list is built per row with array builtins and exploded —
    map-only, no shuffle; at 100 TB the chunker is pure scan
    throughput. Returns (id, chunk_idx, n_words, chunk_text)."""
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(w), F.lit(1)), F.lit(stride)
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.least(F.lit(chunk_size), F.size(w) - s + 1).alias("n_words"),
            F.concat_ws(" ", F.slice(w, s, chunk_size)).alias("chunk_text"),
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("pos", "c")
    ).select(
        F.col(id_col),
        (F.col("pos") + 1).cast("int").alias("chunk_idx"),
        F.col("c.n_words").cast("int").alias("n_words"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    n_col: str,
    budget: int = 512,
) -> DataFrame:
    """Concat-and-cut sequence packing (the standard pretraining
    packing: concatenate documents in a deterministic order, cut at
    every `budget` tokens). Each doc's placement is its exclusive
    running-sum offset; bin_first/bin_last are the cut intervals it
    lands in (straddling docs span two).

    Scale shape: the running sum is windowed PER GROUP (shard), never a
    global single-partition window — the packing any 1000-executor run
    does shard-locally. One shuffle on the group key."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(n_col).over(w), F.lit(0)).cast("bigint")
    return df.select(
        F.col(group_col),
        F.col(order_col),
        F.col(n_col).cast("int").alias("n_words"),
        start.alias("start_offset"),
        F.floor(start / budget).cast("int").alias("bin_first"),
        F.floor((start + F.col(n_col) - 1) / budget).cast("int").alias("bin_last"),
    )


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 10
) -> list[tuple[str, str, int]]:
    """Train byte-pair-encoding merges on a corpus - tokenizer
    induction, the step every LLM pipeline runs once per corpus. BPE is
    INHERENTLY sequential in its merge ranks (merge r+1's pair counts
    depend on merge r having been applied), so the structure is
    n_merges driver-coordinated rounds; what distributes is the
    expensive part of each round, exactly as in production trainers:

    - the corpus collapses ONCE to a (word, freq) table - pair counting
      then costs O(|vocab|), not O(|corpus|), the standard trick that
      makes BPE train on terabytes;
    - per round, adjacent-pair counts are a JVM-side explode/aggregate
      over that table (freq-weighted zip of toks with its own tail -
      no Python in the counting path);
    - only the single winning pair (max count, lexicographic tiebreak
      -> fully deterministic) returns to the driver;
    - the merge applies with one Arrow-batched pandas UDF (greedy
      leftmost non-overlapping - sequential-scan semantics a window
      function can't express; the documented 'builtins genuinely
      cannot' case, same class as the collation key).

    Returns [(left, right, count), ...] in merge order.
    """
    from pyspark.sql.functions import pandas_udf

    vocab = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("freq", F.filter(F.split("w", ""), lambda t: t != "").alias("toks"))
        .localCheckpoint(eager=True)
    )

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice("toks", 1, F.size("toks") - 1),
                        F.slice("toks", 2, F.size("toks") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["cnt"] < 2:
            break
        left, right, cnt = pairs[0]["l"], pairs[0]["r"], int(pairs[0]["cnt"])
        merges.append((left, right, cnt))

        @pandas_udf("array<string>")
        def merge_pair(toks: pd.Series) -> pd.Series:
            out = []
            for t in toks:
                res, i, n = [], 0, len(t)
                while i < n:
                    if i + 1 < n and t[i] == left and t[i + 1] == right:
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(t[i])
                        i += 1
                out.append(res)
            return pd.Series(out)

        vocab = vocab.withColumn("toks", merge_pair("toks")).localCheckpoint(
            eager=True
        )
    return merges


def bpe_segment_udf(merges: list[tuple[str, str, int]]):
    """Arrow-batched word->subword segmentation under a trained merge
    list: per word, fold the merges in rank order with the exact
    greedy-leftmost trainer rule. Application is the same
    sequential-scan semantics as training, hence the same justified
    pandas-UDF escape hatch (never per-row Python)."""
    from pyspark.sql.functions import pandas_udf

    ranked = [(l, r) for l, r, _ in merges]

    @pandas_udf("array<string>")
    def segment(words: pd.Series) -> pd.Series:
        out = []
        for w in words:
            toks = list(w or "")
            for left, right in ranked:
                res, i, n = [], 0, len(toks)
                while i < n:
                    if i + 1 < n and toks[i] == left and toks[i + 1] == right:
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(toks[i])
                        i += 1
                toks = res
            out.append(toks)
        return pd.Series(out)

    return segment


# -------------------------------------------------- unicode normalization
def normalize_unicode_udf():
    """Arrow-batched text canonicalization: NFKD-decompose, drop
    combining marks (accent strip), NFC-recompose, lowercase, collapse
    whitespace runs. The compose/decompose steps have no Spark builtin
    (relevant to the reference's domain: IAST transliteration is full
    of combining diacritics — cf. the collation pandas UDF,
    functions/collation.py, SURVEY U1, the one other justified Python
    surface in a text path). Vectorized per Arrow batch, never per
    row; everything downstream of it stays JVM-side."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def normalize(texts: pd.Series) -> pd.Series:
        def norm(s):
            if s is None:
                return None
            decomp = unicodedata.normalize("NFKD", s)
            stripped = "".join(
                ch for ch in decomp if not unicodedata.combining(ch)
            )
            return " ".join(
                unicodedata.normalize("NFC", stripped).lower().split()
            )

        return texts.map(norm)

    return normalize


# ------------------------------------------------------- n-gram LM scoring
def bigram_lm_score(
    docs: DataFrame,
    train_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Perplexity filtering with a corpus-trained bigram LM (the KenLM
    pattern of CCNet/RedPajama pipelines, expressed as joins): train
    add-alpha-smoothed bigram probabilities on the ``train_filter``
    slice, score EVERY document by mean negative log2 probability of
    its bigrams, emit (id, n_bigrams, bits_per_token). Low
    bits-per-token = the in-domain fluent text the LM expects; high =
    out-of-domain or degenerate.

    Scale shape: training is two partial-agg shuffles (bigram counts,
    unigram context counts); the vocab-size constant is one scalar agg.
    Scoring explodes each doc's bigrams once and left-joins the count
    tables on (w1, w2) / w1 — inverted-index equi-joins, skew-safe
    under AQE; unseen bigrams take the smoothed floor via coalesce, so
    the join stays LEFT (no per-row Python, no driver vocab). All
    arithmetic is F.log2/builtin — rows-only registry class (float
    fixpoint-free but log-valued; semantics pinned by pytest).
    """
    w = _plain_words(F.col(text_col))
    pairs = docs.select(
        F.col(id_col),
        F.posexplode(
            F.when(F.size(w) >= 2, F.slice(w, 1, F.size(w) - 1)).otherwise(
                F.array()
            )
        ).alias("pos", "w1"),
        w.alias("_w"),
    ).select(
        id_col,
        "w1",
        F.col("_w")[F.col("pos") + 1].alias("w2"),
    )
    train_pairs = pairs.join(
        docs.filter(train_filter).select(id_col), id_col, "semi"
    )
    big = train_pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = big.select(
        F.countDistinct("w2").alias("v")
    )  # context-conditioned vocab for the smoothing denominator
    scored = (
        pairs.join(big, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            (
                -F.log2(
                    (F.coalesce("c12", F.lit(0)) + F.lit(alpha))
                    / (F.coalesce("c1", F.lit(0)) + F.lit(alpha) * F.col("v"))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum("nll") / F.count(F.lit(1))).alias("bits_per_token"),
    )


def html_strip(df: DataFrame, html_col: str, id_col: str) -> DataFrame:
    """HTML/boilerplate stripping — the extraction step a web-scraped
    corpus runs before any quality/dedup scoring: drop script/style
    blocks wholesale, remove tags, unescape the five core entities,
    collapse whitespace. Pure builtin regexp/replace chain — map-only,
    whole-stage-codegen, RE2-and-Java-safe patterns (no backreferences:
    script and style blocks use separate non-greedy patterns, because
    RE2 — DuckDB's engine, hence the oracle's — has no \\1).

    Returns (id, clean_text, n_tags) where n_tags counts removed tag
    tokens — a cheap boilerplate-density signal (markup-heavy pages
    gate out before expensive scoring)."""
    h = F.col(html_col)
    no_script = F.regexp_replace(
        F.regexp_replace(h, r"(?is)<script[^>]*>.*?</script>", " "),
        r"(?is)<style[^>]*>.*?</style>",
        " ",
    )
    n_tags = F.size(F.regexp_extract_all(no_script, F.lit(r"<[^>]+>"), F.lit(0)))
    no_tags = F.regexp_replace(no_script, r"<[^>]+>", " ")
    unescaped = no_tags
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&"),  # &amp; LAST: "&amp;lt;" -> "&lt;"
    ):
        unescaped = F.replace(unescaped, F.lit(ent), F.lit(ch))
    clean = F.trim(F.regexp_replace(unescaped, r"\s+", " "))
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_tags.cast("int").alias("n_tags"),
    )
