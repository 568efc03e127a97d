"""Text-analysis operators for LLM training-data pipelines (SURVEY §7
Phase 4): tokenization, token statistics, quality scoring, language
identification, document fingerprinting.

All pure column expressions over the ``documents`` table — array
higher-order functions (``transform``/``aggregate``/``filter``), no
Python UDFs, so the whole pipeline codegens and scales linearly with
executors. Documents never need to be colocated: every function here
is embarrassingly parallel per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword anchors for the n-gram/stopword heuristic
# language ID. Order matters: ties break toward the earlier language.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "un"],
}

FINGERPRINT_MOD = 2_147_483_647  # 2^31 - 1, keeps acc*31+c within int64


def tokenize(text: Column | str) -> Column:
    """Whitespace tokenization into an array column."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    """Token count — the cheap length signal quality filters start with."""
    return F.size(tokenize(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokenize(text)))


def avg_token_len(text: Column | str) -> Column:
    """Mean token length: integer char-sum / token count, exact in
    double, so it reproduces bit-identically in any engine."""
    toks = tokenize(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return total.cast("double") / F.size(toks).cast("double")


def stopword_ratio(text: Column | str, stopwords: list[str]) -> Column:
    """Fraction of tokens that are stopwords — high ratio suggests
    natural prose, very low suggests tables/code/noise."""
    toks = tokenize(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(stopwords)))
    return hits.cast("double") / F.size(toks).cast("double")


def quality_score(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Composite document quality in [0,1]: half length saturation
    (100-token knee), half stopword density (natural-language signal).
    The shape follows public pretraining-data heuristics (length +
    stopword + punctuation ratios); weights are engine defaults."""
    sw = stopwords if stopwords is not None else LANG_STOPWORDS["en"]
    length_part = F.least(F.lit(1.0), token_count(text).cast("double") / F.lit(100.0))
    return length_part * F.lit(0.5) + stopword_ratio(text, sw) * F.lit(0.5)


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (distinct hits)."""
    toks = F.array_distinct(tokenize(text))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of stopword-hit counts with
    deterministic priority-order tie-breaking (en > es > fr)."""
    s = lang_scores(text)
    return (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]), F.lit("en"))
        .when(s["es"] >= s["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )


def fingerprint(text: Column | str, mod: int = FINGERPRINT_MOD) -> Column:
    """Rolling polynomial hash over the characters (base 31, modular):
    a content fingerprint for exact-dup detection and incremental
    re-crawl diffing. Pure integer arithmetic so any engine reproduces
    it exactly."""
    c = F.col(text) if isinstance(text, str) else text
    chars = F.split(c, "")
    return F.aggregate(
        F.transform(chars, lambda ch: F.ascii(ch)),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x.cast("long")) % F.lit(mod),
    )


def token_bigrams(toks: Column) -> Column:
    """Adjacent-token bigram strings (``"a b"``) from a token array.
    Row-local; requires ``size(toks) >= 2`` (callers filter)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )


def type_token_ratio(toks: Column) -> Column:
    """distinct/total tokens — the classic lexical-diversity signal.
    Integer-over-integer double division: bit-exact in any engine."""
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")


def dup_bigram_fraction(toks: Column) -> Column:
    """Fraction of adjacent bigrams that are repeats of an earlier
    bigram (1 - distinct/total) — the Gopher-style duplicate-n-gram
    repetition signal (Rae et al. 2021, §A1.1)."""
    bg = token_bigrams(toks)
    return F.lit(1.0) - F.size(F.array_distinct(bg)).cast("double") / F.size(bg).cast(
        "double"
    )


def repetition_metrics(
    df,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("lang", "source"),
):
    """All three Gopher repetition metrics (Rae et al. 2021, §A1.1) —
    type-token ratio, duplicate-bigram fraction, top-token fraction —
    in ONE Arrow ``mapInPandas`` kernel (r5 verdict item: the
    HOF-fold forms are interpreted per array element, ~15 s at sf1
    for row-local math; one C-speed Counter pass per doc cuts the
    constant an order of magnitude). Row-local — zero shuffle; rows
    with fewer than two tokens are dropped (callers' ``size >= 2``
    filter, fused here so the text column never re-materializes).

    Bit-exactness contract vs the HOF forms and the DuckDB oracle:
    tokenization is ``text.split(' ')`` — Python's str.split on a
    literal space keeps interior AND trailing empty tokens, exactly
    like Spark's ``split(c, " ")`` (limit -1) and DuckDB's
    ``string_split``. Each metric is one integer-over-integer float64
    division (ttr: distinct/n; dupbg: 1.0 - distinct_bigrams/(n-1);
    toptok: max_count/n) — single IEEE ops, no summation-order
    freedom, so every per-doc double is bit-identical to the
    expression forms it replaces. Bigram distinctness uses token
    TUPLES, equivalent to the oracle's ``tok || ' ' || tok`` strings
    because tokens cannot contain the delimiter they were split on.
    Returns ``keep_cols + (ttr, dupbg, toptok)``.
    """
    from collections import Counter

    fields = [df.schema[c] for c in keep_cols]
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
        + ", ttr double, dupbg double, toptok double"
    )

    def kernel(batches):
        for pdf in batches:
            mask, ttrs, dupbgs, toptoks = [], [], [], []
            for t in pdf[text_col]:
                if not isinstance(t, str):
                    mask.append(False)
                    continue
                toks = t.split(" ")
                n = len(toks)
                if n < 2:
                    mask.append(False)
                    continue
                mask.append(True)
                counts = Counter(toks)
                ttrs.append(len(counts) / n)
                dupbgs.append(1.0 - len(set(zip(toks, toks[1:]))) / (n - 1))
                toptoks.append(max(counts.values()) / n)
            out = pdf.loc[mask, list(keep_cols)].copy()
            out["ttr"] = ttrs
            out["dupbg"] = dupbgs
            out["toptok"] = toptoks
            yield out

    return df.select(*keep_cols, text_col).mapInPandas(kernel, schema)


def top_token_fraction(toks: Column) -> Column:
    """Fraction of tokens taken by the single most frequent token.

    The most-frequent count equals the longest run of equal adjacent
    elements in the SORTED token array, so this is one codegen'd
    O(T log T) sort plus one O(T) interpreted fold — replacing the
    original O(U·T) distinct×filter scan (U = per-doc distinct
    tokens), which at ~200 distinct over ~300 tokens interpreted 60k
    string compares per row and dominated the whole query's runtime.
    Still row-local (never shuffles, unlike the explode → (doc, token)
    groupBy alternative whose shuffle grows with the corpus); produces
    the identical integer count, so oracles are unchanged."""
    s = F.array_sort(toks)
    n = F.size(toks)
    best = F.aggregate(
        F.when(n >= 2, F.sequence(F.lit(2), n)).otherwise(
            F.array().cast("array<int>")
        ),
        F.struct(
            F.lit(1).cast("int").alias("best"), F.lit(1).cast("int").alias("cur")
        ),
        lambda acc, i: F.when(
            F.element_at(s, i) == F.element_at(s, i - 1),
            F.struct(
                F.greatest(acc["best"], acc["cur"] + F.lit(1)).alias("best"),
                (acc["cur"] + F.lit(1)).alias("cur"),
            ),
        ).otherwise(
            F.struct(acc["best"].alias("best"), F.lit(1).cast("int").alias("cur"))
        ),
        lambda acc: acc["best"],
    )
    return F.when(n > 0, best.cast("double") / n.cast("double"))


# BPE-ish pre-tokenizer: word pieces = letter runs, digit runs, or a
# single non-space symbol — the standard pre-split every BPE/GPT-style
# tokenizer applies before merges. Same RE2/Java-compatible pattern on
# both engines.
BPE_SPLIT_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def bpe_ish_tokens(text: Column | str) -> Column:
    """Regex word-piece extraction (letters / digits / symbol runs) —
    a deterministic stand-in for a real BPE vocab that gives the same
    count scaling; row-local, codegen'd regexp."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_SPLIT_REGEX), 0)
