"""Text column functions — tokenization, shingling, character-class
ratios. All built-in-function compositions (no UDFs): they compile into
whole-stage codegen and vectorize over parquet scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens_ws(text: Column | str) -> Column:
    """Whitespace tokens (empty strings filtered)."""
    return F.filter(F.split(F.trim(_col(text)), r"\s+"), lambda t: t != "")


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens_ws(text))


#: BPE-ish pre-tokenizer: GPT-2-style contractions / letter runs /
#: number runs / punctuation runs / whitespace-prefixed pieces.
_BPEISH = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def token_count_bpeish(text: Column | str) -> Column:
    """Count of BPE-style pre-token pieces — a cheap, deterministic
    proxy for LLM token counts (regexp_count is JVM-side)."""
    return F.regexp_count(_col(text), F.lit(_BPEISH))


def char_shingles(text: Column | str, k: int = 5, lowercase: bool = True) -> Column:
    """Array of all k-character shingles of the text (positions
    1..len-k+1). Built from sequence+transform — one codegen expression,
    no explode until the caller chooses to.

    The lowercased text is LET-BOUND via a one-element array +
    ``transform``: a lambda variable is an attribute in generated code,
    so the per-position inner lambda reads it instead of re-evaluating
    the outer text expression once per shingle position (codegen does
    not hoist subexpressions into higher-order-function lambdas — the
    inlined form re-ran ``lower`` per position, O(len²) per document;
    the word variant re-ran the whole tokenizer per position and
    measured 6.5 s for a single warm projection pass at sf0.1, vs
    ~0.6 s bound)."""
    c = _col(text)
    if lowercase:
        c = F.lower(c)

    def shingle(s: Column) -> Column:
        n = F.length(s) - F.lit(k - 1)
        # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — a
        # text shorter than k must yield [] explicitly or substr walks
        # ghost positions (position 0 raises in the word variant)
        return F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), n), lambda i: F.substr(s, i, F.lit(k))
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.flatten(F.transform(F.array(c), shingle))


def word_shingles(text: Column | str, n: int = 3, lowercase: bool = True) -> Column:
    """Array of n-word shingles (token n-grams). Far more selective
    than char shingles on small-vocabulary text — the right default for
    document-level Jaccard."""
    c = _col(text)
    if lowercase:
        c = F.lower(c)

    def shingle(ts: Column) -> Column:
        m = F.size(ts) - F.lit(n - 1)
        # same sequence(1, 0) pitfall as char_shingles: a document with
        # fewer than n tokens must yield [] — slice(toks, 0, n)
        # otherwise throws INVALID_PARAMETER_VALUE.START
        return F.when(
            m >= 1,
            F.transform(
                F.sequence(F.lit(1), m),
                lambda i: F.concat_ws(" ", F.slice(ts, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # let-bind the token array (see char_shingles): the inlined form
    # re-ran split+trim+filter once PER SHINGLE POSITION — O(tokens²)
    # tokenizer work per document
    return F.flatten(F.transform(F.array(tokens_ws(c)), shingle))


def normalize_text(
    text: Column | str,
    lowercase: bool = True,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
) -> Column:
    """Canonical text normalization for dedup keys / shingling inputs:
    optional lowercase, control-char strip, whitespace collapse. Pure
    regexp/lower composition — codegen'd."""
    c = _col(text)
    if strip_control:
        c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
    if lowercase:
        c = F.lower(c)
    if collapse_whitespace:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


#: PII patterns (public, standard shapes). Order matters: specific
#: shapes (email, card, SSN) before the greedy phone digit-run, so a
#: card number isn't half-eaten as a "phone".
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{1,4}\b", "<CARD>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # IP before the greedy phone digit-run: a dotted quad 9+ chars
    # long would otherwise be eaten as <PHONE> and the IP rule is dead
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def redact_pii(text: Column | str, patterns: list[tuple[str, str]] | None = None) -> Column:
    """Replace common PII shapes with typed placeholders — a chain of
    regexp_replace expressions (one corpus pass, no UDF)."""
    c = _col(text)
    for pat, repl in patterns or PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def _class_count(text: Column | str, pattern: str) -> Column:
    return F.regexp_count(_col(text), F.lit(pattern))


def punct_ratio(text: Column | str) -> Column:
    c = _col(text)
    return _class_count(c, r"[^\w\s]") / F.greatest(F.length(c), F.lit(1))


def digit_ratio(text: Column | str) -> Column:
    c = _col(text)
    return _class_count(c, r"[0-9]") / F.greatest(F.length(c), F.lit(1))


def upper_ratio(text: Column | str) -> Column:
    c = _col(text)
    return _class_count(c, r"[A-Z]") / F.greatest(F.length(c), F.lit(1))


def whitespace_ratio(text: Column | str) -> Column:
    c = _col(text)
    return _class_count(c, r"\s") / F.greatest(F.length(c), F.lit(1))


# Tag-strip + the entity subset worth decoding without an HTML parser.
# Order matters: &amp; must decode LAST or "&amp;lt;" would double-decode.
_MARKUP_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_markup(text: Column | str) -> Column:
    """Plain text from markup-ish input: drop ``<...>`` tags, decode
    the common HTML entities, collapse whitespace runs, trim. A
    regex/replace chain (one codegen pass, no UDF, no HTML parser) —
    the web-corpus boilerplate-strip step of a training pipeline.
    Portable: the same chain is expressible in ANSI-ish SQL for the
    oracle (DuckDB ``regexp_replace(..., 'g')``)."""
    c = F.regexp_replace(_col(text), r"<[^>]+>", "")
    for ent, repl in _MARKUP_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(repl))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def char_entropy(text: Column | str, max_chars: int = 2000) -> Column:
    """Shannon entropy (nats) of the ASCII-printable character
    distribution of the first ``max_chars`` chars — a gibberish /
    low-diversity quality signal (near-0 for repeated filler, ~3-4 for
    natural English). Expression-only: per-row cost is
    O(distinct_chars x len) with NO explode and NO shuffle — the form
    that survives a 100 TB corpus scan. Non-ASCII is stripped first so
    engine codepoint semantics can't diverge (keeps the value
    oracle-hashable); summation is over sorted distinct chars so FP
    order is deterministic across engines."""
    t = F.regexp_replace(
        F.substring(_col(text), 1, max_chars), r"[^ -~]", ""
    )
    length = F.length(t).cast("double")
    chars = F.array_sort(F.array_distinct(F.split(t, "")))

    def term(c: Column) -> Column:
        n = (F.length(t) - F.length(F.replace(t, c))).cast("double")
        p = n / length
        return F.when(n > 0, -p * F.log(p)).otherwise(F.lit(0.0))

    total = F.aggregate(chars, F.lit(0.0), lambda acc, c: acc + term(c))
    return F.when(length > 0, total).otherwise(F.lit(0.0))


#: struct-field names for PII_PATTERNS, in order
# order mirrors PII_PATTERNS (IP precedes phone there)
_PII_NAMES = ["email", "card", "ssn", "ip", "phone"]


def pii_hit_counts(text: Column | str) -> Column:
    """Per-pattern PII hit counts as a struct
    ``(n_email, n_card, n_ssn, n_phone, n_ip)`` — the audit/report
    side of ``redact_pii`` (each pattern counted independently over
    the original text, so an overlapping shape can count twice;
    redaction order only matters when *replacing*). One codegen pass,
    regexp_count per pattern."""
    c = _col(text)
    return F.struct(
        *[
            F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{name}")
            for (pat, _), name in zip(PII_PATTERNS, _PII_NAMES)
        ]
    )


#: query-parameter prefixes that never affect content (tracking /
#: session ids); ``normalize_url`` builds its filter from THIS tuple —
#: keys without '=' match as prefixes (utm_*), keys with '=' match the
#: exact parameter name
#: NOTE: ``ref=`` is deliberately NOT in the default set — it is
#: frequently content-bearing (e.g. ``?ref=<branch>`` on code-hosting
#: URLs), and stripping it merges distinct resources before dedup.
#: Callers with referral-tracking-heavy corpora pass it explicitly via
#: ``tracking_params``.
_TRACKING_PARAMS = (
    "utm_", "fbclid=", "gclid=", "msclkid=", "sessionid="
)


def normalize_url(
    url: Column | str,
    tracking_params: tuple[str, ...] = _TRACKING_PARAMS,
) -> Column:
    """Canonical URL form for web-corpus dedup and per-site stats:
    lower-cased scheme+host, DEFAULT ports stripped (:80 for http,
    :443 for https — a non-default port is a different origin and is
    kept), fragment dropped, tracking query params
    (``_TRACKING_PARAMS``) removed, remaining params kept in ORIGINAL
    order (reordering would merge URLs whose servers are
    order-sensitive), trailing slash normalized off non-root paths.
    One codegen pass — parse_url + array filter, no UDF; at corpus
    scale this runs in the scan projection.

    The canonical key collapses the classic duplicate families
    (http://Example.com/a?utm_source=x ≡ http://example.com/a) while
    preserving content-bearing params (?id=7 stays distinct)."""
    u = F.trim(_col(url))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    proto = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    # parse_url HOST drops the port; recover it from AUTHORITY and keep
    # non-default ports (a :8080 origin is NOT the :80 origin)
    authority = F.coalesce(F.parse_url(u, F.lit("AUTHORITY")), F.lit(""))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = F.when(proto == "http", F.lit("80")).when(
        proto == "https", F.lit("443")
    ).otherwise(F.lit(""))
    port_part = F.when(
        (port != "") & (port != default_port), F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    # strip ONE trailing slash from non-root paths
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.parse_url(u, F.lit("QUERY"))

    def _keep(p):
        cond = p != ""
        for t in tracking_params:
            cond = cond & ~F.lower(p).startswith(t)
        return cond

    kept = F.filter(F.split(F.coalesce(query, F.lit("")), "&"), _keep)
    qs = F.array_join(kept, "&")
    return F.concat(
        proto,
        F.lit("://"),
        host,
        port_part,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
