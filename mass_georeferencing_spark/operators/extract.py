"""HTML → text extraction for Common-Crawl-style pages (the input_hint's
per-row invariant: byte-identical extracted text per url).

The north rule's input table carries both ``html binary`` and ``text string``
per page; the engine must be able to RE-DERIVE the text column from the raw
page bytes exactly (reference analog: the locality strings the reference
scores are pre-extracted page text, ui/mass_georef_shiny relies on the same
upstream extraction). Two halves, each a pure JVM expression chain
(whole-stage codegen, embarrassingly parallel, zero shuffle — the 100 TB cost
is one streaming pass over the page bytes):

- :func:`render_html_col` — the deterministic renderer the synthetic pages
  table uses to build ``html`` from ``text``: a realistic page skeleton
  (doctype, head with title/meta/style/script, body paragraph) with the body
  text HTML-entity-encoded (& < >). This makes the extraction invariant
  NON-trivial: the extractor must strip head/script/style, strip tags, decode
  entities and normalize whitespace to win back the text bytes.
- :func:`extract_text_col` — the inverse: a boilerplate-stripping extractor
  in the readability/trafilatura family, reduced to the deterministic subset
  a byte-identity invariant can pin. Spec (applied in order):
    1. drop <script>…</script>, <style>…</style> elements, then the whole
       <head>…</head> (case-insensitive, dot-matches-newline),
    2. replace every remaining tag <…> with one space,
    3. decode &nbsp; to a space,
    4. collapse whitespace runs to single spaces and trim,
    5. decode the named/numeric entities the renderer can emit —
       &lt; &gt; &quot; &#39; first, &amp; LAST (single-pass decode order:
       '&amp;lt;' must yield the literal '&lt;', not '<').
  Tag stripping precedes entity decoding, so text containing literal markup
  ('</script>', '<p>') survives the round trip — it was encoded to entities
  and only steps 5 turns it back.

Byte-identity precondition (asserted by tests/test_extract.py on the real
corpus): the text column is whitespace-normalized (no leading/trailing
whitespace, no runs, no tabs/newlines) — step 4 is then the identity on it.
For a corpus that violates this, extraction returns the whitespace-normalized
text (the standard extractor contract) and the invariant weakens to
normalized equality.

Both halves carry DuckDB SQL twins (:func:`render_sql` / :func:`extract_sql`)
so the pages derivation and the extractor itself stay oracle-checkable;
DuckDB's regexp_replace needs the explicit 'g' flag where Spark replaces all
matches by default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) chain shared by the Spark and DuckDB extractors.
_STRIP_RES = [
    (r"(?is)<script.*?</script>", ""),
    (r"(?is)<style.*?</style>", ""),
    (r"(?is)<head.*?</head>", ""),
    (r"(?s)<[^>]*>", " "),
]

# literal replacements, applied in order AFTER tag stripping ('&amp;' last)
_ENTITY_DECODE = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

_HTML_PREFIX = (
    '<!DOCTYPE html><html><head><meta charset="utf-8"><title>'
)
_HTML_MID = (
    "</title><style>body { margin: 0; font-family: serif; }</style>"
    '<script>var crawlTs = "warc";</script></head><body><p>'
)
_HTML_SUFFIX = "</p></body></html>"


def render_html_col(url: Column, text: Column) -> Column:
    """Deterministic page renderer (binary): skeleton + entity-encoded body."""
    enc = F.replace(text, F.lit("&"), F.lit("&amp;"))
    enc = F.replace(enc, F.lit("<"), F.lit("&lt;"))
    enc = F.replace(enc, F.lit(">"), F.lit("&gt;"))
    page = F.concat(
        F.lit(_HTML_PREFIX), url, F.lit(_HTML_MID), enc, F.lit(_HTML_SUFFIX)
    )
    return page.cast("binary")


def render_sql(url_expr: str, text_expr: str) -> str:
    """DuckDB twin of :func:`render_html_col` (built by concatenation, not
    str.format — the inline CSS contains literal braces)."""
    return (
        "encode('" + _HTML_PREFIX + "' || " + url_expr
        + " || '" + _HTML_MID.replace("'", "''") + "' || "
        + f"replace(replace(replace({text_expr}, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
        + " || '" + _HTML_SUFFIX + "')"
    )


def extract_text_col(html: Column) -> Column:
    """Extract visible text from page bytes per the module spec — pure JVM."""
    s = F.decode(html, "UTF-8")
    for pat, repl in _STRIP_RES:
        s = F.regexp_replace(s, pat, repl)
    s = F.replace(s, F.lit("&nbsp;"), F.lit(" "))
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    for ent, ch in _ENTITY_DECODE:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return s


def _sq(s: str) -> str:
    return s.replace("'", "''")


def extract_sql(html_expr: str) -> str:
    """DuckDB twin of :func:`extract_text_col` over a BLOB expression."""
    s = f"decode({html_expr})"
    for pat, repl in _STRIP_RES:
        s = f"regexp_replace({s}, '{_sq(pat)}', '{_sq(repl)}', 'g')"
    s = f"replace({s}, '&nbsp;', ' ')"
    s = f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"
    for ent, ch in _ENTITY_DECODE:
        s = f"replace({s}, '{_sq(ent)}', '{_sq(ch)}')"
    return s
