"""HTML column expressions — T1 (html→text) and T13 (entity-keyword
tagging) from SURVEY.md §2.9.

The reference parses with Jsoup inside a scala UDF per row
(``ArticleInfoProcess.scala:61``; ``nlp/CleanHtml.scala:58-68``). For
the markup its pipelines actually see (server-rendered article bodies),
a regexp_replace chain covers the semantics while staying inside
Catalyst — no Python worker, codegen-friendly. A DOM-correct variant
for adversarial HTML belongs in a pandas_udf; the call sites keep the
same signature so swapping is local.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_ENTITIES = (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " "))


def html_to_text(col: Column | str) -> Column:
    """T1: strip script/style blocks, comments, all tags; decode the
    common entities; collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    # two passes, no backreference: DuckDB's RE2 has none, and the
    # oracle must run the same pattern.
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def sql_html_to_text(expr: str) -> str:
    """DuckDB twin (RE2 flags spelled the same way)."""
    c = f"regexp_replace({expr}, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    c = f"regexp_replace({c}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    c = f"regexp_replace({c}, '(?s)<!--.*?-->', ' ', 'g')"
    c = f"regexp_replace({c}, '<[^>]+>', ' ', 'g')"
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        c = f"replace({c}, '{ent}', '{rep_sql}')"
    c = f"regexp_replace({c}, '\\s+', ' ', 'g')"
    return f"trim({c})"


def tag_entity_words(text: Column, keywords: Column) -> Column:
    """T13: wrap every whole-word occurrence of each keyword in
    ``<i class="apus-entity-words">…</i>`` (ArticleInfoProcess.scala:
    130-164 — same markup class). Sequential fold over the keyword
    array; assumes alphanumeric keywords (the reference regex-escapes
    special chars — out of scope for the synthetic corpus)."""
    return F.aggregate(
        keywords,
        text,
        lambda acc, kw: F.regexp_replace(
            acc,
            F.concat(F.lit(r"\b"), kw, F.lit(r"\b")),
            F.concat(F.lit('<i class="apus-entity-words">'), kw, F.lit("</i>")),
        ),
    )


def sql_tag_entity_words(text_expr: str, keywords_expr: str) -> str:
    """DuckDB twin of :func:`tag_entity_words` (note the 'g' flag —
    DuckDB replaces only the first match by default; Spark replaces
    all)."""
    return (
        f"list_reduce(list_prepend({text_expr}, {keywords_expr}), "
        f"(acc_, kw_) -> regexp_replace(acc_, '\\b' || kw_ || '\\b', "
        f"'<i class=\"apus-entity-words\">' || kw_ || '</i>', 'g'))"
    )
