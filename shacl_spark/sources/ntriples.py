"""Distributed N-Triples reader (VERDICT r02 "What's missing" #3).

Real data graphs arrive as line-oriented N-Triples; shapes-sized Turtle
goes through shacl/turtle.py on the driver, but a 100 TB data graph
must be parsed on the executors.  This reader is `spark.read.text`
followed by ONE codegen'd projection of regexp/conditional Column
expressions — no Python row work, no shuffle, splittable by line like
any text source, so a 1000-executor cluster parses partitions fully in
parallel (plan-asserted in tests/test_plans.py).

Output matches the engine's triple frame:
DF[subj, pred, obj, obj_kind, obj_dt, obj_lang].

Documented subset: \\uXXXX / \\UXXXXXXXX literal escapes pass through
unexpanded (the five common escapes \\\\ \\" \\n \\t \\r are decoded);
comment lines and blank lines are skipped.  Malformed lines are DROPPED
by default — pass ``bad_lines="keep"`` to route them to a
``_malformed`` column for dead-letter auditing instead (the 100 TB
posture: never fail a 6-hour job on one bad record, count it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from shacl_spark.functions.terms import RDF, XSD

# one master regex over the whole line: subject (IRI or bnode),
# predicate IRI, raw object chunk, terminating dot.  The object chunk
# pattern mirrors N-Triples' own grammar: IRIREF | bnode | literal with
# optional ^^<dt> / @lang suffix.
_LINE = (
    r"^\s*"
    r"(<[^>]*>|_:\S+)"              # 1: subject
    r"\s+"
    r"(<[^>]*>)"                    # 2: predicate
    r"\s+"
    r"(<[^>]*>"                     # 3: object — IRI
    r"|_:\S+"                       #            bnode
    r'|"(?:[^"\\]|\\.)*"'           #            literal lexical
    r"(?:\^\^<[^>]*>|@[A-Za-z][A-Za-z0-9\-]*)?"  # optional dt/lang
    r")"
    r"\s*\.\s*$"
)


def _unescape(col: Column) -> Column:
    """Decode the five common N-Triples string escapes in one logical
    pass: protect \\\\ behind a sentinel first so 'a\\\\nb' stays a
    backslash + n, not a newline."""
    c = F.regexp_replace(col, r"\\\\", "\x00")
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\t", "\t")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, r'\\"', '"')
    return F.regexp_replace(c, "\x00", "\\\\")


def ntriples_columns(line: Column) -> list[Column]:
    """The six triple columns as expressions over a raw line Column."""
    s_raw = F.regexp_extract(line, _LINE, 1)
    p_raw = F.regexp_extract(line, _LINE, 2)
    o_raw = F.regexp_extract(line, _LINE, 3)

    s_is_iri = s_raw.startswith("<")
    subj = F.when(s_is_iri, s_raw.substr(F.lit(2), F.length(s_raw) - 2)).otherwise(s_raw)
    pred = p_raw.substr(F.lit(2), F.length(p_raw) - 2)

    o_is_iri = o_raw.startswith("<")
    o_is_bnode = o_raw.startswith("_:")
    o_is_lit = o_raw.startswith('"')
    lex = F.regexp_extract(o_raw, r'^"((?:[^"\\]|\\.)*)"', 1)
    dt = F.regexp_extract(o_raw, r"\^\^<([^>]*)>$", 1)
    lang = F.regexp_extract(o_raw, r'"@([A-Za-z][A-Za-z0-9\-]*)$', 1)

    obj = (
        F.when(o_is_iri, o_raw.substr(F.lit(2), F.length(o_raw) - 2))
        .when(o_is_bnode, o_raw)
        .otherwise(_unescape(lex))
    )
    obj_kind = (
        F.when(o_is_iri, F.lit("iri"))
        .when(o_is_bnode, F.lit("bnode"))
        .otherwise(F.lit("literal"))
    )
    # engine normal form (matches turtle.py / terms.py): a language
    # literal is rdf:langString with a lowercased tag; a plain literal
    # is xsd:string
    obj_dt = F.when(
        o_is_lit,
        F.when(lang != "", F.lit(RDF + "langString"))
        .when(dt != "", dt)
        .otherwise(F.lit(XSD + "string")),
    )
    obj_lang = F.when(o_is_lit & (lang != ""), F.lower(lang))
    return [
        subj.alias("subj"),
        pred.alias("pred"),
        obj.alias("obj"),
        obj_kind.alias("obj_kind"),
        obj_dt.cast("string").alias("obj_dt"),
        obj_lang.cast("string").alias("obj_lang"),
    ]


def read_ntriples(
    spark: SparkSession, path: str, bad_lines: str = "drop"
) -> DataFrame:
    """Parse an N-Triples file (or directory / glob of files) into the
    engine's triple frame — distributed, shuffle-free, JVM-only.

    ``bad_lines='drop'`` (default) silently skips lines that are not
    comments/blank but fail the grammar; ``'keep'`` adds a
    ``_malformed`` string column (NULL for good rows) so a pipeline can
    dead-letter them.  On malformed rows the six triple columns are
    NULL (ADVICE r03: regexp_extract on a non-matching line yields
    ``''``, and a consumer that forgets to filter on ``_malformed``
    must not inject empty-string triples into the graph)."""
    lines = spark.read.text(path)
    line = F.trim(F.col("value"))
    content = lines.where((line != "") & ~line.startswith("#"))
    is_good = line.rlike(_LINE)
    if bad_lines == "keep":
        names = ["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"]
        return content.select(
            *[
                F.when(is_good, c).alias(n)
                for c, n in zip(ntriples_columns(line), names)
            ],
            F.when(~is_good, line).alias("_malformed"),
        ).where(is_good | F.col("_malformed").isNotNull())
    return content.where(is_good).select(*ntriples_columns(line))


# --- writer (VERDICT r03 "What's missing" #3) ---------------------------------


def _escape(col: Column) -> Column:
    """Inverse of :func:`_unescape`: emit the five standard N-Triples
    string escapes (backslash FIRST, or the added backslashes would be
    re-escaped)."""
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return F.regexp_replace(c, '"', r'\\"')


def ntriples_line(
    subj: Column, pred: Column, obj: Column,
    obj_kind: Column, obj_dt: Column, obj_lang: Column,
) -> Column:
    """One N-Triples line from the engine's six triple columns — a pure
    Column expression (codegen'd, shuffle-free).  Serialization normal
    form mirrors the reader's parse normal form so write→read is an
    exact round-trip: plain ``xsd:string`` literals carry no suffix,
    language literals emit ``@tag`` (``rdf:langString`` is implied),
    any other datatype emits ``^^<dt>``."""
    s_term = F.when(subj.startswith("_:"), subj).otherwise(
        F.concat(F.lit("<"), subj, F.lit(">"))
    )
    p_term = F.concat(F.lit("<"), pred, F.lit(">"))
    lit_suffix = (
        F.when(obj_lang.isNotNull(), F.concat(F.lit("@"), obj_lang))
        .when(
            obj_dt.isNotNull() & (obj_dt != XSD + "string"),
            F.concat(F.lit("^^<"), obj_dt, F.lit(">")),
        )
        .otherwise(F.lit(""))
    )
    o_term = (
        F.when(obj_kind == "iri", F.concat(F.lit("<"), obj, F.lit(">")))
        .when(obj_kind == "bnode", obj)
        .otherwise(F.concat(F.lit('"'), _escape(obj), F.lit('"'), lit_suffix))
    )
    # a NULL mandatory term must poison the WHOLE line to NULL, never
    # produce a shorter-but-parseable-looking line (r04 review #5:
    # concat_ws silently skips NULLs, so a NULL subj emitted '<p> <o> .'
    # which the reader then silently dropped — data vanished end to end).
    # IRI terms get the same treatment (ADVICE r04, low): an IRI holding
    # a space / '>' / control char serializes to a line the reader then
    # silently drops — the identical write-then-silent-drop loss class —
    # so invalid IRIs poison the line and route through on_null.
    bad_iri = lambda c: c.rlike('[\\x00-\\x20<>"{}|^`\\\\]')  # noqa: E731
    iris_ok = (
        ~F.when(subj.startswith("_:"), F.lit(False)).otherwise(bad_iri(subj))
        & ~bad_iri(pred)
        & ~F.when(obj_kind == "iri", bad_iri(obj)).otherwise(F.lit(False))
        & ~F.when(obj_kind == "literal", bad_iri(F.coalesce(obj_dt, F.lit("d")))).otherwise(F.lit(False))
    )
    return F.when(
        subj.isNotNull() & pred.isNotNull() & obj.isNotNull() & obj_kind.isNotNull()
        & iris_ok,
        F.concat_ws(" ", s_term, p_term, o_term, F.lit(".")),
    )


def write_ntriples(
    df: DataFrame, path: str, mode: str = "overwrite", on_null: str = "error"
) -> None:
    """Serialize a triple frame (engine 6-column shape; extra columns
    ignored) to N-Triples text at ``path`` — one codegen'd projection +
    ``write.text``, splittable and parallel like the reader, so any
    standard RDF tool can consume validation reports or graphs the
    engine produces.

    Rows with a NULL mandatory term (subj/pred/obj/obj_kind — e.g. the
    dead-letter rows of ``read_ntriples(bad_lines='keep')``) FAIL the
    write by default (the text datasource rejects NULL values — loud,
    not lossy); pass ``on_null='drop'`` to skip them instead.  A
    literal with NULL ``obj_dt`` serializes suffix-free and reads back
    as ``xsd:string`` — the engine's normal form for plain literals."""
    line = ntriples_line(
        F.col("subj"), F.col("pred"), F.col("obj"),
        F.col("obj_kind"), F.col("obj_dt"), F.col("obj_lang"),
    )
    out = df.select(line.alias("value"))
    if on_null == "drop":
        out = out.where(F.col("value").isNotNull())
    else:
        # the text datasource happily writes NULLs as blank lines —
        # fail the job instead (loud, not lossy)
        out = out.select(
            F.when(
                F.col("value").isNull(),
                F.raise_error(
                    F.lit(
                        "write_ntriples: NULL mandatory term or "
                        "unserializable IRI (whitespace/control/'>' "
                        "chars; pass on_null='drop' to skip such rows)"
                    )
                ).cast("string"),
            )
            .otherwise(F.col("value"))
            .alias("value")
        )
    out.write.mode(mode).text(path)
