"""Distributed Turtle writer — the interchange EXIT for human-facing
graphs (the N-Triples writer in ntriples.py is the machine-facing one).

One codegen'd projection + one groupBy(subject) + ``write.text`` — all
term rendering and escaping is JVM-side Column algebra; the only
aggregation is the subject grouping (predicate-object lists joined with
``;``), a single hash-aggregate shuffle.  Statements are emitted in
engine-DEFINED sorted order inside each subject block, so the output is
deterministic given a partitioning.

Prefix handling: with ``prefixes={"ex": "http://example.org/"}`` IRIs
compress to pnames when the local part is PN_LOCAL-safe (conservative
subset — anything else stays a full ``<iri>``), and a header partition
carrying the ``@prefix`` block is unioned FIRST, so the output
directory CONCATENATES (``cat part-*``) to one valid Turtle document —
the header part file sorts first by name.  Individual body part files
are standalone-valid Turtle only in full-IRI mode (``prefixes=None``);
this is documented behavior, not an accident.

NULL mandatory terms poison the whole statement and fail the write by
default (``collect_list`` silently SKIPS nulls — without the explicit
raise a NULL subj would silently vanish end to end, the r04 NT-writer
data-loss class); ``on_null='drop'`` skips them loudly-by-contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shacl_spark.functions.terms import RDF, XSD
from shacl_spark.sources.ntriples import _escape

RDF_TYPE = RDF + "type"

# conservative PN_LOCAL: what this writer is willing to compress.  Real
# PN_LOCAL allows more (percent escapes, colons); everything outside
# this subset simply stays a full <iri> — correctness over compactness.
_SAFE_LOCAL = r"^[A-Za-z0-9_][A-Za-z0-9_\-.]*$"


def _pname_or_iri(col: Column, prefixes: dict[str, str] | None) -> Column:
    expr = F.concat(F.lit("<"), col, F.lit(">"))
    if not prefixes:
        return expr
    # longest base wrapped LAST = checked first (most specific wins)
    for pfx, base in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
        local = F.substring(col, len(base) + 1, 1 << 30)
        safe = local.rlike(_SAFE_LOCAL) & ~local.endswith(".")
        expr = F.when(
            col.startswith(base) & (F.length(col) > len(base)) & safe,
            F.concat(F.lit(pfx + ":"), local),
        ).otherwise(expr)
    return expr


def turtle_statement(
    subj: Column, pred: Column, obj: Column,
    obj_kind: Column, obj_dt: Column, obj_lang: Column,
    prefixes: dict[str, str] | None = None,
) -> tuple[Column, Column]:
    """(subject-term, predicate-object-entry) Column pair for one
    triple; a NULL mandatory term poisons the entry to NULL."""
    s_term = F.when(subj.startswith("_:"), subj).otherwise(
        _pname_or_iri(subj, prefixes)
    )
    p_term = F.when(pred == RDF_TYPE, F.lit("a")).otherwise(
        _pname_or_iri(pred, prefixes)
    )
    lit_suffix = (
        F.when(obj_lang.isNotNull(), F.concat(F.lit("@"), obj_lang))
        .when(
            obj_dt.isNotNull() & (obj_dt != XSD + "string"),
            F.concat(F.lit("^^"), _pname_or_iri(obj_dt, prefixes)),
        )
        .otherwise(F.lit(""))
    )
    o_term = (
        F.when(obj_kind == "iri", _pname_or_iri(obj, prefixes))
        .when(obj_kind == "bnode", obj)
        .when(
            obj_kind == "literal",
            F.concat(F.lit('"'), _escape(obj), F.lit('"'), lit_suffix),
        )
    )
    po = F.concat(p_term, F.lit(" "), o_term)
    # poison: any NULL input → NULL entry (concat propagates NULL), and
    # a NULL subject must also kill the entry so the subject group
    # cannot silently absorb it
    po = F.when(s_term.isNotNull() & po.isNotNull(), po)
    return s_term, po


def write_turtle(
    df: DataFrame,
    path: str,
    prefixes: dict[str, str] | None = None,
    mode: str = "overwrite",
    on_null: str = "error",
) -> None:
    """Serialize a triple frame (engine 6-column shape; extra columns
    ignored) as Turtle at ``path``: subject-grouped statements with
    ``;``-joined predicate-object lists, sorted inside each block."""
    spark = df.sparkSession
    s_term, po = turtle_statement(
        F.col("subj"), F.col("pred"), F.col("obj"),
        F.col("obj_kind"), F.col("obj_dt"), F.col("obj_lang"),
        prefixes,
    )
    pairs = df.select(s_term.alias("__s"), po.alias("__po"))
    if on_null == "drop":
        pairs = pairs.where(F.col("__po").isNotNull())
    else:
        pairs = pairs.select(
            "__s",
            F.when(
                F.col("__po").isNull(),
                F.raise_error(
                    F.lit(
                        "write_turtle: NULL mandatory term or unknown "
                        "obj_kind (pass on_null='drop' to skip such rows)"
                    )
                ),
            ).otherwise(F.col("__po")).alias("__po"),
        )
    body = (
        pairs.groupBy("__s")
        .agg(F.array_sort(F.collect_list("__po")).alias("__pos"))
        .select(
            F.concat(
                F.col("__s"),
                F.lit(" "),
                F.array_join(F.col("__pos"), " ;\n    "),
                F.lit(" ."),
            ).alias("value")
        )
    )
    if prefixes:
        header = spark.createDataFrame(
            [(f"@prefix {p}: <{iri}> .",) for p, iri in sorted(prefixes.items())],
            ["value"],
        ).coalesce(1)
        # union keeps partition order: the header becomes part-00000,
        # so `cat part-*` (name order) yields one valid Turtle document
        body = header.unionByName(body)
    body.write.mode(mode).text(path)
