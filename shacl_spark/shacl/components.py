"""Column-expression helpers shared by the constraint components
(SPEC §4; SURVEY.md §2.B).  Everything here returns Column expressions
— JVM-side, constant-folded by Catalyst once shape parameters are
inlined as literals."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from shacl_spark.functions.terms import (
    SH,
    XSD,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
)

NUMERIC_DTS = {
    XSD_INTEGER,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD + "float",
    XSD + "long",
    XSD + "int",
    XSD + "short",
    XSD + "byte",
    XSD + "nonNegativeInteger",
    XSD + "positiveInteger",
    XSD + "negativeInteger",
    XSD + "nonPositiveInteger",
    XSD + "unsignedLong",
    XSD + "unsignedInt",
}
TEMPORAL_DTS = {XSD_DATE, XSD_DATETIME}

NODE_KIND_SETS = {
    SH + "IRI": ("iri",),
    SH + "Literal": ("literal",),
    SH + "BlankNode": ("bnode",),
    SH + "BlankNodeOrIRI": ("bnode", "iri"),
    SH + "BlankNodeOrLiteral": ("bnode", "literal"),
    SH + "IRIOrLiteral": ("iri", "literal"),
}

_INT_DTS = {
    XSD_INTEGER,
    XSD + "long",
    XSD + "int",
    XSD + "short",
    XSD + "byte",
    XSD + "nonNegativeInteger",
    XSD + "positiveInteger",
    XSD + "negativeInteger",
    XSD + "nonPositiveInteger",
    XSD + "unsignedLong",
    XSD + "unsignedInt",
}


def ill_formed(value: Column, dt: str) -> Column:
    """True when the lexical form is invalid for the (known) datatype
    (SPEC §4.1.2).

    The xsd:integer family is checked by REGEX, not a long cast:
    xsd:integer is unbounded, so valid literals outside int64 range
    (e.g. 2^70) must still be accepted (ADVICE r01).  The lexical
    checks here mirror tests/oracle.py `_ill_formed` exactly."""
    if dt in _INT_DTS:
        return ~value.rlike(r"^[+-]?\d+$")
    if dt in (XSD_DECIMAL, XSD_DOUBLE, XSD + "float"):
        return value.try_cast("double").isNull()
    if dt == XSD_BOOLEAN:
        return ~value.isin("true", "false", "0", "1")
    if dt == XSD_DATE:
        return ~value.rlike(r"^\d{4}-\d{2}-\d{2}$")
    if dt == XSD_DATETIME:
        return ~value.rlike(r"^\d{4}-\d{2}-\d{2}[T ]")
    return F.lit(False)  # unknown datatype: lexical form accepted


def _as_number(value: Column, kind: Column, dt: Column) -> Column:
    # untyped (dt NULL) literals still try the numeric cast — lenient
    # fixture encoding; xsd:string stays string-only per SPARQL
    is_num_literal = (kind == "literal") & (dt.isNull() | dt.isin(*NUMERIC_DTS))
    return F.when(is_num_literal, value.try_cast("double"))


def _as_time(value: Column, kind: Column, dt: Column) -> Column:
    return F.when((kind == "literal") & dt.isin(*TEMPORAL_DTS), value.try_cast("timestamp"))


def _as_string(value: Column, kind: Column, dt: Column) -> Column:
    return F.when(
        (kind == "literal") & (dt.isNull() | (dt == XSD_STRING)), value
    )


def sparql_lt(
    v1: Column, k1: Column, d1: Column, v2: Column, k2: Column, d2: Column,
    or_equal: bool = False,
) -> Column:
    """SPARQL-style `<` between two terms; NULL when incomparable
    (which the caller treats as a violation, SPEC §4.5.3)."""
    n1, n2 = _as_number(v1, k1, d1), _as_number(v2, k2, d2)
    t1, t2 = _as_time(v1, k1, d1), _as_time(v2, k2, d2)
    s1, s2 = _as_string(v1, k1, d1), _as_string(v2, k2, d2)
    if or_equal:
        return (
            F.when(n1.isNotNull() & n2.isNotNull(), n1 <= n2)
            .when(t1.isNotNull() & t2.isNotNull(), t1 <= t2)
            .when(s1.isNotNull() & s2.isNotNull(), s1 <= s2)
        )
    return (
        F.when(n1.isNotNull() & n2.isNotNull(), n1 < n2)
        .when(t1.isNotNull() & t2.isNotNull(), t1 < t2)
        .when(s1.isNotNull() & s2.isNotNull(), s1 < s2)
    )


def java_regex(pattern: str, flags: str | None) -> str:
    """Fold SHACL sh:flags into an embedded-flag Java regex."""
    if not flags:
        return pattern
    emb = "".join(c for c in flags if c in "imsxuU")
    return f"(?{emb}){pattern}" if emb else pattern


def lang_matches(lang: Column, tag: str) -> Column:
    """Basic language-range match (RFC 4647): exact or prefix + '-'."""
    low = F.lower(lang)
    t = tag.lower()
    return low.eqNullSafe(F.lit(t)) | low.startswith(t + "-")
