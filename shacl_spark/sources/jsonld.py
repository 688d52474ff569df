"""Distributed JSON-LD-lines reader (VERDICT r04 "What's missing" #3).

Interchange breadth beyond Turtle/N-Triples: real RDF corpora often
ship as newline-delimited JSON-LD (one node object per line — the
output of ``jsonld flatten`` piped through ``jq -c``, or any
entity-per-line export).  A 100 TB corpus must be parsed on the
executors, so this reader is ``spark.read.text`` → ``try_parse_json``
into Spark 4's VARIANT type → two ``variant_explode`` lateral joins
(top-level keys, then array elements) → one codegen'd projection.
Everything is JVM-side Catalyst expressions — no Python row work, no
shuffle (Generate nodes, not Exchanges), splittable by line like any
text source (plan-asserted in tests/test_jsonld.py).  VARIANT
preserves exact JSON typing, so ``5`` vs ``"5"`` vs ``5.0`` map to
xsd:integer / xsd:string / xsd:double faithfully.

Documented subset (flattened JSON-LD — the line-oriented interchange
normal form):

- ``@id`` — subject IRI or ``_:`` blank node; a line WITHOUT ``@id``
  gets a deterministic blank node derived from the line's hash (NB:
  byte-identical anonymous lines therefore merge — flatten first if
  that matters).
- ``@type`` — string or array of strings → ``rdf:type`` IRI triples.
- any other key — predicate; values may be scalars (string → plain
  literal, integer → xsd:integer, decimal/double → xsd:double, boolean
  → xsd:boolean), node references ``{"@id": ...}``, value objects
  ``{"@value": ..., "@type"/"@language": ...}``, or arrays of these.
- a simple term/prefix ``context`` dict expands terms and CURIEs in
  predicate, ``@type``, ``@id`` and value-``@type`` positions
  (term match first, then ``prefix:suffix``; absolute IRIs pass
  through).
- NOT supported (dropped, documented): nested node objects without
  ``@id`` (flatten first), ``@list``/``@graph``/``@reverse``,
  lists-of-lists.  Malformed JSON lines are DROPPED by default; pass
  ``bad_lines="keep"`` to route them to a ``_malformed`` column for
  dead-letter auditing (the 100 TB posture: never fail a 6-hour job on
  one bad record, count it).

Output matches the engine's triple frame:
DF[subj, pred, obj, obj_kind, obj_dt, obj_lang] — language tags are
lowercased and plain literals are xsd:string, the same normal form as
turtle.py / ntriples.py, so downstream joins compare term-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from shacl_spark.functions.terms import RDF, XSD

_INT_TYPES = ("TINYINT", "SMALLINT", "INT", "BIGINT")


def _expander(context: dict[str, str] | None):
    """Column fn expanding a term/CURIE through a (small, driver-side)
    context map: exact term match first, then ``prefix:suffix``
    expansion; anything else (absolute IRIs, bnodes, unknown prefixes)
    passes through unchanged."""
    if not context:
        return lambda c: c
    m = F.create_map(*[F.lit(x) for kv in sorted(context.items()) for x in kv])

    def expand(c: Column) -> Column:
        term = F.element_at(m, c)
        pfx = F.element_at(m, F.substring_index(c, ":", 1))
        curie = F.when(
            c.contains(":") & ~c.startswith("_:") & pfx.isNotNull(),
            F.concat(pfx, F.regexp_replace(c, "^[^:]*:", "")),
        )
        return F.coalesce(term, curie, c)

    return expand


def read_jsonld_lines(
    spark: SparkSession,
    path: str,
    context: dict[str, str] | None = None,
    bad_lines: str = "drop",
) -> DataFrame:
    """Parse newline-delimited JSON-LD (file, directory or glob) into
    the engine's triple frame — distributed, shuffle-free, JVM-only.

    ``context`` maps terms and prefixes to IRIs (a driver-side dict —
    contexts are metadata-sized, never data-sized).  ``bad_lines`` as
    in :func:`~shacl_spark.sources.ntriples.read_ntriples`: ``'drop'``
    skips unparseable lines, ``'keep'`` returns them in a
    ``_malformed`` column with NULL triple columns."""
    ex = _expander(context)
    lines = spark.read.text(path)
    raw = F.trim(F.col("value"))
    content = lines.where(raw != "").select(
        raw.alias("_raw"), F.try_parse_json(raw).alias("_doc")
    )
    if bad_lines == "keep":
        bad = content.where(F.col("_doc").isNull()).select(
            *[
                F.lit(None).cast("string").alias(n)
                for n in ("subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang")
            ],
            F.col("_raw").alias("_malformed"),
        )
    content = content.where(F.col("_doc").isNotNull())

    # subject: @id, else a deterministic hash-derived blank node
    sid = F.try_variant_get(F.col("_doc"), "$['@id']", "string")
    subj = ex(
        F.coalesce(
            sid, F.concat(F.lit("_:j"), F.hex(F.xxhash64(F.col("_raw"))))
        )
    )
    docs = content.select(subj.alias("subj"), F.col("_doc").alias("_doc"))

    # explode top-level keys (Generate node — no shuffle); skip @id
    kv = docs.lateralJoin(
        spark.tvf.variant_explode(F.col("_doc").outer()).select(
            F.col("key").alias("_k"), F.col("value").alias("_v")
        )
    ).where(F.col("_k") != "@id")

    # normalize every value to an ARRAY variant, then explode elements:
    # one pass instead of a scalar/array union that would scan the
    # exploded frame twice.  to_json(variant) is the exact JSON text,
    # so wrap-and-reparse is lossless.
    st0 = F.schema_of_variant(F.col("_v"))
    arr = F.when(st0.startswith("ARRAY"), F.col("_v")).otherwise(
        F.parse_json(F.concat(F.lit("["), F.to_json(F.col("_v")), F.lit("]")))
    )
    el = (
        kv.select("subj", "_k", arr.alias("_arr"))
        .lateralJoin(
            spark.tvf.variant_explode(F.col("_arr").outer()).select(
                F.col("value").alias("_e")
            )
        )
        .select("subj", "_k", "_e")
    )

    st = F.schema_of_variant(F.col("_e"))
    is_type = F.col("_k") == "@type"
    oid = F.try_variant_get(F.col("_e"), "$['@id']", "string")
    oval = F.try_variant_get(F.col("_e"), "$['@value']", "string")
    odt = F.try_variant_get(F.col("_e"), "$['@type']", "string")
    olang = F.try_variant_get(F.col("_e"), "$['@language']", "string")
    as_str = F.try_variant_get(F.col("_e"), "$", "string")

    pred = F.when(is_type, F.lit(RDF + "type")).otherwise(ex(F.col("_k")))

    iri_obj = is_type | (st.startswith("OBJECT") & oid.isNotNull())
    iri_val = ex(F.when(is_type, as_str).otherwise(oid))
    lit_lex = F.when(st.startswith("OBJECT"), oval).otherwise(as_str)
    # a value object with a NATIVE-typed @value and no @type/@language
    # ({"@value": 5}) derives its datatype from the @value field's own
    # variant type — same mapping as a bare native value (ADVICE r05,
    # low: the element-level branches saw OBJECT and fell through to
    # xsd:string, silently inconsistent with bare 5 → xsd:integer)
    vst = F.schema_of_variant(
        F.try_variant_get(F.col("_e"), "$['@value']", "variant")
    )
    lit_dt = (
        F.when(st.startswith("OBJECT") & odt.isNotNull(), ex(odt))
        .when(st.startswith("OBJECT") & olang.isNotNull(), F.lit(RDF + "langString"))
        .when(st.startswith("OBJECT") & vst.isin(*_INT_TYPES), F.lit(XSD + "integer"))
        .when(
            st.startswith("OBJECT")
            & (vst.startswith("DECIMAL") | vst.isin("DOUBLE", "FLOAT")),
            F.lit(XSD + "double"),
        )
        .when(st.startswith("OBJECT") & (vst == "BOOLEAN"), F.lit(XSD + "boolean"))
        .when(st.isin(*_INT_TYPES), F.lit(XSD + "integer"))
        .when(
            st.startswith("DECIMAL") | st.isin("DOUBLE", "FLOAT"),
            F.lit(XSD + "double"),
        )
        .when(st == "BOOLEAN", F.lit(XSD + "boolean"))
        .otherwise(F.lit(XSD + "string"))
    )

    obj = F.when(iri_obj, iri_val).otherwise(lit_lex)
    obj_kind = F.when(
        iri_obj,
        F.when(iri_val.startswith("_:"), F.lit("bnode")).otherwise(F.lit("iri")),
    ).otherwise(F.lit("literal"))
    obj_dt = F.when(~iri_obj, lit_dt)
    obj_lang = F.when(~iri_obj & olang.isNotNull(), F.lower(olang))

    out = (
        el.select(
            F.col("subj"),
            pred.alias("pred"),
            obj.alias("obj"),
            obj_kind.alias("obj_kind"),
            obj_dt.cast("string").alias("obj_dt"),
            obj_lang.cast("string").alias("obj_lang"),
        )
        # drop unrepresentable elements: JSON null, nested arrays
        # (lists-of-lists), node objects without @id/@value (flatten
        # first — documented subset)
        .where(F.col("obj").isNotNull())
    )
    if bad_lines == "keep":
        return out.withColumn("_malformed", F.lit(None).cast("string")).unionByName(
            bad
        )
    return out
