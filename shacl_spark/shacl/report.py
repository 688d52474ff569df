"""Validation-report → RDF triples (SPEC §3.6 results graph; VERDICT
r01 "What's missing" #3).

One projection + one generator explode per result row — no driver-side
loops: each report row becomes a content-addressed
``sh:ValidationResult`` node with focusNode/resultPath/value/
sourceConstraintComponent/resultSeverity/sourceShape/resultMessage
triples, under a single ``sh:ValidationReport`` header node carrying
``sh:conforms``.

Caveat (documented subset): ``sh:resultPath`` serializes the engine's
SPARQL-ish path surface form — a plain predicate path comes out as its
IRI (the engine marks this explicitly in the report's ``path_kind``
column — never inferred from the surface string, so predicate IRIs
containing ``? + (`` serialize correctly); composite paths come out as
a string literal rather than a reconstructed path structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shacl_spark.functions.terms import RDF, SH, TRIPLE_SCHEMA, XSD

RESULT_PREFIX = "urn:shacl:result/"


def report_to_triples(
    report: DataFrame, report_iri: str = "urn:shacl:report"
) -> DataFrame:
    """Report frame (engine.validate output) → triple rows of the
    results graph: DF[subj, pred, obj, obj_kind, obj_dt, obj_lang]."""
    sep = F.lit("\x00")
    cols = [
        "focus", "focus_kind", "focus_dt", "focus_lang", "path", "value",
        "value_kind", "value_dt", "value_lang", "component", "severity",
        "message", "source_shape",
    ]
    hashed = F.sha2(
        F.concat_ws("\x00", *[F.coalesce(F.col(c), F.lit("\x01")) for c in cols]), 256
    )
    rid = F.concat(F.lit(RESULT_PREFIX), hashed.substr(1, 32))

    def t(pred: str, obj, kind, dt=None, lang=None):
        as_c = lambda x: x if not isinstance(x, str) else F.lit(x)  # noqa: E731
        null_s = F.lit(None).cast("string")
        return F.struct(
            F.lit(SH + pred).alias("pred"),
            obj.alias("obj"),
            as_c(kind).alias("obj_kind"),
            (as_c(dt) if dt is not None else null_s).alias("obj_dt"),
            (as_c(lang) if lang is not None else null_s).alias("obj_lang"),
        )

    null_s = F.lit(None).cast("string")
    path_is_iri = F.col("path").isNotNull() & (
        F.coalesce(F.col("path_kind"), F.lit("literal")) == "iri"
    )
    entries = F.array(
        t("__type__", F.lit(SH + "ValidationResult"), "iri"),
        t("focusNode", F.col("focus"), F.col("focus_kind"),
          F.col("focus_dt"), F.col("focus_lang")),
        F.when(
            F.col("path").isNotNull(),
            t("resultPath", F.col("path"),
              F.when(path_is_iri, F.lit("iri")).otherwise(F.lit("literal")),
              F.when(path_is_iri, null_s).otherwise(F.lit(XSD + "string"))),
        ),
        F.when(
            F.col("value").isNotNull(),
            t("value", F.col("value"), F.coalesce(F.col("value_kind"), F.lit("literal")),
              F.col("value_dt"), F.col("value_lang")),
        ),
        t("sourceConstraintComponent", F.col("component"), "iri"),
        t("resultSeverity", F.col("severity"), "iri"),
        t("sourceShape", F.col("source_shape"), "iri"),
        F.when(
            F.col("message").isNotNull(),
            t("resultMessage", F.col("message"), "literal", XSD + "string"),
        ),
    )
    result_triples = (
        report.dropDuplicates(cols)
        .select(rid.alias("subj"), F.explode(F.filter(entries, lambda x: x.isNotNull())).alias("e"))
        .select(
            "subj",
            F.when(F.col("e.pred") == SH + "__type__", F.lit(RDF + "type"))
            .otherwise(F.col("e.pred")).alias("pred"),
            F.col("e.obj").alias("obj"),
            F.col("e.obj_kind").alias("obj_kind"),
            F.col("e.obj_dt").alias("obj_dt"),
            F.col("e.obj_lang").alias("obj_lang"),
        )
    )
    result_links = report.dropDuplicates(cols).select(
        F.lit(report_iri).alias("subj"),
        F.lit(SH + "result").alias("pred"),
        rid.alias("obj"),
        F.lit("iri").alias("obj_kind"),
        null_s.alias("obj_dt"),
        null_s.alias("obj_lang"),
    )
    header = report.groupBy().agg(F.count("*").alias("n")).select(
        F.lit(report_iri).alias("subj"),
        F.lit(SH + "conforms").alias("pred"),
        F.when(F.col("n") == 0, F.lit("true")).otherwise(F.lit("false")).alias("obj"),
        F.lit("literal").alias("obj_kind"),
        F.lit(XSD + "boolean").alias("obj_dt"),
        null_s.alias("obj_lang"),
    ).unionByName(
        report.groupBy().agg(F.count("*").alias("n")).select(
            F.lit(report_iri).alias("subj"),
            F.lit(RDF + "type").alias("pred"),
            F.lit(SH + "ValidationReport").alias("obj"),
            F.lit("iri").alias("obj_kind"),
            null_s.alias("obj_dt"),
            null_s.alias("obj_lang"),
        )
    )
    out = header.unionByName(result_links).unionByName(result_triples)
    # widen to the canonical triple schema (provenance columns null)
    for f in TRIPLE_SCHEMA.fieldNames():
        if f not in out.columns:
            out = out.withColumn(f, F.lit(None).cast(dict(
                (x.name, x.dataType) for x in TRIPLE_SCHEMA.fields
            )[f]))
    return out.select(TRIPLE_SCHEMA.fieldNames())


# SHACL metamodel for the results graph itself (SPEC §3.6 subset):
# every report declares sh:conforms exactly once (boolean); every
# result has exactly one focusNode / component / severity, severity
# and component are IRIs.  Used to re-validate serialized reports.
REPORT_METAMODEL: list[tuple] = [
    (SH + "ReportShape", RDF + "type", SH + "NodeShape"),
    (SH + "ReportShape", SH + "targetClass", SH + "ValidationReport"),
    (SH + "ReportShape", SH + "property", SH + "ReportConforms"),
    (SH + "ReportConforms", SH + "path", SH + "conforms"),
    (SH + "ReportConforms", SH + "minCount", "1", "literal", XSD + "integer"),
    (SH + "ReportConforms", SH + "maxCount", "1", "literal", XSD + "integer"),
    (SH + "ReportConforms", SH + "datatype", XSD + "boolean"),
    (SH + "ResultShape", RDF + "type", SH + "NodeShape"),
    (SH + "ResultShape", SH + "targetClass", SH + "ValidationResult"),
    (SH + "ResultShape", SH + "property", SH + "ResFocus"),
    (SH + "ResFocus", SH + "path", SH + "focusNode"),
    (SH + "ResFocus", SH + "minCount", "1", "literal", XSD + "integer"),
    (SH + "ResFocus", SH + "maxCount", "1", "literal", XSD + "integer"),
    (SH + "ResultShape", SH + "property", SH + "ResComp"),
    (SH + "ResComp", SH + "path", SH + "sourceConstraintComponent"),
    (SH + "ResComp", SH + "minCount", "1", "literal", XSD + "integer"),
    (SH + "ResComp", SH + "maxCount", "1", "literal", XSD + "integer"),
    (SH + "ResComp", SH + "nodeKind", SH + "IRI"),
    (SH + "ResultShape", SH + "property", SH + "ResSev"),
    (SH + "ResSev", SH + "path", SH + "resultSeverity"),
    (SH + "ResSev", SH + "minCount", "1", "literal", XSD + "integer"),
    (SH + "ResSev", SH + "maxCount", "1", "literal", XSD + "integer"),
    (SH + "ResSev", SH + "nodeKind", SH + "IRI"),
]
