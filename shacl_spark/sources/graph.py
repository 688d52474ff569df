"""Format dispatch for RDF graph inputs — one entry point for every
interchange reader the engine ships, keyed by file extension:

    .ttl/.turtle    driver-side Turtle parser (shapes-sized inputs)
    .nt/.ntriples   distributed N-Triples reader (sources/ntriples.py)
    .jsonl/.jsonld  distributed JSON-LD-lines reader (sources/jsonld.py)
    .rdf/.rdfxml    distributed RDF/XML reader (sources/rdfxml.py)
    anything else   parquet directory in the canonical §1.3 schema

Used by jobs/validate_graph.py and jobs/query_graph.py so every CLI
accepts the same data formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_graph(
    spark: SparkSession, path: str, jsonld_context: dict | None = None
) -> DataFrame:
    if path.endswith(".ttl") or path.endswith(".turtle"):
        from shacl_spark.functions.terms import triples_from_rows
        from shacl_spark.shacl.turtle import parse_turtle_file

        return triples_from_rows(spark, parse_turtle_file(path))
    if path.endswith(".nt") or path.endswith(".ntriples"):
        from shacl_spark.sources.ntriples import read_ntriples

        return read_ntriples(spark, path)
    if path.endswith(".jsonl") or path.endswith(".jsonld"):
        from shacl_spark.sources.jsonld import read_jsonld_lines

        return read_jsonld_lines(spark, path, context=jsonld_context)
    if path.endswith(".rdf") or path.endswith(".rdfxml"):
        from shacl_spark.sources.rdfxml import read_rdfxml

        return read_rdfxml(spark, path)
    return spark.read.parquet(path)
