from shacl_spark.kg.extract import extract_triples, provenance_triples, mention_triples  # noqa: F401
