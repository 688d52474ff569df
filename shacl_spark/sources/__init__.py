from shacl_spark.sources.corpus import synth_corpus, CORPUS_SCHEMA  # noqa: F401
from shacl_spark.sources.tables import load_table, load_tables, TPCH_TABLES  # noqa: F401
