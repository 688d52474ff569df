from shacl_spark.plans.kg_pipeline import build_kg  # noqa: F401
