from shacl_spark.operators.fixpoint import iterate_to_fixpoint  # noqa: F401
