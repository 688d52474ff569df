from shacl_spark.shacl.shapes import (  # noqa: F401
    AlternativePath,
    InversePath,
    NodeShape,
    Path,
    PredicatePath,
    PropertyShape,
    SequencePath,
    ZeroOrMorePath,
    ZeroOrOnePath,
    OneOrMorePath,
)
from shacl_spark.shacl.parser import parse_shapes_graph  # noqa: F401
from shacl_spark.shacl.turtle import parse_turtle, parse_turtle_file  # noqa: F401
from shacl_spark.shacl.report import REPORT_METAMODEL, report_to_triples  # noqa: F401
from shacl_spark.shacl.engine import (  # noqa: F401
    REPORT_SCHEMA,
    Validator,
    conforms,
    summarize,
    validate,
)
