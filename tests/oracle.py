"""Compatibility shim: the spec-literal SHACL interpreter moved to
shacl_spark/shacl/interp.py in r05 (it doubles as the engine's
small-slice local validation path for incremental revalidation); tests
keep importing it from here."""

from shacl_spark.shacl.interp import *  # noqa: F401,F403
from shacl_spark.shacl.interp import (  # noqa: F401
    Oracle,
    Result,
    Store,
    Term,
    precision_recall,
    report_set,
    tkey,
)
