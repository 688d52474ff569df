"""Generic distributed fixpoint iteration (SURVEY.md §4.2).

Catalyst has no recursion operator, so transitive closures (subclass
hierarchies, sh:zeroOrMorePath, connected components) are driver-side
``while`` loops over DataFrame steps.  Two disciplines keep this safe
at scale:

- ``localCheckpoint(eager=True)`` every iteration truncates lineage —
  without it the plan doubles per iteration and the optimizer chokes
  after ~15 rounds;
- the frontier is deduplicated against the accumulator (left_anti) so
  each row is expanded exactly once: the loop does BFS, touching
  O(closure) rows total, not O(closure × depth).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def iterate_to_fixpoint(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    key_cols: list[str],
    max_iter: int = 64,
) -> DataFrame:
    """BFS closure: repeatedly apply ``step`` to the frontier, keeping
    rows whose ``key_cols`` were never seen, until the frontier empties.

    Returns the accumulated distinct rows (seed included).  ``step``
    must return a frame with (at least) ``key_cols``.
    """
    acc = seed.dropDuplicates(key_cols).localCheckpoint(eager=True)
    frontier = acc
    for _ in range(max_iter):
        candidates = step(frontier).dropDuplicates(key_cols)
        # rename the accumulator side: candidates often derive from acc, and
        # a raw self-join condition hits ambiguous attribute resolution
        seen = acc.select([F.col(c).alias(f"__seen_{c}") for c in key_cols])
        # null-safe anti-join: plain left_anti uses EqualTo, under which a
        # NULL key never matches the accumulator and the loop never drains
        cond = None
        for c in key_cols:
            eq = F.col(c).eqNullSafe(F.col(f"__seen_{c}"))
            cond = eq if cond is None else (cond & eq)
        new = candidates.join(seen, cond, "left_anti").localCheckpoint(eager=True)
        if new.isEmpty():
            return acc
        acc = acc.unionByName(new, allowMissingColumns=True).localCheckpoint(eager=True)
        frontier = new
    raise RuntimeError(f"fixpoint did not converge in {max_iter} iterations")
