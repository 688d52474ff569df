"""SHACL shapes object model (SPEC §2; SURVEY.md §1.1 row 2).

The shapes graph is small (the shacl-shacl metamodel is a few hundred
triples), so it is parsed ONCE on the driver into these plain
dataclasses and effectively broadcast by closure capture — shapes are
never a distributed join side.  All constraint parameters become
literal-rich Column expressions at compile time, which Catalyst
constant-folds.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# --- property paths (SPEC §2.3.1) -------------------------------------------


class Path:
    def describe(self) -> str:  # SPARQL-ish surface form for reports
        raise NotImplementedError


@dataclass(frozen=True)
class PredicatePath(Path):
    iri: str

    def describe(self) -> str:
        return self.iri


@dataclass(frozen=True)
class InversePath(Path):
    inner: Path

    def describe(self) -> str:
        return f"^{self.inner.describe()}"


@dataclass(frozen=True)
class SequencePath(Path):
    steps: tuple[Path, ...]

    def describe(self) -> str:
        return "/".join(s.describe() for s in self.steps)


@dataclass(frozen=True)
class AlternativePath(Path):
    options: tuple[Path, ...]

    def describe(self) -> str:
        return "|".join(o.describe() for o in self.options)


@dataclass(frozen=True)
class ZeroOrMorePath(Path):
    inner: Path

    def describe(self) -> str:
        return f"({self.inner.describe()})*"


@dataclass(frozen=True)
class OneOrMorePath(Path):
    inner: Path

    def describe(self) -> str:
        return f"({self.inner.describe()})+"


@dataclass(frozen=True)
class ZeroOrOnePath(Path):
    inner: Path

    def describe(self) -> str:
        return f"({self.inner.describe()})?"


# --- literal terms in parameter position ------------------------------------


@dataclass(frozen=True)
class Term:
    """An RDF term as it appears in a constraint parameter (sh:in list,
    sh:hasValue, range bounds...)."""

    value: str
    kind: str = "iri"  # 'iri' | 'literal'
    dt: str | None = None
    lang: str | None = None


# --- shapes ------------------------------------------------------------------


@dataclass
class Shape:
    iri: str
    deactivated: bool = False
    severity: str = "http://www.w3.org/ns/shacl#Violation"
    messages: tuple[str, ...] = ()

    # targets (SPEC §2.1.3)
    target_nodes: tuple[Term, ...] = ()
    target_classes: tuple[str, ...] = ()
    target_subjects_of: tuple[str, ...] = ()
    target_objects_of: tuple[str, ...] = ()
    implicit_class_target: bool = False  # shape is itself an rdfs:Class

    # value-type (SPEC §4.1)
    class_: tuple[str, ...] = ()
    datatype: str | None = None
    node_kind: str | None = None

    # cardinality (§4.2) — property shapes only
    min_count: int | None = None
    max_count: int | None = None

    # value range (§4.3)
    min_exclusive: Term | None = None
    min_inclusive: Term | None = None
    max_exclusive: Term | None = None
    max_inclusive: Term | None = None

    # string-based (§4.4)
    min_length: int | None = None
    max_length: int | None = None
    pattern: str | None = None
    flags: str | None = None
    language_in: tuple[str, ...] = ()
    unique_lang: bool = False

    # property-pair (§4.5)
    equals: tuple[str, ...] = ()
    disjoint: tuple[str, ...] = ()
    less_than: tuple[str, ...] = ()
    less_than_or_equals: tuple[str, ...] = ()

    # logical (§4.6) — shape IRIs, resolved via the registry
    not_: tuple[str, ...] = ()
    and_: tuple[tuple[str, ...], ...] = ()
    or_: tuple[tuple[str, ...], ...] = ()
    xone: tuple[tuple[str, ...], ...] = ()

    # shape-based (§4.7)
    node: tuple[str, ...] = ()
    property: tuple[str, ...] = ()  # property-shape IRIs
    qualified_value_shape: str | None = None
    qualified_min_count: int | None = None
    qualified_max_count: int | None = None
    qualified_disjoint: bool = False

    # SPARQL-based constraints (SPEC §5) — (select_text, message|None)
    sparql: tuple[tuple[str, str | None], ...] = ()

    # other (§4.8)
    closed: bool = False
    ignored_properties: tuple[str, ...] = ()
    has_value: tuple[Term, ...] = ()
    in_: tuple[Term, ...] | None = None

    def has_targets(self) -> bool:
        return bool(
            self.target_nodes
            or self.target_classes
            or self.target_subjects_of
            or self.target_objects_of
            or self.implicit_class_target
        )

    def referenced_shapes(self) -> set[str]:
        refs: set[str] = set(self.not_) | set(self.node) | set(self.property)
        for group in self.and_ + self.or_ + self.xone:
            refs |= set(group)
        if self.qualified_value_shape:
            refs.add(self.qualified_value_shape)
        return refs


@dataclass
class NodeShape(Shape):
    pass


@dataclass
class PropertyShape(Shape):
    path: Path | None = None


@dataclass
class ShapesGraph:
    """Registry of all parsed shapes + the DAG order for evaluation."""

    shapes: dict[str, Shape] = field(default_factory=dict)
    # sh:entailment declarations found in the shapes graph (SPEC §1.5):
    # validate() applies supported regimes (RDFS) to the data graph and
    # MUST fail on unsupported ones
    entailments: tuple = ()

    def __getitem__(self, iri: str) -> Shape:
        return self.shapes[iri]

    def entry_shapes(self) -> list[Shape]:
        return [s for s in self.shapes.values() if s.has_targets()]

    def sibling_qualified(self, ps_iri: str) -> list[str]:
        """Qualified value shapes of sibling property shapes (for
        sh:qualifiedValueShapesDisjoint, SPEC §4.7.3)."""
        out: list[str] = []
        for parent in self.shapes.values():
            if ps_iri in parent.property:
                for sib_iri in parent.property:
                    if sib_iri == ps_iri:
                        continue
                    sib = self.shapes.get(sib_iri)
                    if sib and sib.qualified_value_shape:
                        out.append(sib.qualified_value_shape)
        return out

    def check_acyclic(self) -> None:
        """SHACL core leaves recursive shapes undefined — we reject them
        (SURVEY.md §2.B B18)."""
        WHITE, GREY, BLACK = 0, 1, 2
        color = {iri: WHITE for iri in self.shapes}
        stack: list[str] = []

        def visit(iri: str) -> None:
            color[iri] = GREY
            stack.append(iri)
            for ref in self.shapes[iri].referenced_shapes():
                if ref not in self.shapes:
                    continue
                if color[ref] == GREY:
                    cyc = stack[stack.index(ref):] + [ref]
                    raise ValueError(f"recursive shape reference: {' -> '.join(cyc)}")
                if color[ref] == WHITE:
                    visit(ref)
            stack.pop()
            color[iri] = BLACK

        for iri in self.shapes:
            if color[iri] == WHITE:
                visit(iri)
