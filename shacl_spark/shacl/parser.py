"""Shapes-graph parser: triple rows → :class:`ShapesGraph` (SPEC §2).

Accepts the engine's canonical triple rows (tuples or a small
DataFrame — the shapes graph is driver-sized by design, SURVEY.md
§1.1).  RDF lists (sh:in, sh:languageIn, sh:and/or/xone, sequence
paths) arrive as skolemized first/rest chains; blank nodes are not
used anywhere in this engine (SURVEY.md §1.2).
"""

from __future__ import annotations

from collections import defaultdict

from shacl_spark.functions.terms import RDF, SH
from shacl_spark.shacl.shapes import (
    AlternativePath,
    InversePath,
    NodeShape,
    OneOrMorePath,
    Path,
    PredicatePath,
    PropertyShape,
    SequencePath,
    ShapesGraph,
    Term,
    ZeroOrMorePath,
    ZeroOrOnePath,
)

RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"
RDFS_CLASS = "http://www.w3.org/2000/01/rdf-schema#Class"


class _Graph:
    """Tiny driver-side index over the shapes triples (SPO + terms)."""

    def __init__(self, rows):
        self.po: dict[str, dict[str, list[Term]]] = defaultdict(lambda: defaultdict(list))
        self.triples = []
        for r in rows:
            r = tuple(r)
            subj, pred, obj = r[0], r[1], r[2]
            kind = r[3] if len(r) > 3 and r[3] else "iri"
            dt = r[4] if len(r) > 4 else None
            lang = r[5] if len(r) > 5 else None
            t = Term(obj, kind, dt, lang)
            self.po[subj][pred].append(t)
            self.triples.append((subj, pred, t))

    def objs(self, s: str, p: str) -> list[Term]:
        return self.po.get(s, {}).get(p, [])

    def obj(self, s: str, p: str) -> Term | None:
        vals = self.objs(s, p)
        return vals[0] if vals else None

    def iris(self, s: str, p: str) -> tuple[str, ...]:
        return tuple(t.value for t in self.objs(s, p))

    def rdf_list(self, head: str) -> list[Term]:
        out: list[Term] = []
        seen: set[str] = set()
        node = head
        while node and node != RDF_NIL:
            if node in seen:
                raise ValueError(f"cyclic rdf:List at {node}")
            seen.add(node)
            first = self.obj(node, RDF_FIRST)
            if first is None:
                break
            out.append(first)
            nxt = self.obj(node, RDF_REST)
            node = nxt.value if nxt else RDF_NIL
        return out


def _int(g: _Graph, s: str, p: str) -> int | None:
    t = g.obj(s, p)
    if t is None:
        return None
    try:
        return int(t.value)
    except ValueError:
        # wrong-datatype parameter (e.g. sh:minCount "two") — treated as
        # an ill-formed shape; surfaced as a parse error per SPEC §2
        raise ValueError(f"non-integer value {t.value!r} for {p} on {s}")


def _bool(g: _Graph, s: str, p: str) -> bool:
    t = g.obj(s, p)
    return t is not None and t.value in ("true", "1")


def _parse_path(g: _Graph, node: Term) -> Path:
    if node.kind == "literal":
        raise ValueError(f"sh:path must be an IRI/path node, got literal {node.value!r}")
    iri = node.value
    # a first/rest chain in path position is a sequence path
    if g.obj(iri, RDF_FIRST) is not None:
        return SequencePath(tuple(_parse_path(g, t) for t in g.rdf_list(iri)))
    for pred, cls in (
        (SH + "inversePath", InversePath),
        (SH + "zeroOrMorePath", ZeroOrMorePath),
        (SH + "oneOrMorePath", OneOrMorePath),
        (SH + "zeroOrOnePath", ZeroOrOnePath),
    ):
        inner = g.obj(iri, pred)
        if inner is not None:
            return cls(_parse_path(g, inner))
    alt = g.obj(iri, SH + "alternativePath")
    if alt is not None:
        return AlternativePath(tuple(_parse_path(g, t) for t in g.rdf_list(alt.value)))
    return PredicatePath(iri)


def _shape_list_groups(g: _Graph, s: str, p: str) -> tuple[tuple[str, ...], ...]:
    """Each sh:and/or/xone occurrence carries an rdf:List of member shapes."""
    return tuple(
        tuple(t.value for t in g.rdf_list(head.value)) for head in g.objs(s, p)
    )


def _collect_shape_iris(g: _Graph) -> set[str]:
    iris: set[str] = set()
    shape_ref_preds = {
        SH + "property",
        SH + "node",
        SH + "not",
        SH + "qualifiedValueShape",
    }
    list_ref_preds = {SH + "and", SH + "or", SH + "xone"}
    for s, p, o in g.triples:
        if p == RDF_TYPE and o.value in (SH + "NodeShape", SH + "PropertyShape"):
            iris.add(s)
        elif p in shape_ref_preds:
            iris.add(o.value)
        elif p in list_ref_preds:
            iris.update(t.value for t in g.rdf_list(o.value))
        elif p == SH + "path":
            iris.add(s)
        elif p.startswith(SH + "target"):
            iris.add(s)
    return iris


def parse_shapes_graph(rows_or_df) -> ShapesGraph:
    """Parse triples (rows, or a small DataFrame which is collected)
    into a validated, acyclic :class:`ShapesGraph`."""
    if hasattr(rows_or_df, "collect"):  # DataFrame
        rows = [
            (r["subj"], r["pred"], r["obj"], r["obj_kind"], r["obj_dt"], r["obj_lang"])
            for r in rows_or_df.collect()
        ]
    else:
        rows = list(rows_or_df)
    g = _Graph(rows)
    sg = ShapesGraph()
    sg.entailments = tuple(
        sorted({r[2] for r in rows if r[1] == SH + "entailment"})
    )

    for iri in sorted(_collect_shape_iris(g)):
        path_term = g.obj(iri, SH + "path")
        is_prop = path_term is not None or (SH + "PropertyShape") in (
            t.value for t in g.objs(iri, RDF_TYPE)
        )
        shape: NodeShape | PropertyShape
        shape = PropertyShape(iri=iri) if is_prop else NodeShape(iri=iri)
        if is_prop:
            if path_term is None:
                raise ValueError(f"property shape {iri} has no sh:path (SPEC §2.3.2)")
            shape.path = _parse_path(g, path_term)

        shape.deactivated = _bool(g, iri, SH + "deactivated")
        sev = g.obj(iri, SH + "severity")
        if sev:
            shape.severity = sev.value
        shape.messages = tuple(t.value for t in g.objs(iri, SH + "message"))

        shape.target_nodes = tuple(g.objs(iri, SH + "targetNode"))
        shape.target_classes = g.iris(iri, SH + "targetClass")
        shape.target_subjects_of = g.iris(iri, SH + "targetSubjectsOf")
        shape.target_objects_of = g.iris(iri, SH + "targetObjectsOf")
        shape.implicit_class_target = RDFS_CLASS in (
            t.value for t in g.objs(iri, RDF_TYPE)
        )

        shape.class_ = g.iris(iri, SH + "class")
        dt = g.obj(iri, SH + "datatype")
        shape.datatype = dt.value if dt else None
        nk = g.obj(iri, SH + "nodeKind")
        shape.node_kind = nk.value if nk else None

        shape.min_count = _int(g, iri, SH + "minCount")
        shape.max_count = _int(g, iri, SH + "maxCount")

        shape.min_exclusive = g.obj(iri, SH + "minExclusive")
        shape.min_inclusive = g.obj(iri, SH + "minInclusive")
        shape.max_exclusive = g.obj(iri, SH + "maxExclusive")
        shape.max_inclusive = g.obj(iri, SH + "maxInclusive")

        shape.min_length = _int(g, iri, SH + "minLength")
        shape.max_length = _int(g, iri, SH + "maxLength")
        pat = g.obj(iri, SH + "pattern")
        shape.pattern = pat.value if pat else None
        fl = g.obj(iri, SH + "flags")
        shape.flags = fl.value if fl else None
        li = g.obj(iri, SH + "languageIn")
        shape.language_in = (
            tuple(t.value for t in g.rdf_list(li.value)) if li else ()
        )
        shape.unique_lang = _bool(g, iri, SH + "uniqueLang")

        shape.equals = g.iris(iri, SH + "equals")
        shape.disjoint = g.iris(iri, SH + "disjoint")
        shape.less_than = g.iris(iri, SH + "lessThan")
        shape.less_than_or_equals = g.iris(iri, SH + "lessThanOrEquals")

        shape.not_ = g.iris(iri, SH + "not")
        shape.and_ = _shape_list_groups(g, iri, SH + "and")
        shape.or_ = _shape_list_groups(g, iri, SH + "or")
        shape.xone = _shape_list_groups(g, iri, SH + "xone")

        shape.node = g.iris(iri, SH + "node")
        shape.property = g.iris(iri, SH + "property")
        qvs = g.obj(iri, SH + "qualifiedValueShape")
        shape.qualified_value_shape = qvs.value if qvs else None
        shape.qualified_min_count = _int(g, iri, SH + "qualifiedMinCount")
        shape.qualified_max_count = _int(g, iri, SH + "qualifiedMaxCount")
        shape.qualified_disjoint = _bool(g, iri, SH + "qualifiedValueShapesDisjoint")

        shape.closed = _bool(g, iri, SH + "closed")
        shape.ignored_properties = (
            tuple(
                t.value
                for t in g.rdf_list(g.obj(iri, SH + "ignoredProperties").value)
            )
            if g.obj(iri, SH + "ignoredProperties")
            else ()
        )
        shape.has_value = tuple(g.objs(iri, SH + "hasValue"))
        in_head = g.obj(iri, SH + "in")
        shape.in_ = tuple(g.rdf_list(in_head.value)) if in_head else None

        # SPARQL-based constraints (SPEC §5): sh:sparql → node with
        # sh:select (required) + optional sh:message; sh:prefixes is
        # not resolved here — inline PREFIX declarations are supported
        # by the translator directly
        sparql_constraints = []
        for sp_node in g.objs(iri, SH + "sparql"):
            sel = g.obj(sp_node.value, SH + "select")
            if sel is None:
                raise ValueError(f"sh:sparql node {sp_node.value} has no sh:select")
            sp_msg = g.obj(sp_node.value, SH + "message")
            sparql_constraints.append((sel.value, sp_msg.value if sp_msg else None))
        shape.sparql = tuple(sparql_constraints)

        sg.shapes[iri] = shape

    sg.check_acyclic()
    return sg
