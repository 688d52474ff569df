"""SPARQL-based constraints (SPEC §5 sh:sparql) — a declarative subset
translated to DataFrame algebra, NOT an interpreter: each basic graph
pattern becomes one equi-join against the triples frame (Catalyst
reorders/broadcasts), each FILTER becomes a Column predicate pushed
into the join tree.

Supported subset (VERDICT r01 "What's missing" #4 — the shacl-shacl
metamodel + typical data-quality constraints fit in it):

- ``PREFIX`` declarations, then ``SELECT ?this [?value ...] WHERE {...}``
- triple patterns over variables / IRIs / literals; ``a`` for rdf:type;
  ``$this``/``?this`` is pre-bound to the focus node (SPEC §5.3.1);
  ``$PATH`` in a property shape's constraint is substituted with the
  shape's predicate path (SPEC §5.3.3 — predicate paths only; composite
  paths would need SPARQL path syntax the BGP translator doesn't model)
- ``OPTIONAL { pattern* }`` groups (r03): each group is evaluated as a
  unit over its anchor variables and LEFT-joined back, so a failed
  group leaves ALL of its variables unbound (never a partial prefix)
- ``{ pattern* } UNION { pattern* }`` statements (r04, any number of
  arms): each arm extends the current solutions independently and the
  results are unioned; a variable bound by only some arms is unbound
  (NULL → type-error-false in FILTERs) in the others' solutions
- ``FILTER EXISTS { pattern* }`` / ``FILTER NOT EXISTS { pattern* }``
  (r04): the group is evaluated over the distinct shared-variable
  bindings and SEMI- (EXISTS) or ANTI-joined (NOT EXISTS) back — the
  engine's native join shapes for the quantifiers; group-local vars
  never escape (standard SPARQL scoping).  An anchor left unbound by a
  failed OPTIONAL counts as "no match" (EXISTS false), a documented
  approximation of substitution semantics
- ``FILTER ( expr )`` with ``&& || !``, comparisons
  ``= != < <= > >=`` (term identity for ``=``/``!=`` on raw terms,
  numeric when both sides cast, else string), ``regex(x, "re")``,
  ``str()``, ``datatype()``, ``isIRI/isLiteral/isBlank``,
  ``bound(?x)``; comparisons over unbound optional vars are SPARQL
  type errors → false

- aggregation (r05): ``SELECT ?this (COUNT(?x) AS ?n) ... GROUP BY
  ?this [?more] HAVING (COUNT(?x) > k)`` — COUNT(*)/COUNT(?v)/SUM(?v)
  (integer-valued), non-aggregate selected vars must be grouped, ?this
  must be grouped.  Translates to ONE ``groupBy().agg()`` (map-side
  partial agg + a single shuffle on the focus-dominated keys).

Violations are the solution rows: focus = ?this, value = ?value when
selected (SPEC §5.3.2).

Standalone query surface (r05, constraint=False): ``SELECT [DISTINCT]``
over any bound variables with bag semantics, ``GROUP BY`` without
?this, ``ORDER BY ASC/DESC`` + ``LIMIT`` (top-k), ``CONSTRUCT
{ template }`` (per-solution instantiation, SPARQL skip rules, graph
set semantics) and ``ASK`` (lazy one-row boolean).  Entry points:
``sparql_select`` / ``sparql_query``; CLI: jobs/query_graph.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shacl_spark.functions.terms import RDF, XSD

# --- AST ----------------------------------------------------------------------


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    value: str


@dataclass(frozen=True)
class Lit:
    value: str
    dt: str | None = None
    lang: str | None = None


@dataclass(frozen=True)
class Pattern:
    s: object
    p: str
    o: object


@dataclass(frozen=True)
class Call:
    fn: str
    args: tuple


@dataclass(frozen=True)
class BinOp:
    op: str
    left: object
    right: object


@dataclass(frozen=True)
class Not:
    inner: object


@dataclass(frozen=True)
class Agg:
    """Aggregate call — ``COUNT(*)`` / ``COUNT(?v)`` / ``SUM(?v)``
    (r05: the cardinality-over-join constraint shape, VERDICT r04 #5).
    SUM is integer-valued in this subset (values cast to long; non-
    numeric lexical forms aggregate as NULL → skipped, SPARQL's error-
    skipping behavior for malformed numerics)."""

    fn: str  # 'count' | 'sum' | 'min' | 'max' | 'avg' | 'group_concat'
    var: str | None  # None = COUNT(*)
    # GROUP_CONCAT separator (r05); None for every other aggregate
    sep: str | None = None


@dataclass
class Query:
    select: list[str] = field(default_factory=list)
    patterns: list[Pattern] = field(default_factory=list)
    filters: list[object] = field(default_factory=list)
    # OPTIONAL { pattern* } groups (r03): each is a list of patterns
    # left-joined as a unit — a failed group leaves its vars unbound
    optionals: list[list[Pattern]] = field(default_factory=list)
    # FILTER [NOT] EXISTS { pattern* } groups (r04): (positive, group);
    # translated to a semi/anti join on the shared variables.  Vars
    # that appear ONLY inside the group are locally scoped (standard
    # SPARQL: EXISTS never binds outward).
    exists: list[tuple[bool, list[Pattern]]] = field(default_factory=list)
    # { arm } UNION { arm } [UNION ...] statements (r04): each entry is
    # the list of arms; solutions are extended by ANY arm, vars missing
    # from the matching arm stay unbound (NULL)
    unions: list[list[list[Pattern]]] = field(default_factory=list)
    # TEXTUAL statement order (r04 review #2): SPARQL joins pattern /
    # OPTIONAL / UNION statements left-to-right, so a UNION arm that
    # consumes an OPTIONAL-bound variable means something different
    # before vs after that OPTIONAL.  Entries: ("pattern", Pattern),
    # ("optional", [Pattern...]), ("union", [[Pattern...]...]).  The
    # flat fields above stay populated for footprint analysis.
    statements: list[tuple[str, object]] = field(default_factory=list)
    # aggregation (r05): SELECT (AGG(...) AS ?alias) projections,
    # GROUP BY vars, HAVING expression (may contain Agg atoms)
    aggregates: list[tuple[Agg, str]] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    having: object | None = None
    # SELECT DISTINCT (r05 select surface): set semantics on the
    # projected solutions.  Constraint mode always distincts (violation
    # sets); this flag only matters for translate_select.
    distinct: bool = False
    # ORDER BY [DESC(?v)|ASC(?v)|?v]... LIMIT n (r05 select surface).
    # Ordering subset: numeric-castable literals sort numerically and
    # before non-numeric terms; everything else by lexical form;
    # unbound last.  LIMIT compiles to orderBy().limit() →
    # TakeOrderedAndProject (top-k, no global sort materialization).
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (var, desc)
    limit: int | None = None
    # query form (r05): 'select' | 'construct' | 'ask'.  CONSTRUCT
    # carries its template patterns; ASK has neither projection nor
    # template.  Constraint mode only ever parses SELECT.
    form: str = "select"
    template: list[Pattern] = field(default_factory=list)
    # DESCRIBE targets (r05): Var / Iri entries; WHERE clause optional
    describe: list = field(default_factory=list)


# --- tokenizer / parser ---------------------------------------------------------

_TOK = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iri><[^<>\s]*>)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<num>[+-]?\d+(?:\.\d+)?)
  | (?P<var>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<kw>\b(?:PREFIX|SELECT|WHERE|FILTER|a|true|false)\b)
  | (?P<pname>[A-Za-z_][A-Za-z0-9_\-]*:[A-Za-z0-9_\-.]*|:[A-Za-z0-9_\-.]*)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>&&|\|\||!=|<=|>=|[=<>!*])
  | (?P<dt>\^\^)
  | (?P<punct>[{}().,;])
    """,
    re.VERBOSE | re.IGNORECASE,
)


class SparqlParser:
    def __init__(self, text: str, constraint: bool = True):
        # constraint mode (sh:sparql, SPEC §5): ?this is the pre-bound
        # focus variable and must survive GROUP BY.  The standalone
        # SELECT surface (translate_select) parses with constraint=False
        # — no special variable, DISTINCT allowed.
        self.constraint = constraint
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOK.match(text, pos)
            if m is None:
                raise ValueError(f"sparql: cannot tokenize at {text[pos:pos+25]!r}")
            pos = m.end()
            if m.lastgroup != "ws":
                self.toks.append((m.lastgroup, m.group()))
        self.i = 0
        self.prefixes: dict[str, str] = {}

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, kind=None, val=None):
        k, v = self._next()
        if (kind and k != kind) or (val and (v or "").upper() != val.upper()):
            raise ValueError(f"sparql: expected {val or kind}, got {v!r}")
        return v

    def parse(self) -> Query:
        q = Query()
        while self._peek()[1] and self._peek()[1].upper() == "PREFIX":
            self._next()
            pk, pv = self._next()
            if pk != "pname" or not pv.endswith(":"):
                raise ValueError(f"sparql: bad prefix {pv!r}")
            iri = self._expect("iri")
            self.prefixes[pv[:-1]] = iri[1:-1]
        fk, fv = self._peek()
        form = (fv or "").upper()
        has_body = True
        if not self.constraint and form in ("CONSTRUCT", "ASK", "DESCRIBE"):
            self._next()
            q.form = form.lower()
            if q.form == "describe":
                # DESCRIBE ?v... / <iri>... [WHERE { ... }] — the body
                # is optional for constant targets (SPARQL grammar)
                while True:
                    k, v = self._peek()
                    if k == "var":
                        q.describe.append(Var(self._next()[1][1:].lower()))
                    elif k == "iri":
                        q.describe.append(Iri(self._next()[1][1:-1]))
                    elif k == "pname":
                        q.describe.append(Iri(self._expand(self._next()[1])))
                    else:
                        break
                if not q.describe:
                    raise ValueError(
                        "sparql: DESCRIBE needs at least one ?var or IRI"
                    )
                nk, nv = self._peek()
                if nk is None:
                    has_body = False
                else:
                    if (nv or "").upper() == "WHERE":
                        self._next()
                    self._expect("punct", "{")
            if q.form == "construct":
                # CONSTRUCT { template } WHERE { ... } — template terms
                # are vars / IRIs / literals; literal subjects are
                # invalid RDF and rejected here (SPARQL grammar does
                # the same syntactically)
                self._expect("punct", "{")
                while self._peek() != ("punct", "}"):
                    if self._peek()[0] is None:
                        raise ValueError("sparql: unterminated CONSTRUCT template")
                    pat = self._pattern()
                    if isinstance(pat.s, Lit):
                        raise ValueError(
                            "sparql: literal subject in CONSTRUCT template"
                        )
                    q.template.append(pat)
                self._expect("punct", "}")
                if not q.template:
                    raise ValueError("sparql: empty CONSTRUCT template")
            # WHERE keyword is optional for CONSTRUCT/ASK (grammar); the
            # group block itself is not (DESCRIBE consumed its own above)
            if q.form != "describe":
                if (self._peek()[1] or "").upper() == "WHERE":
                    self._next()
                self._expect("punct", "{")
        else:
            self._expect(val="SELECT")
            if (
                self._peek()[0] == "ident"
                and (self._peek()[1] or "").upper() == "DISTINCT"
            ):
                self._next()
                q.distinct = True
            while True:
                k, v = self._peek()
                if k == "var":
                    q.select.append(self._next()[1][1:].lower())
                    continue
                if k == "punct" and v == "(":
                    # (COUNT(?x) AS ?alias) / (SUM(?x) AS ?n) projection
                    self._next()
                    agg = self._agg()
                    self._expect("ident", "AS")
                    ak, av = self._next()
                    if ak != "var":
                        raise ValueError("sparql: AS needs a variable alias")
                    alias = av[1:].lower()
                    self._expect("punct", ")")
                    q.aggregates.append((agg, alias))
                    q.select.append(alias)
                    continue
                break
            if not q.select:
                raise ValueError("sparql: SELECT needs at least ?this")
            self._expect(val="WHERE")
            self._expect("punct", "{")
        while has_body:  # False only for body-less DESCRIBE <iri>...
            k, v = self._peek()
            if k == "punct" and v == "}":
                self._next()
                break
            if k is None:
                raise ValueError("sparql: unterminated WHERE block")
            if k == "kw" and v.upper() == "FILTER":
                self._next()
                nk, nv = self._peek()
                if nk == "ident" and (nv or "").upper() in ("EXISTS", "NOT"):
                    positive = nv.upper() == "EXISTS"
                    self._next()
                    if not positive:
                        self._expect("ident", "EXISTS")
                    self._expect("punct", "{")
                    group: list[Pattern] = []
                    while self._peek() != ("punct", "}"):
                        if self._peek()[0] is None:
                            raise ValueError("sparql: unterminated EXISTS block")
                        group.append(self._pattern())
                    self._expect("punct", "}")
                    if not group:
                        raise ValueError("sparql: empty EXISTS block")
                    q.exists.append((positive, group))
                    if self._peek() == ("punct", "."):
                        self._next()
                    continue
                self._expect("punct", "(")
                q.filters.append(self._expr())
                self._expect("punct", ")")
                if self._peek() == ("punct", "."):
                    self._next()
                continue
            if (
                k == "punct"
                and v == "{"
                and self.i + 1 < len(self.toks)
                and (self.toks[self.i + 1][1] or "").upper() == "SELECT"
            ):
                # { SELECT ... } — a subquery (r05, standalone surface
                # only): evaluated bottom-up, joined on its projected
                # variables with SPARQL join compatibility
                if self.constraint:
                    raise ValueError(
                        "sparql: subqueries are unsupported in the "
                        "sh:sparql subset"
                    )
                self._next()
                q.statements.append(("subquery", self._subselect()))
                if self._peek() == ("punct", "."):
                    self._next()
                continue
            if k == "punct" and v == "{":
                # group blocks: { arm } UNION { arm } [UNION { arm }...]
                arms = [self._group_block()]
                while (
                    self._peek()[0] == "ident"
                    and (self._peek()[1] or "").upper() == "UNION"
                ):
                    self._next()
                    arms.append(self._group_block())
                if len(arms) < 2:
                    raise ValueError("sparql: bare group needs UNION")
                q.unions.append(arms)
                q.statements.append(("union", arms))
                if self._peek() == ("punct", "."):
                    self._next()
                continue
            if k == "ident" and v.upper() == "OPTIONAL":
                self._next()
                self._expect("punct", "{")
                group: list[Pattern] = []
                while self._peek() != ("punct", "}"):
                    if self._peek()[0] is None:
                        raise ValueError("sparql: unterminated OPTIONAL block")
                    group.append(self._pattern())
                self._expect("punct", "}")
                if not group:
                    raise ValueError("sparql: empty OPTIONAL block")
                q.optionals.append(group)
                q.statements.append(("optional", group))
                if self._peek() == ("punct", "."):
                    self._next()
                continue
            if k == "ident" and v.upper() == "MINUS":
                # MINUS { pattern* } (r05, standalone surface only):
                # remove solutions compatible with a group solution on
                # the shared variables; disjoint domains remove nothing
                # (the spec's MINUS-vs-NOT-EXISTS distinction)
                if self.constraint:
                    raise ValueError(
                        "sparql: MINUS is unsupported in the sh:sparql subset"
                    )
                self._next()
                group = self._group_block()
                q.statements.append(("minus", group))
                if self._peek() == ("punct", "."):
                    self._next()
                continue
            if k == "ident" and v.upper() == "VALUES":
                # VALUES ?v { t... } / VALUES (?a ?b) { (t t)... } (r05,
                # standalone surface only): inline solution data joined
                # in (broadcast — a parameter block is always tiny);
                # UNDEF leaves the var unbound for that row
                if self.constraint:
                    raise ValueError(
                        "sparql: VALUES is unsupported in the sh:sparql subset"
                    )
                self._next()
                vk, vv = self._peek()
                vars_: list[str] = []
                if vk == "var":
                    vars_.append(self._next()[1][1:].lower())
                    rowparens = False
                elif vk == "punct" and vv == "(":
                    self._next()
                    while self._peek()[0] == "var":
                        vars_.append(self._next()[1][1:].lower())
                    self._expect("punct", ")")
                    rowparens = True
                else:
                    raise ValueError("sparql: VALUES needs ?var or (?vars)")
                if not vars_ or len(set(vars_)) != len(vars_):
                    raise ValueError("sparql: VALUES needs distinct variables")
                self._expect("punct", "{")
                rows: list[list] = []
                while self._peek() != ("punct", "}"):
                    if self._peek()[0] is None:
                        raise ValueError("sparql: unterminated VALUES block")
                    if rowparens:
                        self._expect("punct", "(")
                        row = [self._values_term() for _ in vars_]
                        self._expect("punct", ")")
                    else:
                        row = [self._values_term()]
                    rows.append(row)
                self._expect("punct", "}")
                if not rows:
                    raise ValueError("sparql: empty VALUES block")
                q.statements.append(("values", (vars_, rows)))
                if self._peek() == ("punct", "."):
                    self._next()
                continue
            pat = self._pattern()
            q.patterns.append(pat)
            q.statements.append(("pattern", pat))
        k, v = self._peek()
        if k == "ident" and (v or "").upper() == "GROUP":
            self._next()
            self._expect("ident", "BY")
            while self._peek()[0] == "var":
                q.group_by.append(self._next()[1][1:].lower())
            if not q.group_by:
                raise ValueError("sparql: GROUP BY needs at least one variable")
        k, v = self._peek()
        if k == "ident" and (v or "").upper() == "HAVING":
            self._next()
            self._expect("punct", "(")
            q.having = self._expr()
            self._expect("punct", ")")
        k, v = self._peek()
        if k == "ident" and (v or "").upper() == "ORDER":
            self._next()
            self._expect("ident", "BY")
            while True:
                k, v = self._peek()
                if k == "var":
                    q.order_by.append((self._next()[1][1:].lower(), False))
                    continue
                if k == "ident" and (v or "").upper() in ("ASC", "DESC"):
                    desc = v.upper() == "DESC"
                    self._next()
                    self._expect("punct", "(")
                    vk, vv = self._next()
                    if vk != "var":
                        raise ValueError("sparql: ORDER BY ASC/DESC needs a var")
                    q.order_by.append((vv[1:].lower(), desc))
                    self._expect("punct", ")")
                    continue
                break
            if not q.order_by:
                raise ValueError("sparql: ORDER BY needs at least one key")
        k, v = self._peek()
        if k == "ident" and (v or "").upper() == "LIMIT":
            self._next()
            nk, nv = self._next()
            if nk != "num" or "." in nv or int(nv) < 0:
                raise ValueError(f"sparql: bad LIMIT {nv!r}")
            q.limit = int(nv)
        if q.form != "select" and (
            q.group_by or q.having is not None or q.order_by or q.limit is not None
        ):
            raise ValueError(
                "sparql: solution modifiers are unsupported for "
                "CONSTRUCT/ASK/DESCRIBE in this subset"
            )
        if (q.aggregates or q.having is not None) and not q.group_by:
            raise ValueError("sparql: aggregates require GROUP BY in this subset")
        if q.group_by:
            if self.constraint and "this" not in q.group_by:
                raise ValueError("sparql: GROUP BY must include ?this")
            agg_aliases = {a for _, a in q.aggregates}
            plain = [s for s in q.select if s not in agg_aliases]
            if not set(plain) <= set(q.group_by):
                raise ValueError(
                    "sparql: selected non-aggregate vars must be grouped"
                )
        return q

    def _agg(self) -> Agg:
        k, v = self._next()
        if k != "ident" or v.lower() not in (
            "count", "sum", "min", "max", "avg", "group_concat",
        ):
            raise ValueError(f"sparql: unsupported aggregate {v!r}")
        fn = v.lower()
        self._expect("punct", "(")
        ak, av = self._next()
        if ak == "op" and av == "*":
            if fn != "count":
                raise ValueError("sparql: * only valid in COUNT(*)")
            var = None
        elif ak == "var":
            var = av[1:].lower()
        else:
            raise ValueError(f"sparql: bad aggregate argument {av!r}")
        sep = " " if fn == "group_concat" else None
        if fn == "group_concat" and self._peek() == ("punct", ";"):
            # GROUP_CONCAT(?v; SEPARATOR="...") — the only aggregate
            # scalar argument in the grammar
            self._next()
            sk, sv = self._next()
            if sk != "ident" or sv.upper() != "SEPARATOR":
                raise ValueError(f"sparql: expected SEPARATOR, got {sv!r}")
            self._expect("op", "=")
            lk, lv = self._next()
            if lk != "str":
                raise ValueError("sparql: SEPARATOR needs a string literal")
            sep = lv[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        self._expect("punct", ")")
        return Agg(fn, var, sep)

    def _subselect(self) -> Query:
        """``SELECT [DISTINCT] ?v... (AGG(?x) AS ?a)... WHERE { BGP }
        [GROUP BY ?v...]`` then the closing ``}`` of the enclosing
        braces — the restricted subquery subset: a plain BGP body
        (no nested groups), projection + aggregation only.  Vars not
        projected are scoped OUT (standard SPARQL subquery scoping)."""
        sub = Query()
        self._expect(val="SELECT")
        if (
            self._peek()[0] == "ident"
            and (self._peek()[1] or "").upper() == "DISTINCT"
        ):
            self._next()
            sub.distinct = True
        while True:
            k, v = self._peek()
            if k == "var":
                sub.select.append(self._next()[1][1:].lower())
                continue
            if k == "punct" and v == "(":
                self._next()
                agg = self._agg()
                self._expect("ident", "AS")
                ak, av = self._next()
                if ak != "var":
                    raise ValueError("sparql: AS needs a variable alias")
                alias = av[1:].lower()
                self._expect("punct", ")")
                sub.aggregates.append((agg, alias))
                sub.select.append(alias)
                continue
            break
        if not sub.select:
            raise ValueError("sparql: subquery SELECT needs a projection")
        self._expect(val="WHERE")
        self._expect("punct", "{")
        while self._peek() != ("punct", "}"):
            if self._peek()[0] is None:
                raise ValueError("sparql: unterminated subquery WHERE")
            pat = self._pattern()
            sub.patterns.append(pat)
            sub.statements.append(("pattern", pat))
        self._expect("punct", "}")
        nk, nv = self._peek()
        if nk == "ident" and (nv or "").upper() == "GROUP":
            self._next()
            self._expect("ident", "BY")
            while self._peek()[0] == "var":
                sub.group_by.append(self._next()[1][1:].lower())
            if not sub.group_by:
                raise ValueError("sparql: GROUP BY needs variables")
        if sub.aggregates and not sub.group_by:
            raise ValueError(
                "sparql: subquery aggregates require GROUP BY in this subset"
            )
        non_agg = [
            v for v in sub.select
            if v not in {a for _, a in sub.aggregates}
        ]
        if sub.group_by and set(non_agg) - set(sub.group_by):
            raise ValueError(
                "sparql: subquery SELECT vars outside GROUP BY: "
                f"{sorted(set(non_agg) - set(sub.group_by))}"
            )
        self._expect("punct", "}")
        return sub

    def _group_block(self) -> list[Pattern]:
        """``{ pattern* }`` — used by UNION arms."""
        self._expect("punct", "{")
        group: list[Pattern] = []
        while self._peek() != ("punct", "}"):
            if self._peek()[0] is None:
                raise ValueError("sparql: unterminated group block")
            group.append(self._pattern())
        self._expect("punct", "}")
        if not group:
            raise ValueError("sparql: empty group block")
        return group

    def _pattern(self) -> Pattern:
        s = self._term()
        p = self._pred()
        o = self._term()
        k, v = self._peek()
        if k == "punct" and v == ".":
            self._next()
        return Pattern(s, p, o)

    def _pred(self) -> str:
        k, v = self._next()
        if k == "kw" and v == "a":
            return RDF + "type"
        if k == "iri":
            return v[1:-1]
        if k == "pname":
            return self._expand(v)
        raise ValueError(f"sparql: bad predicate {v!r}")

    def _expand(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise ValueError(f"sparql: undeclared prefix {pfx!r}")
        return self.prefixes[pfx] + local

    def _values_term(self):
        """A VALUES-row entry: a constant term or UNDEF (-> None)."""
        k, v = self._peek()
        if k == "ident" and (v or "").upper() == "UNDEF":
            self._next()
            return None
        t = self._term()
        if isinstance(t, Var):
            raise ValueError("sparql: variables are not VALUES data")
        return t

    def _term(self):
        k, v = self._next()
        if k == "var":
            return Var(v[1:].lower())
        if k == "iri":
            return Iri(v[1:-1])
        if k == "pname":
            return Iri(self._expand(v))
        if k == "str":
            value = v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
            nk, nv = self._peek()
            if nk == "dt":
                self._next()
                dk, dv = self._next()
                dt = dv[1:-1] if dk == "iri" else self._expand(dv)
                return Lit(value, dt)
            return Lit(value, XSD + "string")
        if k == "num":
            return Lit(v, XSD + ("decimal" if "." in v else "integer"))
        if k == "kw" and v in ("true", "false"):
            return Lit(v, XSD + "boolean")
        raise ValueError(f"sparql: bad term {v!r}")

    # expression grammar: or -> and -> unary -> cmp -> atom
    def _expr(self):
        left = self._and()
        while self._peek() == ("op", "||"):
            self._next()
            left = BinOp("||", left, self._and())
        return left

    def _and(self):
        left = self._unary()
        while self._peek() == ("op", "&&"):
            self._next()
            left = BinOp("&&", left, self._unary())
        return left

    def _unary(self):
        if self._peek() == ("op", "!"):
            self._next()
            return Not(self._unary())
        return self._cmp()

    def _cmp(self):
        left = self._atom()
        k, v = self._peek()
        if k == "op" and v in ("=", "!=", "<", "<=", ">", ">="):
            self._next()
            return BinOp(v, left, self._atom())
        return left

    def _atom(self):
        k, v = self._peek()
        if k == "punct" and v == "(":
            self._next()
            e = self._expr()
            self._expect("punct", ")")
            return e
        if k == "ident" and v.lower() in (
            "count", "sum", "min", "max", "avg", "group_concat",
        ):
            # numeric aggregates compare in HAVING; _having_operand
            # rejects the term-valued ones with a targeted message
            return self._agg()
        if k == "ident" and v.lower() in _FUNCS:
            self._next()
            self._expect("punct", "(")
            args = [self._expr()]
            while self._peek() == ("punct", ","):
                self._next()
                args.append(self._expr())
            self._expect("punct", ")")
            return Call(v.lower(), tuple(args))
        if k == "var":
            self._next()
            return Var(v[1:].lower())
        if k in ("str", "num", "iri", "pname"):
            return self._term()
        raise ValueError(f"sparql: bad expression atom {v!r}")


# FILTER functions are a closed set in this subset
_FUNCS = ("regex", "str", "datatype", "isiri", "isliteral", "isblank", "bound")


def parse_sparql(text: str, constraint: bool = True) -> Query:
    return SparqlParser(text, constraint=constraint).parse()


# --- translation ---------------------------------------------------------------

_VCOLS = ("val", "kind", "dt", "lang")


def _vcol(var: str, part: str) -> str:
    return f"__{var}__{part}"


def translate(
    query: Query, focus: DataFrame, triples: DataFrame
) -> DataFrame:
    """BGP + filters → DF of solutions with one column set per
    variable; ``?this`` pre-bound from the focus frame (node keys are
    IRIs for anything that can match a subject)."""
    from shacl_spark.functions.terms import node_val_col

    cur = focus.select(
        F.col("node").alias("__this__node"),  # encoded key, passed through
        node_val_col(F.col("node")).alias(_vcol("this", "val")),
        F.col("kind").alias(_vcol("this", "kind")),
        F.col("dt").alias(_vcol("this", "dt")),
        F.col("lang").alias(_vcol("this", "lang")),
    )
    bound = {"this"}
    counter = [0]
    cur = _solution_frame(cur, bound, query, triples, counter)

    if query.group_by:
        cur = _apply_aggregation(cur, query, bound)
        bound = set(query.group_by) | {a for _, a in query.aggregates}

    cols = [F.col("__this__node").alias("focus")]
    if "value" in query.select and "value" in bound:
        cols += [
            F.col(_vcol("value", "val")).alias("value"),
            F.col(_vcol("value", "kind")).alias("kind"),
            F.col(_vcol("value", "dt")).alias("dt"),
            F.col(_vcol("value", "lang")).alias("lang"),
        ]
    return cur.select(*cols).distinct()


def _subquery_solutions(
    sub: Query, triples: DataFrame, counter: list
) -> tuple[DataFrame, list[str]]:
    """Evaluate a ``{ SELECT ... }`` subquery on its own unit frame and
    return (solution frame projected to the SELECTed vars' term
    columns, projected var names).  Bag semantics unless DISTINCT."""
    spark = triples.sparkSession
    cur = spark.range(1).select(F.lit(1).alias("__unit"))
    bound: set[str] = set()
    cur = _solution_frame(cur, bound, sub, triples, counter)
    if sub.group_by:
        cur = _apply_aggregation(cur, sub, bound, with_this=False)
        bound = set(sub.group_by) | {a for _, a in sub.aggregates}
    missing = set(sub.select) - bound
    if missing:
        raise ValueError(
            f"sparql: subquery SELECT references unbound vars {missing}"
        )
    out = cur.select(
        *[F.col(_vcol(v, p)) for v in sub.select for p in _VCOLS]
    )
    if sub.distinct:
        out = out.distinct()
    return out, list(sub.select)


def translate_select(query: Query, triples: DataFrame) -> DataFrame:
    """Standalone ``SELECT`` evaluation (r05) — the same WHERE-clause
    algebra as the constraint translator, seeded from a unit frame
    instead of a pre-bound focus set, projecting EVERY selected
    variable as four term columns ``v / v_kind / v_dt / v_lang``.

    Bag semantics by default (SPARQL SELECT); ``SELECT DISTINCT``
    applies set semantics.  Parse with ``parse_sparql(text,
    constraint=False)`` so GROUP BY is not forced to include ?this."""
    spark = triples.sparkSession
    cur = spark.range(1).select(F.lit(1).alias("__unit"))
    bound: set[str] = set()
    counter = [0]
    cur = _solution_frame(cur, bound, query, triples, counter)

    if query.group_by:
        cur = _apply_aggregation(cur, query, bound, with_this=False)
        bound = set(query.group_by) | {a for _, a in query.aggregates}

    missing = set(query.select) - bound
    if missing:
        raise ValueError(f"sparql: SELECT references unbound vars {missing}")
    cols = []
    for v in query.select:
        cols += [
            F.col(_vcol(v, "val")).alias(v),
            F.col(_vcol(v, "kind")).alias(f"{v}_kind"),
            F.col(_vcol(v, "dt")).alias(f"{v}_dt"),
            F.col(_vcol(v, "lang")).alias(f"{v}_lang"),
        ]
    out = cur.select(*cols)
    if query.distinct:
        out = out.distinct()
    if query.order_by:
        missing = {v for v, _ in query.order_by} - set(query.select)
        if missing:
            raise ValueError(
                f"sparql: ORDER BY references unselected vars {missing}"
            )
        keys = []
        for v, desc in query.order_by:
            val = F.col(v)
            num = val.try_cast("double")
            # unbound last, numeric-castable before lexical, then value.
            # The tier flags stay ASCENDING under DESC too (ADVICE r05,
            # medium): SPARQL's DESC still sorts unbound lowest — hence
            # last — and the engine's documented ordering puts numerics
            # first either way; only the value keys reverse.
            keys.append(val.isNull().asc())
            keys.append(num.isNull().asc())
            for key in (num, val):
                keys.append(key.desc() if desc else key.asc())
        out = out.orderBy(*keys)
    if query.limit is not None:
        out = out.limit(query.limit)
    return out


def sparql_select(triples: DataFrame, text: str) -> DataFrame:
    """Public SPARQL SELECT surface over a canonical triple frame
    (§1.3 schema).  Returns one row per solution with term-fidelity
    columns per variable — the entry point jobs/query_graph.py and the
    registry query ``sparql_select_engine`` use."""
    return translate_select(parse_sparql(text, constraint=False), triples)


def translate_construct(
    query: Query, triples: DataFrame, focus: DataFrame | None = None
) -> DataFrame:
    """``CONSTRUCT { template } WHERE {...}`` (r05) — evaluate the
    WHERE clause once, instantiate every template pattern per solution,
    and return the constructed GRAPH as a canonical six-column triple
    frame (set semantics: a graph has no duplicate triples).

    Per SPARQL: an instantiation is skipped when any variable it uses
    is unbound in the solution, or when a subject variable is bound to
    a literal (invalid RDF).  A template variable that no WHERE pattern
    can ever bind is a query bug and fails at translation instead of
    silently constructing nothing.

    ``focus`` (r05, SHACL-AF sh:SPARQLRule): a node frame pre-binding
    ``$this`` — the WHERE clause is seeded from it exactly like the
    sh:sparql constraint translator, so the template may use ``$this``
    and every solution carries one focus node."""
    from shacl_spark.functions.terms import node_val_col

    spark = triples.sparkSession
    if focus is None:
        cur = spark.range(1).select(F.lit(1).alias("__unit"))
        bound: set[str] = set()
    else:
        cur = focus.select(
            node_val_col(F.col("node")).alias(_vcol("this", "val")),
            F.col("kind").alias(_vcol("this", "kind")),
            F.col("dt").alias(_vcol("this", "dt")),
            F.col("lang").alias(_vcol("this", "lang")),
        )
        bound = {"this"}
    counter = [0]
    cur = _solution_frame(cur, bound, query, triples, counter)

    def _subj(t):
        if isinstance(t, Var):
            return F.col(_vcol(t.name, "val")), F.col(_vcol(t.name, "kind"))
        return F.lit(t.value), F.lit("iri")

    parts = []
    for pat in query.template:
        used = [t.name for t in (pat.s, pat.o) if isinstance(t, Var)]
        missing = set(used) - bound
        if missing:
            raise ValueError(
                f"sparql: CONSTRUCT template references unbound vars {missing}"
            )
        s_val, s_kind = _subj(pat.s)
        if isinstance(pat.o, Var):
            o_val = F.col(_vcol(pat.o.name, "val"))
            o_kind = F.col(_vcol(pat.o.name, "kind"))
            o_dt = F.col(_vcol(pat.o.name, "dt"))
            o_lang = F.col(_vcol(pat.o.name, "lang"))
        elif isinstance(pat.o, Iri):
            o_val, o_kind = F.lit(pat.o.value), F.lit("iri")
            o_dt = F.lit(None).cast("string")
            o_lang = F.lit(None).cast("string")
        else:  # Lit
            o_val, o_kind = F.lit(pat.o.value), F.lit("literal")
            o_dt = F.lit(pat.o.dt).cast("string")
            o_lang = F.lit(pat.o.lang).cast("string")
        keep = s_kind != F.lit("literal")
        for v in used:
            keep = keep & F.col(_vcol(v, "val")).isNotNull()
        parts.append(
            cur.where(keep).select(
                s_val.alias("subj"),
                F.lit(pat.p).alias("pred"),
                o_val.alias("obj"),
                o_kind.alias("obj_kind"),
                o_dt.alias("obj_dt"),
                o_lang.alias("obj_lang"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(
        ["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"]
    )


def translate_ask(query: Query, triples: DataFrame) -> DataFrame:
    """``ASK {...}`` (r05) — one boolean row: does the WHERE clause
    have at least one solution?  ``limit(1)`` short-circuits the scan
    (AQE stops the job at the first produced row); the count-over-limit
    keeps the result a lazy one-row DataFrame rather than a driver-side
    collect at translation time."""
    spark = triples.sparkSession
    cur = spark.range(1).select(F.lit(1).alias("__unit"))
    bound: set[str] = set()
    counter = [0]
    cur = _solution_frame(cur, bound, query, triples, counter)
    return (
        cur.limit(1)
        .select(F.lit(1).alias("__hit"))
        .groupBy()
        .agg((F.count("__hit") > 0).alias("ask"))
    )


def translate_describe(query: Query, triples: DataFrame) -> DataFrame:
    """``DESCRIBE ?v... <iri>... [WHERE {...}]`` (r05) — the described
    resources' subject slice of the graph, as a canonical six-column
    triple frame.

    The SPARQL spec leaves the description form implementation-defined;
    this engine DEFINES it as all triples whose SUBJECT is a described
    resource — the concise-bounded-description equivalent under the
    engine-wide bnode-skolemization policy (SURVEY §1.2: no anonymous
    bnodes to recurse through).  Distributed shape: solve the WHERE
    clause, project the described variables' IRI/bnode values, union
    constant targets, distinct (the target set is resource-count-sized)
    and LEFT SEMI join the triple frame on subj — one broadcastable
    equi-join, no collect."""
    spark = triples.sparkSession
    targets: list[DataFrame] = []
    consts = [t.value for t in query.describe if isinstance(t, Iri)]
    if consts:
        targets.append(
            spark.createDataFrame([(v,) for v in consts], ["__d"])
        )
    dvars = [t.name for t in query.describe if isinstance(t, Var)]
    if dvars:
        cur = spark.range(1).select(F.lit(1).alias("__unit"))
        bound: set[str] = set()
        counter = [0]
        cur = _solution_frame(cur, bound, query, triples, counter)
        missing = set(dvars) - bound
        if missing:
            raise ValueError(
                f"sparql: DESCRIBE references unbound vars {missing}"
            )
        for v in dvars:
            targets.append(
                cur.where(F.col(_vcol(v, "kind")).isin("iri", "bnode"))
                .select(F.col(_vcol(v, "val")).alias("__d"))
            )
    out = targets[0]
    for t in targets[1:]:
        out = out.unionByName(t)
    described = out.where(F.col("__d").isNotNull()).distinct()
    return triples.join(
        described, triples["subj"] == described["__d"], "left_semi"
    ).select("subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang")


def sparql_query(triples: DataFrame, text: str) -> DataFrame:
    """Public SPARQL surface dispatching on query form: SELECT rows,
    CONSTRUCT/DESCRIBE a six-column triple frame, ASK a one-row
    boolean."""
    q = parse_sparql(text, constraint=False)
    if q.form == "construct":
        return translate_construct(q, triples)
    if q.form == "ask":
        return translate_ask(q, triples)
    if q.form == "describe":
        return translate_describe(q, triples)
    return translate_select(q, triples)


def _solution_frame(
    cur: DataFrame, bound: set, query: Query, triples: DataFrame, counter: list
) -> DataFrame:
    """Run the WHERE clause — pattern / OPTIONAL / UNION statements in
    textual order, then FILTER [NOT] EXISTS groups, then plain FILTERs
    — over an initial solution frame.  ``bound`` is mutated in place."""
    # statements run in TEXTUAL order (r04 review #2): SPARQL joins
    # pattern / OPTIONAL / UNION statements left-to-right, so a UNION
    # arm consuming an OPTIONAL-bound variable sees it bound only when
    # the OPTIONAL came first — exactly like the spec's group algebra.
    for kind, payload in query.statements:
        if kind == "pattern":
            cur = _join_patterns(cur, bound, [payload], triples, counter)
            continue
        if kind == "values":
            # inline data: broadcast-join the (tiny) VALUES block.  Two
            # solutions are compatible when every shared var is unbound
            # on either side or term-equal; the merged solution takes
            # the bound side (SPARQL join compatibility).
            vars_, rows = payload
            data = []
            for row in rows:
                rec: list = []
                for t in row:
                    if t is None:
                        rec += [None, None, None, None]
                    elif isinstance(t, Iri):
                        rec += [t.value, "iri", None, None]
                    else:
                        rec += [t.value, "literal", t.dt, t.lang]
                data.append(tuple(rec))
            schema = ", ".join(
                f"__val_{v}_{p} string" for v in vars_ for p in _VCOLS
            )
            vdf = F.broadcast(cur.sparkSession.createDataFrame(data, schema))
            shared = [v for v in vars_ if v in bound]
            cond = F.lit(True)
            for v in shared:
                cv, vv = F.col(_vcol(v, "val")), F.col(f"__val_{v}_val")
                eq = (
                    (cv == vv)
                    & (F.col(_vcol(v, "kind")) == F.col(f"__val_{v}_kind"))
                    & F.col(_vcol(v, "dt")).eqNullSafe(F.col(f"__val_{v}_dt"))
                    & F.col(_vcol(v, "lang")).eqNullSafe(F.col(f"__val_{v}_lang"))
                )
                cond = cond & (cv.isNull() | vv.isNull() | eq)
            cur = cur.join(vdf, cond)
            merged = {}
            for v in shared:
                was_unbound = F.col(_vcol(v, "val")).isNull()
                for p in _VCOLS:
                    merged[_vcol(v, p)] = F.when(
                        was_unbound, F.col(f"__val_{v}_{p}")
                    ).otherwise(F.col(_vcol(v, p)))
            if merged:
                cur = cur.withColumns(merged)
            for v in vars_:
                if v in shared:
                    cur = cur.drop(*[f"__val_{v}_{p}" for p in _VCOLS])
                else:
                    for p in _VCOLS:
                        cur = cur.withColumnRenamed(
                            f"__val_{v}_{p}", _vcol(v, p)
                        )
            bound |= set(vars_)
            continue
        if kind == "subquery":
            # { SELECT ... } (r05): evaluated bottom-up on its own unit
            # frame (projection scopes its internal vars OUT), then
            # joined in with the same per-shared-var compatibility and
            # bound-side merge VALUES uses.  An aggregate alias can be
            # NULL (all-error group) — the null-compatibility arm
            # handles it like an UNDEF.
            sub = payload
            sf, svars = _subquery_solutions(sub, triples, counter)
            tag = f"sq{counter[0]}"
            counter[0] += 1
            for v in svars:
                for p in _VCOLS:
                    sf = sf.withColumnRenamed(_vcol(v, p), f"__{tag}_{v}_{p}")
            shared = [v for v in svars if v in bound]
            cond = F.lit(True)
            for v in shared:
                cv, vv = F.col(_vcol(v, "val")), F.col(f"__{tag}_{v}_val")
                eq = (
                    (cv == vv)
                    & (F.col(_vcol(v, "kind")) == F.col(f"__{tag}_{v}_kind"))
                    & F.col(_vcol(v, "dt")).eqNullSafe(F.col(f"__{tag}_{v}_dt"))
                    & F.col(_vcol(v, "lang")).eqNullSafe(
                        F.col(f"__{tag}_{v}_lang")
                    )
                )
                cond = cond & (cv.isNull() | vv.isNull() | eq)
            cur = cur.join(sf, cond)
            merged = {}
            for v in shared:
                was_unbound = F.col(_vcol(v, "val")).isNull()
                for p in _VCOLS:
                    merged[_vcol(v, p)] = F.when(
                        was_unbound, F.col(f"__{tag}_{v}_{p}")
                    ).otherwise(F.col(_vcol(v, p)))
            if merged:
                cur = cur.withColumns(merged)
            for v in svars:
                if v in shared:
                    cur = cur.drop(*[f"__{tag}_{v}_{p}" for p in _VCOLS])
                else:
                    for p in _VCOLS:
                        cur = cur.withColumnRenamed(
                            f"__{tag}_{v}_{p}", _vcol(v, p)
                        )
            bound |= set(svars)
            continue
        if kind == "minus":
            # MINUS { pattern* }: anti-join on the shared variables; a
            # group sharing no variable removes nothing (per spec —
            # the MINUS-vs-NOT-EXISTS distinction).  A solution whose
            # shared var is unbound never matches a key and is kept
            # (same anchor approximation as FILTER EXISTS, documented).
            group = payload
            anchors = sorted(_pattern_vars(group) & bound)
            if not anchors:
                continue
            seed = cur.select(
                *[F.col(_vcol(a, p)) for a in anchors for p in _VCOLS]
            ).distinct()
            g = _join_patterns(seed, set(anchors), group, triples, counter)
            keys = g.select(
                *[F.col(_vcol(a, p)) for a in anchors for p in _VCOLS]
            ).distinct()
            for a in anchors:
                for p in _VCOLS:
                    keys = keys.withColumnRenamed(_vcol(a, p), f"__anc_{a}_{p}")
            cond = F.lit(True)
            for a in anchors:
                cond = (
                    cond
                    & (F.col(_vcol(a, "val")) == F.col(f"__anc_{a}_val"))
                    & (F.col(_vcol(a, "kind")) == F.col(f"__anc_{a}_kind"))
                    & F.col(_vcol(a, "dt")).eqNullSafe(F.col(f"__anc_{a}_dt"))
                    & F.col(_vcol(a, "lang")).eqNullSafe(F.col(f"__anc_{a}_lang"))
                )
            cur = cur.join(keys, cond, "left_anti")
            continue
        if kind == "union":
            # each arm extends the current solutions independently; the
            # union of the arm results is the new solution set, with
            # vars missing from an arm left unbound (NULL)
            arms = payload
            arm_frames, arm_news, all_new = [], [], set()
            for arm in arms:
                b2 = set(bound)
                arm_frames.append(_join_patterns(cur, b2, arm, triples, counter))
                arm_news.append(b2 - bound)
                all_new |= b2 - bound
            base_cols = cur.columns
            ordered = list(base_cols) + [
                _vcol(v, p) for v in sorted(all_new) for p in _VCOLS
            ]
            merged = None
            for f, newv in zip(arm_frames, arm_news):
                missing = all_new - newv
                if missing:
                    f = f.withColumns(
                        {
                            _vcol(v, p): F.lit(None).cast("string")
                            for v in missing
                            for p in _VCOLS
                        }
                    )
                f = f.select(*ordered)
                merged = f if merged is None else merged.unionByName(f)
            cur = merged
            bound |= all_new
            continue
        # OPTIONAL group
        group = payload
        gvars = _pattern_vars(group)
        anchors = sorted(gvars & bound)
        if not anchors:
            raise ValueError("sparql: OPTIONAL group shares no bound variable")
        # evaluate the group as a unit over the distinct anchor
        # bindings, then LEFT-join back — a failed group must leave ALL
        # of its vars unbound (sequential left joins would bind partial
        # prefixes)
        seed = cur.select(
            *[F.col(_vcol(a, p)) for a in anchors for p in _VCOLS]
        ).distinct()
        gbound = set(anchors)
        g = _join_patterns(seed, gbound, group, triples, counter)
        for a in anchors:
            for p in _VCOLS:
                g = g.withColumnRenamed(_vcol(a, p), f"__anc_{a}_{p}")
        cond = F.lit(True)
        for a in anchors:
            cond = (
                cond
                & (F.col(_vcol(a, "val")) == F.col(f"__anc_{a}_val"))
                & (F.col(_vcol(a, "kind")) == F.col(f"__anc_{a}_kind"))
                & F.col(_vcol(a, "dt")).eqNullSafe(F.col(f"__anc_{a}_dt"))
                & F.col(_vcol(a, "lang")).eqNullSafe(F.col(f"__anc_{a}_lang"))
            )
        cur = cur.join(g, cond, "left").drop(
            *[f"__anc_{a}_{p}" for a in anchors for p in _VCOLS]
        )
        bound |= gbound

    for positive, group in query.exists:
        gvars = _pattern_vars(group)
        anchors = sorted(gvars & bound)
        if not anchors:
            # anchor-less group (a constant existence test, e.g.
            # FILTER EXISTS { ?x ex:p ?y }): valid SPARQL whose truth is
            # solution-independent — a global emptiness probe decides
            # keep-all vs drop-all (ADVICE r04; the oracle's extend()
            # with no shared vars computes the same thing per solution)
            unit = cur.sparkSession.range(1).select(F.lit(1).alias("__unit"))
            probe = _join_patterns(unit, set(), group, triples, counter)
            if probe.isEmpty() == positive:
                cur = cur.limit(0)
            continue
        # evaluate the group over the distinct anchor bindings, then
        # SEMI-join (EXISTS) / ANTI-join (NOT EXISTS) the solutions
        # against the satisfying keys — the engine's native shapes for
        # these quantifiers; group-local vars never escape.  An anchor
        # left unbound by a failed OPTIONAL never matches (EXISTS
        # false / NOT EXISTS true for that solution — documented
        # approximation of substitution semantics).
        seed = cur.select(
            *[F.col(_vcol(a, p)) for a in anchors for p in _VCOLS]
        ).distinct()
        g = _join_patterns(seed, set(anchors), group, triples, counter)
        keys = g.select(
            *[F.col(_vcol(a, p)) for a in anchors for p in _VCOLS]
        ).distinct()
        for a in anchors:
            for p in _VCOLS:
                keys = keys.withColumnRenamed(_vcol(a, p), f"__anc_{a}_{p}")
        cond = F.lit(True)
        for a in anchors:
            cond = (
                cond
                & (F.col(_vcol(a, "val")) == F.col(f"__anc_{a}_val"))
                & (F.col(_vcol(a, "kind")) == F.col(f"__anc_{a}_kind"))
                & F.col(_vcol(a, "dt")).eqNullSafe(F.col(f"__anc_{a}_dt"))
                & F.col(_vcol(a, "lang")).eqNullSafe(F.col(f"__anc_{a}_lang"))
            )
        cur = cur.join(keys, cond, "left_semi" if positive else "left_anti")

    for flt in query.filters:
        missing = _expr_vars(flt) - bound
        if missing:
            raise ValueError(f"sparql: FILTER references unbound vars {missing}")
        cur = cur.where(_expr_col(flt))

    return cur


def _agg_specs(query: Query) -> list[Agg]:
    """Distinct aggregate calls across SELECT projections and HAVING."""
    specs: list[Agg] = []

    def walk(e):
        if isinstance(e, Agg):
            if e not in specs:
                specs.append(e)
        elif isinstance(e, BinOp):
            walk(e.left)
            walk(e.right)
        elif isinstance(e, Not):
            walk(e.inner)
        elif isinstance(e, Call):
            for a in e.args:
                walk(a)

    for agg, _ in query.aggregates:
        if agg not in specs:
            specs.append(agg)
    if query.having is not None:
        walk(query.having)
    return specs


def _having_operand(e, aggmap: dict) -> Column:
    if isinstance(e, Agg):
        if e.fn in ("min", "max", "group_concat"):
            raise ValueError(
                "sparql: HAVING over MIN/MAX/GROUP_CONCAT is unsupported in "
                "this subset (non-numeric; compare COUNT/SUM/AVG instead)"
            )
        return F.col(aggmap[e])
    if isinstance(e, Lit):
        try:
            return F.lit(float(e.value) if "." in e.value else int(e.value))
        except ValueError:
            raise ValueError(f"sparql: non-numeric HAVING literal {e.value!r}")
    raise ValueError(
        "sparql: HAVING supports aggregate-vs-number comparisons only"
    )


def _having_col(e, aggmap: dict) -> Column:
    """HAVING expression → Column over the computed aggregate columns
    (numeric comparisons; && || ! combinators)."""
    import operator as _op

    if isinstance(e, Not):
        return ~_having_col(e.inner, aggmap)
    if isinstance(e, BinOp):
        if e.op == "&&":
            return _having_col(e.left, aggmap) & _having_col(e.right, aggmap)
        if e.op == "||":
            return _having_col(e.left, aggmap) | _having_col(e.right, aggmap)
        ops = {"=": _op.eq, "!=": _op.ne, "<": _op.lt,
               "<=": _op.le, ">": _op.gt, ">=": _op.ge}
        return ops[e.op](
            _having_operand(e.left, aggmap), _having_operand(e.right, aggmap)
        )
    raise ValueError(f"sparql: unsupported HAVING expression {e!r}")


def _apply_aggregation(
    cur: DataFrame, query: Query, bound: set, with_this: bool = True
) -> DataFrame:
    """GROUP BY + aggregate projections + HAVING over the solution frame
    (r05, VERDICT r04 #5 — the 'count over a join' constraint shape).
    One ``groupBy().agg()`` — map-side partial aggregation plus a single
    shuffle on the (focus-dominated) group keys, the plan a hand-written
    cardinality constraint would produce.  COUNT → xsd:integer literal;
    SUM casts values to long (NULL for non-numeric lexical forms, which
    the sum then skips — an all-error group leaves the alias unbound)."""
    missing = set(query.group_by) - bound
    if missing:
        raise ValueError(f"sparql: GROUP BY references unbound vars {missing}")
    keys = (["__this__node"] if with_this else []) + [
        _vcol(g, p) for g in query.group_by for p in _VCOLS
    ]
    specs = _agg_specs(query)
    aggmap = {spec: f"__agg{i}" for i, spec in enumerate(specs)}
    aggs = []
    for spec, name in aggmap.items():
        if spec.var is None:
            aggs.append(F.count(F.lit(1)).alias(name))
            continue
        if spec.var not in bound:
            raise ValueError(f"sparql: aggregate over unbound var ?{spec.var}")
        col = F.col(_vcol(spec.var, "val"))
        if spec.fn == "count":
            aggs.append(F.count(col).alias(name))
        elif spec.fn == "sum":
            # try_cast, not cast: ANSI mode (Spark 4 default) would
            # otherwise FAIL the job on one malformed numeric literal —
            # SPARQL skips error values inside aggregates instead
            aggs.append(F.sum(col.try_cast("long")).alias(name))
        elif spec.fn == "avg":
            aggs.append(F.avg(col.try_cast("double")).alias(name))
        elif spec.fn == "group_concat":
            # SPARQL leaves GROUP_CONCAT order implementation-defined
            # unless ordered; this engine DEFINES it as sorted lexical
            # order — deterministic across plans/partitionings (the
            # collect_list arrival order is not)
            aggs.append(
                F.array_join(
                    F.array_sort(F.collect_list(col)), spec.sep
                ).alias(name)
            )
        else:
            # min / max (r05): full-term result under the same two-tier
            # ordering ORDER BY uses — numeric-castable values order
            # numerically and before non-numerics, then lexical form;
            # kind/dt/lang complete the key so ties are deterministic.
            # Unbound rows pack to NULL, which min/max skip (SPARQL
            # aggregates skip error values).
            num = col.try_cast("double")
            packed = F.when(
                col.isNotNull(),
                F.struct(
                    num.isNull().cast("int").alias("nn"),
                    F.coalesce(num, F.lit(0.0)).alias("num"),
                    col.alias("lex"),
                    F.col(_vcol(spec.var, "kind")).alias("kind"),
                    F.coalesce(F.col(_vcol(spec.var, "dt")), F.lit("")).alias("dt"),
                    F.coalesce(F.col(_vcol(spec.var, "lang")), F.lit("")).alias("lang"),
                ),
            )
            aggs.append(
                (F.min(packed) if spec.fn == "min" else F.max(packed)).alias(name)
            )
    out = cur.groupBy(*keys).agg(*aggs)
    if query.having is not None:
        out = out.where(_having_col(query.having, aggmap))
    for agg, alias in query.aggregates:
        name = aggmap[agg]
        if agg.fn in ("min", "max"):
            # full-term result: unpack the winning struct
            out = (
                out.withColumn(_vcol(alias, "val"), F.col(f"{name}.lex"))
                .withColumn(_vcol(alias, "kind"), F.col(f"{name}.kind"))
                .withColumn(
                    _vcol(alias, "dt"),
                    F.when(F.col(f"{name}.dt") != "", F.col(f"{name}.dt")),
                )
                .withColumn(
                    _vcol(alias, "lang"),
                    F.when(F.col(f"{name}.lang") != "", F.col(f"{name}.lang")),
                )
            )
            continue
        sval = F.col(name).cast("string")
        dt = XSD + (
            "decimal" if agg.fn == "avg"
            else "string" if agg.fn == "group_concat"
            else "integer"
        )
        out = (
            out.withColumn(_vcol(alias, "val"), sval)
            .withColumn(
                _vcol(alias, "kind"),
                F.when(sval.isNotNull(), F.lit("literal")),
            )
            .withColumn(
                _vcol(alias, "dt"),
                F.when(sval.isNotNull(), F.lit(dt)),
            )
            .withColumn(_vcol(alias, "lang"), F.lit(None).cast("string"))
        )
    return out


def _pattern_vars(patterns) -> set[str]:
    out: set[str] = set()
    for pat in patterns:
        for term in (pat.s, pat.o):
            if isinstance(term, Var):
                out.add(term.name)
    return out


def _join_patterns(
    cur: DataFrame, bound: set, patterns, triples: DataFrame, counter: list
) -> DataFrame:
    """Fold a list of triple patterns into ``cur`` as inner equi-joins,
    binding fresh variables; mutates ``bound`` and the join counter."""
    for pat in patterns:
        n = counter[0]
        counter[0] += 1
        t = triples.where(F.col("pred") == pat.p).select(
            F.col("subj").alias(f"__s{n}"),
            F.col("obj").alias(f"__o{n}"),
            F.col("obj_kind").alias(f"__ok{n}"),
            F.col("obj_dt").alias(f"__od{n}"),
            F.col("obj_lang").alias(f"__ol{n}"),
        )
        conds = []
        new_vars = []
        # subject side (subjects are IRI strings in the engine's model)
        if isinstance(pat.s, Var):
            if pat.s.name in bound:
                conds.append(
                    (F.col(_vcol(pat.s.name, "val")) == F.col(f"__s{n}"))
                    & F.col(_vcol(pat.s.name, "kind")).isin("iri", "bnode")
                )
            else:
                new_vars.append((pat.s.name, "s"))
        elif isinstance(pat.s, Iri):
            conds.append(F.col(f"__s{n}") == pat.s.value)
        else:
            raise ValueError("sparql: literal subject is unsatisfiable")
        # object side (full term equality)
        if isinstance(pat.o, Var):
            if new_vars and new_vars[0][0] == pat.o.name:
                # same fresh var on both sides (?x p ?x)
                conds.append(
                    (F.col(f"__s{n}") == F.col(f"__o{n}"))
                    & (F.col(f"__ok{n}") == "iri")
                )
            elif pat.o.name in bound:
                conds.append(
                    (F.col(_vcol(pat.o.name, "val")) == F.col(f"__o{n}"))
                    & (F.col(_vcol(pat.o.name, "kind")) == F.col(f"__ok{n}"))
                    & (
                        F.coalesce(F.col(_vcol(pat.o.name, "dt")), F.lit(""))
                        == F.coalesce(F.col(f"__od{n}"), F.lit(""))
                    )
                    & (
                        F.coalesce(F.col(_vcol(pat.o.name, "lang")), F.lit(""))
                        == F.coalesce(F.col(f"__ol{n}"), F.lit(""))
                    )
                )
            else:
                new_vars.append((pat.o.name, "o"))
        elif isinstance(pat.o, Iri):
            conds.append(
                (F.col(f"__o{n}") == pat.o.value) & (F.col(f"__ok{n}") == "iri")
            )
        else:  # literal
            conds.append(
                (F.col(f"__o{n}") == pat.o.value)
                & (F.col(f"__ok{n}") == "literal")
                & (
                    F.coalesce(F.col(f"__od{n}"), F.lit(""))
                    == F.lit(pat.o.dt or "")
                )
                & (
                    F.coalesce(F.col(f"__ol{n}"), F.lit(""))
                    == F.lit(pat.o.lang or "")
                )
            )
        cond = conds[0] if conds else F.lit(True)
        for c in conds[1:]:
            cond = cond & c
        cur = cur.join(t, cond, "inner")
        # bind the new variables from the matched triple columns
        new_cols = {}
        for var, side in new_vars:
            if side == "s":
                new_cols[_vcol(var, "val")] = F.col(f"__s{n}")
                new_cols[_vcol(var, "kind")] = F.when(
                    F.col(f"__s{n}").startswith("_:"), F.lit("bnode")
                ).otherwise(F.lit("iri"))
                new_cols[_vcol(var, "dt")] = F.lit(None).cast("string")
                new_cols[_vcol(var, "lang")] = F.lit(None).cast("string")
            else:
                new_cols[_vcol(var, "val")] = F.col(f"__o{n}")
                new_cols[_vcol(var, "kind")] = F.col(f"__ok{n}")
                new_cols[_vcol(var, "dt")] = F.col(f"__od{n}")
                new_cols[_vcol(var, "lang")] = F.col(f"__ol{n}")
            bound.add(var)
        if new_cols:
            cur = cur.withColumns(new_cols)
        cur = cur.drop(f"__s{n}", f"__o{n}", f"__ok{n}", f"__od{n}", f"__ol{n}")
    return cur


def _expr_vars(e) -> set[str]:
    if isinstance(e, Var):
        return {e.name}
    if isinstance(e, BinOp):
        return _expr_vars(e.left) | _expr_vars(e.right)
    if isinstance(e, Not):
        return _expr_vars(e.inner)
    if isinstance(e, Call):
        out: set[str] = set()
        for a in e.args:
            out |= _expr_vars(a)
        return out
    return set()


_NUM_DTS = {
    XSD + s
    for s in ("integer", "decimal", "double", "float", "long", "int", "short", "byte")
}


def _num(e) -> Column | None:
    """Numeric view of an expression leaf, NULL when non-numeric."""
    if isinstance(e, Var):
        return F.when(
            (F.col(_vcol(e.name, "kind")) == "literal")
            & (F.col(_vcol(e.name, "dt")).isNull() | F.col(_vcol(e.name, "dt")).isin(*_NUM_DTS)),
            F.col(_vcol(e.name, "val")).try_cast("double"),
        )
    if isinstance(e, Lit) and e.dt in _NUM_DTS:
        return F.lit(float(e.value))
    return None


def _str_view(e) -> Column:
    if isinstance(e, Var):
        return F.col(_vcol(e.name, "val"))
    if isinstance(e, (Lit, Iri)):
        return F.lit(e.value)
    if isinstance(e, Call) and e.fn == "str":
        return _str_view(e.args[0])
    if isinstance(e, Call) and e.fn == "datatype":
        v = e.args[0]
        assert isinstance(v, Var), "datatype() needs a variable"
        return F.coalesce(
            F.col(_vcol(v.name, "dt")),
            F.when(F.col(_vcol(v.name, "kind")) == "literal", F.lit(XSD + "string")),
        )
    raise ValueError(f"sparql: not a value expression: {e!r}")


def _term_key(e) -> Column | None:
    """Full term-identity key (kind/lexical/dt/lang, lang lowercased)
    of a RAW term expression — None for str()/datatype() views, which
    compare as simple strings by definition.  Used so `=`/`!=` follow
    SPARQL term equality: <ex:x> != "ex:x", "5"@en != "5" (ADVICE r02
    sparql.py:463)."""
    if isinstance(e, Var):
        kind = F.col(_vcol(e.name, "kind"))
        lang = F.col(_vcol(e.name, "lang"))
        # RDF 1.1: a plain literal IS an xsd:string literal — normalize
        # so "gold" and "gold"^^xsd:string are one term
        dt = F.coalesce(
            F.col(_vcol(e.name, "dt")),
            F.when((kind == "literal") & lang.isNull(), F.lit(XSD + "string")),
            F.lit(""),
        )
        return F.concat_ws(
            "\x01",
            kind,
            F.col(_vcol(e.name, "val")),
            dt,
            F.lower(F.coalesce(lang, F.lit(""))),
        )
    if isinstance(e, Iri):
        return F.lit("\x01".join(["iri", e.value, "", ""]))
    if isinstance(e, Lit):
        dt = e.dt or (XSD + "string" if not e.lang else "")
        return F.lit("\x01".join(["literal", e.value, dt, (e.lang or "").lower()]))
    return None


def _expr_col(e) -> Column:
    if isinstance(e, BinOp):
        if e.op == "&&":
            return _expr_col(e.left) & _expr_col(e.right)
        if e.op == "||":
            return _expr_col(e.left) | _expr_col(e.right)
        ln, rn = _num(e.left), _num(e.right)
        ls, rs = _str_view(e.left), _str_view(e.right)
        import operator

        ops = {
            "=": operator.eq, "!=": operator.ne, "<": operator.lt,
            "<=": operator.le, ">": operator.gt, ">=": operator.ge,
        }
        op = ops[e.op]
        if e.op in ("=", "!="):
            lk, rk = _term_key(e.left), _term_key(e.right)
            if lk is not None and rk is not None:
                # numeric value-equality first ("5"^^int = "5.0"^^dec),
                # then FULL term identity — not the lexical flattening.
                # Comparing an UNBOUND optional var is a SPARQL type
                # error -> effectively false for both = and != (the
                # concat_ws key would otherwise turn all-NULL into "").
                def _defined(t):
                    return (
                        F.col(_vcol(t.name, "val")).isNotNull()
                        if isinstance(t, Var)
                        else F.lit(True)
                    )

                fallback = op(lk, rk) & _defined(e.left) & _defined(e.right)
                if ln is not None and rn is not None:
                    return F.when(
                        ln.isNotNull() & rn.isNotNull(), op(ln, rn)
                    ).otherwise(fallback)
                return fallback
        if ln is not None and rn is not None:
            # numeric compare when both sides cast, else string compare
            return F.when(
                ln.isNotNull() & rn.isNotNull(), op(ln, rn)
            ).otherwise(op(ls, rs))
        return op(ls, rs)
    if isinstance(e, Not):
        return ~_expr_col(e.inner)
    if isinstance(e, Call):
        if e.fn == "regex":
            pat = e.args[1]
            assert isinstance(pat, Lit)
            return _str_view(e.args[0]).rlike(pat.value)
        if e.fn in ("isiri", "isliteral", "isblank"):
            v = e.args[0]
            assert isinstance(v, Var)
            want = {"isiri": "iri", "isliteral": "literal", "isblank": "bnode"}[e.fn]
            return F.col(_vcol(v.name, "kind")) == want
        if e.fn == "bound":
            v = e.args[0]
            assert isinstance(v, Var), "bound() needs a variable"
            return F.col(_vcol(v.name, "val")).isNotNull()
    raise ValueError(f"sparql: unsupported boolean expression {e!r}")


def substitute_path(select_text: str, shape) -> str:
    """SPEC §5.3.3: replace ``$PATH`` with the property shape's path.
    Subset: predicate paths only — the standard shacl-shacl idiom
    (``$this $PATH ?value``) works; composite paths raise."""
    if "$PATH" not in select_text:
        return select_text
    from shacl_spark.shacl.shapes import PredicatePath, PropertyShape

    if isinstance(shape, PropertyShape) and isinstance(shape.path, PredicatePath):
        return select_text.replace("$PATH", f"<{shape.path.iri}>")
    raise ValueError(
        "sparql: $PATH requires a property shape with a plain predicate path"
    )


def sparql_violations(
    select_text: str, focus: DataFrame, triples: DataFrame
) -> DataFrame:
    """sh:sparql constraint → violation frame DF[focus[,value,kind,dt,
    lang]]: solutions of the pre-bound query are the violations."""
    return translate(parse_sparql(select_text), focus, triples)
