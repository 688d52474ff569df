"""Turtle (TTL) subset parser → triple rows (SURVEY.md §1.2; VERDICT
r01 "What's missing" #2).

Real-world shapes graphs and the W3C test suites arrive as Turtle;
this container has no rdflib, so a small driver-side recursive-descent
parser covers the subset those files actually use:

- ``@prefix`` / ``PREFIX`` / ``@base`` / ``BASE``
- IRIs (``<...>``), prefixed names, ``a`` for rdf:type
- literals: short/long single/double-quoted strings with ``\\``
  escapes, ``@lang`` tags, ``^^`` datatypes, and the numeric/boolean
  shorthands (typed per Turtle grammar: integer/decimal/double)
- predicate (`;`) and object (`,`) lists
- blank nodes: ``_:label`` and anonymous ``[ ... ]`` property lists
  (label-preserving / generated ``_:b<n>`` — the engine's term model
  carries them as kind='bnode')
- RDF collections ``( ... )`` → rdf:first/rest chains

Output rows are ``(subj, pred, obj, obj_kind, obj_dt, obj_lang)`` —
directly consumable by ``parse_shapes_graph`` and
``triples_from_rows``.  Shapes-graph parsing is a driver-side,
driver-sized operation by design (SURVEY.md §3.2); bulk DATA in
Turtle would be converted once to parquet on ingest.
"""

from __future__ import annotations

import re

from shacl_spark.functions.terms import RDF, XSD

RDF_FIRST, RDF_REST, RDF_NIL = RDF + "first", RDF + "rest", RDF + "nil"

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iri><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<str_long>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<str>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<dtype>\^\^)
  | (?P<prefix_decl>@prefix\b|@base\b|\bPREFIX\b|\bBASE\b)
  | (?P<lang>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<num>[+-]?(?:\d+\.\d+(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?))
  | (?P<bnode>_:[A-Za-z0-9_\-](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?)
  | (?P<pname>[A-Za-z0-9_\-.]*:(?:[A-Za-z0-9_\-.%]*[A-Za-z0-9_\-%])?)
  | (?P<kw_a>\ba\b)
  | (?P<bool>\btrue\b|\bfalse\b)
  | (?P<punct>[\[\]();,.])
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "u" and i + 6 <= len(s):
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= len(s):
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


class _Term:
    __slots__ = ("value", "kind", "dt", "lang")

    def __init__(self, value, kind, dt=None, lang=None):
        self.value, self.kind, self.dt, self.lang = value, kind, dt, lang


class TurtleParser:
    def __init__(self, text: str):
        self.tokens: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN.match(text, pos)
            if m is None:
                raise ValueError(f"turtle: cannot tokenize at offset {pos}: {text[pos:pos+30]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind != "ws":
                self.tokens.append((kind, m.group()))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.rows: list[tuple] = []
        self._bn = 0

    # --- token helpers -------------------------------------------------------

    def _peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else (None, None)

    def _next(self):
        tok = self._peek()
        self.i += 1
        return tok

    def _expect_punct(self, ch: str):
        kind, val = self._next()
        if kind != "punct" or val != ch:
            raise ValueError(f"turtle: expected {ch!r}, got {val!r}")

    def _fresh_bnode(self) -> _Term:
        self._bn += 1
        return _Term(f"_:gen{self._bn}", "bnode")

    # --- grammar --------------------------------------------------------------

    def parse(self) -> list[tuple]:
        while self._peek()[0] is not None:
            kind, val = self._peek()
            if kind == "prefix_decl":
                self._directive()
            else:
                self._triples_block()
        return self.rows

    def _directive(self):
        _, which = self._next()
        if which in ("@prefix", "PREFIX"):
            pk, pv = self._next()
            if pk != "pname" or not pv.endswith(":"):
                raise ValueError(f"turtle: bad prefix name {pv!r}")
            ik, iv = self._next()
            if ik != "iri":
                raise ValueError("turtle: prefix IRI expected")
            self.prefixes[pv[:-1]] = self.base + iv[1:-1] if not _abs(iv[1:-1]) else iv[1:-1]
        else:  # @base / BASE
            ik, iv = self._next()
            if ik != "iri":
                raise ValueError("turtle: base IRI expected")
            self.base = iv[1:-1]
        if which in ("@prefix", "@base"):
            self._expect_punct(".")

    def _triples_block(self):
        subj = self._subject()
        self._predicate_object_list(subj)
        self._expect_punct(".")

    def _subject(self) -> _Term:
        kind, val = self._peek()
        if kind in ("iri", "pname", "bnode"):
            return self._term()
        if kind == "punct" and val == "[":
            return self._blank_property_list()
        if kind == "punct" and val == "(":
            return self._collection()
        raise ValueError(f"turtle: bad subject {val!r}")

    def _predicate_object_list(self, subj: _Term):
        while True:
            pred = self._predicate()
            while True:
                obj = self._object()
                self._emit(subj, pred, obj)
                k, v = self._peek()
                if k == "punct" and v == ",":
                    self._next()
                    continue
                break
            k, v = self._peek()
            if k == "punct" and v == ";":
                self._next()
                # allow trailing ';' before '.' or ']'
                k2, v2 = self._peek()
                if k2 == "punct" and v2 in (".", "]"):
                    break
                continue
            break

    def _predicate(self) -> str:
        kind, val = self._peek()
        if kind == "kw_a":
            self._next()
            return RDF + "type"
        if kind in ("iri", "pname"):
            return self._term().value
        raise ValueError(f"turtle: bad predicate {val!r}")

    def _object(self) -> _Term:
        kind, val = self._peek()
        if kind in ("iri", "pname", "bnode"):
            return self._term()
        if kind in ("str", "str_long"):
            return self._literal()
        if kind == "num":
            self._next()
            if re.fullmatch(r"[+-]?\d+", val):
                dt = XSD + "integer"
            elif "e" in val.lower():
                dt = XSD + "double"
            else:
                dt = XSD + "decimal"
            return _Term(val, "literal", dt)
        if kind == "bool":
            self._next()
            return _Term(val, "literal", XSD + "boolean")
        if kind == "punct" and val == "[":
            return self._blank_property_list()
        if kind == "punct" and val == "(":
            return self._collection()
        raise ValueError(f"turtle: bad object {val!r}")

    def _literal(self) -> _Term:
        kind, raw = self._next()
        body = raw[3:-3] if kind == "str_long" else raw[1:-1]
        value = _unescape(body)
        k, v = self._peek()
        if k == "lang":
            self._next()
            return _Term(value, "literal", RDF + "langString", v[1:].lower())
        if k == "dtype":
            self._next()
            dt = self._term().value
            return _Term(value, "literal", dt)
        return _Term(value, "literal", XSD + "string")

    def _term(self) -> _Term:
        kind, val = self._next()
        if kind == "iri":
            iri = val[1:-1]
            return _Term(iri if _abs(iri) else self.base + iri, "iri")
        if kind == "pname":
            pfx, _, local = val.partition(":")
            if pfx not in self.prefixes:
                raise ValueError(f"turtle: undeclared prefix {pfx!r}:")
            return _Term(self.prefixes[pfx] + local, "iri")
        if kind == "bnode":
            return _Term(val, "bnode")
        raise ValueError(f"turtle: bad term {val!r}")

    def _blank_property_list(self) -> _Term:
        self._expect_punct("[")
        node = self._fresh_bnode()
        k, v = self._peek()
        if not (k == "punct" and v == "]"):
            self._predicate_object_list(node)
        self._expect_punct("]")
        return node

    def _collection(self) -> _Term:
        self._expect_punct("(")
        items: list[_Term] = []
        while True:
            k, v = self._peek()
            if k == "punct" and v == ")":
                self._next()
                break
            items.append(self._object())
        if not items:
            return _Term(RDF_NIL, "iri")
        nodes = [self._fresh_bnode() for _ in items]
        for n, item, nxt in zip(nodes, items, nodes[1:] + [None]):
            self._emit(n, RDF_FIRST, item)
            self._emit(n, RDF_REST, nxt if nxt is not None else _Term(RDF_NIL, "iri"))
        return nodes[0]

    def _emit(self, subj: _Term, pred: str, obj: _Term):
        self.rows.append((subj.value, pred, obj.value, obj.kind, obj.dt, obj.lang))


def _abs(iri: str) -> bool:
    return re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri) is not None


def parse_turtle(text: str) -> list[tuple]:
    """Turtle document → (subj, pred, obj, obj_kind, obj_dt, obj_lang)
    rows, blank nodes label-preserved/skolem-generated."""
    return TurtleParser(text).parse()


def parse_turtle_file(path: str) -> list[tuple]:
    with open(path, encoding="utf-8") as f:
        return parse_turtle(f.read())
