"""Driver-visible SHACL queries: every core constraint-component
family gets a `queries()` entry that runs the REAL engine
(shacl_spark.shacl.validate) over the committed deterministic fixture
(fixtures/shacl_triples.parquet) and a hand-written DuckDB `oracle_sql`
that recomputes the same violation set relationally — so the driver's
independent correctness gate exercises the SHACL layer itself
(VERDICT r01 "Next round" #1).

Both sides read the SAME parquet; result columns are
(focus, path, value, component), all strings (value NULL for
focus-level components), hash-compared order-insensitively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shacl_spark.functions.terms import RDF, RDFS, SH, XSD

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "shacl_triples.parquet",
)

T = RDF + "type"
SCO = RDFS + "subClassOf"
STR = XSD + "string"
INT = XSD + "integer"
FIRST, REST, NIL = RDF + "first", RDF + "rest", RDF + "nil"

# --- SQL building blocks -----------------------------------------------------

_TSRC = f"SELECT * FROM read_parquet('{FIXTURE}')"


def _closure_cte(root: str) -> str:
    """Recursive subclass closure + SHACL instances of ``root``."""
    return f"""
t AS ({_TSRC}),
sub AS (SELECT '{root}' AS c
        UNION
        SELECT t.subj FROM t, sub WHERE t.pred = '{SCO}' AND t.obj = sub.c),
inst AS (SELECT DISTINCT subj FROM t
         WHERE pred = '{T}' AND obj IN (SELECT c FROM sub))"""


def _focus_class(root: str) -> str:
    """CTE list selecting focus = instances of root (with closure)."""
    return _closure_cte(root) + ",\nfocus AS (SELECT subj AS f FROM inst)"


def _res(path_sql: str, value_sql: str, comp: str) -> str:
    return (
        f"{path_sql} AS path, {value_sql} AS value, '{SH}{comp}' AS component"
    )


# --- registry ----------------------------------------------------------------

SHACL_QUERIES: dict = {}
SHACL_ORACLES: dict[str, str] = {}


def _q(name: str, shapes: list, sql: str, cols: tuple = ("focus", "path", "value", "component")):
    def fn(spark: SparkSession, sf_dir: str, _shapes=shapes, _cols=cols) -> DataFrame:
        from shacl_spark.shacl import validate

        triples = spark.read.parquet(FIXTURE)
        rep = validate(spark, triples, _shapes)
        return rep.select(*_cols)

    fn.__name__ = name
    SHACL_QUERIES[name] = fn
    SHACL_ORACLES[name] = sql


def _rdf_list(prefix: str, terms) -> list[tuple]:
    rows = []
    n = len(terms)
    for i, term in enumerate(terms):
        node = f"{prefix}/{i}"
        if isinstance(term, str):
            rows.append((node, FIRST, term))
        else:
            rows.append((node, FIRST, term[0], term[1], term[2]))
        rows.append((node, REST, f"{prefix}/{i+1}" if i + 1 < n else NIL))
    return rows


def _ps(shape_iri: str, target: tuple[str, str], path: str, *params) -> list[tuple]:
    """Node shape with one property shape; params are (pred, obj, kind, dt)."""
    ns, ps = shape_iri, shape_iri + "P"
    rows = [
        (ns, T, SH + "NodeShape"),
        (ns, SH + target[0], target[1]),
        (ns, SH + "property", ps),
        (ps, SH + "path", path),
    ]
    for p in params:
        rows.append((ps,) + p)
    return rows


# === B: cardinality ===========================================================

_q(
    "shacl_mincount",
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:name",
        (SH + "minCount", "1", "literal", INT)),
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
vals AS (SELECT subj, count(*) AS n FROM t WHERE pred = 'ex:name' GROUP BY subj)
SELECT f.f AS focus, {_res("'ex:name'", "CAST(NULL AS VARCHAR)", "MinCountConstraintComponent")}
FROM focus f LEFT JOIN vals v ON v.subj = f.f
WHERE coalesce(v.n, 0) < 1""",
)

_q(
    "shacl_maxcount",
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:email",
        (SH + "maxCount", "2", "literal", INT)),
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
vals AS (SELECT subj, count(*) AS n FROM t WHERE pred = 'ex:email' GROUP BY subj)
SELECT f.f AS focus, {_res("'ex:email'", "CAST(NULL AS VARCHAR)", "MaxCountConstraintComponent")}
FROM focus f JOIN vals v ON v.subj = f.f
WHERE v.n > 2""",
)

# === B: value type ============================================================

_q(
    "shacl_class_closure",
    _ps("ex:S", ("targetClass", "ex:Employee"), "ex:knows",
        (SH + "class", "ex:Person")),
    f"""WITH RECURSIVE {_closure_cte("ex:Person")},
esub AS (SELECT 'ex:Employee' AS c
         UNION
         SELECT t.subj FROM t, esub WHERE t.pred = '{SCO}' AND t.obj = esub.c),
focus AS (SELECT DISTINCT subj AS f FROM t
          WHERE pred = '{T}' AND obj IN (SELECT c FROM esub)),
vn AS (SELECT f.f, t.obj, t.obj_kind FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:knows')
SELECT f AS focus, {_res("'ex:knows'", "obj", "ClassConstraintComponent")}
FROM vn WHERE obj_kind NOT IN ('iri', 'bnode') OR obj NOT IN (SELECT subj FROM inst)""",
)

_q(
    "shacl_datatype",
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:age",
        (SH + "datatype", INT)),
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
vn AS (SELECT f.f, t.obj, t.obj_kind, t.obj_dt FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:age')
SELECT f AS focus, {_res("'ex:age'", "obj", "DatatypeConstraintComponent")}
FROM vn WHERE NOT (obj_kind = 'literal' AND obj_dt = '{INT}'
                   AND regexp_full_match(obj, '[+-]?[0-9]+'))""",
)

_q(
    "shacl_nodekind",
    _ps("ex:S", ("targetSubjectsOf", "ex:knows"), "ex:knows",
        (SH + "nodeKind", SH + "IRI")),
    f"""WITH t AS ({_TSRC}),
focus AS (SELECT DISTINCT subj AS f FROM t WHERE pred = 'ex:knows'),
vn AS (SELECT f.f, t.obj, t.obj_kind FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:knows')
SELECT f AS focus, {_res("'ex:knows'", "obj", "NodeKindConstraintComponent")}
FROM vn WHERE obj_kind <> 'iri'""",
)

# === B: value range ===========================================================

_NUM = (
    f"CASE WHEN obj_kind = 'literal' AND (obj_dt IS NULL OR obj_dt IN "
    f"('{INT}','{XSD}decimal','{XSD}double','{XSD}float','{XSD}long','{XSD}int')) "
    f"THEN TRY_CAST(obj AS DOUBLE) END"
)

_q(
    "shacl_range",
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:age",
        (SH + "minInclusive", "18", "literal", INT),
        (SH + "maxInclusive", "65", "literal", INT)),
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
vn AS (SELECT f.f, t.obj, t.obj_kind, t.obj_dt, {_NUM} AS num FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:age')
SELECT f AS focus, {_res("'ex:age'", "obj", "MinInclusiveConstraintComponent")}
FROM vn WHERE NOT coalesce(num >= 18, false)
UNION ALL
SELECT f AS focus, {_res("'ex:age'", "obj", "MaxInclusiveConstraintComponent")}
FROM vn WHERE NOT coalesce(num <= 65, false)""",
)

# === B: string facets =========================================================

_q(
    "shacl_string_facets",
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:email",
        (SH + "minLength", "13", "literal", INT),
        (SH + "maxLength", "30", "literal", INT),
        (SH + "pattern", "^[^@]+@[^@]+$", "literal", STR)),
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
vn AS (SELECT f.f, t.obj, t.obj_kind FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:email')
SELECT f AS focus, {_res("'ex:email'", "obj", "MinLengthConstraintComponent")}
FROM vn WHERE obj_kind = 'bnode' OR length(obj) < 13
UNION ALL
SELECT f AS focus, {_res("'ex:email'", "obj", "MaxLengthConstraintComponent")}
FROM vn WHERE obj_kind = 'bnode' OR length(obj) > 30
UNION ALL
SELECT f AS focus, {_res("'ex:email'", "obj", "PatternConstraintComponent")}
FROM vn WHERE obj_kind = 'bnode' OR NOT regexp_matches(obj, '^[^@]+@[^@]+$')""",
)

_q(
    "shacl_language",
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:label",
        (SH + "uniqueLang", "true", "literal", XSD + "boolean"))
    + _ps("ex:S2", ("targetClass", "ex:Person"), "ex:label",
          (SH + "languageIn", "ex:langs/0"))
    + _rdf_list("ex:langs", [("en", "literal", None)]),
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
vn AS (SELECT f.f, t.obj, t.obj_kind, t.obj_lang FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:label')
SELECT f AS focus, {_res("'ex:label'", "CAST(NULL AS VARCHAR)", "UniqueLangConstraintComponent")}
FROM (SELECT f FROM vn WHERE obj_lang IS NOT NULL
      GROUP BY f, lower(obj_lang) HAVING count(*) > 1)
GROUP BY f
UNION ALL
SELECT f AS focus, {_res("'ex:label'", "obj", "LanguageInConstraintComponent")}
FROM vn WHERE obj_kind <> 'literal' OR obj_lang IS NULL
            OR NOT (lower(obj_lang) = 'en' OR lower(obj_lang) LIKE 'en-%')""",
)

# === B: in / hasValue =========================================================

_q(
    "shacl_in_hasvalue",
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:dept",
        (SH + "in", "ex:depts/0"))
    + _rdf_list("ex:depts", [("eng", "literal", STR), ("sales", "literal", STR),
                             ("hr", "literal", STR)])
    + _ps("ex:S2", ("targetClass", "ex:Employee"), "ex:dept",
          (SH + "hasValue", "eng", "literal", STR)),
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
esub AS (SELECT 'ex:Employee' AS c
         UNION
         SELECT t.subj FROM t, esub WHERE t.pred = '{SCO}' AND t.obj = esub.c),
efocus AS (SELECT DISTINCT subj AS f FROM t
           WHERE pred = '{T}' AND obj IN (SELECT c FROM esub)),
vn AS (SELECT f.f, t.obj, t.obj_kind, t.obj_dt FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:dept')
SELECT f AS focus, {_res("'ex:dept'", "obj", "InConstraintComponent")}
FROM vn WHERE NOT (obj_kind = 'literal' AND obj_dt = '{STR}'
                   AND obj IN ('eng', 'sales', 'hr'))
UNION ALL
SELECT e.f AS focus, {_res("'ex:dept'", "CAST(NULL AS VARCHAR)", "HasValueConstraintComponent")}
FROM efocus e WHERE NOT EXISTS (
  SELECT 1 FROM t WHERE t.subj = e.f AND t.pred = 'ex:dept'
    AND t.obj = 'eng' AND t.obj_kind = 'literal' AND t.obj_dt = '{STR}')""",
)

# === B: property pairs ========================================================

_q(
    "shacl_equals_disjoint",
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:nick",
        (SH + "equals", "ex:name"))
    + _ps("ex:S2", ("targetClass", "ex:Person"), "ex:email",
          (SH + "disjoint", "ex:backup")),
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
nick AS (SELECT f.f, t.obj FROM focus f JOIN t ON t.subj = f.f AND t.pred = 'ex:nick'),
nm   AS (SELECT f.f, t.obj FROM focus f JOIN t ON t.subj = f.f AND t.pred = 'ex:name'),
em   AS (SELECT f.f, t.obj FROM focus f JOIN t ON t.subj = f.f AND t.pred = 'ex:email'),
bk   AS (SELECT f.f, t.obj FROM focus f JOIN t ON t.subj = f.f AND t.pred = 'ex:backup')
SELECT f AS focus, {_res("'ex:nick'", "obj", "EqualsConstraintComponent")}
FROM nick n WHERE NOT EXISTS (SELECT 1 FROM nm m WHERE m.f = n.f AND m.obj = n.obj)
UNION ALL
SELECT f AS focus, {_res("'ex:nick'", "obj", "EqualsConstraintComponent")}
FROM nm m WHERE NOT EXISTS (SELECT 1 FROM nick n WHERE n.f = m.f AND n.obj = m.obj)
UNION ALL
SELECT f AS focus, {_res("'ex:email'", "obj", "DisjointConstraintComponent")}
FROM em e WHERE EXISTS (SELECT 1 FROM bk b WHERE b.f = e.f AND b.obj = e.obj)""",
)

_q(
    "shacl_lessthan",
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:start",
        (SH + "lessThan", "ex:end")),
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
st AS (SELECT f.f, t.obj, {_NUM} AS num FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:start'),
en AS (SELECT f.f, {_NUM} AS num FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:end')
SELECT DISTINCT s.f AS focus, {_res("'ex:start'", "s.obj", "LessThanConstraintComponent")}
FROM st s JOIN en e ON e.f = s.f
WHERE NOT coalesce(s.num < e.num, false)""",
)

# === B: closed ================================================================

_q(
    "shacl_closed",
    [
        ("ex:S", T, SH + "NodeShape"),
        ("ex:S", SH + "targetClass", "ex:Org"),
        ("ex:S", SH + "closed", "true", "literal", XSD + "boolean"),
        ("ex:S", SH + "ignoredProperties", "ex:ign/0"),
    ]
    + _rdf_list("ex:ign", [T]),
    f"""WITH t AS ({_TSRC}),
focus AS (SELECT DISTINCT subj AS f FROM t WHERE pred = '{T}' AND obj = 'ex:Org')
SELECT f.f AS focus, t.pred AS path, t.obj AS value,
       '{SH}ClosedConstraintComponent' AS component
FROM focus f JOIN t ON t.subj = f.f AND t.pred <> '{T}'""",
)

# === B: logical (or / not) ====================================================

_INT_SHAPE = [
    ("ex:IntShape", T, SH + "NodeShape"),
    ("ex:IntShape", SH + "datatype", INT),
]
_IRI_SHAPE = [
    ("ex:IriShape", T, SH + "NodeShape"),
    ("ex:IriShape", SH + "nodeKind", SH + "IRI"),
]

_CONF_INT = f"(obj_kind = 'literal' AND obj_dt = '{INT}' AND regexp_full_match(obj, '[+-]?[0-9]+'))"

_q(
    "shacl_logical_or_not",
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:age",
        (SH + "or", "ex:orl/0"))
    + _rdf_list("ex:orl", ["ex:IntShape", "ex:IriShape"])
    + _INT_SHAPE + _IRI_SHAPE
    + _ps("ex:S2", ("targetClass", "ex:Person"), "ex:dept",
          (SH + "not", "ex:UnknownShape"))
    + [
        ("ex:UnknownShape", T, SH + "NodeShape"),
        ("ex:UnknownShape", SH + "hasValue", "unknown", "literal", STR),
    ],
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
vn AS (SELECT f.f, t.obj, t.obj_kind, t.obj_dt FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:age'),
dept AS (SELECT f.f, t.obj, t.obj_kind, t.obj_dt FROM focus f
         JOIN t ON t.subj = f.f AND t.pred = 'ex:dept')
SELECT f AS focus, {_res("'ex:age'", "obj", "OrConstraintComponent")}
FROM vn WHERE NOT ({_CONF_INT} OR obj_kind = 'iri')
UNION ALL
SELECT f AS focus, {_res("'ex:dept'", "obj", "NotConstraintComponent")}
FROM dept WHERE obj_kind = 'literal' AND obj_dt = '{STR}' AND obj = 'unknown'""",
)

_q(
    "shacl_xone",
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:age",
        (SH + "xone", "ex:xl/0"))
    + _rdf_list("ex:xl", ["ex:IntShape", "ex:ShortShape"])
    + _INT_SHAPE
    + [
        ("ex:ShortShape", T, SH + "NodeShape"),
        ("ex:ShortShape", SH + "maxLength", "2", "literal", INT),
    ],
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
vn AS (SELECT f.f, t.obj, t.obj_kind, t.obj_dt FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:age')
SELECT f AS focus, {_res("'ex:age'", "obj", "XoneConstraintComponent")}
FROM vn
WHERE (CASE WHEN {_CONF_INT} THEN 1 ELSE 0 END
     + CASE WHEN obj_kind <> 'bnode' AND length(obj) <= 2 THEN 1 ELSE 0 END) <> 1""",
)

# === B: logical (and) =========================================================

_q(
    "shacl_and",
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:age",
        (SH + "and", "ex:andl/0"))
    + _rdf_list("ex:andl", ["ex:IntShape", "ex:AdultShape"])
    + _INT_SHAPE
    + [
        ("ex:AdultShape", T, SH + "NodeShape"),
        ("ex:AdultShape", SH + "minInclusive", "18", "literal", INT),
    ],
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
vn AS (SELECT f.f, t.obj, t.obj_kind, t.obj_dt, {_NUM} AS num FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:age')
SELECT f AS focus, {_res("'ex:age'", "obj", "AndConstraintComponent")}
FROM vn WHERE NOT ({_CONF_INT} AND coalesce(num >= 18, false))""",
)

# === B: severity / message / deactivated ======================================

_q(
    "shacl_severity",
    # active Warning-severity shape with a custom message, plus a
    # deactivated twin that would otherwise flag every Person (nobody
    # has ex:phone) — the result proves both the severity/message stamp
    # and the sh:deactivated suppression.
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:name",
        (SH + "minCount", "1", "literal", INT),
        (SH + "severity", SH + "Warning"),
        (SH + "message", "every person needs a name", "literal", STR))
    + _ps("ex:S2", ("targetClass", "ex:Person"), "ex:phone",
          (SH + "minCount", "1", "literal", INT),
          (SH + "deactivated", "true", "literal", XSD + "boolean")),
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
vals AS (SELECT subj, count(*) AS n FROM t WHERE pred = 'ex:name' GROUP BY subj)
SELECT f.f AS focus, 'ex:name' AS path, CAST(NULL AS VARCHAR) AS value,
       '{SH}MinCountConstraintComponent' AS component,
       '{SH}Warning' AS severity,
       'every person needs a name' AS message
FROM focus f LEFT JOIN vals v ON v.subj = f.f
WHERE coalesce(v.n, 0) < 1""",
    cols=("focus", "path", "value", "component", "severity", "message"),
)

# === B: shape-based (sh:node with nested property shape) =====================

_q(
    "shacl_node_ref",
    _ps("ex:S", ("targetClass", "ex:Person"), "ex:worksFor",
        (SH + "node", "ex:OrgShape"))
    + [
        ("ex:OrgShape", T, SH + "NodeShape"),
        ("ex:OrgShape", SH + "class", "ex:Org"),
        ("ex:OrgShape", SH + "property", "ex:OrgCity"),
        ("ex:OrgCity", SH + "path", "ex:locatedIn"),
        ("ex:OrgCity", SH + "minCount", "1", "literal", INT),
    ],
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
vn AS (SELECT f.f, t.obj, t.obj_kind FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:worksFor')
SELECT f AS focus, {_res("'ex:worksFor'", "obj", "NodeConstraintComponent")}
FROM vn WHERE NOT (
  obj_kind IN ('iri', 'bnode')
  AND EXISTS (SELECT 1 FROM t WHERE t.subj = vn.obj AND t.pred = '{T}' AND t.obj = 'ex:Org')
  AND EXISTS (SELECT 1 FROM t WHERE t.subj = vn.obj AND t.pred = 'ex:locatedIn'))""",
)

# === B: qualified value shape =================================================

_q(
    "shacl_qualified_min",
    _ps("ex:S", ("targetClass", "ex:Employee"), "ex:knows",
        (SH + "qualifiedValueShape", "ex:PersonShape"),
        (SH + "qualifiedMinCount", "1", "literal", INT))
    + [
        ("ex:PersonShape", T, SH + "NodeShape"),
        ("ex:PersonShape", SH + "class", "ex:Person"),
    ],
    f"""WITH RECURSIVE {_closure_cte("ex:Person")},
esub AS (SELECT 'ex:Employee' AS c
         UNION
         SELECT t.subj FROM t, esub WHERE t.pred = '{SCO}' AND t.obj = esub.c),
focus AS (SELECT DISTINCT subj AS f FROM t
          WHERE pred = '{T}' AND obj IN (SELECT c FROM esub)),
ok AS (SELECT f.f, count(*) AS n FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:knows'
            AND t.obj_kind IN ('iri', 'bnode') AND t.obj IN (SELECT subj FROM inst)
       GROUP BY f.f)
SELECT f.f AS focus, {_res("'ex:knows'", "CAST(NULL AS VARCHAR)", "QualifiedMinCountConstraintComponent")}
FROM focus f LEFT JOIN ok o ON o.f = f.f
WHERE coalesce(o.n, 0) < 1""",
)

# === D: property paths ========================================================

_q(
    "shacl_path_sequence",
    [
        ("ex:S", T, SH + "NodeShape"),
        ("ex:S", SH + "targetClass", "ex:Person"),
        ("ex:S", SH + "property", "ex:SP"),
        ("ex:SP", SH + "path", "ex:seq/0"),
        ("ex:SP", SH + "minCount", "1", "literal", INT),
    ]
    + _rdf_list("ex:seq", ["ex:worksFor", "ex:locatedIn"]),
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
vals AS (SELECT w.subj, count(*) AS n FROM t w
         JOIN t l ON l.subj = w.obj AND l.pred = 'ex:locatedIn'
         WHERE w.pred = 'ex:worksFor' GROUP BY w.subj)
SELECT f.f AS focus, {_res("'ex:worksFor/ex:locatedIn'", "CAST(NULL AS VARCHAR)", "MinCountConstraintComponent")}
FROM focus f LEFT JOIN vals v ON v.subj = f.f
WHERE coalesce(v.n, 0) < 1""",
)

_q(
    "shacl_path_inverse_alt",
    [
        ("ex:S", T, SH + "NodeShape"),
        ("ex:S", SH + "targetClass", "ex:Employee"),
        ("ex:S", SH + "property", "ex:SP"),
        ("ex:SP", SH + "path", "ex:alt"),
        ("ex:alt", SH + "alternativePath", "ex:altl/0"),
        ("ex:SP", SH + "minCount", "2", "literal", INT),
    ]
    + _rdf_list("ex:altl", ["ex:inv", "ex:reportsTo"])
    + [("ex:inv", SH + "inversePath", "ex:managerOf")],
    f"""WITH RECURSIVE
t AS ({_TSRC}),
esub AS (SELECT 'ex:Employee' AS c
         UNION
         SELECT t.subj FROM t, esub WHERE t.pred = '{SCO}' AND t.obj = esub.c),
focus AS (SELECT DISTINCT subj AS f FROM t
          WHERE pred = '{T}' AND obj IN (SELECT c FROM esub)),
vals AS (
  SELECT f.f, t.subj AS v FROM focus f
  JOIN t ON t.pred = 'ex:managerOf' AND t.obj = f.f AND t.obj_kind = 'iri'
  UNION
  SELECT f.f, t.obj AS v FROM focus f
  JOIN t ON t.subj = f.f AND t.pred = 'ex:reportsTo'),
cnt AS (SELECT f, count(*) AS n FROM vals GROUP BY f)
SELECT f.f AS focus, {_res("'^ex:managerOf|ex:reportsTo'", "CAST(NULL AS VARCHAR)", "MinCountConstraintComponent")}
FROM focus f LEFT JOIN cnt c ON c.f = f.f
WHERE coalesce(c.n, 0) < 2""",
)

_q(
    "shacl_path_zeroormore",
    [
        ("ex:S", T, SH + "NodeShape"),
        ("ex:S", SH + "targetClass", "ex:Employee"),
        ("ex:S", SH + "property", "ex:SP"),
        ("ex:SP", SH + "path", "ex:star"),
        ("ex:star", SH + "zeroOrMorePath", "ex:reportsTo"),
        ("ex:SP", SH + "class", "ex:Agent"),
    ],
    f"""WITH RECURSIVE {_closure_cte("ex:Agent")},
esub AS (SELECT 'ex:Employee' AS c
         UNION
         SELECT t.subj FROM t, esub WHERE t.pred = '{SCO}' AND t.obj = esub.c),
focus AS (SELECT DISTINCT subj AS f FROM t
          WHERE pred = '{T}' AND obj IN (SELECT c FROM esub)),
chain AS (
  SELECT f AS f, f AS v FROM focus
  UNION
  SELECT c.f, t.obj FROM chain c
  JOIN t ON t.subj = c.v AND t.pred = 'ex:reportsTo'),
viol AS (SELECT DISTINCT f, v FROM chain
         WHERE v NOT IN (SELECT subj FROM inst))
SELECT f AS focus, {_res("'(ex:reportsTo)*'", "v", "ClassConstraintComponent")}
FROM viol""",
)

_q(
    "shacl_path_oneormore_zeroorone",
    # D6 + D7 get an oracle-backed row (r04): (p)+ values exclude the
    # focus itself (vs the (p)* query above), (p)? values are self plus
    # at most one step — nodeKind IRI passes the IRI focus and flags
    # the literal backup values
    [
        ("ex:S1", T, SH + "NodeShape"),
        ("ex:S1", SH + "targetClass", "ex:Employee"),
        ("ex:S1", SH + "property", "ex:S1P"),
        ("ex:S1P", SH + "path", "ex:plus"),
        ("ex:plus", SH + "oneOrMorePath", "ex:reportsTo"),
        ("ex:S1P", SH + "class", "ex:Agent"),
        ("ex:S2", T, SH + "NodeShape"),
        ("ex:S2", SH + "targetSubjectsOf", "ex:backup"),
        ("ex:S2", SH + "property", "ex:S2P"),
        ("ex:S2P", SH + "path", "ex:opt"),
        ("ex:opt", SH + "zeroOrOnePath", "ex:backup"),
        ("ex:S2P", SH + "nodeKind", SH + "IRI"),
    ],
    f"""WITH RECURSIVE {_closure_cte("ex:Agent")},
esub AS (SELECT 'ex:Employee' AS c
         UNION
         SELECT t.subj FROM t, esub WHERE t.pred = '{SCO}' AND t.obj = esub.c),
focus AS (SELECT DISTINCT subj AS f FROM t
          WHERE pred = '{T}' AND obj IN (SELECT c FROM esub)),
chain AS (
  SELECT f.f, t.obj AS v FROM focus f
  JOIN t ON t.subj = f.f AND t.pred = 'ex:reportsTo'
  UNION
  SELECT c.f, t.obj FROM chain c
  JOIN t ON t.subj = c.v AND t.pred = 'ex:reportsTo'),
bfocus AS (SELECT DISTINCT subj AS f FROM t WHERE pred = 'ex:backup'),
bvals AS (
  SELECT f AS f, f AS v, 'iri' AS k FROM bfocus
  UNION ALL
  SELECT b.f, t.obj, t.obj_kind FROM bfocus b
  JOIN t ON t.subj = b.f AND t.pred = 'ex:backup')
SELECT DISTINCT f AS focus,
       {_res("'(ex:reportsTo)+'", "v", "ClassConstraintComponent")}
FROM chain WHERE v NOT IN (SELECT subj FROM inst)
UNION
SELECT DISTINCT f AS focus,
       {_res("'(ex:backup)?'", "v", "NodeKindConstraintComponent")}
FROM bvals WHERE k != 'iri'""",
)

# === C: targets ===============================================================

_q(
    "shacl_targets_combined",
    [
        ("ex:S", T, SH + "NodeShape"),
        ("ex:S", SH + "targetNode", "ex:p0"),
        ("ex:S", SH + "targetObjectsOf", "ex:worksFor"),
        ("ex:S", SH + "targetSubjectsOf", "ex:locatedIn"),
        ("ex:S", SH + "class", "ex:Org"),
    ],
    f"""WITH RECURSIVE {_closure_cte("ex:Org")},
focus AS (
  SELECT 'ex:p0' AS f
  UNION
  SELECT DISTINCT obj FROM t WHERE pred = 'ex:worksFor' AND obj_kind = 'iri'
  UNION
  SELECT DISTINCT subj FROM t WHERE pred = 'ex:locatedIn')
SELECT f AS focus, {_res("CAST(NULL AS VARCHAR)", "f", "ClassConstraintComponent")}
FROM focus WHERE f NOT IN (SELECT subj FROM inst)""",
)

# === report serialization (SPEC §3.6) =========================================

_MC_FOCUS_SQL = f"""
t AS ({_TSRC}),
sub AS (SELECT 'ex:Person' AS c
        UNION
        SELECT t.subj FROM t, sub WHERE t.pred = '{SCO}' AND t.obj = sub.c),
inst AS (SELECT DISTINCT subj FROM t
         WHERE pred = '{T}' AND obj IN (SELECT c FROM sub)),
vals AS (SELECT subj, count(*) AS n FROM t WHERE pred = 'ex:name' GROUP BY subj),
bad AS (SELECT i.subj AS focus FROM inst i LEFT JOIN vals v ON v.subj = i.subj
        WHERE coalesce(v.n, 0) < 1)"""

# rid = content hash over the 13 report columns, NULLs encoded as \x01
_RID_SQL = (
    "'urn:shacl:result/' || substr(sha256("
    "focus || chr(0) || 'iri' || chr(0) || chr(1) || chr(0) || chr(1) || chr(0) || "
    "'ex:name' || chr(0) || chr(1) || chr(0) || chr(1) || chr(0) || chr(1) || chr(0) || chr(1) || chr(0) || "
    f"'{SH}MinCountConstraintComponent' || chr(0) || '{SH}Violation' || chr(0) || "
    "'fewer than 1 values' || chr(0) || 'ex:SP'), 1, 32)"
)


def _report_query(spark: SparkSession, sf_dir: str) -> "DataFrame":
    """Serialize the shacl_mincount report to sh:ValidationReport
    triples via the real engine + report_to_triples."""
    from shacl_spark.shacl import validate
    from shacl_spark.shacl.report import report_to_triples

    shapes = _ps(
        "ex:S", ("targetClass", "ex:Person"), "ex:name",
        (SH + "minCount", "1", "literal", INT),
    )
    triples = spark.read.parquet(FIXTURE)
    rep = validate(spark, triples, shapes)
    return report_to_triples(rep).select(
        "subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"
    )


_report_query.__name__ = "shacl_report_triples"
SHACL_QUERIES["shacl_report_triples"] = _report_query
SHACL_ORACLES["shacl_report_triples"] = f"""WITH RECURSIVE {_MC_FOCUS_SQL},
rids AS (SELECT focus, {_RID_SQL} AS rid FROM bad),
v AS (SELECT CAST(NULL AS VARCHAR) AS x)
SELECT 'urn:shacl:report' AS subj, '{RDF}type' AS pred,
       '{SH}ValidationReport' AS obj, 'iri' AS obj_kind,
       CAST(NULL AS VARCHAR) AS obj_dt, CAST(NULL AS VARCHAR) AS obj_lang
UNION ALL
SELECT 'urn:shacl:report', '{SH}conforms',
       CASE WHEN (SELECT count(*) FROM bad) = 0 THEN 'true' ELSE 'false' END,
       'literal', '{XSD}boolean', NULL
UNION ALL
SELECT 'urn:shacl:report', '{SH}result', rid, 'iri', NULL, NULL FROM rids
UNION ALL
SELECT rid, '{RDF}type', '{SH}ValidationResult', 'iri', NULL, NULL FROM rids
UNION ALL
SELECT rid, '{SH}focusNode', focus, 'iri', NULL, NULL FROM rids
UNION ALL
SELECT rid, '{SH}resultPath', 'ex:name', 'iri', NULL, NULL FROM rids
UNION ALL
SELECT rid, '{SH}sourceConstraintComponent', '{SH}MinCountConstraintComponent',
       'iri', NULL, NULL FROM rids
UNION ALL
SELECT rid, '{SH}resultSeverity', '{SH}Violation', 'iri', NULL, NULL FROM rids
UNION ALL
SELECT rid, '{SH}sourceShape', 'ex:SP', 'iri', NULL, NULL FROM rids
UNION ALL
SELECT rid, '{SH}resultMessage', 'fewer than 1 values', 'literal',
       '{XSD}string', NULL FROM rids"""

# === SPARQL-based constraints (SPEC §5) =======================================

_q(
    "shacl_sparql_constraint",
    # two SPARQL shapes in one validation: the numeric-filter BGP and —
    # r04 — a shape whose WHERE uses BOTH quantifier forms (FILTER
    # EXISTS as a semi-join, FILTER NOT EXISTS as an anti-join):
    # "a NAMED person working for an org with no known location"
    [
        ("ex:S", T, SH + "NodeShape"),
        ("ex:S", SH + "targetClass", "ex:Person"),
        ("ex:S", SH + "sparql", "ex:SQ"),
        ("ex:SQ", SH + "select",
         "PREFIX ex: <ex:> SELECT ?this ?value WHERE { "
         "?this ex:start ?value . ?this ex:end ?e . FILTER (?value >= ?e) }",
         "literal", STR),
        ("ex:S2", T, SH + "NodeShape"),
        ("ex:S2", SH + "targetClass", "ex:Person"),
        ("ex:S2", SH + "sparql", "ex:SQ2"),
        ("ex:SQ2", SH + "select",
         "PREFIX ex: <ex:> SELECT ?this ?value WHERE { "
         "?this ex:worksFor ?value . "
         "FILTER EXISTS { ?this ex:name ?n } "
         "FILTER NOT EXISTS { ?value ex:locatedIn ?city } }",
         "literal", STR),
        # r04: UNION arms binding values of DIFFERENT term kinds (the
        # managerOf arm binds IRIs, the backup arm string literals)
        ("ex:S3", T, SH + "NodeShape"),
        ("ex:S3", SH + "targetClass", "ex:Person"),
        ("ex:S3", SH + "sparql", "ex:SQ3"),
        ("ex:SQ3", SH + "select",
         "PREFIX ex: <ex:> SELECT ?this ?value WHERE { "
         "{ ?this ex:managerOf ?value } UNION { ?this ex:backup ?value } }",
         "literal", STR),
        # r05: aggregation (VERDICT r04 #5) — the cardinality-over-join
        # shape: persons with more than 2 ex:email values, sh:value =
        # the offending count as an xsd:integer literal
        ("ex:S4", T, SH + "NodeShape"),
        ("ex:S4", SH + "targetClass", "ex:Person"),
        ("ex:S4", SH + "sparql", "ex:SQ4"),
        ("ex:SQ4", SH + "select",
         "PREFIX ex: <ex:> SELECT ?this (COUNT(?m) AS ?value) WHERE { "
         "?this ex:email ?m . } GROUP BY ?this HAVING (COUNT(?m) > 2)",
         "literal", STR),
    ],
    f"""WITH RECURSIVE {_focus_class("ex:Person")},
st AS (SELECT f.f, t.obj, {_NUM} AS num FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:start'),
en AS (SELECT f.f, {_NUM} AS num FROM focus f
       JOIN t ON t.subj = f.f AND t.pred = 'ex:end')
SELECT DISTINCT s.f AS focus,
       CAST(NULL AS VARCHAR) AS path, s.obj AS value,
       '{SH}SPARQLConstraintComponent' AS component
FROM st s JOIN en e ON e.f = s.f
WHERE s.num >= e.num
UNION
SELECT DISTINCT f.f AS focus,
       CAST(NULL AS VARCHAR) AS path, w.obj AS value,
       '{SH}SPARQLConstraintComponent' AS component
FROM focus f
JOIN t w ON w.subj = f.f AND w.pred = 'ex:worksFor'
WHERE f.f IN (SELECT subj FROM t WHERE pred = 'ex:name')
  AND w.obj NOT IN (SELECT subj FROM t WHERE pred = 'ex:locatedIn')
UNION
SELECT DISTINCT f.f AS focus,
       CAST(NULL AS VARCHAR) AS path, u.obj AS value,
       '{SH}SPARQLConstraintComponent' AS component
FROM focus f
JOIN t u ON u.subj = f.f AND u.pred IN ('ex:managerOf', 'ex:backup')
UNION
SELECT f.f AS focus,
       CAST(NULL AS VARCHAR) AS path,
       CAST(count(*) AS VARCHAR) AS value,
       '{SH}SPARQLConstraintComponent' AS component
FROM focus f
JOIN t m ON m.subj = f.f AND m.pred = 'ex:email'
GROUP BY f.f HAVING count(*) > 2""",
)


# --- r05: standalone SPARQL SELECT surface (sparql.translate_select) ---------
# Post-window registry entries (the 50-slot driver window is zero-sum);
# DuckDB-hash-checked by tests/test_queries_contract.py like every
# other oracle-backed query.


def _sparql_select_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public SELECT surface (jobs/query_graph.py path): BGP equi-joins
    + OPTIONAL unit left-join + SELECT DISTINCT over the committed
    fixture graph, with full term-fidelity columns per variable."""
    from shacl_spark.shacl.sparql import sparql_select

    return sparql_select(
        spark.read.parquet(FIXTURE),
        "PREFIX ex: <ex:> SELECT DISTINCT ?p ?n ?org WHERE { "
        "?p a ex:Person . ?p ex:name ?n . OPTIONAL { ?p ex:worksFor ?org } }",
    )


_sparql_select_engine.__name__ = "sparql_select_engine"
SHACL_QUERIES["sparql_select_engine"] = _sparql_select_engine
SHACL_ORACLES["sparql_select_engine"] = f"""WITH t AS ({_TSRC}),
person AS (SELECT DISTINCT subj FROM t
           WHERE pred = '{T}' AND obj = 'ex:Person' AND obj_kind = 'iri')
SELECT DISTINCT
  person.subj AS p,
  CASE WHEN starts_with(person.subj, '_:') THEN 'bnode' ELSE 'iri' END AS p_kind,
  CAST(NULL AS VARCHAR) AS p_dt, CAST(NULL AS VARCHAR) AS p_lang,
  nm.obj AS n, nm.obj_kind AS n_kind, nm.obj_dt AS n_dt, nm.obj_lang AS n_lang,
  wf.obj AS org, wf.obj_kind AS org_kind, wf.obj_dt AS org_dt,
  wf.obj_lang AS org_lang
FROM person
JOIN t nm ON nm.subj = person.subj AND nm.pred = 'ex:name'
LEFT JOIN t wf ON wf.subj = person.subj AND wf.pred = 'ex:worksFor'"""


def _sparql_select_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT with GROUP BY over an ordinary variable (constraint mode
    forces ?this into GROUP BY; the standalone surface does not):
    employees per department, HAVING-filtered."""
    from shacl_spark.shacl.sparql import sparql_select

    return sparql_select(
        spark.read.parquet(FIXTURE),
        "PREFIX ex: <ex:> SELECT ?dept (COUNT(?p) AS ?n) WHERE { "
        "?p a ex:Employee . ?p ex:dept ?dept } "
        "GROUP BY ?dept HAVING (COUNT(?p) > 1)",
    )


_sparql_select_agg.__name__ = "sparql_select_agg"
SHACL_QUERIES["sparql_select_agg"] = _sparql_select_agg
SHACL_ORACLES["sparql_select_agg"] = f"""WITH t AS ({_TSRC}),
emp AS (SELECT DISTINCT subj FROM t
        WHERE pred = '{T}' AND obj = 'ex:Employee' AND obj_kind = 'iri'),
d AS (SELECT tt.obj, tt.obj_kind, tt.obj_dt, tt.obj_lang
      FROM emp e JOIN t tt ON tt.subj = e.subj AND tt.pred = 'ex:dept')
SELECT obj AS dept, obj_kind AS dept_kind, obj_dt AS dept_dt,
       obj_lang AS dept_lang,
       CAST(count(*) AS VARCHAR) AS n, 'literal' AS n_kind,
       '{XSD}integer' AS n_dt, CAST(NULL AS VARCHAR) AS n_lang
FROM d GROUP BY obj, obj_kind, obj_dt, obj_lang HAVING count(*) > 1"""


# --- r05: RDFS entailment closure (shacl/entailment.py) ----------------------


def _rdfs_entailment_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized RDFS closure of the fixture graph — broadcast-join
    application of driver-computed schema closures (rdfs5/7/2/3/11/9);
    the oracle recomputes it with a recursive CTE."""
    from shacl_spark.shacl.entailment import rdfs_entailment

    return rdfs_entailment(spark.read.parquet(FIXTURE)).select(
        "subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"
    )


_rdfs_entailment_closure.__name__ = "rdfs_entailment_closure"
SHACL_QUERIES["rdfs_entailment_closure"] = _rdfs_entailment_closure
SHACL_ORACLES["rdfs_entailment_closure"] = f"""WITH RECURSIVE t AS ({_TSRC}),
e AS (SELECT subj AS c, obj AS s FROM t
      WHERE pred = '{SCO}' AND obj_kind <> 'literal'),
clo AS (SELECT c, s FROM e
        UNION
        SELECT clo.c, e.s FROM clo JOIN e ON e.c = clo.s),
new_sco AS (SELECT c AS subj, '{SCO}' AS pred, s AS obj FROM clo
            WHERE c <> s AND NOT EXISTS (
              SELECT 1 FROM t
              WHERE t.pred = '{SCO}' AND t.subj = clo.c AND t.obj = clo.s)),
new_type AS (SELECT DISTINCT ty.subj, '{T}' AS pred, clo.s AS obj
             FROM (SELECT subj, obj AS c FROM t WHERE pred = '{T}') ty
             JOIN clo ON clo.c = ty.c
             WHERE clo.c <> clo.s AND NOT EXISTS (
               SELECT 1 FROM t x
               WHERE x.pred = '{T}' AND x.subj = ty.subj AND x.obj = clo.s))
SELECT subj, pred, obj, obj_kind, obj_dt, obj_lang FROM t
UNION ALL
SELECT subj, pred, obj, 'iri', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
FROM new_sco
UNION ALL
SELECT subj, pred, obj, 'iri', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
FROM new_type"""


# --- r05: SPARQL CONSTRUCT / ASK forms (sparql.sparql_query) ------------------


def _sparql_construct_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONSTRUCT over the fixture graph: per-solution template
    instantiation with the SPARQL skip rules (unbound OPTIONAL var ->
    that triple omitted), graph set semantics; returned as the
    canonical six-column triple frame."""
    from shacl_spark.shacl.sparql import sparql_query

    return sparql_query(
        spark.read.parquet(FIXTURE),
        "PREFIX ex: <ex:> CONSTRUCT { ?p ex:label ?n . ?p a ex:Named . "
        "?p ex:employer ?org } WHERE { ?p a ex:Person . ?p ex:name ?n . "
        "OPTIONAL { ?p ex:worksFor ?org } }",
    )


_sparql_construct_engine.__name__ = "sparql_construct_engine"
SHACL_QUERIES["sparql_construct_engine"] = _sparql_construct_engine
SHACL_ORACLES["sparql_construct_engine"] = f"""WITH t AS ({_TSRC}),
person AS (SELECT DISTINCT subj FROM t
           WHERE pred = '{T}' AND obj = 'ex:Person' AND obj_kind = 'iri'),
nm AS (SELECT p.subj, tt.obj, tt.obj_kind, tt.obj_dt, tt.obj_lang
       FROM person p JOIN t tt ON tt.subj = p.subj AND tt.pred = 'ex:name')
SELECT DISTINCT subj, 'ex:label' AS pred, obj, obj_kind, obj_dt, obj_lang
FROM nm
UNION
SELECT DISTINCT subj, '{T}' AS pred, 'ex:Named' AS obj, 'iri' AS obj_kind,
       CAST(NULL AS VARCHAR) AS obj_dt, CAST(NULL AS VARCHAR) AS obj_lang
FROM nm
UNION
SELECT DISTINCT w.subj, 'ex:employer' AS pred, w.obj, w.obj_kind,
       w.obj_dt, w.obj_lang
FROM t w
WHERE w.pred = 'ex:worksFor' AND w.subj IN (SELECT subj FROM nm)"""


def _sparql_ask_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASK over the fixture graph — one lazy boolean row (limit(1)
    short-circuits the scan)."""
    from shacl_spark.shacl.sparql import sparql_query

    return sparql_query(
        spark.read.parquet(FIXTURE),
        "PREFIX ex: <ex:> ASK { ?p a ex:Employee . ?p ex:dept ?d }",
    )


_sparql_ask_engine.__name__ = "sparql_ask_engine"
SHACL_QUERIES["sparql_ask_engine"] = _sparql_ask_engine
SHACL_ORACLES["sparql_ask_engine"] = f"""WITH t AS ({_TSRC})
SELECT EXISTS (
  SELECT 1 FROM t e JOIN t d ON d.subj = e.subj AND d.pred = 'ex:dept'
  WHERE e.pred = '{T}' AND e.obj = 'ex:Employee' AND e.obj_kind = 'iri'
) AS ask"""


# --- r05: SHACL-AF inference rules (shacl/rules.py) ---------------------------


def _shacl_rules_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHACL-AF sh:rule inference to fixpoint over the fixture's
    ex:reportsTo management tree: a TripleRule seeds ex:chain from the
    direct edges (object = path expression), a SPARQLRule squares it
    ($this chain ?m . ?m chain ?b) — the fixpoint is the transitive
    closure restricted to ex:Person focus nodes.  Returns only the
    INFERRED triples; the oracle recomputes them with a recursive CTE."""
    from shacl_spark.functions.terms import SH
    from shacl_spark.shacl.rules import infer_new

    shapes = [
        ("ex:RS", T, SH + "NodeShape", "iri", None, None),
        ("ex:RS", SH + "targetClass", "ex:Person", "iri", None, None),
        ("ex:RS", SH + "rule", "ex:ruleBase", "iri", None, None),
        ("ex:RS", SH + "rule", "ex:ruleStep", "iri", None, None),
        ("ex:ruleBase", T, SH + "TripleRule", "iri", None, None),
        ("ex:ruleBase", SH + "subject", SH + "this", "iri", None, None),
        ("ex:ruleBase", SH + "predicate", "ex:chain", "iri", None, None),
        ("ex:ruleBase", SH + "object", "ex:rtExpr", "iri", None, None),
        ("ex:rtExpr", SH + "path", "ex:reportsTo", "iri", None, None),
        ("ex:ruleStep", T, SH + "SPARQLRule", "iri", None, None),
        (
            "ex:ruleStep",
            SH + "construct",
            "CONSTRUCT { $this <ex:chain> ?b } "
            "WHERE { $this <ex:chain> ?m . ?m <ex:chain> ?b }",
            "literal",
            STR,
            None,
        ),
    ]
    return infer_new(spark.read.parquet(FIXTURE), shapes).select(
        "subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"
    )


_shacl_rules_closure.__name__ = "shacl_rules_closure"
SHACL_QUERIES["shacl_rules_closure"] = _shacl_rules_closure
SHACL_ORACLES["shacl_rules_closure"] = f"""WITH RECURSIVE t AS ({_TSRC}),
sub AS (SELECT 'ex:Person' AS c
        UNION
        SELECT t.subj FROM t, sub WHERE t.pred = '{SCO}' AND t.obj = sub.c),
person AS (SELECT DISTINCT subj FROM t
           WHERE pred = '{T}' AND obj IN (SELECT c FROM sub)),
base AS (SELECT t.subj AS a, t.obj AS b FROM t
         WHERE t.pred = 'ex:reportsTo' AND t.obj_kind = 'iri'
           AND t.subj IN (SELECT subj FROM person)),
clo AS (SELECT a, b FROM base
        UNION
        SELECT clo.a, base.b FROM clo JOIN base ON base.a = clo.b)
SELECT a AS subj, 'ex:chain' AS pred, b AS obj, 'iri' AS obj_kind,
       CAST(NULL AS VARCHAR) AS obj_dt, CAST(NULL AS VARCHAR) AS obj_lang
FROM clo"""


# --- r05: SPARQL DESCRIBE + GROUP_CONCAT (sparql.py) --------------------------


def _sparql_describe_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE over the fixture graph: the engine-defined description
    is the described resources' full subject slice (CBD equivalent
    under skolemized bnodes) — WHERE solutions + a constant target,
    one semi-join, no collect."""
    from shacl_spark.shacl.sparql import sparql_query

    return sparql_query(
        spark.read.parquet(FIXTURE),
        "PREFIX ex: <ex:> DESCRIBE ?p ex:org0 WHERE { ?p a ex:Employee }",
    )


_sparql_describe_engine.__name__ = "sparql_describe_engine"
SHACL_QUERIES["sparql_describe_engine"] = _sparql_describe_engine
SHACL_ORACLES["sparql_describe_engine"] = f"""WITH t AS ({_TSRC}),
d AS (SELECT DISTINCT subj FROM t
      WHERE pred = '{T}' AND obj = 'ex:Employee' AND obj_kind = 'iri'
      UNION
      SELECT 'ex:org0')
SELECT t.subj, t.pred, t.obj, t.obj_kind, t.obj_dt, t.obj_lang
FROM t JOIN d ON d.subj = t.subj"""


def _sparql_group_concat_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP_CONCAT with explicit separator over the fixture: employee
    names per department, in the engine-DEFINED sorted lexical order
    (collect order is plan-dependent; the sort makes the aggregate
    deterministic and oracle-checkable)."""
    from shacl_spark.shacl.sparql import sparql_select

    return sparql_select(
        spark.read.parquet(FIXTURE),
        'PREFIX ex: <ex:> SELECT ?d (GROUP_CONCAT(?n; SEPARATOR=", ") AS ?names)'
        " WHERE { ?p ex:dept ?d . ?p ex:name ?n } GROUP BY ?d",
    ).select("d", "names")


_sparql_group_concat_engine.__name__ = "sparql_group_concat_engine"
SHACL_QUERIES["sparql_group_concat_engine"] = _sparql_group_concat_engine
SHACL_ORACLES["sparql_group_concat_engine"] = f"""WITH t AS ({_TSRC}),
dn AS (SELECT d.obj AS d, n.obj AS n
       FROM t d JOIN t n ON n.subj = d.subj AND n.pred = 'ex:name'
       WHERE d.pred = 'ex:dept')
SELECT d, string_agg(n, ', ' ORDER BY n) AS names FROM dn GROUP BY d"""


# --- r05: SPARQL subqueries (sparql.py _subselect) ----------------------------


def _sparql_subquery_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical subquery shape over the fixture: a grouped
    aggregate ({ SELECT ?p (COUNT ?k) GROUP BY ?p }) joined back to the
    outer name solutions on the shared variable — evaluated bottom-up
    on its own unit frame, merged with SPARQL join compatibility."""
    from shacl_spark.shacl.sparql import sparql_select

    return sparql_select(
        spark.read.parquet(FIXTURE),
        "PREFIX ex: <ex:> SELECT ?p ?n ?cnt WHERE { ?p ex:name ?n . "
        "{ SELECT ?p (COUNT(?k) AS ?cnt) WHERE { ?p ex:knows ?k } "
        "GROUP BY ?p } }",
    ).select("p", "n", "cnt")


_sparql_subquery_engine.__name__ = "sparql_subquery_engine"
SHACL_QUERIES["sparql_subquery_engine"] = _sparql_subquery_engine
SHACL_ORACLES["sparql_subquery_engine"] = f"""WITH t AS ({_TSRC}),
deg AS (SELECT subj AS p, CAST(COUNT(obj) AS VARCHAR) AS cnt
        FROM t WHERE pred = 'ex:knows' GROUP BY subj)
SELECT n.subj AS p, n.obj AS n, deg.cnt
FROM t n JOIN deg ON deg.p = n.subj
WHERE n.pred = 'ex:name'"""
