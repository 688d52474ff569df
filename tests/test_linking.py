"""Entity linking / canonicalization tests (SURVEY.md §7 Stage 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shacl_spark.kg.canon import build_component_map, canonicalize, rewrite_triples
from shacl_spark.kg.cc import connected_components
from shacl_spark.kg.link import jaccard, link_to_dictionary, score_pairs
from shacl_spark.kg.minhash import candidate_pairs
from shacl_spark.functions.terms import triples_from_rows


def test_jaccard_basics():
    assert jaccard("HttpClient", "HTTPClient") == 1.0  # same normalized form
    assert jaccard("HttpClient", "http_client") == 1.0
    assert jaccard("HttpClient", "Widget7") < 0.2


def test_candidate_pairs_find_near_dups(spark):
    names = spark.createDataFrame(
        [("e1", "HttpClient"), ("e2", "HTTPClient"), ("e3", "http_client"),
         ("e4", "Widget7"), ("e5", "CompletelyDifferent")],
        ["id", "name"],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in candidate_pairs(names).collect()}
    assert ("e1", "e2") in pairs
    assert ("e1", "e3") in pairs
    assert ("e4", "e5") not in pairs


def test_connected_components_two_clusters(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["src", "dst"]
    )
    comps = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comps["a"] == comps["b"] == comps["c"] == "a"
    assert comps["x"] == comps["y"] == "x"


def test_canonicalize_rewrites_near_dup_entities(spark):
    rows = [
        ("kg:f1#HttpClient", "kg:name", "HttpClient", "literal"),
        ("kg:f2#HTTPClient", "kg:name", "HTTPClient", "literal"),
        ("kg:f1", "kg:defines", "kg:f1#HttpClient"),
        ("kg:f2", "kg:defines", "kg:f2#HTTPClient"),
        ("kg:f3#Widget", "kg:name", "Widget", "literal"),
    ]
    t = triples_from_rows(spark, rows)
    cmap = {r["id"]: r["canonical"] for r in build_component_map(t, threshold=0.75).collect()}
    # the two near-dup symbols collapse to the min IRI
    assert cmap == {"kg:f2#HTTPClient": "kg:f1#HttpClient"}
    out = canonicalize(t, threshold=0.75)
    defines = {
        r["obj"] for r in out.where(F.col("pred") == "kg:defines").collect()
    }
    assert defines == {"kg:f1#HttpClient"}
    # literals must never be rewritten
    names = {r["obj"] for r in out.where(F.col("pred") == "kg:name").collect()}
    assert "HTTPClient" in names


def test_link_to_dictionary(spark):
    mentions = spark.createDataFrame(
        [("m1", "http_client"), ("m2", "JSONparser"), ("m3", "zzz")], ["id", "name"]
    )
    dictionary = spark.createDataFrame(
        [("kg:canon/HttpClient", "HttpClient"), ("kg:canon/JsonParser", "JsonParser")],
        ["iri", "name"],
    )
    links = {r["id"]: r["canonical_iri"] for r in
             link_to_dictionary(mentions, dictionary, threshold=0.5).collect()}
    assert links["m1"] == "kg:canon/HttpClient"
    assert links["m2"] == "kg:canon/JsonParser"
    assert "m3" not in links


def test_shingles_full_length_not_truncated(spark):
    """r04 regression: Spark rpad TRUNCATES past-k strings, so the old
    unconditional pad collapsed every name to its first trigram —
    which silently degraded LSH to first-3-chars blocking and, past
    max_bucket distinct names, capped every bucket (empty candidate
    graph).  A k-shingle set of an n-char name must have up to n-k+1
    members, and short names still pad to one shingle."""
    from shacl_spark.kg.minhash import normalized, shingles
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("widgetaaamaker",), ("ab",), ("xyz",)], ["name"]
    ).select(shingles(normalized(F.col("name"))).alias("sh"))
    got = {tuple(r["sh"]) for r in df.collect()}
    full = tuple(
        "widgetaaamaker"[i : i + 3] for i in range(len("widgetaaamaker") - 2)
    )
    assert tuple(dict.fromkeys(full)) in got          # all 12 shingles
    assert ("ab_",) in got and ("xyz",) in got        # short-name pad


def test_candidate_pairs_beyond_bucket_cap(spark):
    """With >max_bucket distinct names, near-dup pairs must STILL
    surface (the truncation bug made every band bucket identical and
    the cap dropped them all)."""
    from shacl_spark.kg.minhash import candidate_pairs

    rows = [(f"id:{i:03d}", f"common{i}suffix") for i in range(100)]
    rows += [("id:dupA", "WidgetFooMaker"), ("id:dupB", "widget_foo_maker")]
    names = spark.createDataFrame(rows, ["id", "name"])
    pairs = candidate_pairs(names, max_bucket=64)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("id:dupA", "id:dupB") in got


def test_bucket_cap_drop_is_observable(spark):
    """VERDICT r04 #4: a hub surface form whose bucket exceeds
    max_bucket must be REPORTED via the stats dict, never silently
    dropped (the r03 empty-match-graph incident class)."""
    from shacl_spark.kg.minhash import candidate_pairs

    # one hub name repeated 40x (same shingles -> same bucket in every
    # band) + two genuine near-dups that must survive the cap
    rows = [(f"id:hub{i:02d}", "TheHubName") for i in range(40)]
    rows += [("id:a", "WidgetFooMaker"), ("id:b", "widget_foo_maker")]
    names = spark.createDataFrame(rows, ["id", "name"])
    stats: dict = {}
    pairs = candidate_pairs(names, max_bucket=8, stats=stats)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("id:a", "id:b") in got
    assert not any("hub" in a for a, _ in got)      # capped out
    assert stats["lsh_dropped_rows"] >= 40           # 40 ids x >=1 band
    assert stats["lsh_dropped_buckets"] >= 1
    assert stats["lsh_max_bucket_seen"] == 40
    # and a no-drop run reports zeros (counter present either way)
    stats2: dict = {}
    candidate_pairs(
        spark.createDataFrame(rows[-2:], ["id", "name"]), max_bucket=8,
        stats=stats2,
    ).collect()
    assert stats2["lsh_dropped_rows"] == 0
    assert stats2["lsh_dropped_buckets"] == 0


def test_minhash_lsh_pairs_drop_observable(spark):
    """Same counter contract for the document-level LSH operator."""
    from shacl_spark.operators.dedup import minhash_lsh_pairs

    hub_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(f"d{i:02d}", hub_text) for i in range(30)]
    rows += [
        ("da", "one two three four five six seven eight nine ten"),
        ("db", "one two three four five six seven eight nine ten!"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    stats: dict = {}
    pairs = minhash_lsh_pairs(df, "id", "text", max_bucket=8, stats=stats)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("da", "db") in got
    assert stats["lsh_dropped_rows"] >= 30
    assert stats["lsh_max_bucket_seen"] == 30


def test_rewrite_deterministic_across_join_strategies(spark):
    """broadcast_map=True and False must produce byte-identical output,
    including the surviving provenance row: the A12 dedup keeps the
    lexicographically smallest (src_repo, src_path, src_commit,
    part_id) per triple, not whichever copy the physical plan saw
    first (r05: dropDuplicates made the output plan-dependent)."""
    base = triples_from_rows(
        spark,
        [
            ("kg:f1#HttpClient", "kg:name", "HttpClient", "literal"),
            ("kg:f2#HTTPClient", "kg:name", "HTTPClient", "literal"),
            ("kg:f1", "kg:defines", "kg:f1#HttpClient"),
            ("kg:f2", "kg:defines", "kg:f2#HTTPClient"),
        ],
    )
    # the same identity rows under two provenances; 'aaa' must win
    dup = (
        base.withColumn("src_repo", F.lit("zzz"))
        .unionByName(base.withColumn("src_repo", F.lit("aaa")))
        .withColumn("src_path", F.lit("p"))
        .withColumn("src_commit", F.lit("c"))
        .withColumn("part_id", F.lit(0))
    )
    key = sorted(dup.columns)
    a = sorted(
        canonicalize(dup, broadcast_map=True).collect(),
        key=lambda r: tuple(str(r[c]) for c in key),
    )
    b = sorted(
        canonicalize(dup, broadcast_map=False).collect(),
        key=lambda r: tuple(str(r[c]) for c in key),
    )
    assert a == b
    assert {r["src_repo"] for r in a} == {"aaa"}
