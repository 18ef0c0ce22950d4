"""Distributed lexicons (value_lexicon.d / sequence_lexicon.d /
id_set_lexicon.d): dictionary-encoding duplicated values, sequences and
id sets to dense ids."""

from s2geometry_d_spark.operators import lexicon


def test_value_lexicon_dense_and_shared(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(["b", "a", "b", "c", "a", "b"])],
        "row_id int, v string",
    )
    enc, lex = lexicon.value_lexicon(df, "v")
    ids = {r.v: r.lex_id for r in lex.collect()}
    assert ids == {"a": 0, "b": 1, "c": 2}  # dense ranks in value order
    rows = {r.row_id: r.lex_id for r in enc.collect()}
    assert rows == {0: 1, 1: 0, 2: 1, 3: 2, 4: 0, 5: 1}


def test_sequence_lexicon_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, ["a", "b"]), (1, ["b", "a"]), (2, ["a", "b"]), (3, ["a"])],
        "row_id int, seq array<string>",
    )
    enc, lex = lexicon.sequence_lexicon(df, "seq")
    assert lex.count() == 3  # [a,b] != [b,a]; duplicates collapse
    rows = {r.row_id: r.lex_id for r in enc.collect()}
    assert rows[0] == rows[2] != rows[1]
    # dense ids 0..n-1
    assert sorted(r.lex_id for r in lex.collect()) == [0, 1, 2]


def test_id_set_lexicon_normalizes_and_shares(spark):
    pairs = spark.createDataFrame(
        [
            (0, "x"), (0, "y"), (0, "x"),   # {x,y} with a duplicate pair
            (1, "y"), (1, "x"),             # same set, other insertion order
            (2, "x"),                       # singleton
            (3, "z"), (3, "x"),
        ],
        "g int, v string",
    )
    enc, lex = lexicon.id_set_lexicon(pairs, "g", "v")
    assert lex.count() == 3
    rows = {r.g: (list(r.id_set), r.set_id) for r in enc.collect()}
    assert rows[0][0] == ["x", "y"] == rows[1][0]  # SimplifySet: dedup+sort
    assert rows[0][1] == rows[1][1]
    assert len({rows[0][1], rows[2][1], rows[3][1]}) == 3
    # encoded table keeps exactly one row per group
    assert enc.count() == 4


def test_lexicon_roundtrip_decode(spark):
    pairs = spark.createDataFrame(
        [(i, f"v{i % 3}") for i in range(30)] + [(7, "v0"), (8, "v1")],
        "g int, v string",
    )
    enc, lex = lexicon.id_set_lexicon(pairs, "g", "v")
    # decode: joining encoded ids back to the lexicon recovers the sets
    dec = enc.select("g", "set_id").join(lex, "set_id").collect()
    by_g = {r.g: list(r.id_set) for r in dec}
    want = {}
    for r in pairs.collect():
        want.setdefault(r.g, set()).add(r.v)
    assert by_g == {g: sorted(s) for g, s in want.items()}
