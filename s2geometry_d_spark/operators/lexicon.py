"""Distributed lexicons — ValueLexicon / SequenceLexicon / IdSetLexicon.

Reference: value_lexicon.d:20-70, sequence_lexicon.d:21-90,
id_set_lexicon.d:32-120.  A lexicon dictionary-encodes duplicated
values (scalars, sequences, or id SETS) to small dense integer ids so
downstream structures store the id instead of the payload — the
reference's shape index uses IdSetLexicon to share the per-cell
shape-id sets that thousands of cells have in common.  (The reference's
storage trick of encoding singleton sets as the element itself,
id_set_lexicon.d:44-57, is a C-array detail, not reproduced: ids here
are uniformly dense ranks.)

Spark-first shape: the FACT table is never globally sorted or
collected.  `distinct()` over the encoded column produces the lexicon
dimension — small by definition (a lexicon whose distinct set doesn't
fit one node isn't a lexicon, it's the fact table) — which gets dense
ids from a single-partition `row_number` over a deterministic ordering
and is then BROADCAST back onto the fact rows.  One shuffle for the
distinct, one for the id-set groupBy normalization; the join adds none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def value_lexicon(
    df: DataFrame, value_col: str, id_col: str = "lex_id"
) -> tuple[DataFrame, DataFrame]:
    """Dictionary-encode a scalar column (value_lexicon.d:20-70 add/value).

    Returns (encoded_df, lexicon_df): the lexicon maps each distinct
    value to a dense id (rank in the value's natural order — a
    deterministic choice where the reference uses insertion order, which
    has no distributed analogue), and encoded_df is ``df`` plus
    ``id_col`` via a broadcast join.  NULL is a distinct lexicon value:
    the join is null-safe, so NULL-valued rows keep their id instead of
    silently vanishing from encoded_df (a plain equi-join never matches
    NULL keys)."""
    if id_col in df.columns:
        raise ValueError(
            f"value_lexicon: input already has a column named {id_col!r}"
        )
    # collision-proof temp name for the broadcast join key (a pre-existing
    # '_lex_val' column would silently duplicate through the rename/drop)
    tmp = "_lex_val"
    while tmp in df.columns:
        tmp += "_"
    lex = (
        df.select(value_col)
        .distinct()
        .withColumn(
            id_col,
            (F.row_number().over(Window.orderBy(value_col)) - 1).cast("int"),
        )
    )
    lx = lex.withColumnRenamed(value_col, tmp)
    encoded = df.join(
        F.broadcast(lx), F.col(value_col).eqNullSafe(F.col(tmp))
    ).drop(tmp)
    return encoded, lex


def sequence_lexicon(
    df: DataFrame, seq_col: str, id_col: str = "lex_id"
) -> tuple[DataFrame, DataFrame]:
    """Dictionary-encode a sequence (array) column
    (sequence_lexicon.d:21-90): equal sequences — same elements, same
    ORDER — share one dense id.  Array columns are orderable in Spark,
    so the mechanics are value_lexicon's."""
    return value_lexicon(df, seq_col, id_col)


def id_set_lexicon(
    pairs: DataFrame,
    group_col: str,
    value_col: str,
    set_col: str = "id_set",
    id_col: str = "set_id",
) -> tuple[DataFrame, DataFrame]:
    """Dictionary-encode per-group value SETS (id_set_lexicon.d:32-120):
    normalize (dedup + sort, the reference's SimplifySet) then encode.

    ``pairs`` is a (group, value) membership table; returns
    (encoded_df, lexicon_df) where encoded_df has one row per group with
    the normalized ``set_col`` array and its dense ``id_col``, and
    lexicon_df maps each distinct set to its id.  Groups sharing the
    same member set share the same id — the reference's use case
    (shape-index cells sharing shape-id sets) verbatim."""
    sets = pairs.groupBy(group_col).agg(
        F.sort_array(F.collect_set(value_col)).alias(set_col)
    )
    # materialize the normalized per-group sets ONCE: sequence_lexicon
    # consumes ``sets`` twice (the distinct/rank branch AND the encoded
    # broadcast-join branch), and without a checkpoint each branch
    # re-evaluates the whole upstream pairs lineage — for the PIP-membership
    # use case that is a second full covering-join pass.  On a cluster this
    # intermediate is exactly what would land in a table between stages.
    sets = sets.localCheckpoint(eager=True)
    return sequence_lexicon(sets, set_col, id_col)
