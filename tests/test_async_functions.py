"""Sequence nextval + dict_get lookups."""

from pyspark.sql import functions as F

from databend_spark.operators.async_functions import (
    Sequence,
    dict_get,
    with_sequence_column,
)


def test_sequence_nextval(tmp_path):
    s = Sequence(str(tmp_path / "seq.json"), start=100)
    assert s.nextval() == 100
    assert s.nextval(10) == 101
    assert s.nextval() == 111
    # re-attach: persists
    s2 = Sequence(str(tmp_path / "seq.json"))
    assert s2.nextval() == 112


def test_with_sequence_column(spark, tmp_path):
    seq = Sequence(str(tmp_path / "s.json"), start=1000)
    df = spark.range(500).repartition(7)
    out = with_sequence_column(df, seq, "sid")
    ids = [r.sid for r in out.collect()]
    assert len(ids) == 500
    assert sorted(ids) == list(range(1000, 1500))  # dense, unique, exact range
    assert seq.current == 1500
    # second bulk assignment continues from the reserved point
    out2 = with_sequence_column(spark.range(10), seq, "sid")
    assert sorted(r.sid for r in out2.collect()) == list(range(1500, 1510))


def test_dict_get(spark):
    facts = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "c")], "k int, payload string"
    )
    dictionary = spark.createDataFrame(
        [(1, "one"), (2, "two")], "id int, name string"
    )
    out = dict_get(
        facts, dictionary, "k", "id", "name", default=F.lit("?"), out_col="kname"
    )
    got = {(r.k, r.kname) for r in out.collect()}
    assert got == {(1, "one"), (2, "two"), (9, "?")}
