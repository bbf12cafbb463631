"""As-of join vs a pandas merge_asof oracle plus hand-built goldens
for the cases merge_asof can't express (null timestamps, typed
tie-break columns).

Tie-break contract: among right rows sharing (key, ts), max
``right_order`` wins backward and min wins forward — matched in the
oracle by stably pre-sorting the right frame on (ts, order), because
merge_asof picks the *last* equal-ts right row backward and the
*first* forward.
"""

import datetime as dt

import pandas as pd
import pytest

from kafkadirect_spark.operators.asof import asof_join


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, int(s))


LEFT = [("a", 5, 1), ("a", 10, 2), ("a", 20, 3),
        ("b", 7, 4), ("b", 30, 5), ("c", 9, 6)]
RIGHT = [("a", 5, 100.0), ("a", 10, 200.0), ("a", 15, 300.0),
         ("b", 6, 400.0), ("b", 30, 500.0), ("d", 1, 600.0)]


def _frames(spark):
    l = spark.createDataFrame(
        [(k, _t(s), i) for k, s, i in LEFT], "key string, lts timestamp, lid int")
    r = spark.createDataFrame(
        [(k, _t(s), v) for k, s, v in RIGHT], "key string, rts timestamp, price double")
    return l, r


def _oracle(direction, strict, tolerance_s=None):
    lpd = pd.DataFrame(
        [(k, _t(s), i) for k, s, i in LEFT], columns=["key", "lts", "lid"]
    ).sort_values("lts", kind="stable")
    rpd = pd.DataFrame(
        [(k, _t(s), v) for k, s, v in RIGHT], columns=["key", "rts", "price"]
    ).sort_values("rts", kind="stable")
    out = pd.merge_asof(
        lpd, rpd, left_on="lts", right_on="rts", by="key",
        direction=direction, allow_exact_matches=not strict,
        tolerance=None if tolerance_s is None else pd.Timedelta(seconds=tolerance_s))
    return {(row.key, row.lid, None if pd.isna(row.price) else row.price)
            for row in out.itertuples()}


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("tolerance_s", [None, 4])
def test_matches_pandas_merge_asof(spark, direction, strict, tolerance_s):
    l, r = _frames(spark)
    got = {(row.key, row.lid, row.price) for row in asof_join(
        l, r, "key", "key", "lts", "rts",
        direction=direction, strict=strict, tolerance_s=tolerance_s).collect()}
    assert got == _oracle(direction, strict, tolerance_s)


@pytest.mark.parametrize("direction,want", [
    ("backward", 3), ("forward", 1)])
def test_tiebreak_max_backward_min_forward(spark, direction, want):
    l = spark.createDataFrame([("a", _t(10), 1)], "key string, lts timestamp, lid int")
    r = spark.createDataFrame(
        [("a", _t(10), 1), ("a", _t(10), 2), ("a", _t(10), 3)],
        "key string, rts timestamp, seq int")
    [row] = asof_join(l, r, "key", "key", "lts", "rts",
                      direction=direction, right_order="seq").collect()
    assert row.seq == want


def test_tiebreak_numeric_with_string_typed_left(spark):
    # A string right_order must not silently coerce the left's int 0:
    # the left __ord is a typed null, so '9' vs '10' ordering is the
    # declared (lexicographic for strings) semantics of the column.
    l = spark.createDataFrame([("a", _t(10), 1)], "key string, lts timestamp, lid int")
    r = spark.createDataFrame(
        [("a", _t(10), "x", 1.0), ("a", _t(10), "y", 2.0)],
        "key string, rts timestamp, tag string, price double")
    [row] = asof_join(l, r, "key", "key", "lts", "rts",
                      value_cols=["price"], right_order="tag").collect()
    assert row.price == 2.0  # max 'y' wins backward


def test_null_right_ts_never_matches(spark):
    l = spark.createDataFrame([("a", _t(10), 1)], "key string, lts timestamp, lid int")
    r = spark.createDataFrame(
        [("a", None, 999.0), ("a", _t(5), 100.0)],
        "key string, rts timestamp, price double")
    [row] = asof_join(l, r, "key", "key", "lts", "rts").collect()
    assert row.price == 100.0
    # With only a null-ts candidate the left row comes out unmatched.
    r2 = spark.createDataFrame([("a", None, 999.0)],
                               "key string, rts timestamp, price double")
    [row2] = asof_join(l, r2, "key", "key", "lts", "rts").collect()
    assert row2.price is None


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_null_left_ts_unmatched(spark, direction):
    l = spark.createDataFrame(
        [("a", None, 1), ("a", _t(10), 2)], "key string, lts timestamp, lid int")
    r = spark.createDataFrame(
        [("a", _t(1), 100.0), ("a", _t(20), 300.0)],
        "key string, rts timestamp, price double")
    got = {(row.lid, row.price) for row in asof_join(
        l, r, "key", "key", "lts", "rts", direction=direction).collect()}
    want = {(1, None), (2, 100.0 if direction == "backward" else 300.0)}
    assert got == want


def test_value_cols_empty_list_selects_nothing(spark):
    l, r = _frames(spark)
    out = asof_join(l, r, "key", "key", "lts", "rts", value_cols=[])
    assert out.columns == l.columns
    assert out.count() == len(LEFT)


def test_left_rows_always_preserved(spark):
    l, r = _frames(spark)
    out = asof_join(l, r, "key", "key", "lts", "rts")
    assert out.count() == len(LEFT)
    assert set(out.columns) == {"key", "lts", "lid", "price"}


def test_multi_key_asof(spark):
    """Composite join keys: the match respects BOTH key columns."""
    l = spark.createDataFrame(
        [("a", 1, _t(10), 1), ("a", 2, _t(10), 2)],
        "k1 string, k2 int, lts timestamp, lid int")
    r = spark.createDataFrame(
        [("a", 1, _t(5), 100.0), ("a", 2, _t(7), 200.0), ("a", 1, _t(9), 150.0)],
        "k1 string, k2 int, rts timestamp, price double")
    got = {(row.lid, row.price) for row in asof_join(
        l, r, ["k1", "k2"], ["k1", "k2"], "lts", "rts").collect()}
    assert got == {(1, 150.0), (2, 200.0)}


def test_asof_property_random_vs_pandas(spark):
    """Property check: random keyed series vs pandas merge_asof across
    both directions (seeded exhaustively rather than via hypothesis —
    each case costs a Spark job, so we batch all cases into ONE join
    by making the key carry the case id)."""
    import random
    rnd = random.Random(11)
    lrows, rrows = [], []
    for case in range(40):
        key = f"c{case}"
        for i in range(rnd.randint(1, 6)):
            lrows.append((key, _t(rnd.randint(0, 50)), case * 100 + i))
        for j in range(rnd.randint(0, 6)):
            rrows.append((key, _t(rnd.randint(0, 50)), float(case * 100 + j)))
    # dedupe right (key, ts) so the expected match is deterministic
    seen = {}
    for k, ts, v in rrows:
        seen[(k, ts)] = max(v, seen.get((k, ts), v))
    rrows = [(k, ts, v) for (k, ts), v in seen.items()]

    l = spark.createDataFrame(lrows, "key string, lts timestamp, lid int")
    r = spark.createDataFrame(rrows, "key string, rts timestamp, price double")
    for direction in ("backward", "forward"):
        got = {(row.key, row.lid, row.price) for row in asof_join(
            l, r, "key", "key", "lts", "rts", direction=direction).collect()}
        lpd = pd.DataFrame(lrows, columns=["key", "lts", "lid"]).sort_values(
            "lts", kind="stable")
        rpd = pd.DataFrame(rrows, columns=["key", "rts", "price"]).sort_values(
            "rts", kind="stable")
        exp = pd.merge_asof(lpd, rpd, left_on="lts", right_on="rts",
                            by="key", direction=direction)
        want = {(row.key, row.lid,
                 None if pd.isna(row.price) else row.price)
                for row in exp.itertuples()}
        assert got == want, direction
