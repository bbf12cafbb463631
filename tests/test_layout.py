"""Z-order layout clustering: Morton index correctness vs a pure-
Python mirror, quantization clamps, and the actual layout win — the
per-partition bounding boxes a clustered write produces must be small
in EVERY participating dimension, where a single-dimension layout
leaves the other dimension's extent at ~full domain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.functions import layout


def _py_morton(vals: list[int], bits: int) -> int:
    n = len(vals)
    z = 0
    for j, v in enumerate(vals):
        v = min(max(v, 0), (1 << bits) - 1)
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * n + j)
    return z


def test_zorder_matches_python_mirror(spark):
    rows = [(a, b, c) for a in (0, 1, 7, 200, 255, 300, -5)
            for b in (0, 3, 128, 255) for c in (0, 255)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = df.select(
        "a", "b", "c",
        layout.zorder_index(["a", "b", "c"], bits=8).alias("z")).collect()
    for r in got:
        assert r.z == _py_morton([r.a, r.b, r.c], 8), (r.a, r.b, r.c)


def test_zorder_locality_property(spark):
    """Adjacent cells differ little in the index: flipping the lowest
    bit of one dimension flips one index bit (the curve's locality),
    and the index is monotone in each dimension when the others are
    fixed at zero."""
    for v in (0, 1, 5, 100):
        assert _py_morton([v, 0], 8) == sum(
            ((v >> i) & 1) << (2 * i) for i in range(8))
    df = spark.createDataFrame([(i,) for i in range(255)], "x long")
    z = df.select(layout.zorder_index(["x", F.lit(0)], bits=8)
                  .alias("z")).collect()
    zs = [r.z for r in z]
    assert zs == sorted(zs)


def test_quantize_dim_clamps_and_validates(spark):
    df = spark.createDataFrame(
        [(-100,), (0,), (50,), (99,), (100,), (10_000,)], "x long")
    got = [r.q for r in df.select(
        layout.quantize_dim("x", 0, 100, 4).alias("q")).collect()]
    # 16 cells over [0, 100): width 6.25 — edges clamp
    assert got == [0, 0, 8, 15, 15, 15]
    with pytest.raises(ValueError, match="hi must be"):
        layout.quantize_dim("x", 5, 5, 4)
    with pytest.raises(ValueError, match="overflows"):
        layout.quantize_dim("x", 0, 1 << 40, 32)
    with pytest.raises(ValueError, match="bits"):
        layout.zorder_index(["x", "x"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        layout.zorder_index([], bits=8)


def _extents(df, parts):
    """Mean per-partition extent of qx and qy after a re-layout."""
    e = (df.withColumn("__p", F.spark_partition_id())
         .groupBy("__p")
         .agg((F.max("qx") - F.min("qx")).alias("ex"),
              (F.max("qy") - F.min("qy")).alias("ey"))
         .agg(F.avg("ex").alias("ex"), F.avg("ey").alias("ey"))
         .collect()[0])
    return e.ex, e.ey


def test_cluster_by_zorder_bounds_both_dimensions(spark):
    """The point of the layout: after Z-clustering into 16 ranges,
    BOTH dimensions' mean per-partition extent shrinks well below the
    domain, while a one-dimension sort leaves the other dimension at
    ~full extent (so min-max pruning on it would skip nothing)."""
    import itertools

    rows = [(a, b) for a, b in itertools.product(range(64), range(64))]
    df = spark.createDataFrame(rows, "qx long, qy long")

    z = layout.cluster_by_zorder(df, ["qx", "qy"], bits=6, partitions=16)
    ex_z, ey_z = _extents(z, 16)

    one_dim = df.repartitionByRange(16, "qx").sortWithinPartitions("qx")
    ex_1, ey_1 = _extents(one_dim, 16)

    # one-dim layout: qx tight, qy spans ~the whole 0..63 domain
    assert ey_1 > 55
    # z-layout: BOTH extents bounded — each 16th of a 64x64 Morton
    # curve covers a 16x16 region (extent 15) at worst 2x slack for
    # range-boundary sampling
    assert ex_z <= 32 and ey_z <= 32
    # and the clustered frame still holds exactly the same rows
    assert z.count() == 64 * 64


def test_zorder_write_produces_tight_file_stats(spark, tmp_path):
    """The artifact that matters: after a Z-clustered parquet WRITE,
    each file's footer min-max stats (what scan pruning actually
    reads) cover a small range in BOTH dimensions; a one-dimension
    sort leaves qy's per-file range at ~full domain."""
    import glob

    import pyarrow.parquet as pq
    import itertools

    rows = [(a, b) for a, b in itertools.product(range(64), range(64))]
    df = spark.createDataFrame(rows, "qx long, qy long")

    def file_extents(path):
        exts = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins = {"qx": 1 << 62, "qy": 1 << 62}
            maxs = {"qx": -(1 << 62), "qy": -(1 << 62)}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    mins[name] = min(mins[name], st.min)
                    maxs[name] = max(maxs[name], st.max)
            exts.append((maxs["qx"] - mins["qx"], maxs["qy"] - mins["qy"]))
        return exts

    from kafkadirect_spark.functions import layout

    zp = f"{tmp_path}/z"
    layout.cluster_by_zorder(df, ["qx", "qy"], bits=6, partitions=16) \
        .write.mode("overwrite").parquet(zp)
    z_ext = file_extents(zp)
    assert len(z_ext) >= 8
    # every file's bounding box bounded in BOTH dims (16th of a 64x64
    # Morton curve covers a 16x16 tile; 2x slack for range sampling)
    assert all(ex <= 32 and ey <= 32 for ex, ey in z_ext), z_ext

    op = f"{tmp_path}/one"
    df.repartitionByRange(16, "qx").sortWithinPartitions("qx") \
        .write.mode("overwrite").parquet(op)
    one_ext = file_extents(op)
    # the one-dim layout's qy stats span ~the whole domain per file —
    # min-max pruning on qy would skip nothing
    assert all(ey > 55 for _, ey in one_ext), one_ext


def test_quantize_dim_negative_range(spark):
    df = spark.createDataFrame([(-200,), (-100,), (-1,), (0,), (99,)],
                               "x long")
    got = [r.q for r in df.select(
        layout.quantize_dim("x", -100, 100, 4).alias("q")).collect()]
    # [-100, 100) in 16 cells of width 12.5; -200 clamps to cell 0
    assert got == [0, 0, 7, 8, 15]
