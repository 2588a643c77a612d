"""Z-order clustering: Morton math and the actual file-layout effect."""

import glob

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.sinks.zorder import (
    morton_interleave,
    zorder_by,
    zorder_value,
)


def test_morton_interleave_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "x long, y long"
    )
    out = [
        r["z"]
        for r in df.select(
            morton_interleave(F.col("x"), F.col("y")).alias("z")
        ).collect()
    ]
    # interleave(x even bits, y odd bits): (1,0)->1, (0,1)->2,
    # (3,5)=(0b011,0b101)-> x bits at 0,2 + y bits at 1,5 = 0b100111=39
    assert out == [0, 1, 2, 39, (1 << 32) - 1]


def test_zorder_by_tightens_both_spans(spark, tmp_path):
    """Writing Z-ordered files bounds BOTH keys per file; a plain sort
    on x leaves y's span at full width in every file."""
    rows = [(i % 97, (i * 37) % 89, i) for i in range(5000)]
    df = spark.createDataFrame(rows, "x int, y int, v int")

    zpath = str(tmp_path / "z")
    zorder_by(df, ["x", "y"], n_files=16).write.parquet(zpath)
    lpath = str(tmp_path / "l")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lpath)

    def avg_spans(path):
        got = spark.read.parquet(path).select(
            "x", "y", F.col("_metadata.file_path").alias("f")
        )
        spans = got.groupBy("f").agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        ).agg(F.avg("sx").alias("ax"), F.avg("sy").alias("ay")).collect()[0]
        return spans["ax"], spans["ay"]

    zx, zy = avg_spans(zpath)
    lx, ly = avg_spans(lpath)
    assert len(glob.glob(zpath + "/*.parquet")) >= 8
    # linear: x tight but y full-width; zorder: y span far below
    # full width, x still bounded (the hyper-rectangle trade)
    assert ly > 80          # full-width y under the x-only sort
    assert zy < ly * 0.6    # z-order cuts the y span
    assert zx < 97          # and x stays bounded too
