"""Data-layout operators (operators/layout.py) — the spread-k sampled
read (r11; Z-order itself is covered in test_operators.py)."""

from __future__ import annotations


def test_sample_rows_spread(spark, tmp_path):
    """Spread-k sampling (MergeTree SAMPLE analogue): exactly k rows,
    drawn from multiple files (file-pruned — not first-k, not a
    full-table scan), deterministic for a fixed seed, loud on empty."""
    import pytest

    from chdb_spark.operators.layout import sample_rows_spread

    p = str(tmp_path / "lake")
    spark.range(4000).selectExpr("id", "id * 2 AS v").repartitionByRange(
        8, "id"
    ).write.parquet(p)
    # margin 4 x k=400 -> target 1600 rows -> at least 4 of the 8
    # 500-row range files must be drawn from
    out = sample_rows_spread(spark, p, k=400, seed=7)
    rows = out.collect()
    assert len(rows) == 400
    # deterministic
    assert {r.id for r in rows} == {
        r.id for r in sample_rows_spread(spark, p, k=400, seed=7).collect()
    }
    # different seed → different draw (overwhelmingly)
    assert {r.id for r in rows} != {
        r.id for r in sample_rows_spread(spark, p, k=400, seed=8).collect()
    }
    # spread: ids span beyond any single 500-row range file
    ids = sorted(r.id for r in rows)
    assert ids[-1] - ids[0] > 1000
    with pytest.raises(ValueError, match="positive"):
        sample_rows_spread(spark, p, k=0)
    with pytest.raises(FileNotFoundError):
        sample_rows_spread(spark, str(tmp_path / "nope"), k=5)
