

def test_histogram_equidepth_exact(spark):
    from data_lakehouse_project_spark.operators.profile import (
        histogram_equidepth,
    )

    # 10 rows into 4 buckets: ntile gives depths 3,3,2,2
    df = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    rows = {r.bin: r for r in histogram_equidepth(df, "x", 4).collect()}
    assert [rows[b].cnt for b in (1, 2, 3, 4)] == [3, 3, 2, 2]
    assert rows[1].lo == 0.0 and rows[4].hi == 9.0
    # buckets are contiguous and ordered
    assert rows[1].hi <= rows[2].lo and rows[3].hi <= rows[4].lo


def test_histogram_equidepth_approx_depths_near_equal(spark):
    from data_lakehouse_project_spark.operators.profile import (
        histogram_equidepth_approx,
    )

    n, bins = 20000, 10
    df = spark.range(n).selectExpr("cast(id * id as double) as x")  # skewed
    rows = histogram_equidepth_approx(df, "x", bins).collect()
    assert sum(r.cnt for r in rows) == n
    for r in rows:
        assert abs(r.cnt - n / bins) <= 0.1 * n / bins, (r.bin, r.cnt)
    # ranges must not overlap
    ordered = sorted(rows, key=lambda r: r.bin)
    for a, b in zip(ordered, ordered[1:]):
        assert a.hi <= b.lo
