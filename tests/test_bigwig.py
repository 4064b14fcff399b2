"""BigWig value/zoom scans — parity with exon-bigwig
(tests/sqllogictests/slt/bigwig-tests.slt)."""

import numpy as np
import pytest


BW = ("bigwig", "test.bw")


def _rows(df):
    t = df.collect_arrow()
    return list(zip(*[t.column(i).to_pylist() for i in range(t.num_columns)]))


def test_bigwig_value_scan(session, ref_data):
    path = ref_data(*BW)
    session.sql(
        f"CREATE EXTERNAL TABLE bw STORED AS BIGWIG_VALUE LOCATION '{path}'")
    rows = _rows(session.sql("SELECT * FROM bw"))
    assert [(r[0], r[1], r[2]) for r in rows] == [
        ("1", 0, 1), ("1", 1, 2), ("1", 2, 3), ("1", 100, 150),
        ("1", 150, 151), ("10", 200, 300)]
    np.testing.assert_allclose([r[3] for r in rows],
                               [0.1, 0.2, 0.3, 1.4, 1.5, 2.0], rtol=1e-6)


def test_bigwig_value_region_filter(session, ref_data):
    path = ref_data(*BW)
    session.sql(
        f"CREATE EXTERNAL TABLE bw STORED AS BIGWIG_VALUE LOCATION '{path}'")
    rows = _rows(session.sql(
        "SELECT * FROM bw WHERE bigwig_region_filter('10', name) = true"))
    assert len(rows) == 1
    assert rows[0][:3] == ("10", 200, 300)


def test_bigwig_zoom_scan(session, ref_data):
    path = ref_data(*BW)
    session.sql("CREATE EXTERNAL TABLE bwz STORED AS BIGWIG_ZOOM "
                f"OPTIONS (reduction_level '400') LOCATION '{path}'")
    rows = _rows(session.sql(
        'SELECT name, start, "end", total_items, bases_covered, max_value, '
        'min_value, sum_squares, "sum" FROM bwz'))
    assert len(rows) == 2
    assert rows[0][:5] == ("1", 0, 400, 0, 54)
    np.testing.assert_allclose(rows[0][5:], [1.5, 0.10000000149011612,
                                             100.3899917602539,
                                             72.0999984741211])
    assert rows[1][:5] == ("10", 200, 600, 0, 100)
    np.testing.assert_allclose(rows[1][5:], [2.0, 2.0, 400.0, 200.0])


def test_bigwig_zoom_region_filter(session, ref_data):
    path = ref_data(*BW)
    session.sql("CREATE EXTERNAL TABLE bwz STORED AS BIGWIG_ZOOM "
                f"OPTIONS (reduction_level '400') LOCATION '{path}'")
    rows = _rows(session.sql(
        "SELECT name FROM bwz WHERE bigwig_region_filter('1', name) = true"))
    assert [r[0] for r in rows] == ["1"]


def test_bigwig_zoom_missing_level_errors(session, ref_data):
    path = ref_data(*BW)
    session.sql("CREATE EXTERNAL TABLE bwz STORED AS BIGWIG_ZOOM "
                f"OPTIONS (reduction_level '123') LOCATION '{path}'")
    with pytest.raises(Exception, match="reduction level"):
        session.sql("SELECT * FROM bwz").collect_arrow()


def test_read_bigwig_api(session, ref_data):
    path = ref_data(*BW)
    assert session.read_bigwig_view(path).count() == 6
    assert session.read_bigwig_zoom(path, reduction_level=400).count() == 2
