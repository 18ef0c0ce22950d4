"""s2text_format parity — fixtures lifted from the reference's own test file
(test/s2/s2text_format_test.d): special-case strings, empty/full sentinels,
lax-polygon semantics, and the ten ToString.S2ShapeIndex round-trip strings.
"""

import math

import pytest

from s2geometry_d_spark.s2core import textformat as tf
from s2geometry_d_spark.s2core.loops import Loop


def test_tostring_special_cases():
    # s2text_format_test.d ToString.SpecialCases
    assert tf.latlng_to_string(0.0, 0.0) == "0:0"
    p = tf._ll_to_xyz(0.0, 0.0)
    assert tf.point_to_string(p) == "0:0"
    p = tf._ll_to_xyz(1e-20, 1e-30)
    assert tf.point_to_string(p) == "1e-20:1e-30"


def test_empty_and_full_loop_strings():
    assert tf.loop_to_string(tf.make_loop("empty")) == "empty"
    assert tf.loop_to_string(tf.make_loop("full")) == "full"
    assert tf.loop_is_empty(tf.make_loop(" empty "))
    assert tf.loop_is_full(tf.make_loop("full"))


def test_make_point_and_latlng():
    assert tf.make_latlng("-12.3:45.6") == (-12.3, 45.6)
    x, y, z = tf.make_point("-20:150")
    lat = math.degrees(math.asin(z))
    lng = math.degrees(math.atan2(y, x))
    assert abs(lat - -20) < 1e-13 and abs(lng - 150) < 1e-13
    with pytest.raises(ValueError):
        tf.make_point("blah")
    with pytest.raises(ValueError):
        tf.make_latlng("1:2, 3:4")  # exactly-one contract


def test_make_latlng_rect_and_roundtrip():
    rect = tf.make_latlng_rect("-10:-10, 10:10")
    assert rect.lo_degrees() == (-10.0, -10.0)
    assert rect.hi_degrees() == (10.0, 10.0)
    assert tf.rect_to_string(rect) == "-10:-10, 10:10"
    with pytest.raises(ValueError):
        tf.make_latlng_rect("blah")
    with pytest.raises(ValueError):
        tf.make_latlng_rect("")


def test_make_polyline_roundtrip():
    s = "-20:150, -20:151, -19:150"
    pl = tf.make_polyline(s)
    assert pl.num_edges() == 2
    assert tf.polyline_to_string(pl) == s


def test_lax_polygon_semantics():
    # s2text_format_test.d MakeLaxPolygon.{Empty,Full,FullWithHole}
    assert tf.make_lax_polygon("") == []
    assert tf.make_lax_polygon("empty") == []
    full = tf.make_lax_polygon("full")
    assert len(full) == 1 and full[0] == []
    fwh = tf.make_lax_polygon("full; 0:0")
    assert len(fwh) == 2 and fwh[0] == [] and len(fwh[1]) == 1


def test_polygon_normalization_inverts_big_loops():
    # CW triangle (interior would be the huge complement) -> normalized
    # polygon inverts it; verbatim keeps the given orientation
    cw = "0:0, 10:10, 0:10"  # clockwise: encloses the huge complement
    from s2geometry_d_spark.s2core.measures import loop_area

    norm = tf.make_polygon(cw)
    verb = tf.make_verbatim_polygon(cw)
    assert loop_area(norm.loops[0].vertices) <= 2 * math.pi
    assert loop_area(verb.loops[0].vertices) > 2 * math.pi
    # normalized loop is the reversal of the verbatim loop
    assert norm.loops[0].vertices == list(reversed(verb.loops[0].vertices))


def test_polygon_empty_full_strings():
    assert tf.polygon_to_string(tf.make_polygon("empty")) == "empty"
    assert tf.polygon_to_string(tf.make_polygon("")) == "empty"
    assert tf.polygon_to_string(tf.make_polygon("full")) == "full"
    two = tf.make_polygon("10:20, 90:0, 20:30; 5.5:6.5, -90:-180, -15.2:20.3")
    assert len(two.loops) == 2


INDEX_FIXTURES = [
    "# #",
    "0:0 # #",
    "0:0 | 1:0 # #",
    "# 0:0, 0:0 #",
    "# 0:0, 0:0 | 1:0, 2:0 #",
    "# # 0:0",
    "# # 0:0, 0:1",
    "# # 0:0, 0:1, 1:0",
    "# # 0:0, 0:1, 1:0; 2:2",
]


@pytest.mark.parametrize("s", INDEX_FIXTURES)
def test_index_roundtrip(s):
    # s2text_format_test.d ToString.S2ShapeIndex: toString(makeIndex(s)) == s
    assert tf.index_to_string(tf.make_index(s)) == s


def test_index_parse_errors():
    with pytest.raises(ValueError):
        tf.make_index("# blah #")
    with pytest.raises(ValueError):
        tf.make_index("0:0 # 1:1")  # needs exactly two '#'


def test_format_parse_kernels_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 12.3456789012345678, -150.5), (2, -89.9999999, 0.0), (3, 0.0, 1e-12)],
        ["id", "lat", "lng"],
    )
    out = df.select(
        "id",
        "lat",
        "lng",
        tf.format_latlng_col(F.col("lat"), F.col("lng")).alias("txt"),
    )
    out = out.withColumn("parsed", tf.parse_latlngs_col(F.col("txt")))
    rows = {r.id: r for r in out.collect()}
    for i, (lat, lng) in [(1, (12.3456789012345678, -150.5)), (2, (-89.9999999, 0.0)), (3, (0.0, 1e-12))]:
        r = rows[i]
        assert r.txt == tf.latlng_to_string(lat, lng)
        assert len(r.parsed) == 1
        # %.15g keeps 15 significant digits; reparse is within 1 part in 1e14
        assert abs(r.parsed[0].lat - lat) <= 1e-14 * max(1.0, abs(lat))
        assert abs(r.parsed[0].lng - lng) <= 1e-14 * max(1.0, abs(lng))
