"""Feature-layer buffer: closed-form geometry checks for the JVM offset-ring
expression (unit square / capsule fixtures), plus the guard behaviors."""

import math

from gaia_spark.operators.scalar_geo import buffer_features

R, Q = 0.5, 8


def _sq(spark, order="ccw"):
    pts = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    if order == "cw":
        pts = [pts[0]] + pts[1:][::-1]
    arr = ", ".join(f"struct({la}d AS lat, {lo}d AS lon)" for la, lo in pts + pts[:1])
    return spark.sql(f"SELECT array({arr}) AS vertices")


def _shoelace(ring):
    return (
        sum(
            ring[i]["lon"] * ring[i + 1]["lat"] - ring[i + 1]["lon"] * ring[i]["lat"]
            for i in range(len(ring) - 1)
        )
        / 2
    )


def _perim(ring):
    return sum(
        math.hypot(
            ring[i + 1]["lon"] - ring[i]["lon"], ring[i + 1]["lat"] - ring[i]["lat"]
        )
        for i in range(len(ring) - 1)
    )


def test_square_buffer_closed_forms(spark):
    ring = buffer_features(_sq(spark), R, Q).collect()[0]["buffered"]
    assert len(ring) == 4 * (Q + 1) + 1 and ring[0] == ring[-1]
    area = 1 + 4 * R + 4 * Q * (R * R / 2) * math.sin(math.pi / (2 * Q))
    perim = 4 + 4 * Q * 2 * R * math.sin(math.pi / (4 * Q))
    assert abs(_shoelace(ring) - area) < 1e-9
    assert abs(_perim(ring) - perim) < 1e-9
    # containment with margin: every buffered vertex is >= R - eps outside
    # the square boundary and <= R from it
    for p in ring:
        dx = max(0.0 - p["lon"], p["lon"] - 1.0, 0.0)
        dy = max(0.0 - p["lat"], p["lat"] - 1.0, 0.0)
        d = math.hypot(dx, dy)
        assert d <= R + 1e-12
        # vertices on offset edges sit exactly R out; arc chords too
        assert d >= R * math.cos(math.pi / (4 * Q)) - 1e-12


def test_orientation_normalized(spark):
    ccw = buffer_features(_sq(spark, "ccw"), R, Q).collect()[0]["buffered"]
    cw = buffer_features(_sq(spark, "cw"), R, Q).collect()[0]["buffered"]
    # same CCW cycle; the reversed input starts at a different corner, so
    # compare as open vertex sets + equal lengths (the closing duplicate
    # doubles a different vertex)
    key = lambda ring: {(round(p["lat"], 9), round(p["lon"], 9)) for p in ring[:-1]}
    assert key(ccw) == key(cw) and len(ccw) == len(cw)
    assert _shoelace(cw) > 0  # output ring is CCW either way


def test_nonconvex_guarded(spark):
    nc = spark.sql(
        "SELECT array(struct(0.0d AS lat, 0.0d AS lon), struct(0.0d AS lat, 2.0d AS lon), "
        "struct(1.0d AS lat, 1.0d AS lon), struct(2.0d AS lat, 2.0d AS lon), "
        "struct(2.0d AS lat, 0.0d AS lon), struct(0.0d AS lat, 0.0d AS lon)) AS vertices"
    )
    assert buffer_features(nc, R, Q).collect()[0]["buffered"] is None


def test_line_capsule(spark):
    ln = spark.sql(
        "SELECT array(struct(0.0d AS lat, 0.0d AS lon), "
        "struct(0.0d AS lat, 3.0d AS lon)) AS vertices"
    )
    ring = buffer_features(ln, R, Q, kind="line").collect()[0]["buffered"]
    # capsule: 2 caps of 2Q segments each -> 2(2Q+1) vertices + closing dup
    assert len(ring) == 2 * (2 * Q + 1) + 1
    area = 3 * 2 * R + 4 * Q * (R * R / 2) * math.sin(math.pi / (2 * Q))
    assert abs(_shoelace(ring) - area) < 1e-9
