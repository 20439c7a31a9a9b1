"""The reference's named loop fixtures, verbatim (s2/loop_test.go:30-120
text literals in the "lat:lng, ..." grammar of s2/textformat_test.go) —
the shared vocabulary for PIP/relation/boolean behavior checks."""

from __future__ import annotations

NAMED_LOOPS: dict[str, str] = {
    # The northern hemisphere, defined using two pairs of antipodal points.
    "northHemi": "0:-180, 0:-90, 0:0, 0:90",
    # The northern hemisphere, defined using three points 120 degrees apart.
    "northHemi3": "0:-180, 0:-60, 0:60",
    # The southern hemisphere, defined using two pairs of antipodal points.
    "southHemi": "0:90, 0:0, 0:-90, 0:-180",
    # The western hemisphere, defined using two pairs of antipodal points.
    "westHemi": "0:-180, -90:0, 0:0, 90:0",
    # The eastern hemisphere, defined using two pairs of antipodal points.
    "eastHemi": "90:0, 0:0, -90:0, 0:-180",
    # The "near" hemisphere, defined using two pairs of antipodal points.
    "nearHemi": "0:-90, -90:0, 0:90, 90:0",
    # The "far" hemisphere, defined using two pairs of antipodal points.
    "farHemi": "90:0, 0:90, -90:0, 0:-90",
    # A spiral stripe that slightly over-wraps the equator.
    "candyCane": "-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70",
    # A small clockwise loop in the northern & eastern hemispheres.
    "smallNECW": "35:20, 45:20, 40:25",
    # Loop around the north pole at 80 degrees.
    "arctic80": "80:-150, 80:-30, 80:90",
    # Loop around the south pole at 80 degrees.
    "antarctic80": "-80:120, -80:0, -80:-120",
    # A completely degenerate triangle along the equator that RobustCCW()
    # considers to be CCW.
    "lineTriangle": "0:1, 0:2, 0:3",
    # A nearly-degenerate CCW chevron near the equator with very long sides
    # (about 80 degrees). Its area is less than 1e-640.
    "skinnyChevron": "0:0, -1e-320:80, 0:1e-320, 1e-320:80",
    # A diamond-shaped loop around the point 0:180.
    "loopA": "0:178, -1:180, 0:-179, 1:-180",
    # Another diamond-shaped loop around the point 0:180.
    "loopB": "0:179, -1:180, 0:-178, 1:-180",
    # The intersection of A and B.
    "aIntersectB": "0:179, -1:180, 0:-179, 1:-180",
    # The union of A and B.
    "aUnionB": "0:178, -1:180, 0:-178, 1:-180",
    # A minus B (concave).
    "aMinusB": "0:178, -1:180, 0:179, 1:-180",
    # B minus A (concave).
    "bMinusA": "0:-179, -1:180, 0:-178, 1:-180",
}


def loop_vertices(name: str):
    from geo_spark.kernel.pip import latlng_text_to_xyz

    return latlng_text_to_xyz(NAMED_LOOPS[name])
