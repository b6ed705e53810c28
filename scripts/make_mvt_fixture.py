"""Generate the checked-in MVT fixture tile at tests/fixtures/mvt/16/{x}/{y}.pbf.

Deterministic: three buildings (rect, rect-with-hole, L-shape) placed at fixed
mercator offsets inside one z16 tile of the engine's fixture extent, encoded
with sources/mvt.encode_mvt. Re-running reproduces identical bytes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_data_3d_tiles_spark.functions import mercator as m
from osm_data_3d_tiles_spark.sources.fixtures import FIXTURE_EXTENT
from osm_data_3d_tiles_spark.sources.mvt import encode_mvt

EXTENT = 4096


def tile_of_fixture():
    min_tx, min_ty, _max_tx, _max_ty = m.tile_range_for_extent(FIXTURE_EXTENT, 16)
    return 16, min_tx + 2, min_ty + 2


def merc_to_local(pts, z, tx, ty):
    span = m.tile_span(z)
    x0 = -m.HALF_SIZE + tx * span
    y0 = m.HALF_SIZE - ty * span
    return [
        (round((px - x0) / span * EXTENT), round((y0 - py) / span * EXTENT))
        for px, py in pts
    ]


def main() -> str:
    z, tx, ty = tile_of_fixture()
    span = m.tile_span(z)
    x0 = -m.HALF_SIZE + tx * span
    y1 = m.HALF_SIZE - ty * span  # top edge

    def rect(cx, cy, w, h):
        return [
            (cx - w / 2, cy - h / 2), (cx + w / 2, cy - h / 2),
            (cx + w / 2, cy + h / 2), (cx - w / 2, cy + h / 2),
            (cx - w / 2, cy - h / 2),
        ]

    c1 = (x0 + span * 0.25, y1 - span * 0.25)
    c2 = (x0 + span * 0.60, y1 - span * 0.60)
    c3 = (x0 + span * 0.80, y1 - span * 0.30)

    def local_area(path):
        s = 0.0
        for (ax, ay), (bx, by) in zip(path[:-1], path[1:]):
            s += ax * by - bx * ay
        return s / 2.0

    def to_paths(rings):
        """MVT winding rule: exterior rings positive area in y-down tile
        coords, holes negative — ring 0 is the outer, the rest are holes."""
        out = []
        for i, r in enumerate(rings):
            p = merc_to_local(r, z, tx, ty)
            if (local_area(p) > 0) != (i == 0):
                p = p[::-1]
            out.append(p)
        return out

    features = [
        {
            "id": 1,
            "type": 3,
            "props": {"layer": "buildings", "osm_id": 900001, "osm_type": "way",
                      "height": 12.5, "building": "yes", "roof_type": "flat"},
            "paths": to_paths([rect(*c1, 60, 40)]),
        },
        {
            "id": 2,
            "type": 3,
            "props": {"layer": "buildings", "osm_id": 900002, "osm_type": "way",
                      "levels": 3, "building": "apartments"},
            # outer + hole (hole wound opposite = reversed point order)
            "paths": to_paths([rect(*c2, 80, 80), rect(*c2, 30, 30)[::-1]]),
        },
        {
            "id": 3,
            "type": 3,
            "props": {"layer": "roads", "osm_id": 900003},  # filtered out
            "paths": to_paths([rect(*c3, 40, 20)]),
        },
    ]
    data = encode_mvt([{"name": "default", "extent": EXTENT, "features": features}])
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "mvt", str(z), str(tx),
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{ty}.pbf")
    with open(path, "wb") as f:
        f.write(data)
    print(path, len(data), "bytes")
    return path


if __name__ == "__main__":
    main()
