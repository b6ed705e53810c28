"""Texture-atlas constants + UV transform — pure broadcastable metadata.

Parity sources (/root/reference/):
- src/building/roof/textures.ts        (ExtrudedTextures id enum)
- src/textures/building_textures.ts:305-340  (getTileUVTransform: atlas 2580,
  tile 512, padding 2, 5 cols, 2px anti-bleed shrink)
- src/textures/helper.ts:1-4 + assets/textures/packed/diffuse.json  (getImageFrame:
  textureId -> packed-frame pixel origin; the packer output is committed in the
  reference's assets, so the frame coordinates are fixed constants reproduced here)
"""

from __future__ import annotations

import math

# src/building/roof/textures.ts (active entries only)
class ExtrudedTextures:
    RoofGeneric3 = 0
    RoofTiles = 1
    RoofMetal = 2
    RoofConcrete = 3
    RoofThatch = 4
    RoofEternit = 5
    RoofGrass = 6
    RoofGlass = 7
    RoofTar = 8
    FacadeGlass = 9
    FacadeBrickWall = 10
    FacadePlasterWall = 11
    FacadeWoodWall = 12
    FacadeBlockWall = 13


# textureId -> diffuse frame pixel origin (x, y) in the packed atlas
# (assets/textures/packed/diffuse.json, indexed via buildingTextures[4*id].url).
FRAME_XY: dict[int, tuple[int, int]] = {
    0: (518, 2),     # Plastic018A (roofGeneric3)
    1: (1034, 518),  # tiles
    2: (518, 1034),  # metal
    3: (1034, 2),    # concrete
    4: (518, 2066),  # thatch
    5: (1550, 2),    # eternit
    6: (518, 518),   # grass
    7: (2066, 2),    # glass roof
    8: (518, 1550),  # tar
    9: (2, 1034),    # facade glass
    10: (2, 518),    # brick wall
    11: (2, 1550),   # plaster wall
    12: (2, 2066),   # wood wall
    13: (2, 2),      # block wall
}


def tile_uv_transform(
    x: float,
    y: float,
    atlas_size: int = 2580,
    tile_size: int = 512,
    padding: int = 2,
    cols: int = 5,
) -> tuple[float, float, float, float]:
    """(offset_x, offset_y, scale_x, scale_y) — building_textures.ts:305-340."""
    cell = tile_size + padding * 2
    col = math.floor(x / tile_size)
    row = (cols - 1) - math.floor(y / tile_size)
    px = padding + col * cell
    py = padding + row * cell
    u_offset = px / atlas_size
    v_offset = py / atlas_size
    u_scale = tile_size / atlas_size
    v_scale = tile_size / atlas_size
    eps = 2 / atlas_size
    return (u_offset + eps, v_offset + eps, u_scale - 2 * eps, v_scale - 2 * eps)


def atlas_transform_for_texture(texture_id: int) -> tuple[float, float, float, float]:
    """getImageFrame + getTileUVTransform composed for one texture id."""
    fx, fy = FRAME_XY[int(texture_id)]
    return tile_uv_transform(fx, fy)


# builder.ts:248-268 — roof material -> texture id and per-texture UV scale
ROOF_MATERIAL_TO_TEXTURE = {
    "default": ExtrudedTextures.RoofConcrete,
    "tiles": ExtrudedTextures.RoofTiles,
    "metal": ExtrudedTextures.RoofMetal,
    "concrete": ExtrudedTextures.RoofConcrete,
    "thatch": ExtrudedTextures.RoofThatch,
    "eternit": ExtrudedTextures.RoofEternit,
    "grass": ExtrudedTextures.RoofGrass,
    "glass": ExtrudedTextures.RoofGlass,
    "tar": ExtrudedTextures.RoofTar,
}

ROOF_TEXTURE_SCALE = {
    ExtrudedTextures.RoofTiles: (3.0, 3.0),
    ExtrudedTextures.RoofMetal: (4.0, 4.0),
    ExtrudedTextures.RoofConcrete: (10.0, 10.0),
    ExtrudedTextures.RoofThatch: (8.0, 8.0),
    ExtrudedTextures.RoofEternit: (5.0, 5.0),
    ExtrudedTextures.RoofGrass: (12.0, 12.0),
    ExtrudedTextures.RoofGlass: (4.0, 4.0),
    ExtrudedTextures.RoofTar: (4.0, 4.0),
}

# builder.ts:311-343 — facade material -> wall texture id + window width (pre
# mercatorScale); windows are disabled in the reference (hasWindows=false,
# textureIdWindow == textureIdWall).
FACADE_MATERIAL_TO_TEXTURE = {
    "plaster": (ExtrudedTextures.FacadePlasterWall, 4.0),
    "glass": (ExtrudedTextures.FacadeGlass, 4.0),
    "brick": (ExtrudedTextures.FacadeBrickWall, 4.0),
    "wood": (ExtrudedTextures.FacadeWoodWall, 4.0),
    "cementBlock": (ExtrudedTextures.FacadeBlockWall, 4.0),
}

MERCATOR_SCALE = 1.52122668  # builder.ts:26


# ---------------------------------------------------------------------------
# atlas image artifact — a real PNG, written with stdlib zlib only.
#
# The reference ships pre-packed 2580² atlases (free-tex-packer output committed
# under assets/textures/packed/). The source textures are not redistributable
# here, so the engine renders a deterministic PROCEDURAL texture per frame —
# the frame layout, padding and UV transforms are the real, verified artifact;
# swapping procedural fills for decoded source images is a one-function change
# (the `_frame_pattern` hook).
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def write_png(path: str, rgba) -> None:
    """HxWx4 uint8 array → valid RGBA PNG (bit depth 8, filter 0 scanlines)."""
    import struct
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(rgba, dtype=np.uint8)
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def _frame_pattern(texture_id: int, h: int, w: int):
    """Deterministic procedural fill for one frame: id-seeded base color with an
    id-dependent stripe/checker modulation (visually distinct, reproducible)."""
    import numpy as np

    seed = (texture_id * 2654435761) & 0xFFFFFFFF
    r, g, b = 64 + seed % 160, 64 + (seed >> 8) % 160, 64 + (seed >> 16) % 160
    yy, xx = np.mgrid[0:h, 0:w]
    period = 16 + (texture_id % 4) * 16
    if texture_id % 2:
        mod = ((xx // period + yy // period) % 2) * 24
    else:
        mod = ((xx + yy) // period % 2) * 24
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = np.clip(r + mod, 0, 255)
    out[..., 1] = np.clip(g + mod, 0, 255)
    out[..., 2] = np.clip(b + mod, 0, 255)
    out[..., 3] = 255
    return out


def render_atlas(atlas_size: int = 2580, tile_size: int = 512):
    """All FRAME_XY frames rendered into one RGBA atlas array (background
    transparent black, frames at their packed pixel origins)."""
    import numpy as np

    img = np.zeros((atlas_size, atlas_size, 4), dtype=np.uint8)
    for tid, (fx, fy) in FRAME_XY.items():
        img[fy : fy + tile_size, fx : fx + tile_size] = _frame_pattern(
            tid, tile_size, tile_size
        )
    return img


def write_atlas_png(path: str, atlas_size: int = 2580, tile_size: int = 512) -> str:
    """Render + write the packed diffuse atlas PNG; returns the path."""
    write_png(path, render_atlas(atlas_size, tile_size))
    return path
