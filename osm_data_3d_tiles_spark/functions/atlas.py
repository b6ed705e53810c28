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
