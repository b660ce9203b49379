"""Procedural texture types (DiskTexture.cpp, BladeTexture.cpp, IesTexture.cpp)."""
import math

import numpy as np
import jax.numpy as jnp

from tungsten_tpu.models.textures import TextureBuilder, eval_texture


def test_disk_blade_textures():
    """DiskTexture / BladeTexture procedural apertures (DiskTexture.cpp:50-53,
    BladeTexture.cpp:73-88)."""
    tb = TextureBuilder()
    d = tb.add_disk(2.0)
    b = tb.add_blade(blades=6, angle=0.0, value=1.0)
    table = tb.build()

    uv = jnp.asarray([[0.5, 0.5], [0.95, 0.5], [0.5, 0.52], [0.99, 0.99]], jnp.float32)
    disk = np.asarray(eval_texture(table, jnp.full((4,), d, jnp.int32), uv))
    assert np.allclose(disk[:, 0], [2.0, 2.0, 2.0, 0.0])

    blade = np.asarray(eval_texture(table, jnp.full((4,), b, jnp.int32), uv))
    assert blade[0, 0] == 1.0 and blade[3, 0] == 0.0
    # hexagon covers 3*sqrt(3)/2 (r=1) of the [-1,1]^2 box's area 4
    g = jnp.stack(
        jnp.meshgrid(jnp.linspace(0, 1, 101), jnp.linspace(0, 1, 101)), -1
    ).reshape(-1, 2)
    vals = np.asarray(eval_texture(table, jnp.full((g.shape[0],), b, jnp.int32), g))
    frac = (vals[:, 0] > 0).mean()
    assert abs(frac - 3 * math.sqrt(3) / 2 / 4) < 0.02, frac


def test_ies_bake():
    """LM-63 parse + bake (IesTexture.cpp loadResources): type-C profile,
    isotropic in horizontal, cosine vertical falloff."""
    from tungsten_tpu.models.textures.ies import parse_ies, bake_ies

    vert = np.linspace(0, 180, 19)
    cand = np.cos(np.deg2rad(vert)).clip(0) * 100.0
    ies = "IESNA:LM-63-1995\nTILT=NONE\n"
    ies += f"1 1000 1 {len(vert)} 1 1 1 0 0 0\n1 1 100\n"
    ies += " ".join(f"{v:.1f}" for v in vert) + "\n0\n"
    ies += " ".join(f"{c:.3f}" for c in cand) + "\n"
    parsed = parse_ies(ies)
    assert parsed is not None
    v, h, cd, pt = parsed
    assert pt == 1 and len(v) == 19 and cd.shape == (1, 19)
    img = bake_ies(v, h, cd, pt, resolution=32)
    assert img.shape == (32, 64, 3)
    assert img.max() == 1.0
    # vert angle 0 = brightest; v flip puts vert=0 at the bottom row
    col = img[:, 0, 0]
    assert col[-1] == 1.0 and col[0] == 0.0
    assert (np.diff(col) >= -1e-6).all()  # monotone with the cosine falloff
