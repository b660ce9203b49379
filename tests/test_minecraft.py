"""mc-loader stage 1: NBT parser, Anvil region decode (byte-exact with
MapLoader.hpp:35-172 semantics), exposed-face geometry, and an end-to-end
minecraft_map render on a synthesized world."""
import json
import os

import numpy as np
import pytest

from tungsten_tpu.io import nbt as N
from tungsten_tpu.io import anvil as AV


def test_nbt_roundtrip_all_types():
    tag = N.NbtTag("", N.TAG_COMPOUND, {
        "b": N.NbtTag("b", N.TAG_BYTE, -3),
        "s": N.NbtTag("s", N.TAG_SHORT, -1234),
        "i": N.NbtTag("i", N.TAG_INT, 123456),
        "l": N.NbtTag("l", N.TAG_LONG, -(1 << 40)),
        "f": N.NbtTag("f", N.TAG_FLOAT, 1.5),
        "d": N.NbtTag("d", N.TAG_DOUBLE, -2.25),
        "ba": N.NbtTag("ba", N.TAG_BYTE_ARRAY, np.arange(-4, 4, dtype=np.int8)),
        "ia": N.NbtTag("ia", N.TAG_INT_ARRAY, np.array([1, -2, 3], np.int32)),
        "st": N.NbtTag("st", N.TAG_STRING, "hello nbt"),
        "li": N.NbtTag("li", N.TAG_LIST, [
            N.NbtTag("", N.TAG_INT, 7), N.NbtTag("", N.TAG_INT, 8)]),
        "cp": N.NbtTag("cp", N.TAG_COMPOUND, {
            "x": N.NbtTag("x", N.TAG_INT, 42)}),
    })
    data = N.write_nbt(tag)
    r = N.parse_nbt(data)
    assert r["b"].as_int() == -3
    assert r["s"].as_int() == -1234
    assert r["i"].as_int() == 123456
    assert r["l"].as_int() == -(1 << 40)
    assert abs(r["f"].value - 1.5) < 1e-7
    assert r["d"].value == -2.25
    assert np.array_equal(r["ba"].as_array(), np.arange(-4, 4, dtype=np.int8))
    assert np.array_equal(r["ia"].as_array(), [1, -2, 3])
    assert r["st"].value == "hello nbt"
    assert r["li"].subtag(1).as_int() == 8
    assert r["cp"]["x"].as_int() == 42
    # missing tags are falsy, like the reference's InvalidTag
    assert not r["nope"]
    assert not r["cp"]["nope"]


def _tiny_world(tmp, blocks_fn):
    """One region, one chunk at (0, 0), 16^3 section filled by blocks_fn."""
    region = os.path.join(tmp, "world", "region")
    os.makedirs(region, exist_ok=True)
    ids = np.zeros((16, 16, 16), np.uint8)  # [y, z, x]
    blocks_fn(ids)
    chunk = AV.make_chunk_nbt(ids, chunk_y=0)
    AV.write_region(os.path.join(region, "r.0.0.mca"), {(0, 0): chunk})
    return os.path.join(tmp, "world")


def test_region_decode_layout(tmp_path):
    """Block ids land at the reference's grid coordinates (id << 4, [z,y,x])."""
    def fill(ids):
        ids[0, :, :] = 1      # stone floor at y = 0
        ids[3, 5, 7] = 89     # glowstone at (x=7, y=3, z=5)
    world = _tiny_world(str(tmp_path), fill)
    regions = AV.load_world(world)
    assert list(regions) == [(0, 0)]
    grid, biomes, height = regions[(0, 0)]
    assert height == 4
    assert grid[5, 3, 7] == 89 << 4
    assert grid[0, 0, 0] == 1 << 4
    assert grid[1, 1, 1] == 0
    assert int((grid != 0).sum()) == 16 * 16 + 1

    # data nibble packing: id << 4 | data (MapLoader.hpp:55-58)
    ids2 = np.zeros((16, 16, 16), np.uint8)
    ids2[2, 3, 4] = 35
    data = np.zeros((16, 16, 16), np.uint8)
    data[2, 3, 4] = 11
    chunk = AV.make_chunk_nbt(ids2, chunk_y=1, data_nibbles=data)
    AV.write_region(os.path.join(world, "region", "r.0.0.mca"), {(0, 0): chunk})
    grid2, _, h2 = AV.load_world(world)[(0, 0)]
    assert grid2[3, 16 + 2, 4] == (35 << 4) | 11
    assert h2 == 16 + 3


def test_exposed_faces_and_quads():
    from tungsten_tpu.models.primitives import minecraft as mc

    grid = np.zeros((4, 4, 4), np.uint16)
    grid[1, 1, 1] = 1 << 4  # lone stone block
    ids, axes, signs, cells = mc.exposed_faces(grid)
    assert len(ids) == 6  # all six faces exposed
    pos, indices, fids, _uv = mc.faces_to_quads(ids, axes, signs, cells, (0, 0))
    assert indices.shape == (12, 3)  # 6 quads = 12 tris
    # triangle normals all point outward from the cube center
    ctr = np.array([1.5, 1.5, 1.5])
    p0, p1, p2 = pos[indices[:, 0]], pos[indices[:, 1]], pos[indices[:, 2]]
    n = np.cross(p1 - p0, p2 - p0)
    outward = np.einsum("fi,fi->f", n, (p0 + p1 + p2) / 3.0 - ctr)
    assert np.all(outward > 0)
    # two touching blocks: the shared faces are culled (10 quads)
    grid[1, 1, 2] = 1 << 4
    ids2 = mc.exposed_faces(grid)[0]
    assert len(ids2) == 10


def test_minecraft_map_renders(tmp_path):
    """End-to-end: synthesized world with a glowstone block -> flatten ->
    PT render. The emissive block must register as a light and illuminate."""
    def fill(ids):
        ids[0, :, :] = 2     # grass floor
        ids[3, 8, 8] = 89    # glowstone above it
    world = _tiny_world(str(tmp_path), fill)
    doc = {
        "media": [], "bsdfs": [],
        "primitives": [
            {"type": "minecraft_map", "map_path": "world"},
        ],
        "camera": {"type": "pinhole", "tonemap": "linear", "fov": 70,
                   "resolution": [48, 36],
                   "transform": {"position": [8.5, 6.0, -4.0],
                                 "look_at": [8.5, 1.0, 8.5],
                                 "up": [0, 1, 0]}},
        "integrator": {"type": "path_tracer", "max_bounces": 4},
        "renderer": {"spp": 16, "spp_step": 16},
    }
    path = os.path.join(str(tmp_path), "scene.json")
    json.dump(doc, open(path, "w"))

    from tungsten_tpu.scene.load import load_scene
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.renderer.render import render_flat

    scene = flatten_scene(load_scene(path))
    assert scene.meta.n_lights == 1  # the glowstone block
    img = np.asarray(render_flat(scene, spp=16, seed=5))
    assert np.isfinite(img).all()
    assert float(img.mean()) > 1e-3  # light reaches the floor


def _tiny_pack(tmp):
    """Synthesized resource pack exercising the stage-2 resolver: parent
    chain (stone -> cube_all -> cube with elements), '#var' texture refs,
    mapping.json mask semantics, and emitters.json."""
    root = os.path.join(tmp, "pack")
    mdir = os.path.join(root, "assets/minecraft/models/block")
    sdir = os.path.join(root, "assets/minecraft/blockstates")
    tdir = os.path.join(root, "assets/minecraft/textures/blocks")
    for d in (mdir, sdir, tdir):
        os.makedirs(d, exist_ok=True)
    faces = {n: {"texture": "#" + n} for n in
             ("down", "up", "north", "south", "west", "east")}
    json.dump({"elements": [{"from": [0, 0, 0], "to": [16, 16, 16],
                             "faces": faces}]},
              open(os.path.join(mdir, "cube.json"), "w"))
    json.dump({"parent": "block/cube",
               "textures": {n: "#all" for n in
                            ("down", "up", "north", "south", "west", "east")}},
              open(os.path.join(mdir, "cube_all.json"), "w"))
    json.dump({"parent": "block/cube_all",
               "textures": {"all": "blocks/stone"}},
              open(os.path.join(mdir, "stone.json"), "w"))
    json.dump({"parent": "block/cube_all",
               "textures": {"all": "blocks/glowstone"}},
              open(os.path.join(mdir, "glowstone.json"), "w"))
    json.dump({"variants": {"normal": {"model": "block/stone"}}},
              open(os.path.join(sdir, "stone.json"), "w"))
    json.dump({"variants": {"normal": [{"model": "block/glowstone"}]}},
              open(os.path.join(sdir, "glowstone.json"), "w"))
    from tungsten_tpu.io.imageio import save_image

    stone = np.zeros((2, 2, 3), np.float32)
    stone[0, 0] = [1, 0, 0]
    stone[1, 1] = [0, 0, 1]
    save_image(os.path.join(tdir, "stone.png"), stone)
    save_image(os.path.join(tdir, "glowstone.png"),
               np.full((2, 2, 3), 0.9, np.float32))
    json.dump([{"id": 1, "data": 0, "mask": 0, "blockstate": "stone"},
               {"id": 89, "data": 0, "mask": 0, "blockstate": "glowstone"}],
              open(os.path.join(root, "mapping.json"), "w"))
    json.dump([{"texture": "blocks/glowstone", "primary_scale": 5.0}],
              open(os.path.join(root, "emitters.json"), "w"))
    return root


def test_resource_pack_model_resolution(tmp_path):
    """Stage 2 (ResourcePackLoader.cpp analog): parent-chain + '#ref'
    resolution lands the right texture on every face, mapping.json mask 0
    covers all data nibbles, and emitters.json drives emission."""
    from tungsten_tpu.models.primitives.mc_resources import ResourcePack

    root = _tiny_pack(str(tmp_path))
    rp = ResourcePack([root])
    model = rp.resolve_model("block/stone")
    assert model["textures"]["all"] == "blocks/stone"
    assert model["textures"]["up"] == "blocks/stone"  # #all deref
    assert len(model["elements"]) == 1  # inherited from block/cube
    texs, tints = rp.face_textures((1 << 4) | 7)  # any data nibble
    assert texs == ["blocks/stone"] * 6
    assert rp.emission_of("blocks/glowstone") is not None
    assert rp.emission_of("blocks/stone") is None
    img = rp.texture_image("blocks/stone")
    assert img.shape == (2, 2, 3)


def test_minecraft_map_with_resource_pack(tmp_path):
    """End-to-end: a textured world — block faces carry BITMAP albedo with
    real uv, glowstone emission comes from emitters.json, and the render
    shows the texture's distinct texel colors."""
    def fill(ids):
        ids[0, :, :] = 1     # stone floor
        ids[3, 8, 8] = 89    # glowstone lamp
    world = _tiny_world(str(tmp_path), fill)
    pack = _tiny_pack(str(tmp_path))
    doc = {
        "media": [], "bsdfs": [],
        "primitives": [
            {"type": "minecraft_map", "map_path": "world",
             "resource_packs": ["pack"]},
        ],
        "camera": {"type": "pinhole", "tonemap": "linear", "fov": 70,
                   "resolution": [48, 36],
                   "transform": {"position": [8.5, 6.0, -4.0],
                                 "look_at": [8.5, 1.0, 8.5],
                                 "up": [0, 1, 0]}},
        "integrator": {"type": "path_tracer", "max_bounces": 4},
        "renderer": {"spp": 16, "spp_step": 16},
    }
    path = os.path.join(str(tmp_path), "scene.json")
    json.dump(doc, open(path, "w"))

    from tungsten_tpu.models.textures.textures import TEX_BITMAP
    from tungsten_tpu.scene.load import load_scene
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.renderer.render import render_flat

    scene = flatten_scene(load_scene(path))
    # glowstone via emitters.json: one light per emissive (block type,
    # face direction) group — six for a free-standing cube. Bounded by
    # 6 x emissive block TYPES (not quads): the many-quad sampling stays
    # sub-linear through each light's per-triangle area CDF
    assert scene.meta.n_lights == 6
    # the floor material's albedo is a BITMAP texture
    types = np.asarray(scene.textures.type)
    mat_tex = np.asarray(scene.materials.albedo_tex)
    assert (types[mat_tex] == TEX_BITMAP).any()
    # uv actually varies across the quads
    assert float(np.abs(np.asarray(scene.tri_uv1)
                        - np.asarray(scene.tri_uv0)).max()) > 0.5
    img = np.asarray(render_flat(scene, spp=16, seed=5))
    assert np.isfinite(img).all()
    assert float(img.mean()) > 1e-4
