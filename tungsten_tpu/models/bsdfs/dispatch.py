"""Material table + batched masked BSDF dispatch.

The reference dispatches through virtual Bsdf* calls (BsdfFactory.cpp:29-52).
The TPU-native equivalent: materials live in a SoA table (type id, lobe mask,
16-float parameter row, albedo texture id); the wavefront evaluates each BSDF
type *present in the scene* (a static set known at trace time) over all lanes
and selects by mask. With material-sorted queues (later optimization) the
masked work collapses to near-zero waste; for typical scenes (2-5 types) the
overhead is already small.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax.numpy as jnp
from flax.struct import dataclass as pytree, field

from .common import BsdfSample, Lobes
from . import lambert, null, mirror

N_PARAMS = 16

# type-name -> (type_id, module). Order defines the stable type-id space.
_MODULES = [lambert, null, mirror]


def register_module(mod):
    _MODULES.append(mod)


def _registry() -> Dict[str, tuple]:
    return {m.NAME: (i, m) for i, m in enumerate(_MODULES)}


def module_for_id(type_id: int):
    return _MODULES[type_id]


@pytree
class MaterialTable:
    type: jnp.ndarray  # (M,) int32
    lobes: jnp.ndarray  # (M,) int32
    params: jnp.ndarray  # (M, 16) float32
    albedo_tex: jnp.ndarray  # (M,) int32

    present: tuple = field(pytree_node=False, default=())  # static type-id set


def pack_materials(bsdf_specs: List[dict], tex_builder) -> MaterialTable:
    """bsdf_specs: resolved JSON dicts (one per material instance, in scene
    order). tex_builder: TextureBuilder for albedo/parameter textures."""
    reg = _registry()
    types, lobes, params, albedo = [], [], [], []
    for spec in bsdf_specs:
        tname = spec.get("type", "lambert")
        if tname not in reg:
            raise NotImplementedError(f"bsdf type '{tname}' not implemented yet")
        tid, mod = reg[tname]
        p = np.zeros(N_PARAMS, np.float32)
        p = mod.pack(spec, p, tex_builder)
        a = spec.get("albedo", 1.0)
        if isinstance(a, dict):
            if a.get("type") == "checker":
                tex = tex_builder.add_checker(
                    a.get("on_color", 0.8), a.get("off_color", 0.2),
                    a.get("res_u", 20), a.get("res_v", 20),
                )
            elif a.get("type") == "constant":
                tex = tex_builder.add_constant(a.get("value", 1.0))
            elif a.get("type") == "bitmap":
                from ...io.imageio import load_image

                img = load_image(spec["_resolve_path"](a["file"]))
                tex = tex_builder.add_bitmap(img, path_key=a["file"])
            else:
                raise NotImplementedError(f"albedo texture type {a.get('type')}")
        elif isinstance(a, str):
            from ...io.imageio import load_image

            img = load_image(spec["_resolve_path"](a))
            tex = tex_builder.add_bitmap(img, path_key=a)
        else:
            tex = tex_builder.add_constant(a)
        types.append(tid)
        lobes.append(mod.LOBES if not hasattr(mod, "lobes_for") else mod.lobes_for(spec))
        params.append(p)
        albedo.append(tex)
    if not types:
        types, lobes, params, albedo = [0], [0], [np.zeros(N_PARAMS, np.float32)], [0]
    return MaterialTable(
        type=jnp.asarray(np.asarray(types, np.int32)),
        lobes=jnp.asarray(np.asarray(lobes, np.int32)),
        params=jnp.asarray(np.stack(params)),
        albedo_tex=jnp.asarray(np.asarray(albedo, np.int32)),
        present=tuple(sorted(set(types))),
    )


def bsdf_eval(mats: MaterialTable, mat_id, albedo, wi, wo, nonspecular_only=False):
    """Masked dispatch of eval over lanes. mat_id (N,), albedo (N,3) pre-looked-up."""
    params = mats.params[mat_id]
    mtype = mats.type[mat_id]
    out = jnp.zeros(wi.shape[:-1] + (3,), jnp.float32)
    for tid in mats.present:
        f = module_for_id(tid).eval(params, albedo, wi, wo, nonspecular_only)
        out = jnp.where((mtype == tid)[..., None], f, out)
    return out


def bsdf_pdf(mats: MaterialTable, mat_id, albedo, wi, wo, nonspecular_only=False):
    params = mats.params[mat_id]
    mtype = mats.type[mat_id]
    out = jnp.zeros(wi.shape[:-1], jnp.float32)
    for tid in mats.present:
        p = module_for_id(tid).pdf(params, albedo, wi, wo, nonspecular_only)
        out = jnp.where(mtype == tid, p, out)
    return out


def bsdf_sample(mats: MaterialTable, mat_id, albedo, wi, u2, u1, nonspecular_only=False) -> BsdfSample:
    params = mats.params[mat_id]
    mtype = mats.type[mat_id]
    res = BsdfSample.invalid(wi.shape[0])
    for tid in mats.present:
        s = module_for_id(tid).sample(params, albedo, wi, u2, u1, nonspecular_only)
        m = mtype == tid
        res = BsdfSample(
            wo=jnp.where(m[..., None], s.wo, res.wo),
            weight=jnp.where(m[..., None], s.weight, res.weight),
            pdf=jnp.where(m, s.pdf, res.pdf),
            lobe=jnp.where(m, s.lobe, res.lobe),
            valid=jnp.where(m, s.valid, res.valid),
        )
    return res
