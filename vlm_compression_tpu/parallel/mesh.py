"""Device mesh + sharding rules.

The reference scales with DDP over NCCL only (SURVEY.md §2.9;
``runner_base.py:104-108``).  Here parallelism is declarative: one
`jax.sharding.Mesh` with named axes

    data   — batch (data parallel; DDP equivalent; grad psum via pjit)
    model  — tensor parallel for the big linears (Megatron-style column/row
             splits of attention heads and FFN), rides ICI

and every array gets a `NamedSharding` derived from path-pattern rules.
Adding fsdp/pipeline axes later only means new rules — the train step stays
a single jitted SPMD program.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class MeshConfig:
    data: int = -1  # -1 = all remaining devices
    model: int = 1
    # pipeline stages (parallel/pipeline.py GPipe engine); 1 = no pipe
    # axis.  The pipe axis leads so stage hops ride the slowest-varying
    # ICI dimension while the model axis's per-layer collectives stay on
    # the fastest.
    pipe: int = 1
    # multi-slice: replicate data-parallelism over DCN-connected slices
    # while model parallelism stays inside a slice (ICI).  0 = single
    # mesh over whatever devices exist (the default, and the only option
    # on one slice).
    dcn_data: int = 0

    def axis_names(self) -> Tuple[str, ...]:
        names: Tuple[str, ...] = ("data", "model")
        if self.pipe > 1:
            names = ("pipe",) + names
        if self.dcn_data > 1:
            names = ("replica",) + names
        return names


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Build the device mesh.

    Single-slice: ``(data, model)`` over ICI.  Multi-slice
    (``dcn_data > 1``): a leading ``replica`` axis spans slices over DCN
    — gradients all-reduce across it once per step (cheap on DCN), while
    the ``model`` axis's per-layer collectives stay on ICI.  Uses
    ``mesh_utils.create_hybrid_device_mesh`` when slice topology info is
    available, else a plain reshape (the virtual-device test path)."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, cfg.model)
    pipe = max(1, cfg.pipe)
    if cfg.dcn_data and cfg.dcn_data > 1:
        per_slice = n // cfg.dcn_data
        data = cfg.data if cfg.data > 0 else per_slice // (model * pipe)
        if cfg.dcn_data * pipe * data * model != n:
            raise ValueError(
                f"mesh {cfg.dcn_data}x{pipe}x{data}x{model} != {n} devices")
        if pipe == 1 and all(getattr(d, "slice_index", None) is not None
                             for d in devices):
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                (data, model), (cfg.dcn_data, 1), devices=devices)
            arr = np.moveaxis(
                arr.reshape(cfg.dcn_data, data, model), 0, 0)
        else:
            arr = np.asarray(devices).reshape(
                (cfg.dcn_data,) + ((pipe,) if pipe > 1 else ())
                + (data, model))
        names = (("replica", "pipe", "data", "model") if pipe > 1
                 else ("replica", "data", "model"))
        return Mesh(arr, names)
    data = cfg.data if cfg.data > 0 else n // (model * pipe)
    if pipe * data * model != n:
        raise ValueError(f"mesh {pipe}x{data}x{model} != {n} devices")
    if pipe > 1:
        arr = np.asarray(devices).reshape(pipe, data, model)
        return Mesh(arr, ("pipe", "data", "model"))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


# ---------------------------------------------------------------------------
# Parameter sharding rules: (path regex, PartitionSpec) — first match wins.
# Kernels are stored (in_features, out_features) so "column parallel" =
# shard axis 1 on "model", "row parallel" = shard axis 0 on "model".
# ---------------------------------------------------------------------------

# Megatron split for a transformer block: qkv/out-proj + FFN in/out.
DEFAULT_RULES: Sequence[Tuple[str, P]] = (
    # attention projections: q/k/v column-parallel, output row-parallel
    (r".*(\bq\b|\bk\b|\bv\b|query|key|value|qkv).*kernel", P(None, "model")),
    (r".*(\bo\b|out_proj|proj|dense_out|attn_out).*kernel", P("model", None)),
    # FFN: up/gate column-parallel, down row-parallel
    (r".*(wi_0|wi_1|wi\b|fc1|gate|up_proj).*kernel", P(None, "model")),
    (r".*(wo\b|fc2|down_proj).*kernel", P("model", None)),
    # embeddings: shard vocab/feature dim on model axis
    (r".*embedding", P("model", None)),
    # everything else replicated
    (r".*", P()),
)

REPLICATED_RULES: Sequence[Tuple[str, P]] = ((r".*", P()),)

# FSDP/ZeRO-3 layout: every large kernel shards its contraction dim over
# the DATA axis — GSPMD all-gathers a layer's weights just-in-time and
# frees them after use, so per-device parameter memory scales 1/data.
# Composes with the Megatron model axis (a kernel can be ("data","model")
# sharded); _spec_fits falls anything indivisible back to replication.
FSDP_RULES: Sequence[Tuple[str, P]] = (
    (r".*(\bq\b|\bk\b|\bv\b|query|key|value|qkv).*kernel",
     P("data", "model")),
    (r".*(\bo\b|out_proj|proj|dense_out|attn_out).*kernel",
     P(("data", "model"), None)),
    (r".*(wi_0|wi_1|wi\b|fc1|gate|up_proj).*kernel", P("data", "model")),
    (r".*(wo\b|fc2|down_proj).*kernel", P(("data", "model"), None)),
    (r".*kernel", P("data", None)),
    (r".*embedding", P(("data", "model"), None)),
    (r".*", P()),
)


def mask_rules(rules: Sequence[Tuple[str, P]] = DEFAULT_RULES):
    """Masks shadow their kernels (same shape, bool) — shard identically so
    the masked matmul never gathers the mask."""
    return tuple((pat.replace("kernel", "mask"), spec) for pat, spec in rules)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_partition_spec(params, rules: Sequence[Tuple[str, P]] = DEFAULT_RULES):
    """Pytree of PartitionSpecs matching `params` by path regex.

    A spec only applies if every named axis size divides the corresponding
    array dimension; otherwise the leaf falls back to replication (keeps tiny
    test models and odd head counts compiling).
    """

    def assign(path, leaf):
        s = _path_str(path)
        for pat, spec in rules:
            if re.fullmatch(pat, s) or re.search(pat, s):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(assign, params)


def _spec_fits(spec: P, shape, mesh: Mesh) -> bool:
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        axes = (axis,) if isinstance(axis, str) else tuple(axis)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        if dim >= len(shape) or shape[dim] % size != 0:
            return False
    return True


def shard_params(params, mesh: Mesh, rules: Sequence[Tuple[str, P]] = DEFAULT_RULES):
    """Device-put every leaf with its NamedSharding (replication fallback)."""
    specs = param_partition_spec(params, rules)

    def place(leaf, spec):
        if hasattr(leaf, "shape") and not _spec_fits(spec, leaf.shape, mesh):
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params, specs)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input arrays.  On a multi-slice mesh the
    batch spans both the DCN replica axis and the in-slice data axis."""
    if "replica" in mesh.axis_names:
        return NamedSharding(mesh, P(("replica", "data")))
    return NamedSharding(mesh, P("data"))
