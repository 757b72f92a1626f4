"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference scales exclusively with DDP (SURVEY.md §2.9) — it has no
pipeline engine at all; this module is a beyond-reference capability
sized for models whose layers do not fit one chip even tensor-parallel.

TPU-idiomatic design (scaling-book recipe, not a torch translation):

* The repeated transformer blocks (``blocks_0 … blocks_{L-1}`` — every
  tower here names them uniformly, e.g. ``models/llama.py``) stack into
  ONE stage-major pytree with a leading ``(n_stages, layers_per_stage)``
  axis pair, sharded ``P("pipe", …)`` — each device materializes only
  its own stage's layers.
* Inside ``shard_map`` every device runs the same program: a
  ``lax.scan`` over the GPipe schedule's ``n_micro + n_stages - 1``
  ticks.  Stage 0 injects microbatches, every stage applies its local
  layers (an inner ``lax.scan`` over ``layers_per_stage``), and
  activations hop stage→stage with ``lax.ppermute`` — a neighbor
  exchange that rides ICI.
* The whole schedule is differentiable (``ppermute`` transposes to the
  reverse permute, ``scan`` to a reverse scan), so ``jax.grad`` through
  ``pipeline_apply`` yields the standard GPipe backward for free — no
  hand-written 1F1B state machine.

Static shapes throughout: microbatch count, stage count, and tick count
are Python ints at trace time, so XLA sees one fixed program.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
try:  # jax >= 0.8 renamed check_rep -> check_vma
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):
        kw["check_vma"] = kw.pop("check_rep", False)
        return _shard_map(f, **kw)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_layer_params(layer_params: Sequence[Any]):
    """Stack per-layer pytrees (e.g. ``params["blocks_i"]``) into one tree
    whose every leaf gains a leading layer axis of size ``len(layer_params)``."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *layer_params)


def split_stages(stacked, n_stages: int):
    """Reshape the leading layer axis (L, …) → (n_stages, L // n_stages, …).

    Leading-axis sharding ``P("pipe")`` then gives each device its own
    stage's layer slab."""

    def r(x):
        L = x.shape[0]
        if L % n_stages:
            raise ValueError(f"{L} layers not divisible by {n_stages} stages")
        return x.reshape((n_stages, L // n_stages) + x.shape[1:])

    return jax.tree_util.tree_map(r, stacked)


def stage_spec(staged):
    """PartitionSpec tree sharding the leading stage axis on ``pipe``."""
    return jax.tree_util.tree_map(lambda _: P("pipe"), staged)


def shard_stages(staged, mesh: Mesh):
    """Place a stage-major tree so each pipe-group holds one stage."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("pipe"))), staged)


def pipeline_apply(
    block_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    staged_params,
    x: jnp.ndarray,
    *,
    mesh: Mesh,
    n_microbatches: int,
    axis: str = "pipe",
    batch_axis: str | None = None,
):
    """Run ``x`` through all stages' layers with GPipe microbatching.

    Args:
      block_fn: ``(one_layer_params, activations) -> activations`` — the
        per-block apply (same signature the calibration engine uses).
      staged_params: output of ``split_stages`` — leaves
        ``(n_stages, layers_per_stage, …)``, sharded ``P(axis, …)``.
      x: global activations ``(batch, …)``; batch must divide into
        ``n_microbatches``.
      mesh: mesh containing ``axis`` (and optionally ``batch_axis`` for
        combined data×pipe parallelism).
      n_microbatches: GPipe microbatch count M; bubble fraction is
        ``(S-1)/(M+S-1)``.
      batch_axis: if given, the batch dim is additionally sharded over
        this mesh axis (pure data parallelism composed with the pipe).

    Returns activations with the same global shape as ``x``, replicated
    over ``axis`` (the last stage's outputs are ``psum``-broadcast so the
    caller's loss/readout needs no knowledge of stage placement).
    """
    n_stages = mesh.shape[axis]
    M = n_microbatches

    bspec = P(batch_axis) if batch_axis else P()
    in_specs = (stage_spec(staged_params), bspec)
    out_spec = bspec

    @jax.jit
    def run(staged, xb):
        def inner(local_stage, xl):
            # local_stage leaves: (1, layers_per_stage, …) — drop the unit
            # stage axis shard_map leaves in place.
            local = jax.tree_util.tree_map(lambda a: a[0], local_stage)
            stage_id = lax.axis_index(axis)
            B = xl.shape[0]
            if B % M:
                raise ValueError(f"batch {B} not divisible by {M} microbatches")
            mb = B // M
            micro = xl.reshape((M, mb) + xl.shape[1:])
            T = M + n_stages - 1
            # pad the injection stream to T ticks (ticks >= M inject zeros,
            # which only feed pipeline bubbles and never reach the output)
            pad = jnp.zeros((n_stages - 1,) + micro.shape[1:], micro.dtype)
            inject = jnp.concatenate([micro, pad], axis=0)

            def apply_stage(xm):
                def body(c, lp):
                    return block_fn(lp, c), None
                y, _ = lax.scan(body, xm, local)
                return y

            right = [(i, (i + 1) % n_stages) for i in range(n_stages)]

            def tick(carry, t):
                recv = carry
                x_in = jnp.where(stage_id == 0, inject[t], recv)
                y = apply_stage(x_in)
                sent = lax.ppermute(y, axis, right)
                # last stage's tick-t output is microbatch t-(S-1)
                out = jnp.where(stage_id == n_stages - 1, y,
                                jnp.zeros_like(y))
                return sent, out

            zero = jnp.zeros((mb,) + xl.shape[1:], xl.dtype)
            _, outs = lax.scan(tick, zero, jnp.arange(T))
            # keep the last M ticks (ticks 0..S-2 on the last stage are
            # bubbles), broadcast from the last stage to every pipe rank
            outs = outs[n_stages - 1:]
            outs = lax.psum(outs, axis)
            return outs.reshape(xl.shape)

        return shard_map(
            inner, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
            check_rep=False,
        )(staged, xb)

    return run(staged_params, x)


def make_pipeline_fn(block_fn, *, mesh: Mesh, n_microbatches: int,
                     axis: str = "pipe", batch_axis: str | None = None):
    """Partial of :func:`pipeline_apply` suitable for jit/grad closure."""

    def f(staged_params, x):
        return pipeline_apply(
            block_fn, staged_params, x, mesh=mesh,
            n_microbatches=n_microbatches, axis=axis, batch_axis=batch_axis)

    return f
