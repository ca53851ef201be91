"""GPipe-style pipeline parallelism for stacked-layer trunks.

The reference engine is single-device (SURVEY.md §2.8); this module adds
the pipeline axis of the classic TPU parallelism toolbox (dp / tp / sp /
pp) for models whose trunk is a sequence of IDENTICALLY-SHAPED stages —
exactly the shape the SAM3 scan trunk already has (4 uniform runs of
7 window layers + 1 global layer, weights stacked per layer).

When to use pp instead of dp: dp replicates the full weight set per chip
and has no bubble, so it wins whenever the weights fit in HBM. pp shards
the LAYERS over chips (each chip holds n_layers/P of the trunk), so it is
the axis that scales models LARGER than a chip's HBM; the price is the
pipeline bubble (P-1 of M+P-1 steps) and one activation ppermute per
stage step over ICI (~13 MB at SAM3 ViT-H scale — negligible next to the
~17 ms stage compute).

Design (single jitted program, no host round-trips):
  * stage weights live as pytrees whose leaves have a leading
    ``n_stages`` axis, sharded ``P("pp")`` — each chip materializes only
    its own stage's slice.
  * microbatches enter replicated; inside ``jax.shard_map`` every chip
    runs the same fori_loop of M + P - 1 steps. At step t, chip k runs
    its stage on the activation received from chip k-1 (stage 0 injects
    microbatch t); ``lax.ppermute`` rotates activations one stage
    forward. The last stage's outputs are collected into the result
    buffer and psum-broadcast once at the end.
  * warm-up/drain steps compute on zeros (the standard GPipe bubble);
    correctness never depends on them.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["stage_sharding", "pipeline_apply"]


def stage_sharding(mesh: Mesh, axis: str = "pp") -> NamedSharding:
    """Sharding for stage-stacked weights: leading (stage) axis over ``axis``."""
    return NamedSharding(mesh, P(axis))


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_weights: Any,
    xs: jax.Array,
    mesh: Mesh,
    axis: str = "pp",
):
    """Run ``xs`` (M microbatches, leading axis M) through ``n_stages``
    pipeline stages laid out over the mesh's ``axis``.

    ``stage_fn(weights_slice, x) -> y`` must preserve the activation
    shape/dtype (y feeds the next stage). ``stage_weights`` is a pytree
    whose leaves carry a leading ``n_stages`` axis equal to the mesh
    axis size; place them with :func:`stage_sharding` (replicated input
    works too — shard_map slices it). Returns the (M, ...) outputs,
    replicated, equal to applying the stages sequentially per microbatch.
    """
    if axis not in mesh.shape:
        raise ValueError(f"mesh has no '{axis}' axis: {dict(mesh.shape)}")
    n_stages = mesh.shape[axis]
    bad = [
        tuple(jnp.shape(leaf))
        for leaf in jax.tree_util.tree_leaves(stage_weights)
        if jnp.ndim(leaf) < 1 or jnp.shape(leaf)[0] != n_stages
    ]
    if bad:
        raise ValueError(
            f"stage_weights leaves need a leading n_stages={n_stages} axis; got {bad[:3]}"
        )
    m = xs.shape[0]
    if m < 1:
        raise ValueError("xs needs at least one microbatch")

    def body(w_local, xs_local):
        # shard_map hands each chip its (1, ...) stage slice
        w = jax.tree_util.tree_map(lambda a: a[0], w_local)
        k = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def step(t, carry):
            buf, outs = carry
            # stage 0 injects microbatch t (clamped during drain steps)
            inp = jnp.where(k == 0, xs_local[jnp.minimum(t, m - 1)], buf)
            y = stage_fn(w, inp)
            nxt = jax.lax.ppermute(y, axis, perm)
            # at step t the LAST stage finishes microbatch t - (P-1)
            j = t - (n_stages - 1)
            take = jnp.logical_and(j >= 0, k == n_stages - 1)
            jc = jnp.clip(j, 0, m - 1)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs,
                jnp.where(take, y, jax.lax.dynamic_index_in_dim(outs, jc, keepdims=False)),
                jc,
                axis=0,
            )
            return nxt, outs

        buf0 = jnp.zeros_like(xs_local[0])
        outs0 = jnp.zeros_like(xs_local)
        _, outs = jax.lax.fori_loop(0, m + n_stages - 1, step, (buf0, outs0))
        # results exist on the last stage only; one psum broadcasts them
        return jax.lax.psum(jnp.where(k == n_stages - 1, outs, jnp.zeros_like(outs)), axis)

    spec_w = jax.tree_util.tree_map(lambda _: P(axis), stage_weights)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_w, P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stage_weights, xs)
