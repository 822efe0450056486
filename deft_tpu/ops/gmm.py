"""Grouped matmul (MoE expert dispatch) Pallas kernel.

``gmm(x, w, tile_eid)`` computes ``out[i] = x[i] @ w[expert_of_row(i)]``
for rows pre-sorted by expert and PADDED so that every ``tile_m``-row tile
belongs to exactly one expert (the dropless-MoE grouped-GEMM layout:
group r's rows start at a tile_m-aligned offset, pad rows carry zero
combine weight).  ``tile_eid[t]`` — a scalar-prefetch operand — names tile
t's expert, and the weight BlockSpec index_map selects that expert's
(tile_k, tile_f) weight tile directly, so expert weights stream from HBM
once per owning tile: FLOPs and weight IO scale with top-k, not with the
expert count, unlike the dense stacked-expert execution the decode path
keeps (models/llama.py _moe_mlp).

No reference counterpart (the reference has no MoE at all); this implements
SURVEY.md §7's "TPU-first" mandate for the Mixtral family's prefill, where
dense execution wastes NE/k x FLOPs over thousands of prompt tokens
(VERDICT r2 weak 4).

Supports optional per-output-channel int8 weight scales (w int8 +
``w_scale`` (NE, F) f32): the dequant multiply applies once to the final
k-accumulated tile, exactly like the XLA fused-dequant expression in
models/llama.mm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deft_tpu.ops.flatten_attn import _interpret


def _gmm_kernel(tile_eid_ref, x_ref, w_ref, o_ref, acc_ref, *, nk, scaled,
                sref=None):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[0].astype(x_ref.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        acc = acc_ref[...]
        if scaled:
            acc = acc * sref[0]
        o_ref[...] = acc.astype(o_ref.dtype)


def _gmm_scaled_kernel(tile_eid_ref, x_ref, w_ref, s_ref, o_ref, acc_ref,
                       *, nk):
    _gmm_kernel(tile_eid_ref, x_ref, w_ref, o_ref, acc_ref, nk=nk,
                scaled=True, sref=s_ref)


def gmm_eligible(M: int, E: int, F: int, tile_m: int = 128) -> bool:
    """Static-shape divisibility the kernel tiling needs."""
    tile_k = min(512, E)
    tile_f = min(512, F)
    return (M % tile_m == 0 and E % tile_k == 0 and F % tile_f == 0)


@functools.partial(jax.jit, static_argnames=("tile_m",))
def gmm(x: jnp.ndarray,          # (M, E) rows sorted+padded by expert
        w: jnp.ndarray,          # (NE, E, F)
        tile_eid: jnp.ndarray,   # (M // tile_m,) int32 expert per row tile
        w_scale: jnp.ndarray = None,  # (NE, F) f32 int8 dequant scales
        *, tile_m: int = 128) -> jnp.ndarray:
    M, E = x.shape
    NE, E2, F = w.shape
    assert E == E2, (E, E2)
    tile_k = min(512, E)
    tile_f = min(512, F)
    assert gmm_eligible(M, E, F, tile_m), (M, E, F, tile_m)
    nt, nf, nk = M // tile_m, F // tile_f, E // tile_k

    in_specs = [
        pl.BlockSpec((tile_m, tile_k), lambda t, f, k, eid: (t, k)),
        pl.BlockSpec((1, tile_k, tile_f),
                     lambda t, f, k, eid: (eid[t], k, f)),
    ]
    if w_scale is not None:
        kernel = functools.partial(_gmm_scaled_kernel, nk=nk)
        # (NE, 1, tile_f) blocks: Mosaic requires the last TWO block dims
        # to divide (8, 128) or equal the array dims — a (1, tile_f) block
        # over (NE, F) fails the sublane rule on real hardware
        in_specs.append(
            pl.BlockSpec((1, 1, tile_f), lambda t, f, k, eid: (eid[t], 0, f))
        )
        operands = (tile_eid, x, w, w_scale.reshape(NE, 1, F))
    else:
        kernel = functools.partial(_gmm_kernel, nk=nk, scaled=False)
        operands = (tile_eid, x, w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt, nf, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, tile_f),
                               lambda t, f, k, eid: (t, f)),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_f), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, F), x.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * E * F,
            bytes_accessed=(M * E + M * F) * x.dtype.itemsize
            + nt * E * F * w.dtype.itemsize,
            transcendentals=0,
        ),
    )(*operands)
