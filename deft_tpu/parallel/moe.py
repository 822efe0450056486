"""Expert-parallel MoE dispatch under the mesh (grouped-matmul per chip).

Single-chip MoE prefill dispatches top-k through the grouped-matmul Pallas
kernel (ops/gmm.py) so FLOPs scale with k, not the expert count; under a
mesh that kernel is a pallas_call GSPMD cannot auto-shard, so round 3 fell
back to the dense stacked-expert einsums — NE/k x the FLOPs (ROADMAP r3,
VERDICT r3 missing item 4).  This module lifts that: the gmm dispatch runs
INSIDE shard_map over the full (dp, sp, tp) mesh,

- **sp = expert parallelism**: expert weights keep their stored sharding
  (param axis 1 over sp, parallel/sharding._widen_for_experts — the memory
  cut that fits Mixtral-scale expert stacks).  Each chip builds the grouped
  row layout for its OWN ne_local = NE/sp experts; routing slots owned by
  other chips scatter into a drop bucket (out-of-bounds scatter, exact
  zero contribution), and the top-k combine is the same psum the dense
  decode einsum's contraction produces.
- **dp shards tokens**: each dp shard routes and dispatches only its own
  row window (prefill rows are bucket-padded, so dp | n holds).
- **tp keeps the Megatron cut** of every expert's inner matmul dims
  (wg/wu column-parallel on I, wdown row-parallel), so per-chip gmm FLOPs
  are 2 * n/dp * min(k, ne_local) * E * I/tp  (worst-case-padded rows; the
  dense mesh path pays 2 * n * E * I * NE/(sp*tp) per chip).

Exactness: identical routing math to models/llama._moe_mlp (same
softmax/top-k/renormalize on replicated router weights), dropless — every
token's top-k experts execute on whichever chip owns them, pad/foreign
rows combine with weight 0.  Token equality is tested against the
single-device engine (tests/test_multichip.py).

No reference counterpart (the reference has no MoE and no parallelism,
SURVEY.md §2.6); this is SURVEY.md §7's TPU-first mandate composed with
mesh execution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from deft_tpu.models.llama import _GMM_TILE_M, _moe_mlp


def _axes(mesh: Mesh):
    return (mesh.shape.get("dp", 1), mesh.shape.get("sp", 1),
            mesh.shape.get("tp", 1))


def sharded_gmm_ok(mesh: Mesh, cfg, n: int) -> bool:
    """Static eligibility of the expert-parallel gmm dispatch for a token
    count n (python int at trace time — a compile-time branch)."""
    from deft_tpu.ops.gmm import gmm_eligible

    dp, sp, tp = _axes(mesh)
    NE, K = cfg.num_experts, cfg.experts_per_tok
    tm = _GMM_TILE_M
    if NE % sp or n % dp:
        return False
    ne_local = NE // sp
    cap = min(K, ne_local)
    # engage when the tile-padded local layout wastes <= ~50% rows
    # (mirrors the single-chip _moe_gmm_ok threshold)
    if (n // dp) * cap < 2 * ne_local * tm:
        return False
    E, I = cfg.hidden_size, cfg.intermediate_size
    if I % tp:
        return False
    return gmm_eligible(tm, E, I // tp, tm) and \
        gmm_eligible(tm, I // tp, E, tm)


def _moe_gmm_shard(cfg, h_l, wrt, wg_l, wu_l, wd_l, scales, act,
                   ne_local: int, cap: int):
    """One chip's dispatch: route the local token window, group rows by
    LOCAL expert (foreign slots -> drop bucket), run three grouped matmuls
    on the chip's expert/tp-slice, weighted scatter-add combine.  Returns
    the LOCAL partial (n_l, E) — callers psum over (sp, tp)."""
    from deft_tpu.ops.gmm import gmm

    NE, K = cfg.num_experts, cfg.experts_per_tok
    n_l, E = h_l.shape
    tm = _GMM_TILE_M
    nK = n_l * K
    # static worst-case local rows: every token contributes at most
    # min(K, ne_local) rows to this chip, each local group tile-aligns
    M_pad = -(-(n_l * cap + ne_local * (tm - 1)) // tm) * tm

    e0 = jax.lax.axis_index("sp").astype(jnp.int32) * ne_local
    logits = (h_l @ wrt.astype(h_l.dtype)).astype(jnp.float32)  # (n_l, NE)
    probs = jax.nn.softmax(logits, axis=-1)
    top_p, top_i = jax.lax.top_k(probs, K)
    top_w = top_p / jnp.sum(top_p, axis=-1, keepdims=True)

    flat_g = top_i.reshape(-1).astype(jnp.int32)      # global expert / slot
    flat_t = jnp.broadcast_to(
        jnp.arange(n_l, dtype=jnp.int32)[:, None], (n_l, K)
    ).reshape(-1)
    flat_w = top_w.reshape(-1).astype(jnp.float32)
    local = (flat_g >= e0) & (flat_g < e0 + ne_local)
    # foreign slots route to bucket ne_local, which sorts LAST and whose
    # rows scatter out of bounds (dropped)
    flat_e = jnp.where(local, flat_g - e0, ne_local)
    order = jnp.argsort(flat_e)                       # stable: token-major
    se = flat_e[order]
    g = jnp.bincount(flat_e, length=ne_local + 1)[:ne_local]
    gstart = jnp.cumsum(g) - g
    padded = -(-g // tm) * tm
    pstart = jnp.cumsum(padded) - padded
    sec = jnp.clip(se, 0, ne_local - 1)
    pos = pstart[sec] + jnp.arange(nK, dtype=jnp.int32) - gstart[sec]
    pos = jnp.where(se < ne_local, pos, M_pad).astype(jnp.int32)  # drop
    src = flat_t[order]
    row_src = jnp.zeros(M_pad, jnp.int32).at[pos].set(src, mode="drop")
    tok_pos = jnp.full(M_pad, n_l, jnp.int32).at[pos].set(src, mode="drop")
    w_pos = jnp.zeros(M_pad, jnp.float32).at[pos].set(
        flat_w[order], mode="drop")
    tile_eid = jnp.clip(
        jnp.searchsorted(pstart, jnp.arange(M_pad // tm, dtype=jnp.int32)
                         * tm, side="right") - 1,
        0, ne_local - 1,
    ).astype(jnp.int32)

    xs = h_l[row_src]                                 # (M_pad, E)
    sg, su, sd = scales
    gx = gmm(xs, wg_l, tile_eid, sg, tile_m=tm)
    ux = gmm(xs, wu_l, tile_eid, su, tile_m=tm)
    zx = act(gx.astype(jnp.float32)).astype(h_l.dtype) * ux
    yx = gmm(zx, wd_l, tile_eid, sd, tile_m=tm)

    out = jnp.zeros((n_l + 1, E), jnp.float32).at[tok_pos].add(
        yx.astype(jnp.float32) * w_pos[:, None]
    )
    return out[:n_l]


def make_sharded_moe(mesh: Mesh):
    """MoE impl for ModelRunner(mesh=...): expert-parallel gmm dispatch at
    prefill-scale token counts, the dense stacked-expert einsums (GSPMD-
    partitioned over the stored ep/tp sharding) at decode widths — the
    same compile-time size branch the single-chip path takes."""
    dp, sp, tp = _axes(mesh)

    def moe_fn(cfg, lp, h, act):
        n = h.shape[0]
        if not sharded_gmm_ok(mesh, cfg, n):
            return _moe_mlp(cfg, lp, h, act)
        NE = cfg.num_experts
        ne_local = NE // sp
        cap = min(cfg.experts_per_tok, ne_local)

        def scale_of(name):
            return lp.get(name + "_s", lp.get(name + "_sp"))

        have_scales = scale_of("wg") is not None

        def per_shard(h_l, wrt, wg_l, wu_l, wd_l, *scales):
            scales = scales if have_scales else (None, None, None)
            out = _moe_gmm_shard(
                cfg, h_l, wrt, wg_l, wu_l, wd_l,
                tuple(s.astype(jnp.float32) if s is not None else None
                      for s in scales),
                act, ne_local, cap,
            )
            return jax.lax.psum(out, ("sp", "tp"))

        in_specs = [
            P("dp", None),            # tokens
            P(),                      # router
            P("sp", None, "tp"),      # wg (ne, E, I)
            P("sp", None, "tp"),      # wu
            P("sp", "tp", None),      # wdown (ne, I, E)
        ]
        operands = [h, lp["wrt"], lp["wg"], lp["wu"], lp["wdown"]]
        if have_scales:
            # per-output-channel scales follow their weight's output axis
            in_specs += [P("sp", "tp"), P("sp", "tp"), P("sp", None)]
            operands += [scale_of("wg"), scale_of("wu"), scale_of("wdown")]
        out = jax.shard_map(
            per_shard,
            mesh=mesh,
            check_vma=False,  # pallas outputs carry no vma annotation
            in_specs=tuple(in_specs),
            out_specs=P("dp", None),
        )(*operands)
        return out.astype(h.dtype)

    return moe_fn
