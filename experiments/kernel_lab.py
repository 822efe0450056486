"""Flatten-kernel optimization lab: time paged-flatten variants at the
headline bench shape (8B attention geometry: Hkv=8, D=128, width 50 ->
Rq=256 folded rows, ~4.5k live tree tokens in 128-token blocks) on the
real TPU, amortized two-point timing over a 32-layer scan so tunnel
dispatch cancels (same trick as runner._measure_attention_bucket).

  python experiments/kernel_lab.py [variant ...]   (default: all)

Variants are registered in VARIANTS below; each is checked against the
production kernel's output before timing.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LAYERS = 32
HKV, D, QPK = 8, 128, 4
LEAVES = 64          # width 50 padded
RQ = LEAVES * QPK    # folded rows per kv head
PROMPT = 4400        # live tree tokens (prompt 4000 + tails)
T_PAD = 8192         # pow2 token bucket
SEG = 128


def build_case_q(block_len: int, rng):
    """int8 pools + per-(token, head) scales for the quant kernel (seg
    fixed at 128 — the int8 scale-DMA alignment requirement)."""
    case = build_case(block_len, rng)
    S = case["k_pool"].shape[1]
    kd = rng.integers(-127, 128, (LAYERS, S, HKV * D)).astype(np.int8)
    vd = rng.integers(-127, 128, (LAYERS, S, HKV * D)).astype(np.int8)
    ks = rng.uniform(0.01, 0.1, (LAYERS, HKV, S)).astype(np.float32)
    case.update(
        k_pool=jnp.asarray(kd), v_pool=jnp.asarray(vd),
        k_scale=jnp.asarray(ks), v_scale=jnp.asarray(ks),
    )
    return case


def v0_quant(q, kp, vp, li, case):
    from deft_tpu.ops.paged_quant import paged_flatten_attention_q

    return paged_flatten_attention_q(
        q, kp, vp, case["k_scale"], case["v_scale"], li,
        case["seg_src"], case["tok_lo"], case["tok_hi"],
        case["blk_lo"], case["blk_hi"], scale=D ** -0.5, qpk=QPK,
        block_len=case["block_len"], seg_len=128,
    )


def build_case(block_len: int, rng):
    """Synthetic bench-shape plan: one contiguous prompt run attended by
    all leaves + per-leaf 1-token tails, seg tables at `block_len`."""
    S = T_PAD + 2 * SEG
    k_pool = jnp.asarray(
        rng.standard_normal((LAYERS, S, HKV * D)) * 0.3, jnp.bfloat16)
    v_pool = jnp.asarray(
        rng.standard_normal((LAYERS, S, HKV * D)) * 0.3, jnp.bfloat16)
    # token metadata: prompt tokens [0, PROMPT) attended by all leaves;
    # the rest dead (pow2 bucket padding)
    tok_lo = np.full(T_PAD, 2**30, np.int32)
    tok_hi = np.zeros(T_PAD, np.int32)
    tok_lo[:PROMPT] = 0
    tok_hi[:PROMPT] = LEAVES
    # per-leaf tails: 2 tokens each, leaf r attends its own
    o = PROMPT
    for r in range(LEAVES):
        tok_lo[o:o + 2] = r
        tok_hi[o:o + 2] = r + 1
        o += 2
    nb = T_PAD // block_len
    blk_lo = tok_lo.reshape(nb, block_len).min(1)
    blk_hi = tok_hi.reshape(nb, block_len).max(1)
    nseg = block_len // SEG
    seg_src = (np.arange(nb * nseg, dtype=np.int32) * SEG) % (S - SEG)
    q = jnp.asarray(rng.standard_normal((HKV, RQ, D)) * 0.3, jnp.bfloat16)
    return dict(
        q=q, k_pool=k_pool, v_pool=v_pool,
        seg_src=jnp.asarray(seg_src), tok_lo=jnp.asarray(tok_lo),
        tok_hi=jnp.asarray(tok_hi), blk_lo=jnp.asarray(blk_lo),
        blk_hi=jnp.asarray(blk_hi), block_len=block_len,
        live_blocks=int((blk_lo < blk_hi).sum()),
    )


def time_step(fn, case, reps_lo=4, reps_hi=24):
    """ms per 32-layer attention step (two-point amortized)."""
    lis = jnp.arange(LAYERS, dtype=jnp.int32)

    @jax.jit
    def run(q, kp, vp, reps):
        def outer(_, acc):
            qi = (q.astype(jnp.float32) + acc * 1e-30).astype(q.dtype)

            def body(a, li):
                o = fn(qi, kp, vp, li, case)
                return a + o.astype(jnp.float32).sum(), None

            tot, _ = jax.lax.scan(body, jnp.float32(0.0), lis)
            return tot

        return jax.lax.fori_loop(0, reps, outer, jnp.float32(0.0))

    def t(reps, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(
                run(case["q"], case["k_pool"], case["v_pool"],
                    jnp.int32(reps)))
            best = min(best, time.perf_counter() - t0)
        return best

    t(reps_lo)  # compile
    lo = t(reps_lo)
    hi = t(reps_hi)
    return (hi - lo) / (reps_hi - reps_lo) * 1000


# -- variants -----------------------------------------------------------------

def v0_production(q, kp, vp, li, case):
    from deft_tpu.ops.paged_flatten_attn import paged_flatten_attention

    return paged_flatten_attention(
        q, kp, vp, li, case["seg_src"], case["tok_lo"], case["tok_hi"],
        case["blk_lo"], case["blk_hi"], scale=D ** -0.5, qpk=QPK,
        block_len=case["block_len"], seg_len=min(SEG, case["block_len"]),
    )


def _lab_kernel(
    li_ref, seg_src_ref, blk_lo_ref, blk_hi_ref,
    q_ref, k_pool_ref, v_pool_ref, lo_ref, hi_ref,
    o_ref, kbuf, vbuf, sem, qpad_ref, acc_ref, m_ref, l_ref,
    *, scale, qpk, block_len, seg_len, num_blocks, num_kv_heads, head_dim,
):
    """Variant B: pass-trimmed inner loop.
    - scale * log2(e) folded into q at init; exp -> exp2
    - single where: masked scores go to -1e30 once; p = exp2(s - m) with
      m clamped >= -1e5 so fully-masked rows still produce p = 0
    - m/l kept (Rq, 128) but only column 0 is stored (no broadcast pass)
    """
    from deft_tpu.ops.flatten_attn import head_pack

    _NEG = -1e30
    b = pl.program_id(0)
    li = li_ref[0]
    nseg = block_len // seg_len
    pack = head_pack(head_dim, num_kv_heads)
    gw = pack * head_dim
    Dh = head_dim

    def seg_copies(bb, slot):
        copies = []
        for j in range(nseg):
            src = pl.multiple_of(seg_src_ref[bb * nseg + j], seg_len)
            dst = pl.ds(j * seg_len, seg_len)
            copies.append(pltpu.make_async_copy(
                k_pool_ref.at[li, pl.ds(src, seg_len), :],
                kbuf.at[slot, dst, :], sem.at[slot, 0, j]))
            copies.append(pltpu.make_async_copy(
                v_pool_ref.at[li, pl.ds(src, seg_len), :],
                vbuf.at[slot, dst, :], sem.at[slot, 1, j]))
        return copies

    def live(bb):
        return blk_lo_ref[bb] < blk_hi_ref[bb]

    def issue(bb, slot):
        @pl.when(live(bb))
        def _():
            for c in seg_copies(bb, slot):
                c.start()

    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        rq = q_ref.shape[1]
        s2 = scale * 1.4426950408889634  # fold scale & log2(e) into q
        for h in range(num_kv_heads):
            i = h % pack
            parts = []
            if i:
                parts.append(jnp.zeros((rq, i * Dh), q_ref.dtype))
            parts.append((q_ref[h].astype(jnp.float32) * s2).astype(
                q_ref.dtype))
            if pack - 1 - i:
                parts.append(jnp.zeros((rq, (pack - 1 - i) * Dh),
                                       q_ref.dtype))
            qpad_ref[h] = (
                jnp.concatenate(parts, axis=1) if len(parts) > 1
                else parts[0]
            )
        issue(0, 0)

    @pl.when(b + 1 < num_blocks)
    def _prefetch():
        issue(b + 1, (b + 1) % 2)

    @pl.when(live(b))
    def _compute():
        slot = b % 2
        for c in seg_copies(b, slot):
            c.wait()
        rq = q_ref.shape[1]
        leaf = jax.lax.broadcasted_iota(jnp.int32, (rq, block_len), 0) // qpk
        mask = (lo_ref[...] <= leaf) & (leaf < hi_ref[...])
        for h in range(num_kv_heads):
            g = h // pack
            k2 = kbuf[slot, :, g * gw:(g + 1) * gw]
            s = jax.lax.dot_general(
                qpad_ref[h], k2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sm = jnp.where(mask, s, _NEG)
            m_prev = m_ref[h, :, :1]
            m_new = jnp.maximum(
                jnp.maximum(m_prev,
                            jnp.max(sm, axis=-1, keepdims=True)),
                -1e5,
            )
            p = jnp.exp2(sm - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            l_new = l_ref[h, :, :1] * alpha + jnp.sum(
                p, axis=-1, keepdims=True)
            v2 = vbuf[slot, :, g * gw:(g + 1) * gw]
            acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                p.astype(v2.dtype), v2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[h, :, :1] = m_new
            l_ref[h, :, :1] = l_new

    @pl.when(b == num_blocks - 1)
    def _finish():
        for h in range(num_kv_heads):
            i = h % pack
            l = l_ref[h, :, :1]
            o_ref[h] = (
                acc_ref[h, :, i * Dh:(i + 1) * Dh]
                / jnp.where(l == 0.0, 1.0, l)
            ).astype(o_ref.dtype)


from jax.experimental import pallas as pl            # noqa: E402
from jax.experimental.pallas import tpu as pltpu     # noqa: E402


@functools.partial(jax.jit, static_argnames=("block_len", "seg_len"))
def _lab_call(q, kp, vp, li, seg_src, tok_lo, tok_hi, blk_lo, blk_hi,
              *, block_len, seg_len):
    from deft_tpu.ops.flatten_attn import _interpret, head_pack

    Hkv, Rq, Dh = q.shape
    gw = head_pack(Dh, Hkv) * Dh
    T = tok_lo.shape[0]
    nb = T // block_len
    kernel = functools.partial(
        _lab_kernel, scale=Dh ** -0.5, qpk=QPK, block_len=block_len,
        seg_len=seg_len, num_blocks=nb, num_kv_heads=Hkv, head_dim=Dh,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Hkv, Rq, Dh), lambda b, *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, block_len), lambda b, *_: (0, b)),
            pl.BlockSpec((1, block_len), lambda b, *_: (0, b)),
        ],
        out_specs=pl.BlockSpec((Hkv, Rq, Dh), lambda b, *_: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, block_len, Hkv * Dh), kp.dtype),
            pltpu.VMEM((2, block_len, Hkv * Dh), vp.dtype),
            pltpu.SemaphoreType.DMA((2, 2, block_len // seg_len)),
            pltpu.VMEM((Hkv, Rq, gw), q.dtype),
            pltpu.VMEM((Hkv, Rq, gw), jnp.float32),
            pltpu.VMEM((Hkv, Rq, gw), jnp.float32),
            pltpu.VMEM((Hkv, Rq, gw), jnp.float32),
        ],
        )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, Rq, Dh), q.dtype),
        interpret=_interpret(),
    )(li.reshape(1).astype(jnp.int32), seg_src, blk_lo, blk_hi,
      q, kp, vp, tok_lo.reshape(1, T), tok_hi.reshape(1, T))


def vB_passes(q, kp, vp, li, case):
    return _lab_call(
        q, kp, vp, li, case["seg_src"], case["tok_lo"], case["tok_hi"],
        case["blk_lo"], case["blk_hi"],
        block_len=case["block_len"], seg_len=min(SEG, case["block_len"]),
    )


def _lab_kernel_fused(
    li_ref, seg_src_ref, blk_lo_ref, blk_hi_ref,
    q_ref, k_pool_ref, v_pool_ref, lo_ref, hi_ref,
    o_ref, kbuf, vbuf, sem, qbd_ref, acc_ref, m_ref, l_ref,
    *, scale, qpk, block_len, seg_len, num_blocks, num_kv_heads, head_dim,
):
    """Variant D: ALL heads' scores in one MXU dot + one fused vector-op
    set per block.  q is laid out BLOCK-DIAGONALLY — row h*Rq + r carries
    q[h, r] in lane slot h*D — so qbd @ kbuf^T computes every head's
    (Rq, BLOCK) score tile stacked into (Hkv*Rq, BLOCK): cross-head terms
    vanish against the zero padding, and the mask/max/exp2/sum passes run
    ONCE over the stacked tile instead of once per head.  PV stays
    per-head (block-diagonal acc would cost Hkv x the VMEM)."""
    _NEG = -1e30
    b = pl.program_id(0)
    li = li_ref[0]
    nseg = block_len // seg_len
    Hkv = num_kv_heads
    Dh = head_dim

    def seg_copies(bb, slot):
        copies = []
        for j in range(nseg):
            src = pl.multiple_of(seg_src_ref[bb * nseg + j], seg_len)
            dst = pl.ds(j * seg_len, seg_len)
            copies.append(pltpu.make_async_copy(
                k_pool_ref.at[li, pl.ds(src, seg_len), :],
                kbuf.at[slot, dst, :], sem.at[slot, 0, j]))
            copies.append(pltpu.make_async_copy(
                v_pool_ref.at[li, pl.ds(src, seg_len), :],
                vbuf.at[slot, dst, :], sem.at[slot, 1, j]))
        return copies

    def live(bb):
        return blk_lo_ref[bb] < blk_hi_ref[bb]

    def issue(bb, slot):
        @pl.when(live(bb))
        def _():
            for c in seg_copies(bb, slot):
                c.start()

    rq = q_ref.shape[1]

    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        s2 = scale * 1.4426950408889634
        for h in range(Hkv):
            row = jnp.concatenate(
                [(q_ref[h].astype(jnp.float32) * s2).astype(q_ref.dtype)
                 if g == h else jnp.zeros((rq, Dh), q_ref.dtype)
                 for g in range(Hkv)], axis=1)
            qbd_ref[h * rq:(h + 1) * rq, :] = row
        issue(0, 0)

    @pl.when(b + 1 < num_blocks)
    def _prefetch():
        issue(b + 1, (b + 1) % 2)

    @pl.when(live(b))
    def _compute():
        slot = b % 2
        for c in seg_copies(b, slot):
            c.wait()
        rows = Hkv * rq
        s = jax.lax.dot_general(
            qbd_ref[...], kbuf[slot], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Hkv*Rq, BLOCK)
        leaf = (jax.lax.broadcasted_iota(jnp.int32, (rows, block_len), 0)
                % rq) // qpk
        mask = (lo_ref[...] <= leaf) & (leaf < hi_ref[...])
        sm = jnp.where(mask, s, _NEG)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(
            jnp.maximum(m_prev, jnp.max(sm, axis=-1, keepdims=True)), -1e5)
        p = jnp.exp2(sm - m_new).astype(vbuf.dtype)
        alpha = jnp.exp2(m_prev - m_new)
        l_new = l_ref[:, :1] * alpha + jnp.sum(
            p.astype(jnp.float32), axis=-1, keepdims=True)
        for h in range(Hkv):
            r0, r1 = h * rq, (h + 1) * rq
            acc_ref[r0:r1] = acc_ref[r0:r1] * alpha[r0:r1] + \
                jax.lax.dot_general(
                    p[r0:r1], vbuf[slot, :, h * Dh:(h + 1) * Dh],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        m_ref[:, :1] = m_new
        l_ref[:, :1] = l_new

    @pl.when(b == num_blocks - 1)
    def _finish():
        for h in range(Hkv):
            r0, r1 = h * rq, (h + 1) * rq
            l = l_ref[r0:r1, :1]
            o_ref[h] = (
                acc_ref[r0:r1] / jnp.where(l == 0.0, 1.0, l)
            ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_len", "seg_len"))
def _lab_call_fused(q, kp, vp, li, seg_src, tok_lo, tok_hi, blk_lo, blk_hi,
                    *, block_len, seg_len):
    from deft_tpu.ops.flatten_attn import _interpret

    Hkv, Rq, Dh = q.shape
    T = tok_lo.shape[0]
    nb = T // block_len
    kernel = functools.partial(
        _lab_kernel_fused, scale=Dh ** -0.5, qpk=QPK, block_len=block_len,
        seg_len=seg_len, num_blocks=nb, num_kv_heads=Hkv, head_dim=Dh,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Hkv, Rq, Dh), lambda b, *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, block_len), lambda b, *_: (0, b)),
            pl.BlockSpec((1, block_len), lambda b, *_: (0, b)),
        ],
        out_specs=pl.BlockSpec((Hkv, Rq, Dh), lambda b, *_: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, block_len, Hkv * Dh), kp.dtype),
            pltpu.VMEM((2, block_len, Hkv * Dh), vp.dtype),
            pltpu.SemaphoreType.DMA((2, 2, block_len // seg_len)),
            pltpu.VMEM((Hkv * Rq, Hkv * Dh), q.dtype),
            pltpu.VMEM((Hkv * Rq, Dh), jnp.float32),
            pltpu.VMEM((Hkv * Rq, 128), jnp.float32),
            pltpu.VMEM((Hkv * Rq, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, Rq, Dh), q.dtype),
        interpret=_interpret(),
    )(li.reshape(1).astype(jnp.int32), seg_src, blk_lo, blk_hi,
      q, kp, vp, tok_lo.reshape(1, T), tok_hi.reshape(1, T))


def vD_fused(q, kp, vp, li, case):
    return _lab_call_fused(
        q, kp, vp, li, case["seg_src"], case["tok_lo"], case["tok_hi"],
        case["blk_lo"], case["blk_hi"],
        block_len=case["block_len"], seg_len=min(SEG, case["block_len"]),
    )


def build_case_deep(block_len: int, rng):
    """Deep-tree shape (long-context replay late state): the shared prefix
    is ~1/3 of live KV, per-leaf suffix runs of 96 tokens make up the rest
    — MOST blocks then serve a single leaf, the narrow-q window's target
    population (VERDICT r3 item 7)."""
    case = build_case(block_len, rng)
    tok_lo = np.full(T_PAD, 2**30, np.int32)
    tok_hi = np.zeros(T_PAD, np.int32)
    prefix = min(1536, T_PAD // 2)  # check mode trims T_PAD
    tok_lo[:prefix] = 0
    tok_hi[:prefix] = LEAVES
    o = prefix
    per_leaf = min(96, (T_PAD - prefix) // LEAVES)
    for r in range(LEAVES):
        tok_lo[o:o + per_leaf] = r
        tok_hi[o:o + per_leaf] = r + 1
        o += per_leaf
    nb = T_PAD // block_len
    blk_lo = tok_lo.reshape(nb, block_len).min(1)
    blk_hi = tok_hi.reshape(nb, block_len).max(1)
    case.update(
        tok_lo=jnp.asarray(tok_lo), tok_hi=jnp.asarray(tok_hi),
        blk_lo=jnp.asarray(blk_lo), blk_hi=jnp.asarray(blk_hi),
        live_blocks=int((blk_lo < blk_hi).sum()),
    )
    return case


def make_qwin_variant(qwin):
    def fn(q, kp, vp, li, case):
        from deft_tpu.ops.paged_flatten_attn import paged_flatten_attention

        return paged_flatten_attention(
            q, kp, vp, li, case["seg_src"], case["tok_lo"],
            case["tok_hi"], case["blk_lo"], case["blk_hi"],
            scale=D ** -0.5, qpk=QPK, block_len=case["block_len"],
            seg_len=min(SEG, case["block_len"]), qwin=qwin,
        )
    return fn


def make_qwin_variant_q(qwin, seg):
    def fn(q, kp, vp, li, case):
        from deft_tpu.ops.paged_quant import paged_flatten_attention_q

        # re-derive the seg table at this seg length: same linear address
        # coverage as the case's 128-token table (outputs stay comparable),
        # seg-aligned starts, fewer descriptors per block
        nb = case["tok_lo"].shape[0] // case["block_len"]
        nseg = case["block_len"] // seg
        seg_src = jnp.arange(nb * nseg, dtype=jnp.int32) * seg
        return paged_flatten_attention_q(
            q, kp, vp, case["k_scale"], case["v_scale"], li,
            seg_src, case["tok_lo"], case["tok_hi"],
            case["blk_lo"], case["blk_hi"], scale=D ** -0.5, qpk=QPK,
            block_len=case["block_len"], seg_len=seg, qwin=qwin,
        )
    return fn


def sentinel(builder):
    """Apply the plan's FULL-block sentinel (plan/flatten.py FULL_BLOCK_LO):
    blocks whose every token is live with interval [0, LEAVES) enable the
    kernels' mask-free fast path.  Exact: outputs must equal v0."""
    def build(block_len, rng):
        from deft_tpu.plan.flatten import FULL_BLOCK_LO

        case = builder(block_len, rng)
        nb = case["tok_lo"].shape[0] // block_len
        tl = np.asarray(case["tok_lo"]).reshape(nb, block_len)
        th = np.asarray(case["tok_hi"]).reshape(nb, block_len)
        full = (tl == 0).all(axis=1) & (th == LEAVES).all(axis=1)
        blk_lo = np.where(full, FULL_BLOCK_LO, np.asarray(case["blk_lo"]))
        case.update(blk_lo=jnp.asarray(blk_lo), full_blocks=int(full.sum()))
        return case
    build.__name__ = "sent_" + builder.__name__
    return build


def _lab2_kernel(
    li_ref, seg_src_ref, sub_lo_ref, sub_hi_ref,
    q_ref, k_pool_ref, v_pool_ref, lo_ref, hi_ref,
    o_ref, kbuf, vbuf, sem, qpad_ref, acc_ref, ml_ref,
    *, scale, qpk, prog_len, sub_len, seg_len, num_blocks, num_kv_heads,
    head_dim, tq,
):
    """Variant K2/TQ: ``prog_len`` tokens per grid program (one
    double-buffered DMA set per program — amortizes per-program fixed
    costs), with mask/full/dead dispatch at ``sub_len`` granularity inside
    the program (so big programs keep small-block skip granularity), and
    optional Rq-TILE skipping (``tq``): masked sub-blocks update only the
    q-row tiles intersecting [sub_lo, sub_hi) * qpk — the exact
    generalization of the narrow-q window to blocks serving mid-size leaf
    ranges.  All paths are exact (skipped tiles' updates are identities:
    interval masks send them to p=0)."""
    _NEG = -1e30
    b = pl.program_id(0)
    li = li_ref[0]
    nseg = prog_len // seg_len
    nsub = prog_len // sub_len
    from deft_tpu.ops.flatten_attn import head_pack

    pack = head_pack(head_dim, num_kv_heads)
    gw = pack * head_dim
    Dh = head_dim
    rq = q_ref.shape[1]

    def sub_live(bb, s):
        return sub_lo_ref[bb * nsub + s] < sub_hi_ref[bb * nsub + s]

    def any_live(bb):
        a = sub_live(bb, 0)
        for s in range(1, nsub):
            a = a | sub_live(bb, s)
        return a

    def seg_copies(bb, slot):
        copies = []
        for j in range(nseg):
            src = pl.multiple_of(seg_src_ref[bb * nseg + j], seg_len)
            dst = pl.ds(j * seg_len, seg_len)
            copies.append(pltpu.make_async_copy(
                k_pool_ref.at[li, pl.ds(src, seg_len), :],
                kbuf.at[slot, dst, :], sem.at[slot, 0, j]))
            copies.append(pltpu.make_async_copy(
                v_pool_ref.at[li, pl.ds(src, seg_len), :],
                vbuf.at[slot, dst, :], sem.at[slot, 1, j]))
        return copies

    def issue(bb, slot):
        @pl.when(any_live(bb))
        def _():
            for c in seg_copies(bb, slot):
                c.start()

    @pl.when(b == 0)
    def _init():
        lane = jax.lax.broadcasted_iota(jnp.int32, ml_ref.shape, 2)
        ml_ref[...] = jnp.where(lane == 0, _NEG, 0.0)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        s2 = scale * 1.4426950408889634
        for h in range(num_kv_heads):
            i = h % pack
            parts = []
            if i:
                parts.append(jnp.zeros((rq, i * Dh), q_ref.dtype))
            parts.append((q_ref[h].astype(jnp.float32) * s2).astype(
                q_ref.dtype))
            if pack - 1 - i:
                parts.append(jnp.zeros((rq, (pack - 1 - i) * Dh),
                                       q_ref.dtype))
            qpad_ref[h] = (
                jnp.concatenate(parts, axis=1) if len(parts) > 1
                else parts[0])
        issue(0, 0)

    @pl.when(b + 1 < num_blocks)
    def _prefetch():
        issue(b + 1, (b + 1) % 2)

    def update_heads(slot, s, r0, rw, masked=True):
        c0 = s * sub_len
        rs = pl.ds(r0, rw)
        if masked:
            leaf = (jax.lax.broadcasted_iota(jnp.int32, (rw, sub_len), 0)
                    + r0) // qpk
            lo = lo_ref[:, c0:c0 + sub_len]
            hi = hi_ref[:, c0:c0 + sub_len]
            mask = (lo <= leaf) & (leaf < hi)
        for h in range(num_kv_heads):
            g = h // pack
            k2 = kbuf[slot, c0:c0 + sub_len, g * gw:(g + 1) * gw]
            sdot = jax.lax.dot_general(
                qpad_ref[h, rs, :], k2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            sm = jnp.where(mask, sdot, _NEG) if masked else sdot
            m_prev = ml_ref[h, rs, :1]
            m_new = jnp.maximum(
                jnp.maximum(m_prev, jnp.max(sm, axis=-1, keepdims=True)),
                -1e5)
            p = jnp.exp2(sm - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            l_new = ml_ref[h, rs, 1:2] * alpha + jnp.sum(
                p, axis=-1, keepdims=True)
            v2 = vbuf[slot, c0:c0 + sub_len, g * gw:(g + 1) * gw]
            acc_ref[h, rs, :] = (acc_ref[h, rs, :] * alpha
                                 + jax.lax.dot_general(
                p.astype(v2.dtype), v2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            ml_ref[h, rs, :1] = m_new
            ml_ref[h, rs, 1:2] = l_new

    @pl.when(any_live(b))
    def _compute():
        slot = b % 2
        for c in seg_copies(b, slot):
            c.wait()
        for s in range(nsub):
            is_full = sub_lo_ref[b * nsub + s] < -(1 << 20)

            @pl.when(sub_live(b, s) & is_full)
            def _full(s=s):
                update_heads(slot, s, 0, rq, masked=False)

            if tq:
                ntile = rq // tq
                for t in range(ntile):
                    r0, r1 = t * tq, (t + 1) * tq
                    hit = ((sub_lo_ref[b * nsub + s] * qpk < r1)
                           & (sub_hi_ref[b * nsub + s] * qpk > r0))

                    @pl.when(sub_live(b, s) & ~is_full & hit)
                    def _tile(s=s, t=t):
                        update_heads(slot, s, t * tq, tq)
            else:
                @pl.when(sub_live(b, s) & ~is_full)
                def _masked(s=s):
                    update_heads(slot, s, 0, rq)

    @pl.when(b == num_blocks - 1)
    def _finish():
        for h in range(num_kv_heads):
            i = h % pack
            l = ml_ref[h, :, 1:2]
            o_ref[h] = (
                acc_ref[h, :, i * Dh:(i + 1) * Dh]
                / jnp.where(l == 0.0, 1.0, l)
            ).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("prog_len", "sub_len", "seg_len", "tq"))
def _lab2_call(q, kp, vp, li, seg_src, tok_lo, tok_hi, sub_lo, sub_hi,
               *, prog_len, sub_len, seg_len, tq):
    from deft_tpu.ops.flatten_attn import _interpret, head_pack

    Hkv, Rq, Dh = q.shape
    gw = head_pack(Dh, Hkv) * Dh
    T = tok_lo.shape[0]
    nb = T // prog_len
    kernel = functools.partial(
        _lab2_kernel, scale=Dh ** -0.5, qpk=QPK, prog_len=prog_len,
        sub_len=sub_len, seg_len=seg_len, num_blocks=nb, num_kv_heads=Hkv,
        head_dim=Dh, tq=tq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Hkv, Rq, Dh), lambda b, *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, prog_len), lambda b, *_: (0, b)),
            pl.BlockSpec((1, prog_len), lambda b, *_: (0, b)),
        ],
        out_specs=pl.BlockSpec((Hkv, Rq, Dh), lambda b, *_: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, prog_len, Hkv * Dh), kp.dtype),
            pltpu.VMEM((2, prog_len, Hkv * Dh), vp.dtype),
            pltpu.SemaphoreType.DMA((2, 2, prog_len // seg_len)),
            pltpu.VMEM((Hkv, Rq, gw), q.dtype),
            pltpu.VMEM((Hkv, Rq, gw), jnp.float32),
            pltpu.VMEM((Hkv, Rq, gw), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, Rq, Dh), q.dtype),
        interpret=_interpret(),
    )(li.reshape(1).astype(jnp.int32), seg_src, sub_lo, sub_hi,
      q, kp, vp, tok_lo.reshape(1, T), tok_hi.reshape(1, T))


def make_k2_variant(prog_len, sub_len, tq, sentinel_subs=True):
    """Run the case at prog_len-per-program with sub_len dispatch; derives
    sub-granular lo/hi (+ FULL sentinel) from the case's token arrays and a
    seg table over the whole span (case seg tables are SEG-aligned linear)."""
    def fn(q, kp, vp, li, case):
        from deft_tpu.plan.flatten import FULL_BLOCK_LO

        T = case["tok_lo"].shape[0]
        tl = np.asarray(case["tok_lo"]).reshape(-1, sub_len)
        th = np.asarray(case["tok_hi"]).reshape(-1, sub_len)
        sub_lo = tl.min(1)
        sub_hi = th.max(1)
        dead = ~(sub_lo < sub_hi)
        if sentinel_subs:
            full = (tl == 0).all(1) & (th == LEAVES).all(1)
            sub_lo = np.where(full & ~dead, FULL_BLOCK_LO, sub_lo)
        nseg = T // SEG
        seg_src = (np.arange(nseg, dtype=np.int32) * SEG) % (
            kp.shape[1] - SEG)
        return _lab2_call(
            q, kp, vp, li, jnp.asarray(seg_src), case["tok_lo"],
            case["tok_hi"], jnp.asarray(sub_lo), jnp.asarray(sub_hi),
            prog_len=prog_len, sub_len=sub_len, seg_len=SEG, tq=tq)
    return fn


def _probe_kernel(o_ref, buf, *, passes, rq, width):
    """VPU floor probe: `passes` exp2 sweeps over an (rq, width) f32 VMEM
    tile per grid step — isolates the transcendental throughput that bounds
    the exact flatten kernel's score math."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        buf[...] = jnp.full_like(buf, -0.5)

    acc = buf[...]
    for _ in range(passes):
        acc = jnp.exp2(acc * -0.9999)
    buf[...] = acc

    @pl.when(b == pl.num_programs(0) - 1)
    def _f():
        o_ref[0, :, :] = acc[:, : o_ref.shape[2]]


def make_exp2_probe(passes_per_block):
    """ms/step for JUST the exp2 passes the bench shape's live blocks do:
    live_blocks grid steps x (8 heads x 1 exp2 over (Rq, BLOCK))."""
    @functools.partial(jax.jit, static_argnames=("nb", "passes", "width"))
    def call(nb, passes, width):
        from deft_tpu.ops.flatten_attn import _interpret

        return pl.pallas_call(
            functools.partial(_probe_kernel, passes=passes, rq=RQ,
                              width=width),
            grid=(nb,),
            out_specs=pl.BlockSpec((1, RQ, D), lambda b: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, RQ, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((RQ, width), jnp.float32)],
            interpret=_interpret(),
        )()

    def fn(q, kp, vp, li, case):
        nb = max(1, case["live_blocks"])
        o = call(nb, passes_per_block, case["block_len"])
        return jnp.broadcast_to(o, (HKV, RQ, D)).astype(q.dtype)
    return fn


def build_case_probe(block_len, rng):
    return build_case(block_len, rng)


VARIANTS = {
    "v0_b128": (v0_production, 128, build_case),
    "vB_b128": (vB_passes, 128, build_case),
    "v0_b256": (v0_production, 256, build_case),
    "vB_b256": (vB_passes, 256, build_case),
    "v0_b512": (v0_production, 512, build_case),
    "vB_b512": (vB_passes, 512, build_case),
    "q_b256": (v0_quant, 256, build_case_q),
    "q_b512": (v0_quant, 512, build_case_q),
    "vD_b256": (vD_fused, 256, build_case),
    "vD_b512": (vD_fused, 512, build_case),
    # narrow-q window sweep (r4): bench shape and the deep-tree shape
    "qw0_b512": (make_qwin_variant(0), 512, build_case),
    "qw32_b512": (make_qwin_variant(32), 512, build_case),
    "qw64_b512": (make_qwin_variant(64), 512, build_case),
    "deep_qw0_b512": (make_qwin_variant(0), 512, build_case_deep),
    "deep_qw32_b512": (make_qwin_variant(32), 512, build_case_deep),
    "deep_qw64_b512": (make_qwin_variant(64), 512, build_case_deep),
    "deep_qw0_b256": (make_qwin_variant(0), 256, build_case_deep),
    "deep_qw32_b256": (make_qwin_variant(32), 256, build_case_deep),
    # int8 wide segments (r4, VERDICT weak 5): one 512-token DMA per block
    # vs four 128-token ones (seg tables in build_case* are k*SEG-aligned
    # because S-SEG is, so reusing them at seg 256/512 stays in-bounds)
    "q_b512_seg128_qw0": (make_qwin_variant_q(0, 128), 512, build_case_q),
    "q_b512_seg128_qw32": (make_qwin_variant_q(32, 128), 512, build_case_q),
    "q_b512_seg512_qw0": (make_qwin_variant_q(0, 512), 512, build_case_q),
    "q_b512_seg512_qw32": (make_qwin_variant_q(32, 512), 512, build_case_q),
    # mask-free FULL-block sentinel (r4): prompt blocks skip the mask build
    # + where pass; outputs must be bit-identical to the masked path
    "full_b512": (v0_production, 512, sentinel(build_case)),
    "full_b1024": (v0_production, 1024, sentinel(build_case)),
    "deep_full_b512": (make_qwin_variant(32), 512,
                       sentinel(build_case_deep)),
    "qfull_b512_seg512": (make_qwin_variant_q(32, 512), 512,
                          sentinel(build_case_q)),
    # bigger blocks alone (per-block fixed-cost amortization beyond b512)
    "v0_b1024": (v0_production, 1024, build_case),
    "deep_qw32_b1024": (make_qwin_variant(32), 1024, build_case_deep),
    # r5: two 512-token KV blocks per program (one DMA set + one program's
    # fixed costs per 1024 tokens, mask/full/dead dispatch still at 512) —
    # VERDICT r4 item 5 "two KV blocks per program"
    "k2_b1024s512": (make_k2_variant(1024, 512, 0), 1024, build_case),
    "k2_b2048s512": (make_k2_variant(2048, 512, 0), 2048, build_case),
    "deep_k2_b1024s512": (make_k2_variant(1024, 512, 0), 1024,
                          build_case_deep),
    # r5: Rq-tile skipping (VERDICT r4 item 5) — masked sub-blocks update
    # only leaf-interval-intersecting q tiles; exact by interval masking
    "tq64_b512s512": (make_k2_variant(512, 512, 64), 512, build_case),
    "deep_tq64_b512": (make_k2_variant(512, 512, 64), 512, build_case_deep),
    "deep_k2tq64_b1024": (make_k2_variant(1024, 512, 64), 1024,
                          build_case_deep),
    # r5: VPU transcendental floor — 8 exp2 passes (one per head) over an
    # (Rq, BLOCK) tile per live block, nothing else; pins the exact
    # kernel's score-math speed-of-light next to the DMA floor note
    "probe_exp2_b512": (make_exp2_probe(8), 512, build_case_probe),
}


def main():
    global LAYERS, PROMPT, T_PAD
    check_only = os.environ.get("DEFT_LAB_CHECK") == "1"
    if check_only:  # CPU interpret correctness pass on trimmed shapes
        LAYERS, PROMPT, T_PAD = 2, 600, 1024
    names = sys.argv[1:] or list(VARIANTS)
    cases = {}
    refs = {}
    for name in names:
        fn, bl, builder = VARIANTS[name]
        if bl > T_PAD:
            print(f"{name:10s} SKIP (block {bl} > T_PAD {T_PAD})",
                  flush=True)
            continue
        key = (builder.__name__, bl)
        if key not in cases:
            # fresh seed per case: cross-block-size outputs must compare
            cases[key] = builder(bl, np.random.default_rng(0))
        case = cases[key]
        try:
            out = np.asarray(
                fn(case["q"], case["k_pool"], case["v_pool"],
                   jnp.asarray(LAYERS - 1, jnp.int32), case))
            # sentinel cases must produce the same output as the
            # unsentineled builder (mask-free path is exact) -> share ref
            ref_out = refs.setdefault(
                builder.__name__.replace("sent_", ""), out)
            err = np.abs(out.astype(np.float64)
                         - ref_out.astype(np.float64)).max()
            ms = 0.0 if check_only else time_step(fn, case)
        except Exception as e:  # e.g. scoped-VMEM OOM on huge programs
            print(f"{name:10s} block={bl:4d} FAIL: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            continue
        print(f"{name:10s} block={bl:4d} live_blocks={case['live_blocks']:3d}"
              f"  {ms:7.3f} ms/step (32L)   max|diff vs v0|={err:.2e}",
              flush=True)
    # speed-of-light note
    live_kv = 2 * PROMPT * HKV * D * 2  # K+V bf16 bytes per layer
    print(f"# live KV {live_kv/1e6:.1f} MB/layer -> "
          f"{live_kv * LAYERS / 819e9 * 1e3:.2f} ms/step at 819 GB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
