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
        key = (builder.__name__, bl)
        if key not in cases:
            # fresh seed per case: cross-block-size outputs must compare
            cases[key] = builder(bl, np.random.default_rng(0))
        case = cases[key]
        out = np.asarray(
            fn(case["q"], case["k_pool"], case["v_pool"],
               jnp.asarray(LAYERS - 1, jnp.int32), case))
        # sentinel cases must produce the same output as the unsentineled
        # builder (mask-free path is exact) -> share its reference
        ref_out = refs.setdefault(builder.__name__.replace("sent_", ""), out)
        err = np.abs(out.astype(np.float64)
                     - ref_out.astype(np.float64)).max()
        ms = 0.0 if check_only else time_step(fn, case)
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
