"""Headline benchmark: DeFT-Flatten vs the FAIR sequential flash-decoding
baseline (in-kernel paged KV reads, ops/paged_seq_attn.py) on the reference's
few-shot workload shape (width 50, prompt 4000; /root/reference/README.md:214).

Budget-aware protocol (the driver's window is finite):
1. flatten mode   — the headline measurement runs first; its partial JSON
                    line prints immediately, so even a timeout mid-seq
                    leaves a parseable result.
2. kernel check   — compiled Pallas kernels vs an fp32 oracle on the real
                    backend; result lands in every JSON line (`kernel_check`).
3. seq mode       — skipped (gracefully, with a flatten-only headline) if the
                    remaining deadline budget is too small.
Each phase runs in a watchdogged child that heartbeats once jax backend
init completes; children wedged in init (the transport's observed failure
mode: all threads futex-waiting before any device contact) are killed after
INIT_TIMEOUT_S and retried cheaply instead of burning the phase timeout.
Final line (the headline):
    {"metric": "tpot_speedup_flatten_vs_seq", "value": N, "unit": "x",
     "vs_baseline": N / 1.32, ...}
vs_baseline compares against the reference GPU run's flatten-vs-seq TPOT
speedup on the same workload shape (1.32x, BASELINE.md few-shot w=50 p4000).
The seq baseline reads paged KV in-kernel exactly like the reference's
token_attention.py — not via a padded XLA gather (which would inflate the
speedup ~3x; see VERDICT.md round 1).

Robustness: each phase runs in its own subprocess with a watchdog + retry —
the device transport has occasionally wedged whole runs, and a fresh process
reliably recovers.  Do NOT enable the persistent jax compile cache here
(suspected in the wedges).

Model: Llama-3.2-3B shapes (BENCH_MODEL to override; "8b" + BENCH_WQ=int8
runs Llama-3.1-8B with int8 weights), random-init (no-egress environment).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

WIDTH = int(os.environ.get("BENCH_WIDTH", 50))
PROMPT_LEN = int(os.environ.get("BENCH_PROMPT_LEN", 4000))
GEN_LEN = int(os.environ.get("BENCH_GEN_LEN", 64))
MODEL = os.environ.get("BENCH_MODEL", "3b")
WEIGHT_DTYPE = os.environ.get("BENCH_WQ", "inherit")
KV_DTYPE = os.environ.get("BENCH_KV", "inherit")
BLOCK_LEN = int(os.environ.get("BENCH_BLOCK", 1024))  # dense-prefix trees:
# bigger flatten blocks amortize per-block fixed costs; 1024 + the plan's
# FULL-block sentinel measured 1.581 ms/step at the 8B bucket vs 2.144 at
# 512 (kernel_lab r5: full_b1024), ~25%% above the measured exp2+DMA floor.
# Deep-tree (long per-leaf suffix) shapes prefer 512 + the narrow-q window
# (deep_qw32_b512 2.088 vs deep_qw32_b1024 2.424) — the few-shot bench
# shape is dense-prefix.
MODE_TIMEOUT_S = int(os.environ.get("BENCH_MODE_TIMEOUT_S", 420))
INIT_TIMEOUT_S = int(os.environ.get("BENCH_INIT_TIMEOUT_S", 150))
DEADLINE_S = int(os.environ.get("BENCH_DEADLINE_S", 1200))
RETRIES = int(os.environ.get("BENCH_RETRIES", 1))
BASELINE_SPEEDUP = 1.32  # reference few-shot w50 p4000 (BASELINE.md)
_T0 = time.time()


def _left() -> float:
    return DEADLINE_S - (time.time() - _T0)


def kernel_check() -> str:
    """Compiled-kernel numerics vs an fp32 dense oracle on the real backend
    (small tree; covers paged flatten + paged seq).  Returns 'ok'/'fail:...'.
    The CPU test suite only exercises interpret mode; this is the proof the
    Mosaic-compiled kernels match (VERDICT.md round 1, 'what's weak' #5)."""
    import jax.numpy as jnp

    from deft_tpu.core import ReqToTokenPool, TokenKVPool, TreeCache
    from deft_tpu.ops.flatten_attn import fold_q, unfold_o
    from deft_tpu.ops.paged_flatten_attn import paged_flatten_attention
    from deft_tpu.ops.paged_seq_attn import paged_seq_attention
    from deft_tpu.plan import build_flatten_plan
    from deft_tpu.plan.seq import build_seq_plan

    rng = np.random.default_rng(0)
    Hq, Hkv, D = 8, 2, 128
    qpk = Hq // Hkv
    tree = TreeCache(TokenKVPool(8192), ReqToTokenPool(64, 4096))
    tree.init_prompt(list(range(700)))
    for i, c in enumerate(tree.branch(tree.root, 6)):
        c.append_token(50 + i)
    for _ in range(10):
        tree.alloc()
        for leaf in list(tree.leaves.values()):
            leaf.append_token(int(rng.integers(1, 400)))
    tree.alloc()
    S = tree.token_to_kv_pool.size
    k_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), jnp.float32)
    v_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), jnp.float32)
    kp = np.asarray(k_pool[0], np.float64).reshape(S, Hkv, D)
    vp = np.asarray(v_pool[0], np.float64).reshape(S, Hkv, D)
    scale = D ** -0.5

    fplan = build_flatten_plan(tree, q_per_kv=qpk, min_token_bucket=256)
    splan = build_seq_plan(tree, q_per_kv=qpk, min_token_bucket=256)
    if not (fplan.paged and splan.paged):
        return "fail: plans not seg-aligned"
    R = fplan.l_pad
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), jnp.float32)
    qn = np.asarray(q, np.float64)

    got_f = np.asarray(unfold_o(paged_flatten_attention(
        fold_q(q, Hkv), k_pool, v_pool, jnp.asarray(0, jnp.int32),
        jnp.asarray(fplan.seg_src), jnp.asarray(fplan.tok_lo),
        jnp.asarray(fplan.tok_hi), jnp.asarray(fplan.blk_lo),
        jnp.asarray(fplan.blk_hi), scale=scale, qpk=qpk,
        block_len=fplan.block_len, seg_len=fplan.seg_len), R))
    got_s = np.asarray(paged_seq_attention(
        q.reshape(R, Hkv, qpk, D), k_pool, v_pool, jnp.asarray(0, jnp.int32),
        jnp.asarray(splan.seg_src), jnp.asarray(splan.seg_off),
        jnp.asarray(splan.seg_live),
        jnp.asarray(splan.blk_live), scale=scale,
        block_len=splan.c_pad // (len(splan.blk_live) // splan.l_pad),
        seg_len=splan.seg_len).reshape(R, Hq, D))

    def oracle_err(t, q64, kpool, vpool, outs):
        """Worst relative error of each out array vs the per-leaf fp64
        dense-softmax oracle over the leaf's page-table path."""
        w = 0.0
        for leaf in t.leaves.values():
            qi = t.leaf_to_q[leaf.id]
            req = t.leaf_to_req[leaf.id]
            n = leaf.positions[-1] + 1
            path = t.req_to_token_pool.req_to_token[req, :n]
            for h in range(Hq):
                s = (q64[qi, h] @ kpool[path, h // qpk].T) * scale
                p = np.exp(s - s.max())
                want = (p / p.sum()) @ vpool[path, h // qpk]
                ref = max(np.abs(want).max(), 1e-9)
                w = max(w, *(np.abs(o[qi, h] - want).max() / ref
                             for o in outs))
        return w

    worst = oracle_err(tree, qn, kp, vp, (got_s, got_f))

    # offset-segment seq check: spec-decode trees put leaf KV runs at
    # arbitrary pool offsets; the plan covers them with ALIGNED segments +
    # in-segment live offsets (plan/seq.py seg_off) — verify the masking
    # on real hardware
    tree2 = TreeCache(TokenKVPool(8192), ReqToTokenPool(64, 4096))
    tree2.init_prompt(list(range(300)))
    for i, c in enumerate(tree2.branch(tree2.root, 8)):
        c.append_token(50 + i)
    tree2.alloc()
    for _ in range(2):
        leaves = list(tree2.leaves.values())
        kv0 = tree2.root.kv_len
        for i in range(2):
            tree2.merge_nodes(tree2.root, leaves[i], prune_b=False)
        diff = tree2.root.kv_len - kv0
        for leaf in leaves:
            tree2.reset_node_KV(leaf, diff)
        tree2.sync_page_table()
        tree2.alloc()
    splan2 = build_seq_plan(tree2, q_per_kv=qpk, min_token_bucket=256)
    if not (splan2.paged and (splan2.seg_off > 0).any()):
        return "fail: spec-shape seq plan not paged/offset"
    S2 = tree2.token_to_kv_pool.size
    k2 = jnp.asarray(rng.standard_normal((1, S2, Hkv * D)), jnp.float32)
    v2 = jnp.asarray(rng.standard_normal((1, S2, Hkv * D)), jnp.float32)
    R2 = splan2.l_pad
    q2 = jnp.asarray(rng.standard_normal((R2, Hq, D)), jnp.float32)
    got2 = np.asarray(paged_seq_attention(
        q2.reshape(R2, Hkv, qpk, D), k2, v2, jnp.asarray(0, jnp.int32),
        jnp.asarray(splan2.seg_src), jnp.asarray(splan2.seg_off),
        jnp.asarray(splan2.seg_live),
        jnp.asarray(splan2.blk_live), scale=scale,
        block_len=splan2.c_pad // (len(splan2.blk_live) // R2),
        seg_len=splan2.seg_len).reshape(R2, Hq, D))
    kp2 = np.asarray(k2[0], np.float64).reshape(S2, Hkv, D)
    vp2 = np.asarray(v2[0], np.float64).reshape(S2, Hkv, D)
    worst = max(worst, oracle_err(tree2, np.asarray(q2, np.float64),
                                  kp2, vp2, (got2,)))

    # int8-KV paged kernel (ops/paged_quant.py) on real hardware: quantize
    # the same pools per (token, head), run the dequant-in-kernel path, and
    # compare against the oracle over the DEQUANTIZED values — isolating
    # kernel correctness from quantization error (VERDICT r2 missing 2).
    # int8 plans require 128-token segments (scale-row DMA lane alignment),
    # which this tree's short leaf runs can't afford — check on a
    # longer-prompt tree where seg-128 padding fits the waste limit.
    from deft_tpu.ops.paged_quant import paged_flatten_attention_q

    tree_q = TreeCache(TokenKVPool(8192), ReqToTokenPool(64, 4096))
    tree_q.init_prompt(list(range(3000)))
    for i, c in enumerate(tree_q.branch(tree_q.root, 4)):
        c.append_token(50 + i)
    for _ in range(6):
        tree_q.alloc()
        for leaf in list(tree_q.leaves.values()):
            leaf.append_token(int(rng.integers(1, 400)))
    tree_q.alloc()
    fplan_q = build_flatten_plan(tree_q, q_per_kv=qpk, min_token_bucket=256,
                                 seg_len=(128,))
    if not (fplan_q.paged and fplan_q.seg_len == 128):
        return "fail: int8 plan not seg128-aligned"
    S_q = tree_q.token_to_kv_pool.size

    def quantize(x64):
        s = np.maximum(np.abs(x64).max(axis=-1) / 127.0, 1e-8)  # (S, Hkv)
        qv = np.clip(np.round(x64 / s[..., None]), -127, 127)
        return (jnp.asarray(qv.reshape(S_q, Hkv * D)[None], jnp.int8),
                jnp.asarray(s.T[None], jnp.float32),  # (1, Hkv, S)
                qv * s[..., None])                    # dequantized fp64

    k_q, k_s, kp_dq = quantize(
        rng.standard_normal((S_q, Hkv, D)))
    v_q, v_s, vp_dq = quantize(
        rng.standard_normal((S_q, Hkv, D)))
    R_q = fplan_q.l_pad
    q_q = jnp.asarray(rng.standard_normal((R_q, Hq, D)), jnp.float32)
    got_q = np.asarray(unfold_o(paged_flatten_attention_q(
        fold_q(q_q, Hkv), k_q, v_q, k_s, v_s, jnp.asarray(0, jnp.int32),
        jnp.asarray(fplan_q.seg_src), jnp.asarray(fplan_q.tok_lo),
        jnp.asarray(fplan_q.tok_hi), jnp.asarray(fplan_q.blk_lo),
        jnp.asarray(fplan_q.blk_hi), scale=scale, qpk=qpk,
        block_len=fplan_q.block_len, seg_len=fplan_q.seg_len), R_q))
    worst_q = oracle_err(tree_q, np.asarray(q_q, np.float64),
                         kp_dq, vp_dq, (got_q,))

    # TPU MXU multiplies fp32 operands through bf16 passes at default
    # precision, so ~5e-3 relative error vs a float64 oracle is the
    # hardware's fp32-matmul characteristic, not a kernel defect (interpret
    # mode on CPU, with true fp32 dots, lands < 2e-5 — tests/test_kernels).
    return (f"ok (rel_err={worst:.1e}, int8kv_rel_err={worst_q:.1e})"
            if worst < 2e-2 and worst_q < 2e-2
            else f"fail: rel_err={worst:.2e}, int8kv={worst_q:.2e}")


def run_mode(mode_name: str, model: str = None, weights: str = None,
             kv: str = None) -> dict:
    from deft_tpu.config import EngineConfig
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.models import PRESETS
    from deft_tpu.obs import PerfMetrics
    from deft_tpu.runtime import ModelRunner, mode_from_cli, tree_generate

    model = model or MODEL
    weights = weights or WEIGHT_DTYPE
    kv = kv or KV_DTYPE
    cfg = PRESETS[model]
    # chunked allocator reserves up to 2 chunks (128 slots) per leaf
    slots = PROMPT_LEN + WIDTH * (GEN_LEN + 8 + 256) + 1024
    from deft_tpu.config import AttentionConfig

    ecfg = EngineConfig(
        attention=AttentionConfig(block_len=BLOCK_LEN),
        kv_pool_slots=slots,
        max_requests=max(64, 2 * WIDTH),
        max_context_len=PROMPT_LEN + GEN_LEN + 64,
        weight_dtype=weights,
        kv_dtype=kv,
    )
    runner = ModelRunner(cfg, ecfg, kernels="auto", seed=0)
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(4, cfg.vocab_size - 4, PROMPT_LEN)]

    def gen():
        return tree_generate(
            model=runner,
            mode=mode_from_cli(mode_name),
            tokenizer=None,
            prompt_ids=prompt,
            max_seq_len=PROMPT_LEN + GEN_LEN,
            width=WIDTH,
            depth=1,
            branch_controller=Branch_Controller(workloads.simple_tree),
            perf_metrics=PerfMetrics(),
        )

    # warmup generation walks every jit shape bucket so the measured run is
    # steady-state (in-run recompiles otherwise dominate TPOT)
    gen()
    runner.reset_state()
    pm = gen()
    fwd = np.asarray(pm.forward_per_iter, dtype=np.float64)
    iters = np.asarray(pm.iter_time, dtype=np.float64)
    med = np.median(fwd)
    steady = fwd[fwd < 5 * med]  # drop residual recompile iterations
    return {
        "mode": mode_name,
        "tpot_ms": float(pm.TPOT),
        "steady_fwd_ms": float(steady.mean()),
        "iter_ms_median": float(np.median(iters)),
        "generated": int(pm.generated_len),
        "kv_io_bytes": float(pm.KV_IO),
        "e2e_ms": float(pm.e2e_latency),
        "ttft_ms": float(pm.TTFT),
        "attn_latency_ms": float(pm.attention_latency),
        # attention latency is the per-bucket compiled-microbench ESTIMATE
        # charged per iteration, not a per-step measurement
        "attn_is_estimate": bool(pm.attn_is_estimate),
    }


def _spawn_child(phase: str, timeout_s: float, model, weights, kv=None):
    """One watchdogged child attempt.  Returns (status, result_dict, err):
    status 'ok' | 'init-wedge' | 'fail'.  The child prints `#backend-up`
    to stderr the moment jax backend init completes; if that heartbeat
    doesn't appear within BENCH_INIT_TIMEOUT_S the child is killed early —
    the device transport occasionally wedges whole processes *at backend
    init* (all threads futex-waiting), and waiting out the full phase
    timeout on such a zombie wastes most of the deadline budget."""
    import tempfile

    env = dict(os.environ)
    env["BENCH_CHILD_PHASE"] = phase
    if model:
        env["BENCH_CHILD_MODEL"] = model
    if weights:
        env["BENCH_CHILD_WQ"] = weights
    if kv:
        env["BENCH_CHILD_KV"] = kv
    with tempfile.TemporaryFile("w+") as outf, \
            tempfile.TemporaryFile("w+") as errf:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env, stdout=outf, stderr=errf, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        deadline = time.time() + min(timeout_s, max(_left(), 30))
        init_deadline = time.time() + INIT_TIMEOUT_S
        backend_up, wedged, timed_out = False, False, False
        while proc.poll() is None:
            now = time.time()
            if not backend_up:
                errf.seek(0)
                backend_up = "#backend-up" in errf.read()
                if not backend_up and now > init_deadline:
                    proc.kill()
                    proc.wait()
                    wedged = True
                    break
            if now > deadline:
                proc.kill()
                proc.wait()
                timed_out = True
                break
            time.sleep(2)
        if wedged:
            return ("init-wedge", None,
                    f"backend init wedged (> {INIT_TIMEOUT_S}s)")
        if timed_out:
            return "fail", None, f"phase {phase} wedged (> {timeout_s}s)"
        outf.seek(0)
        for line in outf.read().splitlines():
            line = line.strip()
            if line.startswith("{"):
                return "ok", json.loads(line), None
        errf.seek(0)
        return ("fail", None,
                f"no result line (rc={proc.returncode}): "
                + errf.read()[-800:])


def run_child(phase: str, timeout_s: float, model: str = None,
              weights: str = None, max_wedges: int = None,
              kv: str = None) -> dict:
    """Run one phase in a watchdogged child process, retrying on wedge.
    Init wedges are killed after INIT_TIMEOUT_S and retried as long as the
    deadline allows (they are transport flakes, not code failures) up to
    max_wedges times (None = unlimited — used for the headline flatten
    phase, which should keep probing a down transport for the whole
    window); real failures/timeouts get RETRIES extra attempts."""
    last_err = None
    fails = wedges = 0
    while True:
        if _left() < 30:
            raise RuntimeError(f"deadline exhausted before {phase}: {last_err}")
        status, result, err = _spawn_child(phase, timeout_s, model, weights,
                                           kv)
        if status == "ok":
            return result
        last_err = err
        print(f"# {phase} attempt failed: {last_err}", file=sys.stderr)
        if status == "init-wedge":
            wedges += 1
            if (max_wedges is None or wedges < max_wedges) and \
                    _left() > INIT_TIMEOUT_S + 60:
                continue
            raise RuntimeError(f"bench phase {phase} failed: {last_err}")
        fails += 1
        if fails > RETRIES:
            raise RuntimeError(f"bench phase {phase} failed: {last_err}")


def main() -> int:
    phase = os.environ.get("BENCH_CHILD_PHASE")
    if phase:
        # heartbeat for the parent's init watchdog: backend init is the
        # step that wedges; everything after is bounded by the phase timeout
        import jax

        print(f"#backend-up {jax.default_backend()}", file=sys.stderr,
              flush=True)
    if phase == "kernel_check":
        print(json.dumps({"kernel_check": kernel_check()}))
        return 0
    if phase == "probe":
        # fresh-small-transfer round-trip: the transport's degraded mode
        # is a large FIXED cost per small transfer (healthy ~0.1 ms,
        # observed 30-300 ms degraded) — TPOT cells measured under it are
        # not comparable, so the parent annotates (and optionally waits)
        import jax
        import jax.numpy as jnp

        x = jnp.zeros((8,))
        jax.block_until_ready(x * 1)
        ts = []
        for i in range(10):
            t0 = time.time()
            b = jnp.asarray(np.full(512, i, np.int32))
            jax.block_until_ready(b)
            _ = np.asarray(b[:4])
            ts.append(time.time() - t0)
        print(json.dumps({"p50_ms": round(sorted(ts)[5] * 1e3, 2)}))
        return 0
    if phase:
        print(json.dumps(run_mode(
            phase,
            model=os.environ.get("BENCH_CHILD_MODEL"),
            weights=os.environ.get("BENCH_CHILD_WQ"),
            kv=os.environ.get("BENCH_CHILD_KV"),
        )))
        return 0

    info = {"width": WIDTH, "prompt_len": PROMPT_LEN, "gen_len": GEN_LEN,
            "model": MODEL, "weights": WEIGHT_DTYPE, "deadline_s": DEADLINE_S}
    print(f"# bench config: {info}", file=sys.stderr)

    # transport health: wait a bounded slice of the budget for a healthy
    # fresh-transfer RTT, then proceed regardless — every emitted JSON
    # line carries the measured transport_p50_ms so a degraded-link run
    # is never mistaken for a perf regression (BENCH_HEALTH_WAIT_S=0 to
    # skip waiting)
    health_wait = int(os.environ.get("BENCH_HEALTH_WAIT_S",
                                     max(0, DEADLINE_S // 4)))
    transport_p50 = None
    t_gate = time.time()
    while True:
        try:
            transport_p50 = run_child("probe", 120, max_wedges=2)["p50_ms"]
        except RuntimeError as e:
            print(f"# transport probe failed: {e}", file=sys.stderr)
            break
        print(f"# transport p50 {transport_p50} ms", file=sys.stderr)
        if transport_p50 < 15 or time.time() - t_gate > health_wait:
            break
        time.sleep(60)

    # flatten (the headline measurement) runs FIRST with unlimited cheap
    # wedge-probes: if the transport is down for part of the window, the
    # budget goes to capturing the number that matters
    flat = run_child("flatten", MODE_TIMEOUT_S)
    print(f"# flatten: {flat}", file=sys.stderr)

    try:
        kc = run_child("kernel_check", 240, max_wedges=2)["kernel_check"]
    except RuntimeError as e:
        kc = f"fail: {e}"
    print(f"# kernel_check: {kc} ({time.time() - _T0:.0f}s)", file=sys.stderr)
    # partial headline: parseable even if seq times out below
    print(json.dumps({
        "metric": "tpot_flatten_ms", "value": round(flat["tpot_ms"], 4),
        "unit": "ms/token", "vs_baseline": None, "kernel_check": kc,
        "transport_p50_ms": transport_p50,
    }))
    sys.stdout.flush()

    try:
        seq = run_child("seq", MODE_TIMEOUT_S)
    except RuntimeError as e:
        print(f"# seq skipped: {e}", file=sys.stderr)
        return 0
    print(f"# seq: {seq}", file=sys.stderr)

    speedup = seq["tpot_ms"] / flat["tpot_ms"]
    print(f"# wall {time.time()-_T0:.0f}s  TPOT speedup {speedup:.3f}x"
          f"  (tpot {seq['tpot_ms']:.3f} -> {flat['tpot_ms']:.3f} ms/tok;"
          f"  KV IO {seq['kv_io_bytes']:.3g} -> {flat['kv_io_bytes']:.3g} B)",
          file=sys.stderr)
    def headline(flat_r, seq_r, model, weights, sp):
        asp = (
            seq_r["attn_latency_ms"] / flat_r["attn_latency_ms"]
            if flat_r.get("attn_latency_ms") else None
        )
        return {
            "metric": "tpot_speedup_flatten_vs_seq",
            "value": round(sp, 4),
            "unit": "x",
            "vs_baseline": round(sp / BASELINE_SPEEDUP, 4),
            "kernel_check": kc,
            "tpot_flatten_ms": round(flat_r["tpot_ms"], 4),
            "tpot_seq_ms": round(seq_r["tpot_ms"], 4),
            "attn_speedup": round(asp, 4) if asp else None,
            "attn_is_estimate": bool(flat_r.get("attn_is_estimate")),
            "kv_io_reduction": round(
                1 - flat_r["kv_io_bytes"] / seq_r["kv_io_bytes"], 4
            ) if seq_r["kv_io_bytes"] else None,
            "ttft_ms": round(flat_r["ttft_ms"], 1)
            if flat_r.get("ttft_ms") else None,
            "model": model, "weights": weights,
            "width": WIDTH, "prompt_len": PROMPT_LEN, "gen_len": GEN_LEN,
            "transport_p50_ms": transport_p50,
        }

    print(json.dumps(headline(flat, seq, MODEL, WEIGHT_DTYPE, speedup)))
    sys.stdout.flush()

    # Apples-to-apples pass: the reference's headline model is Llama-3-8B
    # (BASELINE.md).  bf16 8B does not fit a 16 GB v5e, so weights are int8
    # (KV bf16, attention fp32).  Only attempted when the small-model
    # headline above is already safely printed and budget clearly remains;
    # if it lands, its line REPLACES the headline (drivers read the last
    # parseable line).
    if MODEL == "3b" and _left() > 450:
        try:
            flat8 = run_child("flatten", MODE_TIMEOUT_S, "8b", "int8")
            print(f"# 8b flatten: {flat8}", file=sys.stderr)
            seq8 = run_child("seq", MODE_TIMEOUT_S, "8b", "int8")
            print(f"# 8b seq: {seq8}", file=sys.stderr)
            sp8 = seq8["tpot_ms"] / flat8["tpot_ms"]
            print(f"# 8b wall {time.time()-_T0:.0f}s  TPOT speedup "
                  f"{sp8:.3f}x  ({seq8['tpot_ms']:.3f} -> "
                  f"{flat8['tpot_ms']:.3f} ms/tok)", file=sys.stderr)
            # int8-KV flatten TPOT (measured, not asserted: halved KV IO via
            # the dequant-in-kernel paged_quant path) — printed BEFORE the
            # 8B headline so the driver's last-line parse stays the headline
            if _left() > 300:
                try:
                    flat8kv = run_child("flatten", MODE_TIMEOUT_S, "8b",
                                        "int8", kv="int8")
                    print(f"# 8b int8-KV flatten: {flat8kv}", file=sys.stderr)
                    print(json.dumps({
                        "metric": "tpot_flatten_int8kv_ms",
                        "value": round(flat8kv["tpot_ms"], 4),
                        "unit": "ms/token",
                        "vs_baseline": None,
                        "kernel_check": kc,
                        "attn_is_estimate": bool(
                            flat8kv.get("attn_is_estimate")),
                        "kv_io_bytes": flat8kv["kv_io_bytes"],
                        "model": "8b", "weights": "int8", "kv": "int8",
                        "width": WIDTH, "prompt_len": PROMPT_LEN,
                        "gen_len": GEN_LEN,
                        "transport_p50_ms": transport_p50,
                    }))
                    sys.stdout.flush()
                except RuntimeError as e:
                    print(f"# 8b int8-KV pass skipped: {e}", file=sys.stderr)
            print(json.dumps(headline(flat8, seq8, "8b", "int8", sp8)))
        except RuntimeError as e:
            print(f"# 8b pass skipped: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
