"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: the standard JAX trick for testing SPMD without hardware)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft  # noqa: E402
from deft_tpu.parallel import make_mesh, shard_decode_args  # noqa: E402


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n)


def test_mesh_factoring():
    m = make_mesh(8, num_kv_heads=8)
    assert m.devices.size == 8
    assert set(m.axis_names) == {"dp", "sp", "tp"}
    m2 = make_mesh(4, num_kv_heads=2)  # tp capped by kv heads
    assert dict(zip(m2.axis_names, m2.devices.shape))["tp"] == 2


@pytest.mark.parametrize("wdt", ["inherit", "int8", "int8-pallas"])
def test_shard_params_covers_all_model_families(wdt):
    """param_shardings must have an entry for EVERY param a supported
    checkpoint can produce — Qwen2 biases, Qwen3 q/k norms, int8 scales
    (_s and _sp) — or mesh init crashes with a bare KeyError."""
    import dataclasses

    from deft_tpu.models import PRESETS
    from deft_tpu.models.loader import random_params
    from deft_tpu.parallel.sharding import shard_params

    cfg = dataclasses.replace(PRESETS["tiny"], qkv_bias=True, qk_norm=True)
    params = random_params(cfg, seed=0, weight_dtype=wdt)
    mesh = make_mesh(8, num_kv_heads=cfg.num_kv_heads)
    sharded = shard_params(mesh, params)
    assert set(sharded) == set(params)
    # MoE (Mixtral-family): expert tensors carry a leading expert axis and
    # a router appears; the specs must widen, not KeyError
    moe = dataclasses.replace(PRESETS["tiny"], num_experts=4)
    params = random_params(moe, seed=0, weight_dtype=wdt)
    sharded = shard_params(mesh, params)
    assert set(sharded) == set(params)
    assert sharded["wg"].shape == (moe.num_layers, 4, moe.hidden_size,
                                   moe.intermediate_size)
    # expert parallelism: the expert axis shards over sp when it divides
    if mesh.shape["sp"] > 1 and moe.num_experts % mesh.shape["sp"] == 0:
        assert sharded["wg"].sharding.spec[1] == "sp"


def test_sharded_step_matches_single_device():
    """The 8-way (dp, sp, tp)-sharded decode step must produce the same
    logits as the unsharded one."""
    import dataclasses

    from deft_tpu.models.config import LlamaConfig
    from deft_tpu.models.llama import decode_forward
    from deft_tpu.runtime import ForwardMode

    cfg = LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_layers=2, num_q_heads=8, num_kv_heads=8, head_dim=32,
        max_position_embeddings=1024,
    )
    runner = graft._make_runner(cfg, kernels="xla", slots=2048)
    runner.dtype  # touch
    batch = graft._decode_batch(runner, n_leaves=8, prompt_len=48)
    attn = runner._attn_fn(ForwardMode.TREE_DECODE_FLATTEN)
    rope = runner._rope_apply

    def step(params, k_pool, v_pool, batch):
        logits, *_ = decode_forward(
            cfg, params, rope, k_pool, v_pool, batch, attn
        )
        return logits

    # compare against the UNFUSED single-device math: the mesh path splits
    # fused wqkv/wgu back (shard_params), and bf16 rounding differs between
    # fused and unfused GEMM blockings (fused==unfused is separately
    # asserted at fp32 in test_e2e.test_fused_params_match_unfused)
    from deft_tpu.models.loader import unfuse_params

    ref_params = unfuse_params(runner.params)
    want = jax.jit(step)(ref_params, runner.k_pool, runner.v_pool, batch)

    mesh = make_mesh(8, num_kv_heads=cfg.num_kv_heads)
    params, k_pool, v_pool, sbatch = shard_decode_args(
        mesh, ref_params, runner.k_pool, runner.v_pool, batch
    )
    with mesh:
        got = jax.jit(step)(params, k_pool, v_pool, sbatch)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-4, atol=2e-4,
    )


def test_sharded_flatten_kernel_matches_oracle():
    """(sp, tp)-sharded Pallas flatten kernel + cross-chip LSE merge must be
    exact vs the dense oracle (8-device CPU mesh, interpret-mode kernels)."""
    import numpy as np
    from jax.sharding import Mesh

    from deft_tpu.ops.dense_oracle import dense_tree_attention
    from deft_tpu.ops.flatten_attn import fold_q, unfold_o
    from deft_tpu.ops.sharded_flatten import flatten_attention_sharded

    rng = np.random.default_rng(11)
    R, Hq, Hkv, D, T = 16, 8, 4, 64, 1024  # T/sp=512, divisible by 128
    block_len = 128
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("sp", "tp"))

    q = jnp.asarray(rng.standard_normal((R, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, Hkv, D)), jnp.float32)
    # DFS-ish intervals over a chain of segments
    lo = np.full(T, 2**30, np.int32)
    hi = np.zeros(T, np.int32)
    lo[: T // 2] = 0
    hi[: T // 2] = R
    for r in range(R):
        s = T // 2 + r * (T // 2 // R)
        lo[s : s + T // 2 // R] = r
        hi[s : s + T // 2 // R] = r + 1
    nb = T // block_len
    blk_lo = lo.reshape(nb, block_len).min(1)
    blk_hi = hi.reshape(nb, block_len).max(1)
    scale = D**-0.5

    want = dense_tree_attention(q, k, v, jnp.asarray(lo), jnp.asarray(hi), scale)
    with mesh:
        got = unfold_o(
            flatten_attention_sharded(
                mesh,
                fold_q(q, Hkv),
                jnp.swapaxes(k, 0, 1),
                jnp.swapaxes(v, 0, 1),
                jnp.asarray(lo), jnp.asarray(hi),
                jnp.asarray(blk_lo), jnp.asarray(blk_hi),
                scale=scale, qpk=Hq // Hkv, block_len=block_len,
                out_dtype=jnp.float32,
            ),
            R,
        )
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 2e-5, err


def test_sharded_engine_generation_matches_single_device():
    """tree_generate over a ModelRunner(mesh=...) — GSPMD matmuls +
    shard_map'ed Pallas flatten per chip with cross-chip LSE merge — must
    produce token-identical generations to the single-device engine
    (the multi-chip analog of test_cross_mode_equivalence)."""
    from deft_tpu.config import EngineConfig
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.models import PRESETS
    from deft_tpu.runtime import ForwardMode, ModelRunner, tree_generate

    ecfg = EngineConfig(
        kv_pool_slots=1024, max_requests=16, max_context_len=128,
        min_token_bucket=128, dtype="float32",
    )
    prompt = list(range(7, 27))

    def gen(mesh, kernels, mode=ForwardMode.TREE_DECODE_FLATTEN):
        runner = ModelRunner(PRESETS["tiny"], ecfg, kernels=kernels, seed=3,
                             mesh=mesh)
        tree_generate(
            runner, mode, None, prompt, max_seq_len=32, width=3, depth=0,
            branch_controller=Branch_Controller(workloads.simple_tree),
        )
        return [tuple(s.token_ids) for s in runner.tree.all_finished_seqs]

    want = gen(None, "xla")
    assert len(want) == 3
    mesh = make_mesh(8, num_kv_heads=PRESETS["tiny"].num_kv_heads)
    assert mesh.shape["tp"] > 1 and mesh.shape["dp"] * mesh.shape["sp"] > 1
    got_pallas = gen(mesh, "pallas")  # shard_map Pallas flatten path
    assert got_pallas == want
    got_xla = gen(mesh, "xla")  # GSPMD-partitioned XLA attention path
    assert got_xla == want
    # sequential baseline mode under the mesh (GSPMD path)
    got_seq = gen(mesh, "pallas", mode=ForwardMode.DECODE)
    assert got_seq == want


@pytest.mark.parametrize("mode_name", ["TREE_DECODE_FLATTEN", "DECODE"])
@pytest.mark.parametrize("shape", [None, (2, 2, 2)])
@pytest.mark.parametrize("kv", ["inherit", "int8"])
def test_sharded_paged_dma_kernel_matches_single_device(mode_name, shape,
                                                        kv):
    """The in-kernel DMA paged kernels must run PER CHIP under the mesh
    (flatten via parallel/engine.py paged branch, seq via
    parallel/seq_engine.py) and match single-device logits — the
    exactly-once-KV-IO flagship property generalized multi-chip (VERDICT r2
    item 1), including the int8-KV dequant variants (both sides quantize
    identically, so tokens AND probs must agree).  shape=(2,2,2) exercises
    dp>1 (leaf-window shifted block skip).  A long prompt keeps the
    seg-alignment waste under the plan's limit so the plan is genuinely
    paged — asserted, not assumed (int8 plans accept only 128-token
    segments, hence the longer prompt there)."""
    import numpy as np

    from deft_tpu.config import EngineConfig
    from deft_tpu.models import PRESETS
    from deft_tpu.runtime import ForwardMode, ModelRunner

    if kv == "int8" and shape == (2, 2, 2):
        pytest.skip("dp window logic is kv-dtype independent; covered above")
    mode = ForwardMode[mode_name]
    prompt_len = 1600 if kv == "int8" else 400
    ecfg = EngineConfig(
        kv_pool_slots=8192, max_requests=16, max_context_len=2048,
        min_token_bucket=128, dtype="float32", kv_dtype=kv,
    )

    def run(mesh, kernels):
        runner = ModelRunner(PRESETS["tiny"], ecfg, kernels=kernels, seed=0,
                             mesh=mesh)
        tree = runner.tree
        tree.init_prompt([7 + (i % 97) for i in range(prompt_len)])
        for i, c in enumerate(tree.branch(tree.root, 5)):
            c.append_token(100 + i)
        tree.alloc()
        plan = runner.build_plan(mode)
        paged = runner._use_paged(mode, plan)
        view, _ = runner.forward_tree_decode(mode, plan)
        return paged, np.asarray(view.ids[:5]), np.asarray(view.vals[:5])

    # int8 reference runs the PALLAS single-chip dequant kernel (the XLA
    # backend's dequant-gather differs only in rounding, but exact token
    # equality needs the same kernel math on both sides)
    ref_kernels = "pallas" if kv == "int8" else "xla"
    p1, ids1, vals1 = run(None, ref_kernels)
    if kv == "int8":
        assert p1, "single-chip int8 plan must be seg128-aligned here"
    mesh = make_mesh(8, num_kv_heads=PRESETS["tiny"].num_kv_heads,
                     shape=shape)
    if shape == (2, 2, 2):
        assert mesh.shape["dp"] == 2
    paged, ids2, vals2 = run(mesh, "pallas")
    assert paged, "plan must be segment-aligned in this scenario"
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_allclose(vals1, vals2, rtol=1e-4, atol=1e-6)


def test_sharded_moe_generation_matches_single_device():
    """Mixtral-family MoE under the mesh: the stacked expert einsums are
    GSPMD-partitioned over tp (every expert's intermediate dim sharded) and
    must generate token-identically to the single-device MoE engine."""
    import dataclasses

    from deft_tpu.config import EngineConfig
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.models import PRESETS
    from deft_tpu.runtime import ForwardMode, ModelRunner, tree_generate

    moe_cfg = dataclasses.replace(PRESETS["tiny"], num_experts=4,
                                  experts_per_tok=2)
    ecfg = EngineConfig(
        kv_pool_slots=1024, max_requests=16, max_context_len=128,
        min_token_bucket=128, dtype="float32",
    )
    prompt = list(range(7, 27))

    def gen(mesh):
        runner = ModelRunner(moe_cfg, ecfg, kernels="xla", seed=3, mesh=mesh)
        tree_generate(
            runner, ForwardMode.TREE_DECODE_FLATTEN, None, prompt,
            max_seq_len=32, width=3, depth=0,
            branch_controller=Branch_Controller(workloads.simple_tree),
        )
        return [tuple(s.token_ids) for s in runner.tree.all_finished_seqs]

    want = gen(None)
    assert len(want) == 3
    got = gen(make_mesh(8, num_kv_heads=moe_cfg.num_kv_heads))
    assert got == want


def test_sharded_moe_gmm_prefill_generation_matches_single_device():
    """MoE generation with a prefill long enough to ENGAGE the
    expert-parallel grouped-matmul dispatch (parallel/moe.py) inside the
    scanned layer body — token equality vs the single-device engine, whose
    prefill takes the single-chip gmm path (VERDICT r3 item 5)."""
    import dataclasses

    from deft_tpu.config import EngineConfig
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.models import PRESETS
    from deft_tpu.parallel.moe import sharded_gmm_ok
    from deft_tpu.runtime import ForwardMode, ModelRunner, tree_generate

    moe_cfg = dataclasses.replace(PRESETS["tiny"], num_experts=4,
                                  experts_per_tok=2)
    ecfg = EngineConfig(
        kv_pool_slots=2048, max_requests=16, max_context_len=640,
        min_token_bucket=128, dtype="float32",
    )
    prompt = [7 + (i % 401) for i in range(512)]

    def gen(mesh, kernels):
        runner = ModelRunner(moe_cfg, ecfg, kernels=kernels, seed=3,
                             mesh=mesh)
        if mesh is not None and kernels == "pallas":
            assert callable(runner._moe_gmm)
            # the 512-token prefill engages the sharded gmm branch
            assert sharded_gmm_ok(mesh, moe_cfg, 512)
        tree_generate(
            runner, ForwardMode.TREE_DECODE_FLATTEN, None, prompt,
            max_seq_len=524, width=3, depth=0,
            branch_controller=Branch_Controller(workloads.simple_tree),
        )
        return [tuple(s.token_ids) for s in runner.tree.all_finished_seqs]

    want = gen(None, "xla")
    assert len(want) == 3
    mesh = make_mesh(8, num_kv_heads=moe_cfg.num_kv_heads, shape=(2, 2, 2))
    assert gen(mesh, "pallas") == want   # sharded gmm prefill dispatch
    assert gen(None, "pallas") == want   # single-chip gmm prefill dispatch


def test_sharded_deferred_replay_matches_single_device():
    """The deferred-select chain (branch tokens gathered on device) must
    also hold under the 8-device mesh: sharded ToT replay == unsharded."""
    from deft_tpu.config import EngineConfig
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.data.loader import ExecuteTree, ExecuteTreeNode
    from deft_tpu.models import PRESETS
    from deft_tpu.runtime import ForwardMode, ModelRunner, tree_generate

    ecfg = EngineConfig(
        kv_pool_slots=1024, max_requests=16, max_context_len=128,
        min_token_bucket=128, dtype="float32",
    )
    prompt = list(range(7, 27))

    def make_template():
        root = ExecuteTreeNode(0, value=1, start_offset=0, end_offset=0)
        n1 = ExecuteTreeNode(1, value=2, start_offset=0, end_offset=2)
        n2 = ExecuteTreeNode(2, value=8, start_offset=0, end_offset=8)
        n3 = ExecuteTreeNode(3, value=8, start_offset=2, end_offset=8)
        n4 = ExecuteTreeNode(4, value=8, start_offset=2, end_offset=8)
        root.children = [n1, n2]
        n1.children = [n3, n4]
        return ExecuteTree(root, [root, n1, n2, n3, n4])

    def gen(mesh):
        runner = ModelRunner(PRESETS["tiny"], ecfg, kernels="pallas", seed=3,
                             mesh=mesh)
        tree_generate(
            runner, ForwardMode.TREE_DECODE_FLATTEN, None, prompt,
            max_seq_len=32, width=2, depth=2,
            branch_controller=Branch_Controller(workloads.practical_tree),
            tree_template=make_template(),
        )
        return sorted(tuple(s.token_ids) for s in runner.tree.all_finished_seqs)

    want = gen(None)
    assert len(want) == 3
    mesh = make_mesh(8, num_kv_heads=PRESETS["tiny"].num_kv_heads)
    assert gen(mesh) == want


@pytest.mark.parametrize("shape", [(1, 1, 8), (2, 2, 2)])
def test_8b_shape_sharded_step_lowers(shape):
    """Lowering check at FLAGSHIP shapes (VERDICT r2 weak 6): the sharded
    decode step — tp-sharded params/pools + the paged shard_map attention —
    must lower and compile with Llama-3.1-8B head/hidden dims (layers and
    vocab trimmed; abstract ShapeDtypeStruct args, so no 8B weights are
    materialized on CPU).  Catches GSPMD sharding mismatches the tiny
    preset's dims cannot."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from deft_tpu.models.config import PRESETS
    from deft_tpu.models.llama import DecodeBatch, decode_forward
    from deft_tpu.models.loader import _param_shapes
    from deft_tpu.models.rope import apply_rope, rope_table
    from deft_tpu.parallel.engine import make_sharded_tree_attn
    from deft_tpu.parallel.sharding import param_shardings, pool_sharding

    cfg = dataclasses.replace(PRESETS["8b"], num_layers=2, vocab_size=32256)
    mesh = make_mesh(8, num_kv_heads=cfg.num_kv_heads, shape=shape)
    ps = param_shardings(mesh)
    params = {
        name: jax.ShapeDtypeStruct(shp, jnp.bfloat16, sharding=ps[name])
        for name, shp in _param_shapes(cfg).items()
    }
    S = 8192
    pool = jax.ShapeDtypeStruct(
        (cfg.num_layers, S, cfg.num_kv_heads * cfg.head_dim), jnp.bfloat16,
        sharding=pool_sharding(mesh))
    from deft_tpu.models.llama import KVPool
    k_pool, v_pool = KVPool(pool), KVPool(pool)

    R, T, B = 64, 4096, 32  # bench-scale bucket: width ~50, prompt ~4000
    block_len = T // B
    seg_len = 128
    rep = NamedSharding(mesh, P())
    i32 = lambda *shp: jax.ShapeDtypeStruct(shp, jnp.int32, sharding=rep)
    batch = DecodeBatch(
        q_tokens=i32(R), q_pos=i32(R), out_loc=i32(R),
        kv_idx=i32(1), tok_lo=i32(T), tok_hi=i32(T),
        blk_lo=i32(B), blk_hi=i32(B),
        seg_src=i32(B * (block_len // seg_len)),
    )
    tbl = rope_table(cfg.head_dim, 8192, cfg.rope_theta, cfg.rope_scaling,
                     orig_max_pos=cfg.max_position_embeddings)
    rope = lambda x, pos: apply_rope(x, pos, tbl)
    attn = make_sharded_tree_attn(mesh, paged=True)

    def step(params, k_pool, v_pool, batch):
        logits, *_ = decode_forward(cfg, params, rope, k_pool, v_pool,
                                    batch, attn)
        return logits

    with mesh:
        jax.jit(step).lower(params, k_pool, v_pool, batch).compile()


def test_mesh_attention_microbench_produces_estimate():
    """measure_attention is no longer excluded under meshes (VERDICT r2
    missing 4): the per-bucket microbench must jit the SHARDED attention
    from this process and produce a finite estimate, so sharded dumps get
    real attention-latency fields instead of zeros."""
    from deft_tpu.config import EngineConfig
    from deft_tpu.models import PRESETS
    from deft_tpu.runtime import ForwardMode, ModelRunner

    ecfg = EngineConfig(
        kv_pool_slots=1024, max_requests=16, max_context_len=256,
        min_token_bucket=128, dtype="float32",
    )
    mesh = make_mesh(8, num_kv_heads=PRESETS["tiny"].num_kv_heads)
    runner = ModelRunner(PRESETS["tiny"], ecfg, kernels="pallas", seed=0,
                         mesh=mesh, measure_attention=True)
    tree = runner.tree
    tree.init_prompt(list(range(5, 55)))
    for i, c in enumerate(tree.branch(tree.root, 3)):
        c.append_token(100 + i)
    tree.alloc()
    plan = runner.build_plan(ForwardMode.TREE_DECODE_FLATTEN)
    runner.forward_tree_decode(ForwardMode.TREE_DECODE_FLATTEN, plan)
    est = runner.last_attn_estimate
    assert est is not None
    store_s, attn_s = est
    assert 0.0 <= store_s < 60 and 0.0 <= attn_s < 60


def test_entry_compiles_single_chip():
    """__graft_entry__.entry() must lower+compile on the current backend."""
    fn, args = graft.entry()
    jax.jit(fn).lower(*args).compile()


def test_multihost_helpers_single_process():
    """init_runtime is a no-op without a launcher config; pod mesh spans
    the (virtual) device set; rank-0 gating holds."""
    from deft_tpu.parallel import init_runtime, is_primary, make_pod_mesh

    assert init_runtime() is False  # single process: stays local
    assert is_primary()
    m = make_pod_mesh(num_kv_heads=8)
    import numpy as np
    assert int(np.prod(list(m.shape.values()))) == 8
    assert tuple(m.axis_names) == ("dp", "sp", "tp")


def test_cli_mesh_flag_runs_sharded():
    """--mesh DPxSPxTP drives a short sharded generation end-to-end."""
    from deft_tpu.cli.run import main

    rc = main([
        "--random-model", "tiny", "--mode", "flatten",
        "--Branch_controller", "Simple_Tree", "--max_width", "2",
        "--max_seq_len", "20", "--mesh", "2x2x2", "--kernels", "pallas",
    ])
    assert rc == 0
