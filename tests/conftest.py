"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize force-registers the axon TPU backend before any
user code runs, so JAX_PLATFORMS cannot be overridden via env. Instead we set
XLA_FLAGS early (for the 8 virtual host devices) and pin jax's default device
to CPU — tests get full f32 precision and fast local compiles; sharding tests
build meshes from ``jax.devices('cpu')`` (SURVEY.md §4 item 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def cpu_devices(n=None):
    devs = jax.devices("cpu")
    return devs if n is None else devs[:n]


# -- fast/slow tiers (VERDICT r4 weak 3) -------------------------------------
# Everything measured >= ~5 s per call on the 4-vCPU dev host (pytest
# --durations run, round 5) is auto-marked slow here, centrally, so the fast
# tier stays a pre-commit habit:
#     pytest -q -m "not slow"      # ~3-4 min: oracles, quirks, unit coverage
#     pytest -q                    # full suite (~20 min): parity moments,
#                                  # multi-process smokes, convergence runs
# Keys are "<file>.py::<function>" (all params) or an exact node id with
# "[param]" (just that case). Explicit @pytest.mark.slow decorators in test
# files still work and take precedence trivially (double-marking is fine).
_SLOW_MEASURED = {
    "test_bitpack.py::test_packed_wire_matches_f32",
    "test_checkpoint.py::test_checkpoint_roundtrip_bit_exact",
    "test_checkpoint.py::test_fit_resume_from_checkpoint",
    "test_data.py::test_ml100k_ingest_matches_reference_semantics",
    "test_engine.py::test_training_losses_grad",
    "test_engine.py::test_training_losses_shapes_and_finite",
    "test_engine.py::test_update_lt_vectorized_matches_sequential_oracle",
    "test_fused_adamw.py::test_fused_matches_optax",
    "test_fused_adamw.py::test_trainer_fused_equals_optax",
    "test_lightgcn.py::test_dense_limit_crossover_pretrain",
    "test_lightgcn.py::test_dnn_lightgcn_sparse_adj_matches_dense",
    "test_lightgcn.py::test_pretrain_hybrid_matches_dense",
    "test_lightgcn.py::test_pretrain_sparse_matches_dense",
    "test_lightgcn.py::test_propagate_sparse_gradients_match_dense",
    "test_lightgcn.py::test_propagate_sparse_matches_dense",
    "test_models.py::test_backbone_forward_shapes[DNNOneHotTransformer]",
    "test_models.py::test_nt_xent_impls_agree",
    "test_multihost.py::test_two_process_distributed_smoke",
    "test_oh1_eval.py::test_oh1_eval_step_matches_numpy_oracle",
    "test_parity_reference.py::test_ablation_training_losses_moments_vs_reference",
    "test_parity_reference.py::test_dnnlightgcn_forward_parity_vs_reference_class",
    "test_parity_reference.py::test_eps_reweight_false_reference_hazard",
    "test_parity_reference.py::test_eps_training_losses_moments_vs_reference",
    "test_parity_reference.py::test_legacy_training_losses_moments_vs_reference",
    "test_parity_reference.py::test_sampling_noise_p_sample_moments_vs_reference",
    "test_parity_reference.py::test_user_guided_gate_parity_vs_reference",
    "test_prefetch.py::test_trainer_prefetch_equivalence",
    "test_round2_fixes.py::test_bf16_moments_train_matches_f32_quality",
    "test_round2_fixes.py::test_bf16_param_storage_trains",
    "test_round2_fixes.py::test_dnn_lightgcn_hybrid_sparse_adj_matches_dense",
    "test_round2_fixes.py::test_fit_resume_restores_best_metric",
    "test_round2_fixes.py::test_grad_clip_norm",
    "test_round2_fixes.py::test_tst_w_val_eval_keeps_partial_batch",
    "test_serve.py::test_recommend_excludes_history_and_handles_odd_sizes",
    "test_serve.py::test_recommend_from_checkpoint_roundtrip",
    "test_serve.py::test_serve_cli_demo_mode",
    "test_serve_http.py::test_daemon_sigterm_tears_down_fronts",
    "test_sharding.py::test_dryrun_multichip",
    "test_sharding.py::test_dryrun_smaller_meshes",
    "test_sharding.py::test_mesh_trainer_end_to_end",
    "test_sharding.py::test_mesh_trainer_step_matches_single_device",
    "test_sharding.py::test_sharded_forward_matches_single_device",
    "test_sharding.py::test_sharded_user_lookup_matches_replicated",
    "test_spmm.py::test_spmm_op_vjp_both_directions",
    "test_spmm.py::test_spmm_pallas_interpret",
    "test_train_smoke.py::test_fit_smoke",
    "test_train_smoke.py::test_fused_multi_step_equals_sequential",
    "test_train_smoke.py::test_host_dense_false_matches_dense_path",
    "test_train_smoke.py::test_loss_decreases",
    "test_train_smoke.py::test_train_epoch_with_steps_per_call",
    "test_train_smoke.py::test_tst_w_val_protocol",
    "test_utils.py::test_profiler_trace_writes_files",
    "test_multihost_fault.py::test_kill_one_host_then_resume",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.fspath.basename
        node = f"{fname}::{item.name}"
        base = node.split("[")[0]
        if node in _SLOW_MEASURED or base in _SLOW_MEASURED:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA:CPU segfaults inside backend_compile once the suite accumulates
    ~190 tests' worth of live compiled executables (reproduced twice at the
    same test, solo host, passes in any smaller prefix — cumulative state,
    not a single poisoning test). Dropping the jit/pjit caches between
    modules keeps the live-executable population bounded; cross-module
    compile reuse is minimal anyway (different shapes/configs)."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
