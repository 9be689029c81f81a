"""Behavioral parity vs the ACTUAL reference classes (not mirrors).

These tests import ``/root/reference`` at runtime through
``benchmarks/reference_runner.load_reference`` (documented runtime repairs
only — the pure-torch GCNConv shim, identity ``.cuda``) and compare:

  * the flagship ``DNNOneHotEmbeddingGCN`` forward at IDENTICAL weights
    (exact, deterministic) — ref models/DNN.py:1105-1327;
  * ``GaussianDiffusion`` (legacy) ``p_sample`` at identical weights
    (exact — the CatOneHot=False reverse loop is deterministic when
    sampling_noise=False) — ref gaussian_diffusion.py:161-230;
  * ``GaussianDiffusion`` ``training_losses`` first-draw MOMENTS (torch and
    JAX RNG streams differ by design; the uniform-phase loss distribution
    must agree) — ref gaussian_diffusion.py:275-394;
  * ``GaussianDiffusionAblation`` ``training_losses`` moments at identical
    flagship weights — ref gaussian_diffusion.py:1460-1607.

All tests are CPU (conftest pins jax_default_device) and slow-marked.
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gdmcf_tpu.config import Config
from gdmcf_tpu.diffusion.engine import Diffusion, LtState, MeanType
from gdmcf_tpu.models.registry import build_model

pytestmark = pytest.mark.slow

N_USER, N_ITEM, B, D = 24, 40, 8, 12


@pytest.fixture(scope="module")
def ref():
    from benchmarks.reference_runner import load_reference

    return load_reference()


def _t(x):
    return torch.tensor(np.asarray(x))


def build_flagship_pair(ref, seed=0, noise_type=0, user_guided=1):
    """Our flagship + the reference's own class with OUR weights copied in."""
    gd, rdnn, _ = ref
    import argparse

    ns = argparse.Namespace(noise_type=noise_type, gcnLayerNum=2,
                            user_guided=user_guided)
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[D], emb_size=10,
                 steps=5, noise_scale=0.01, noise_type=noise_type,
                 user_guided=user_guided)
    jmodel = build_model(cfg, N_USER, N_ITEM)
    params = jmodel.init(jax.random.PRNGKey(seed))

    tmodel = rdnn.DNNOneHotEmbeddingGCN(
        [N_ITEM, D], [D, N_ITEM], 10, time_type="cat", norm=False,
        item_num=N_ITEM, user_num=N_USER, args=ns)
    tmodel.eval()
    with torch.no_grad():
        tmodel.emb_layer.weight.copy_(_t(params["emb_layer"]["w"]).T)
        tmodel.emb_layer.bias.copy_(_t(params["emb_layer"]["b"]))
        tmodel.in_layers[0].weight.copy_(_t(params["in_layers"][0]["w"]).T)
        tmodel.in_layers[0].bias.copy_(_t(params["in_layers"][0]["b"]))
        tmodel.in_layers2[0].weight.copy_(_t(params["in_layers2"][0]["w"]).T)
        tmodel.in_layers2[0].bias.copy_(_t(params["in_layers2"][0]["b"]))
        tmodel.embedding_item.weight.copy_(_t(params["embedding_item"]))
        tmodel.embedding_user.weight.copy_(_t(params["embedding_user"]))
        tmodel.gcn_model.conv1.lin.weight.copy_(
            _t(params["gcn"]["conv1"]["w"]).T)
        tmodel.gcn_model.conv1.bias.copy_(_t(params["gcn"]["conv1"]["b"]))
        tmodel.gcn_model.conv2.lin.weight.copy_(
            _t(params["gcn"]["conv2"]["w"]).T)
        tmodel.gcn_model.conv2.bias.copy_(_t(params["gcn"]["conv2"]["b"]))
        tmodel.sumW.copy_(_t(params["sumW"]))
    return cfg, jmodel, params, tmodel, ns


def test_flagship_forward_parity_vs_reference_class(ref):
    """Exact forward agreement with the reference's own flagship module —
    towers, NT-Xent, GCNConv stack, sumW blend, cosine head."""
    cfg, jmodel, params, tmodel, _ = build_flagship_pair(ref)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, N_ITEM)).astype(np.float32)
    x0 = (rng.random((B, N_ITEM)) < 0.3).astype(np.float32)
    keep = (rng.random((B, N_ITEM)) < 0.5).astype(np.float32)
    c1 = x0 * keep
    x_U = np.stack([1.0 - c1, c1], axis=-1).astype(np.float32)
    ts = rng.integers(0, 5, B)
    index = np.arange(B)

    j_out, j_closs = jmodel.apply(
        params, jnp.asarray(x), jnp.asarray(ts), jnp.asarray(x_U),
        index=jnp.asarray(index), graph=jnp.asarray(x_U),
        rcloss=True, train=False, rng=None)
    with torch.no_grad():
        t_out, t_closs = tmodel(_t(x), _t(ts), _t(x_U), index=_t(index),
                                graph=_t(x_U).long(), RCloss=True)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=3e-4, atol=3e-5)
    assert abs(float(j_closs) - float(t_closs)) < 1e-4


class _LinModel(torch.nn.Module):
    def __init__(self, w):
        super().__init__()
        self.w = torch.nn.Parameter(torch.tensor(w))

    def forward(self, x, t, *a, **kw):
        return torch.tanh(x @ self.w)


def _lin_apply(w):
    wj = jnp.asarray(w)

    def apply(params, x, ts, x_U=None, index=None, graph=None, rcloss=False,
              train=True, rng=None):
        return jnp.tanh(x @ wj), None

    return apply


LEGACY_RECIPE = dict(noise_schedule="linear-var", noise_scale=0.01,
                     noise_min=0.001, noise_max=0.01, steps=5)


def _legacy_pair(ref):
    gd, _, _ = ref
    diff_t = gd.GaussianDiffusion(
        gd.ModelMeanType.START_X, LEGACY_RECIPE["noise_schedule"],
        LEGACY_RECIPE["noise_scale"], LEGACY_RECIPE["noise_min"],
        LEGACY_RECIPE["noise_max"], LEGACY_RECIPE["steps"],
        torch.device("cpu"), CatOneHot=False)
    cfg = Config(backbone="DNN", dims=[D], emb_size=10, OneHotMatrix=0,
                 mean_type="x0", **LEGACY_RECIPE)
    diff_j = Diffusion.create(cfg, index_in=False, variant="legacy")
    return diff_t, diff_j, cfg


def test_legacy_p_sample_exact_vs_reference(ref):
    """CatOneHot=False legacy reverse loop with sampling_noise=False is
    deterministic — outputs must agree exactly at identical model weights
    (ref gaussian_diffusion.py:186-230 vs engine legacy_step scan)."""
    diff_t, diff_j, _ = _legacy_pair(ref)
    rng = np.random.default_rng(2)
    w = (rng.standard_normal((N_ITEM, N_ITEM)) * 0.05).astype(np.float32)
    x0 = (rng.random((64, N_ITEM)) < 0.25).astype(np.float32)

    with torch.no_grad():
        out_t = diff_t.p_sample(_LinModel(w), _t(x0), 0, False)
    out_j = diff_j.p_sample(_lin_apply(w), None, jnp.asarray(x0),
                            jnp.arange(64), jax.random.PRNGKey(0),
                            sampling_steps=0, sampling_noise=False)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_legacy_training_losses_moments_vs_reference(ref):
    """Uniform-phase per-example loss distribution must agree (mean within
    2%, std within 10%) across frameworks at identical weights. Fresh
    diffusion state per draw keeps both sides in the uniform-pt phase."""
    gd, _, _ = ref
    _, diff_j, cfg = _legacy_pair(ref)
    rng = np.random.default_rng(3)
    w = (rng.standard_normal((N_ITEM, N_ITEM)) * 0.05).astype(np.float32)
    x0 = (rng.random((128, N_ITEM)) < 0.25).astype(np.float32)
    model_t = _LinModel(w)
    apply_j = _lin_apply(w)
    draws = 40

    torch.manual_seed(0)
    t_losses = []
    for _ in range(draws):
        diff_t, _, _ = _legacy_pair(ref)
        with torch.no_grad():
            terms = diff_t.training_losses(model_t, _t(x0), True)
        t_losses.append(terms["loss"].numpy())
    t_all = np.concatenate(t_losses)

    j_losses = []
    for d in range(draws):
        lt = LtState.create(cfg.steps)
        loss, _, _ = diff_j.training_losses(
            apply_j, None, jnp.asarray(x0), jnp.arange(128),
            jax.random.PRNGKey(d), lt, reweight=True, train=False)
        j_losses.append(np.asarray(loss))
    j_all = np.concatenate(j_losses)

    np.testing.assert_allclose(j_all.mean(), t_all.mean(), rtol=0.02)
    np.testing.assert_allclose(j_all.std(), t_all.std(), rtol=0.10)


def test_ablation_training_losses_moments_vs_reference(ref):
    """GaussianDiffusionAblation (clean-input training, discrete-channel
    graph) at identical flagship weights: first-draw loss moments agree."""
    gd, _, _ = ref
    cfg_f, jmodel, params, tmodel, ns = build_flagship_pair(ref)
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[D], emb_size=10,
                 mean_type="x0", OneHotMatrix=2,
                 diffusion_variant="ablation", **LEGACY_RECIPE)
    diff_j = Diffusion.create(cfg, index_in=True, variant="ablation")
    rng = np.random.default_rng(4)
    x0 = (rng.random((B, N_ITEM)) < 0.25).astype(np.float32)
    index = np.arange(B)
    draws = 50

    torch.manual_seed(0)
    t_means = []
    for _ in range(draws):
        diff_t = gd.GaussianDiffusionAblation(
            gd.ModelMeanType.START_X, LEGACY_RECIPE["noise_schedule"],
            LEGACY_RECIPE["noise_scale"], LEGACY_RECIPE["noise_min"],
            LEGACY_RECIPE["noise_max"], LEGACY_RECIPE["steps"],
            torch.device("cpu"), discrete=0.9995, CatOneHot=True,
            epps=0.0, args=ns)
        diff_t.indexIn = True
        with torch.no_grad():
            terms = diff_t.training_losses(tmodel, _t(x0), True,
                                           index=_t(index))
        t_means.append(float(terms["loss"].mean()))

    j_means = []
    for d in range(draws):
        lt = LtState.create(cfg.steps)
        loss, _, _ = diff_j.training_losses(
            jmodel.apply, params, jnp.asarray(x0), jnp.asarray(index),
            jax.random.PRNGKey(d), lt, reweight=True, train=False)
        j_means.append(float(loss.mean()))

    np.testing.assert_allclose(np.mean(j_means), np.mean(t_means), rtol=0.05)


@pytest.mark.parametrize("noise_type", [1, 2])
def test_flagship_noise_type_routing_parity(ref, noise_type):
    """Ablation flag routing (ref DNN.py:1236-1259): noise_type=1 feeds the
    (sliced flat) one-hot into tower 1, noise_type=2 feeds [x‖x] into tower 2,
    and both zero the NT-Xent term. Exact forward agreement at identical
    weights, plus the closs-zeroing contract."""
    cfg, jmodel, params, tmodel, _ = build_flagship_pair(
        ref, noise_type=noise_type)
    rng = np.random.default_rng(10 + noise_type)
    x = rng.standard_normal((B, N_ITEM)).astype(np.float32)
    x0 = (rng.random((B, N_ITEM)) < 0.3).astype(np.float32)
    keep = (rng.random((B, N_ITEM)) < 0.5).astype(np.float32)
    c1 = x0 * keep
    x_U = np.stack([1.0 - c1, c1], axis=-1).astype(np.float32)
    ts = rng.integers(0, 5, B)
    index = np.arange(B)

    j_out, j_closs = jmodel.apply(
        params, jnp.asarray(x), jnp.asarray(ts), jnp.asarray(x_U),
        index=jnp.asarray(index), graph=jnp.asarray(x_U),
        rcloss=True, train=False, rng=None)
    with torch.no_grad():
        t_out, t_closs = tmodel(_t(x), _t(ts), _t(x_U), index=_t(index),
                                graph=_t(x_U).long(), RCloss=True)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=3e-4, atol=3e-5)
    # closs *= 0 on both sides when noise_type != 0 (ref DNN.py:1257-1259)
    assert float(j_closs) == 0.0
    assert float(t_closs) == 0.0


def _discrete_pair(ref, cfg, ns):
    """Reference GaussianDiffusionDiscrete + our Diffusion on one recipe."""
    gd, _, _ = ref
    mt = (gd.ModelMeanType.START_X if cfg.mean_type == "x0"
          else gd.ModelMeanType.EPSILON)
    diff_t = gd.GaussianDiffusionDiscrete(
        mt, cfg.noise_schedule, cfg.noise_scale,
        cfg.noise_min, cfg.noise_max, cfg.steps, torch.device("cpu"),
        discrete=cfg.discrete, CatOneHot=True, epps=0.0, args=ns)
    diff_t.indexIn = True
    diff_j = Diffusion.create(cfg, index_in=True)
    return diff_t, diff_j


class _GraphProbeModel(torch.nn.Module):
    """Denoiser stub whose output READS the synthetic graph — the live
    flagship's scores are provably graph-independent (directed conv: user
    rows see only self-loops, quirk 6), so gate semantics must be probed
    with a model that consumes the graph."""

    def forward(self, x, t, x_tU=None, index=None, graph=None, RCloss=False):
        return x + 0.1 * graph[..., 1].float()


def _graph_probe_apply(params, x, ts, x_U=None, index=None, graph=None,
                       rcloss=False, train=True, rng=None):
    return x + 0.1 * graph[..., 1].astype(x.dtype), None


def _p_sample_draws(ref, user_guided, sampling_noise, draws=40, seed=7,
                    probe=False):
    """Score-matrix draws from BOTH sides' p_sample at identical weights and
    fixed inputs (torch/JAX RNG streams differ by design — the comparison is
    distributional). ``probe=True`` swaps the flagship for the graph-reading
    stub above.

    ``discrete=0.2`` (vs the recipe's 0.9995): the sprinkle probability per
    cell is alpha_bar*(1-eps); at the production epsilon and this tiny
    geometry the synthetic graph would grow ~0.2 cells per draw and the
    degree gate would have nothing to gate."""
    cfg, jmodel, params, tmodel, ns = build_flagship_pair(
        ref, user_guided=user_guided)
    cfg = dataclasses.replace(cfg, discrete=0.2)
    diff_t, diff_j = _discrete_pair(ref, cfg, ns)
    if probe:
        tmodel, japply = _GraphProbeModel(), _graph_probe_apply
        params = None
    else:
        japply = jmodel.apply

    rng = np.random.default_rng(seed)
    # varied row degrees so the degree gate has non-trivial probabilities
    p_row = np.linspace(0.05, 0.6, B)[:, None]
    x0 = (rng.random((B, N_ITEM)) < p_row).astype(np.float32)
    index = np.arange(B)

    t_draws = []
    for d in range(draws):
        torch.manual_seed(1000 + d)
        with torch.no_grad():
            out = diff_t.p_sample(tmodel, _t(x0), 0,
                                  sampling_noise=sampling_noise,
                                  index=_t(index))
        t_draws.append(out.numpy())

    j_draws = []
    for d in range(draws):
        out = diff_j.p_sample(japply, params, jnp.asarray(x0),
                              jnp.asarray(index), jax.random.PRNGKey(d),
                              sampling_steps=0, sampling_noise=sampling_noise)
        j_draws.append(np.asarray(out))
    return np.stack(t_draws), np.stack(j_draws)


def test_user_guided_gate_parity_vs_reference(ref):
    """--user_guided routing (ref gaussian_diffusion.py:720-723), two layers:

    1. On the LIVE flagship the gate must have EXACTLY no effect on scores —
       in the reference, because the directed conv leaves user rows
       graph-independent (quirk 6), the entire degree-guided synthetic-graph
       growth is dead code at score level. Both implementations must
       reproduce that invariance bit-for-bit (same seeds, gate on vs off).
    2. With a graph-READING probe model, the gate must move outputs, the
       ungated branch must agree across frameworks in per-element mean, and
       the gate's shift must match in size."""
    # layer 1: score-level invariance on the real flagship
    t_off, j_off = _p_sample_draws(ref, 0, False, draws=4)
    t_on, j_on = _p_sample_draws(ref, 1, False, draws=4)
    np.testing.assert_array_equal(t_on, t_off)
    np.testing.assert_array_equal(j_on, j_off)

    # layer 2: gate semantics through the probe
    t_off, j_off = _p_sample_draws(ref, 0, False, probe=True)
    t_on, j_on = _p_sample_draws(ref, 1, False, probe=True)

    np.testing.assert_allclose(j_off.mean(), t_off.mean(), rtol=0.02)
    se = t_off.std(axis=0).mean() / np.sqrt(t_off.shape[0])
    np.testing.assert_allclose(j_off.mean(axis=0), t_off.mean(axis=0),
                               atol=max(8 * se, 5e-4))

    # the gate's effect (on - off) matches in direction and size; gating
    # can only REMOVE growth, so the shift must be negative on both sides
    d_t = t_on.mean() - t_off.mean()
    d_j = j_on.mean() - j_off.mean()
    assert d_t < 0, "gate had no measurable effect in the reference probe"
    np.testing.assert_allclose(d_j, d_t, rtol=0.25)


def test_sampling_noise_p_sample_moments_vs_reference(ref):
    """--sampling_noise=true adds posterior noise at every t != 0
    (ref gaussian_diffusion.py:745-752). Mean scores must stay on the
    deterministic path's mean, and the per-element spread across draws —
    pure accumulated exp(0.5 log_var) noise — must match between
    implementations."""
    t_noisy, j_noisy = _p_sample_draws(ref, user_guided=1, sampling_noise=True)

    np.testing.assert_allclose(j_noisy.mean(), t_noisy.mean(), rtol=0.02)
    # spread: mean per-element std across draws
    np.testing.assert_allclose(j_noisy.std(axis=0).mean(),
                               t_noisy.std(axis=0).mean(), rtol=0.10)
    # the noise is real (not degenerate) on both sides
    assert t_noisy.std(axis=0).mean() > 1e-4
    assert j_noisy.std(axis=0).mean() > 1e-4


def _eps_moments_check(ref):
    """mean_type=eps (ref main.py:183-188 EPSILON) on the LIVE discrete
    class at identical flagship weights: the eps-target MSE, the
    (1-ᾱ)/((1-ᾱ_prev)²(1-β)) reweight, and the t==0 likelihood term
    (ref gaussian_diffusion.py:905-932) must give agreeing first-draw
    per-example loss moments. Complements the 3-seed golden run
    (docs/PARITY.md "mean_type=eps"); replaces the old finiteness-only
    coverage as the strongest eps evidence at step level."""
    cfg_f, jmodel, params, tmodel, ns = build_flagship_pair(ref)
    cfg = dataclasses.replace(cfg_f, mean_type="eps", OneHotMatrix=2)
    _, diff_j = _discrete_pair(ref, cfg, ns)
    gd, _, _ = ref
    rng = np.random.default_rng(5)
    x0 = (rng.random((B, N_ITEM)) < 0.25).astype(np.float32)
    index = np.arange(B)
    draws = 50

    torch.manual_seed(0)
    t_all = []
    for _ in range(draws):
        # fresh diffusion per draw keeps both sides in the uniform-pt phase
        diff_t, _ = _discrete_pair(ref, cfg, ns)
        with torch.no_grad():
            terms = diff_t.training_losses(tmodel, _t(x0), True,
                                           index=_t(index))
        t_all.append(terms["loss"].numpy())
    t_all = np.concatenate(t_all)

    j_all = []
    for d in range(draws):
        lt = LtState.create(cfg.steps)
        loss, _, aux = diff_j.training_losses(
            jmodel.apply, params, jnp.asarray(x0), jnp.asarray(index),
            jax.random.PRNGKey(d), lt, reweight=True, train=False)
        # compare the weighted loss exactly as the reference stores it
        # (terms["loss"]), i.e. before the /pt and +0.1*closs the trainer adds
        j_all.append(np.asarray(loss * aux["pt"]) -
                     0.1 * float(aux["closs"]) * np.asarray(aux["pt"]))
    j_all = np.concatenate(j_all)

    np.testing.assert_allclose(j_all.mean(), t_all.mean(), rtol=0.05)
    np.testing.assert_allclose(j_all.std(), t_all.std(), rtol=0.15)


def _eps_hazard_check(ref):
    """reweight=False is a live hazard upstream: the reference's
    training_losses never binds `loss` on that branch and dies with
    UnboundLocalError at `terms["loss"] = weight * loss`
    (ref gaussian_diffusion.py:919-932; SURVEY §3.5). Our corrected branch
    (engine.py: weight=1, loss=mse) must return finite unweighted mse —
    this test pins BOTH behaviors so the divergence stays documented."""
    cfg_f, jmodel, params, tmodel, ns = build_flagship_pair(ref)
    cfg = dataclasses.replace(cfg_f, mean_type="eps", OneHotMatrix=2)
    diff_t, diff_j = _discrete_pair(ref, cfg, ns)
    rng = np.random.default_rng(6)
    x0 = (rng.random((B, N_ITEM)) < 0.25).astype(np.float32)
    index = np.arange(B)

    with pytest.raises((NameError, UnboundLocalError)):
        with torch.no_grad():
            diff_t.training_losses(tmodel, _t(x0), False, index=_t(index))

    lt = LtState.create(cfg.steps)
    loss, _, aux = diff_j.training_losses(
        jmodel.apply, params, jnp.asarray(x0), jnp.asarray(index),
        jax.random.PRNGKey(0), lt, reweight=False, train=False)
    loss = np.asarray(loss)
    assert np.all(np.isfinite(loss))
    # unweighted: the engine composes mse/pt THEN adds the closs term
    # (engine.py:444-446: final = weighted/pt; final += 0.1*closs) — pt≡1
    # here (fresh LtState -> uniform phase) but the contract must be
    # asserted in the engine's order so a warmed-Lt variant still holds
    expect = (np.asarray(aux["mse"]) / np.asarray(aux["pt"])
              + 0.1 * float(aux["closs"]))
    np.testing.assert_allclose(loss, expect, rtol=1e-5)


def _run_isolated(mode: str) -> None:
    """Run an eps check in a FRESH tunnel-free CPU python process.

    ISOLATION IS LOAD-BEARING, not style: run in-process, these two checks
    pass (alone, and paired with any single other file) but leave the
    process in a state where a LATER, unrelated XLA CPU compilation
    segfaults deterministically — reproduced 3x at full-suite position
    ~166 (tests/test_round2_fixes.py::test_registry_threads_cosine_eps,
    inside jax compiler.py backend_compile_and_load), gone with exactly
    these two deselected (282 pass). The mechanism is inside XLA's CPU
    backend; the unusual ingredient here is ~50 interleaved
    torch-forward <-> eager-jax draws per check. A child process contains
    whatever is corrupted without losing coverage."""
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # tunnel-free: never contends for the chip
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                       if p and "axon_site" not in p])
    r = subprocess.run([sys.executable, os.path.abspath(__file__), mode],
                       env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (f"isolated eps check {mode!r} failed "
                               f"(rc {r.returncode}):\n{r.stdout}\n{r.stderr}")
    assert f"OK {mode}" in r.stdout


def test_eps_training_losses_moments_vs_reference():
    _run_isolated("eps_moments")


def test_eps_reweight_false_reference_hazard():
    _run_isolated("eps_hazard")


def test_dnnlightgcn_forward_parity_vs_reference_class(ref):
    """DNNlightGCN (ref DNN.py:1709-1804) at IDENTICAL weights vs the actual
    class on the pure-torch tg-LightGCN shim. The geometry is pinned to
    5949x2810/batch 400 by the reference itself (data_utils.py:48,113
    hardcode a=5949, b=2810, bs=400 and the class calls the converters with
    defaults).

    The faithful tg-2.5.3 semantics matter here: the reference feeds a
    DIRECTED user->item edge list into tg LightGCN, whose gcn_norm
    (add_self_loops=False) computes degrees from TARGET nodes only — users
    get in-degree 0, every edge weight collapses to 0, and propagation
    contributes nothing. The effective link filter is sign(raw_u . raw_i)
    on the xavier-init embeddings, which is exactly the repo's
    dnn_lightgcn WITHOUT norm_adj (raw-embedding mode). The norm_adj mode
    (real symmetric propagation) is the corrected/intended semantics,
    documented at the builder.
    """
    gd, rdnn, _ = ref
    import scipy.sparse as sp

    from gdmcf_tpu.models.backbones import dnn_lightgcn

    n_user, n_item, bs = 5949, 2810, 400
    rng = np.random.default_rng(3)
    train = (rng.random((n_user, n_item)) < 0.003).astype(np.float32)

    sys.path.insert(0, "/root/reference")
    import data_utils as ref_du

    ta = torch.tensor(train)
    e_f = ref_du.adjacency_to_edge(ta, torch.arange(n_user).long())

    dims = [64]
    out_dims = dims + [n_item]
    in_dims = out_dims[::-1]
    torch.manual_seed(0)
    # DOCUMENTED REPAIR: DNN.py:1061 defines a module-level `class LightGCN`
    # (the mini aggregation net) that SHADOWS the `from torch_geometric.nn
    # import LightGCN` at DNN.py:7 — so DNNlightGCN's constructor call at
    # :1721 (num_nodes=..., embedding_dim=..., num_layers=...) TypeErrors in
    # the reference itself, torch_geometric installed or not. Restore the
    # evident intent: the tg class the file imports.
    import benchmarks.reference_runner as rr

    saved = rdnn.LightGCN
    rdnn.LightGCN = rr._make_lightgcn()
    try:
        tmodel = rdnn.DNNlightGCN(in_dims, out_dims, 10, time_type="cat",
                                  norm=False, num_nodes=n_user + n_item,
                                  e_f=e_f)
    finally:
        rdnn.LightGCN = saved
    tmodel.eval()

    jmodel = dnn_lightgcn(in_dims, out_dims, 10, n_user, n_item,
                          norm_adj=None)
    params = jmodel.init(jax.random.PRNGKey(0))
    raw = tmodel.gcn.embedding.weight.detach().numpy()
    params = dict(params)
    params["frozen_lgn_user"] = jnp.asarray(raw[:n_user])
    params["frozen_lgn_item"] = jnp.asarray(raw[n_user:])
    params["emb_layer"] = {
        "w": jnp.asarray(tmodel.emb_layer.weight.detach().numpy()).T,
        "b": jnp.asarray(tmodel.emb_layer.bias.detach().numpy())}
    params["in_layers"] = [
        {"w": jnp.asarray(l.weight.detach().numpy()).T,
         "b": jnp.asarray(l.bias.detach().numpy())} for l in tmodel.in_layers]
    params["out_layers"] = [
        {"w": jnp.asarray(l.weight.detach().numpy()).T,
         "b": jnp.asarray(l.bias.detach().numpy())}
        for l in tmodel.out_layers]

    x = train[:bs]
    ts = np.full((bs,), 3, dtype=np.int64)
    index = torch.arange(bs).long()
    with torch.no_grad():
        out_t = tmodel(torch.tensor(x), torch.tensor(ts), index)
    out_j, _ = jmodel.apply(params, jnp.asarray(x), jnp.asarray(ts), None,
                            index=jnp.arange(bs), graph=None, rcloss=False,
                            train=False, rng=None)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-4, atol=1e-4)


if __name__ == "__main__":
    # Child entry for _run_isolated: build the reference fixture directly
    # and run one eps check in this fresh process (see _run_isolated for
    # why these cannot share the suite's process).
    from benchmarks.reference_runner import load_reference

    _mode = sys.argv[1]
    _checks = {"eps_moments": _eps_moments_check,
               "eps_hazard": _eps_hazard_check}
    _checks[_mode](load_reference())
    print(f"OK {_mode}")


@pytest.mark.slow
def test_legacy_catonehot_xtU_uses_independent_timestep(ref):
    """The legacy class draws TWO independent importance timesteps: the
    first corrupts the one-hot channel x_tU (ref gaussian_diffusion.py
    :281-291), the second drives x_t/model/weights (:294-300). Reusing one
    draw correlates the channels' corruption levels and shifts the loss
    distribution (round-5 review finding — every earlier legacy gate ran
    CatOneHot=False where the branch is dead). A hot noise schedule plus a
    model that reads BOTH channels makes the moments sensitive to the
    correlation structure, not just the marginals."""
    gd, _, _ = ref
    HOT = dict(noise_schedule="linear-var", noise_scale=0.5,
               noise_min=0.1, noise_max=0.5, steps=5)
    rng = np.random.default_rng(5)
    w = (rng.standard_normal((N_ITEM, N_ITEM)) * 0.05).astype(np.float32)
    w2 = (rng.standard_normal((N_ITEM, N_ITEM)) * 0.05).astype(np.float32)
    x0 = (rng.random((128, N_ITEM)) < 0.25).astype(np.float32)
    draws = 40

    wt, wt2 = torch.tensor(w), torch.tensor(w2)

    class TwoChannel(torch.nn.Module):
        def forward(self, x, t, x_U):
            return x @ wt + x_U[..., 1] @ wt2

    torch.manual_seed(0)
    t_losses = []
    for _ in range(draws):
        diff_t = gd.GaussianDiffusion(
            gd.ModelMeanType.START_X, HOT["noise_schedule"],
            HOT["noise_scale"], HOT["noise_min"], HOT["noise_max"],
            HOT["steps"], torch.device("cpu"), CatOneHot=True)
        with torch.no_grad():
            terms = diff_t.training_losses(TwoChannel(), _t(x0), True)
        t_losses.append(terms["loss"].numpy())
    t_all = np.concatenate(t_losses)

    wj, wj2 = jnp.asarray(w), jnp.asarray(w2)

    def apply_j(params, x, ts, x_U=None, index=None, graph=None,
                rcloss=False, train=True, rng=None):
        return x @ wj + x_U[..., 1] @ wj2, None

    cfg = Config(backbone="DNNOneHot", dims=[D], emb_size=10,
                 OneHotMatrix=2, mean_type="x0", **HOT)
    diff_j = Diffusion.create(cfg, index_in=False, variant="legacy")
    j_losses = []
    for d in range(draws):
        lt = LtState.create(cfg.steps)
        loss, _, _ = diff_j.training_losses(
            apply_j, None, jnp.asarray(x0), jnp.arange(128),
            jax.random.PRNGKey(d), lt, reweight=True, train=False)
        j_losses.append(np.asarray(loss))
    j_all = np.concatenate(j_losses)

    np.testing.assert_allclose(j_all.mean(), t_all.mean(), rtol=0.02)
    np.testing.assert_allclose(j_all.std(), t_all.std(), rtol=0.10)


def test_legacy_catonehot_draws_two_timesteps(monkeypatch):
    """Directly discriminative form of the above (the moments check is
    parity evidence but second-order in the correlation): the legacy
    CatOneHot path must call sample_timesteps TWICE — first draw for
    x_tU's corruption, second for the model/weights — exactly like the
    reference (:281-291 then :294-300). Pre-fix the engine reused one
    draw (one call)."""
    from gdmcf_tpu.diffusion.engine import Diffusion as _Diff

    cfg = Config(backbone="DNNOneHot", dims=[D], emb_size=10,
                 OneHotMatrix=2, mean_type="x0", **LEGACY_RECIPE)
    diff = _Diff.create(cfg, index_in=False, variant="legacy")
    calls = []
    orig = _Diff.sample_timesteps

    def spy(self, key, lt, n):
        ts, pt = orig(self, key, lt, n)
        calls.append(np.asarray(ts))
        return ts, pt

    monkeypatch.setattr(_Diff, "sample_timesteps", spy)
    seen_ts = []

    def apply_j(params, x, ts, x_U=None, index=None, graph=None,
                rcloss=False, train=True, rng=None):
        seen_ts.append(np.asarray(ts))
        return x * 0.5 + x_U[..., 1] * 0.1, None

    x0 = (np.random.default_rng(0).random((64, N_ITEM)) < 0.25
          ).astype(np.float32)
    lt = LtState.create(cfg.steps)
    diff.training_losses(apply_j, None, jnp.asarray(x0), jnp.arange(64),
                         jax.random.PRNGKey(0), lt, reweight=True,
                         train=False)
    assert len(calls) == 2, f"expected two independent draws, saw {len(calls)}"
    assert not np.array_equal(calls[0], calls[1])  # independent streams
    # the model conditions on exactly ONE of the draws; the other
    # (independent) one corrupted x_tU. Code order differs from the
    # reference (ours draws the model ts first) — irrelevant, since both
    # draws come from the same Lt state and distinct key folds.
    assert (np.array_equal(seen_ts[0], calls[0])
            != np.array_equal(seen_ts[0], calls[1]))
