"""Reference-checkpoint importer (compat.py) against the REAL reference.

Builds the actual (repaired) reference modules via
benchmarks/reference_runner, takes their state_dicts, and imports them into
gdmcf_tpu params — then checks forward parity at the imported weights.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks"))

from gdmcf_tpu.compat import import_reference_checkpoint, \
    params_from_state_dict
from gdmcf_tpu.config import Config
from gdmcf_tpu.models.registry import build_model

N_USER, N_ITEM, B = 40, 30, 8


def _reference_model(backbone, dims, emb_size):
    from reference_runner import load_reference
    rdnn = load_reference()[1]
    out_dims = dims + [N_ITEM]
    in_dims = out_dims[::-1]
    cls = getattr(rdnn, backbone)
    if backbone in ("DNNOneHotEmbedding",):
        return cls(in_dims, out_dims, emb_size,
                   item_num=N_ITEM, user_num=N_USER)
    return cls(in_dims, out_dims, emb_size)


@pytest.mark.parametrize("backbone", ["DNN", "DNNOneHotEmbedding"])
def test_import_real_reference_state_dict(backbone):
    import torch

    tmodel = _reference_model(backbone, [16], 10)
    sd = {k: v.detach().cpu().numpy()
          for k, v in tmodel.state_dict().items()}

    cfg = Config(backbone=backbone, dims=[16], emb_size=10, steps=5)
    model = build_model(cfg, N_USER, N_ITEM)
    template = model.init(jax.random.PRNGKey(0))
    params = params_from_state_dict(sd, template)

    # spot-check the transpose convention on the first tower layer
    np.testing.assert_allclose(np.asarray(params["in_layers"][0]["w"]),
                               sd["in_layers.0.weight"].T)

    # forward parity at identical weights (eval mode, no dropout)
    tmodel.eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, N_ITEM)).astype(np.float32)
    t = np.zeros((B,), dtype=np.int64)
    with torch.no_grad():
        if backbone == "DNN":
            ref_out = tmodel(torch.tensor(x), torch.tensor(t)).numpy()
            ours, _ = model.apply(params, jnp.asarray(x),
                                  jnp.asarray(t, dtype=jnp.int32),
                                  None, train=False, rng=None)
        else:
            x_bin = (rng.random((B, N_ITEM)) < 0.3).astype(np.float32)
            x_u = np.stack([1.0 - x_bin, x_bin], axis=-1)
            index = torch.arange(B)
            ref_out = tmodel(torch.tensor(x), torch.tensor(t),
                             torch.tensor(x_u), index).numpy()
            ours, _ = model.apply(params, jnp.asarray(x),
                                  jnp.asarray(t, dtype=jnp.int32),
                                  jnp.asarray(x_u),
                                  index=jnp.arange(B, dtype=jnp.int32),
                                  train=False, rng=None)
    np.testing.assert_allclose(np.asarray(ours), ref_out,
                               rtol=2e-4, atol=2e-5)


def test_import_flagship_gcn_mapping():
    """The GCN-path names (gcn_model.convK.lin.weight / .bias, sumW) map
    onto the flagship params. The real class needs torch_geometric (absent
    here), so the state_dict is built synthetically with the reference's
    exact parameter names (ref DNN.py:1109-1162, LayerGCN :1077-1092)."""
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[16], emb_size=10,
                 steps=5)
    model = build_model(cfg, N_USER, N_ITEM)
    template = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)

    def t(shape):
        return rng.standard_normal(shape).astype(np.float32)

    p = template
    sd = {
        "emb_layer.weight": t(np.asarray(p["emb_layer"]["w"]).T.shape),
        "emb_layer.bias": t(p["emb_layer"]["b"].shape),
        "in_layers.0.weight": t(np.asarray(p["in_layers"][0]["w"]).T.shape),
        "in_layers.0.bias": t(p["in_layers"][0]["b"].shape),
        "in_layers2.0.weight": t(np.asarray(p["in_layers2"][0]["w"]).T.shape),
        "in_layers2.0.bias": t(p["in_layers2"][0]["b"].shape),
        "out_layers.0.weight": t((7, 7)),   # bypassed in the reference:
        "out_layers.0.bias": t((7,)),       # skipped, any shape accepted
        "embedding_item.weight": t(p["embedding_item"].shape),
        "embedding_user.weight": t(p["embedding_user"].shape),
        "gcn_model.conv1.lin.weight": t(np.asarray(p["gcn"]["conv1"]["w"]).T.shape),
        "gcn_model.conv1.bias": t(p["gcn"]["conv1"]["b"].shape),
        "gcn_model.conv2.lin.weight": t(np.asarray(p["gcn"]["conv2"]["w"]).T.shape),
        "gcn_model.conv2.bias": t(p["gcn"]["conv2"]["b"].shape),
        "sumW": np.float32(0.7),
    }
    params = params_from_state_dict(sd, template)
    np.testing.assert_allclose(np.asarray(params["gcn"]["conv1"]["w"]),
                               sd["gcn_model.conv1.lin.weight"].T)
    np.testing.assert_allclose(np.asarray(params["sumW"]), 0.7)
    # imported params must run through the flagship forward
    x = jnp.asarray(rng.standard_normal((B, N_ITEM)), dtype=jnp.float32)
    x_bin = (rng.random((B, N_ITEM)) < 0.3).astype(np.float32)
    x_u = jnp.asarray(np.stack([1.0 - x_bin, x_bin], axis=-1))
    out, _ = model.apply(params, x, jnp.zeros((B,), jnp.int32), x_u,
                         index=jnp.arange(B, dtype=jnp.int32), graph=x_u,
                         train=False, rng=None)
    assert out.shape == (B, N_ITEM) and bool(np.isfinite(out).all())


def test_import_rejects_shape_mismatch():
    cfg = Config(backbone="DNN", dims=[16], emb_size=10, steps=5)
    model = build_model(cfg, N_USER, N_ITEM)
    template = model.init(jax.random.PRNGKey(0))
    sd = {"in_layers.0.weight": np.zeros((3, 3), np.float32)}
    with pytest.raises(ValueError, match="shape mismatch"):
        params_from_state_dict(sd, template)


def test_import_rejects_partial_state_dict():
    cfg = Config(backbone="DNN", dims=[16], emb_size=10, steps=5)
    model = build_model(cfg, N_USER, N_ITEM)
    template = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="unfilled"):
        params_from_state_dict({}, template)


def test_import_npz_roundtrip(tmp_path):
    tmodel = _reference_model("DNN", [16], 10)
    sd = {k: v.detach().cpu().numpy()
          for k, v in tmodel.state_dict().items()}
    npz = tmp_path / "sd.npz"
    np.savez(npz, **sd)
    cfg = Config(backbone="DNN", dims=[16], emb_size=10, steps=5)
    params = import_reference_checkpoint(str(npz), cfg, N_USER, N_ITEM)
    np.testing.assert_allclose(np.asarray(params["emb_layer"]["b"]),
                               sd["emb_layer.bias"])


def test_import_reference_embedding_artifacts(tmp_path):
    """The reference ships its LightGCN pretrainer outputs as four
    ``*_Embed.pt`` files (saved at ref lightGCN.py:320-323); the importer
    must read the REAL shipped artifacts and round-trip into this repo's
    npz format."""
    torch = pytest.importorskip("torch")
    import os

    from gdmcf_tpu.compat import import_reference_embeddings

    src = "/root/reference"
    if not os.path.exists(os.path.join(src, "final_user_Embed.pt")):
        pytest.skip("reference embedding artifacts not present")

    result = import_reference_embeddings(src, out_dir=str(tmp_path))
    # same latent dim everywhere, user/item row counts consistent
    assert result.final_user.shape == result.initial_user.shape
    assert result.final_item.shape == result.initial_item.shape
    assert result.final_user.shape[1] == result.final_item.shape[1]
    assert result.final_user.dtype == np.float32
    assert np.isfinite(result.final_user).all()
    assert np.isfinite(result.final_item).all()

    # npz round-trip matches the torch source bit-for-bit
    z = np.load(tmp_path / "lightgcn_embeddings.npz")
    ref = torch.load(os.path.join(src, "final_item_Embed.pt"),
                     map_location="cpu", weights_only=True)
    np.testing.assert_array_equal(z["final_item_Embed"],
                                  ref.detach().numpy().astype(np.float32))


def test_import_reference_embeddings_rejects_inconsistent(tmp_path):
    torch = pytest.importorskip("torch")

    from gdmcf_tpu.compat import import_reference_embeddings

    torch.save(torch.zeros(4, 8), tmp_path / "final_user_Embed.pt")
    torch.save(torch.zeros(3, 8), tmp_path / "final_item_Embed.pt")
    torch.save(torch.zeros(4, 8), tmp_path / "initial_user_Embed.pt")
    torch.save(torch.zeros(3, 6), tmp_path / "initial_item_Embed.pt")
    with pytest.raises(ValueError, match="inconsistent"):
        import_reference_embeddings(str(tmp_path))
