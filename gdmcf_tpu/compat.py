"""Import trained reference (PyTorch) checkpoints into gdmcf_tpu params.

The reference saves its best model as a whole-module pickle
(``torch.save(model, 'model.pth')``, ref main.py:373-375). A user migrating
a trained run loads it here:

    from gdmcf_tpu.compat import import_reference_checkpoint
    params = import_reference_checkpoint("model.pth", cfg, n_user, n_item)

or from the CLI, writing a resume-ready Orbax checkpoint:

    python -m gdmcf_tpu.compat model.pth -c configs/yelpOneEmbGcn.yaml \\
        --data_path ./Datasets/yelp_clean/ --out ./ckpt

Accepted inputs: a pickled module (needs its class importable — the repo's
repaired-reference loader is used for that), a ``state_dict`` saved with
``torch.save(model.state_dict(), ...)``, or an ``.npz`` of the state_dict
(export with ``np.savez(path, **{k: v.cpu().numpy() for k, v in
model.state_dict().items()})`` when torch_geometric isn't available here).

Name mapping (torch Linear stores ``weight [out, in]``; our ``w`` is
``[in, out]``):

    emb_layer.{weight,bias}        -> emb_layer.{w.T,b}
    in_layers.N / in_layers2.N /
      out_layers.N .{weight,bias}  -> same list, {w.T,b}
    embedding_{item,user}.weight   -> embedding_{item,user}
    gcn_model.convK.lin.weight     -> gcn.convK.w.T   (GCNConv linear)
    gcn_model.convK.bias           -> gcn.convK.b
    sumW                           -> sumW

``out_layers.*`` entries are skipped when the target backbone does not
allocate them (the reference constructs but bypasses them in the embedding
variants — ref DNN.py:648-652; documented in models/backbones.py).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _assign(tree: Any, path, value: np.ndarray):
    """Set a leaf in a nested dict/list params pytree, checking shape."""
    node = tree
    for p in path[:-1]:
        node = node[p]
    old = node[path[-1]]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'.'.join(map(str, path))}: "
                         f"checkpoint {value.shape} vs model {old.shape}")
    node[path[-1]] = value.astype(np.asarray(old).dtype)


def _resolve(name: str, template: Mapping[str, Any]):
    """torch state_dict name -> (path tuple, transpose?) or None to skip."""
    m = re.fullmatch(r"(in_layers2?|out_layers)\.(\d+)\.(weight|bias)", name)
    if m:
        group, i, kind = m.group(1), int(m.group(2)), m.group(3)
        if group not in template:
            if group == "out_layers":
                return None  # constructed-but-bypassed in the reference
            raise KeyError(f"model has no parameter group {group!r}")
        return ((group, i, "w" if kind == "weight" else "b"),
                kind == "weight")
    m = re.fullmatch(r"emb_layer\.(weight|bias)", name)
    if m:
        return (("emb_layer", "w" if m.group(1) == "weight" else "b"),
                m.group(1) == "weight")
    m = re.fullmatch(r"embedding_(item|user)\.weight", name)
    if m:
        return ((f"embedding_{m.group(1)}",), False)
    m = re.fullmatch(r"gcn_model\.(conv\d)\.lin\.weight", name)
    if m:
        return (("gcn", m.group(1), "w"), True)
    m = re.fullmatch(r"gcn_model\.(conv\d)\.bias", name)
    if m:
        return (("gcn", m.group(1), "b"), False)
    if name == "sumW":
        return (("sumW",), False)
    raise KeyError(f"unrecognized reference parameter {name!r}")


def params_from_state_dict(sd: Mapping[str, Any], template: Any) -> Any:
    """Fill a ``model.init`` template with reference weights by name.

    Raises on shape mismatch, unknown names, or template leaves the
    state_dict does not cover (silent partial imports are worse than
    errors)."""
    import jax

    # tree_map builds fresh containers and _assign replaces whole leaves,
    # so the template itself is never mutated
    params = jax.tree_util.tree_map(np.asarray, template)
    filled = set()
    for name, value in sd.items():
        value = np.asarray(value)
        resolved = _resolve(name, params)
        if resolved is None:
            continue
        path, transpose = resolved
        _assign(params, path, value.T if transpose else value)
        filled.add(path)

    # enumerate every leaf path via jax's own registry (covers any pytree
    # node type a template may use — a hand-rolled dict/list walk would
    # report e.g. a NamedTuple node as one opaque unfilled path)
    def plain(key_path):
        return tuple(
            getattr(k, "key", getattr(k, "idx", getattr(k, "name", k)))
            for k in key_path)

    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    missing = [".".join(map(str, plain(kp)))
               for kp, _leaf in leaves if plain(kp) not in filled]
    if missing:
        raise ValueError(f"state_dict left model parameters unfilled: "
                         f"{missing}")
    return params


def _load_state_dict(path: str) -> Mapping[str, np.ndarray]:
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch
    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except (ModuleNotFoundError, AttributeError):
        # whole-module pickle referencing the reference classes: make them
        # importable via the repaired-reference loader, then retry
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                               / "benchmarks"))
        try:
            from reference_runner import load_reference
        except ModuleNotFoundError as e:
            raise ModuleNotFoundError(
                "this .pth is a whole-module pickle needing the reference "
                "class definitions, loaded via benchmarks/reference_runner.py"
                " — present in a source checkout but not in the installed "
                "package. Run from a source checkout, or re-export the "
                "checkpoint as a state_dict (torch.save(model.state_dict(), "
                "...)) or .npz and import that instead.") from e
        load_reference()
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def import_reference_embeddings(src_dir: str, out_dir: "str | None" = None):
    """Import the reference LightGCN pretrainer's four ``*_Embed.pt``
    artifacts (saved by ref lightGCN.py:320-323) into a
    :class:`gdmcf_tpu.models.lightgcn.LightGCNResult`, optionally persisting
    them in this repo's npz format (``save_embeddings``).

    The reference ships exactly these files next to its entry point
    (final/initial x user/item); a user migrating a finished pretrain run
    points this at that directory instead of re-running the pretrainer.
    """
    import os

    import torch

    from gdmcf_tpu.models.lightgcn import LightGCNResult, save_embeddings

    def load(name):
        p = os.path.join(src_dir, f"{name}_Embed.pt")
        t = torch.load(p, map_location="cpu", weights_only=True)
        return np.asarray(t.detach().numpy(), dtype=np.float32)

    fu, fi = load("final_user"), load("final_item")
    iu, ii = load("initial_user"), load("initial_item")
    if fu.ndim != 2 or fi.ndim != 2:
        raise ValueError(
            f"embedding artifacts must be 2-D [rows, dim]; got final_user "
            f"{fu.shape}, final_item {fi.shape}")
    if fu.shape != iu.shape or fi.shape != ii.shape or \
            fu.shape[1] != fi.shape[1]:
        raise ValueError(
            f"inconsistent embedding shapes: final {fu.shape}/{fi.shape}, "
            f"initial {iu.shape}/{ii.shape}")
    result = LightGCNResult(final_user=fu, final_item=fi,
                            initial_user=iu, initial_item=ii)
    if out_dir is not None:
        save_embeddings(result, out_dir)
    return result


def import_reference_checkpoint(path: str, cfg, n_user: int, n_item: int):
    """Load a reference checkpoint file into a params pytree for ``cfg``."""
    import jax

    from gdmcf_tpu.models.registry import build_model

    model = build_model(cfg, n_user, n_item)
    template = model.init(jax.random.PRNGKey(0))
    return params_from_state_dict(_load_state_dict(path), template)


def main(argv=None):
    import argparse
    import sys

    import jax

    from gdmcf_tpu.config import parse_args
    from gdmcf_tpu.data.loader import data_load_dir
    from gdmcf_tpu.train.checkpoint import Checkpointer
    from gdmcf_tpu.train.trainer import Trainer

    args = argv if argv is not None else sys.argv[1:]
    conv = argparse.ArgumentParser(add_help=False)
    conv.add_argument("checkpoint", help=".pth / state_dict / .npz")
    conv.add_argument("--out", required=True, help="Orbax checkpoint dir")
    ns, rest = conv.parse_known_args(args)
    cfg = parse_args(rest)

    _, _, _, n_user, n_item = data_load_dir(cfg.data_path)
    params = import_reference_checkpoint(ns.checkpoint, cfg, n_user, n_item)
    trainer = Trainer(cfg, n_user, n_item)
    state = trainer.init_state()
    state = state._replace(
        params=jax.tree_util.tree_map(lambda t, v: np.asarray(v, t.dtype),
                                      state.params, params))
    Checkpointer(ns.out).save(state)
    print(f"imported {ns.checkpoint} -> {ns.out} "
          f"(step 0, fresh optimizer state)")


if __name__ == "__main__":
    main()
