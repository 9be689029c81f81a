"""Vectorized ranking metrics: Precision/Recall/NDCG/MRR @ K.

Replaces the reference's triple-nested pure-Python loop
(``/root/reference/evaluate_utils.py:6-52``) with one fused XLA computation
over ``[N, K]`` hit matrices. Semantics match exactly, including:

  * users with empty ground truth contribute 0 to every numerator but are
    still counted in the denominator (the reference divides by
    ``len(predictedIndices)``, ref :47-50);
  * IDCG@k truncates at min(k, |GT|) (ref :35-37);
  * NDCG is added only when IDCG != 0 (ref :39-40);
  * MRR uses the first hit within the cutoff (ref :30-32);
  * results round to 4 decimals (ref :47-50).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("topn",))
def _metrics_sums(hits: jnp.ndarray, gt_count: jnp.ndarray,
                  topn: Tuple[int, ...]) -> jnp.ndarray:
    """hits [N, K_max] {0,1}, gt_count [N] -> [4, len(topn)] metric SUMS
    (divide by the user count to get the reference's means). Sums make the
    computation streamable batch-by-batch for catalogs too large to rank in
    one call."""
    k_max = hits.shape[1]
    disc = 1.0 / jnp.log2(jnp.arange(k_max, dtype=jnp.float32) + 2.0)
    cum_disc = jnp.cumsum(disc)  # cum_disc[j] = sum_{i<=j} 1/log2(i+2)
    valid = (gt_count > 0).astype(jnp.float32)

    cols = []
    for k in topn:
        hk = hits[:, :k]
        user_hits = hk.sum(axis=1)
        precision = (user_hits / k) * valid
        recall = jnp.where(gt_count > 0, user_hits / jnp.maximum(gt_count, 1), 0.0)
        dcg = (hk * disc[:k]).sum(axis=1)
        idcg_len = jnp.minimum(gt_count, k).astype(jnp.int32)
        idcg = jnp.where(idcg_len > 0, cum_disc[jnp.maximum(idcg_len - 1, 0)], 0.0)
        ndcg = jnp.where(idcg > 0, dcg / jnp.maximum(idcg, 1e-12), 0.0) * valid
        first_hit = jnp.argmax(hk, axis=1)
        has_hit = hk.any(axis=1)
        mrr = jnp.where(has_hit, 1.0 / (first_hit + 1.0), 0.0) * valid
        cols.append(jnp.stack([precision.sum(), recall.sum(),
                               ndcg.sum(), mrr.sum()]))
    return jnp.stack(cols, axis=1)


def _hits_and_counts(gt_rows, pred_idx, topn: Tuple[int, ...]):
    """Shared hit-matrix assembly for the one-shot and streamed entry
    points. Fails loudly when fewer items were ranked than the largest
    cutoff asks for — a silent clamp would deflate the metrics."""
    # MEMBERSHIP, not magnitude: the reference tests `pred in GroundTruth[i]`
    # (a set), so count-valued GT cells (duplicate interactions) must
    # binarize here — raw counts would score precision/NDCG > 1 and point
    # MRR's argmax at the LARGEST count instead of the FIRST hit
    gt = (jnp.asarray(gt_rows) != 0)
    idx = jnp.asarray(pred_idx)
    if max(topn) > idx.shape[1]:
        raise ValueError(
            f"topn cutoff {max(topn)} exceeds the {idx.shape[1]} ranked "
            "predictions — rank at least max(topn) items per user")
    hits = jnp.take_along_axis(gt, idx, axis=1).astype(jnp.float32)
    return hits, gt.sum(axis=1).astype(jnp.float32)


def compute_topn_accuracy(
    gt_matrix: np.ndarray | jnp.ndarray,   # [N, n_item] binary ground truth
    pred_indices: np.ndarray | jnp.ndarray,  # [N, K_max] ranked item ids
    topn: Sequence[int],
) -> Tuple[List[float], List[float], List[float], List[float]]:
    """Drop-in equivalent of the reference ``computeTopNAccuracy``.

    Returns (precision, recall, NDCG, MRR) lists rounded to 4 decimals.
    """
    topn = tuple(topn)
    hits, gt_count = _hits_and_counts(gt_matrix, pred_indices, topn)
    out = np.asarray(_metrics_sums(hits, gt_count, topn)) / hits.shape[0]
    precision, recall, ndcg, mrr = out
    rnd = lambda row: [round(float(v), 4) for v in row]
    return rnd(precision), rnd(recall), rnd(ndcg), rnd(mrr)


@partial(jax.jit, static_argnames=("n_item", "topn"))
def packed_batch_metric_sums(gt_packed: jnp.ndarray, idx: jnp.ndarray,
                             n_item: int,
                             topn: Tuple[int, ...]) -> jnp.ndarray:
    """Device-side metric sums from a BIT-PACKED ground-truth batch.

    gt_packed [B, ceil(n_item/8)] uint8 (or [G, B, ...] for a fused group),
    idx [B, K] (or [G, B, K]) -> [4, len(topn)] (or [G, 4, len(topn)]) sums.

    This keeps the whole eval epoch on-device: the GT ships once per
    training run (packed, 32x smaller), the [B, K] rankings never leave the
    chip, and the only device->host transfer per eval is the final
    [4, len(topn)] sums (trainer.evaluate). Math identical to
    ``_metrics_sums``.
    """
    from gdmcf_tpu.ops.bitpack import unpack_rows

    if max(topn) > idx.shape[-1]:  # trace-time shapes: loud, like add_packed
        raise ValueError(
            f"topn cutoff {max(topn)} exceeds the {idx.shape[-1]} ranked "
            "predictions — rank at least max(topn) items per user")

    def one(gp, ix):
        gt = unpack_rows(gp, n_item)
        hits = jnp.take_along_axis(gt, ix, axis=1).astype(jnp.float32)
        return _metrics_sums(hits, gt.sum(axis=1).astype(jnp.float32), topn)

    if gt_packed.ndim == 3:
        return jax.vmap(one)(gt_packed, idx)
    return one(gt_packed, idx)


class MetricAccumulator:
    """Streamed Precision/Recall/NDCG/MRR: feed (gt_rows, pred_idx) batches,
    read the reference-equivalent means at the end. Exact — sums are
    accumulated unrounded, the division happens once.

    Per-batch sums from the device path stay ON DEVICE until
    :meth:`result`: fetching each batch's [4, n] sums eagerly would
    synchronize every add() (~25 ms relay RTT per batch here — the same
    lesson as the trainer's own gt_dev path, trainer.py)."""

    def __init__(self, topn: Sequence[int]):
        self.topn = tuple(topn)
        self.sums = np.zeros((4, len(self.topn)), dtype=np.float64)
        self._pending = []  # device [4, n] f32 sums, fetched at result()
        self.n_users = 0

    def add(self, gt_rows, pred_idx, binary: "bool | None" = None) -> None:
        """``binary``: pass the dataset-level verdict when the caller knows
        it (e.g. ``dataset.binary``) to skip the O(B*n_item) host scan."""
        g = np.asarray(gt_rows)
        from gdmcf_tpu.ops.bitpack import is_binary, pack_rows
        if g.ndim == 2 and g.size and (is_binary(g) if binary is None
                                       else binary):
            # binary GT (the normal case): ship bits, 32x less host->device
            self.add_packed(pack_rows(g), pred_idx, g.shape[1])
            return
        hits, gt_count = _hits_and_counts(gt_rows, pred_idx, self.topn)
        self.sums += np.asarray(_metrics_sums(hits, gt_count, self.topn))
        self.n_users += hits.shape[0]

    def add_packed(self, gt_packed, pred_idx, n_item: int) -> None:
        """Device-transport-efficient add: gt ships bit-packed (32x less),
        pred_idx stays a device array (never fetched); only the [4, n]
        sums cross back, deferred to :meth:`result`. Same math as
        :meth:`add` (the cutoff guard lives in packed_batch_metric_sums)."""
        sums = packed_batch_metric_sums(
            jnp.asarray(gt_packed), jnp.asarray(pred_idx), n_item,
            self.topn)
        if sums.ndim == 3:  # fused group [G, 4, n]: reduce, count G*B users
            sums = sums.sum(axis=0)
            self.n_users += int(pred_idx.shape[0] * pred_idx.shape[1])
        else:
            self.n_users += int(pred_idx.shape[0])
        self._pending.append(sums)

    def _drain(self) -> None:
        if self._pending:
            # one stacked fetch for the whole epoch, not one per batch
            self.sums += np.asarray(jnp.stack(self._pending),
                                    dtype=np.float64).sum(axis=0)
            self._pending.clear()

    def result(self):
        self._drain()
        out = self.sums / max(self.n_users, 1)
        rnd = lambda row: [round(float(v), 4) for v in row]
        return rnd(out[0]), rnd(out[1]), rnd(out[2]), rnd(out[3])


@partial(jax.jit, static_argnames=("k",))
def _lightgcn_sums(hits: jnp.ndarray, gt_count: jnp.ndarray,
                   k: int) -> jnp.ndarray:
    """Per-user metric SUMS for the LightGCN-pretrainer eval protocol
    (ref lightGCN.py:97-127) — deliberately different from the main
    ``computeTopNAccuracy``:

      * NDCG discounts with the NATURAL log (``np.log1p(idx+1)``, ref :113)
        instead of log2;
      * MAP@K = sum(cumhits[i] * hit[i] / (i+1)) / |GT| (ref :119-121);
      * means run over TEST users only (the groupby/merge at ref :102-106
        enumerates users with >=1 test item) — users without ground truth
        contribute to neither numerator nor denominator.

    Returns [5]: sums of (recall, precision, ndcg, map) over valid users,
    plus the valid-user count — streamable batch-by-batch.
    """
    hk = hits[:, :k].astype(jnp.float32)
    disc = 1.0 / jnp.log(jnp.arange(k, dtype=jnp.float32) + 2.0)
    cum_disc = jnp.cumsum(disc)
    valid = (gt_count > 0).astype(jnp.float32)
    safe_gt = jnp.maximum(gt_count, 1.0)

    user_hits = hk.sum(axis=1)
    recall = user_hits / safe_gt
    precision = user_hits / k
    dcg = (hk * disc).sum(axis=1)
    idcg_len = jnp.minimum(gt_count, k).astype(jnp.int32)
    idcg = cum_disc[jnp.maximum(idcg_len - 1, 0)]
    ndcg = dcg / jnp.maximum(idcg, 1e-12)
    ranks = jnp.arange(1, k + 1, dtype=jnp.float32)
    ap = (jnp.cumsum(hk, axis=1) * hk / ranks).sum(axis=1) / safe_gt
    sums = jnp.stack([(recall * valid).sum(), (precision * valid).sum(),
                      (ndcg * valid).sum(), (ap * valid).sum(), valid.sum()])
    return sums


def lightgcn_topn_metrics(
    gt_matrix: np.ndarray | jnp.ndarray,     # [N, n_item] binary ground truth
    pred_indices: np.ndarray | jnp.ndarray,  # [N, >=k] ranked item ids
    k: int,
) -> Tuple[float, float, float, float]:
    """(recall, precision, ndcg, map)@k means over users with ground truth —
    the reference LightGCN pretrainer's ``get_metrics`` semantics
    (ref lightGCN.py:67-127), vectorized."""
    hits, gt_count = _hits_and_counts(gt_matrix, pred_indices, (k,))
    s = np.asarray(_lightgcn_sums(hits, gt_count, k), dtype=np.float64)
    n = max(s[4], 1.0)
    return (float(s[0] / n), float(s[1] / n), float(s[2] / n),
            float(s[3] / n))


def print_results(loss, valid_result, test_result) -> None:
    """Human-readable metric printout (ref evaluate_utils.py:54-69 format)."""
    if loss is not None:
        print("[Train]: loss: {:.4f}".format(loss))
    for tag, res in (("Valid", valid_result), ("Test", test_result)):
        if res is not None:
            print("[{}]: Precision: {} Recall: {} NDCG: {} MRR: {}".format(
                tag,
                "-".join(str(x) for x in res[0]),
                "-".join(str(x) for x in res[1]),
                "-".join(str(x) for x in res[2]),
                "-".join(str(x) for x in res[3])))
