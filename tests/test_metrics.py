"""Vectorized metrics vs an independent per-user Python oracle.

The oracle below is a clean-room implementation of Precision/Recall/NDCG/MRR
with the reference's exact conventions (empty-GT users counted in the
denominator, IDCG truncated at |GT|, 4-decimal rounding) so the fused XLA
version can be proven equivalent (SURVEY.md §4 item 1)."""

import math

import numpy as np

from gdmcf_tpu.ops.metrics import compute_topn_accuracy


def oracle(gt_sets, pred, topn):
    precision, recall, ndcg_l, mrr_l = [], [], [], []
    for k in topn:
        p = r = nd = mr = 0.0
        for i, gts in enumerate(gt_sets):
            if not gts:
                continue
            hits = 0
            dcg = idcg = 0.0
            idcg_count = len(gts)
            first = None
            for j in range(k):
                if pred[i][j] in gts:
                    dcg += 1.0 / math.log2(j + 2)
                    if first is None:
                        first = j
                    hits += 1
                if idcg_count > 0:
                    idcg += 1.0 / math.log2(j + 2)
                    idcg_count -= 1
            p += hits / k
            r += hits / len(gts)
            if idcg != 0:
                nd += dcg / idcg
            if first is not None:
                mr += 1.0 / (first + 1)
        n = len(pred)
        precision.append(round(p / n, 4))
        recall.append(round(r / n, 4))
        ndcg_l.append(round(nd / n, 4))
        mrr_l.append(round(mr / n, 4))
    return precision, recall, ndcg_l, mrr_l


def test_metrics_match_oracle(rng):
    n_users, n_item, k_max = 64, 200, 100
    topn = [10, 20, 50, 100]
    gt = (rng.random((n_users, n_item)) < 0.05).astype(np.float32)
    gt[3] = 0.0  # an empty-GT user: excluded from sums, counted in denominator
    scores = rng.random((n_users, n_item))
    pred = np.argsort(-scores, axis=1)[:, :k_max]

    gt_sets = [set(np.nonzero(gt[i])[0].tolist()) for i in range(n_users)]
    expected = oracle(gt_sets, pred, topn)
    got = compute_topn_accuracy(gt, pred, topn)
    for e_row, g_row in zip(expected, got):
        np.testing.assert_allclose(g_row, e_row, atol=1e-4)


def test_perfect_ranking():
    gt = np.zeros((4, 50), dtype=np.float32)
    for i in range(4):
        gt[i, i * 5:(i + 1) * 5] = 1.0
    pred = np.array([np.concatenate([np.arange(i * 5, (i + 1) * 5),
                                     np.arange(40, 45)]) for i in range(4)])
    p, r, nd, mrr = compute_topn_accuracy(gt, pred, [5, 10])
    assert r[0] == 1.0 and nd[0] == 1.0 and mrr[0] == 1.0
    assert p[0] == 1.0 and p[1] == 0.5


def test_topn_cutoff_wider_than_predictions_rejected():
    """Ranking fewer items than max(topn) must fail loudly — a silent clamp
    deflates precision/NDCG (hits[:, :k] would quietly shrink)."""
    import pytest

    from gdmcf_tpu.ops.metrics import MetricAccumulator

    gt = np.zeros((4, 30), dtype=np.float32)
    gt[:, 0] = 1.0
    pred = np.tile(np.arange(10, dtype=np.int32), (4, 1))
    with pytest.raises(ValueError, match="exceeds"):
        compute_topn_accuracy(gt, pred, [10, 20])
    acc = MetricAccumulator([10, 20])
    with pytest.raises(ValueError, match="exceeds"):
        acc.add(gt, pred)


def test_unsorted_topn_ranks_enough(tmp_path):
    """topN given in descending order must still rank max(topn) items (the
    trainer takes max, not the last element)."""
    from gdmcf_tpu.config import Config
    from gdmcf_tpu.data.loader import (DiffusionDataset, data_load,
                                       generate_synthetic_dataset)
    from gdmcf_tpu.train.trainer import Trainer

    paths = generate_synthetic_dataset(str(tmp_path / "d"), n_user=32,
                                       n_item=24, avg_degree=6, seed=1)
    train, valid, _, n_user, n_item = data_load(*paths)
    cfg = Config(backbone="DNN", dims=[8], emb_size=10, steps=5,
                 batch_size=16, sampling_steps=0, topN=[10, 5])
    t = Trainer(cfg, n_user, n_item)
    state = t.init_state()
    rows = np.asarray(train.todense(), dtype=np.float32)
    gt = np.asarray(valid.todense(), dtype=np.float32)
    up = t.evaluate(state, rows, gt, rows, cfg.topN)
    down = t.evaluate(state, rows, gt, rows, sorted(cfg.topN))
    # same metrics, opposite column order
    for a, b in zip(up, down):
        assert a == b[::-1], (a, b)


def lightgcn_metrics_oracle(gt_lists, topk_lists, k):
    """Literal per-user reimplementation of the reference LightGCN eval
    formulas (ref lightGCN.py:97-127): natural-log NDCG, MAP@K with a /|GT|
    denominator, means over users that appear in the test set."""
    import math

    recalls, precisions, ndcgs, maps = [], [], [], []
    for gt, top in zip(gt_lists, topk_lists):
        if not gt:
            continue  # groupby over test rows never yields empty users
        gt_set = set(gt)
        hit_list = [1 if x in gt_set else 0 for x in top]
        inter = sum(hit_list)
        recalls.append(inter / len(gt))
        precisions.append(inter / k)
        idcg = sum(1 / math.log1p(i + 1)
                   for i in range(min(len(gt), len(hit_list))))
        dcg = sum(h / math.log1p(i + 1) for i, h in enumerate(hit_list))
        ndcgs.append(dcg / idcg)
        cum = 0
        ap = 0.0
        for i, h in enumerate(hit_list):
            cum += h
            ap += cum * h / (i + 1)
        maps.append(ap / len(gt))
    n = len(recalls)
    return (sum(recalls) / n, sum(precisions) / n, sum(ndcgs) / n,
            sum(maps) / n)


def test_lightgcn_metrics_match_reference_formulas(rng):
    from gdmcf_tpu.ops.metrics import lightgcn_topn_metrics

    n, n_item, k = 40, 60, 10
    gt = (rng.random((n, n_item)) < 0.08).astype(np.float32)
    gt[5] = 0.0  # a user with no test items: excluded from the means
    gt[17] = 0.0
    scores = rng.standard_normal((n, n_item))
    pred = np.argsort(-scores, axis=1)[:, :k].astype(np.int32)

    ours = lightgcn_topn_metrics(gt, pred, k)
    gt_lists = [list(np.nonzero(gt[i])[0]) for i in range(n)]
    top_lists = [list(pred[i]) for i in range(n)]
    expected = lightgcn_metrics_oracle(gt_lists, top_lists, k)
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-7)


def test_lightgcn_metrics_perfect_ranking():
    from gdmcf_tpu.ops.metrics import lightgcn_topn_metrics

    # 3 users, each with exactly their first-k items as ground truth
    k, n_item = 5, 20
    gt = np.zeros((3, n_item), dtype=np.float32)
    pred = np.tile(np.arange(k, dtype=np.int32), (3, 1))
    for u in range(3):
        gt[u, :k] = 1.0
    r, p, nd, mp = lightgcn_topn_metrics(gt, pred, k)
    assert r == p == nd == 1.0
    np.testing.assert_allclose(mp, 1.0, rtol=1e-6)


def test_count_valued_gt_scores_membership_not_magnitude():
    """The reference tests `pred in GroundTruth[i]` — a SET. Count-valued
    GT cells (duplicate interactions) must binarize: raw counts scored
    precision/NDCG > 1 and pointed MRR's argmax at the LARGEST count
    instead of the FIRST hit (both reproduced before the fix)."""
    from gdmcf_tpu.ops.metrics import MetricAccumulator, compute_topn_accuracy

    # user 0: item 1 has count 2, ranked first -> precision@1 must be 1.0
    gt = np.array([[0.0, 2.0, 0.0, 0.0]], dtype=np.float32)
    pred = np.array([[1, 0]], dtype=np.int32)
    p, r, nd, mrr = compute_topn_accuracy(gt, pred, [1])
    assert p[0] == 1.0 and nd[0] == 1.0 and r[0] == 1.0 and mrr[0] == 1.0

    # first hit at rank 1 (count 1), larger count at rank 2: MRR == 1.0
    gt = np.array([[1.0, 0.0, 3.0, 0.0]], dtype=np.float32)
    pred = np.array([[0, 2]], dtype=np.int32)
    _, _, _, mrr = compute_topn_accuracy(gt, pred, [2])
    assert mrr[0] == 1.0

    # the streamed accumulator's non-binary host path agrees
    acc = MetricAccumulator([2])
    acc.add(gt, pred)
    assert acc.result()[3][0] == 1.0

    # recall denominator is the number of DISTINCT items (2), not the sum
    # of counts (4)
    gt = np.array([[1.0, 0.0, 3.0, 0.0]], dtype=np.float32)
    pred = np.array([[0, 1]], dtype=np.int32)
    _, r, _, _ = compute_topn_accuracy(gt, pred, [2])
    assert r[0] == 0.5


def test_accumulator_fused_group_add_packed():
    """add_packed with the documented [G, B, ...] fused-group shape must
    reduce over the group axis and count G*B users (it raised a broadcast
    error before and would have counted G users)."""
    from gdmcf_tpu.ops.bitpack import pack_rows
    from gdmcf_tpu.ops.metrics import MetricAccumulator, compute_topn_accuracy

    rng = np.random.default_rng(0)
    G, B, n_item, K = 3, 4, 16, 4
    gt = (rng.random((G, B, n_item)) < 0.3).astype(np.float32)
    pred = np.stack([np.stack([rng.permutation(n_item)[:K].astype(np.int32)
                               for _ in range(B)]) for _ in range(G)])

    acc = MetricAccumulator([2, 4])
    acc.add_packed(np.stack([pack_rows(g) for g in gt]), pred, n_item)
    assert acc.n_users == G * B
    flat = compute_topn_accuracy(gt.reshape(G * B, n_item),
                                 pred.reshape(G * B, K), [2, 4])
    for ours, ref in zip(acc.result(), flat):
        np.testing.assert_allclose(ours, ref, atol=1e-4)
