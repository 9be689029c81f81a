"""CLI entry point — the reference ``main.py`` recipe, TPU-native.

Usage (mirrors /root/reference/README.md:18-31):
    python -m gdmcf_tpu.cli -c configs/yelpOneEmbGcn.yaml
    python -m gdmcf_tpu.cli --dataset=yelp_clean --data_path=... --lr=1e-5 ...
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime

# note: GDMCF_DEVICE=cpu is honored at package import (gdmcf_tpu/__init__.py)

from gdmcf_tpu.config import Config, parse_args
from gdmcf_tpu.data.loader import data_load, generate_synthetic_dataset
from gdmcf_tpu.train.trainer import Trainer


def main(cfg: Config = None) -> None:
    if cfg is None:  # installed console-script entry point
        cfg = parse_args()
    out_path = os.path.join(cfg.log_name, cfg.dataset,
                            datetime.now().strftime("%Y%m%d"), cfg.out_name)
    os.makedirs(out_path, exist_ok=True)
    out_file = os.path.join(out_path, "output_NDCG.txt")
    if not cfg.debug:
        sys.stdout = open(out_file, "w")
    print("out_path:", out_path, out_file)
    print("args:", cfg.to_dict())
    print("Starting time: ",
          time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(time.time())))

    # os.path.join, NOT string concat: a data_path without a trailing slash
    # would miss the real files and the synthetic fallback below would then
    # OVERWRITE the user's dataset
    train_path = os.path.join(cfg.data_path, "train_list.npy")
    valid_path = os.path.join(cfg.data_path, "valid_list.npy")
    test_path = os.path.join(cfg.data_path, "test_list.npy")
    if not os.path.exists(train_path):
        if any(os.path.exists(p) for p in (valid_path, test_path)):
            raise FileNotFoundError(
                f"{train_path} is missing but sibling split files exist in "
                f"{cfg.data_path} — refusing to overwrite a partial dataset "
                "with synthetic data")
        # The reference snapshot ships placeholder archives only; generate a
        # synthetic dataset with comparable geometry for development runs.
        print(f"{train_path} missing; generating synthetic dataset")
        generate_synthetic_dataset(cfg.data_path)

    train_data, valid_y_data, test_y_data, n_user, n_item = data_load(
        train_path, valid_path, test_path)
    density = train_data.sum() / (n_user * n_item)
    print(f"user num: {n_user}")
    print(f"item num: {n_item}")
    print(f"density: {density:.6f}")
    print("data ready.")

    trainer = Trainer(cfg, n_user=n_user, n_item=n_item, train_csr=train_data)
    print("models ready.")
    from gdmcf_tpu.utils.logging import MetricLogger
    metric_logger = MetricLogger(out_path, echo=cfg.debug, text=cfg.debug)
    # debug mode: stdout is the console, so fit's human-readable lines must
    # ALSO go through the logger to land in output_NDCG.txt (previously the
    # text handle was opened and never written — round-5 review finding);
    # non-debug mode: stdout is already redirected onto that file, print is
    # the writer and the logger's text handle stays off (double handles on
    # one file interleave badly)
    state, best = trainer.fit(train_data, valid_y_data, test_y_data,
                              log=metric_logger.log if cfg.debug else print,
                              metric_logger=metric_logger)
    metric_logger.close()
    print("End time: ",
          time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(time.time())))


if __name__ == "__main__":
    main(parse_args())
