from gdmcf_tpu.data.loader import (
    data_load,
    DiffusionDataset,
    epoch_batches,
    generate_synthetic_dataset,
)

__all__ = [
    "data_load",
    "DiffusionDataset",
    "epoch_batches",
    "generate_synthetic_dataset",
]
