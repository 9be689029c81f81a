from gdmcf_tpu.ops.metrics import compute_topn_accuracy, print_results

__all__ = ["compute_topn_accuracy", "print_results"]
