from gdmcf_tpu.models.registry import build_model, ModelDef

__all__ = ["build_model", "ModelDef"]
