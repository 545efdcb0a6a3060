from corsair_tpu.nn.registry import load_model, MODELS
from corsair_tpu.nn import resunet, heads, layers

__all__ = ["load_model", "MODELS", "resunet", "heads", "layers"]
