from vltk_tpu.models.frcnn import FRCNN, FRCNNConfig
from vltk_tpu.models.convert import torch_frcnn_to_jax
