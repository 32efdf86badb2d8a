from vltk_tpu.models.frcnn import FRCNN, FRCNNConfig
from vltk_tpu.models.convert import torch_frcnn_to_jax, torch_lxmert_to_jax
from vltk_tpu.models.lxmert import (
    Lxmert,
    LxmertConfig,
    LxmertForPretraining,
    LxmertForVQA,
)
from vltk_tpu.models.visualbert import (
    VisualBert,
    VisualBertConfig,
    VisualBertForClassification,
)
from vltk_tpu.models.pretrained import from_pretrained
