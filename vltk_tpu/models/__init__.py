from vltk_tpu.models.frcnn import FRCNN, FRCNNConfig, calibrate_int8
from vltk_tpu.models.layers import Int8Dense, calibrate_int8_variables
from vltk_tpu.models.detection_loss import (
    fast_rcnn_losses,
    rpn_losses,
    subsample_mask,
)
from vltk_tpu.models.convert import (
    jax_layoutlm_to_torch,
    jax_lxmert_to_torch,
    jax_visualbert_to_torch,
    jax_vit_to_torch,
    torch_frcnn_to_jax,
    torch_layoutlm_to_jax,
    torch_lxmert_to_jax,
    torch_visualbert_to_jax,
    torch_vit_to_jax,
)
from vltk_tpu.models.vit import ViT, ViTConfig
from vltk_tpu.models.layoutlm import (
    LayoutLM,
    LayoutLMConfig,
    LayoutLMForSpanQA,
    LayoutLMForTokenClassification,
)
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
