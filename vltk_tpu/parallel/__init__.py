"""Parallelism layer: device mesh + named-sharding rules.

The reference has no multi-device parallelism beyond an optional
single-node ``nn.DataParallel`` wrap (reference: vltk/abc/simple.py:223-225)
and model-to-device assignment maps (reference: vltk/configs.py:36-60,
vltk/abc/logic/models.py:10-95). On TPU, placement is a compiler contract:
we declare a :class:`jax.sharding.Mesh` over ICI and annotate arrays with
``NamedSharding``s; XLA inserts the collectives.

Axes (see ``MeshConfig`` in vltk_tpu/config.py):
  * ``data``  — batch-sharded (DP): extraction batches, train batches.
  * ``model`` — tensor parallel (TP): attention heads / MLP hidden of the
    VL transformer, sharded column-then-row so each block needs a single
    psum on the output projection.
  * ``seq``   — sequence parallel (SP) for long OCR-document token streams
    (FUNSD/DocVQA exceed 512 tokens; the reference could only truncate,
    vltk/configs.py:113-114).
  * ``expert`` — expert parallel (EP): MoE expert kernels sharded across
    devices (models/moe.py + LXMERT_MOE_RULES).
  * ``pipe``  — pipeline parallel (PP): layer stages on successive
    devices, microbatches streamed via ppermute (parallel/pipeline.py).
"""

from vltk_tpu.parallel.mesh import (
    batch_sharding,
    current_mesh,
    make_mesh,
    replicated,
    shard_batch,
)
from vltk_tpu.parallel.ring import ring_self_attention
from vltk_tpu.parallel.pipeline import gpipe_spmd, stack_layer_params
from vltk_tpu.parallel.sharding import (
    LXMERT_MOE_RULES,
    LXMERT_RULES,
    infer_shardings,
    shard_params,
    zero1_state_shardings,
)

__all__ = [
    "make_mesh",
    "current_mesh",
    "ring_self_attention",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "infer_shardings",
    "shard_params",
    "zero1_state_shardings",
    "gpipe_spmd",
    "stack_layer_params",
    "LXMERT_RULES",
    "LXMERT_MOE_RULES",
]
