"""Training / experiment layer.

Rebuilds the *intended* design of the reference's abandoned experiment
stack (reference: vltk/abc/simple.py — syntactically broken, see SURVEY
§2.8) as a clean JAX train loop:

  torch AdamW + transformers linear-warmup   -> optax chain (optim.py)
  CUDA AMP GradScaler                        -> bf16 compute, f32 params
  model.to(device) / DataParallel            -> mesh shardings (parallel/)
  save {model}_epoch_n.pt + info.json        -> msgpack + info.json
                                                (checkpoint.py, same resume
                                                semantics)
  outer_loop/inner_loop/test_run             -> SimpleExperiment
                                                (experiment.py)
"""

from vltk_tpu.train.optim import make_optimizer, linear_warmup_linear_decay
from vltk_tpu.train.metrics import accuracy, detection_map, vqa_score
from vltk_tpu.train.checkpoint import (
    latest_epoch,
    load_checkpoint,
    save_checkpoint,
)
from vltk_tpu.train.steps import make_eval_step, make_train_step, create_state
from vltk_tpu.train.experiment import SimpleExperiment
from vltk_tpu.train.complex import ComplexExperiment, Loop

__all__ = [
    "make_optimizer",
    "linear_warmup_linear_decay",
    "accuracy",
    "detection_map",
    "vqa_score",
    "save_checkpoint",
    "load_checkpoint",
    "latest_epoch",
    "make_train_step",
    "make_eval_step",
    "create_state",
    "SimpleExperiment",
    "ComplexExperiment",
    "Loop",
]
