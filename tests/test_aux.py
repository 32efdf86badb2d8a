"""Aux subsystems: freeze masks, QA-head resize, ComplexExperiment loops,
JAX<->torch converter roundtrip, profiling + memory utils."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from vltk_tpu.config import Config
from vltk_tpu.models import LxmertConfig, LxmertForPretraining
from vltk_tpu.models.convert import jax_lxmert_to_torch, torch_lxmert_to_jax
from vltk_tpu.models.lxmert import resize_num_qa_labels
from vltk_tpu.train.complex import ComplexExperiment, Loop
from vltk_tpu.train.optim import with_frozen
from vltk_tpu.utils.memory import device_memory_stats, handle_tpu_oom, is_oom_error
from vltk_tpu.utils.profiling import StepTimer, get_duration


# ------------------------------------------------------------------ optim --


def test_with_frozen_zeroes_matching_params():
    params = {
        "backbone": {"kernel": jnp.ones((2, 2))},
        "head": {"kernel": jnp.ones((2, 2))},
    }
    tx = with_frozen(optax.sgd(1.0), [r"backbone"])
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["backbone"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["head"]["kernel"]).sum()) > 0.0


# ------------------------------------------------------------- QA resize --


def test_resize_num_qa_labels():
    params = {
        "lxmert": {"x": np.zeros(2)},
        "answer_head": {
            "logit": {
                "kernel": np.arange(12, dtype=np.float32).reshape(4, 3),
                "bias": np.array([1.0, 2.0, 3.0], np.float32),
            }
        },
    }
    bigger = resize_num_qa_labels(params, 5)
    assert bigger["answer_head"]["logit"]["kernel"].shape == (4, 5)
    np.testing.assert_array_equal(
        np.asarray(bigger["answer_head"]["logit"]["kernel"])[:, :3],
        params["answer_head"]["logit"]["kernel"],
    )
    np.testing.assert_array_equal(
        np.asarray(bigger["answer_head"]["logit"]["bias"])[:3],
        params["answer_head"]["logit"]["bias"],
    )
    smaller = resize_num_qa_labels(params, 2)
    assert smaller["answer_head"]["logit"]["kernel"].shape == (4, 2)


# ------------------------------------------------------ ComplexExperiment --


class _ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)

    def set_epoch(self, epoch):
        pass


class _TwoLoop(ComplexExperiment):
    name = "twoloop"

    def build_model(self):
        model = nn.Dense(1)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))["params"]
        return model.apply, params

    def loss_fn(self, params, batch, rng):
        pred = self.apply_fn({"params": params}, batch["x"])[:, 0]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {}

    def aux_loss(self, params, batch, rng):
        pred = self.apply_fn({"params": params}, batch["x"])[:, 0]
        loss = jnp.mean(jnp.abs(pred - batch["y"]))
        return loss, {}

    def eval_metrics(self, params, batch):
        pred = self.apply_fn({"params": params}, batch["x"])[:, 0]
        return {"mse": jnp.mean((pred - batch["y"]) ** 2)}

    def loops(self):
        return [
            Loop("main", self._main_loader, train=True),
            Loop("aux", self._aux_loader, train=True, loss_fn=self.aux_loss),
            Loop.eval_instance("val", self._val_loader),
        ]


def test_complex_experiment_runs_all_loops(tmp_path, rng):
    def mk(n=3, bs=8):
        w = np.array([1.0, -1.0, 2.0], np.float32)
        out = []
        for _ in range(n):
            x = rng.normal(size=(bs, 3)).astype(np.float32)
            out.append({"x": x, "y": x @ w})
        return out

    cfg = Config()
    cfg.logdir = str(tmp_path / "logs")
    cfg.train.update({"epochs": 2, "learning_rate": 0.1})
    exp = _TwoLoop(cfg)
    exp._main_loader = _ListLoader(mk())
    exp._aux_loader = _ListLoader(mk(2))
    exp._val_loader = _ListLoader(mk(1))
    result = exp()
    assert set(result) == {"epoch", "main", "aux", "val"}
    assert "mse" in result["val"]
    records = [
        json.loads(l) for l in open(os.path.join(exp.logdir, "steps_log.json"))
    ]
    loops_seen = {r["loop"] for r in records}
    assert loops_seen == {"main", "aux"}
    # both train loops advance one shared state: loss decreases overall
    main_losses = [r["loss"] for r in records if r["loop"] == "main"]
    assert main_losses[-1] < main_losses[0]


# ------------------------------------------------------ converter export --


def test_lxmert_jax_torch_roundtrip(rng):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = LxmertConfig(
        vocab_size=60, hidden_size=16, num_heads=2, intermediate_size=32,
        l_layers=2, x_layers=1, r_layers=1, visual_feat_dim=8,
        max_position_embeddings=32, num_answers=5, num_objects=4, num_attrs=3,
    )
    model = LxmertForPretraining(cfg)
    ids = np.zeros((1, 4), np.int32)
    feats = np.zeros((1, 2, 8), np.float32)
    pos = np.zeros((1, 2, 4), np.float32)
    params = model.init(jax.random.PRNGKey(1), ids, feats, pos)["params"]

    exported = jax_lxmert_to_torch(params)
    back = torch_lxmert_to_jax(
        {k: torch.tensor(v) for k, v in exported.items()}
    )

    import flax.traverse_util as tu

    flat_orig = tu.flatten_dict(params, sep="/")
    flat_back = tu.flatten_dict(back, sep="/")
    missing = set(flat_orig) - set(flat_back)
    # the only legitimately unexported key is the untied decoder (exported
    # as the tie) — it must still roundtrip via cls.predictions
    assert not missing, missing
    for k in flat_orig:
        np.testing.assert_allclose(
            np.asarray(flat_orig[k]), np.asarray(flat_back[k]),
            err_msg=k, rtol=1e-6,
        )

    # exported dict loads into a real HF module
    hf_cfg = transformers.LxmertConfig(
        vocab_size=60, hidden_size=16, num_attention_heads=2,
        intermediate_size=32, l_layers=2, x_layers=1, r_layers=1,
        visual_feat_dim=8, visual_pos_dim=4, num_qa_labels=5,
        num_object_labels=4, num_attr_labels=3, max_position_embeddings=32,
    )
    hf = transformers.LxmertForPreTraining(hf_cfg)
    result = hf.load_state_dict(
        {k: torch.tensor(v) for k, v in exported.items()}, strict=False
    )
    assert not result.unexpected_keys, result.unexpected_keys


# ------------------------------------------------------------------ utils --


def test_get_duration_and_step_timer():
    @get_duration
    def work():
        return sum(range(1000))

    work()
    assert work.last_duration is not None and work.last_duration >= 0

    t = StepTimer()
    for _ in range(3):
        t.tic()
        t.toc(n_items=4, result=jnp.ones(2) * 2)
    s = t.summary()
    assert s["steps"] == 2  # first (compile) step skipped
    assert s["items_per_s"] > 0


def test_handle_tpu_oom_retries():
    calls = []

    def flaky(batch=8):
        calls.append(batch)
        if batch > 2:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory allocating")
        return batch

    out = handle_tpu_oom(flaky, batch=8, alternatives=[{"batch": 4}, {"batch": 2}])
    assert out == 2 and calls == [8, 4, 2]

    def broken():
        raise ValueError("not oom")

    with pytest.raises(ValueError):
        handle_tpu_oom(broken)
    assert is_oom_error(RuntimeError("RESOURCE_EXHAUSTED"))
    assert not is_oom_error(ValueError("nope"))


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU backend


def test_draw_boxes_and_save(tmp_path, rng):
    from vltk_tpu.utils.viz import draw_boxes, save_detections

    img = (rng.uniform(0, 255, (60, 80, 3))).astype(np.uint8)
    boxes = np.array([[5, 5, 30, 40], [40, 10, 70, 50]], np.float32)
    out = draw_boxes(img, boxes, labels=["cat", "dog"], scores=[0.9, 0.7])
    assert out.size == (80, 60)
    # boxes actually drawn: some pixels changed
    assert (np.asarray(out) != img).any()

    dets = {
        "boxes": boxes,
        "obj_ids": np.array([0, 1]),
        "obj_probs": np.array([0.9, 0.7]),
        "mask": np.array([True, False]),
    }
    path = save_detections(str(tmp_path / "d.png"), img, dets, ["cat", "dog"])
    assert os.path.exists(path)
