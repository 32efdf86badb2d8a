"""Training layer: optimizer, checkpoint/resume, SimpleExperiment loops."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from vltk_tpu.config import Config, MeshConfig
from vltk_tpu.models import LxmertConfig, LxmertForVQA
from vltk_tpu.models import lxmert as L
from vltk_tpu.parallel import LXMERT_RULES, make_mesh
from vltk_tpu.train import (
    SimpleExperiment,
    accuracy,
    latest_epoch,
    linear_warmup_linear_decay,
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
    vqa_score,
)


# ---------------------------------------------------------------- optim ----


def test_schedule_shape():
    sched = linear_warmup_linear_decay(1e-3, total_steps=100, warmup_ratio=0.1)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    assert float(sched(55)) < 1e-3
    np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-9)


def test_optimizer_decay_mask():
    from vltk_tpu.train.optim import _decay_mask

    params = {
        "dense": {"kernel": np.zeros((2, 2)), "bias": np.zeros(2)},
        "ln": {"scale": np.zeros(2), "bias": np.zeros(2)},
    }
    mask = _decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["ln"]["scale"] is False


# ----------------------------------------------------------- checkpoint ----


def test_checkpoint_roundtrip(tmp_path):
    ckpt = str(tmp_path / "ck")
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    opt = {"mu": np.ones(3, np.float32)}
    save_checkpoint(ckpt, "m", 0, params, opt, info={"step": 7})
    save_checkpoint(ckpt, "m", 2, params, opt, info={"step": 21})
    assert latest_epoch(ckpt, "m") == 2
    template = {"w": np.zeros((2, 3), np.float32)}
    got, got_opt, info = load_checkpoint(
        ckpt, "m", template, {"mu": np.zeros(3, np.float32)}
    )
    np.testing.assert_array_equal(got["w"], params["w"])
    np.testing.assert_array_equal(got_opt["mu"], opt["mu"])
    assert info["step"] == 21
    assert json.load(open(os.path.join(ckpt, "info.json")))["epoch"] == 2


def test_checkpoint_legacy_unscoped_optim_file(tmp_path):
    """Dirs written before the name-scoping (and the reference layout,
    simple.py:496-529) pair ``m_epoch_n`` with plain ``optim_epoch_n``;
    resuming from them must load — not silently drop — that Adam state."""
    ckpt = str(tmp_path / "ck")
    params = {"w": np.arange(4, dtype=np.float32)}
    opt = {"mu": np.full(4, 3.0, np.float32)}
    save_checkpoint(ckpt, "m", 1, params, opt)
    os.rename(
        os.path.join(ckpt, "m_optim_epoch_1.msgpack"),
        os.path.join(ckpt, "optim_epoch_1.msgpack"),
    )
    _, got_opt, _ = load_checkpoint(
        ckpt, "m", {"w": np.zeros(4, np.float32)}, {"mu": np.zeros(4, np.float32)}
    )
    np.testing.assert_array_equal(got_opt["mu"], opt["mu"])


# ------------------------------------------------------------ experiment ----


class _ListLoader:
    """Minimal loader protocol: __len__/__iter__/set_epoch."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)

    def set_epoch(self, epoch):
        pass


class _Regression(SimpleExperiment):
    """y = Wx overfit — loss must drop."""

    name = "regression"

    def build_model(self):
        model = nn.Dense(1)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))["params"]
        return model.apply, params

    def loss_fn(self, params, batch, rng):
        pred = self.apply_fn({"params": params}, batch["x"])
        loss = jnp.mean((pred[:, 0] - batch["y"]) ** 2)
        return loss, {"mse": loss}

    def eval_metrics(self, params, batch):
        pred = self.apply_fn({"params": params}, batch["x"])
        return {"mse": jnp.mean((pred[:, 0] - batch["y"]) ** 2)}


def _regression_batches(rng, n_batches=6, bs=16):
    w = np.array([1.0, -2.0, 0.5], np.float32)
    out = []
    for _ in range(n_batches):
        x = rng.normal(size=(bs, 3)).astype(np.float32)
        out.append({"x": x, "y": x @ w})
    return out


def _mk_config(tmp_path, **train_kw):
    cfg = Config()
    cfg.logdir = str(tmp_path / "logs")
    updates = dict(epochs=3, learning_rate=0.3, warmup_ratio=0.05)
    updates.update(train_kw)
    cfg.train.update(updates)
    return cfg


def test_experiment_loss_drops_and_logs(tmp_path, rng):
    batches = _regression_batches(rng)
    cfg = _mk_config(tmp_path)
    exp = _Regression(cfg, loaders=(_ListLoader(batches), _ListLoader(batches[:2])))
    result = exp()
    assert result["epoch"] == 2
    steps_log = os.path.join(exp.logdir, "steps_log.json")
    records = [json.loads(l) for l in open(steps_log)]
    assert records[-1]["loss"] < records[0]["loss"] * 0.5
    assert os.path.exists(os.path.join(exp.logdir, "epoch_log.txt"))
    # per-epoch checkpoints exist
    assert latest_epoch(exp.ckpt_dir, "regression") == 2


def test_experiment_resume(tmp_path, rng):
    batches = _regression_batches(rng)
    cfg = _mk_config(tmp_path)
    loaders = (_ListLoader(batches), None)
    exp = _Regression(cfg, loaders=loaders)
    exp()
    final_params = jax.device_get(exp.state.params)

    # a fresh experiment over the same dirs resumes at epoch 3 => no-op run
    exp2 = _Regression(cfg, loaders=loaders)
    assert exp2.start_epoch == 3
    np.testing.assert_allclose(
        jax.device_get(exp2.state.params)["kernel"],
        final_params["kernel"],
        rtol=1e-6,
    )
    out = exp2()
    assert out == {}  # nothing left to train


def _final_params(tmp_path, batches, **train_kw):
    """Uninterrupted run -> host param tree (the exactness ground truth)."""
    cfg = _mk_config(tmp_path, **train_kw)
    exp = _Regression(cfg, loaders=(_ListLoader(batches), None))
    exp()
    return jax.device_get(exp.state.params)


def _preempt_after(exp, n_steps, action=None):
    """Wrap exp.train_step to fire ``action`` after the n-th step (default:
    deliver a real SIGTERM to this process — the TPU preemption notice)."""
    import signal

    orig = exp.train_step
    calls = {"n": 0}

    def wrapped(state, batch, step_rng):
        out = orig(state, batch, step_rng)
        calls["n"] += 1
        if calls["n"] == n_steps:
            if action is None:
                signal.raise_signal(signal.SIGTERM)
            else:
                action()
        return out

    exp.train_step = wrapped


def test_sigterm_mid_epoch_saves_and_resume_is_exact(tmp_path, rng):
    """A SIGTERM mid-epoch checkpoints at the step boundary; a fresh
    experiment resumes into that epoch, replay-skips the trained batches,
    restores the PRNG stream, and finishes numerically identical to the
    uninterrupted run (6 batches/epoch x 3 epochs; preempt at step 9 =
    step 3 of epoch 1)."""
    batches = _regression_batches(rng)
    truth = _final_params(tmp_path / "truth", batches)

    cfg = _mk_config(tmp_path / "run")
    exp = _Regression(cfg, loaders=(_ListLoader(batches), None))
    _preempt_after(exp, 9)
    res = exp()
    assert res.get("preempted") is True
    assert res["epoch"] == 1

    resumed = _Regression(cfg, loaders=(_ListLoader(batches), None))
    assert resumed.start_epoch == 1
    assert resumed._skip_steps == 3
    assert resumed.global_step == 9
    out = resumed()
    assert out["epoch"] == 2 and "preempted" not in out
    got = jax.device_get(resumed.state.params)
    np.testing.assert_allclose(got["kernel"], truth["kernel"], rtol=1e-6)
    np.testing.assert_allclose(got["bias"], truth["bias"], rtol=1e-6)
    # the resumed run trained exactly the remaining 9 steps
    assert resumed.global_step == 18
    # and its PRNG stream sits exactly where 18 uninterrupted splits land
    key = jax.random.PRNGKey(cfg.train.seed)
    for _ in range(18):
        key, _ = jax.random.split(key)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(resumed.rng)), np.asarray(key)
    )


@pytest.mark.parametrize("async_save", [True, False])
def test_periodic_save_survives_hard_kill(tmp_path, rng, async_save):
    """save_every_steps checkpoints mid-epoch; after an abrupt death (no
    SIGTERM, nothing flushed beyond the periodic save) a fresh experiment
    resumes from the last DURABLE periodic save and the lost steps are
    replayed — final params match the uninterrupted run exactly.

    async_save=False (sync writer): the step-4 save is durable before
    step 5 runs, so the resume point is exactly 4 — the deterministic
    guarantee. async_save=True (the default): durability lags by at most
    the one in-flight write, so at a kill during step 5 the durable save
    is 4 (writer kept up) or 2 (it hadn't finished — observed under CPU
    contention); EITHER resume point must replay to the exact same final
    params. Orbax-style async checkpointing makes the same trade."""
    batches = _regression_batches(rng)
    truth = _final_params(tmp_path / "truth", batches, save_every_steps=2)

    cfg = _mk_config(
        tmp_path / "run", save_every_steps=2, async_save=async_save
    )
    cfg.save_on_crash = False  # simulate a kill -9: no crash handler ran
    exp = _Regression(cfg, loaders=(_ListLoader(batches), None))

    def die():
        raise RuntimeError("simulated hard kill")

    _preempt_after(exp, 5, action=die)
    with pytest.raises(RuntimeError):
        exp()

    resumed = _Regression(cfg, loaders=(_ListLoader(batches), None))
    assert resumed.start_epoch == 0
    if async_save:
        # step 5 was lost; the in-flight step-4 save may or may not have
        # become durable before the kill instant
        assert resumed._skip_steps in (2, 4)
    else:
        assert resumed._skip_steps == 4  # durable before step 5 by contract
    assert resumed.global_step == resumed._skip_steps
    out = resumed()
    assert out["epoch"] == 2
    got = jax.device_get(resumed.state.params)
    np.testing.assert_allclose(got["kernel"], truth["kernel"], rtol=1e-6)
    np.testing.assert_allclose(got["bias"], truth["bias"], rtol=1e-6)


def test_crash_save_does_not_clobber_periodic_state(tmp_path, rng):
    """The crash handler writes name-scoped files (regression_crash_*);
    it must never overwrite the periodic checkpoint's params/optimizer
    pair, or resume would mix step-k params with crash-time Adam state."""
    batches = _regression_batches(rng)
    truth = _final_params(tmp_path / "truth", batches, save_every_steps=2)

    class _Bomb(_ListLoader):
        """Raises once, from the data side (state intact — the realistic
        crash; a post-step raise leaves donated state buffers deleted and
        the crash save degrades to a logged warning)."""

        def __init__(self, batches, at):
            super().__init__(batches)
            self.at, self.armed = at, True

        def __iter__(self):
            for i, b in enumerate(self.batches):
                if self.armed and i == self.at:
                    self.armed = False
                    raise RuntimeError("simulated data corruption")
                yield b

    cfg = _mk_config(tmp_path / "run", save_every_steps=2)
    cfg.save_on_crash = True
    exp = _Regression(cfg, loaders=(_Bomb(batches, at=5), None))
    with pytest.raises(RuntimeError):
        exp()
    files = os.listdir(exp.ckpt_dir)
    assert any(f.startswith("regression_crash_epoch_") for f in files)

    resumed = _Regression(cfg, loaders=(_ListLoader(batches), None))
    assert resumed._skip_steps == 4  # the periodic save, not the crash one
    assert resumed.global_step == 4
    resumed()
    got = jax.device_get(resumed.state.params)
    np.testing.assert_allclose(got["kernel"], truth["kernel"], rtol=1e-6)
    np.testing.assert_allclose(got["bias"], truth["bias"], rtol=1e-6)


def test_config_accum_steps_matches_full_batch(tmp_path, rng):
    """train.accum_steps reaches make_train_step from the config surface
    and reproduces the full-batch update (bs=16 split into 4x4 micro)."""
    batches = _regression_batches(rng)
    truth = _final_params(tmp_path / "truth", batches)
    cfg = _mk_config(tmp_path / "accum", accum_steps=4)
    exp = _Regression(cfg, loaders=(_ListLoader(batches), None))
    exp()
    got = jax.device_get(exp.state.params)
    np.testing.assert_allclose(got["kernel"], truth["kernel"], rtol=1e-5)
    np.testing.assert_allclose(got["bias"], truth["bias"], rtol=1e-5)


def test_legacy_info_json_mid_epoch_resume(tmp_path, rng):
    """Pre-single-file-mid-checkpoint dirs recorded a partial epoch via a
    mid_epoch flag in info.json next to the regular epoch files; resume
    must still re-enter that epoch step-granularly instead of silently
    skipping the untrained tail."""
    batches = _regression_batches(rng)
    truth = _final_params(tmp_path / "truth", batches)

    cfg = _mk_config(tmp_path / "run")
    exp = _Regression(cfg, loaders=(_ListLoader(batches), None))
    # run epoch 0 fully + 3 steps of epoch 1, then write the LEGACY
    # layout by hand: regular files + mid_epoch info.json
    _preempt_after(exp, len(batches) + 3)
    exp()
    save_checkpoint(
        exp.ckpt_dir, exp.name, 1,
        exp.state.params, exp.state.opt_state,
        info={
            "step": exp.global_step,
            "rng": [int(x) for x in np.ravel(jax.device_get(exp.rng))],
            "mid_epoch": True,
            "step_in_epoch": 3,
        },
    )
    for f in os.listdir(exp.ckpt_dir):  # drop the new-format mid file
        if f.endswith("_mid.msgpack"):
            os.remove(os.path.join(exp.ckpt_dir, f))

    resumed = _Regression(cfg, loaders=(_ListLoader(batches), None))
    assert resumed.start_epoch == 1
    assert resumed._skip_steps == 3
    resumed()
    got = jax.device_get(resumed.state.params)
    np.testing.assert_allclose(got["kernel"], truth["kernel"], rtol=1e-6)
    np.testing.assert_allclose(got["bias"], truth["bias"], rtol=1e-6)


def test_completed_epoch_clears_mid_checkpoints(tmp_path, rng):
    batches = _regression_batches(rng)
    cfg = _mk_config(tmp_path, save_every_steps=2)
    exp = _Regression(cfg, loaders=(_ListLoader(batches), None))
    exp()
    files = os.listdir(exp.ckpt_dir)
    assert not any("_mid.msgpack" in f for f in files)  # all superseded
    # and no stray .tmp from the atomic writes
    assert not any(f.endswith(".tmp") for f in files)


def test_keep_checkpoints_prunes_old_epochs(tmp_path, rng):
    from vltk_tpu.train.checkpoint import latest_epoch as _latest

    batches = _regression_batches(rng)
    cfg = _mk_config(tmp_path, keep_checkpoints=2)
    exp = _Regression(cfg, loaders=(_ListLoader(batches), None))
    exp()
    files = sorted(os.listdir(exp.ckpt_dir))
    assert "regression_epoch_0.msgpack" not in files  # pruned
    assert "regression_epoch_1.msgpack" in files
    assert "regression_epoch_2.msgpack" in files
    assert "regression_optim_epoch_0.msgpack" not in files
    assert _latest(exp.ckpt_dir, "regression") == 2
    # a fresh experiment still resumes from the retained latest
    exp2 = _Regression(cfg, loaders=(_ListLoader(batches), None))
    assert exp2.start_epoch == 3


def test_experiment_test_run_single_batch(tmp_path, rng):
    batches = _regression_batches(rng)
    cfg = _mk_config(tmp_path)
    cfg.test_run = True
    exp = _Regression(cfg, loaders=(_ListLoader(batches), None))
    exp()
    records = [json.loads(l) for l in open(os.path.join(exp.logdir, "steps_log.json"))]
    assert len(records) == 1  # single batch, single epoch


# ----------------------------------------------- LXMERT VQA on the mesh ----

TINY = LxmertConfig(
    vocab_size=50,
    hidden_size=16,
    num_heads=2,
    intermediate_size=32,
    l_layers=1,
    x_layers=1,
    r_layers=1,
    visual_feat_dim=8,
    max_position_embeddings=32,
    num_answers=4,
)


class _VQAExperiment(SimpleExperiment):
    name = "vqa_tiny"

    def build_model(self):
        self.model = LxmertForVQA(TINY)
        ids = np.zeros((1, 6), np.int32)
        feats = np.zeros((1, 3, TINY.visual_feat_dim), np.float32)
        pos = np.zeros((1, 3, 4), np.float32)
        params = self.model.init(jax.random.PRNGKey(0), ids, feats, pos)["params"]
        return self.model.apply, params

    def _logits(self, params, batch, deterministic, rng=None):
        rngs = None if deterministic else {"dropout": rng}
        return self.apply_fn(
            {"params": params},
            batch["input_ids"],
            batch["features"],
            batch["boxes"],
            batch["text_attention_mask"],
            deterministic=deterministic,
            rngs=rngs,
        )

    def loss_fn(self, params, batch, rng):
        logits = self._logits(params, batch, deterministic=False, rng=rng)
        loss = L.vqa_soft_loss(logits, batch["scores"])
        return loss, {"vqa_score": vqa_score(logits, batch["scores"])}

    def eval_metrics(self, params, batch):
        logits = self._logits(params, batch, deterministic=True)
        return {"vqa_score": vqa_score(logits, batch["scores"])}


def _vqa_batches(rng, n=4, bs=8, s=6, v=3):
    out = []
    for _ in range(n):
        ids = rng.integers(0, TINY.vocab_size, (bs, s)).astype(np.int32)
        scores = np.zeros((bs, TINY.num_answers), np.float32)
        scores[np.arange(bs), rng.integers(0, TINY.num_answers, bs)] = 1.0
        out.append(
            {
                "input_ids": ids,
                "text_attention_mask": np.ones((bs, s), np.float32),
                "features": rng.normal(size=(bs, v, TINY.visual_feat_dim)).astype(
                    np.float32
                ),
                "boxes": rng.uniform(0, 1, (bs, v, 4)).astype(np.float32),
                "scores": scores,
            }
        )
    return out


def test_vqa_experiment_on_mesh(tmp_path, rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(MeshConfig(axes=(("data", 4), ("model", 2))))
    cfg = _mk_config(tmp_path, epochs=2, learning_rate=0.01)
    batches = _vqa_batches(rng)
    exp = _VQAExperiment(
        cfg,
        loaders=(_ListLoader(batches), _ListLoader(batches[:1])),
        mesh=mesh,
        rules=LXMERT_RULES,
    )
    result = exp()
    assert "vqa_score" in result["eval"]
    records = [
        json.loads(l) for l in open(os.path.join(exp.logdir, "steps_log.json"))
    ]
    assert records[-1]["loss"] < records[0]["loss"]


def test_orbax_sharded_checkpoint_roundtrip(tmp_path):
    """Sharded save/restore preserves values and shardings."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vltk_tpu.train.checkpoint import (
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    sharding = NamedSharding(mesh, P(None, "model"))
    w = jax.device_put(
        jnp.arange(32, dtype=jnp.float32).reshape(4, 8), sharding
    )
    tree = {"layer": {"kernel": w, "bias": jnp.ones(8)}}
    save_checkpoint_sharded(str(tmp_path), "m", 3, tree)

    template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        tree,
    )
    restored = load_checkpoint_sharded(str(tmp_path), "m", template)
    np.testing.assert_array_equal(
        np.asarray(restored["layer"]["kernel"]), np.asarray(w)
    )
    assert restored["layer"]["kernel"].sharding.spec == P(None, "model")


def test_vqa_experiment_auto_sizes_answer_head(tmp_path, rng):
    """num_answers follows the loaders' answer vocabulary."""
    from vltk_tpu.experiments import Experiments

    batches = _vqa_batches(rng, n=1)

    class Loader(_ListLoader):
        metadata_ids = {"answers": {f"a{i}": i for i in range(9)}}

    cfg = _mk_config(tmp_path, epochs=1, learning_rate=0.01)
    cfg.test_run = True
    cfg.data.update({"max_detections": 3, "visual_dim": 8})
    cfg.data.lang.update({"max_seq_length": 6})

    class Tiny(Experiments.get("lxmert_vqa")):
        model_config = TINY  # num_answers=4 but vocab has 9

    exp = Tiny(cfg, loaders=(Loader(batches), None))
    assert exp.model_config.num_answers == 9
    params = jax.device_get(exp.state.params)
    assert params["answer_head"]["logit"]["kernel"].shape[-1] == 9


def test_mesh_zero1_from_config(tmp_path, rng):
    """mesh.zero1_axis='data' reaches create_state from the config
    surface: Adam moments come out physically sharded over data."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = _mk_config(tmp_path, epochs=1)
    cfg.test_run = True
    cfg.mesh.zero1_axis = "data"
    batches = _vqa_batches(rng, n=1)
    exp = _VQAExperiment(
        cfg, loaders=(_ListLoader(batches), None),
        mesh=make_mesh(MeshConfig(axes=(("data", 4), ("model", 2)))),
        rules=LXMERT_RULES,
    )
    sharded = []

    def visit(x):
        spec = getattr(getattr(x, "sharding", None), "spec", ())
        if any(ax == "data" for ax in spec if ax):
            sharded.append(x)

    jax.tree_util.tree_map(visit, exp.state.opt_state)
    assert sharded, "no optimizer moment sharded over the data axis"
    exp()  # one step trains under the sharded state


def test_mesh_mid_epoch_preemption_resume_exact(tmp_path, rng):
    """SIGTERM mid-epoch on the SHARDED experiment: the single-file mid
    checkpoint gathers the dp x tp sharded state, the restart re-enters
    the epoch step-granularly with TP shardings restored, and the final
    params match the uninterrupted mesh run exactly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import PartitionSpec as P

    batches = _vqa_batches(rng, n=6)
    mesh_cfg = MeshConfig(axes=(("data", 4), ("model", 2)))

    def mk(dirname):
        cfg = _mk_config(tmp_path / dirname, epochs=2, learning_rate=0.01)
        return cfg

    truth_exp = _VQAExperiment(
        mk("truth"), loaders=(_ListLoader(batches), None),
        mesh=make_mesh(mesh_cfg), rules=LXMERT_RULES,
    )
    truth_exp()
    truth = jax.device_get(truth_exp.state.params)

    cfg = mk("run")
    exp = _VQAExperiment(
        cfg, loaders=(_ListLoader(batches), None),
        mesh=make_mesh(mesh_cfg), rules=LXMERT_RULES,
    )
    _preempt_after(exp, 9)  # epoch 1, after 3 of its 6 batches
    res = exp()
    assert res.get("preempted") is True

    resumed = _VQAExperiment(
        cfg, loaders=(_ListLoader(batches), None),
        mesh=make_mesh(mesh_cfg), rules=LXMERT_RULES,
    )
    assert resumed.start_epoch == 1
    assert resumed._skip_steps == 3
    q = resumed.state.params["lxmert"]["layer_0"]["att"]["query"]["kernel"]
    assert q.sharding.spec == P(None, "model"), q.sharding
    resumed()
    got = jax.device_get(resumed.state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6),
        got, truth,
    )


def test_mesh_resume_preserves_shardings(tmp_path, rng):
    """Checkpoint resume under a mesh must restore the TP shardings (a
    plain host-array replace would silently replicate everything)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(MeshConfig(axes=(("data", 4), ("model", 2))))
    cfg = _mk_config(tmp_path, epochs=1, learning_rate=0.01)
    cfg.test_run = True
    batches = _vqa_batches(rng, n=1)
    loaders = (_ListLoader(batches), None)
    exp = _VQAExperiment(cfg, loaders=loaders, mesh=mesh, rules=LXMERT_RULES)
    exp()

    exp2 = _VQAExperiment(cfg, loaders=loaders, mesh=mesh, rules=LXMERT_RULES)
    assert exp2.start_epoch == 1
    q = exp2.state.params["lxmert"]["layer_0"]["att"]["query"]["kernel"]
    assert q.sharding.spec == P(None, "model"), q.sharding
    # values actually restored
    np.testing.assert_allclose(
        np.asarray(q), np.asarray(exp.state.params["lxmert"]["layer_0"]["att"]["query"]["kernel"]),
        rtol=1e-6,
    )


# -------------------------------------------------- accumulation / remat ----


def _tiny_vqa_setup(seed=0):
    cfg = LxmertConfig(
        vocab_size=64, hidden_size=16, num_heads=2, intermediate_size=32,
        l_layers=1, x_layers=1, r_layers=1, visual_feat_dim=8,
        max_position_embeddings=32, num_answers=6, num_objects=5, num_attrs=3,
    )
    model = LxmertForVQA(cfg)
    rng = np.random.default_rng(seed)
    n, s, v = 8, 6, 3
    batch = {
        "ids": rng.integers(0, cfg.vocab_size, (n, s)).astype(np.int32),
        "feats": rng.normal(size=(n, v, cfg.visual_feat_dim)).astype(np.float32),
        "pos": rng.uniform(0, 1, (n, v, 4)).astype(np.float32),
        "scores": np.eye(cfg.num_answers, dtype=np.float32)[
            rng.integers(0, cfg.num_answers, n)
        ],
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["ids"][:1], batch["feats"][:1],
        batch["pos"][:1],
    )["params"]
    return cfg, model, params, batch


def test_grad_accumulation_matches_full_batch():
    """accum_steps=4 must produce the same post-step params as the plain
    full-batch step (mean-reduced loss; deterministic forward)."""
    import optax

    from vltk_tpu.train import create_state, make_train_step

    cfg, model, params, batch = _tiny_vqa_setup()

    def loss_fn(p, b, step_rng):
        logits = model.apply({"params": p}, b["ids"], b["feats"], b["pos"])
        return L.vqa_soft_loss(logits, b["scores"]), {}

    out = {}
    for accum in (1, 4):
        tx = optax.adamw(1e-2)
        state = create_state(model.apply, params, tx)
        step = make_train_step(loss_fn, accum_steps=accum, donate=False)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        out[accum] = (state.params, float(metrics["loss"]))

    np.testing.assert_allclose(out[1][1], out[4][1], rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        ),
        out[1][0], out[4][0],
    )


def test_remat_matches_baseline():
    """cfg.remat=True must change nothing numerically: same params tree,
    same forward, same gradients — only the backward's memory schedule
    differs (jax.checkpoint recompute)."""
    cfg, model, params, batch = _tiny_vqa_setup()
    r_cfg = LxmertConfig(**{**cfg.__dict__, "remat": True})
    r_model = LxmertForVQA(r_cfg)

    # identical parameter structure (remat wrapping preserves names)
    r_params = r_model.init(
        jax.random.PRNGKey(0), batch["ids"][:1], batch["feats"][:1],
        batch["pos"][:1],
    )["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        r_params
    )

    def loss(m):
        def f(p):
            logits = m.apply({"params": p}, batch["ids"], batch["feats"],
                             batch["pos"])
            return L.vqa_soft_loss(logits, batch["scores"])
        return f

    l0, g0 = jax.value_and_grad(loss(model))(params)
    l1, g1 = jax.value_and_grad(loss(r_model))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        g0, g1,
    )
    # the compiled backward actually rematerializes: remat HLO recomputes
    # the encoder (more fusions/dots than the stored-activation backward)
    hlo0 = jax.jit(jax.grad(loss(model))).lower(params).compile().as_text()
    hlo1 = jax.jit(jax.grad(loss(r_model))).lower(params).compile().as_text()
    assert hlo1.count("fusion") >= hlo0.count("fusion")


def test_vqa_prepare_batch_normalizes_boxes_with_rawsize():
    """Extraction rows store RAW-pixel boxes + their rawsize extent; the
    VQA experiment must normalize positions to [0, 1] (the convention
    HF-compatible heads and predict.VQAPredictor use). Legacy tables
    without the rawsize column keep raw coordinates."""
    from vltk_tpu import vars as V
    from vltk_tpu.experiments.lxmert_vqa import LxmertVQAExperiment

    exp = object.__new__(LxmertVQAExperiment)  # prepare_batch is pure
    boxes = np.asarray(
        [[[0.0, 0.0, 32.0, 24.0], [16.0, 12.0, 64.0, 48.0]]], np.float32
    )
    batch = {
        V.input_ids: np.zeros((1, 4), np.int32),
        V.features: np.zeros((1, 2, 8), np.float32),
        V.boxes: boxes.copy(),
        V.rawsize: np.asarray([[48.0, 64.0]], np.float32),  # (h, w)
    }
    out = exp.prepare_batch(batch)
    np.testing.assert_allclose(
        out[V.boxes],
        [[[0.0, 0.0, 0.5, 0.5], [0.25, 0.25, 1.0, 1.0]]],
        atol=1e-6,
    )
    # no rawsize -> raw boxes pass through untouched (legacy tables)
    legacy = {k: v for k, v in batch.items() if k != V.rawsize}
    legacy[V.boxes] = boxes.copy()
    out2 = exp.prepare_batch(legacy)
    np.testing.assert_array_equal(out2[V.boxes], boxes)


class TestAsyncCheckpointWriter:
    def test_orders_submits_and_surfaces_errors(self):
        import time as _time

        from vltk_tpu.train.checkpoint import AsyncCheckpointWriter

        w = AsyncCheckpointWriter()
        order = []
        w.submit(lambda: (_time.sleep(0.05), order.append(1)))
        w.submit(lambda: order.append(2))  # must wait for 1 first
        w.wait()
        assert order == [1, 2]

        def boom():
            raise OSError("disk full")

        w.submit(boom)
        with pytest.raises(OSError, match="disk full"):
            w.wait()
        # reusable after a failure
        w.submit(lambda: order.append(3))
        w.wait()
        assert order == [1, 2, 3]

    def test_async_mid_checkpoint_roundtrip(self, tmp_path):
        from vltk_tpu.train import checkpoint as C

        w = C.AsyncCheckpointWriter()
        params = {"w": np.arange(6, dtype=np.float32)}
        opt = {"m": np.zeros(6, np.float32)}
        C.save_mid_checkpoint(
            str(tmp_path), "exp", 0, params, opt, {"step": 7}, writer=w
        )
        w.wait()  # durable now
        p2, o2, info = C.load_mid_checkpoint(
            str(tmp_path), "exp", params, opt, 0
        )
        np.testing.assert_array_equal(p2["w"], params["w"])
        np.testing.assert_array_equal(o2["m"], opt["m"])
        assert info["step"] == 7

    def test_snapshot_isolated_from_later_updates(self, tmp_path):
        """The device->host snapshot happens at submit time: mutating the
        live params after save_mid_checkpoint returns must not leak into
        the file the writer is still serializing."""
        import time as _time

        from vltk_tpu.train import checkpoint as C

        w = C.AsyncCheckpointWriter()
        params = {"w": np.arange(6, dtype=np.float32)}
        # slow the writer so the mutation definitely races the write
        real = C._atomic_write_bytes

        def slow_write(path, data):
            _time.sleep(0.05)
            real(path, data)

        C._atomic_write_bytes, orig = slow_write, C._atomic_write_bytes
        try:
            C.save_mid_checkpoint(
                str(tmp_path), "exp", 1, params, {"m": np.zeros(1)},
                {"step": 1}, writer=w,
            )
            params["w"] += 100.0  # the "next train step"
            w.wait()
        finally:
            C._atomic_write_bytes = orig
        p2, _, _ = C.load_mid_checkpoint(
            str(tmp_path), "exp",
            {"w": np.zeros(6, np.float32)}, {"m": np.zeros(1)}, 1,
        )
        np.testing.assert_array_equal(p2["w"], np.arange(6, dtype=np.float32))


def test_device_batches_prefetch_device_arrays(tmp_path, rng):
    """The experiment feed is double-buffered: batches come out as device
    arrays (the host->device put was already issued one batch ahead), in
    the same order, with values intact."""
    batches = _regression_batches(rng, n_batches=4)
    cfg = _mk_config(tmp_path)
    exp = _Regression(
        cfg, loaders=(_ListLoader(batches), _ListLoader(batches[:1]))
    )
    out = list(exp._device_batches(_ListLoader(batches)))
    assert len(out) == 4
    for got, want in zip(out, batches):
        assert isinstance(got["x"], jax.Array)
        np.testing.assert_allclose(np.asarray(got["x"]), want["x"])
        np.testing.assert_allclose(np.asarray(got["y"]), want["y"])
    # skip composes with the prefetch
    skipped = list(exp._device_batches(_ListLoader(batches), skip=2))
    assert len(skipped) == 2
    np.testing.assert_allclose(np.asarray(skipped[0]["x"]), batches[2]["x"])
