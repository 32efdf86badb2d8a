"""SimpleExperiment — the reference's intended experiment lifecycle,
rebuilt as a clean JAX loop.

Reference design being rebuilt (vltk/abc/simple.py, broken at import —
SURVEY §2.8): lifecycle ``_init_dirs/_init_seed/_init_loaders/_init_models/
_init_optim/_init_checkpoint`` (62-79), ``outer_loop`` epochs x (train,
eval) (550-574), ``inner_loop`` batches -> user ``forward`` -> ``step``
(576-682), ``test_run``/``break_loop_on_test`` single-batch smoke
(652-653), epoch/iter logging to ``epoch_log.txt``/``steps_log.json``
(446-494), save/resume per epoch (89-124, 496-529).

User surface (replaces the reference's abstract ``forward/iter_tqdm/
model_list``, simple.py:748-783):

  * ``build_model()``      -> (apply_fn, params)  [required]
  * ``loss_fn(params, batch, rng)`` -> (loss, aux dict)  [required, pure]
  * ``eval_metrics(params, batch)`` -> dict  [optional]
  * ``prepare_batch(batch)`` -> pytree of arrays  [optional filter]
  * ``epoch_logstr(epoch, train_m, eval_m)``  [optional]
"""

from __future__ import annotations

import abc
import json
import os
import time
from typing import Any, Dict, Iterable

import jax
import numpy as np

from vltk_tpu.train.checkpoint import (
    AsyncCheckpointWriter,
    clear_mid_checkpoints,
    latest_epoch,
    latest_mid_epoch,
    load_checkpoint,
    load_mid_checkpoint,
    prune_checkpoints,
    save_checkpoint,
    save_mid_checkpoint,
)
from vltk_tpu.train.optim import make_optimizer
from vltk_tpu.train.steps import create_state, make_eval_step, make_train_step


class SimpleExperiment(abc.ABC):
    name: str = "experiment"

    def __init__(self, config, loaders=None, mesh=None, rules=None):
        self.config = config
        self.mesh = mesh
        self.rules = rules
        self._init_dirs()
        self._init_seed()
        self._init_loaders(loaders)
        self._init_models()
        self._init_optim()
        self._init_checkpoint()

    # -- lifecycle (reference: simple.py:62-79) -----------------------------

    def _init_dirs(self) -> None:
        self.logdir = os.path.join(self.config.logdir, self.name)
        os.makedirs(self.logdir, exist_ok=True)
        self.ckpt_dir = self.config.checkpoint_dir or os.path.join(
            self.logdir, "checkpoints"
        )
        os.makedirs(self.ckpt_dir, exist_ok=True)
        # every checkpoint write routes through ONE writer so renames stay
        # strictly ordered even when periodic saves run asynchronously
        self._ckpt_writer = AsyncCheckpointWriter()

    def _init_seed(self) -> None:
        self.rng = jax.random.PRNGKey(self.config.train.seed)

    def _init_loaders(self, loaders) -> None:
        if loaders is not None:
            self.train_loader, self.eval_loader = loaders
        else:
            from vltk_tpu.data.builder import init_datasets

            self.train_loader, self.eval_loader = init_datasets(self.config)
        if self.train_loader is None:
            raise ValueError("experiment requires a train loader")

    def _init_models(self) -> None:
        self.apply_fn, self.params = self.build_model()

    def _init_optim(self) -> None:
        steps_per_epoch = max(len(self.train_loader), 1)
        self.total_steps = steps_per_epoch * self.config.train.epochs
        self.tx = make_optimizer(self.config.train, self.total_steps)
        self.state = create_state(
            self.apply_fn, self.params, self.tx, self.mesh, self.rules,
            zero1_axis=(
                getattr(self.config.mesh, "zero1_axis", None)
                if self.mesh is not None
                else None
            ),
        )
        del self.params  # lives in state now
        self.train_step = make_train_step(
            self.loss_fn,
            self.mesh,
            accum_steps=int(getattr(self.config.train, "accum_steps", 1)),
        )
        self.eval_step = make_eval_step(self._eval_metric_fn, self.mesh)
        self.start_epoch = 0
        self.global_step = 0
        self._skip_steps = 0  # batches to replay-skip on a mid-epoch resume
        self._preempted = False

    def _init_checkpoint(self) -> None:
        """Resume from the newest checkpoint, if any: the highest
        completed epoch (reference rule, simple.py:89-124), unless a
        LATER epoch has a mid-epoch (periodic/preemption) save — then
        re-enter that epoch step-granularly."""
        full = latest_epoch(self.ckpt_dir, self.name)
        mid = latest_mid_epoch(self.ckpt_dir, self.name)
        # a mid file for an epoch <= full is a stale leftover (the epoch
        # completed; its end-of-epoch save supersedes the partial state)
        use_mid = mid is not None and (full is None or mid > full)
        epoch = mid if use_mid else full
        if epoch is None:
            return
        if use_mid:
            params, opt_state, info = load_mid_checkpoint(
                self.ckpt_dir,
                self.name,
                jax.device_get(self.state.params),
                jax.device_get(self.state.opt_state),
                epoch,
            )
        else:
            params, opt_state, info = load_checkpoint(
                self.ckpt_dir,
                self.name,
                jax.device_get(self.state.params),
                jax.device_get(self.state.opt_state),
                epoch=epoch,
            )

        def replace_like(host_tree, live_tree):
            """Restore host arrays onto the live tree's device placement —
            under a mesh the TP shardings must survive the resume, or the
            next donated step would silently replicate everything."""
            return jax.tree_util.tree_map(
                lambda host, live: jax.device_put(host, live.sharding)
                if hasattr(live, "sharding")
                else host,
                host_tree,
                live_tree,
            )

        replace = {"params": replace_like(params, self.state.params)}
        if opt_state is not None:
            replace["opt_state"] = replace_like(opt_state, self.state.opt_state)
        step = int(info.get("step", 0))
        self.state = self.state.replace(step=step, **replace)
        self.global_step = step
        legacy_mid = (
            not use_mid
            and info.get("mid_epoch")
            and int(info.get("epoch", -1)) == epoch
        )
        if use_mid or legacy_mid:
            # re-enter the interrupted epoch and replay-skip the batches
            # already trained (the loader's shuffle is a pure function of
            # seed+epoch, so the order replays exactly). legacy_mid:
            # checkpoints from before single-file mid saves recorded the
            # partial epoch via a mid_epoch flag in info.json — honor it,
            # or old dirs would silently skip the untrained epoch tail.
            self.start_epoch = epoch
            self._skip_steps = int(info.get("step_in_epoch", 0))
        else:
            self.start_epoch = epoch + 1
        rng = info.get("rng")
        if rng is not None:
            # restore the exact PRNG stream so resumed steps draw the
            # same dropout/masking randomness the uninterrupted run would
            self.rng = jax.numpy.asarray(np.asarray(rng, dtype=np.uint32))

    # -- user surface --------------------------------------------------------

    @abc.abstractmethod
    def build_model(self):
        """-> (apply_fn(params, batch, rng, train) usable in loss_fn, params)"""

    @abc.abstractmethod
    def loss_fn(self, params, batch, rng):
        """pure: -> (scalar loss, dict of scalar aux metrics)"""

    def eval_metrics(self, params, batch) -> Dict[str, Any]:
        return {}

    def prepare_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Keep array-valued keys; drop strings/objects (the reference
        moved whole batches to device, utils/base.py:302-334 — here only
        numerics cross)."""
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.dtype != object:
                out[k] = v
            elif hasattr(v, "dtype"):
                out[k] = v
        return out

    def epoch_logstr(self, epoch, train_metrics, eval_metrics) -> str:
        parts = [f"epoch={epoch}"]
        parts += [f"train_{k}={float(v):.5f}" for k, v in train_metrics.items()]
        parts += [f"eval_{k}={float(v):.5f}" for k, v in eval_metrics.items()]
        return " ".join(parts)

    # -- loops (reference: simple.py:533-682) --------------------------------

    def __call__(self) -> Dict[str, Any]:
        self._current_epoch = self.start_epoch
        restore = self._install_preemption_handler()
        try:
            return self.outer_loop()
        except BaseException:
            if self.config.save_on_crash:
                # best-effort: the train step donates the state, so an
                # exception landing between the step call and the
                # self.state reassignment leaves deleted buffers — a
                # failing crash save must not mask the real exception
                try:
                    self.save(epoch=self._current_epoch, crash=True)
                except Exception as exc:
                    import sys

                    print(f"crash save failed: {exc!r}", file=sys.stderr)
            raise
        finally:
            restore()

    def _install_preemption_handler(self):
        """SIGTERM (the TPU-pod preemption notice) sets a flag; the inner
        loop checkpoints at the next step boundary and stops cleanly so
        the rescheduled job resumes mid-epoch. Returns a restore thunk."""
        import signal

        def _on_term(signum, frame):
            self._preempted = True

        try:
            prev = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # not the main thread: flag can be set directly
            return lambda: None

        def restore():
            # prev is None when a non-Python (C-level) handler was
            # installed; signal.signal refuses None — leave ours in place
            if prev is not None:
                signal.signal(signal.SIGTERM, prev)

        return restore

    def outer_loop(self) -> Dict[str, Any]:
        last: Dict[str, Any] = {}
        for epoch in range(self.start_epoch, self.config.train.epochs):
            self._current_epoch = epoch
            if hasattr(self.train_loader, "set_epoch"):
                self.train_loader.set_epoch(epoch)
            self._steps_done_in_epoch = 0
            train_m = self.inner_loop(epoch)
            if self._preempted:
                # write the authoritative preemption checkpoint, then
                # stop so the scheduler's restart resumes from it
                self.save_mid(
                    epoch, step_in_epoch=self._steps_done_in_epoch,
                    wait=True,  # the process exits right after this
                )
                return {"epoch": epoch, "train": train_m, "preempted": True}
            eval_m = self.eval_loop()
            self.save(epoch)
            self.write_epoch(self.epoch_logstr(epoch, train_m, eval_m))
            last = {"epoch": epoch, "train": train_m, "eval": eval_m}
            if self.config.test_run and self.config.break_loop_on_test:
                break
        return last

    def inner_loop(self, epoch: int) -> Dict[str, float]:
        totals: Dict[str, float] = {}
        count = 0
        skip, self._skip_steps = self._skip_steps, 0
        # position within this epoch (in batches consumed, incl. the
        # replay-skipped prefix) — outer_loop's preemption save reads it
        self._steps_done_in_epoch = skip
        save_every = int(getattr(self.config.train, "save_every_steps", 0))
        t0 = time.perf_counter()
        with open(os.path.join(self.logdir, "steps_log.json"), "a") as log:
            # metrics are fetched ONE STEP LATE: device_get on the step
            # just dispatched would block the host until the device
            # finishes, serializing logging/batch-prep against compute
            # (on the async TPU dispatch path the device would idle every
            # step). Draining step i's metrics only after step i+1 is in
            # flight lets the fetch ride under device compute.
            pending = None  # (step_id, device metrics) awaiting fetch

            def drain(p):
                step_id, m = p
                host = {
                    k: float(v) for k, v in jax.device_get(m).items()
                }
                for k, v in host.items():
                    totals[k] = totals.get(k, 0.0) + v
                log.write(
                    json.dumps(
                        {
                            "epoch": epoch,
                            "step": step_id,
                            "sec": round(time.perf_counter() - t0, 4),
                            **host,
                        }
                    )
                    + "\n"
                )

            for batch in self._device_batches(self.train_loader, skip=skip):
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, metrics = self.train_step(self.state, batch, step_rng)
                self.global_step += 1
                count += 1
                if pending is not None:
                    drain(pending)
                pending = (self.global_step, metrics)
                if count % 16 == 0:
                    log.flush()
                self._steps_done_in_epoch = skip + count
                if save_every and count % save_every == 0:
                    self.save_mid(epoch, step_in_epoch=skip + count)
                # the flag is only ever read here for flow control; the
                # authoritative preemption checkpoint is written by
                # outer_loop (covers a signal landing during the last
                # batch, where this loop ends by exhaustion instead)
                if self._preempted or self.config.test_run:
                    break
            if pending is not None:
                drain(pending)
        return {k: v / max(count, 1) for k, v in totals.items()}

    def eval_loop(self) -> Dict[str, float]:
        if self.eval_loader is None:
            return {}
        totals: Dict[str, float] = {}
        count = 0
        # same one-step-late fetch as inner_loop: keep the device busy on
        # batch i+1 while the host accumulates batch i's metrics
        pending = None
        for batch in self._device_batches(self.eval_loader):
            metrics = self.eval_step(self.state.params, batch)
            count += 1
            if pending is not None:
                for k, v in jax.device_get(pending).items():
                    totals[k] = totals.get(k, 0.0) + float(v)
            pending = metrics
            if self.config.test_run:
                break
        if pending is not None:
            for k, v in jax.device_get(pending).items():
                totals[k] = totals.get(k, 0.0) + float(v)
        return {k: v / max(count, 1) for k, v in totals.items()}

    def _eval_metric_fn(self, params, batch):
        return self.eval_metrics(params, batch)

    def _device_batches(self, loader, skip: int = 0) -> Iterable[Dict[str, Any]]:
        # mid-epoch resume: replay the deterministic order without the
        # already-trained batches. Framework loaders skip at the INDEX
        # level (no fetch/decode of skipped entries, loader.iter_from);
        # minimal loaders fall back to consume-and-discard.
        if skip and hasattr(loader, "iter_from"):
            it, skip = loader.iter_from(skip), 0
        else:
            it = loader

        def prepared():
            for i, batch in enumerate(it):
                if i < skip:
                    continue
                yield self._put_batch(batch)

        # double buffer: batch i+1's host->device transfer is ISSUED
        # (device_put dispatches asynchronously) before batch i is
        # consumed, so the feed rides under the previous step's compute
        # instead of serializing with it (same design as
        # data/loader.device_put_iter, here mesh/sharding-aware)
        gen = prepared()
        pending = next(gen, None)
        if pending is None:
            return
        for nxt in gen:
            yield pending
            pending = nxt
        yield pending

    def _put_batch(self, batch) -> Dict[str, Any]:
        prepared = self.prepare_batch(batch)
        if self.mesh is not None:
            from vltk_tpu.parallel import shard_batch

            return shard_batch(prepared, self.mesh)

        def put(x):
            if isinstance(x, np.ndarray) and x.dtype != object:
                return jax.device_put(x)
            return x

        return jax.tree_util.tree_map(put, prepared)

    # -- persistence / logging (reference: simple.py:446-529) ----------------

    def _resume_info(self) -> Dict[str, Any]:
        return {
            "step": self.global_step,
            # the PRNG stream position: restoring it makes a resumed run
            # draw the same per-step randomness as the uninterrupted one
            "rng": [int(x) for x in np.ravel(jax.device_get(self.rng))],
        }

    def save(self, epoch: int, crash: bool = False) -> None:
        # drain any in-flight periodic save first: clear_mid_checkpoints
        # below must order AFTER it (a pending mid write landing after its
        # deletion would resurrect a stale resume point), and a writer
        # failure must surface here rather than be lost
        self._ckpt_writer.wait()
        # crash saves get their own name + info file: clobbering the main
        # files would pair pre-crash params with the crash step
        save_checkpoint(
            self.ckpt_dir,
            self.name if not crash else f"{self.name}_crash",
            epoch,
            self.state.params,
            self.state.opt_state,
            info=self._resume_info(),
            config=self.config,
            info_filename="crash_info.json" if crash else "info.json",
        )
        if not crash:
            # the completed-epoch save supersedes any partial state
            clear_mid_checkpoints(self.ckpt_dir, self.name, epoch)
            prune_checkpoints(
                self.ckpt_dir,
                self.name,
                int(getattr(self.config.train, "keep_checkpoints", 0)),
            )

    def save_mid(
        self, epoch: int, step_in_epoch: int, wait: bool = False
    ) -> None:
        """Periodic/preemption checkpoint: one atomic file, consistent at
        any kill instant (see checkpoint.save_mid_checkpoint). Periodic
        saves serialize+write on the background writer (train.async_save,
        default on) so the step loop only pays the device snapshot;
        ``wait=True`` (the preemption save — the process exits right
        after) blocks until the file is durable."""
        save_mid_checkpoint(
            self.ckpt_dir,
            self.name,
            epoch,
            self.state.params,
            self.state.opt_state,
            info={
                **self._resume_info(),
                "step_in_epoch": int(step_in_epoch),
            },
            writer=self._ckpt_writer,
        )
        if wait or not bool(
            getattr(self.config.train, "async_save", True)
        ):
            self._ckpt_writer.wait()

    def write_epoch(self, line: str) -> None:
        with open(os.path.join(self.logdir, "epoch_log.txt"), "a") as f:
            f.write(line + "\n")

    def write_iter(self, record: Dict[str, Any]) -> None:
        with open(os.path.join(self.logdir, "steps_log.json"), "a") as f:
            f.write(json.dumps(record) + "\n")
            f.flush()
