"""Checkpoint save/resume with the reference's on-disk semantics.

Reference (vltk/abc/simple.py:496-529 save, 89-124 resume):
``{model}_epoch_{n}.pt`` + ``optim_epoch_{n}.pt`` + ``info.json`` (epoch,
step, scheduler state) + ``config.yaml``; resume picks the highest epoch.
(We name-scope the optimizer file — ``{model}_optim_epoch_{n}`` — so a
crash save cannot clobber the periodic pair; loads fall back to the
reference-style unscoped name for pre-existing checkpoint dirs.)
Here the tensors are flax msgpack trees; the surrounding layout and resume
rule are the same.
"""

from __future__ import annotations

import json
import os
import re
import threading
from typing import Any, Dict, Optional

import flax.serialization as fser
import jax
import numpy as np


def _host_snapshot(tree):
    """Host copy of a pytree that is ISOLATED from later updates:
    jax.device_get copies device arrays but passes host numpy arrays
    through BY REFERENCE — an in-place parameter update racing an async
    writer would then corrupt the checkpoint being serialized."""
    return jax.tree_util.tree_map(
        lambda x: np.array(x, copy=True)
        if isinstance(x, np.ndarray)
        else jax.device_get(x),
        tree,
    )


def _epoch_file(ckpt_dir: str, name: str, epoch: int) -> str:
    return os.path.join(ckpt_dir, f"{name}_epoch_{epoch}.msgpack")


def _optim_file(ckpt_dir: str, name: str, epoch: int) -> str:
    # name-scoped: a crash save (name + "_crash") must never clobber the
    # periodic checkpoint's paired optimizer state
    return os.path.join(ckpt_dir, f"{name}_optim_epoch_{epoch}.msgpack")


def _saved_epochs(ckpt_dir: str, name: str):
    """Sorted epoch numbers with a params file for ``name``."""
    if not os.path.isdir(ckpt_dir):
        return []
    pat = re.compile(re.escape(name) + r"_epoch_(\d+)\.msgpack$")
    return sorted(
        int(m.group(1)) for fn in os.listdir(ckpt_dir) if (m := pat.match(fn))
    )


def _atomic_write_bytes(path: str, data: bytes) -> None:
    """tmp + fsync + rename so not even a HOST crash can leave a
    truncated file where the previous good checkpoint used to be.
    Periodic saves rewrite the SAME epoch file; without the fsync the
    rename can be journaled before the data blocks land, so a machine
    preemption (the exact event these checkpoints exist for) right after
    a save would replace the old good file with a torn one. The final
    directory fsync makes the rename itself durable."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    dirfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
    try:
        os.fsync(dirfd)
    finally:
        os.close(dirfd)


def save_checkpoint(
    ckpt_dir: str,
    name: str,
    epoch: int,
    params,
    opt_state=None,
    info: Optional[Dict[str, Any]] = None,
    config=None,
    info_filename: str = "info.json",
) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    host_params = jax.device_get(params)
    path = _epoch_file(ckpt_dir, name, epoch)
    _atomic_write_bytes(path, fser.to_bytes(host_params))
    if opt_state is not None:
        _atomic_write_bytes(
            _optim_file(ckpt_dir, name, epoch),
            fser.to_bytes(jax.device_get(opt_state)),
        )
    full_info = {"epoch": epoch, "name": name}
    if info:
        full_info.update(info)
    # atomic + durable: a crash between truncate and write must not leave
    # a torn info.json (it pairs the params file with the resume step/rng)
    info_path = os.path.join(ckpt_dir, info_filename)
    _atomic_write_bytes(
        info_path,
        json.dumps(full_info, indent=2, default=str).encode(),
    )
    if config is not None and hasattr(config, "dump_yaml"):
        config.dump_yaml(os.path.join(ckpt_dir, "config.yaml"))
    return path


def _mid_file(ckpt_dir: str, name: str, epoch: int) -> str:
    return os.path.join(ckpt_dir, f"{name}_epoch_{epoch}_mid.msgpack")


class AsyncCheckpointWriter:
    """Serialize + write checkpoints OFF the training step path.

    The step loop pays only the device->host snapshot (which must stay
    synchronous: the next donated train step reuses those device
    buffers); msgpack encoding and the fsync'd atomic rename run on a
    background thread. At most one save is in flight — submitting the
    next waits for the previous (bounded memory, strictly ordered
    renames) — and a writer exception surfaces on the next
    ``submit()``/``wait()`` instead of vanishing in the thread."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._exc: Optional[BaseException] = None

    def submit(self, fn) -> None:
        self.wait()

        def run():
            try:
                fn()
            except BaseException as exc:  # surfaced on next submit/wait
                self._exc = exc

        self._thread = threading.Thread(
            target=run, name="vltk-ckpt-writer", daemon=True
        )
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight save (if any) is durable; re-raise
        its failure. Call before process exit and before any operation
        that must order after the save (e.g. pruning superseded files)."""
        thread, self._thread = self._thread, None
        if thread is not None:
            thread.join()
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


def save_mid_checkpoint(
    ckpt_dir: str, name: str, epoch: int, params, opt_state, info: Dict,
    writer: Optional[AsyncCheckpointWriter] = None,
) -> str:
    """Mid-epoch (periodic / preemption) checkpoint as ONE atomic file.

    The end-of-epoch layout writes params, optim, and info.json as three
    files; a kill between any two renames pairs new params with a stale
    resume record (step/rng), silently re- or under-training batches on
    resume. Mid-epoch saves happen every few steps under
    ``save_every_steps`` — orders of magnitude more kill exposure — so
    they bundle {params, opt_state, info} into one msgpack replaced with
    one rename: the checkpoint is internally consistent at ANY kill
    instant. The file is deleted once its epoch completes (the
    end-of-epoch save supersedes it).

    With ``writer`` the serialize+write happens on the writer's
    background thread (the call still snapshots device state eagerly and
    returns the final path); without it the write is synchronous.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "params": _host_snapshot(params),
        "opt_state": _host_snapshot(opt_state),
        "info_json": json.dumps({"epoch": epoch, "name": name, **info},
                                default=str),
    }
    path = _mid_file(ckpt_dir, name, epoch)
    if writer is None:
        _atomic_write_bytes(path, fser.to_bytes(payload))
    else:
        writer.submit(
            lambda: _atomic_write_bytes(path, fser.to_bytes(payload))
        )
    return path


def latest_mid_epoch(ckpt_dir: str, name: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    pat = re.compile(re.escape(name) + r"_epoch_(\d+)_mid\.msgpack$")
    epochs = [
        int(m.group(1)) for fn in os.listdir(ckpt_dir) if (m := pat.match(fn))
    ]
    return max(epochs) if epochs else None


def load_mid_checkpoint(
    ckpt_dir: str, name: str, params_template, opt_state_template, epoch: int
):
    """-> (params, opt_state, info dict) from a single-file mid checkpoint."""
    template = {
        "params": params_template,
        "opt_state": opt_state_template,
        "info_json": "",
    }
    with open(_mid_file(ckpt_dir, name, epoch), "rb") as f:
        payload = fser.from_bytes(template, f.read())
    return payload["params"], payload["opt_state"], json.loads(payload["info_json"])


def clear_mid_checkpoints(ckpt_dir: str, name: str, upto_epoch: int) -> None:
    """Remove mid-epoch files superseded by a completed epoch save."""
    if not os.path.isdir(ckpt_dir):
        return
    pat = re.compile(re.escape(name) + r"_epoch_(\d+)_mid\.msgpack$")
    for fn in os.listdir(ckpt_dir):
        m = pat.match(fn)
        if m and int(m.group(1)) <= upto_epoch:
            try:
                os.remove(os.path.join(ckpt_dir, fn))
            except FileNotFoundError:
                pass


def prune_checkpoints(ckpt_dir: str, name: str, keep: int) -> None:
    """Delete all but the ``keep`` highest-epoch checkpoints for ``name``
    (params + paired optim files). ``keep <= 0`` keeps everything — the
    reference's behavior (it never pruned, simple.py:496-529)."""
    if keep <= 0:
        return
    for epoch in _saved_epochs(ckpt_dir, name)[:-keep]:
        for path in (
            _epoch_file(ckpt_dir, name, epoch),
            _optim_file(ckpt_dir, name, epoch),
        ):
            try:
                os.remove(path)
            except FileNotFoundError:
                pass


def latest_epoch(ckpt_dir: str, name: str) -> Optional[int]:
    """Highest saved epoch for ``name`` (resume rule, simple.py:89-124)."""
    epochs = _saved_epochs(ckpt_dir, name)
    return epochs[-1] if epochs else None


def load_checkpoint(
    ckpt_dir: str,
    name: str,
    params_template,
    opt_state_template=None,
    epoch: Optional[int] = None,
):
    """Returns (params, opt_state | None, info dict). Templates provide the
    pytree structure (flax msgpack is structure-free)."""
    if epoch is None:
        epoch = latest_epoch(ckpt_dir, name)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint for {name!r} in {ckpt_dir}")
    with open(_epoch_file(ckpt_dir, name, epoch), "rb") as f:
        params = fser.from_bytes(params_template, f.read())
    opt_state = None
    opt_path = _optim_file(ckpt_dir, name, epoch)
    if not os.path.exists(opt_path):
        # checkpoint dirs written before the name-scoping (and the
        # reference layout itself, simple.py:496-529) use the unscoped
        # file — resuming from them must not silently drop Adam state
        legacy = os.path.join(ckpt_dir, f"optim_epoch_{epoch}.msgpack")
        if os.path.exists(legacy):
            opt_path = legacy
    if opt_state_template is not None and os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_state = fser.from_bytes(opt_state_template, f.read())
    info: Dict[str, Any] = {"epoch": epoch}
    info_path = os.path.join(ckpt_dir, "info.json")
    if os.path.exists(info_path):
        with open(info_path) as f:
            info.update(json.load(f))
    return params, opt_state, info


# ---------------------------------------------------------------------------
# orbax backend — sharded / multi-host checkpoints
# ---------------------------------------------------------------------------


def save_checkpoint_sharded(ckpt_dir: str, name: str, epoch: int, state_tree) -> str:
    """Save a (possibly sharded) pytree with orbax — each host writes only
    its shards, no device_get gather (use for mesh-sharded TrainStates;
    the msgpack path above gathers to host and is fine single-host)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"{name}_epoch_{epoch}_orbax"))
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, state_tree, force=True)
    checkpointer.wait_until_finished()
    with open(os.path.join(ckpt_dir, "info.json"), "w") as f:
        json.dump({"epoch": epoch, "name": name, "format": "orbax"}, f)
    return path


def load_checkpoint_sharded(ckpt_dir: str, name: str, template_tree,
                            epoch: Optional[int] = None):
    """Restore an orbax checkpoint; ``template_tree`` of jax.ShapeDtypeStruct
    or arrays (with shardings) drives placement."""
    import orbax.checkpoint as ocp

    if epoch is None:
        pat = re.compile(re.escape(name) + r"_epoch_(\d+)_orbax$")
        epochs = [
            int(m.group(1)) for fn in os.listdir(ckpt_dir) if (m := pat.match(fn))
        ]
        if not epochs:
            raise FileNotFoundError(f"no orbax checkpoint for {name!r} in {ckpt_dir}")
        epoch = max(epochs)
    path = os.path.abspath(os.path.join(ckpt_dir, f"{name}_epoch_{epoch}_orbax"))
    checkpointer = ocp.StandardCheckpointer()
    return checkpointer.restore(path, template_tree)
