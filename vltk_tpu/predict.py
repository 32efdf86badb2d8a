"""End-to-end inference compositions: VQA and OCR-document labeling.

The reference never shipped this composition — its demo path was manual:
extract FRCNN features (reference: tests/frcnn_test.py:11-31, one image
at a time through ``vltk/modeling/frcnn.py``), then hand-feed them to an
out-of-repo LXMERT. :class:`VQAPredictor` is that user journey as one
object, built from the framework's own pieces:

* host decode/pad  — the extraction adapter's fixed-canvas collate
  (adapters/frcnn.py:159, reference input convention
  vltk/adapters/frcnn.py:13-23),
* device preprocess + detector — one jitted program (fused
  resize/normalize/pad -> R101-C4 -> RPN -> RoIPool -> res5),
* question encoding — the first-party C++ WordPiece tokenizer
  (native/wordpiece.cpp; SURVEY §2.10 N5),
* answering — LxmertForVQA, sigmoid scores (the head is trained with
  the BCE soft loss, models/lxmert.py:vqa_soft_loss).

:class:`DocTokenClassifier` is the document-modality counterpart: OCR
words + boxes -> per-word labels through the OCR processing chain
(processing/visn.py AuxTokenize/OCRBoxFixed, reference:
vltk/processing/visn.py:59-195) and LayoutLMForTokenClassification —
the FUNSD form-understanding path the reference prepared data for but
never shipped a model or predict step for.

Everything runs at fixed shapes: images ride a static raw canvas,
questions/documents pad to ``max_seq_length``, and requests are chunked
into ``batch_size`` buckets so every call after the first reuses the
same compiled XLA programs.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from vltk_tpu import vars as V

ImageLike = Union[str, np.ndarray]


def _pad_to(arr: np.ndarray, batch: int) -> np.ndarray:
    """Zero-pad the leading dim up to the static request bucket (the
    canonical fixed-shape pad, utils/adapters.py:pad_tensor)."""
    from vltk_tpu.utils.adapters import pad_tensor

    return pad_tensor(np.asarray(arr), batch)


def _prep_ocr_entry(aux, boxfix, doc: Dict[str, Any]) -> Dict[str, Any]:
    """{"words", "boxes", "size"?} -> loader-identical OCR entry via the
    AuxTokenize + OCRBoxFixed processors."""
    words = [str(w) for w in doc["words"]]
    boxes = [list(map(float, b)) for b in doc["boxes"]]
    if len(words) != len(boxes):
        raise ValueError(
            f"{len(words)} words vs {len(boxes)} boxes in document"
        )
    entry: Dict[str, Any] = {V.text: words, V.tokenbox: boxes}
    if doc.get("size") is not None:
        entry[V.rawsize] = tuple(doc["size"])
    return boxfix(aux(entry))


def _load_answer_list(answers: Union[str, Sequence[str]]) -> List[str]:
    """Answer vocabulary: a list of strings, or a path to a json list /
    {answer: id} map (the ``labels.json`` shape the reference's
    experiment layer persisted, reference: vltk/abc/simple.py:496-529)."""
    if isinstance(answers, str):
        with open(answers) as f:
            data = json.load(f)
        if isinstance(data, dict):
            # ids index head logits directly — a pruned/sparse map would
            # silently misalign every prediction, so demand a bijection
            # onto 0..n-1
            ids = sorted(int(v) for v in data.values())
            if ids != list(range(len(data))):
                raise ValueError(
                    f"label map ids must be exactly 0..{len(data) - 1} "
                    f"(one per head logit); got {ids[:8]}..."
                )
            out = [None] * len(data)
            for k, v in data.items():
                out[int(v)] = k
            return out
        return list(data)
    return list(answers)


def _tokenizer_bundle_parts(tok):
    """(meta dict, vocab bytes) for shipping a tokenizer inside an AOT
    serving bundle (vltk_tpu/aot.py)."""
    with open(tok._vocab_path, "rb") as f:
        vocab = f.read()
    meta = {
        "name": tok.name,
        "lowercase": bool(getattr(tok, "lowercase", True)),
        "max_seq_length": int(tok.max_seq_length),
    }
    return meta, vocab


def _tokenizer_from_bundle(meta: Dict[str, Any], vocab: bytes):
    """-> (Tokenizer, TemporaryDirectory). Keep the directory object alive
    as long as the tokenizer: NativeWordPiece re-reads the vocab file
    lazily (decode)."""
    import tempfile

    from vltk_tpu.data.tokenizer import Tokenizer

    tmpdir = tempfile.TemporaryDirectory(prefix="vltk_aot_")
    path = os.path.join(tmpdir.name, "vocab.txt")
    with open(path, "wb") as f:
        f.write(vocab)
    tok = Tokenizer(
        name=meta["name"],
        vocab_path=path,
        lowercase=bool(meta.get("lowercase", True)),
        max_seq_length=int(meta["max_seq_length"]),
    )
    return tok, tmpdir


def _check_bundle_kind(path: str, meta: Dict[str, Any], want: str) -> None:
    if meta.get("kind") != want:
        raise ValueError(
            f"{path}: bundle kind {meta.get('kind')!r} is not a "
            f"{want} export"
        )


def _export_step_bundle(
    obj, path: str, *, kind: str, example_args, extra_meta: Dict[str, Any],
    platforms,
) -> str:
    """Shared single-step AOT export (the two document predictors): lower
    ``obj._step`` with ``obj.params`` baked in, bundle with the tokenizer
    vocab + geometry metadata."""
    import jax

    from vltk_tpu.aot import export_jitted, save_bundle

    # bake the full variable dict — for the int8 preset that includes any
    # calibrated "quant" scales (export after a real request, or the
    # artifact ships the dynamic-scale fallback)
    v = jax.device_get(_doc_variables(obj))
    step = export_jitted(
        lambda *args: obj._step(v, *args), example_args, platforms=platforms
    )
    tmeta, vocab = _tokenizer_bundle_parts(obj.tokenizer)
    meta = {
        "kind": kind,
        "batch_size": obj.batch_size,
        "tokenizer": tmeta,
        **extra_meta,
    }
    return save_bundle(
        path, {"step": step}, meta=meta, files={"vocab.txt": vocab}
    )


def _load_step_bundle(obj, path: str, kind: str) -> Dict[str, Any]:
    """Shared single-step bundle restore: tokenizer from the shipped
    vocab, the deserialized artifact standing in for ``_step`` (params
    are baked into it). Returns the manifest meta for class-specific
    geometry fields."""
    from vltk_tpu.aot import load_bundle

    bundle = load_bundle(path)
    _check_bundle_kind(path, bundle.meta, kind)
    obj.batch_size = int(bundle.meta["batch_size"])
    obj.tokenizer, obj._vocab_dir = _tokenizer_from_bundle(
        bundle.meta["tokenizer"], bundle.files["vocab.txt"]
    )
    obj.params = None  # baked into the artifact
    obj._quant = None  # any int8 scales are baked in too
    step = bundle.fns["step"]
    obj._step = lambda _variables, *args: step(*args)
    obj.platforms = bundle.platforms
    return bundle.meta


def _doc_variables(obj) -> Dict[str, Any]:
    """Full flax variable dict for a document predictor: params plus any
    calibrated int8 ``"quant"`` scales (layers.Int8Dense static path)."""
    v = {"params": obj.params}
    q = getattr(obj, "_quant", None)
    if q is not None:
        v["quant"] = q
    return v


def _maybe_calibrate_doc_int8(obj, ids, boxes, mask) -> None:
    """LayoutLM int8 preset (``config.int8``): one-time static-PTQ
    calibration of the encoder's Int8Dense activation scales on (up to 4
    documents of) the first real request — the document twin of
    ``VQAPredictor._maybe_calibrate_int8``. Thread-safe for multi-worker
    MicroBatchServer fronts; no-op for bundled predictors (config is
    baked into the artifact)."""
    cfg = getattr(obj, "config", None)
    if (
        cfg is None
        or not getattr(cfg, "int8", False)
        or getattr(obj, "_quant", None) is not None
    ):
        return
    import threading

    lock = obj.__dict__.setdefault("_calib_lock", threading.Lock())
    with lock:
        if obj._quant is not None:
            return
        import jax

        obj._quant = jax.jit(
            lambda p, *b: obj.model.apply(
                {"params": p}, *b, deterministic=True, mutable=["quant"]
            )[1]["quant"]
        )(obj.params, ids[:4], boxes[:4], mask[:4])


def _check_head_width(params, path: Sequence[str], n: int, what: str) -> None:
    """Loaded checkpoints must agree with the label vocabulary — a silent
    mismatch returns wrong strings (or IndexErrors) at predict time."""
    node = params
    for key in path:
        if not isinstance(node, (dict,)) and not hasattr(node, "__getitem__"):
            return
        try:
            node = node[key]
        except (KeyError, TypeError, IndexError):
            # IndexError: an ndarray at an intermediate path rejects the
            # string key this way. Unexpected tree shape either way —
            # leave it to flax's apply check
            return
    width = getattr(node, "shape", (None,))[-1]
    if width is not None and width != n:
        raise ValueError(
            f"{what} head is {width}-wide but {n} labels were given; "
            "pass the label vocabulary the checkpoint was trained over"
        )


class VQAPredictor:
    """images + questions -> ranked answer strings, fixed shapes end-to-end.

    Args:
      answers: the answer vocabulary the LXMERT head was fine-tuned over
        (list of strings, or path to a json list / {answer: id} map).
      frcnn_params / lxmert_params: flax param trees (e.g. from
        ``torch_frcnn_to_jax`` / ``torch_lxmert_to_jax``). ``None`` means
        random init — useful for smoke tests and shape validation only.
      frcnn_config / lxmert_config: architecture overrides; the LXMERT
        answer head is auto-sized to ``len(answers)``.
      batch_size: static request bucket; inputs are padded up to it so
        every call reuses one compiled program per model.
      max_seq_length: static question token budget (default: the supplied
        tokenizer's budget, else the VQA geometry's 20; giving both this
        and ``tokenizer`` requires them to agree).
      raw_canvas / resized_canvas / short / maximum: detector input
        geometry; default to the extraction adapter's production values.
    """

    def __init__(
        self,
        answers: Union[str, Sequence[str]],
        *,
        frcnn_params=None,
        lxmert_params=None,
        frcnn_config=None,
        lxmert_config=None,
        batch_size: int = 8,
        max_seq_length: Optional[int] = None,
        tokenizer=None,
        raw_canvas=None,
        resized_canvas=None,
        short: Optional[float] = None,
        maximum: Optional[float] = None,
    ):
        import jax
        import jax.numpy as jnp

        from vltk_tpu.adapters.frcnn import FRCNN as FRCNNAdapter
        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.models import (
            FRCNN,
            FRCNNConfig,
            LxmertConfig,
            LxmertForVQA,
        )
        from vltk_tpu.ops.image_ops import preprocess_batch

        self.answers = _load_answer_list(answers)
        self.batch_size = int(batch_size)
        self.raw_canvas = tuple(raw_canvas or FRCNNAdapter.raw_canvas)
        # the adapter's collate pads to ITS class raw_canvas — honor the
        # override (tiny geometries must not allocate 1344x1344 buffers)
        self._adapter = type(
            "_SizedFRCNNAdapter", (FRCNNAdapter,),
            {"raw_canvas": self.raw_canvas},
        )
        self._resized_canvas = tuple(resized_canvas or FRCNNAdapter.resized_canvas)
        self._short = float(short if short is not None else FRCNNAdapter.short)
        self._maximum = float(
            maximum if maximum is not None else FRCNNAdapter.maximum
        )

        # the VG extraction parity geometry (300 proposals), NOT the
        # 1000-proposal detectron default: it's what the unc-nlp VG
        # checkpoint was validated at and what bench.py times
        fcfg = frcnn_config or FRCNNConfig.vg_extraction()
        lcfg = lxmert_config or LxmertConfig(dtype="bfloat16")
        if lcfg.num_answers != len(self.answers):
            lcfg = dataclasses.replace(lcfg, num_answers=len(self.answers))
        if lcfg.visual_feat_dim != fcfg.res2_out_channels * 8:
            lcfg = dataclasses.replace(
                lcfg, visual_feat_dim=fcfg.res2_out_channels * 8
            )
        self.frcnn_config, self.lxmert_config = fcfg, lcfg
        self.frcnn = FRCNN(fcfg)
        self.lxmert = LxmertForVQA(lcfg)
        if tokenizer is None:
            tokenizer = Tokenizer(
                name="NativeWordPiece",
                max_seq_length=20 if max_seq_length is None else max_seq_length,
            )
        elif (
            max_seq_length is not None
            and tokenizer.max_seq_length != max_seq_length
        ):
            # a conflicting explicit budget would emit a question geometry
            # the checkpoint never saw — refuse instead of padding one way
            raise ValueError(
                f"tokenizer.max_seq_length ({tokenizer.max_seq_length}) "
                f"must equal max_seq_length ({max_seq_length})"
            )
        self.tokenizer = tokenizer
        max_seq_length = tokenizer.max_seq_length
        if self.tokenizer.vocab_size > lcfg.vocab_size:
            # ids past the embedding table NaN-fill via nn.Embed's
            # jnp.take — fail loudly at build time instead
            raise ValueError(
                f"tokenizer vocab ({self.tokenizer.vocab_size}) exceeds "
                f"LxmertConfig.vocab_size ({lcfg.vocab_size})"
            )

        if lxmert_params is not None:
            _check_head_width(
                lxmert_params, ("answer_head", "logit", "kernel"),
                len(self.answers), "answer",
            )

        ch, cw = self._resized_canvas
        if frcnn_params is None:
            frcnn_params = self.frcnn.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, ch, cw, 3), jnp.float32),
                jnp.asarray([[float(ch), float(cw)]]),
            )["params"]
        if lxmert_params is None:
            lxmert_params = self.lxmert.init(
                jax.random.PRNGKey(1),
                np.zeros((1, max_seq_length), np.int32),
                np.zeros((1, fcfg.max_detections, lcfg.visual_feat_dim), np.float32),
                np.zeros((1, fcfg.max_detections, 4), np.float32),
            )["params"]
        self.frcnn_params = frcnn_params
        self.lxmert_params = lxmert_params

        frcnn_model, lxmert_model = self.frcnn, self.lxmert
        canvas, s_, m_ = self._resized_canvas, self._short, self._maximum

        @jax.jit
        def vqa_step(fvars, lvars, raw_images, raw_sizes, ids, tmask):
            """The WHOLE device pipeline as one program: preprocess ->
            FRCNN -> box normalization -> LXMERT -> sigmoid. One dispatch
            and one fetch per chunk — the two-step formulation round-
            tripped the (B, D, 2048) features through the host just to
            normalize boxes (bench.py --infer vqa measured the composed
            form; this is the same shape)."""
            pre = preprocess_batch(
                raw_images, raw_sizes, canvas_hw=canvas, short=s_, maximum=m_
            )
            out = frcnn_model.apply(
                fvars, pre["img"], pre["sizes"], scales_yx=pre["scales_yx"]
            )
            vmask = out["mask"].astype(jnp.float32)
            boxes = out["boxes"].astype(jnp.float32)
            # [0, 1] by each row's raw (h, w) extent (the LXMERT position
            # convention — numpy twin: utils/adapters.normalize_boxes_xyxy)
            wh = jnp.maximum(raw_sizes[:, jnp.array([1, 0, 1, 0])], 1.0)
            valid = vmask[..., None] > 0
            # jnp.where, NOT "* vmask": batch PAD rows (zero-size images)
            # come out of FRCNN as NaN boxes/features, and NaN * 0 = NaN —
            # harmless for bf16 (pad-row logits are discarded) but fatal
            # for any per-TENSOR reduction over the batch (int8 dynamic
            # scales / calibration act_max would go NaN for every row)
            norm = jnp.where(
                valid, jnp.clip(boxes / wh[:, None, :], 0.0, 1.0), 0.0
            )
            feats = jnp.where(
                valid, out["roi_features"].astype(jnp.float32), 0.0
            )
            logits = lxmert_model.apply(
                lvars, ids, feats, norm, tmask, vmask,
                deterministic=True,
            )
            return {
                "scores": jax.nn.sigmoid(logits.astype(jnp.float32)),
                "boxes": boxes,
                "mask": vmask,
                "obj_ids": out["obj_ids"],
                "obj_probs": out["obj_probs"].astype(jnp.float32),
            }

        self._pre_fn = jax.jit(
            lambda img, sz: preprocess_batch(
                img, sz, canvas_hw=canvas, short=s_, maximum=m_
            )
        )
        self._frcnn_variables = {"params": frcnn_params}
        self._lxmert_variables = {"params": lxmert_params}
        self._vqa_step = vqa_step

    def warmup(self) -> None:
        """Compile (and device-place) the serving program ahead of the
        first request — serving wants the multi-second XLA compile at
        startup, not on a user's query. No-op cost when already compiled.
        For the int8 preset the first REAL request still compiles once
        more: calibration (``_maybe_calibrate_int8``) changes the program
        from dynamic to static scales, and calibrating on zeros here
        would record degenerate activation maxima."""
        B = self.batch_size
        ch, cw = self.raw_canvas
        L = self.tokenizer.max_seq_length
        self._vqa_step(
            self._frcnn_variables,
            self._lxmert_variables,
            np.zeros((B, ch, cw, 3), np.uint8),
            np.full((B, 2), 32.0, np.float32),
            np.zeros((B, L), np.int32),
            np.zeros((B, L), np.float32),
        )

    def _maybe_calibrate_int8(self, raw_imgs, sizes, ids=None, tmask=None) -> None:
        """int8 presets: one-time static-PTQ calibration on (up to 4
        images of) the first real request — same recipe as the extraction
        adapter (adapters/frcnn.py forward_dispatch). Without it Int8Conv/
        Int8Dense fall back to per-input dynamic scales, which measured
        throughput-NEUTRAL for FRCNN (BASELINE.md) — calibrated is the
        whole point of the preset. When ``lxmert_config.int8`` is set, the
        LXMERT encoder's Int8Dense scales are calibrated on the SAME
        slice's actual extracted features (not synthetic inputs), so the
        recorded maxima match production activations."""
        cfg = self.frcnn_config
        lcfg = self.lxmert_config
        want_f = cfg is not None and cfg.int8
        want_l = lcfg is not None and getattr(lcfg, "int8", False)
        if not (want_f or want_l):
            return
        # concurrent first requests (a multi-worker MicroBatchServer) must
        # not both calibrate: scales depend on the calibration batch, so a
        # race would make served numerics depend on thread timing
        import threading

        lock = self.__dict__.setdefault("_calib_lock", threading.Lock())
        with lock:
            pre = None
            if want_f and "quant" not in self._frcnn_variables:
                from vltk_tpu.models import calibrate_int8

                pre = self._pre_fn(raw_imgs[:4], sizes[:4])
                variables = dict(self._frcnn_variables)
                variables["quant"] = calibrate_int8(
                    cfg,
                    variables["params"],
                    [(pre["img"], pre["sizes"], pre["scales_yx"])],
                )
                self._frcnn_variables = variables
            if (
                want_l
                and ids is not None
                and "quant" not in self._lxmert_variables
            ):
                import jax
                import jax.numpy as jnp

                if pre is None:
                    pre = self._pre_fn(raw_imgs[:4], sizes[:4])
                # extracted features for the calib slice, through the
                # (possibly already-quantized) FRCNN
                fout = jax.jit(
                    lambda v, img, sz, sc: self.frcnn.apply(
                        v, img, sz, scales_yx=sc
                    )
                )(
                    self._frcnn_variables,
                    pre["img"], pre["sizes"], pre["scales_yx"],
                )
                vmask = fout["mask"].astype(jnp.float32)
                wh = jnp.maximum(
                    jnp.asarray(sizes[:4], jnp.float32)[
                        :, jnp.array([1, 0, 1, 0])
                    ],
                    1.0,
                )
                valid = vmask[..., None] > 0
                # where, not *: pad rows are NaN out of FRCNN and the
                # act_max batch reduction must not see them (vqa_step has
                # the same guard)
                norm = jnp.where(
                    valid,
                    jnp.clip(
                        fout["boxes"].astype(jnp.float32) / wh[:, None, :],
                        0.0, 1.0,
                    ),
                    0.0,
                )
                feats = jnp.where(
                    valid, fout["roi_features"].astype(jnp.float32), 0.0
                )
                nb = int(vmask.shape[0])
                lquant = jax.jit(
                    lambda p, *b: self.lxmert.apply(
                        {"params": p}, *b, mutable=["quant"]
                    )[1]["quant"]
                )(
                    self._lxmert_variables["params"],
                    jnp.asarray(ids[:nb]),
                    feats,
                    norm,
                    jnp.asarray(tmask[:nb]),
                    vmask,
                )
                lvars = dict(self._lxmert_variables)
                lvars["quant"] = lquant
                self._lxmert_variables = lvars

    # ------------------------------------------------------------------
    # construction helpers
    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(
        cls,
        frcnn_checkpoint: str,
        lxmert_checkpoint: str,
        answers: Union[str, Sequence[str]],
        **kwargs,
    ) -> "VQAPredictor":
        """Build from torch checkpoint files via the repo's converters
        (models/convert.py; reference resolution: frcnn.py:1757-1922)."""
        import torch

        from vltk_tpu.models import torch_frcnn_to_jax
        from vltk_tpu.models.convert import torch_lxmert_to_jax

        fsd = torch.load(frcnn_checkpoint, map_location="cpu")
        fsd = fsd.get("model", fsd) if isinstance(fsd, dict) else fsd
        lsd = torch.load(lxmert_checkpoint, map_location="cpu")
        lsd = lsd.get("model", lsd) if isinstance(lsd, dict) else lsd
        return cls(
            answers,
            frcnn_params=torch_frcnn_to_jax(fsd),
            lxmert_params=torch_lxmert_to_jax(lsd),
            **kwargs,
        )

    # ------------------------------------------------------------------
    # AOT serving bundle (vltk_tpu/aot.py)
    # ------------------------------------------------------------------
    def export_bundle(
        self, path: str, *, platforms: Optional[Sequence[str]] = None
    ) -> str:
        """Lower the composed device pipeline with the params baked in as
        constants and write one self-contained serving file (StableHLO
        artifact + tokenizer vocab + geometry/answers metadata — see
        vltk_tpu/aot.py for why this replaces the reference's
        model-code-plus-checkpoint deployment). ``platforms=("cpu",
        "tpu")`` cross-lowers so one artifact serves on either backend."""
        import jax

        from vltk_tpu.aot import export_jitted, save_bundle

        B = self.batch_size
        ch, cw = self.raw_canvas
        L = self.tokenizer.max_seq_length
        # bake the full variable dict — for the int8 preset that includes
        # any calibrated "quant" scales (export after a real request, or
        # the artifact ships the dynamic-scale fallback)
        fvars = jax.device_get(self._frcnn_variables)
        lvars = jax.device_get(self._lxmert_variables)
        step = export_jitted(
            lambda img, sz, ids, tm: self._vqa_step(
                fvars, lvars, img, sz, ids, tm
            ),
            (
                np.zeros((B, ch, cw, 3), np.uint8),
                np.zeros((B, 2), np.float32),
                np.zeros((B, L), np.int32),
                np.zeros((B, L), np.float32),
            ),
            platforms=platforms,
        )
        tmeta, vocab = _tokenizer_bundle_parts(self.tokenizer)
        meta = {
            "kind": "vqa_predictor",
            "answers": list(self.answers),
            "batch_size": B,
            "raw_canvas": [ch, cw],
            "tokenizer": tmeta,
        }
        return save_bundle(
            path, {"vqa": step}, meta=meta, files={"vocab.txt": vocab}
        )

    @classmethod
    def from_bundle(cls, path: str) -> "VQAPredictor":
        """Serve from an ``export_bundle`` file: no model construction,
        no params, no trace — the deserialized artifacts stand in for the
        jitted steps and the host side is rebuilt from the manifest."""
        return _BundledVQAPredictor(path)

    # ------------------------------------------------------------------
    # host side
    # ------------------------------------------------------------------
    def _entries(
        self, images: Sequence[ImageLike], offset: int = 0
    ) -> List[Dict[str, Any]]:
        from PIL import Image

        entries = []
        for i, img in enumerate(images):
            if isinstance(img, str):
                arr = np.asarray(Image.open(img).convert("RGB"))
            else:
                arr = np.asarray(img)
                if arr.ndim != 3 or arr.shape[-1] != 3:
                    raise ValueError(
                        f"image {offset + i}: expected (H, W, 3) RGB, "
                        f"got {arr.shape}"
                    )
            entries.append({V.img: arr, V.imgid: str(offset + i)})
        return entries

    def _pad_chunk(self, arr: np.ndarray) -> np.ndarray:
        return _pad_to(arr, self.batch_size)

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------
    def __call__(
        self,
        images: Sequence[ImageLike],
        questions: Sequence[str],
        top_k: int = 5,
    ) -> List[Dict[str, Any]]:
        """Returns one dict per (image, question) pair:

        ``answer`` (top-1 string), ``score`` (its sigmoid score),
        ``topk`` ([(answer, score)] ranked), ``boxes`` ((D, 4) raw-pixel
        xyxy), ``objects`` ((D,) VG class ids), ``object_probs``,
        ``num_boxes``.
        """
        if len(images) != len(questions):
            raise ValueError(
                f"{len(images)} images vs {len(questions)} questions"
            )
        n = len(images)
        if n == 0:
            return []
        top_k = max(1, min(int(top_k), len(self.answers)))

        # host: tokenize questions at the fixed token budget
        enc = self.tokenizer.encode_batch([str(q) for q in questions])
        ids = np.stack([e[V.input_ids] for e in enc]).astype(np.int32)
        tmask = np.stack(
            [e[V.text_attention_mask] for e in enc]
        ).astype(np.float32)

        results: List[Dict[str, Any]] = []
        for lo in range(0, n, self.batch_size):
            hi = min(lo + self.batch_size, n)
            # host: decode + pad ONLY this chunk onto the raw canvas —
            # host memory stays O(batch_size), not O(request)
            entries = self._entries(images[lo:hi], offset=lo)
            orig_hw = np.array(
                [(e[V.img].shape[0], e[V.img].shape[1]) for e in entries],
                np.float32,
            )
            collated = self._adapter.collate(entries)
            sizes = self._pad_chunk(collated[V.rawsize].astype(np.float32))
            # collate pre-shrinks raws larger than raw_canvas; this maps
            # boxes back so the returned "raw-pixel xyxy" really is the
            # caller's original pixel frame (identity when nothing shrank)
            unshrink = (
                orig_hw[:, [1, 0, 1, 0]]
                / np.maximum(collated[V.rawsize][:, [1, 0, 1, 0]], 1.0)
            )[:, None, :]
            raw_imgs = self._pad_chunk(collated[V.img])
            chunk_ids = self._pad_chunk(ids[lo:hi])
            chunk_tmask = self._pad_chunk(tmask[lo:hi])
            self._maybe_calibrate_int8(raw_imgs, sizes, chunk_ids, chunk_tmask)
            out = self._vqa_step(
                self._frcnn_variables,
                self._lxmert_variables,
                raw_imgs,
                sizes,
                chunk_ids,
                chunk_tmask,
            )
            scores = np.asarray(out["scores"])
            boxes = np.asarray(out["boxes"])
            vmask = np.asarray(out["mask"])
            obj_ids = np.asarray(out["obj_ids"])
            obj_probs = np.asarray(out["obj_probs"])
            for j in range(hi - lo):
                order = np.argsort(-scores[j])[:top_k]
                ranked = [(self.answers[a], float(scores[j, a])) for a in order]
                results.append(
                    {
                        "answer": ranked[0][0],
                        "score": ranked[0][1],
                        "topk": ranked,
                        "boxes": boxes[j] * unshrink[j],
                        "objects": obj_ids[j],
                        "object_probs": obj_probs[j],
                        "num_boxes": int(vmask[j].sum()),
                    }
                )
        return results


class _BundledVQAPredictor(VQAPredictor):
    """VQAPredictor serving an AOT bundle: inherits the whole host plane
    (decode, collate, tokenize, rank) but swaps the jitted steps for the
    bundle's deserialized artifacts — no model code or params on the
    serving host (vltk_tpu/aot.py)."""

    def __init__(self, path: str):  # deliberately NOT super().__init__
        from vltk_tpu.adapters.frcnn import FRCNN as FRCNNAdapter
        from vltk_tpu.aot import load_bundle

        bundle = load_bundle(path)
        meta = bundle.meta
        _check_bundle_kind(path, meta, "vqa_predictor")
        self.answers = list(meta["answers"])
        self.batch_size = int(meta["batch_size"])
        self.raw_canvas = tuple(meta["raw_canvas"])
        self._adapter = type(
            "_SizedFRCNNAdapter", (FRCNNAdapter,),
            {"raw_canvas": self.raw_canvas},
        )
        self.tokenizer, self._vocab_dir = _tokenizer_from_bundle(
            meta["tokenizer"], bundle.files["vocab.txt"]
        )
        self.frcnn_params = None  # baked into the artifact
        self.lxmert_params = None
        self._frcnn_variables = None
        self._lxmert_variables = None
        self.frcnn_config = None  # _maybe_calibrate_int8 reads it: no-op
        self.lxmert_config = None
        if "vqa" not in bundle.fns:
            raise ValueError(
                f"{path}: VQA bundle carries artifacts "
                f"{sorted(bundle.fns)}, expected the composed 'vqa' step — "
                "this bundle predates the one-program predictor (two-step "
                "extract/answer format); re-export it with "
                "VQAPredictor.export_bundle"
            )
        step = bundle.fns["vqa"]
        self._vqa_step = lambda _fvars, _lparams, *args: step(*args)
        self.platforms = bundle.platforms


class DocTokenClassifier:
    """OCR documents (words + boxes) -> per-word labels via LayoutLM.

    The FUNSD/form-understanding predict path: the reference built the
    data side (OCR token/box/label processors, FUNSD adapter) but shipped
    no model or inference step. Host prep reuses the framework's own OCR
    chain — ``AuxTokenize`` (word -> sub-token ids + tokenmap) and
    ``OCRBoxFixed`` (0-1000 normalized sub-token boxes) — so predict-time
    inputs are bit-identical to training-time loader entries.

    Args:
      labels: label vocabulary (list of strings, or a json list /
        {label: id} map path).
      params: flax param tree for LayoutLMForTokenClassification; ``None``
        = random init (smoke/shape tests).
      config: LayoutLMConfig override; ``num_labels`` is auto-sized and
        ``max_position_embeddings`` must cover ``max_seq_length``.
      batch_size / max_seq_length: static request bucket and sub-token
        budget (documents are truncated, the adapter convention).
    """

    def __init__(
        self,
        labels,
        *,
        params=None,
        config=None,
        batch_size: int = 4,
        max_seq_length: int = 512,
        tokenizer=None,
    ):
        import jax
        import jax.numpy as jnp

        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.models.layoutlm import (
            LayoutLMConfig,
            LayoutLMForTokenClassification,
        )
        from vltk_tpu.processing.visn import AuxTokenize, OCRBoxFixed

        self.labels = _load_answer_list(labels)
        self.batch_size = int(batch_size)
        self.max_seq_length = int(max_seq_length)

        cfg = config or LayoutLMConfig(dtype="bfloat16")
        if cfg.num_labels != len(self.labels):
            cfg = dataclasses.replace(cfg, num_labels=len(self.labels))
        if cfg.max_position_embeddings < self.max_seq_length:
            raise ValueError(
                f"max_seq_length {self.max_seq_length} exceeds the position "
                f"table ({cfg.max_position_embeddings}); raise "
                "max_position_embeddings or lower max_seq_length"
            )
        self.config = cfg
        self.model = LayoutLMForTokenClassification(cfg)
        self.tokenizer = tokenizer or Tokenizer(
            name="NativeWordPiece", max_seq_length=self.max_seq_length
        )
        if self.tokenizer.vocab_size > cfg.vocab_size:
            raise ValueError(
                f"tokenizer vocab ({self.tokenizer.vocab_size}) exceeds "
                f"LayoutLMConfig.vocab_size ({cfg.vocab_size})"
            )
        self._aux = AuxTokenize(
            tokenizer=self.tokenizer, max_visual_seq_length=self.max_seq_length
        )
        self._boxfix = OCRBoxFixed(max_visual_seq_length=self.max_seq_length)

        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(0),
                np.zeros((1, self.max_seq_length), np.int32),
                np.zeros((1, self.max_seq_length, 4), np.int32),
            )["params"]
        else:
            _check_head_width(
                params, ("classifier", "kernel"), len(self.labels), "label"
            )
        self.params = params

        model = self.model
        self._quant = None  # int8 preset: set by _maybe_calibrate_doc_int8

        @jax.jit
        def step(variables, ids, boxes, mask):
            logits = model.apply(
                variables, ids, boxes, mask, deterministic=True
            )
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        self._step = step

    @classmethod
    def from_pretrained(cls, checkpoint: str, labels, **kwargs):
        """torch LayoutLM(-ForTokenClassification) checkpoint -> predictor.
        Encoder converts via ``torch_layoutlm_to_jax``; a ``classifier.*``
        head in the state_dict is mapped too, else the head stays random
        (and the caller should fine-tune before trusting outputs)."""
        import torch

        from vltk_tpu.models.convert import torch_layoutlm_to_jax

        sd = torch.load(checkpoint, map_location="cpu")
        sd = sd.get("model", sd) if isinstance(sd, dict) else sd
        self = cls(labels, **kwargs)
        params = dict(self.params)
        params["layoutlm"] = torch_layoutlm_to_jax(sd)
        if "classifier.weight" in sd:
            params["classifier"] = {
                "kernel": np.asarray(sd["classifier.weight"]).T,
                "bias": np.asarray(sd["classifier.bias"]),
            }
            _check_head_width(
                params, ("classifier", "kernel"), len(self.labels), "label"
            )
        self.params = params
        return self

    # ------------------------------------------------------------------
    # AOT serving bundle (vltk_tpu/aot.py)
    # ------------------------------------------------------------------
    def export_bundle(
        self, path: str, *, platforms: Optional[Sequence[str]] = None
    ) -> str:
        """One self-contained serving file: the jitted step lowered with
        params baked in, plus vocab + labels + geometry."""
        B, L = self.batch_size, self.max_seq_length
        return _export_step_bundle(
            self, path,
            kind="doc_token_classifier",
            example_args=(
                np.zeros((B, L), np.int32),
                np.zeros((B, L, 4), np.int32),
                np.zeros((B, L), np.float32),
            ),
            extra_meta={"labels": list(self.labels), "max_seq_length": L},
            platforms=platforms,
        )

    @classmethod
    def from_bundle(cls, path: str) -> "DocTokenClassifier":
        return _BundledDocTokenClassifier(path)

    def warmup(self) -> None:
        """Compile the serving program ahead of the first request. For
        the int8 preset the first REAL request compiles once more:
        calibration switches dynamic scales to static ones."""
        B, L = self.batch_size, self.max_seq_length
        self._step(
            _doc_variables(self),
            np.zeros((B, L), np.int32),
            np.zeros((B, L, 4), np.int32),
            np.zeros((B, L), np.float32),
        )

    # ------------------------------------------------------------------
    def _prep(self, doc: Dict[str, Any]) -> Dict[str, Any]:
        return _prep_ocr_entry(self._aux, self._boxfix, doc)

    def __call__(
        self, documents: Sequence[Dict[str, Any]]
    ) -> List[List[Dict[str, Any]]]:
        """Each document: ``{"words": [...], "boxes": [[x0,y0,x1,y1]...],
        "size": (h, w)}`` (boxes in raw page pixels; ``size`` defaults to
        a 1000x1000 page). Returns, per document, one dict per word that
        fit the token budget: ``{"word", "label", "score"}`` — the label
        read at the word's first sub-token (the standard WordPiece
        token-classification convention)."""
        if not documents:
            return []
        entries = [self._prep(doc) for doc in documents]
        ids = np.stack([e[V.text] for e in entries]).astype(np.int32)
        boxes = np.stack([e[V.tokenbox] for e in entries]).astype(np.int32)
        mask = np.stack(
            [e[V.visual_attention_mask] for e in entries]
        ).astype(np.float32)

        pad = lambda a: _pad_to(a, self.batch_size)  # noqa: E731

        results: List[List[Dict[str, Any]]] = []
        n = len(documents)
        for lo in range(0, n, self.batch_size):
            hi = min(lo + self.batch_size, n)
            chunk = (pad(ids[lo:hi]), pad(boxes[lo:hi]), pad(mask[lo:hi]))
            _maybe_calibrate_doc_int8(self, *chunk)
            probs = np.asarray(self._step(_doc_variables(self), *chunk))
            for j in range(hi - lo):
                tokenmap = np.asarray(entries[lo + j][V.tokenmap])
                counts = tokenmap[tokenmap > 0]
                starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
                words = [str(w) for w in documents[lo + j]["words"]]
                per_word = []
                budget = self.max_seq_length - 1  # last slot is [SEP]
                for w, (word, start) in enumerate(zip(words, starts)):
                    if start >= budget:
                        break  # truncated past the token budget
                    p = probs[j, int(start)]
                    lab = int(np.argmax(p))
                    per_word.append(
                        {
                            "word": word,
                            "label": self.labels[lab],
                            "score": float(p[lab]),
                        }
                    )
                results.append(per_word)
        return results


def _best_span(
    start_scores: np.ndarray,
    end_scores: np.ndarray,
    lo: int,
    hi: int,
    max_span: int = 32,
):
    """Highest-scoring (start <= end < start+max_span) pair within
    [lo, hi) — the standard extractive-QA decode, host-side numpy (the
    logits are tiny next to the encoder forward)."""
    s = np.asarray(start_scores[lo:hi], np.float32)
    e = np.asarray(end_scores[lo:hi], np.float32)
    n = s.shape[0]
    if n == 0:
        return lo, lo, 0.0
    pair = s[:, None] + e[None, :]
    keep = np.triu(np.ones((n, n), bool)) & ~np.triu(
        np.ones((n, n), bool), k=max_span
    )
    pair = np.where(keep, pair, -np.inf)
    idx = int(np.argmax(pair))
    si, ei = divmod(idx, n)
    return lo + si, lo + ei, float(pair[si, ei])


def _subtoken_word_index(tokenmap: np.ndarray, budget: int) -> np.ndarray:
    """(L,) array mapping each sub-token position to its word index
    (-1 past the real tokens), from AuxTokenize's per-word counts."""
    counts = tokenmap[tokenmap > 0]
    out = np.full((budget,), -1, np.int32)
    pos = 0
    for w, c in enumerate(counts):
        for _ in range(int(c)):
            if pos >= budget:
                return out
            out[pos] = w
            pos += 1
    return out


class _BundledDocTokenClassifier(DocTokenClassifier):
    """DocTokenClassifier serving an AOT bundle: host OCR chain rebuilt
    from the manifest, compiled step from the artifact, no model/params."""

    def __init__(self, path: str):  # deliberately NOT super().__init__
        from vltk_tpu.processing.visn import AuxTokenize, OCRBoxFixed

        meta = _load_step_bundle(self, path, "doc_token_classifier")
        self.labels = list(meta["labels"])
        self.max_seq_length = int(meta["max_seq_length"])
        self._aux = AuxTokenize(
            tokenizer=self.tokenizer,
            max_visual_seq_length=self.max_seq_length,
        )
        self._boxfix = OCRBoxFixed(max_visual_seq_length=self.max_seq_length)


class DocSpanQA:
    """DocVQA extractive QA: document (words + boxes) + question -> the
    answer span, read back as words.

    Mirrors the training layout of ``experiments/docvqa_span.py`` exactly:
    one LayoutLM stream of ``[question sub-tokens | OCR sub-tokens]``,
    question positions carrying the full-page box, answer spans indexing
    the concatenated stream. Host prep reuses AuxTokenize/OCRBoxFixed so
    predict-time inputs match loader entries bit-for-bit.
    """

    def __init__(
        self,
        *,
        params=None,
        config=None,
        batch_size: int = 4,
        question_len: int = 20,
        doc_len: int = 128,
        max_span: int = 32,
        tokenizer=None,
    ):
        import jax
        import jax.numpy as jnp

        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.models.layoutlm import LayoutLMConfig, LayoutLMForSpanQA
        from vltk_tpu.processing.visn import AuxTokenize, OCRBoxFixed

        self.batch_size = int(batch_size)
        self.q_len = int(question_len)
        self.doc_len = int(doc_len)
        self.max_span = int(max_span)
        seq = self.q_len + self.doc_len

        cfg = config or LayoutLMConfig(dtype="bfloat16")
        if cfg.max_position_embeddings < seq:
            raise ValueError(
                f"question_len + doc_len = {seq} exceeds the position "
                f"table ({cfg.max_position_embeddings})"
            )
        self.config = cfg
        self.model = LayoutLMForSpanQA(cfg)
        self.tokenizer = tokenizer or Tokenizer(
            name="NativeWordPiece", max_seq_length=self.q_len
        )
        if self.tokenizer.vocab_size > cfg.vocab_size:
            raise ValueError(
                f"tokenizer vocab ({self.tokenizer.vocab_size}) exceeds "
                f"LayoutLMConfig.vocab_size ({cfg.vocab_size})"
            )
        if self.tokenizer.max_seq_length != self.q_len:
            raise ValueError(
                f"tokenizer.max_seq_length ({self.tokenizer.max_seq_length}) "
                f"must equal question_len ({self.q_len})"
            )
        self._aux = AuxTokenize(
            tokenizer=self.tokenizer, max_visual_seq_length=self.doc_len
        )
        self._boxfix = OCRBoxFixed(max_visual_seq_length=self.doc_len)

        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(0),
                np.zeros((1, seq), np.int32),
                np.zeros((1, seq, 4), np.int32),
            )["params"]
        self.params = params

        model = self.model
        self._quant = None  # int8 preset: set by _maybe_calibrate_doc_int8

        @jax.jit
        def step(variables, ids, boxes, mask):
            start, end = model.apply(
                variables, ids, boxes, mask, deterministic=True
            )
            return (
                jax.nn.log_softmax(start.astype(jnp.float32), axis=-1),
                jax.nn.log_softmax(end.astype(jnp.float32), axis=-1),
            )

        self._step = step

    @classmethod
    def from_pretrained(cls, checkpoint: str, **kwargs):
        """torch LayoutLM(-ForQuestionAnswering) checkpoint -> predictor.
        Encoder via ``torch_layoutlm_to_jax``; a ``qa_outputs.*`` span
        head in the state_dict is mapped too, else the head stays random
        (fine-tune before trusting outputs)."""
        import torch

        from vltk_tpu.models.convert import torch_layoutlm_to_jax

        sd = torch.load(checkpoint, map_location="cpu")
        sd = sd.get("model", sd) if isinstance(sd, dict) else sd
        self = cls(**kwargs)
        params = dict(self.params)
        params["layoutlm"] = torch_layoutlm_to_jax(sd)
        if "qa_outputs.weight" in sd:
            params["qa_outputs"] = {
                "kernel": np.asarray(sd["qa_outputs.weight"]).T,
                "bias": np.asarray(sd["qa_outputs.bias"]),
            }
        self.params = params
        return self

    # ------------------------------------------------------------------
    # AOT serving bundle (vltk_tpu/aot.py)
    # ------------------------------------------------------------------
    def export_bundle(
        self, path: str, *, platforms: Optional[Sequence[str]] = None
    ) -> str:
        """One self-contained serving file: the jitted span step lowered
        with params baked in, plus vocab + the concat-layout geometry."""
        B, seq = self.batch_size, self.q_len + self.doc_len
        return _export_step_bundle(
            self, path,
            kind="doc_span_qa",
            example_args=(
                np.zeros((B, seq), np.int32),
                np.zeros((B, seq, 4), np.int32),
                np.zeros((B, seq), np.float32),
            ),
            extra_meta={
                "question_len": self.q_len,
                "doc_len": self.doc_len,
                "max_span": self.max_span,
            },
            platforms=platforms,
        )

    @classmethod
    def from_bundle(cls, path: str) -> "DocSpanQA":
        return _BundledDocSpanQA(path)

    def warmup(self) -> None:
        """Compile the serving program ahead of the first request. For
        the int8 preset the first REAL request compiles once more:
        calibration switches dynamic scales to static ones."""
        B, seq = self.batch_size, self.q_len + self.doc_len
        self._step(
            _doc_variables(self),
            np.zeros((B, seq), np.int32),
            np.zeros((B, seq, 4), np.int32),
            np.zeros((B, seq), np.float32),
        )

    def __call__(
        self,
        documents: Sequence[Dict[str, Any]],
        questions: Sequence[str],
    ) -> List[Dict[str, Any]]:
        """Each document as in :class:`DocTokenClassifier`. Returns per
        pair: ``answer`` (the span's words joined), ``start_word`` /
        ``end_word`` (word indices into the input), ``score`` (joint
        log-probability of the span endpoints)."""
        if len(documents) != len(questions):
            raise ValueError(
                f"{len(documents)} documents vs {len(questions)} questions"
            )
        if not documents:
            return []
        n = len(documents)

        entries, word_maps, word_lists = [], [], []
        budget = self.doc_len - 1  # AuxTokenize reserves the last slot: SEP
        for doc in documents:
            entry = _prep_ocr_entry(self._aux, self._boxfix, doc)
            entries.append(entry)
            word_maps.append(
                _subtoken_word_index(np.asarray(entry[V.tokenmap]), budget)
            )
            word_lists.append([str(w) for w in doc["words"]])

        q_enc = self.tokenizer.encode_batch([str(q) for q in questions])
        q_ids = np.stack([e[V.input_ids] for e in q_enc]).astype(np.int32)
        q_mask = np.stack(
            [e[V.text_attention_mask] for e in q_enc]
        ).astype(np.int32)
        d_ids = np.stack([e[V.text] for e in entries]).astype(np.int32)
        d_boxes = np.stack([e[V.tokenbox] for e in entries])
        d_mask = np.stack(
            [e[V.visual_attention_mask] for e in entries]
        ).astype(np.int32)

        ids = np.concatenate([q_ids, d_ids], axis=1)
        q_boxes = np.zeros((n, self.q_len, 4), np.float32)
        q_boxes[..., 2:] = 1000.0  # full-page box, the training convention
        boxes = np.concatenate([q_boxes, d_boxes], axis=1).astype(np.int32)
        mask = np.concatenate([q_mask, d_mask], axis=1).astype(np.float32)

        pad = lambda a: _pad_to(a, self.batch_size)  # noqa: E731

        results: List[Dict[str, Any]] = []
        for lo in range(0, n, self.batch_size):
            hi = min(lo + self.batch_size, n)
            chunk = (pad(ids[lo:hi]), pad(boxes[lo:hi]), pad(mask[lo:hi]))
            _maybe_calibrate_doc_int8(self, *chunk)
            s_lp, e_lp = self._step(_doc_variables(self), *chunk)
            s_lp, e_lp = np.asarray(s_lp), np.asarray(e_lp)
            for j in range(hi - lo):
                k = lo + j
                n_real = int(d_mask[k].sum())
                region_hi = self.q_len + max(min(n_real, budget), 1)
                si, ei, score = _best_span(
                    s_lp[j], e_lp[j], self.q_len, region_hi, self.max_span
                )
                wmap = word_maps[k]
                sw = int(wmap[si - self.q_len])
                ew = int(wmap[ei - self.q_len])
                if sw < 0:
                    sw = ew = 0
                elif ew < sw:
                    ew = sw
                words = word_lists[k]
                results.append(
                    {
                        "answer": " ".join(words[sw:ew + 1]),
                        "start_word": sw,
                        "end_word": ew,
                        "score": score,
                    }
                )
        return results


class _BundledDocSpanQA(DocSpanQA):
    """DocSpanQA serving an AOT bundle: concat-layout host prep rebuilt
    from the manifest, compiled span step from the artifact."""

    def __init__(self, path: str):  # deliberately NOT super().__init__
        from vltk_tpu.processing.visn import AuxTokenize, OCRBoxFixed

        meta = _load_step_bundle(self, path, "doc_span_qa")
        self.q_len = int(meta["question_len"])
        self.doc_len = int(meta["doc_len"])
        self.max_span = int(meta["max_span"])
        self._aux = AuxTokenize(
            tokenizer=self.tokenizer, max_visual_seq_length=self.doc_len
        )
        self._boxfix = OCRBoxFixed(max_visual_seq_length=self.doc_len)
