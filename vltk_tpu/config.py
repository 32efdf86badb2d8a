"""Configuration system.

Rebuilds the reference's three-part config surface (reference:
vltk/abc/config.py, vltk/configs.py, vltk/future/cli.py:70-81) on plain
dataclasses:

* attribute-style nested configs with iteration and ``to_dict``;
* recursive ``update`` from dicts, with ``_overwritten`` diff tracking;
* yaml round-trip plus dot-flag (``a.b.c=x``) unflattening for the CLI;
* string coercion (``"true"`` -> True, ``"(1,2)"`` -> tuple, numerics).

TPU-specific departure: device placement is expressed as a ``MeshConfig``
(mesh axis names/sizes + named sharding rules) instead of the reference's
``gpu / aux_gpu / models_to_devices`` assignment maps (reference:
vltk/configs.py:36-60, 258-266) — placement on TPU is a compiler contract,
not a runtime device pick.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields
from typing import Any, Dict,  Optional, Tuple


def _coerce(value: Any) -> Any:
    """Parse CLI-style string values into python values.

    Mirrors the reference's string/bool/tuple arg parsing
    (reference: vltk/abc/config.py:54-68).
    """
    if not isinstance(value, str):
        return value
    low = value.strip()
    if low.lower() in ("true", "false"):
        return low.lower() == "true"
    if low.lower() in ("none", "null"):
        return None
    if low.startswith("(") and low.endswith(")") or (
        low.startswith("[") and low.endswith("]")
    ):
        return _parse_nested(low)
    try:
        return int(low)
    except ValueError:
        pass
    try:
        return float(low)
    except ValueError:
        pass
    return value


def _parse_nested(text: str):
    """Parse possibly-nested ``(a,(b,1))`` / ``[x,2]`` CLI literals with
    unquoted strings (needed for e.g. ``--mesh.axes=((data,4),(model,2))``).

    Raises ValueError on trailing input — ``(a,b),(c,d)`` without outer
    parens must not silently drop the second group."""
    pos = 0

    def parse():
        nonlocal pos
        open_ch = text[pos]
        close_ch = ")" if open_ch == "(" else "]"
        pos += 1
        items = []
        token = ""

        def flush():
            nonlocal token
            if token.strip():
                items.append(_coerce(token.strip()))
            token = ""

        while pos < len(text):
            ch = text[pos]
            if ch in "([":
                items.append(parse())
            elif ch == close_ch:
                flush()
                pos += 1
                return tuple(items) if open_ch == "(" else list(items)
            elif ch == ",":
                flush()
                pos += 1
            else:
                token += ch
                pos += 1
        flush()
        return tuple(items) if open_ch == "(" else list(items)

    out = parse()
    if pos != len(text):
        raise ValueError(
            f"trailing input after position {pos} in {text!r} — nest groups "
            "inside one outer (...) or [...]"
        )
    return out


def unflatten_dict(flat: Dict[str, Any]) -> Dict[str, Any]:
    """``{"a.b": 1}`` -> ``{"a": {"b": 1}}`` (reference: utils/base.py:167-188)."""
    out: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        cur = out
        for part in parts[:-1]:
            cur = cur.setdefault(part, {})
        cur[parts[-1]] = value
    return out


@dataclass
class BaseConfig:
    """Shared behavior for all config dataclasses."""

    def __post_init__(self):
        object.__setattr__(self, "_overwritten", {})

    # -- iteration / dict views -------------------------------------------
    def __iter__(self):
        for f in fields(self):
            yield f.name, getattr(self, f.name)

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for name, value in self:
            if isinstance(value, BaseConfig):
                out[name] = value.to_dict()
            else:
                out[name] = value
        return out

    # -- mutation ----------------------------------------------------------
    def update(self, updates: Dict[str, Any]) -> "BaseConfig":
        """Recursively apply ``updates``; unknown keys raise KeyError.

        Tracks which fields were overwritten (reference:
        vltk/abc/config.py:23-29, 95-114).
        """
        known = {f.name for f in fields(self)}
        for key, value in updates.items():
            if key.startswith("_"):
                continue
            if key not in known:
                raise KeyError(
                    f"{type(self).__name__} has no config field {key!r}; "
                    f"known: {sorted(known)}"
                )
            current = getattr(self, key)
            if isinstance(current, BaseConfig) and isinstance(value, dict):
                current.update(value)
            else:
                coerced = _coerce(value)
                if coerced != current:
                    self._overwritten[key] = current
                object.__setattr__(self, key, coerced)
        return self

    @property
    def overwritten(self) -> Dict[str, Any]:
        return dict(self._overwritten)

    # -- serialization -------------------------------------------------------
    def dump_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=str)

    def dump_yaml(self, path: str) -> None:
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, default_flow_style=False)

    @classmethod
    def from_yaml(cls, path: str, **overrides):
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f) or {}
        data.update(unflatten_dict(overrides))
        cfg = cls()
        cfg.update(data)
        return cfg

    def print_config(self) -> str:
        text = json.dumps(self.to_dict(), indent=2, default=str)
        print(text)
        return text


# ---------------------------------------------------------------------------
# modality configs
# ---------------------------------------------------------------------------


@dataclass
class LangConfig(BaseConfig):
    """Tokenizer + language-side knobs (reference: vltk/configs.py:99-117)."""

    tokenizer: str = "BertWordPieceTokenizer"
    from_transformers: bool = False
    vocab_path: Optional[str] = None
    lowercase: bool = True
    max_seq_length: int = 128
    max_visual_seq_length: int = 128
    mask_rate: float = 0.15
    mask_token_rate: float = 0.8
    random_token_rate: float = 0.1
    sentence_match_rate: float = 0.5
    feature_mask_rate: float = 0.15
    ignore_id: int = -100
    pad_direction: str = "right"
    add_special_tokens: bool = True


@dataclass
class VisionConfig(BaseConfig):
    """Image transform pipeline (reference: vltk/configs.py:120-152).

    ``transforms`` is a list of processor names resolved against the
    processing registry; remaining fields are injected into any transform
    whose signature accepts them (signature-filtered kwarg passing, see
    inspection.collect_args_to_func).
    """

    transforms: Tuple[str, ...] = ("fromfile", "resizetensor", "normalize")
    gray: bool = False
    # decode output dtype: "float32" (reference semantics) or "uint8"
    # (decode-only pipelines feeding a device-fused preprocess — skips the
    # host f32 round-trip; see processing/image.py:FromFile)
    decode_dtype: str = "float32"
    size: Tuple[int, int] = (800, 1333)
    mode: str = "bilinear"
    pad_value: float = 0.0
    mean: Tuple[float, float, float] = (102.9801, 115.9465, 122.7717)
    sdev: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    bgr: bool = True
    # True = a device program (e.g. the batched extractor) does
    # resize/normalize/pad, so the host pipeline only decodes; False = the
    # host pipeline is the whole preprocess and ends on a fixed canvas
    device_fused: bool = False

    def build(self):
        """Compose the configured transform pipeline (host side)."""
        from vltk_tpu.processing import build_image_pipeline

        return build_image_pipeline(self)


@dataclass
class MeshConfig(BaseConfig):
    """TPU device-mesh + sharding declaration (new; replaces reference
    gpu/aux_gpu/models_to_devices, vltk/configs.py:36-60).

    ``axes`` maps axis name -> size; -1 means "all remaining devices".
    Standard axis names: ``data`` (batch), ``model`` (tensor parallel),
    ``seq`` (sequence parallel for long OCR inputs).
    """

    axes: Tuple[Tuple[str, int], ...] = (("data", -1),)
    batch_axis: str = "data"
    model_axis: str = "model"
    seq_axis: str = "seq"
    force_host_platform: bool = False  # tests: virtual CPU mesh
    # ZeRO stage-1: shard every optimizer moment over this mesh axis
    # (usually "data"); each DP device then stores 1/dp of the Adam
    # state. None = replicated moments (train/steps.py create_state).
    zero1_axis: Optional[str] = None

    def build(self):
        from vltk_tpu.parallel import make_mesh

        return make_mesh(self)


@dataclass
class DataConfig(BaseConfig):
    """Master knob set for the loader (reference: vltk/configs.py:155-203)."""

    # what to load
    train_datasets: Tuple = ()
    eval_datasets: Tuple = ()
    extractor: Optional[str] = None
    datadir: str = "/tmp/vltk_tpu_data"
    # processors
    visn_processors: Tuple[str, ...] = ()
    lang_processors: Tuple[str, ...] = ()
    visnlang_processors: Tuple[str, ...] = ()
    # iteration order
    img_first: bool = False
    shuffle: bool = True
    percent: float = 1.0
    # stage stubs (kept from reference for pipeline debugging)
    ignore_image: bool = False
    ignore_filepath: bool = False
    ignore_annotations: bool = False
    ignore_segmentation: bool = True
    rand_feats: Optional[Tuple[int, ...]] = None
    # batching
    train_batch_size: int = 32
    eval_batch_size: int = 64
    num_workers: int = 4
    drop_last: bool = True
    # fixed-shape capacities (TPU data plane; see vars.FIXED_SHAPE_KEYS)
    max_detections: int = 36
    visual_dim: int = 2048
    # img_first: sentences kept per image (static (T, L) text stack; the
    # reference's ragged list + transpose_vl capped at 512 batch-level —
    # visnlangdataset.py:287-353). 8 covers COCO Captions' 5-7 per image;
    # the dataset warns loudly (once, with counts) when data truncates.
    max_text_per_img: int = 8
    # etl control
    redownload: bool = False
    reextract: bool = False
    metadata_filedict: Optional[Dict[str, str]] = None
    # host->device feed
    prefetch_depth: int = 2
    # multi-host input sharding (SURVEY §5.8 per-host feeding): every host
    # reads a disjoint, equal-length slice of the seed-synchronized global
    # order. shard_count=None/1 disables; shard_rank=None auto-detects via
    # jax.process_index()
    shard_count: Optional[int] = None
    shard_rank: Optional[int] = None
    lang: LangConfig = field(default_factory=LangConfig)
    vision: VisionConfig = field(default_factory=VisionConfig)


@dataclass
class ModelConfig(BaseConfig):
    """One model's checkpoint + dtype (reference: vltk/configs.py:24-44)."""

    name: str = ""
    checkpoint: Optional[str] = None
    dtype: str = "bfloat16"
    freeze_layers: Tuple[str, ...] = ()


@dataclass
class ModelsConfig(BaseConfig):
    """Named model collection (reference: vltk/configs.py:36-60)."""

    main: ModelConfig = field(default_factory=ModelConfig)
    aux: ModelConfig = field(default_factory=ModelConfig)


@dataclass
class TrainConfig(BaseConfig):
    """Optimization schedule (reference: vltk/configs.py:63-96)."""

    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    warmup_ratio: float = 0.1
    epochs: int = 4
    clip_grad_norm: float = 1.0
    seed: int = 9595
    # mid-epoch checkpoint cadence (0 = end-of-epoch only). Enables
    # step-granular resume: the loader's deterministic per-epoch shuffle
    # is replayed and the first step_in_epoch batches skipped.
    save_every_steps: int = 0
    # periodic mid-epoch saves serialize + fsync on a background writer
    # thread (the step loop pays only the device->host snapshot); the
    # preemption and end-of-epoch saves always complete synchronously
    async_save: bool = True
    # retain only the K highest-epoch checkpoints (0 = keep all)
    keep_checkpoints: int = 0
    # gradient accumulation: split each batch's leading dim into this
    # many microbatches, scan-accumulate grads, apply ONE mean update —
    # numerically equal to the full batch (train/steps.py). Composes
    # with remat for large effective batches on one chip.
    accum_steps: int = 1
    half_precision: bool = True  # bf16 on TPU (replaces CUDA GradScaler)
    task_matched: bool = False
    task_mask_lm: bool = False
    task_obj_predict: bool = False
    task_qa: bool = True


@dataclass
class EvalConfig(BaseConfig):
    half_precision: bool = True
    metrics: Tuple[str, ...] = ("accuracy",)


@dataclass
class Config(BaseConfig):
    """Top-level experiment config (reference: vltk/configs.py:206-266)."""

    data: DataConfig = field(default_factory=DataConfig)
    models: ModelsConfig = field(default_factory=ModelsConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    evaluate: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # experiment lifecycle
    logdir: str = "logs"
    test_run: bool = False
    break_loop_on_test: bool = True
    save_on_crash: bool = False
    checkpoint_dir: Optional[str] = None
    email: Optional[str] = None

    def __post_init__(self):
        super().__post_init__()
        # propagate test_run/logdir to subconfigs like the reference
        # (vltk/configs.py:254-255)
        if self.test_run:
            self.data.num_workers = 0

    @classmethod
    def from_flags(cls, yaml_path: Optional[str] = None, **dot_flags) -> "Config":
        """CLI entry: yaml base + ``a.b.c=x`` overrides (reference:
        vltk/future/cli.py:70-81)."""
        cfg = cls()
        if yaml_path is not None:
            import yaml

            with open(yaml_path) as f:
                cfg.update(yaml.safe_load(f) or {})
        if dot_flags:
            cfg.update(unflatten_dict(dot_flags))
        return cfg
