"""Full-model parity: the composed JAX FRCNN vs the reference torch FRCNN.

Hermetic (random-init, no downloads): loads
``/root/reference/vltk/modeling/frcnn.py`` directly via importlib. The
environment has no torchvision, so the only two torchvision ops the
reference uses (``nms``, ``RoIPool`` — reference: frcnn.py:30-31) are
stubbed with this repo's own numpy oracles (tests/test_ops.py), and the
reference's broken ``from vltk import decorators`` import (frcnn.py:32 —
the module only exists in the v1.0.x wheel layout) is shimmed with an
empty module. ``vltk.compat`` symbols are stubbed too; they are only
touched by ``from_pretrained``, which these tests never call.

Covers:
  * composed-model numeric parity, reference FRCNN.inference
    (frcnn.py:1942-2004) vs vltk_tpu.models.FRCNN — boxes / classes /
    probs / attrs / roi_features allclose at f32, on a small config and
    an R101-shaped config;
  * exhaustive converter coverage (reference frcnn.py:1757-1922): the
    complete reference-named state_dict maps bijectively onto the flax
    init tree — every torch key converts, every flax param is hit exactly
    once, shapes equal — incl. the gamma/beta checkpoint-name variants
    (frcnn.py:1860-1872) and detectron-pkl numpy values (compat.py:97-108).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from test_ops import np_greedy_nms, np_roi_pool
from vltk_tpu.models import FRCNN, FRCNNConfig
from vltk_tpu.models.convert import torch_frcnn_to_jax

REF_FRCNN = "/root/reference/vltk/modeling/frcnn.py"


# ---------------------------------------------------------------------------
# hermetic loading of the reference module
# ---------------------------------------------------------------------------


def _tv_nms(boxes, scores, iou_threshold):
    if boxes.numel() == 0:
        return torch.zeros(0, dtype=torch.int64)
    keep = np_greedy_nms(
        boxes.detach().cpu().numpy().astype(np.float32),
        scores.detach().cpu().numpy().astype(np.float32),
        float(iou_threshold),
    )
    return torch.as_tensor(keep, dtype=torch.int64)


def _tv_batched_nms(boxes, scores, idxs, iou_threshold):
    if boxes.numel() == 0:
        return torch.zeros(0, dtype=torch.int64)
    offsets = idxs.to(boxes.dtype) * (boxes.max() + 1.0)
    return _tv_nms(boxes + offsets[:, None], scores, iou_threshold)


class _RoIPoolStub(torch.nn.Module):
    """torchvision.ops.RoIPool drop-in backed by the numpy oracle."""

    def __init__(self, output_size, spatial_scale):
        super().__init__()
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        assert output_size[0] == output_size[1]
        self.output_size = output_size
        self.spatial_scale = spatial_scale

    def forward(self, x, rois):
        feats = x.detach().cpu().numpy().transpose(0, 2, 3, 1)  # NHWC
        r = rois.detach().cpu().numpy()
        out = np.zeros((len(r), x.shape[1], *self.output_size), np.float32)
        for k, row in enumerate(r):
            pooled = np_roi_pool(
                feats[int(row[0])],
                row[1:][None],
                self.output_size[0],
                self.spatial_scale,
            )[0]
            out[k] = pooled.transpose(2, 0, 1)
        return torch.as_tensor(out, dtype=x.dtype)


_STUB_NAMES = (
    "torchvision",
    "torchvision.ops",
    "torchvision.ops.boxes",
    "vltk",
    "vltk.decorators",
    "vltk.compat",
)


def _make_stub_modules():
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    ops.RoIPool = _RoIPoolStub
    ops.nms = _tv_nms
    boxes_mod.nms = _tv_nms
    boxes_mod.batched_nms = _tv_batched_nms
    tv.ops = ops
    ops.boxes = boxes_mod

    vltk_mod = types.ModuleType("vltk")
    dec = types.ModuleType("vltk.decorators")
    compat = types.ModuleType("vltk.compat")
    compat.WEIGHTS_NAME = "pytorch_model.bin"
    compat.Config = type("Config", (), {})
    compat.cached_path = lambda *a, **k: None
    compat.hf_bucket_url = lambda *a, **k: ""
    compat.is_remote_url = lambda *a, **k: False
    compat.load_checkpoint = lambda *a, **k: {}
    vltk_mod.decorators = dec
    vltk_mod.compat = compat
    return {
        "torchvision": tv,
        "torchvision.ops": ops,
        "torchvision.ops.boxes": boxes_mod,
        "vltk": vltk_mod,
        "vltk.decorators": dec,
        "vltk.compat": compat,
    }


@pytest.fixture(scope="module")
def ref():
    saved = {k: sys.modules.get(k) for k in _STUB_NAMES}
    sys.modules.update(_make_stub_modules())
    try:
        spec = importlib.util.spec_from_file_location("_ref_frcnn", REF_FRCNN)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


# ---------------------------------------------------------------------------
# reference config / weight plumbing
# ---------------------------------------------------------------------------


class _CI:
    """Case-insensitive attribute namespace: the reference reads both
    ``cfg.MIN_DETECTIONS`` and ``cfg.min_detections`` / ``cfg.model.device``
    (frcnn.py:1747-1755)."""

    def __init__(self, **kw):
        self._d = {
            k.upper(): (_CI(**v) if isinstance(v, dict) else v)
            for k, v in kw.items()
        }

    def __getattr__(self, name):
        d = object.__getattribute__(self, "_d")
        try:
            return d[name.upper()]
        except KeyError:
            raise AttributeError(name)


def _ref_cfg(
    *,
    depth,
    stem,
    res2,
    width,
    classes,
    attrs,
    hidden,
    pooler,
    anchor_sizes,
    pre,
    post,
    mind,
    maxd,
    nms_list=(0.5, 1.0, 0.1),
):
    return _CI(
        MODEL=dict(DEVICE="cpu", MAX_POOL=True, PIXEL_MEAN=[0.0, 0.0, 0.0]),
        RESNETS=dict(
            DEPTH=depth,
            NORM="BN",
            OUT_FEATURES=["res4"],
            STEM_OUT_CHANNELS=stem,
            RES2_OUT_CHANNELS=res2,
            NUM_GROUPS=1,
            WIDTH_PER_GROUP=width,
            STRIDE_IN_1X1=True,
            RES5_DILATION=1,
        ),
        BACKBONE=dict(FREEZE_AT=2),
        ANCHOR_GENERATOR=dict(
            SIZES=[list(anchor_sizes)],
            ASPECT_RATIOS=[[0.5, 1.0, 2.0]],
            OFFSET=0.0,
        ),
        PROPOSAL_GENERATOR=dict(HIDDEN_CHANNELS=hidden, MIN_SIZE=0),
        RPN=dict(
            IN_FEATURES=["res4"],
            NMS_THRESH=0.7,
            BATCH_SIZE_PER_IMAGE=256,
            POSITIVE_FRACTION=0.5,
            SMOOTH_L1_BETA=0.0,
            LOSS_WEIGHT=1.0,
            PRE_NMS_TOPK_TEST=pre,
            POST_NMS_TOPK_TEST=post,
            PRE_NMS_TOPK_TRAIN=pre,
            POST_NMS_TOPK_TRAIN=post,
            BOUNDARY_THRESH=-1,
            IOU_THRESHOLDS=[0.3, 0.7],
            IOU_LABELS=[0, -1, 1],
            BBOX_REG_WEIGHTS=(1.0, 1.0, 1.0, 1.0),
        ),
        ROI_HEADS=dict(
            IN_FEATURES=["res4"],
            NUM_CLASSES=classes,
            IOU_THRESHOLDS=[0.5],
            IOU_LABELS=[0, 1],
            POSITIVE_FRACTION=0.25,
            PROPOSAL_APPEND_GT=False,
            SCORE_THRESH_TEST=0.2,
            NMS_THRESH_TEST=list(nms_list),
            BATCH_SIZE_PER_IMAGE=256,
        ),
        ROI_BOX_HEAD=dict(
            SMOOTH_L1_BETA=0.0,
            BBOX_REG_WEIGHTS=(10.0, 10.0, 5.0, 5.0),
            POOLER_RESOLUTION=pooler,
            POOLER_SAMPLING_RATIO=0,
            RES5HALVE=False,
            ATTR=True,
            NUM_ATTRS=attrs,
            CLS_AGNOSTIC_BBOX_REG=False,
        ),
        MIN_DETECTIONS=mind,
        MAX_DETECTIONS=maxd,
    )


def _randomize(model, seed):
    """Give the random-init model non-degenerate frozen-BN statistics and
    biases; conv/linear kernels keep torch's default (kaiming) init so
    activations neither vanish nor explode through deep stacks."""
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            continue
        if "cell_anchors" in k:
            continue  # computed anchor table, not a weight
        if k.endswith("running_var"):
            v.uniform_(0.8, 1.25, generator=g)
        elif k.endswith("running_mean"):
            v.normal_(0.0, 0.2, generator=g)
        elif ".norm." in k and k.endswith("weight"):
            v.uniform_(0.8, 1.25, generator=g)
        elif ".norm." in k and k.endswith("bias"):
            v.normal_(0.0, 0.1, generator=g)
        elif k.endswith("bias"):
            v.normal_(0.0, 0.02, generator=g)
    model.load_state_dict(sd)


# ---------------------------------------------------------------------------
# the parity harness
# ---------------------------------------------------------------------------


def _run_parity(ref, *, canvas, sizes, scales_yx=None, ignorey=None, seed=0, **shape):
    torch.manual_seed(seed)
    tmodel = ref.FRCNN(_ref_cfg(**shape))
    tmodel.eval()
    _randomize(tmodel, seed)

    jcfg = FRCNNConfig(
        depth=shape["depth"],
        stem_out_channels=shape["stem"],
        res2_out_channels=shape["res2"],
        width_per_group=shape["width"],
        num_classes=shape["classes"],
        num_attrs=shape["attrs"],
        rpn_hidden_channels=shape["hidden"],
        pooler_resolution=shape["pooler"],
        anchor_sizes=tuple(shape["anchor_sizes"]),
        pre_nms_topk=shape["pre"],
        post_nms_topk=shape["post"],
        min_detections=shape["mind"],
        max_detections=shape["maxd"],
    )
    jmodel = FRCNN(cfg=jcfg)

    rng = np.random.default_rng(seed)
    n = len(sizes)
    images = rng.uniform(-80, 80, (n, canvas[0], canvas[1], 3)).astype(np.float32)
    for i, (h, w) in enumerate(sizes):  # zero the pad, as Preprocess does
        images[i, h:, :, :] = 0.0
        images[i, :, w:, :] = 0.0
    jsizes = jnp.asarray(sizes, jnp.float32)

    init = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(images), jsizes)["params"]
    converted = torch_frcnn_to_jax(tmodel.state_dict())

    # exhaustive bijective converter coverage: every flax param hit exactly
    # once, every (non-anchor) torch key lands somewhere, shapes equal
    fi, fc = flatten_dict(init), flatten_dict(converted)
    assert set(fi) == set(fc), (
        f"missing={sorted(set(fi) - set(fc))[:5]} "
        f"extra={sorted(set(fc) - set(fi))[:5]}"
    )
    for key in fi:
        assert fi[key].shape == np.asarray(fc[key]).shape, key

    jscales = None if scales_yx is None else jnp.asarray(scales_yx, jnp.float32)
    jignorey = None if ignorey is None else jnp.asarray(ignorey, jnp.float32)
    out_j = jmodel.apply(
        {"params": converted},
        jnp.asarray(images),
        jsizes,
        scales_yx=jscales,
        ignorey=jignorey,
    )

    timages = torch.from_numpy(images.transpose(0, 3, 1, 2))
    tscales = None if scales_yx is None else torch.tensor(scales_yx)
    tignorey = None if ignorey is None else torch.tensor(ignorey)
    with torch.no_grad():
        out_t = tmodel(
            timages,
            [tuple(s) for s in sizes],
            scales_yx=tscales,
            ignorey=tignorey,
        )

    for i in range(n):
        k = int(out_t["preds_per_image"][i])
        assert k > 0, "no detections — the parity comparison would be vacuous"
        assert int(np.asarray(out_j["preds_per_image"])[i]) == k
        assert bool(np.asarray(out_j["mask"])[i, :k].all())
        np.testing.assert_allclose(
            np.asarray(out_j["boxes"])[i, :k],
            out_t["boxes"][i].numpy(),
            rtol=1e-4,
            atol=5e-3,
        )
        np.testing.assert_array_equal(
            np.asarray(out_j["obj_ids"])[i, :k], out_t["obj_ids"][i].numpy()
        )
        np.testing.assert_allclose(
            np.asarray(out_j["obj_probs"])[i, :k],
            out_t["obj_probs"][i].numpy(),
            rtol=1e-4,
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(out_j["attr_ids"])[i, :k], out_t["attr_ids"][i].numpy()
        )
        np.testing.assert_allclose(
            np.asarray(out_j["attr_probs"])[i, :k],
            out_t["attr_probs"][i].numpy(),
            rtol=1e-4,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_j["roi_features"])[i, :k],
            out_t["roi_features"][i].numpy(),
            rtol=5e-4,
            atol=5e-4,
        )
    return tmodel


SMALL = dict(
    depth=50,
    stem=8,
    res2=16,
    width=4,
    classes=7,
    attrs=5,
    hidden=16,
    pooler=7,
    anchor_sizes=(16, 32),
    pre=64,
    post=16,
    mind=4,
    maxd=4,
)

R101 = dict(
    depth=101,
    stem=64,
    res2=256,
    width=64,
    classes=1600,
    attrs=400,
    hidden=512,
    pooler=14,
    anchor_sizes=(32, 64, 128, 256, 512),
    pre=2000,
    post=100,
    mind=36,
    maxd=36,
)


class TestComposedModelParity:
    def test_small_config(self, ref):
        _run_parity(ref, canvas=(64, 64), sizes=[(64, 64), (48, 56)], **SMALL)

    def test_small_config_with_scales(self, ref):
        _run_parity(
            ref,
            canvas=(64, 64),
            sizes=[(64, 64), (48, 56)],
            scales_yx=[[0.5, 0.8], [1.2, 0.6]],
            seed=1,
            **SMALL,
        )

    def test_r101_shaped(self, ref):
        """The real unc-nlp/frcnn-vg-finetuned shape (every channel dim,
        depth, head width as shipped) at a reduced canvas/proposal count so
        CPU runtime stays bounded; 36/36 detections as the reference tests
        pin (reference: tests/frcnn_test.py:16-19)."""
        _run_parity(ref, canvas=(224, 288), sizes=[(224, 288), (180, 240)], **R101)


class TestIgnoreyParity:
    def test_document_band_exclusion(self, ref):
        """The document-image y-band exclusion/clip (reference frcnn.py:275,
        328-366) on synthetic document-shaped (tall) inputs — bands drop
        spanning proposals and clip straddlers in both implementations.

        Single-image batches only: the reference's per-image band loop
        mutates the shared ``level_ids`` (frcnn.py:340), so it IndexErrors
        at batch size > 1 — it only ever ran inside the bs=1 extraction
        loop (extraction.py:142-199). The JAX version is batched."""
        _run_parity(
            ref,
            canvas=(96, 64),
            sizes=[(96, 64)],
            scales_yx=[[1.0, 1.0]],
            ignorey=[[[30.0, 42.0]]],
            seed=2,
            **SMALL,
        )
        _run_parity(
            ref,
            canvas=(96, 64),
            sizes=[(80, 48)],
            scales_yx=[[1.0, 0.8]],
            ignorey=[[[20.0, 26.0]]],
            seed=5,
            **SMALL,
        )

    def test_two_bands(self, ref):
        _run_parity(
            ref,
            canvas=(96, 64),
            sizes=[(96, 64)],
            scales_yx=[[1.0, 1.0]],
            ignorey=[[[18.0, 28.0], [55.0, 70.0]]],
            seed=4,
            **SMALL,
        )


class TestMatcherParity:
    """vltk_tpu.ops.match_quality vs the reference Matcher
    (reference: frcnn.py:587-695)."""

    @pytest.mark.parametrize("allow", [False, True])
    def test_matches_reference(self, ref, allow):
        from vltk_tpu.ops import match_quality

        rng = np.random.default_rng(7)
        quality = rng.uniform(0, 1, (7, 40)).astype(np.float32)
        matcher = ref.Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=allow)
        tm, tl = matcher(torch.from_numpy(quality))
        jm, jl = match_quality(
            jnp.asarray(quality), (0.3, 0.7), (0, -1, 1),
            allow_low_quality_matches=allow,
        )
        np.testing.assert_array_equal(np.asarray(jm), tm.numpy())
        np.testing.assert_array_equal(np.asarray(jl), tl.numpy())

    def test_padded_gt_rows(self, ref):
        """Static-shape padding: masked rows behave exactly like absent
        rows in the reference's dynamic-shape matcher."""
        from vltk_tpu.ops import match_quality

        rng = np.random.default_rng(8)
        real = rng.uniform(0, 1, (3, 25)).astype(np.float32)
        padded = np.concatenate([real, np.zeros((4, 25), np.float32)])
        gt_valid = np.array([True] * 3 + [False] * 4)

        matcher = ref.Matcher([0.5], [0, 1], allow_low_quality_matches=True)
        tm, tl = matcher(torch.from_numpy(real))
        jm, jl = match_quality(
            jnp.asarray(padded), (0.5,), (0, 1),
            allow_low_quality_matches=True, gt_valid=jnp.asarray(gt_valid),
        )
        np.testing.assert_array_equal(np.asarray(jm), tm.numpy())
        np.testing.assert_array_equal(np.asarray(jl), tl.numpy())

    def test_no_ground_truth(self, ref):
        """All-padded rows == the reference's empty-matrix early return
        (reference: frcnn.py:644-655)."""
        from vltk_tpu.ops import match_quality

        matcher = ref.Matcher([0.5], [0, 1], allow_low_quality_matches=True)
        tm, tl = matcher(torch.zeros((0, 10)))
        jm, jl = match_quality(
            jnp.zeros((4, 10)), (0.5,), (0, 1),
            allow_low_quality_matches=True, gt_valid=jnp.zeros(4, bool),
        )
        np.testing.assert_array_equal(np.asarray(jm), tm.numpy())
        np.testing.assert_array_equal(np.asarray(jl), tl.numpy())


class TestConverterVariants:
    def test_gamma_beta_and_pkl_names(self, ref):
        """gamma/beta checkpoint names (reference frcnn.py:1860-1872 renames
        them to weight/bias at load; our converter accepts them directly)
        and detectron-pkl numpy values (compat.py:97-108) convert to the
        identical tree."""
        torch.manual_seed(3)
        tmodel = ref.FRCNN(_ref_cfg(**SMALL))
        tmodel.eval()
        _randomize(tmodel, 3)
        sd = tmodel.state_dict()

        base = torch_frcnn_to_jax(sd)

        renamed = {}
        for k, v in sd.items():
            if ".norm.weight" in k:
                k = k.replace(".norm.weight", ".norm.gamma")
            elif ".norm.bias" in k:
                k = k.replace(".norm.bias", ".norm.beta")
            renamed[k] = v.numpy()  # numpy values = detectron pkl contents
        variant = torch_frcnn_to_jax(renamed)

        fb, fv = flatten_dict(base), flatten_dict(variant)
        assert set(fb) == set(fv)
        for key in fb:
            np.testing.assert_array_equal(np.asarray(fb[key]), np.asarray(fv[key]))
