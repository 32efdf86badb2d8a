"""Model-layer tests: torch-oracle numerical parity for the backbone
pieces, structural + invariant tests for the fixed-shape detection path.

The torch oracles are written from the reference's documented semantics
(reference: vltk/modeling/frcnn.py:857-1000) with plain torch.nn.functional
ops — no torchvision required.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vltk_tpu.models import FRCNN, FRCNNConfig, torch_frcnn_to_jax
from vltk_tpu.models.anchors import cell_anchors, grid_anchors
from vltk_tpu.models.backbone import BasicStem, BottleneckBlock
from vltk_tpu.models.rpn import propose

TINY = FRCNNConfig(
    depth=50,
    stem_out_channels=8,
    res2_out_channels=16,
    width_per_group=4,
    rpn_hidden_channels=16,
    anchor_sizes=(16, 32),
    aspect_ratios=(0.5, 1.0, 2.0),
    pre_nms_topk=64,
    post_nms_topk=16,
    num_classes=7,
    num_attrs=5,
    pooler_resolution=7,
    min_detections=4,
    max_detections=4,
)


def torch_frozen_bn(x, w, b, mean, var, eps=1e-5):
    return F.batch_norm(x, mean, var, w, b, training=False, eps=eps)


def rand_sd(rng, shapes):
    return {k: torch.tensor(rng.normal(size=s).astype(np.float32) * 0.1) for k, s in shapes.items()}


class TestStemParity:
    def test_caffe_stem_matches_torch(self, rng):
        x = rng.normal(size=(2, 3, 21, 27)).astype(np.float32)
        sd = rand_sd(
            rng,
            {
                "backbone.stem.conv1.weight": (8, 3, 7, 7),
                "backbone.stem.conv1.norm.weight": (8,),
                "backbone.stem.conv1.norm.bias": (8,),
                "backbone.stem.conv1.norm.running_mean": (8,),
            },
        )
        sd["backbone.stem.conv1.norm.running_var"] = torch.tensor(
            rng.uniform(0.5, 2.0, size=(8,)).astype(np.float32)
        )

        xt = torch.tensor(x)
        t = F.conv2d(xt, sd["backbone.stem.conv1.weight"], stride=2, padding=3)
        t = torch_frozen_bn(
            t,
            sd["backbone.stem.conv1.norm.weight"],
            sd["backbone.stem.conv1.norm.bias"],
            sd["backbone.stem.conv1.norm.running_mean"],
            sd["backbone.stem.conv1.norm.running_var"],
        )
        t = F.relu(t)
        t = F.max_pool2d(t, kernel_size=3, stride=2, padding=0, ceil_mode=True)
        expected = t.permute(0, 2, 3, 1).numpy()

        params = torch_frcnn_to_jax(sd)["backbone"]["stem"]
        got = BasicStem(out_channels=8, caffe_maxpool=True).apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
        np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5, atol=2e-5)


class TestBottleneckParity:
    @pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
    def test_block_matches_torch(self, rng, stride, dilation):
        cin, cb, cout = 8, 4, 16
        x = rng.normal(size=(1, cin, 14, 14)).astype(np.float32)
        names = {}
        for conv, (o, i, k) in {
            "conv1": (cb, cin, 1),
            "conv2": (cb, cb, 3),
            "conv3": (cout, cb, 1),
            "shortcut": (cout, cin, 1),
        }.items():
            names[f"backbone.res2.0.{conv}.weight"] = (o, i, k, k)
            names[f"backbone.res2.0.{conv}.norm.weight"] = (o,)
            names[f"backbone.res2.0.{conv}.norm.bias"] = (o,)
            names[f"backbone.res2.0.{conv}.norm.running_mean"] = (o,)
        sd = rand_sd(rng, names)
        for conv, o in {"conv1": cb, "conv2": cb, "conv3": cout, "shortcut": cout}.items():
            sd[f"backbone.res2.0.{conv}.norm.running_var"] = torch.tensor(
                rng.uniform(0.5, 2.0, size=(o,)).astype(np.float32)
            )

        def cbn(t, conv, stride=1, padding=0, dilation=1):
            p = f"backbone.res2.0.{conv}"
            t = F.conv2d(t, sd[f"{p}.weight"], stride=stride, padding=padding, dilation=dilation)
            return torch_frozen_bn(
                t,
                sd[f"{p}.norm.weight"],
                sd[f"{p}.norm.bias"],
                sd[f"{p}.norm.running_mean"],
                sd[f"{p}.norm.running_var"],
            )

        # stride_in_1x1=True: stride goes on conv1 (reference frcnn.py:932-940)
        xt = torch.tensor(x)
        t = F.relu(cbn(xt, "conv1", stride=stride))
        t = F.relu(cbn(t, "conv2", padding=dilation, dilation=dilation))
        t = cbn(t, "conv3")
        sc = cbn(xt, "shortcut", stride=stride)
        expected = F.relu(t + sc).permute(0, 2, 3, 1).numpy()

        params = torch_frcnn_to_jax(sd)["backbone"]["res2"]["0"]
        got = BottleneckBlock(
            out_channels=cout,
            bottleneck_channels=cb,
            stride=stride,
            stride_in_1x1=True,
            dilation=dilation,
        ).apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5, atol=2e-5)


class TestAnchors:
    def test_cell_anchor_formula(self):
        a = cell_anchors((32,), (1.0,))
        np.testing.assert_allclose(a, [[-16, -16, 16, 16]])
        a2 = cell_anchors((32,), (0.5,))
        w = np.sqrt(32 * 32 / 0.5)
        np.testing.assert_allclose(
            a2, [[-w / 2, -w / 4, w / 2, w / 4]], rtol=1e-6
        )

    def test_grid_order_matches_nhwc_flatten(self):
        # anchors must be ordered (y, x, a) to line up with an NHWC reshape
        g = np.asarray(grid_anchors((2, 3), stride=16, sizes=(8,), aspect_ratios=(1.0,)))
        assert g.shape == (6, 4)
        centers = (g[:, :2] + g[:, 2:]) / 2
        np.testing.assert_allclose(
            centers,
            [[0, 0], [16, 0], [32, 0], [0, 16], [16, 16], [32, 16]],
        )


class TestPropose:
    def test_shapes_and_ordering(self, rng):
        n, hf, wf, a = 2, 4, 4, 3
        logits = jnp.asarray(rng.normal(size=(n, hf, wf, a)).astype(np.float32))
        deltas = jnp.asarray(rng.normal(size=(n, hf, wf, a * 4)).astype(np.float32) * 0.1)
        anchors = grid_anchors((hf, wf), stride=16, sizes=(32,), aspect_ratios=(0.5, 1.0, 2.0))
        sizes = jnp.asarray([[64.0, 64.0], [48.0, 64.0]])
        boxes, scores, valid = propose(
            logits, deltas, anchors, sizes, pre_nms_topk=32, post_nms_topk=8
        )
        assert boxes.shape == (n, 8, 4)
        assert scores.shape == (n, 8)
        s = np.asarray(scores)
        v = np.asarray(valid)
        for i in range(n):
            sv = s[i][v[i]]
            assert list(sv) == sorted(sv, reverse=True)
        b = np.asarray(boxes)
        assert (b[0, v[0], 0::2] <= 64 + 1e-4).all()
        assert (b[1, v[1], 1::2] <= 48 + 1e-4).all()


def np_reference_ignorey(boxes, bands, scale_x):
    """Independent numpy port of the reference's filtering band loop
    (reference: frcnn.py:328-366): rows are *removed* on drop (vs our mask
    algebra), clips mutate the filtered array, band edges divide by the
    x-scale, clip targets are int-truncated. Returns the surviving boxes
    in original order plus their original indices."""
    boxes = boxes.copy()
    idx = np.arange(len(boxes))
    for y0, y1 in bands:
        b0, b1 = y0 / scale_x, y1 / scale_x
        keep = ~((b1 <= boxes[:, 3]) & (b0 >= boxes[:, 1]))
        boxes, idx = boxes[keep], idx[keep]
        below = (boxes[:, 1] > b1) & (boxes[:, 3] > b0)
        to_clip = ~below
        d_top = np.abs(b1 - boxes[:, 3])
        d_bot = np.abs(b0 - boxes[:, 1])
        boxes[to_clip & (d_top < d_bot), 3] = int(b0)
        boxes[to_clip & (d_bot < d_top), 1] = int(b1)
    return boxes, idx


class TestIgnoreyBands:
    """apply_ignorey (mask algebra) vs the independent filtering oracle, on
    synthetic document-shaped proposals (reference: frcnn.py:275, 328-366)."""

    @pytest.mark.parametrize("bands", [
        [(200.0, 260.0)],
        [(100.0, 140.0), (400.0, 460.0)],
        [(0.0, 50.0)],
    ])
    def test_matches_filtering_oracle(self, rng, bands):
        from vltk_tpu.models.rpn import apply_ignorey

        n = 80  # tall page: boxes spread over y in [0, 800]
        boxes = np.zeros((n, 4), np.float32)
        boxes[:, 0] = rng.uniform(0, 500, n)
        boxes[:, 1] = rng.uniform(0, 700, n)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(5, 100, n)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(5, 300, n)
        scale_x = 0.8

        got_boxes, got_valid = apply_ignorey(
            jnp.asarray(boxes),
            jnp.ones(n, bool),
            jnp.asarray(bands, jnp.float32),
            jnp.float32(scale_x),
        )
        want_boxes, want_idx = np_reference_ignorey(boxes, bands, scale_x)

        got_valid = np.asarray(got_valid)
        np.testing.assert_array_equal(np.flatnonzero(got_valid), want_idx)
        np.testing.assert_allclose(
            np.asarray(got_boxes)[got_valid], want_boxes, rtol=1e-6
        )

    def test_propose_nms_variants_identical(self, rng):
        """The blocked / unrolled NMS execution strategies are exact —
        propose() returns identical boxes/scores/valid under every
        rpn_nms_block / rpn_nms_unroll setting."""
        n, hf, wf, a = 2, 8, 8, 3
        logits = jnp.asarray(rng.normal(size=(n, hf, wf, a)).astype(np.float32))
        deltas = jnp.asarray(
            rng.normal(size=(n, hf, wf, a * 4)).astype(np.float32) * 0.1
        )
        anchors = grid_anchors(
            (hf, wf), stride=16, sizes=(32,), aspect_ratios=(0.5, 1.0, 2.0)
        )
        sizes = jnp.asarray([[128.0, 128.0], [96.0, 128.0]])
        base = propose(
            logits, deltas, anchors, sizes, pre_nms_topk=100, post_nms_topk=20
        )
        for kw in (
            dict(nms_block=16),
            dict(nms_block=64),
            dict(nms_unroll=8),
            # chunked execution: lax.map over batch chunks must be
            # bit-identical to the one-vmap program (chunk=1 exercises
            # the chunked path at n=2; chunk=3 does not divide n and
            # must fall back to the plain vmap)
            dict(nms_block=64, nms_chunk=1),
            dict(nms_unroll=4, nms_chunk=1),
            dict(nms_unroll=4, nms_chunk=3),
        ):
            got = propose(
                logits, deltas, anchors, sizes, pre_nms_topk=100,
                post_nms_topk=20, **kw,
            )
            for g, b in zip(got, base):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(b), atol=0, rtol=0
                )

    def test_propose_nms_chunk_padded_batch(self, rng):
        """nms_chunk that does NOT divide N pads the batch with inert
        images and slices them back — identical to the unchunked program
        for every real lane (n=3, chunk=2 -> one padded lane)."""
        n, hf, wf, a = 3, 8, 8, 3
        logits = jnp.asarray(rng.normal(size=(n, hf, wf, a)).astype(np.float32))
        deltas = jnp.asarray(
            rng.normal(size=(n, hf, wf, a * 4)).astype(np.float32) * 0.1
        )
        anchors = grid_anchors(
            (hf, wf), stride=16, sizes=(32,), aspect_ratios=(0.5, 1.0, 2.0)
        )
        sizes = jnp.asarray([[128.0, 128.0], [96.0, 128.0], [128.0, 96.0]])
        base = propose(
            logits, deltas, anchors, sizes, pre_nms_topk=100, post_nms_topk=20
        )
        for kw in (
            dict(nms_block=16, nms_chunk=2),
            dict(nms_unroll=4, nms_chunk=2),
        ):
            got = propose(
                logits, deltas, anchors, sizes, pre_nms_topk=100,
                post_nms_topk=20, **kw,
            )
            for g, b in zip(got, base):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(b), atol=0, rtol=0
                )

    def test_propose_accepts_bands(self, rng):
        """propose() with ignorey: no proposal's y-extent may span a band."""
        n, hf, wf, a = 1, 6, 4, 3
        logits = jnp.asarray(rng.normal(size=(n, hf, wf, a)).astype(np.float32))
        deltas = jnp.asarray(
            rng.normal(size=(n, hf, wf, a * 4)).astype(np.float32) * 0.1
        )
        anchors = grid_anchors(
            (hf, wf), stride=16, sizes=(32,), aspect_ratios=(0.5, 1.0, 2.0)
        )
        sizes = jnp.asarray([[96.0, 64.0]])
        bands = jnp.asarray([[[30.0, 42.0]]])
        scales = jnp.asarray([[1.0, 1.0]])
        boxes, scores, valid = propose(
            logits, deltas, anchors, sizes, pre_nms_topk=48, post_nms_topk=12,
            ignorey=bands, scales_yx=scales,
        )
        b, v = np.asarray(boxes)[0], np.asarray(valid)[0]
        spans = (b[v, 1] <= 30.0) & (b[v, 3] >= 42.0)
        assert not spans.any()


class TestRes5Chunking:
    def test_chunked_matches_unchunked_same_params(self, rng):
        """roi_chunk (nn.scan over RoI blocks, the HBM cap for large
        batches) must produce the SAME param tree and the SAME outputs as
        the single-pass res5 — including a chunk count that needs padding
        (2 imgs x 16 proposals = 32 RoIs over chunk 5 -> 7 chunks + pad)."""
        import dataclasses

        cfg = TINY
        m_plain = FRCNN(cfg=cfg)
        m_chunk = FRCNN(cfg=dataclasses.replace(cfg, roi_chunk=5))
        images = jnp.asarray(
            rng.uniform(-50, 50, (2, 64, 64, 3)).astype(np.float32)
        )
        sizes = jnp.asarray([[64.0, 64.0], [48.0, 56.0]])
        p_plain = m_plain.init(jax.random.PRNGKey(0), images, sizes)["params"]
        p_chunk = m_chunk.init(jax.random.PRNGKey(0), images, sizes)["params"]
        assert jax.tree_util.tree_structure(p_plain) == jax.tree_util.tree_structure(
            p_chunk
        )
        out_plain = m_plain.apply({"params": p_plain}, images, sizes)
        out_chunk = m_chunk.apply({"params": p_plain}, images, sizes)  # same params
        for key in out_plain:
            np.testing.assert_allclose(
                np.asarray(out_plain[key]),
                np.asarray(out_chunk[key]),
                rtol=1e-5,
                atol=1e-5,
                err_msg=key,
            )


class TestFRCNNEndToEnd:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = FRCNN(cfg=TINY)
        images = jnp.zeros((1, 64, 64, 3))
        sizes = jnp.asarray([[64.0, 64.0]])
        params = model.init(jax.random.PRNGKey(0), images, sizes)["params"]
        return model, params

    def test_output_contract(self, model_and_params, rng):
        model, params = model_and_params
        images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        sizes = jnp.asarray([[64.0, 64.0], [50.0, 60.0]])
        out = jax.jit(lambda p, im, s: model.apply({"params": p}, im, s))(
            params, images, sizes
        )
        d = TINY.max_detections
        assert out["boxes"].shape == (2, d, 4)
        assert out["roi_features"].shape == (2, d, TINY.res2_out_channels * 8)
        assert out["obj_ids"].shape == (2, d)
        mask = np.asarray(out["mask"])
        assert (np.asarray(out["preds_per_image"]) == mask.sum(1)).all()
        ids = np.asarray(out["obj_ids"])
        assert (ids[mask] >= 0).all() and (ids[mask] < TINY.num_classes).all()
        assert (ids[~mask] == -1).all()
        attrs = np.asarray(out["attr_ids"])
        assert (attrs[mask] < TINY.num_attrs).all()
        # invalid rows are zeroed
        assert np.abs(np.asarray(out["boxes"])[~mask]).sum() == 0

    def test_scales_yx_rescales_boxes(self, model_and_params, rng):
        model, params = model_and_params
        images = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        sizes = jnp.asarray([[64.0, 64.0]])
        out1 = model.apply({"params": params}, images, sizes)
        out2 = model.apply(
            {"params": params}, images, sizes, scales_yx=jnp.asarray([[2.0, 0.5]])
        )
        b1, b2 = np.asarray(out1["boxes"]), np.asarray(out2["boxes"])
        np.testing.assert_allclose(b2[..., 0::2], b1[..., 0::2] * 0.5, rtol=1e-5)
        np.testing.assert_allclose(b2[..., 1::2], b1[..., 1::2] * 2.0, rtol=1e-5)


class TestConverterStructure:
    def test_converted_tree_matches_init_tree(self, rng):
        """Every path in a synthetic reference-named state_dict must land on
        an existing (path, shape) of the flax init tree."""
        model = FRCNN(cfg=TINY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.asarray([[64.0, 64.0]])
        )["params"]
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        expect = {
            "/".join(str(k.key) for k in path): leaf.shape for path, leaf in flat
        }

        # build a torch-style state_dict that covers a representative subset
        sd = {
            "backbone.stem.conv1.weight": np.zeros((8, 3, 7, 7), np.float32),
            "backbone.stem.conv1.norm.weight": np.zeros((8,), np.float32),
            "backbone.stem.conv1.norm.running_var": np.ones((8,), np.float32),
            "backbone.res3.1.conv2.weight": np.zeros((8, 8, 3, 3), np.float32),
            "proposal_generator.rpn_head.conv.weight": np.zeros((16, 64, 3, 3), np.float32),
            "proposal_generator.rpn_head.conv.bias": np.zeros((16,), np.float32),
            "proposal_generator.rpn_head.objectness_logits.weight": np.zeros((6, 16, 1, 1), np.float32),
            "roi_heads.res5.0.conv1.weight": np.zeros((32, 64, 1, 1), np.float32),
            "roi_heads.box_predictor.cls_score.weight": np.zeros((8, 128), np.float32),
            "roi_heads.box_predictor.cls_score.bias": np.zeros((8,), np.float32),
            "roi_heads.box_predictor.cls_embedding.weight": np.zeros((8, 16), np.float32),
            "proposal_generator.anchor_generator.cell_anchors.0": np.zeros((6, 4), np.float32),
        }
        converted = torch_frcnn_to_jax(sd)
        flat_c = jax.tree_util.tree_flatten_with_path(converted)[0]
        for path, leaf in flat_c:
            key = "/".join(str(k.key) for k in path)
            assert key in expect, f"converter produced unknown path {key}"
            assert expect[key] == leaf.shape, (
                f"{key}: converted {leaf.shape} != model {expect[key]}"
            )


class TestStemSpaceToDepth:
    def test_s2d_exact_vs_plain(self, rng):
        """The space-to-depth stem conv is arithmetically identical."""
        from vltk_tpu.models.layers import StemConv

        x = jnp.asarray(rng.standard_normal((2, 40, 56, 3)).astype(np.float32))
        fast = StemConv(features=16, use_s2d=True)
        slow = StemConv(features=16, use_s2d=False)
        params = fast.init(jax.random.PRNGKey(0), x)
        a = fast.apply(params, x)
        b = slow.apply(params, x)
        assert a.shape == b.shape == (2, 20, 28, 16)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_odd_spatial_falls_back(self, rng):
        from vltk_tpu.models.layers import StemConv

        x = jnp.asarray(rng.standard_normal((1, 33, 47, 3)).astype(np.float32))
        fast = StemConv(features=8, use_s2d=True)
        params = fast.init(jax.random.PRNGKey(0), x)
        out = fast.apply(params, x)  # plain path, no crash
        assert out.shape[1:3] == (17, 24)

    def test_backbone_param_paths_unchanged(self, rng):
        """stem/conv1/conv/kernel keeps the canonical (7,7,3,64) shape the
        torch checkpoint converter targets."""
        from vltk_tpu.models.backbone import ResNetC4

        bb = ResNetC4(depth=50, stem_out_channels=8, res2_out_channels=16,
                      width_per_group=4)
        x = jnp.zeros((1, 32, 32, 3))
        params = bb.init(jax.random.PRNGKey(0), x)["params"]
        assert params["stem"]["conv1"]["conv"]["kernel"].shape == (7, 7, 3, 8)
        assert "scale" in params["stem"]["conv1"]["norm"]


def test_fast_extraction_preset():
    from vltk_tpu.models import FRCNNConfig

    cfg = FRCNNConfig.fast_extraction()
    assert cfg.post_nms_topk == 100
    assert cfg.pre_nms_topk == 2000
    assert cfg.dtype == "bfloat16"
    assert cfg.max_detections == 36  # output contract unchanged
    # overrides win
    assert FRCNNConfig.fast_extraction(post_nms_topk=64).post_nms_topk == 64


class TestInt8Conv:
    """The int8 MXU preset (layers.Int8Conv): dynamic PTQ — per-channel
    weight scales, per-tensor activation scale, int32 accumulation
    (reference has no quantized path; this is a TPU-native extraction
    preset, v5e int8 MXU ~2x bf16 — tools/probe_int8.py)."""

    def test_matches_f32_conv_within_quant_error(self, rng):
        from vltk_tpu.models.layers import Int8Conv

        x = jnp.asarray(rng.standard_normal((2, 9, 11, 16)).astype(np.float32))
        import flax.linen as nn

        ref = nn.Conv(features=24, kernel_size=(3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, name="conv")
        q = Int8Conv(features=24, kernel_size=(3, 3), padding=(1, 1),
                     use_bias=False, name="conv")
        params = ref.init(jax.random.PRNGKey(3), x)
        # identical param tree -> checkpoints / converters untouched
        assert jax.tree_util.tree_structure(
            q.init(jax.random.PRNGKey(3), x)
        ) == jax.tree_util.tree_structure(params)
        y_ref = ref.apply(params, x)
        y_q = q.apply(params, x)
        err = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
        assert err < 0.02, err  # 8-bit symmetric quant, well-conditioned input

    def test_frcnn_int8_contract_and_param_layout(self, rng):
        import dataclasses

        cfg8 = dataclasses.replace(TINY, int8=True)
        model8 = FRCNN(cfg8)
        imgs = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        sizes = jnp.asarray([[60.0, 60.0]])
        params8 = model8.init(jax.random.PRNGKey(0), imgs, sizes)
        out = model8.apply(params8, imgs, sizes)
        assert out["boxes"].shape == (1, TINY.max_detections, 4)
        assert bool(jnp.all(jnp.isfinite(out["roi_features"])))
        # int8 is a pure runtime flag: param tree identical to the f32 model
        params_f32 = FRCNN(TINY).init(jax.random.PRNGKey(0), imgs, sizes)
        assert jax.tree_util.tree_structure(params8) == jax.tree_util.tree_structure(
            params_f32
        )

    def test_calibrated_quant_collection(self, rng):
        """Static PTQ: calibrate_int8 records act_max; the chunked model
        (scan broadcasts "quant") accepts the collection and matches the
        unchunked twin it was calibrated through."""
        import dataclasses

        from vltk_tpu.models import calibrate_int8

        imgs = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        sizes = jnp.asarray([[60.0, 60.0]])
        cfg = dataclasses.replace(TINY, int8=True, roi_chunk=8)  # scan engages
        model = FRCNN(cfg)
        params = model.init(jax.random.PRNGKey(0), imgs, sizes)["params"]
        quant = calibrate_int8(cfg, params, [(imgs, sizes)])
        leaves = jax.tree_util.tree_leaves(quant)
        assert leaves and all(float(l) > 0 for l in leaves)  # maxima recorded
        out_chunked = model.apply({"params": params, "quant": quant}, imgs, sizes)
        out_unchunked = FRCNN(dataclasses.replace(cfg, roi_chunk=None)).apply(
            {"params": params, "quant": quant}, imgs, sizes
        )
        np.testing.assert_allclose(
            np.asarray(out_chunked["roi_features"], np.float32),
            np.asarray(out_unchunked["roi_features"], np.float32),
            rtol=2e-5, atol=2e-5,
        )
        # calibrated-on-this-input static scales == the dynamic scales the
        # UNCHUNKED model computes on the same input, so that pair must
        # agree to float tolerance (the chunked dynamic path legitimately
        # differs: its scan steps use chunk-local maxima)
        un = FRCNN(dataclasses.replace(cfg, roi_chunk=None))
        out_dyn = un.apply({"params": params}, imgs, sizes)
        np.testing.assert_allclose(
            np.asarray(out_unchunked["boxes"], np.float32),
            np.asarray(out_dyn["boxes"], np.float32),
            rtol=1e-5, atol=1e-4,
        )


def test_int8_extraction_preset():
    from vltk_tpu.models import FRCNNConfig

    cfg = FRCNNConfig.int8_extraction()
    assert cfg.int8 and cfg.dtype == "bfloat16"
    assert cfg.post_nms_topk == 300  # full parity geometry
    assert cfg.max_detections == 36
    assert FRCNNConfig.int8_extraction(post_nms_topk=100).post_nms_topk == 100


def test_position_table_overflow_raises():
    """Sequences longer than max_position_embeddings must fail LOUDLY at
    trace time: nn.Embed's gather NaN-fills past-the-table ids silently
    (bench.py --infer layoutlm found this as an all-NaN forward)."""
    import pytest

    from vltk_tpu.models import LxmertConfig
    from vltk_tpu.models.layoutlm import LayoutLM, LayoutLMConfig
    from vltk_tpu.models.lxmert import Lxmert

    cfg = LayoutLMConfig(
        vocab_size=64, hidden_size=16, num_heads=2, intermediate_size=32,
        l_layers=1, max_position_embeddings=8,
    )
    ids = np.zeros((1, 16), np.int32)  # 16 > 8
    boxes = np.zeros((1, 16, 4), np.int32)
    with pytest.raises(ValueError, match="max_position_embeddings"):
        LayoutLM(cfg).init(jax.random.PRNGKey(0), ids, boxes)

    lcfg = LxmertConfig(
        vocab_size=64, hidden_size=16, num_heads=2, intermediate_size=32,
        l_layers=1, x_layers=1, r_layers=1, visual_feat_dim=8,
        max_position_embeddings=8, num_answers=4, num_objects=4, num_attrs=4,
    )
    feats = np.zeros((1, 2, 8), np.float32)
    pos = np.zeros((1, 2, 4), np.float32)
    with pytest.raises(ValueError, match="max_position_embeddings"):
        Lxmert(lcfg).init(jax.random.PRNGKey(0), ids, feats, pos)


class TestInt8Dense:
    """layers.Int8Dense — the transformer serving PTQ path (the encoder
    twin of Int8Conv; no reference counterpart, the reference served f32
    bs=1 — reference: vltk/abc/simple.py:576-682)."""

    def test_param_layout_matches_nn_dense(self, rng):
        """int8 is a runtime flag: the param tree must be bit-compatible
        with nn.Dense so converters/checkpoints are untouched."""
        import flax.linen as nn

        from vltk_tpu.models.layers import Int8Dense

        x = jnp.asarray(rng.normal(size=(3, 5, 16)).astype(np.float32))
        p_ref = nn.Dense(8).init(jax.random.PRNGKey(0), x)["params"]
        p_int8 = Int8Dense(8).init(jax.random.PRNGKey(0), x)["params"]
        assert set(p_ref) == set(p_int8) == {"kernel", "bias"}
        for k in p_ref:
            assert p_ref[k].shape == p_int8[k].shape
            assert p_ref[k].dtype == p_int8[k].dtype
        # identical init streams -> identical values
        np.testing.assert_array_equal(
            np.asarray(p_ref["kernel"]), np.asarray(p_int8["kernel"])
        )

    def test_output_close_to_f32_dense(self, rng):
        import flax.linen as nn

        from vltk_tpu.models.layers import Int8Dense

        x = jnp.asarray(rng.normal(size=(4, 7, 32)).astype(np.float32))
        dense = nn.Dense(24)
        params = dense.init(jax.random.PRNGKey(1), x)["params"]
        y_ref = np.asarray(dense.apply({"params": params}, x))
        y_q = np.asarray(Int8Dense(24).apply({"params": params}, x))
        cos = float(
            (y_ref * y_q).sum()
            / (np.linalg.norm(y_ref) * np.linalg.norm(y_q) + 1e-12)
        )
        assert cos > 0.999, cos
        # standard int8 PTQ error bound: ~1% relative on gaussian data
        rel = np.abs(y_q - y_ref).max() / (np.abs(y_ref).max() + 1e-12)
        assert rel < 0.05, rel

    def test_calibrated_path_matches_dynamic_on_calibration_batch(self, rng):
        """Calibrating on the SAME batch pins act_max to that batch's max,
        so the static path must reproduce the dynamic path bit-exactly."""
        from vltk_tpu.models.layers import Int8Dense, calibrate_int8_variables

        x = jnp.asarray(rng.normal(size=(2, 9, 16)).astype(np.float32))
        mod = Int8Dense(12)
        params = mod.init(jax.random.PRNGKey(2), x)["params"]
        y_dyn = np.asarray(mod.apply({"params": params}, x))
        quant = calibrate_int8_variables(mod.apply, params, [(x,)])
        leaves = jax.tree_util.tree_leaves(quant)
        assert leaves and float(leaves[0]) > 0.0
        y_cal = np.asarray(mod.apply({"params": params, "quant": quant}, x))
        np.testing.assert_array_equal(y_dyn, y_cal)

    def test_lxmert_int8_checkpoint_transparent_and_close(self, rng):
        """cfg.int8 reuses the bf16 model's params verbatim (same tree)
        and its VQA logits stay directionally faithful."""
        import dataclasses

        from vltk_tpu.models import LxmertConfig, LxmertForVQA
        from vltk_tpu.models.layers import calibrate_int8_variables

        cfg = LxmertConfig(
            vocab_size=64, hidden_size=32, num_heads=2, intermediate_size=64,
            l_layers=2, x_layers=1, r_layers=1, visual_feat_dim=8,
            max_position_embeddings=16, num_answers=8, num_objects=4,
            num_attrs=4, hidden_dropout=0.0, attention_dropout=0.0,
        )
        ids = jnp.asarray(rng.integers(0, 64, (2, 10)).astype(np.int32))
        feats = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
        pos = jnp.asarray(rng.uniform(size=(2, 4, 4)).astype(np.float32))
        model = LxmertForVQA(cfg)
        params = model.init(jax.random.PRNGKey(3), ids, feats, pos)["params"]
        y_ref = np.asarray(model.apply({"params": params}, ids, feats, pos))

        qcfg = dataclasses.replace(cfg, int8=True)
        qmodel = LxmertForVQA(qcfg)
        qparams = qmodel.init(jax.random.PRNGKey(3), ids, feats, pos)["params"]
        ref_tree = jax.tree_util.tree_map(lambda a: a.shape, params)
        q_tree = jax.tree_util.tree_map(lambda a: a.shape, qparams)
        assert ref_tree == q_tree  # checkpoint-transparent

        # dynamic path with the bf16 model's own params
        y_dyn = np.asarray(qmodel.apply({"params": params}, ids, feats, pos))
        # calibrated static path
        quant = calibrate_int8_variables(
            qmodel.apply, params, [(ids, feats, pos)]
        )
        y_cal = np.asarray(
            qmodel.apply({"params": params, "quant": quant}, ids, feats, pos)
        )
        for y_q in (y_dyn, y_cal):
            assert np.all(np.isfinite(y_q))
            cos = float(
                (y_ref * y_q).sum()
                / (np.linalg.norm(y_ref) * np.linalg.norm(y_q) + 1e-12)
            )
            assert cos > 0.98, cos
        np.testing.assert_array_equal(y_dyn, y_cal)

    def test_vit_int8_close(self, rng):
        import dataclasses

        from vltk_tpu.models import ViT, ViTConfig
        from vltk_tpu.models.layers import calibrate_int8_variables

        cfg = ViTConfig(
            hidden_size=32, num_heads=2, num_layers=2, intermediate_size=64,
            image_size=32, patch_size=16,
        )
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        model = ViT(cfg)
        params = model.init(jax.random.PRNGKey(4), x)["params"]
        _, pooled_ref = model.apply({"params": params}, x)
        qmodel = ViT(dataclasses.replace(cfg, int8=True))
        quant = calibrate_int8_variables(qmodel.apply, params, [(x,)])
        _, pooled_q = qmodel.apply({"params": params, "quant": quant}, x)
        a, b = np.asarray(pooled_ref), np.asarray(pooled_q)
        cos = float(
            (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        )
        assert np.all(np.isfinite(b)) and cos > 0.98, cos
