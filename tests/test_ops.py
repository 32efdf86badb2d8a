"""Detection ops vs naive numpy oracles (torchvision semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vltk_tpu.ops import (
    apply_deltas,
    box_iou,
    clip_boxes,
    encode_deltas,
    nms_fixed,
    batched_nms_fixed,
    nonempty_mask,
    roi_align,
    roi_pool,
)


# ---------------------------------------------------------------------------
# numpy oracles
# ---------------------------------------------------------------------------


def np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: np.clip(x[:, 2] - x[:, 0], 0, None) * np.clip(
        x[:, 3] - x[:, 1], 0, None
    )
    union = area(a)[:, None] + area(b)[None] - inter
    return np.where(union > 0, inter / union, 0.0)


def np_greedy_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ious = np_iou(boxes[i : i + 1], boxes)[0]
        suppressed |= ious > thresh
    return keep


def np_roi_pool(feat, boxes, out, scale):
    """torchvision RoIPool oracle (feat HWC): std::round corners, exact
    integer bin-edge arithmetic."""
    H, W, C = feat.shape
    res = np.zeros((len(boxes), out, out, C), np.float32)
    rnd = lambda v: int(np.floor(v + 0.5)) if v >= 0 else int(np.ceil(v - 0.5))
    for bi, box in enumerate(boxes):
        x1, y1, x2, y2 = (rnd(np.float32(v) * np.float32(scale)) for v in box)
        rw = max(x2 - x1 + 1, 1)
        rh = max(y2 - y1 + 1, 1)
        for py in range(out):
            for px in range(out):
                # exact rational bin edges (see roi_pool docstring)
                hs = (py * rh) // out + y1
                he = -((-(py + 1) * rh) // out) + y1
                ws = (px * rw) // out + x1
                we = -((-(px + 1) * rw) // out) + x1
                hs, he = np.clip([hs, he], 0, H)
                ws, we = np.clip([ws, we], 0, W)
                if he <= hs or we <= ws:
                    continue
                res[bi, py, px] = feat[hs:he, ws:we].reshape(-1, C).max(0)
    return res


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


class TestBoxes:
    def test_delta_roundtrip(self, rng):
        src = rng.uniform(0, 50, (20, 4)).astype(np.float32)
        src[:, 2:] = src[:, :2] + rng.uniform(5, 40, (20, 2))
        tgt = src + rng.uniform(-3, 3, (20, 4)).astype(np.float32)
        tgt[:, 2:] = np.maximum(tgt[:, 2:], tgt[:, :2] + 1)
        weights = (10.0, 10.0, 5.0, 5.0)
        deltas = encode_deltas(jnp.asarray(src), jnp.asarray(tgt), weights)
        back = apply_deltas(deltas, jnp.asarray(src), weights)
        np.testing.assert_allclose(np.asarray(back), tgt, rtol=1e-4, atol=1e-3)

    def test_clip_and_nonempty(self):
        boxes = jnp.asarray([[-5.0, -5.0, 10.0, 10.0], [3.0, 3.0, 3.0, 9.0]])
        clipped = clip_boxes(boxes, (8, 12))
        np.testing.assert_allclose(
            np.asarray(clipped), [[0, 0, 10, 8], [3, 3, 3, 8]]
        )
        mask = nonempty_mask(clipped, threshold=0.0)
        assert list(np.asarray(mask)) == [True, False]

    def test_iou_matches_oracle(self, rng):
        a = rng.uniform(0, 60, (12, 4)).astype(np.float32)
        a[:, 2:] = a[:, :2] + rng.uniform(1, 30, (12, 2))
        b = rng.uniform(0, 60, (7, 4)).astype(np.float32)
        b[:, 2:] = b[:, :2] + rng.uniform(1, 30, (7, 2))
        np.testing.assert_allclose(
            np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b))),
            np_iou(a, b),
            rtol=1e-5,
        )


class TestNMS:
    @pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
    def test_matches_greedy_oracle(self, rng, thresh):
        n = 60
        boxes = rng.uniform(0, 80, (n, 4)).astype(np.float32)
        boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, (n, 2))
        scores = rng.uniform(0, 1, n).astype(np.float32)
        keep, valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), thresh, n)
        got = [int(i) for i, v in zip(np.asarray(keep), np.asarray(valid)) if v]
        expect = np_greedy_nms(boxes, scores, thresh)
        assert got == expect

    def test_budget_truncation(self, rng):
        boxes = np.array([[i * 100.0, 0, i * 100 + 10, 10] for i in range(8)],
                         np.float32)
        scores = np.arange(8, dtype=np.float32)
        keep, valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 3)
        assert list(np.asarray(keep)) == [7, 6, 5]
        assert np.asarray(valid).all()

    def test_valid_mask_excludes(self):
        boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
        scores = np.array([0.9, 0.8], np.float32)
        keep, valid = nms_fixed(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, 2,
            valid=jnp.asarray([False, True]),
        )
        arr = np.asarray(keep)
        assert arr[0] == 1 and not np.asarray(valid)[1]

    def test_batched_category_isolation(self):
        # identical boxes, different categories -> both kept
        boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
        scores = np.array([0.9, 0.8], np.float32)
        keep, valid = batched_nms_fixed(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray([0, 1]), 0.5, 2
        )
        assert np.asarray(valid).all()

    def test_nms_threshold_one_keeps_all(self, rng):
        # the reference retry-NMS relies on thresh=1.0 keeping everything
        n = 10
        boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (n, 1))
        scores = rng.uniform(0, 1, n).astype(np.float32)
        keep, valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 1.0, n)
        assert np.asarray(valid).all()


class TestRoIPool:
    def test_matches_oracle(self, rng):
        feat = rng.standard_normal((20, 24, 8)).astype(np.float32)
        boxes = np.array(
            [
                [0, 0, 100, 100],
                [32, 16, 200, 150],
                [5, 5, 40, 40],
                [300, 300, 360, 380],  # partially outside after scaling
            ],
            np.float32,
        )
        out = roi_pool(jnp.asarray(feat), jnp.asarray(boxes), 7, 1.0 / 16)
        expect = np_roi_pool(feat, boxes, 7, 1.0 / 16)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)

    def test_output_shape_14(self, rng):
        feat = rng.standard_normal((50, 84, 4)).astype(np.float32)
        boxes = rng.uniform(0, 700, (10, 4)).astype(np.float32)
        boxes[:, 2:] = boxes[:, :2] + rng.uniform(30, 500, (10, 2))
        out = roi_pool(jnp.asarray(feat), jnp.asarray(boxes), 14, 1.0 / 16)
        assert out.shape == (10, 14, 14, 4)
        # sanity vs oracle on big maps too
        expect = np_roi_pool(feat, np.clip(boxes, 0, 1333), 14, 1.0 / 16)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)

    def test_roi_align_smoke(self, rng):
        feat = rng.standard_normal((20, 20, 4)).astype(np.float32)
        boxes = np.array([[0, 0, 160, 160], [40, 40, 120, 140]], np.float32)
        out = roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 1.0 / 16, 2)
        assert out.shape == (2, 7, 7, 4)
        # constant feature map -> constant output regardless of sampling
        const = jnp.ones((20, 20, 4))
        out2 = roi_align(const, jnp.asarray(boxes), 7, 1.0 / 16, 2)
        np.testing.assert_allclose(np.asarray(out2), 1.0, rtol=1e-6)


class TestRoIPoolFormulations:
    def test_sparse_table_matches_offsets(self, rng):
        """The fast range-max-query formulation must agree exactly with
        the independently derived offset-loop oracle on clipped boxes."""
        from vltk_tpu.ops.roi_pool import roi_pool_offsets

        for h, w, out_size in ((52, 84, 14), (20, 24, 7), (4, 4, 7)):
            feat = rng.standard_normal((h, w, 16)).astype(np.float32)
            n = 64
            boxes = np.zeros((n, 4), np.float32)
            boxes[:, 0] = rng.uniform(0, w * 16 - 2, n)
            boxes[:, 1] = rng.uniform(0, h * 16 - 2, n)
            boxes[:, 2] = boxes[:, 0] + rng.uniform(1, w * 16, n)
            boxes[:, 3] = boxes[:, 1] + rng.uniform(1, h * 16, n)
            boxes[:, 2] = np.minimum(boxes[:, 2], w * 16 - 1)
            boxes[:, 3] = np.minimum(boxes[:, 3], h * 16 - 1)
            # include degenerate tiny boxes
            boxes[0] = [3, 3, 3.5, 3.5]
            boxes[1] = [0, 0, w * 16 - 1, h * 16 - 1]  # full image
            fast = roi_pool(jnp.asarray(feat), jnp.asarray(boxes), out_size, 1 / 16)
            slow = roi_pool_offsets(
                jnp.asarray(feat), jnp.asarray(boxes), out_size, 1 / 16
            )
            np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))

    def test_sparse_table_bf16(self, rng):
        from vltk_tpu.ops.roi_pool import roi_pool_offsets

        feat = rng.standard_normal((20, 24, 8)).astype(np.float32)
        boxes = np.array([[0, 0, 100, 100], [32, 16, 200, 150]], np.float32)
        fast = roi_pool(
            jnp.asarray(feat).astype(jnp.bfloat16), jnp.asarray(boxes), 7, 1 / 16
        )
        assert fast.dtype == jnp.bfloat16
        slow = roi_pool_offsets(
            jnp.asarray(feat).astype(jnp.bfloat16), jnp.asarray(boxes), 7, 1 / 16
        )
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


class TestRoIPoolPallas:
    def test_pallas_int8_matches_xla(self, rng):
        """int8 (quantized-activation) kernel path, interpret mode: must
        bit-match pooling the float copy of the int8 values (quantize is
        monotone, so it commutes with max-pool). On real TPU this dtype
        routes to XLA instead — Mosaic crashes on int8 dynamic sublane
        slices (see the kernel docstring dead-end note)."""
        import jax

        from vltk_tpu.ops.pallas_kernels import roi_pool_pallas

        b, h, w, c, p, out_size = 2, 20, 24, 8, 6, 7
        feat = np.clip(
            np.round(rng.standard_normal((b, h, w, c)) * 40), -127, 127
        ).astype(np.int8)
        boxes = np.zeros((b, p, 4), np.float32)
        boxes[..., 0] = rng.uniform(0, w * 16 - 2, (b, p))
        boxes[..., 1] = rng.uniform(0, h * 16 - 2, (b, p))
        boxes[..., 2] = np.minimum(
            boxes[..., 0] + rng.uniform(1, w * 16, (b, p)), w * 16 - 1
        )
        boxes[..., 3] = np.minimum(
            boxes[..., 1] + rng.uniform(1, h * 16, (b, p)), h * 16 - 1
        )
        boxes[0, 0] = [3, 3, 3.5, 3.5]
        got = roi_pool_pallas(
            jnp.asarray(feat), jnp.asarray(boxes), out_size, 1 / 16,
            interpret=True,
        )
        assert got.dtype == jnp.int8
        want = jax.vmap(
            lambda f, bx: roi_pool(f, bx, out_size, 1 / 16)
        )(jnp.asarray(feat, jnp.float32), jnp.asarray(boxes))
        np.testing.assert_array_equal(
            np.asarray(got, np.int32), np.asarray(want).astype(np.int32)
        )

    def test_pallas_matches_xla(self, rng):
        """Pallas kernel (interpret mode) vs the XLA sparse-table path."""
        import jax

        from vltk_tpu.ops.pallas_kernels import roi_pool_pallas

        b, h, w, c, p, out_size = 2, 20, 24, 8, 6, 7
        feat = rng.standard_normal((b, h, w, c)).astype(np.float32)
        boxes = np.zeros((b, p, 4), np.float32)
        boxes[..., 0] = rng.uniform(0, w * 16 - 2, (b, p))
        boxes[..., 1] = rng.uniform(0, h * 16 - 2, (b, p))
        boxes[..., 2] = np.minimum(
            boxes[..., 0] + rng.uniform(1, w * 16, (b, p)), w * 16 - 1
        )
        boxes[..., 3] = np.minimum(
            boxes[..., 1] + rng.uniform(1, h * 16, (b, p)), h * 16 - 1
        )
        boxes[0, 0] = [3, 3, 3.5, 3.5]  # degenerate tiny box
        got = roi_pool_pallas(
            jnp.asarray(feat), jnp.asarray(boxes), out_size, 1 / 16,
            interpret=True,
        )
        want = jax.vmap(lambda f, bx: roi_pool(f, bx, out_size, 1 / 16))(
            jnp.asarray(feat), jnp.asarray(boxes)
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_channel_block_override_matches(self, rng):
        """Explicit channel blocking (perf knob) is numerically identical
        to the auto heuristic."""
        from vltk_tpu.ops.pallas_kernels import roi_pool_pallas

        feat = rng.standard_normal((2, 12, 16, 8)).astype(np.float32)
        boxes = np.array(
            [[[0, 0, 100, 100], [16, 16, 200, 150]]] * 2, np.float32
        )
        auto = roi_pool_pallas(
            jnp.asarray(feat), jnp.asarray(boxes), 7, 1 / 16, interpret=True
        )
        blocked = roi_pool_pallas(
            jnp.asarray(feat), jnp.asarray(boxes), 7, 1 / 16, interpret=True,
            channel_block=4,
        )
        np.testing.assert_array_equal(np.asarray(auto), np.asarray(blocked))

    def test_custom_vjp_matches_xla_grad(self, rng):
        """The pallas kernel's custom VJP (backward via the XLA path) must
        produce the same feature gradient as differentiating the XLA
        formulation directly — this is what lets detection training run
        through the fast kernel on TPU."""
        import jax

        from vltk_tpu.ops.pallas_kernels import _roi_pool_xla, roi_pool_pallas_ad

        feat = jnp.asarray(rng.standard_normal((2, 16, 20, 8)), jnp.float32)
        boxes = jnp.asarray(
            [[[0, 0, 120, 100], [16, 16, 200, 150], [3, 3, 3.5, 3.5]]] * 2,
            jnp.float32,
        )
        loss_p = lambda f: jnp.sum(
            jnp.sin(roi_pool_pallas_ad(f, boxes, 7, 1 / 16, True))
        )
        loss_x = lambda f: jnp.sum(jnp.sin(_roi_pool_xla(f, boxes, 7, 1 / 16)))
        gp, gx = jax.grad(loss_p)(feat), jax.grad(loss_x)(feat)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-6)
        # boxes get zero cotangent (piecewise-constant, torchvision parity)
        gb = jax.grad(
            lambda b: jnp.sum(roi_pool_pallas_ad(feat, b, 7, 1 / 16, True))
        )(boxes)
        np.testing.assert_array_equal(np.asarray(gb), 0.0)

    def test_full_image_and_degenerate_boxes(self, rng):
        """Extra geometry coverage for the v3 kernel (interpret mode):
        full-image box (widest bins) + degenerate tiny box vs XLA path."""
        import jax

        from vltk_tpu.ops.pallas_kernels import roi_pool_pallas as roi_pool_pallas_v2

        b, h, w, c, p, out_size = 2, 20, 24, 8, 6, 7
        feat = rng.standard_normal((b, h, w, c)).astype(np.float32)
        boxes = np.zeros((b, p, 4), np.float32)
        boxes[..., 0] = rng.uniform(0, w * 16 - 2, (b, p))
        boxes[..., 1] = rng.uniform(0, h * 16 - 2, (b, p))
        boxes[..., 2] = np.minimum(
            boxes[..., 0] + rng.uniform(1, w * 16, (b, p)), w * 16 - 1
        )
        boxes[..., 3] = np.minimum(
            boxes[..., 1] + rng.uniform(1, h * 16, (b, p)), h * 16 - 1
        )
        boxes[0, 0] = [3, 3, 3.5, 3.5]
        boxes[0, 1] = [0, 0, w * 16 - 1, h * 16 - 1]  # full-image box
        got = roi_pool_pallas_v2(
            jnp.asarray(feat), jnp.asarray(boxes), out_size, 1 / 16,
            interpret=True,
        )
        want = jax.vmap(lambda f, bx: roi_pool(f, bx, out_size, 1 / 16))(
            jnp.asarray(feat), jnp.asarray(boxes)
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_dropped_level0_path_matches(self, rng):
        """The f32 VMEM-budget path (table level 0 dropped, len-1 rows
        read from the feature block) is numerically identical."""
        from vltk_tpu.ops.pallas_kernels import _roi_pool_xla, roi_pool_pallas

        feat = rng.standard_normal((2, 20, 24, 8)).astype(np.float32)
        boxes = np.array(
            [[[0, 0, 120, 100], [16, 16, 200, 150], [3, 3, 3.5, 3.5],
              [0, 0, 24 * 16 - 1, 20 * 16 - 1]]] * 2,
            np.float32,
        )
        want = _roi_pool_xla(jnp.asarray(feat), jnp.asarray(boxes), 7, 1 / 16)
        for lv0 in (0, 1):
            got = roi_pool_pallas(
                jnp.asarray(feat), jnp.asarray(boxes), 7, 1 / 16,
                interpret=True, _lv0=lv0,
            )
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_auto_dispatch_off_tpu(self, rng):
        from vltk_tpu.ops.pallas_kernels import roi_pool_auto

        feat = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
        boxes = np.array([[[0, 0, 100, 100], [16, 16, 200, 200]]], np.float32)
        out = roi_pool_auto(jnp.asarray(feat), jnp.asarray(boxes), 7, 1 / 16)
        assert out.shape == (1, 2, 7, 7, 4)


class TestMatrixNMS:
    def test_matrix_matches_scan(self, rng):
        from vltk_tpu.ops.nms import nms_fixed, nms_fixed_matrix

        for _ in range(8):
            n = 120
            b = rng.uniform(0, 300, (n, 4)).astype(np.float32)
            b[:, 2:] = b[:, :2] + rng.uniform(5, 150, (n, 2))
            s = rng.normal(size=n).astype(np.float32)
            valid = rng.random(n) > 0.15
            k1, v1 = nms_fixed(jnp.asarray(b), jnp.asarray(s), 0.5, 40,
                               jnp.asarray(valid))
            k2, v2 = nms_fixed_matrix(jnp.asarray(b), jnp.asarray(s), 0.5, 40,
                                      jnp.asarray(valid))
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
            np.testing.assert_array_equal(
                np.asarray(k1)[np.asarray(v1)], np.asarray(k2)[np.asarray(v2)]
            )

    def test_blocked_and_unrolled_match_scan(self, rng):
        """nms_fixed_blocked and nms_fixed(unroll=...) are exact greedy —
        same keep-set AND order as the reference scan, including with
        validity masks, heavy overlap clusters, and more survivors than
        the budget."""
        import jax

        from vltk_tpu.ops.nms import nms_fixed, nms_fixed_blocked

        for trial in range(6):
            n = 150
            b = rng.uniform(0, 120, (n, 4)).astype(np.float32)  # dense -> overlap
            b[:, 2:] = b[:, :2] + rng.uniform(5, 80, (n, 2))
            s = rng.normal(size=n).astype(np.float32)
            valid = rng.random(n) > 0.2
            for max_out in (10, 40, 140):
                k1, v1 = nms_fixed(
                    jnp.asarray(b), jnp.asarray(s), 0.5, max_out,
                    jnp.asarray(valid),
                )
                for impl in (
                    lambda *a: nms_fixed(*a, unroll=8),
                    lambda *a: nms_fixed_blocked(*a, block=16),
                    lambda *a: nms_fixed_blocked(*a, block=64),
                ):
                    k2, v2 = impl(
                        jnp.asarray(b), jnp.asarray(s), 0.5, max_out,
                        jnp.asarray(valid),
                    )
                    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
                    np.testing.assert_array_equal(
                        np.asarray(k1)[np.asarray(v1)],
                        np.asarray(k2)[np.asarray(v2)],
                    )

    def test_blocked_degenerate_and_vmap(self, rng):
        """Zero-area boxes must not be re-selected forever (the scan guards
        via self-suppression; blocked must too), and the while_loop body
        must be vmappable (propose runs it per image)."""
        import jax

        from vltk_tpu.ops.nms import nms_fixed, nms_fixed_blocked

        n = 40
        b = rng.uniform(0, 100, (n, 4)).astype(np.float32)
        b[:, 2:] = b[:, :2] + rng.uniform(5, 50, (n, 2))
        b[::5, 2:] = b[::5, :2]  # zero-area every 5th box
        s = rng.normal(size=n).astype(np.float32)
        k1, v1 = nms_fixed(jnp.asarray(b), jnp.asarray(s), 0.5, n)
        k2, v2 = nms_fixed_blocked(jnp.asarray(b), jnp.asarray(s), 0.5, n)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(
            np.asarray(k1)[np.asarray(v1)], np.asarray(k2)[np.asarray(v2)]
        )

        # block larger than the candidate count must clamp, not raise
        # (tiny smoke geometries feed K < the default block=64), and
        # still produce the exact greedy keep-set
        k3, v3 = nms_fixed_blocked(
            jnp.asarray(b), jnp.asarray(s), 0.5, n, block=4 * n
        )
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v3))
        np.testing.assert_array_equal(
            np.asarray(k1)[np.asarray(v1)], np.asarray(k3)[np.asarray(v3)]
        )

        bb = rng.uniform(0, 100, (3, n, 4)).astype(np.float32)
        bb[..., 2:] = bb[..., :2] + rng.uniform(5, 50, (3, n, 2))
        ss = rng.normal(size=(3, n)).astype(np.float32)
        kb, vb = jax.jit(
            jax.vmap(lambda B, S: nms_fixed_blocked(B, S, 0.5, 12, block=8))
        )(jnp.asarray(bb), jnp.asarray(ss))
        for i in range(3):
            k1, v1 = nms_fixed(jnp.asarray(bb[i]), jnp.asarray(ss[i]), 0.5, 12)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(vb[i]))
            np.testing.assert_array_equal(
                np.asarray(k1)[np.asarray(v1)],
                np.asarray(kb[i])[np.asarray(vb[i])],
            )

    def test_topk_membership_matches_lax(self, rng):
        import jax

        from vltk_tpu.ops.nms import topk_mask_compact

        for n, k in ((5000, 600), (100, 100), (50, 64)):
            s = rng.normal(size=n).astype(np.float32)
            idx, valid = topk_mask_compact(jnp.asarray(s), k)
            got = set(np.asarray(idx)[np.asarray(valid)].tolist())
            want = set(
                np.asarray(jax.lax.top_k(jnp.asarray(s), min(k, n))[1]).tolist()
            )
            assert got == want

    def test_kth_largest_exact(self, rng):
        from vltk_tpu.ops.nms import kth_largest

        s = rng.normal(size=(3, 1000)).astype(np.float32)
        got = np.asarray(kth_largest(jnp.asarray(s), 100))
        want = np.sort(s, axis=-1)[:, -100]
        np.testing.assert_allclose(got, want, rtol=1e-6)
