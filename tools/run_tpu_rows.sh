#!/usr/bin/env bash
# Capture every pending TPU measurement in one pass (run when the axon
# tunnel is up).  Appends one JSON line per row to tools/tpu_rows.jsonl;
# transcribe the results into BASELINE.md tables afterwards.
#
# RESUMABLE: each completed command is recorded in tools/tpu_rows.done and
# skipped on re-runs — a reboot/kill mid-capture (each row takes ~10 min
# over the tunnel) resumes from the first missing row instead of redoing
# ~10 min per already-captured one. Delete tpu_rows.done to force a full
# re-capture.
#
# Pending as of round 3 (flash-attention + layoutlm benches landed while
# the tunnel was down):
#   - headline regression check (bf16 parity geometry, B=32 default)
#   - layoutlm seq-1024 serving: xla vs flash
#   - layoutlm seq-1024 fine-tune step: xla vs flash (+ remat variants)
#   - per-layer flash kernel probe (tools/probe_flash.py)
set -u -o pipefail
cd "$(dirname "$0")/.."
# this script only runs right after a successful tunnel probe — a stale
# failed-probe cache from the outage must not make bench fail fast
rm -f /tmp/vltk_tpu_probe_down
out=tools/tpu_rows.jsonl
done_f=tools/tpu_rows.done
ts=$(date -Is)
echo "# tpu session $ts" >> "$out"

log=tools/tpu_rows.log
run() {
  if [ -f "$done_f" ] && grep -Fxq "$*" "$done_f"; then
    echo "== skip (done): $*" >&2
    return 0
  fi
  echo "== $*" >&2
  echo "== $ts $*" >> "$log"
  if timeout "${ROW_TIMEOUT:-1800}" "$@" 2>> "$log" | grep -E '^\{' >> "$out"; then
    echo "$*" >> "$done_f"
  else
    echo "{\"failed\": \"$*\", \"stderr\": \"$log\"}" >> "$out"
  fi
}

run python bench.py
run python bench.py --infer vqa
run python bench.py --infer layoutlm
run python bench.py --infer layoutlm --attn flash
run python bench.py --infer vit
run python bench.py --infer vit --attn flash
run python bench.py --train layoutlm
run python bench.py --train layoutlm --attn flash
run python bench.py --train layoutlm --remat
run python bench.py --train layoutlm --attn flash --remat
run python bench.py --train frcnn
run python bench.py --train frcnn --remat
run python bench.py --train frcnn --remat --batch 8
run python bench.py --serve
run python tools/probe_aot_tpu.py

# ---- round-4 queue (ordered by evidence value; each row ~5-15 min) ----
# 1. production-preset candidates under the headline protocol (B=32)
#    (int8_200's first cold compile exceeded the default 1800 s row
#    timeout over the tunnel — give it a real budget)
ROW_TIMEOUT=5400 run python bench.py --preset int8_200
run python bench.py --preset int8_150
run python bench.py --preset props_200
# 2. the joint int8 x props x canvas Pareto (10 variants, 3 fresh
#    compiles -> needs more than the default row timeout)
ROW_TIMEOUT=5400 run python bench.py --preset-drift
# 3. flash attention's make-or-break: the seq-4096/8192 document
#    geometries (xla vs flash, infer + train; flash --batch 4 tests the
#    memory-lever claim where the xla backward's stored probs blow up)
run python bench.py --infer layoutlm --seq 4096
run python bench.py --infer layoutlm --seq 4096 --attn flash
run python bench.py --train layoutlm --seq 4096 --batch 1
run python bench.py --train layoutlm --seq 4096 --batch 1 --attn flash
run python bench.py --train layoutlm --seq 4096 --batch 4 --attn flash
run python bench.py --infer layoutlm --seq 8192 --batch 2
run python bench.py --infer layoutlm --seq 8192 --batch 2 --attn flash
# 4. clean serve re-run (the r4 workers=1 row was polluted by a ~17-min
#    tunnel stall; the explicit --steps only changes the done-file key)
run python bench.py --serve --steps 5
# 5. pass-3 follow-ups from the pass-2 findings:
#    - flash block-size sweep: default-128 blocks are the prime suspect
#      for flash's across-the-board losses (now incl. 4.0x at seq-4096)
ROW_TIMEOUT=5400 run python tools/probe_flash.py --sweep
#    - xla seq-8192 at B=1 (B=2 crashed the worker; flash ran at B=2 —
#      this row gives the honest per-image xla-vs-flash point at 8k)
run python bench.py --infer layoutlm --seq 8192 --batch 1
#    - xla seq-4096 train at B=2: does the probs-storage wall bite at 2?
run python bench.py --train layoutlm --seq 4096 --batch 2
# 6. pass-4: model-level re-measurement with the TUNED flash blocks
#    (models/lxmert.py:_tuned_block_sizes — the kernel sweep flipped
#    flash from 0.27x to 2.2-2.4x vs XLA; these rows re-decide the
#    model-level verdict. Explicit --batch only changes the done key.)
run python bench.py --infer layoutlm --attn flash --batch 32
run python bench.py --train layoutlm --attn flash --batch 8
run python bench.py --infer layoutlm --seq 4096 --attn flash --batch 8
run python bench.py --train layoutlm --seq 4096 --attn flash --batch 1
run python bench.py --train layoutlm --seq 4096 --attn flash --batch 4
run python bench.py --infer layoutlm --seq 8192 --attn flash --batch 2
run python bench.py --infer vit --attn flash --batch 64
# 7. pass-5: capability rows the tuned kernel unlocks
#    - seq-8192 TRAINING: xla cannot run it at any batch (the stored
#      probs alone are ~19 GB/img); flash has no stored probs
run python bench.py --train layoutlm --seq 8192 --attn flash --batch 1
#    - the long-doc training recipe: tuned flash + remat stacked
run python bench.py --train layoutlm --seq 4096 --attn flash --remat --batch 4
#    - 8k serving batch headroom
run python bench.py --infer layoutlm --seq 8192 --attn flash --batch 4
# 8. pass-6: int8 transformer serving (layers.Int8Dense — calibrated
#    PTQ on every encoder projection/MLP, the transformer twin of the
#    FRCNN int8 presets). Paired bf16 rows already measured: lxmert
#    9,536 img/s (B=128), vit 3,079 (B=64), layoutlm seq-1024 294.3 xla
#    / 368.6 flash (B=32), vqa e2e 53.4 (B=8).
run python bench.py --infer lxmert --int8 --batch 128
run python bench.py --infer vit --int8 --batch 64
run python bench.py --infer layoutlm --int8 --batch 32
run python bench.py --infer layoutlm --attn flash --int8 --batch 32
ROW_TIMEOUT=5400 run python bench.py --infer vqa --int8 --batch 8
run python bench.py --infer layoutlm --seq 4096 --attn flash --int8 --batch 8
#    flash backward-block sweep: uniform-1024 left seq-1024 grad at
#    0.92x xla — do smaller bwd (dkv/dq) tiles flip training to a win?
ROW_TIMEOUT=5400 run python tools/probe_flash.py --sweep-bwd
#    server-level full-int8 VQA serving (both models on the int8 path;
#    4 fresh compiles: dynamic warmup, calib, static, then serve)
ROW_TIMEOUT=7200 run python bench.py --serve --int8 --steps 5

# 9. pass-7: re-measure flash TRAINING with the split fwd/bwd tuned
#    blocks (--sweep-bwd verdict: bwd=512 beats bwd=1024 at 1024 AND
#    4096; _tuned_block_sizes now caps bwd blocks at 512). Infer rows
#    are unaffected (same fwd blocks). Explicit --steps only changes
#    the done-file key.
run python bench.py --train layoutlm --attn flash --batch 8 --steps 6
run python bench.py --train layoutlm --seq 4096 --attn flash --batch 4 --steps 6
run python bench.py --train layoutlm --seq 8192 --attn flash --batch 1 --steps 6
run python bench.py --train layoutlm --seq 4096 --attn flash --remat --batch 4 --steps 6

# 10. pass-8: (a) pass-7 verdict was length-SPLIT (bwd-512 won 1024,
#     lost 4096/8192 model-level) -> _tuned_block_sizes is now
#     conditional; confirm the shipped 4096 path reproduces the
#     uniform-1024 number (~15.0)
run python bench.py --train layoutlm --seq 4096 --attn flash --batch 4 --steps 7
#     (b) int8 at LXMERT's large-batch point (bf16 B=256: 9,877 img/s)
run python bench.py --infer lxmert --int8 --batch 256
#     (c) same-session bf16-vs-int8 serve pair: the first int8 serve
#     row (w1 13.16 / w2 13.09) ran in a different session than the
#     bf16 rows (w1 8.21 / w2 22.96) — tunnel weather varies 2.5x, so
#     pair them back-to-back to isolate the int8 effect at server level
ROW_TIMEOUT=7200 run python bench.py --serve --steps 6
ROW_TIMEOUT=7200 run python bench.py --serve --int8 --steps 6

# 11. pass-9: trained-weights drift DIRECTION (tools/probe_trained_drift
#     .py — fine-tunes the parity FRCNN on synthetic learnable scenes
#     in-environment, then re-runs the IDENTICAL preset-drift harness
#     with tamed-init vs trained weights; replaces the "structural
#     expectation" that trained objectness lifts props_*/int8_* box
#     agreement with a measured direction. Not the production budget —
#     that closure stays verify_checkpoint --pareto + real weights.)
ROW_TIMEOUT=7200 run python tools/probe_trained_drift.py --steps 300

# 12. pass-10 (round 5, VERDICT r4 tasks):
#     task 7 — flash routing boundary at seq-2048 (the interpolated
#     gap between the measured 1024 and 4096 wins; also exercises the
#     length-conditional backward tile at a length the sweep never saw)
run python bench.py --infer layoutlm --seq 2048
run python bench.py --infer layoutlm --seq 2048 --attn flash
run python bench.py --train layoutlm --seq 2048
run python bench.py --train layoutlm --seq 2048 --attn flash
#     task 1 — bytes-based roofline per stage: stem/res2/res3/res4
#     split + rpn_head vs propose (the two sub-53%-MXU stages get a
#     SOL column: measured-vs-max(flops/peak, bytes/bw))
ROW_TIMEOUT=5400 run python tools/probe_roofline.py
#     task 3 — int8 transformer fidelity at trained weights (synthetic
#     learnable finetune, then bf16-vs-int8 answer agreement; the
#     serving +22%/+19% rows get an accuracy column)
ROW_TIMEOUT=7200 run python tools/probe_int8_fidelity.py --steps 300
#     task 8 — process-pool host pipeline accounting row
run python bench.py --host --host-workers 2

# probe output is free-form text — keep it OUT of the jsonl
if [ ! -s tools/probe_flash_out.txt ]; then
  echo "== probe_flash" >&2
  timeout 1800 python tools/probe_flash.py > tools/probe_flash_out.txt 2>&1 || true
fi
# 5. per-stage MXU% table (free-form text; r4 adds FLOPs + utilization)
if [ ! -s tools/probe_stages_out.txt ]; then
  echo "== probe_stages" >&2
  timeout 3600 python tools/probe_stages.py > tools/probe_stages_out.txt 2>&1 || true
fi
echo "done -> $out (probes: tools/probe_{flash,stages}_out.txt; stderr: $log)" >&2

# 13. pass-10b (round 5, task-1 harvest): the roofline left ONE stage
#     open — propose at 65.7% SOL (14.78 ms B=16, 0 FLOPs). Hypothesis:
#     the 300 sequential NMS scan iterations, not bandwidth. Decompose
#     propose + race exact NMS variants (scan / unroll / blocked greedy;
#     parity locked by tests/test_ops.py + test_models.py), then A/B the
#     full parity headline with the best block size.
ROW_TIMEOUT=5400 run python tools/probe_propose.py
ROW_TIMEOUT=5400 run python bench.py --no-ladder --nms-block 32
ROW_TIMEOUT=5400 run python bench.py --no-ladder --nms-block 128
#     task-7 leftover: the seq-2048 xla train row timed out mid-compile
#     at the default 1800 s — retry with headroom
ROW_TIMEOUT=5400 run python bench.py --train layoutlm --seq 2048 --steps 6
#     kernel-level winner from probe_propose was m=64 (2.15/1.82 ms vs
#     scan 12.0) — headline A/B it too
ROW_TIMEOUT=5400 run python bench.py --no-ladder --nms-block 64
#     the --nms-block 32 full-program warmup CRASHED the TPU worker
#     (kernel fault, tools/tpu_rows.log) while the standalone vmapped
#     while_loop ran fine at B=16 — A/B the crash-free scan-unroll
#     variant too (12.0 -> 4.27 ms kernel-level), and retry blocked-64
#     at B=16 geometry to separate "blocked-in-full-program" from
#     "B=32 + blocked" as the crash trigger
ROW_TIMEOUT=5400 run python bench.py --no-ladder --nms-unroll 4
ROW_TIMEOUT=5400 run python bench.py --no-ladder --nms-block 64 --batch 16
#     TPU-side bit-parity of every NMS execution strategy (miscompile guard)
run python tools/probe_propose.py --parity
#     unroll-4 measured +2.6% (59.09) and is now the config DEFAULT —
#     confirm the default program end-to-end incl. the preset ladder
#     (distinct done-key from the earlier plain run)
ROW_TIMEOUT=7200 run python bench.py --steps 6
