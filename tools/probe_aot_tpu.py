"""Prove cross-lowered AOT bundles on the real chip (run when the axon
tunnel is up).

Builds a tiny VQAPredictor bundle lowered for BOTH cpu and tpu from the
CPU platform (the deploy story: build box has no accelerator), then
deserializes it under the TPU backend and serves a request — asserting
answers/scores match the CPU-served bundle. One JSON line on success.

CPU-side correctness is already pinned hermetically
(tests/test_aot.py); this closes the one link the CPU suite cannot: the
tpu lowering actually compiles and runs on hardware.
"""

import json
import subprocess
import sys
import tempfile

BUILD = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "tests")
from test_predict import ANSWERS, TINY_FRCNN, TINY_LXMERT
from vltk_tpu.data.tokenizer import Tokenizer
from vltk_tpu.predict import VQAPredictor

vocab, bundle, img_path = sys.argv[1], sys.argv[2], sys.argv[3]
with open(vocab, "w") as f:
    f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                       "what", "is", "the", "cat"]) + "\n")
rng = np.random.default_rng(0)
img = rng.integers(0, 255, (48, 56, 3)).astype(np.uint8)
np.save(img_path, img)
live = VQAPredictor(
    ANSWERS, frcnn_config=TINY_FRCNN, lxmert_config=TINY_LXMERT,
    tokenizer=Tokenizer(name="NativeWordPiece", vocab_path=vocab,
                        max_seq_length=8),
    batch_size=1, raw_canvas=(64, 64), resized_canvas=(64, 64),
    short=32.0, maximum=64.0,
)
live.export_bundle(bundle, platforms=("cpu", "tpu"))
(res,) = VQAPredictor.from_bundle(bundle)([img], ["what is the cat"], top_k=3)
print(json.dumps({"answer": res["answer"], "score": res["score"]}))
"""

SERVE = r"""
import json, sys
import numpy as np
import jax
from vltk_tpu.predict import VQAPredictor

bundle, img_path = sys.argv[1], sys.argv[2]
assert jax.devices()[0].platform == "tpu", jax.devices()
img = np.load(img_path)
(res,) = VQAPredictor.from_bundle(bundle)([img], ["what is the cat"], top_k=3)
print(json.dumps({"answer": res["answer"], "score": res["score"]}))
"""


def run(code, *args, env=None):
    out = subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    with tempfile.TemporaryDirectory() as d:
        vocab, bundle, img = f"{d}/vocab.txt", f"{d}/vqa.zip", f"{d}/img.npy"
        cpu = run(BUILD, vocab, bundle, img)
        tpu = run(SERVE, bundle, img)
        ok = (
            tpu["answer"] == cpu["answer"]
            and abs(tpu["score"] - cpu["score"]) < 5e-3  # bf16-ish TPU drift
        )
        print(json.dumps({
            "metric": "aot_bundle_cross_platform_parity",
            "value": 1 if ok else 0,
            "unit": "bool",
            "cpu": cpu,
            "tpu": tpu,
            "vs_baseline": 0,
        }))
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
