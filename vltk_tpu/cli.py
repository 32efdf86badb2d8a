"""CLI: ``vltk <command> ...`` (reference: vltk/future/cli.py:67-152 —
python-fire ``Main`` with ``simple/exp/extract/data`` subcommands, yaml +
dot-flag config merge at 70-81, and atexit crash capture at 18-41).

Rebuilt on argparse (no third-party CLI dep):

  vltk data <dataset:split> [...] [--flags]       build loaders, print batch
  vltk extract <extractor> <dataset> [--flags]    run feature extraction
  vltk simple <experiment> [--flags]              run a registered experiment
  vltk predict <image> <question...>              end-to-end VQA inference
  vltk serve [--bundle=vqa.zip]                   JSONL micro-batch server
  vltk config [--flags]                           print the resolved config
  vltk adapters | experiments                     list registries

Flags: ``--yaml=file`` loads a base config; any ``--a.b.c=x`` dot-flag
overrides it (reference: utils/base.py:167-188 unflatten semantics).
"""

from __future__ import annotations

import json
import os
import sys
import traceback
from typing import Dict, List, Tuple

from vltk_tpu.config import Config, unflatten_dict


def _parse_flags(argv: List[str]) -> Tuple[List[str], Dict[str, str]]:
    """Split positionals from ``--key=value`` flags (``--flag`` -> true)."""
    positional, flags = [], {}
    for arg in argv:
        if arg.startswith("--"):
            body = arg[2:]
            if "=" in body:
                key, value = body.split("=", 1)
            else:
                key, value = body, "true"
            flags[key.replace("-", "_")] = value
        else:
            positional.append(arg)
    return positional, flags


def _build_config(flags: Dict[str, str]) -> Config:
    yaml_path = flags.pop("yaml", None)
    cfg = Config()
    if yaml_path:
        import yaml

        with open(yaml_path) as f:
            cfg.update(yaml.safe_load(f) or {})
    if flags:
        cfg.update(unflatten_dict(flags))
    return cfg


def _crash_report(cfg: Config, exc: BaseException) -> None:
    """Write the traceback under logdir (reference: future/cli.py:18-41
    captured stderr + emailed it on crash; we persist to disk)."""
    try:
        os.makedirs(cfg.logdir, exist_ok=True)
        path = os.path.join(cfg.logdir, "crash.txt")
        text = "".join(traceback.format_exception(exc))
        with open(path, "a") as f:
            f.write(text)
        print(f"crash report written to {path}", file=sys.stderr)
        if cfg.email:
            from vltk_tpu.utils.base import send_email

            send_email(cfg.email, "vltk crash", text)
    except OSError:
        pass


def cmd_data(positional: List[str], cfg: Config) -> int:
    if positional:
        # "vqa:train" -> ("vqa", "train"); bare "vqa" -> all splits
        specs = [p.split(":", 1) if ":" in p else [p] for p in positional]
        cfg.data.update({"train_datasets": specs})
    from vltk_tpu.experiments import Experiments

    Experiments.get("data")(cfg)()
    return 0


def cmd_extract(positional: List[str], cfg: Config, flags_extra: Dict) -> int:
    if len(positional) < 2:
        print("usage: vltk extract <extractor> <dataset> [--flags]", file=sys.stderr)
        return 2
    extractor_name, dataset_name = positional[0], positional[1]
    from vltk_tpu.adapters import Adapters

    extractor = Adapters.get(extractor_name)
    # extras flow into typed kwargs (FRCNNConfig overrides, batch_size);
    # raw CLI strings would be silently wrong there ("--int8=false" is a
    # truthy string) — coerce with the config parser's rules
    from vltk_tpu.config import _coerce

    extractor.extract(
        cfg.data.datadir,
        dataset_name=dataset_name,
        **{k: _coerce(v) for k, v in flags_extra.items()},
    )
    return 0


def _random_init_note(what: str) -> None:
    print(
        f"[predict] no checkpoint given: RANDOM-INIT {what} — output "
        "exercises the pipeline, not a trained model",
        file=sys.stderr,
    )


def _load_doc(path: str) -> Dict:
    with open(path) as f:
        doc = json.load(f)
    if "words" not in doc or "boxes" not in doc:
        raise ValueError(f"{path}: expected a json object with "
                         "'words' and 'boxes' (optional 'size': [h, w])")
    return doc


def _predict_doc(positional: List[str], flags: Dict[str, str]) -> int:
    """``vltk predict --task=doc <doc.json>`` — per-word document labels
    via DocTokenClassifier (FUNSD path)."""
    if len(positional) != 1:
        print("usage: vltk predict --task=doc <doc.json> "
              "[--labels=labels.json --ckpt=layoutlm.pt]", file=sys.stderr)
        return 2
    from vltk_tpu.predict import DocTokenClassifier

    # DocTokenClassifier resolves a path/list/map itself (_load_answer_list)
    labels = flags.get("labels") or [
        "other", "question", "answer", "header"]  # FUNSD defaults
    ckpt = flags.get("ckpt")
    if ckpt is not None:
        clf = DocTokenClassifier.from_pretrained(ckpt, labels, batch_size=1)
    else:
        _random_init_note("LayoutLM weights")
        clf = DocTokenClassifier(labels, batch_size=1)
    (res,) = clf([_load_doc(positional[0])])
    print(json.dumps([
        {"word": r["word"], "label": r["label"],
         "score": round(r["score"], 4)} for r in res
    ]))
    return 0


def _predict_span(positional: List[str], flags: Dict[str, str]) -> int:
    """``vltk predict --task=span <doc.json> <question...>`` — extractive
    document QA via DocSpanQA (DocVQA path; ``--ckpt=`` loads a torch
    LayoutLM checkpoint, qa_outputs head included when present)."""
    if len(positional) < 2:
        print("usage: vltk predict --task=span <doc.json> <question...> "
              "[--ckpt=layoutlm_qa.pt]", file=sys.stderr)
        return 2
    from vltk_tpu.predict import DocSpanQA

    ckpt = flags.get("ckpt")
    if ckpt is not None:
        qa = DocSpanQA.from_pretrained(ckpt, batch_size=1)
    else:
        _random_init_note("LayoutLM span-QA weights")
        qa = DocSpanQA(batch_size=1)
    (res,) = qa([_load_doc(positional[0])], [" ".join(positional[1:])])
    print(json.dumps(
        {"answer": res["answer"], "start_word": res["start_word"],
         "end_word": res["end_word"], "score": round(res["score"], 4)}
    ))
    return 0


def cmd_predict(positional: List[str], flags: Dict[str, str]) -> int:
    """``vltk predict <image> <question words...>`` — composed VQA
    inference (vltk_tpu/predict.py). With ``--frcnn=`` + ``--lxmert=``
    torch checkpoints and an ``--answers=`` vocabulary it answers for
    real; without them it runs the full pipeline at random init (loudly
    labeled) so the path is exercisable anywhere. ``--bundle=vqa.zip``
    serves from an AOT export instead (no model code or weights needed);
    ``--export-bundle=vqa.zip`` writes one after building the predictor.
    ``--task=doc`` labels an OCR document's words; ``--task=span``
    extracts a document answer span."""
    task = flags.get("task", "vqa")
    if task == "doc":
        return _predict_doc(positional, flags)
    if task == "span":
        return _predict_span(positional, flags)
    if task != "vqa":
        print(f"unknown --task={task!r} (vqa|doc|span)", file=sys.stderr)
        return 2
    if len(positional) < 2:
        print(
            "usage: vltk predict <image> <question...> "
            "[--answers=labels.json --frcnn=ckpt.pt --lxmert=ckpt.pt "
            "--top_k=5]",
            file=sys.stderr,
        )
        return 2
    image, question = positional[0], " ".join(positional[1:])
    from vltk_tpu.predict import VQAPredictor

    frcnn, lxmert = flags.get("frcnn"), flags.get("lxmert")
    answers = flags.get("answers")
    top_k = int(flags.get("top_k", "5"))
    if "bundle" in flags:
        if "export_bundle" in flags:
            # a bundled predictor holds opaque compiled artifacts — there
            # is nothing to re-lower, so re-export is impossible by design
            print("--export-bundle cannot be combined with --bundle "
                  "(export from checkpoints or random init)", file=sys.stderr)
            return 2
        # serve from an AOT export (vltk_tpu/aot.py): answers, vocab and
        # compiled steps all come from the artifact file
        predictor = VQAPredictor.from_bundle(flags["bundle"])
    elif (frcnn is None) != (lxmert is None):
        print("--frcnn and --lxmert must be given together", file=sys.stderr)
        return 2
    elif frcnn is not None:
        if answers is None:
            print("--answers is required with checkpoints", file=sys.stderr)
            return 2
        predictor = VQAPredictor.from_pretrained(
            frcnn, lxmert, answers, batch_size=1
        )
    else:
        answers = answers or ["yes", "no", "unknown"]
        _random_init_note("weights")
        predictor = VQAPredictor(answers, batch_size=1)
    if "export_bundle" in flags:
        out = predictor.export_bundle(flags["export_bundle"])
        print(f"[predict] wrote AOT serving bundle: {out}", file=sys.stderr)
    (res,) = predictor([image], [question], top_k=top_k)
    print(json.dumps(
        {
            "question": question,
            "answer": res["answer"],
            "score": round(res["score"], 4),
            "topk": [(a, round(s, 4)) for a, s in res["topk"]],
            "num_boxes": res["num_boxes"],
        }
    ))
    return 0


def cmd_serve(positional: List[str], flags: Dict[str, str]) -> int:
    """``vltk serve`` — long-lived JSONL inference server on stdin/stdout.

    One JSON request per input line, one JSON result per output line, in
    input order. Concurout requests are micro-batched into the
    predictor's fixed-shape buckets (vltk_tpu/serving.py) — piping a
    stream through this process gets batch-dense throughput.

    Sources (pick one):
      ``--bundle=file.zip``     AOT export; the task is read from the
                                bundle manifest (vqa/doc/span).
      ``--frcnn= --lxmert= --answers=``   VQA from torch checkpoints.
      (no flags)                random-init VQA (pipeline smoke).

    Request shapes:
      vqa:  {"image": "path.jpg", "question": "..."}
      doc:  {"words": [...], "boxes": [[x0,y0,x1,y1]...], "size": [h,w]}
      span: {"doc": {words, boxes, size}, "question": "..."}
    """
    import queue as queue_mod
    import threading
    from concurrent.futures import Future

    from vltk_tpu.predict import DocSpanQA, DocTokenClassifier, VQAPredictor
    from vltk_tpu.serving import for_doc, for_span, for_vqa

    max_delay = float(flags.get("max_delay_ms", "5"))
    # >1 overlaps bucket host prep/dispatch with the previous bucket's
    # device step (serving.MicroBatchServer workers)
    workers = int(flags.get("workers", "1"))
    kind_to_task = {
        "vqa_predictor": "vqa",
        "doc_token_classifier": "doc",
        "doc_span_qa": "span",
    }
    if "bundle" in flags:
        from vltk_tpu.aot import bundle_manifest

        kind = bundle_manifest(flags["bundle"])["meta"].get("kind")
        task = kind_to_task.get(kind)
        if task is None:
            print(f"unknown bundle kind {kind!r}", file=sys.stderr)
            return 2
        cls = {
            "vqa": VQAPredictor, "doc": DocTokenClassifier, "span": DocSpanQA
        }[task]
        predictor = cls.from_bundle(flags["bundle"])
    else:
        task = flags.get("task", "vqa")
        if task != "vqa":
            print("--task=doc|span serving needs --bundle (export one "
                  "with `vltk predict --task=... --export-bundle=`)",
                  file=sys.stderr)
            return 2
        frcnn, lxmert = flags.get("frcnn"), flags.get("lxmert")
        answers = flags.get("answers")
        if frcnn is not None and lxmert is not None and answers is not None:
            predictor = VQAPredictor.from_pretrained(frcnn, lxmert, answers)
        else:
            _random_init_note("weights")
            predictor = VQAPredictor(answers or ["yes", "no", "unknown"])

    if task == "vqa":
        srv = for_vqa(
            predictor, max_delay_ms=max_delay,
            top_k=int(flags.get("top_k", "5")), workers=workers,
        )
        to_request = lambda r: (r["image"], r["question"])  # noqa: E731
        to_line = lambda res: {  # noqa: E731
            "answer": res["answer"],
            "score": round(float(res["score"]), 4),
            "topk": [(a, round(float(s), 4)) for a, s in res["topk"]],
            "num_boxes": int(res["num_boxes"]),
        }
    elif task == "doc":
        srv = for_doc(predictor, max_delay_ms=max_delay, workers=workers)

        def to_request(r):
            # validate BEFORE batching: a malformed document must fail its
            # own request, not reach the predictor inside a shared bucket
            missing = [k for k in ("words", "boxes") if k not in r]
            if missing:
                raise ValueError(f"doc request missing keys {missing}")
            return r

        to_line = lambda res: [  # noqa: E731
            {"word": w["word"], "label": w["label"],
             "score": round(float(w["score"]), 4)}
            for w in res
        ]
    else:
        srv = for_span(predictor, max_delay_ms=max_delay, workers=workers)
        to_request = lambda r: (r["doc"], r["question"])  # noqa: E731
        to_line = lambda res: {  # noqa: E731
            "answer": res["answer"],
            "start_word": int(res["start_word"]),
            "end_word": int(res["end_word"]),
            "score": round(float(res["score"]), 4),
        }

    if flags.get("warmup") == "true":
        print("[serve] warming up (compiling the serving program)...",
              file=sys.stderr)
        predictor.warmup()
    print(f"[serve] ready: task={task} bucket={predictor.batch_size} "
          f"window={max_delay}ms", file=sys.stderr)
    # results must print the moment they complete — a request-response
    # client waits for the reply before writing its next line, so flushing
    # only when new input arrives would deadlock both sides. A writer
    # thread blocks on each future in submission order (keeping the output
    # stream in-order) while the main thread keeps reading stdin.
    outq: "queue_mod.Queue" = queue_mod.Queue()

    def _writer():
        while True:
            fut = outq.get()
            if fut is None:
                return
            try:
                print(json.dumps(to_line(fut.result())), flush=True)
            except Exception as exc:  # per-request failure, keep serving
                print(json.dumps({"error": str(exc)}), flush=True)

    writer = threading.Thread(target=_writer, daemon=True)
    writer.start()
    with srv:
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            try:
                req = to_request(json.loads(line))
            except Exception as exc:
                # bad input must not desync the in-order output stream:
                # queue it as an already-failed result in sequence
                fut: "Future" = Future()
                fut.set_exception(ValueError(f"bad request: {exc}"))
                outq.put(fut)
            else:
                outq.put(srv.submit(req))
        outq.put(None)
        writer.join()
    stats = srv.stats
    print(f"[serve] done: {stats}", file=sys.stderr)
    return 0


def cmd_simple(positional: List[str], cfg: Config) -> int:
    if not positional:
        print("usage: vltk simple <experiment> [--flags]", file=sys.stderr)
        return 2
    from vltk_tpu.experiments import Experiments

    exp_cls = Experiments.get(positional[0])

    # honor the declared mesh whenever the user explicitly set mesh.axes
    # (diff-tracked by BaseConfig), building it with the standard TP rules;
    # the untouched default stays mesh-less
    mesh = rules = None
    if "axes" in cfg.mesh.overwritten:
        axes = tuple(cfg.mesh.axes)
        if not all(
            isinstance(a, (tuple, list)) and len(a) == 2 for a in axes
        ):
            raise ValueError(
                f"mesh.axes must be ((name, size), ...) pairs, got {axes!r} "
                "— e.g. --mesh.axes='((data,4),(model,2))'"
            )
        from vltk_tpu.parallel import LXMERT_RULES

        mesh = cfg.mesh.build()
        rules = LXMERT_RULES

    exp = exp_cls(cfg, mesh=mesh, rules=rules)
    result = exp()
    print(result)
    return 0


def main(argv: List[str] = None) -> int:
    try:  # die quietly when piped into `head`
        import signal

        signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    except (ImportError, ValueError, AttributeError):
        pass
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    if argv[0] == "--version":
        from vltk_tpu import __version__

        print(f"vltk-tpu {__version__}")
        return 0
    command, rest = argv[0], argv[1:]
    positional, flags = _parse_flags(rest)

    if command == "adapters":
        from vltk_tpu.adapters import Adapters

        print("\n".join(Adapters.avail()))
        return 0
    if command == "experiments":
        from vltk_tpu.experiments import Experiments

        print("\n".join(Experiments.avail()))
        return 0
    if command == "predict":
        return cmd_predict(positional, flags)
    if command == "serve":
        return cmd_serve(positional, flags)

    # config-consuming commands: split known-config dot flags from extras
    known_top = {f.name for f in Config.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    cfg_flags = {k: v for k, v in flags.items() if k.split(".")[0] in known_top or k == "yaml"}
    extra = {k: v for k, v in flags.items() if k not in cfg_flags}
    cfg = _build_config(cfg_flags)

    try:
        if command == "config":
            cfg.print_config()
            return 0
        if command == "data":
            return cmd_data(positional, cfg)
        if command == "extract":
            return cmd_extract(positional, cfg, extra)
        if command == "simple":
            return cmd_simple(positional, cfg)
    except KeyError as exc:
        # registry lookup miss ("unknown adapter/experiment ...; available:
        # [...]") is a user typo, not a crash: print the helpful message
        # cleanly instead of a traceback + crash report
        msg = exc.args[0] if exc.args else str(exc)
        if isinstance(msg, str) and msg.startswith("unknown "):
            print(msg, file=sys.stderr)
            return 2
        _crash_report(cfg, exc)
        raise
    except Exception as exc:  # noqa: BLE001 — CLI boundary
        _crash_report(cfg, exc)
        raise
    print(f"unknown command {command!r}", file=sys.stderr)
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
