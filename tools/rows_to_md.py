"""Render tools/tpu_rows.jsonl (run_tpu_rows.sh output) as a markdown
table for transcription into BASELINE.md. Groups by capture session
header lines (# tpu session ...); last value wins per metric within a
session."""

import json
import sys


def main(path="tools/tpu_rows.jsonl"):
    try:
        lines = open(path).read().splitlines()
    except FileNotFoundError:
        print(f"no {path} yet")
        return 1
    session = None
    rows = {}
    for ln in lines:
        ln = ln.strip()
        if not ln:
            continue
        if ln.startswith("#"):
            if rows:
                _dump(session, rows)
            session, rows = ln.lstrip("# "), {}
            continue
        try:
            d = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if "failed" in d:
            rows[f"FAILED: {d['failed']}"] = d
        elif "metric" in d:
            # same metric at different batch sizes are distinct rows
            # (e.g. --train frcnn --remat at b=4 and b=8): key on both so
            # last-wins only collapses true re-measurements
            key = d["metric"]
            if "batch" in d:
                key = f"{key} (b={d['batch']})"
            rows[key] = d
    if rows:
        _dump(session, rows)
    return 0


def _dump(session, rows):
    print(f"\n### {session}\n")
    print("| metric | value | unit | extra |")
    print("|---|---|---|---|")
    for name, d in rows.items():
        if name.startswith("FAILED"):
            print(f"| {name} | — | — | stderr: {d.get('stderr', '')} |")
            continue
        extra = {
            k: v for k, v in d.items()
            if k not in ("metric", "value", "unit", "vs_baseline")
        }
        print(f"| {name} | {d.get('value')} | {d.get('unit')} | "
              f"{json.dumps(extra) if extra else ''} |")


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
