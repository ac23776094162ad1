"""Summarize a measurements/<stamp>/ sweep into one compact report.

scripts/measure_all.sh writes one log per artifact (parity, ablate, micro,
bench x3 variants, segment micro). This reads them back and prints:
  - the parity verdict (hard gate — nothing else matters if this fails)
  - per-frame ablation rows (ms/frame) for each capacity
  - every bench JSON line, with the headline fields side by side

Usage: python scripts/summarize_measurements.py [measurements/<stamp>]
(defaults to the newest stamp directory).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path


def newest(root: Path) -> Path:
    stamps = sorted(d for d in root.iterdir() if d.is_dir())
    if not stamps:
        raise SystemExit(f"no sweep directories under {root}")
    return stamps[-1]


def read(d: Path, name: str) -> str:
    p = d / f"{name}.log"
    return p.read_text(errors="replace") if p.exists() else ""


def bench_json(text: str) -> dict | None:
    # bench.py prints exactly one JSON object line; logging noise surrounds it.
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main() -> None:
    root = Path(__file__).resolve().parent.parent / "measurements"
    d = Path(sys.argv[1]) if len(sys.argv) > 1 else newest(root)
    print(f"sweep: {d}")

    parity = read(d, "parity")
    if "PARITY OK" in parity:
        print("parity: OK")
    elif "PARITY FAIL" in parity:
        print("parity: *** FAIL ***")
        for ln in parity.splitlines():
            if "FAIL" in ln:
                print(f"  {ln}")
    else:
        print("parity: (no verdict — log truncated or run timed out)")

    for name in ("ablate_512", "ablate_1024", "micro_512", "micro_1024", "seg_micro"):
        text = read(d, name)
        rows = [
            ln
            for ln in text.splitlines()
            if re.search(r"\d+\.\d+ ms(/frame)?", ln) and "Traceback" not in ln
        ]
        if rows:
            print(f"\n{name}:")
            for ln in rows:
                print(f"  {ln.rstrip()}")

    print("\nbench variants:")
    keys = (
        "value",
        "single_stream_rtf_best",
        "streaming_rtf",
        "ttfa_p50_ms",
        "batch64_aggregate_rtf",
        "engine64_aggregate_rtf",
        "engine64_ttfa_p50_ms",
        "engine64_churn_ttfa_p50_ms",
        "engine64_lateness_p99_ms",
        "engine64_stalled_streams_3frame_buffer",
    )
    header = ["variant"] + [k.replace("engine64_", "e64_").replace("batch64_", "b64_") for k in keys]
    rows = []
    for name in ("bench", "bench_seg", "bench_seg_tri"):
        j = bench_json(read(d, name))
        if j is None:
            rows.append([name, "(no JSON — failed or timed out)"])
            continue
        flat = {**j.get("extra", {}), "value": j.get("value")}
        rows.append([name] + [str(flat.get(k, "-")) for k in keys])
    widths = [max(len(r[i]) for r in [header] + rows if i < len(r)) for i in range(len(header))]
    for r in [header] + rows:
        print("  " + "  ".join(c.ljust(widths[i]) for i, c in enumerate(r)))


if __name__ == "__main__":
    main()
