"""Pin the canonical CPU reference-loop qps (VERDICT r4 #6).

Measures bench.py's `bench_cpu_reference` (the reference's torch-CPU
retrieval loop, embed_utils.py:8-97 semantics) many times on THIS
machine and writes `BASELINE_CPU.json` with a hardware fingerprint.
bench.py then reports `vs_canonical` (stable round-over-round) next to
`vs_baseline` (live same-run control): movement in vs_canonical is
attributable to the NUMERATOR.

The pinned value is the BEST (fastest) pass observed — the most
favorable baseline, hence the most conservative reported speedup.

Usage: python scripts/pin_cpu_baseline.py [--passes 12]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import platform
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cpu_model() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return platform.processor() or "unknown"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=12)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_CPU.json"))
    args = ap.parse_args()

    import torch

    import bench

    corpus, queries = bench.make_data()
    t0 = time.perf_counter()
    qps_runs = []
    # bench_cpu_reference itself takes best-of-CPU_ITERS internally; run it
    # several times and keep every per-run number for the record.
    os.environ.setdefault("BENCH_CPU_ITERS", "3")
    for _ in range(max(1, args.passes // 3)):
        qps, _ = bench.bench_cpu_reference(corpus, queries)
        qps_runs.append(round(float(qps), 1))
    wall = time.perf_counter() - t0

    data = {
        "cpu_reference_qps": max(qps_runs),
        "qps_runs": qps_runs,
        "shape": {"N": bench.N, "DIM": bench.DIM, "P": bench.P, "K": bench.K},
        "fingerprint": {
            "cpu_model": cpu_model(),
            "cores": os.cpu_count(),
            "torch": torch.__version__,
            "torch_threads": torch.get_num_threads(),
            "platform": platform.platform(),
        },
        "measured": datetime.date.today().isoformat(),
        "wall_s": round(wall, 1),
        "recipe": "python scripts/pin_cpu_baseline.py",
    }
    with open(args.out, "w") as f:
        json.dump(data, f, indent=2)
        f.write("\n")
    print(json.dumps(data))


if __name__ == "__main__":
    main()
