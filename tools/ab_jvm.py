"""One-off: interleaved fresh-JVM A/B of extraction-leg JVM/Arrow variants.

Each sample is a FRESH `bench.py --extract-timing` subprocess (fresh JVM),
because the effects under test are fresh-JVM transients (ParallelGC heap
growth / adaptive sizing, tiered JIT) and Arrow feed batching. Variants are
cycled round-robin so slow host drift hits all of them symmetrically.
Prints one JSON line per sample plus a summary line.

Env: SPARK_GRAFT_CPUS (default 8), AB_FANOUT (24), AB_ROUNDS (2).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")
FANOUT = os.environ.get("AB_FANOUT", "24")
ROUNDS = int(os.environ.get("AB_ROUNDS", "2"))

VARIANTS = {
    "baseline": {},
    "xms": {"SPARK_GRAFT_JAVA_OPTS": "-Xms16g"},
    "bytes16m": {"SPARK_GRAFT_ARROW_MAX_BYTES": "16m"},
    "xms_bytes16m": {
        "SPARK_GRAFT_JAVA_OPTS": "-Xms16g",
        "SPARK_GRAFT_ARROW_MAX_BYTES": "16m",
    },
}


def run_variant(name: str, extra: dict) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=CPUS,
        BENCH_EXTRACT_PARAS="200",
        BENCH_EXTRACT_FANOUT=FANOUT,
        BENCH_EXTRACT_RUNS="3",
        BENCH_SALT_PARTS=str(int(CPUS) * 8),
        **extra,
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--extract-timing"],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "docs_per_sec" in obj:
            return obj
    raise RuntimeError(f"{name}: no result\n{proc.stdout[-1500:]}\n{proc.stderr[-1500:]}")


def main():
    results = {k: [] for k in VARIANTS}
    for r in range(ROUNDS):
        for name, extra in VARIANTS.items():
            out = run_variant(name, extra)
            results[name].append(out)
            print(
                json.dumps(
                    {
                        "round": r,
                        "variant": name,
                        "docs_per_sec": out["docs_per_sec"],
                        "warmup_runs": out.get("warmup_runs"),
                        "runs": out["runs"],
                    }
                ),
                flush=True,
            )
    print(
        json.dumps(
            {
                "summary": {
                    k: {
                        "best_docs_per_sec": max(o["docs_per_sec"] for o in v),
                        "all": [o["docs_per_sec"] for o in v],
                    }
                    for k, v in results.items()
                }
            }
        )
    )


if __name__ == "__main__":
    main()
