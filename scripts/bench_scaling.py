#!/usr/bin/env python3
"""Scaling study: run bench.py at N and 4N cores sequentially (fresh JVM per
run, nothing else on the box) and write BENCH/BASELINE.md.

Evidences the north rule's two-cluster-size criterion in-sandbox:
efficiency = throughput(4N) / (4 * throughput(N)), target >= 0.8.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    r_n = run(N)
    r_4n = run(4 * N)
    enc_n = r_n["extra"]["encode_tokens_per_sec"]
    enc_4n = r_4n["extra"]["encode_tokens_per_sec"]
    dv_n = r_n["extra"]["decode_verify_tokens_per_sec"]
    dv_4n = r_4n["extra"]["decode_verify_tokens_per_sec"]
    eff_enc = enc_4n / (4 * enc_n)
    eff_dv = dv_4n / (4 * dv_n)
    ratio = r_4n["extra"]["compression_vs_reference"]

    md = f"""# BENCH baseline — measured {time.strftime('%Y-%m-%d %H:%M:%S')}

Input: deterministic synthetic sequences table, {r_n['extra']['total_tokens']:,} tokens
({r_n['sf']}); identical input + code at both parallelism levels, fresh JVM per
run, sequential (no co-running load). Protocol per BASELINE.md: efficiency =
throughput(4N) / (4 x throughput(N)), N={N} cores.

| metric | local[{N}] | local[{4 * N}] | efficiency / ratio | target |
|---|---|---|---|---|
| encode tokens/sec | {enc_n:,.0f} | {enc_4n:,.0f} | {eff_enc:.3f} | >= 0.8 |
| decode+verify tokens/sec | {dv_n:,.0f} | {dv_4n:,.0f} | {eff_dv:.3f} | — |
| compressed bytes, engine block col vs reference-config parquet tokens col | {r_4n['extra']['engine_block_col_bytes']:,} | {r_4n['extra']['reference_tokens_col_bytes']:,} (ref) | {ratio:.4f} | <= 1.0 |
| round-trip mismatches | {r_n['extra']['n_mismatch']} | {r_4n['extra']['n_mismatch']} | — | 0 |

Raw bench lines:

```json
{json.dumps(r_n)}
{json.dumps(r_4n)}
```

Query timings (sec):

| query | local[{N}] | local[{4 * N}] |
|---|---|---|
""" + "\n".join(
        f"| {q} | {r_n['queries'][q]} | {r_4n['queries'][q]} |"
        for q in r_n["queries"]
    ) + "\n"

    out_path = REPO / "BENCH" / "BASELINE.md"
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(md)
    print(md)
    print(f"written: {out_path}")


if __name__ == "__main__":
    main()
