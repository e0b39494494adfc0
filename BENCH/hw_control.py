#!/usr/bin/env python
"""Ray-free hardware-throughput control for the scaling protocol.

This sandbox is a shared-host VM: >=8-core runs show one-sided
slowdowns of up to ~30% run-to-run, so a raw engine speedup number is
meaningless without knowing what the HOST could do in the same noise
window. This control measures exactly that: ``P`` plain
``multiprocessing`` workers (zero coordination, zero Ray) each burn the
same cache-resident kernel the engine's compute emulator uses
([1024, 256] float32 sgemm + tanh, 2 layers — see
``kgflow/fixtures/stub_model.py::_ComputeEmulator``) and report
aggregate tokens/sec.

Used by ``BENCH/scaling_protocol.py``, which runs a control leg at the
same process count immediately before every engine leg, so each engine
leg gets a per-window hardware ceiling rather than a per-day one.

    python BENCH/hw_control.py <procs> [chunks_per_proc]
    -> {"procs": P, "tokens_per_sec": ..., "sec": ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

CHUNK = 1024
HIDDEN = 256
LAYERS = 2


def _worker(n_chunks: int, out_q) -> None:
    # mirror the engine: BLAS kept single-threaded, burn is compute-bound
    os.environ["OMP_NUM_THREADS"] = "1"
    os.environ["OPENBLAS_NUM_THREADS"] = "1"
    os.environ["MKL_NUM_THREADS"] = "1"
    import numpy as np

    rng = np.random.RandomState(0)
    W = (rng.randn(HIDDEN, HIDDEN).astype(np.float32) / np.sqrt(HIDDEN))
    x0 = rng.randn(1, HIDDEN).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        X = np.broadcast_to(x0, (CHUNK, HIDDEN)).copy()
        for _ in range(LAYERS):
            X = np.tanh(X @ W)
        if float(X[0, 0]) > 1e30:  # pragma: no cover — defeat DCE
            raise RuntimeError("unreachable")
    out_q.put(time.perf_counter() - t0)


def run_control(procs: int, chunks_per_proc: int = 300) -> dict:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    ps = [
        ctx.Process(target=_worker, args=(chunks_per_proc, q))
        for _ in range(procs)
    ]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    secs = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    total_tokens = procs * chunks_per_proc * CHUNK
    return {
        "procs": procs,
        "sec": round(wall, 3),
        "worker_secs": [round(s, 3) for s in sorted(secs)],
        # aggregate throughput over the parallel window — the number the
        # protocol uses for the per-window hardware-speedup ratio
        "tokens_per_sec": round(total_tokens / wall, 1),
    }


if __name__ == "__main__":
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    print(json.dumps(run_control(procs, chunks)))
