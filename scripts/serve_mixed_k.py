"""Mixed-scene serving throughput: bucketed auto-K LCG vs static K=19.

VERDICT r4 item 3: a production batch mixes scenes with few and many
present classes; a single static-K serving program pays max-K LCG cost
(K masked seg fwd+bwd per guidance step — the dominant translate cost,
reference sgg/sgg.py:39) for EVERY image. `lcg_present_k='auto'` routes
each request to the smallest compiled covering-K bucket
(serving/server.py), so the few-class half of the traffic runs a cheaper
program while staying bit-exact per image.

Measures, on the real chip, a synthetic mixed workload (half 6-class,
half 14-class scenes) through the actual TranslationService micro-batch
path:
  static19 : lcg_present_k=19 (the max-K program, one width)
  auto     : lcg_present_k='auto', buckets (6, 14)
and asserts per-image bit-exactness auto == static19 for equal seeds.

Timing rules for the tunneled backend (CLAUDE.md rule 3): params are jit
arguments inside the service already; every timed round uses FRESH seeds
(new PRNG keys -> new args, defeating backend result-caching); the PNG
encode round-trip forces full readback. The two variants are different
compiled programs (present_k is a static jit argument), not trace-time
env flags, so one process may time both.

Usage: python scripts/serve_mixed_k.py [rounds] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
OUT = sys.argv[2] if len(sys.argv) > 2 else "outputs/serve_mixed_k_r08.json"

import jax

cache_dir = os.path.expanduser("~/.cache/jax_compcache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from weatherconverter_tpu.core.config import load_translation_config
from weatherconverter_tpu.serving.server import TranslationService

import base64
import io

from PIL import Image


def b64_png(arr_u8: np.ndarray) -> str:
    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


# 6-class scene: raw ids -> train ids 7->0 road, 8->1 sidewalk, 11->2
# building, 21->8 vegetation, 23->10 sky, 26->13 car (a sparse urban scene);
# 14-class adds 12,13,17,19,20,22,24,25 (wall fence pole light sign terrain
# person rider) — a dense one.
SPARSE_RAW = [7, 8, 11, 21, 23, 26]
DENSE_RAW = SPARSE_RAW + [12, 13, 17, 19, 20, 22, 24, 25]


def scene(raw_ids, hw: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    # blocky regions so NEAREST-resize keeps every class present
    blocks = rng.choice(raw_ids, size=(8, 8)).astype(np.uint8)
    return np.kron(blocks, np.ones((hw // 8, hw // 8), np.uint8))


def run_workload(service: TranslationService, img_b64, labels_b64, seeds):
    outs = [None] * len(labels_b64)

    def worker(i):
        outs[i] = service.translate(img_b64, labels_b64[i], seed=seeds[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(labels_b64))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return outs


def main() -> None:
    cfg = load_translation_config("configs/translation.yaml")
    size = cfg.diffusion.model.im_size
    rng = np.random.RandomState(0)
    img = b64_png(rng.randint(0, 255, (size, size, 3), dtype=np.uint8))
    labels = [b64_png(scene(SPARSE_RAW, size, s)) for s in range(4)] + [
        b64_png(scene(DENSE_RAW, size, 100 + s)) for s in range(4)
    ]

    results = {}
    for name, kwargs in (
        ("static19", dict(lcg_present_k=19)),
        ("auto", dict(lcg_present_k="auto", lcg_k_buckets=(6, 14))),
    ):
        svc = TranslationService(
            cfg, batch=8, max_wait_ms=400.0, sampler="dpm", **kwargs
        )
        # warm-up compiles every program variant this workload touches
        base_seeds = list(range(8))
        warm = run_workload(svc, img, labels, base_seeds)
        results.setdefault("outputs", {})[name] = warm
        best = None
        for r in range(ROUNDS):
            seeds = [1000 * (r + 1) + i for i in range(8)]
            t0 = time.perf_counter()
            run_workload(svc, img, labels, seeds)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = {
            "sec_per_8": best,
            "translations_per_min": 8 * 60.0 / best,
            "buckets": dict(svc.bucket_counts) if kwargs.get("lcg_present_k") == "auto" else None,
        }
        print(name, results[name], flush=True)
        svc.close()

    exact = all(
        results["outputs"]["auto"][i] == results["outputs"]["static19"][i]
        for i in range(8)
    )
    del results["outputs"]
    results["bit_exact_auto_vs_static19"] = bool(exact)
    results["workload"] = "8 concurrent requests: 4x 6-class + 4x 14-class scenes"
    results["sampler"] = "dpm-20"
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({
        "speedup_auto_vs_static19": results["auto"]["translations_per_min"]
        / results["static19"]["translations_per_min"],
        "bit_exact": exact,
    }))


if __name__ == "__main__":
    main()
