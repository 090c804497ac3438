"""Serving layer: micro-batcher semantics and the HTTP server end-to-end on
tiny models (framework-new capability; SURVEY.md §1 — the reference has no
serving at all)."""

import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest
from PIL import Image

from weatherconverter_tpu.serving.batcher import MicroBatcher


def test_microbatcher_groups_concurrent_requests():
    calls = []

    def batch_fn(items):
        calls.append(len(items))
        return [a * 2 for (a,) in items]

    b = MicroBatcher(batch_fn, max_batch=4, max_wait_ms=100.0)
    try:
        results = [None] * 6
        def worker(i):
            results[i] = b.submit(i)
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == [i * 2 for i in range(6)]
        assert sum(calls) == 6
        assert max(calls) >= 2  # at least one real micro-batch formed
        assert b.stats["requests"] == 6
    finally:
        b.close()


def test_microbatcher_propagates_errors():
    def batch_fn(items):
        raise ValueError("boom")

    b = MicroBatcher(batch_fn, max_batch=2, max_wait_ms=5.0)
    try:
        with pytest.raises(ValueError, match="boom"):
            b.submit(1)
    finally:
        b.close()


TINY_YAML = """
diffusion:
  model:
    im_size: 16
    down_channels: [8, 16, 24]
    mid_channels: [24, 24, 16]
    down_sample: [true, false]
    time_emb_dim: 16
    num_down_layers: 1
    num_mid_layers: 1
    num_up_layers: 1
    num_heads: 2
    attn_resolutions: [8]
  diffusion:
    num_timesteps: 20
seg:
  model: {name: deeplabv3_resnet18, num_classes: 5, output_stride: 16}
srgan: {in_channels: 3, num_channels: 8, num_blocks: 1, upscale_factor: 2}
guidance: {lambda: 10.0, num_steps: 3, mode: fixed}
"""


def _b64_png(arr_u8):
    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_http_server_end_to_end(tmp_path):
    from weatherconverter_tpu.core.config import load_translation_config
    from weatherconverter_tpu.serving.server import TranslationService, serve

    cfg_path = tmp_path / "t.yaml"
    cfg_path.write_text(TINY_YAML)
    cfg = load_translation_config(str(cfg_path))
    service = TranslationService(cfg, batch=2, steps=3, max_wait_ms=10.0)
    httpd = serve(service, port=0, block=False)  # port 0 -> ephemeral
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"

        rng = np.random.RandomState(0)
        img = _b64_png(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8))
        lbl = _b64_png(rng.randint(0, 34, (40, 40), dtype=np.uint8))

        def post(path, payload):
            req = urllib.request.Request(
                base + path, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.load(r)

        out = post("/v1/translate", {"image": img, "label": lbl, "seed": 1})
        png = base64.b64decode(out["image"])
        arr = np.asarray(Image.open(io.BytesIO(png)))
        assert arr.shape == (32, 32, 3)  # 16px latent x 2 SR

        out = post("/v1/sample", {"steps": 3, "seed": 2})
        arr = np.asarray(Image.open(io.BytesIO(base64.b64decode(out["image"]))))
        assert arr.shape == (16, 16, 3)

        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            stats = json.load(r)
        assert stats["translate"]["requests"] == 1
        assert stats["sample"]["requests"] == 1

        # a malformed request gets a 400, not a dead server
        try:
            post("/v1/translate", {"image": img})
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"
    finally:
        httpd.shutdown()
        service.close()


def test_http_server_ddim_sampler_and_seed_determinism(tmp_path):
    """serve --sampler ddim: the fast guided path; plus per-request seed
    determinism — the same seed returns the same image even when co-batched
    with different traffic (per-item PRNG keys, review round 3)."""
    from weatherconverter_tpu.core.config import load_translation_config
    from weatherconverter_tpu.serving.server import TranslationService, serve

    cfg_path = tmp_path / "t.yaml"
    cfg_path.write_text(TINY_YAML)
    cfg = load_translation_config(str(cfg_path))
    service = TranslationService(
        cfg, batch=2, steps=3, max_wait_ms=30.0, sampler="ddim"
    )
    httpd = serve(service, port=0, block=False)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        rng = np.random.RandomState(0)
        img = _b64_png(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8))
        lbl = _b64_png(rng.randint(0, 34, (40, 40), dtype=np.uint8))

        def post(payload):
            req = urllib.request.Request(
                base + "/v1/translate", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.load(r)["image"]

        # same seed twice, co-batched with a different-seed request the
        # second time: the seed-7 result must be identical both times
        first = post({"image": img, "label": lbl, "seed": 7})

        results = {}
        def worker(seed):
            results[seed] = post({"image": img, "label": lbl, "seed": seed})
        threads = [threading.Thread(target=worker, args=(s,)) for s in (7, 13)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results[7] == first, "seed-7 result changed with co-batched traffic"
        assert results[13] != first, "different seeds must differ"
    finally:
        httpd.shutdown()
        service.close()


def test_ddim_default_does_not_shorten_sample_steps(tmp_path):
    """`serve --sampler ddim` defaults TRANSLATE to 50 steps but must leave
    the unconditional /v1/sample default at cfg.guidance.num_steps (review
    round 3: a shared self.steps silently degraded samples)."""
    from weatherconverter_tpu.core.config import load_translation_config
    from weatherconverter_tpu.serving.server import TranslationService

    cfg_path = tmp_path / "t.yaml"
    cfg_path.write_text(TINY_YAML)
    cfg = load_translation_config(str(cfg_path))
    service = TranslationService(cfg, batch=2, max_wait_ms=5.0, sampler="ddim")
    try:
        assert service.steps == 50  # translate fast-path default
        assert service.sample_steps == cfg.guidance.num_steps
    finally:
        service.close()


def test_ddim_with_reference_mode_refused(tmp_path):
    """sampler='ddim' + guidance.mode='reference' would silently serve
    UNGUIDED samples (the DDIM path has no analog of the reference's
    xt-overwrite); the service must refuse at construction (advisor
    round 1)."""
    import pytest

    from weatherconverter_tpu.core.config import load_translation_config
    from weatherconverter_tpu.serving.server import TranslationService

    cfg_path = tmp_path / "t.yaml"
    cfg_path.write_text(TINY_YAML.replace("mode: fixed", "mode: reference"))
    cfg = load_translation_config(str(cfg_path))
    with pytest.raises(ValueError, match="reference"):
        TranslationService(cfg, batch=2, max_wait_ms=5.0, sampler="ddim")
    # the DDPM sampler still accepts reference mode (it replicates the bug)
    service = TranslationService(cfg, batch=2, steps=3, max_wait_ms=5.0)
    service.close()


def test_http_server_dpm_sampler(tmp_path):
    """serve --sampler dpm: the 2nd-order fast guided path end-to-end, with
    reference-mode refusal matching the ddim behavior."""
    from weatherconverter_tpu.core.config import load_translation_config
    from weatherconverter_tpu.serving.server import TranslationService, serve

    cfg_path = tmp_path / "t.yaml"
    cfg_path.write_text(TINY_YAML)
    cfg = load_translation_config(str(cfg_path))
    service = TranslationService(
        cfg, batch=2, steps=3, max_wait_ms=10.0, sampler="dpm"
    )
    httpd = serve(service, port=0, block=False)
    port = httpd.server_address[1]
    try:
        rng = np.random.RandomState(0)
        img = _b64_png(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8))
        lbl = _b64_png(rng.randint(0, 34, (40, 40), dtype=np.uint8))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/translate",
            data=json.dumps({"image": img, "label": lbl, "seed": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.load(r)
        assert "image" in out and len(out["image"]) > 100
    finally:
        httpd.shutdown()
        service.close()

    ref_cfg = load_translation_config(str(cfg_path))
    ref_cfg.guidance.mode = "reference"
    with pytest.raises(ValueError):
        TranslationService(ref_cfg, batch=2, max_wait_ms=5.0, sampler="dpm")


def test_bucketed_auto_k_bit_exact_and_routes_buckets(tmp_path):
    """lcg_present_k='auto' (VERDICT r4 item 3): each request routes to the
    smallest compiled K bucket covering its label's class count, co-batched
    mixed-scene requests split into per-bucket device programs, and every
    output is BIT-IDENTICAL to the unpacked full-sweep service (covering-K
    packing exactness, guidance/sgg.present_class_ids)."""
    from weatherconverter_tpu.core.config import load_translation_config
    from weatherconverter_tpu.serving.server import TranslationService

    cfg_path = tmp_path / "t.yaml"
    cfg_path.write_text(TINY_YAML)
    cfg = load_translation_config(str(cfg_path))

    rng = np.random.RandomState(0)
    img = _b64_png(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8))
    # raw Cityscapes ids -> train ids: 7->0, 8->1, 11->2, 12->3 (labels.py)
    plane2 = np.full((32, 32), 7, np.uint8)
    plane2[16:] = 8                      # 2 distinct train classes
    plane4 = np.full((32, 32), 7, np.uint8)
    plane4[8:16], plane4[16:24], plane4[24:] = 8, 11, 12  # 4 classes
    lbl2, lbl4 = _b64_png(plane2), _b64_png(plane4)

    auto = TranslationService(
        cfg, batch=2, steps=3, max_wait_ms=200.0,
        lcg_present_k="auto", lcg_k_buckets=(2,),
    )
    full = TranslationService(cfg, batch=2, steps=3, max_wait_ms=5.0)
    try:
        # submit concurrently so both land in ONE micro-batch, which must
        # split into two per-bucket programs (k=2 and k=num_classes=5)
        results = {}

        def worker(name, lbl, seed):
            results[name] = auto.translate(img, lbl, seed=seed)

        threads = [
            threading.Thread(target=worker, args=("two", lbl2, 7)),
            threading.Thread(target=worker, args=("four", lbl4, 9)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert auto.bucket_counts == {2: 1, 5: 1}, auto.bucket_counts
        assert auto.stats()["lcg_k_buckets"] == {"2": 1, "5": 1}

        assert results["two"] == full.translate(img, lbl2, seed=7)
        assert results["four"] == full.translate(img, lbl4, seed=9)
    finally:
        auto.close()
        full.close()

    # bad constructor values refuse loudly
    with pytest.raises(ValueError, match="lcg_present_k"):
        TranslationService(cfg, batch=2, lcg_present_k=0)
    with pytest.raises(ValueError, match="lcg_present_k"):
        TranslationService(cfg, batch=2, lcg_present_k="always")
