"""HTTP inference server for the translation pipeline.

A production-shaped serving layer the reference never had (its "serving" is
`python translation.py` with hardcoded paths, SURVEY.md §1): models load
once, every endpoint runs pre-compiled jitted programs, and concurrent
requests are micro-batched onto the chip (serving/batcher.py) so singleton
requests never waste a full static-shape program.

Endpoints (JSON over stdlib http.server — zero new dependencies):
  GET  /healthz            -> {"status": "ok"}
  GET  /stats              -> request/batch counters, mean occupancy
  POST /v1/sample          {"steps": int?, "seed": int?} -> {"image": b64 PNG}
  POST /v1/translate       {"image": b64 PNG (any size), "label": b64 PNG
                            (labelIds), "seed": int?} -> {"image": b64 PNG}

Start via the CLI: `python -m weatherconverter_tpu.cli.main serve
--config configs/translation.yaml --port 8700 [checkpoint flags]`.
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from weatherconverter_tpu.serving.batcher import MicroBatcher


def _png_bytes(arr01: np.ndarray) -> bytes:
    from PIL import Image

    img = Image.fromarray((np.clip(arr01, 0.0, 1.0) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _decode_png(b64: str, size: int, nearest: bool = False) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(b64)))
    if not nearest:
        # images must land as (H, W, 3): grayscale/RGBA inputs otherwise
        # break the fixed-shape micro-batch (labels stay in their native
        # mode for exact id decoding)
        img = img.convert("RGB")
    img = img.resize((size, size), Image.NEAREST if nearest else Image.BILINEAR)
    return np.asarray(img)


class TranslationService:
    """Owns the models and the compiled programs; thread-safe via batchers."""

    def __init__(
        self,
        cfg,
        ddpm_checkpoint: Optional[str] = None,
        seg_checkpoint: Optional[str] = None,
        srgan_checkpoint: Optional[str] = None,
        batch: int = 4,
        steps: Optional[int] = None,
        max_wait_ms: float = 25.0,
        sampler: str = "ddpm",
        lcg_present_k=None,
        lcg_k_buckets: tuple = (4, 8, 12),
    ):
        # lcg_present_k: pack LCG's class sweep into K static slots
        # (guidance/sgg.present_class_ids — bit-exact whenever a request's
        # label has <= K classes, truncates to the K largest otherwise).
        #   int  -> ONE static K for every request (one compiled program).
        #   "auto" -> BUCKETED covering-K: each request's class count is
        #        measured host-side and the request routed to the smallest
        #        compiled K bucket (`lcg_k_buckets`, plus num_classes as the
        #        always-covering top bucket) that covers it, so a production
        #        batch mixing 6- and 14-class scenes no longer pays the
        #        max-K program for every image (VERDICT r4 item 3). Always
        #        covering => bit-exact per image vs the full 19-class sweep
        #        (reference's loop, sgg/sgg.py:39). Micro-batches group by
        #        bucket, same pattern as sample's per-steps grouping below.
        #   None -> the unpacked full sweep.
        import jax
        import jax.numpy as jnp

        from weatherconverter_tpu.cli.commands import _load_unet_params, load_seg_variables
        from weatherconverter_tpu.data.labels import encode_target
        from weatherconverter_tpu.diffusion.sampling import ddpm_sample
        from weatherconverter_tpu.diffusion.schedule import make_schedule
        from weatherconverter_tpu.models.factory import make_seg_model
        from weatherconverter_tpu.models.srgan import Generator
        from weatherconverter_tpu.models.unet import Unet

        if sampler in ("ddim", "dpm") and cfg.guidance.mode == "reference":
            # the fast-solver paths have no analog of the reference's
            # xt-overwrite: mode='reference' would silently serve UNGUIDED
            # samples from every /v1/translate request (advisor round 1)
            raise ValueError(
                f"sampler='{sampler}' with guidance.mode='reference' disables "
                "guidance entirely; use mode='fixed' for guided fast serving "
                "or sampler='ddpm' to replicate the reference behavior"
            )
        self._encode_target = encode_target
        self.cfg = cfg
        dcfg = cfg.diffusion
        self.size = dcfg.model.im_size
        self.hr = self.size * cfg.srgan.upscale_factor
        self.batch = batch
        self.steps = steps or cfg.guidance.num_steps
        on_tpu = jax.devices()[0].platform == "tpu"
        key = jax.random.PRNGKey(0)

        unet = Unet(config=dcfg.model, fused=on_tpu)
        uparams = _load_unet_params(unet, ddpm_checkpoint, dcfg, key)
        seg = make_seg_model(
            cfg.seg.model.name, cfg.seg.model.num_classes,
            cfg.seg.model.output_stride, train=False,
        )
        seg_vars = load_seg_variables(
            seg, seg_checkpoint, cfg.seg.model.name, (self.hr, self.hr), key
        )
        gen = Generator(
            in_channels=cfg.srgan.in_channels, num_channels=cfg.srgan.num_channels,
            num_blocks=cfg.srgan.num_blocks, upscale_factor=cfg.srgan.upscale_factor,
        )
        if srgan_checkpoint:
            from weatherconverter_tpu.compat.torch_import import (
                convert_srgan_generator,
                load_torch_checkpoint,
            )

            gp, gs = convert_srgan_generator(
                load_torch_checkpoint(srgan_checkpoint), cfg.srgan.num_blocks
            )
            gvars = {"params": gp, "batch_stats": gs}
        else:
            gvars = jax.jit(gen.init)(key, jnp.zeros((1, self.size, self.size, 3)))
        sched = make_schedule(
            dcfg.diffusion.schedule, dcfg.diffusion.num_timesteps,
            dcfg.diffusion.beta_start, dcfg.diffusion.beta_end,
        )

        # Per-item RNG: each request's seed drives ITS image via vmap over
        # per-item keys, so a request is deterministic regardless of what
        # other traffic lands in the same micro-batch (review round 3: the
        # old code used items[0]'s seed/steps for the whole batch).
        from weatherconverter_tpu.guidance.translate import (
            sample_with_sgg,
            sample_with_sgg_ddim,
            sample_with_sgg_dpm,
        )

        lam = cfg.guidance.lambda_
        num_classes = cfg.seg.model.num_classes
        mode = cfg.guidance.mode
        # DDIM taus stride the translate span, not full T: noising to t=T-1
        # destroys the source image (advisor round 1)
        ddim_span = cfg.guidance.num_steps
        # translate and unconditional-sample defaults are SEPARATE: the ddim
        # fast-translate default must not silently shorten /v1/sample chains
        self.sample_steps = steps or cfg.guidance.num_steps
        translate_steps = self.steps
        if sampler == "ddim" and steps is None:
            # fast-serving default: 50-step DDIM subsequence (~20x lower
            # latency than the full chain at the same per-step cost)
            translate_steps = self.steps = 50
        if sampler == "dpm" and steps is None:
            # 2nd-order solver: 20 steps reach what DDIM needs 2-5x for
            translate_steps = self.steps = 20

        if isinstance(lcg_present_k, str) and lcg_present_k != "auto":
            raise ValueError(
                f"lcg_present_k must be an int, 'auto', or None; got {lcg_present_k!r}"
            )
        if isinstance(lcg_present_k, int) and not (1 <= lcg_present_k <= num_classes):
            # fail at service construction, not inside the first traced batch
            raise ValueError(
                f"lcg_present_k out of range 1..{num_classes}: {lcg_present_k}"
            )
        self._lcg_auto = lcg_present_k == "auto"
        # ascending compiled-K ladder; num_classes tops it so every scene is
        # covered (covered => bit-exact, sgg.present_class_ids docstring)
        self._k_buckets = tuple(sorted(
            {int(b) for b in lcg_k_buckets if 1 <= int(b) < num_classes}
            | {num_classes}
        ))

        def _translate_many(dp, sv, gv, imgs, gts, keys, present_k):
            def one(im, g, k):
                if sampler == "dpm":
                    return sample_with_sgg_dpm(
                        lambda x, t: unet.apply({"params": dp}, x, t),
                        sched,
                        lambda x: seg.apply(sv, x),
                        lambda x: gen.apply(gv, x),
                        im[None], g[None], k,
                        lam=lam, num_steps=translate_steps, span_t=ddim_span,
                        num_classes=num_classes, mode=mode,
                        lcg_present_k=present_k,
                    )[0]
                if sampler == "ddim":
                    return sample_with_sgg_ddim(
                        lambda x, t: unet.apply({"params": dp}, x, t),
                        sched,
                        lambda x: seg.apply(sv, x),
                        lambda x: gen.apply(gv, x),
                        im[None], g[None], k,
                        lam=lam, num_steps=translate_steps, span_t=ddim_span,
                        num_classes=num_classes, mode=mode,
                        lcg_present_k=present_k,
                    )[0]
                return sample_with_sgg(
                    lambda x, t: unet.apply({"params": dp}, x, t),
                    sched,
                    lambda x: seg.apply(sv, x),
                    lambda x: gen.apply(gv, x),
                    im[None], g[None], k,
                    lam=lam, num_steps=translate_steps,
                    num_classes=num_classes, mode=mode,
                    lcg_present_k=present_k,
                )[0]

            return jax.vmap(one)(imgs, gts, keys)

        # jitted ONCE per (present_k, width) pair — present_k is a STATIC
        # argument (it sets the packed slot count, a shape), so the static-K
        # and None modes still compile exactly one program
        self._translate_jit = jax.jit(_translate_many, static_argnums=(6,))
        self._model_args = (uparams, seg_vars, gvars)

        def _n_present(gt: np.ndarray) -> int:
            ids = np.unique(gt)
            return max(1, int(np.sum(ids < num_classes)))

        def _bucket_for(n: int) -> int:
            for b in self._k_buckets:
                if n <= b:
                    return b
            return num_classes

        self.bucket_counts: dict = {}

        def _run_group(members, present_k, width=None):
            # members: list of (orig_idx, (image01, labelids, seed)); one
            # device program at power-of-two width (bounded compile variants,
            # same trick as sample_batch below)
            if width is None:
                width = min(self.batch, 1 << (len(members) - 1).bit_length())
            imgs = np.zeros((width, self.size, self.size, 3), np.float32)
            gts = np.zeros((width, self.hr, self.hr), np.int32)
            seeds = [0] * width
            for i, (_, (im, lb, seed)) in enumerate(members):
                imgs[i] = im * 2.0 - 1.0
                gts[i] = lb
                seeds[i] = int(seed)
            keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
            out = np.asarray(
                self._translate_jit(*self._model_args, jnp.asarray(imgs),
                                    jnp.asarray(gts), keys, present_k)
            )
            return [out[i] for i in range(len(members))]

        def translate_batch(items):
            # items: list of (image01 (H,W,3) np, labelids (HR,HR) np, seed)
            if not self._lcg_auto:
                # fixed mode keeps the full compiled batch width (ONE program)
                return _run_group(list(enumerate(items)), lcg_present_k,
                                  width=self.batch)
            outputs = [None] * len(items)
            groups: dict = {}
            for idx, it in enumerate(items):
                b = _bucket_for(_n_present(it[1]))
                groups.setdefault(b, []).append((idx, it))
            for b, members in groups.items():
                self.bucket_counts[b] = self.bucket_counts.get(b, 0) + len(members)
                for (idx, _), o in zip(members, _run_group(members, b)):
                    outputs[idx] = o
            return outputs

        self._translate_batcher = MicroBatcher(
            translate_batch, max_batch=batch, max_wait_ms=max_wait_ms
        )

        def _sample_many(p, keys, sample_steps):
            def one(k):
                fn = lambda x, t: unet.apply({"params": p}, x, t)
                return ddpm_sample(
                    fn, sched, k, (1, self.size, self.size, 3),
                    num_steps=sample_steps,
                )[0]

            return jax.vmap(one)(keys)

        # jitted ONCE with `steps` static: repeated requests with the same
        # value hit the executable cache instead of re-tracing per batch
        self._sample_jit = jax.jit(_sample_many, static_argnums=2)
        self._uparams = uparams

        def sample_batch(items):
            # items: list of (steps, seed); group by requested steps so every
            # request runs the step count it asked for (one compiled program
            # per distinct steps value, padded to the static batch width)
            n = len(items)
            outputs = [None] * n
            groups: dict = {}
            for idx, (st, seed) in enumerate(items):
                groups.setdefault(int(st), []).append((idx, int(seed)))
            for st, members in groups.items():
                # pad each group to the next power of two (capped at the
                # compiled max): bounded compile variants, and a micro-batch
                # of 4 distinct step counts costs ~4+ chains, not 4 full
                # batch-width batches
                width = min(self.batch, 1 << (len(members) - 1).bit_length())
                seeds = [s for _, s in members] + [0] * (width - len(members))
                keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
                out = np.asarray(self._sample_jit(self._uparams, keys, st))
                out = (out + 1.0) / 2.0
                for (idx, _), o in zip(members, out):
                    outputs[idx] = o
            return outputs

        self._sample_batcher = MicroBatcher(
            sample_batch, max_batch=batch, max_wait_ms=max_wait_ms
        )

    # ---- public request-thread API ----

    def translate(self, image_b64: str, label_b64: str, seed: int = 0) -> bytes:
        img = _decode_png(image_b64, self.size).astype(np.float32)[..., :3] / 255.0
        lbl_ids = _decode_png(label_b64, self.hr, nearest=True)
        if lbl_ids.ndim == 3:
            lbl_ids = lbl_ids[..., 0]
        gt = np.asarray(self._encode_target(lbl_ids.astype(np.uint8)))
        out = self._translate_batcher.submit(img, gt, seed)
        return _png_bytes(out)

    def sample(self, steps: Optional[int] = None, seed: int = 0) -> bytes:
        out = self._sample_batcher.submit(steps or self.sample_steps, seed)
        return _png_bytes(out)

    def stats(self) -> dict:
        def fmt(b: MicroBatcher):
            n = max(b.stats["batches"], 1)
            return {
                "requests": b.stats["requests"],
                "batches": b.stats["batches"],
                "mean_occupancy": b.stats["batch_occupancy_sum"] / n,
            }

        out = {"translate": fmt(self._translate_batcher),
               "sample": fmt(self._sample_batcher)}
        if self._lcg_auto:
            # per-bucket request counts (string keys for JSON)
            out["lcg_k_buckets"] = {str(k): v for k, v in sorted(self.bucket_counts.items())}
        return out

    def close(self) -> None:
        self._translate_batcher.close()
        self._sample_batcher.close()


def make_handler(service: TranslationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                return self._reply(200, {"status": "ok"})
            if self.path == "/stats":
                return self._reply(200, service.stats())
            return self._reply(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/v1/sample":
                    png = service.sample(req.get("steps"), req.get("seed", 0))
                elif self.path == "/v1/translate":
                    png = service.translate(
                        req["image"], req["label"], req.get("seed", 0)
                    )
                else:
                    return self._reply(404, {"error": "not found"})
                return self._reply(
                    200, {"image": base64.b64encode(png).decode()}
                )
            except KeyError as e:
                return self._reply(400, {"error": f"missing field {e}"})
            except Exception as e:  # surface, don't crash the server
                return self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(service: TranslationService, port: int = 8700, block: bool = True):
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service))
    if block:
        httpd.serve_forever()
        return httpd
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd
