"""SGG guidance tests: gradient-probe correctness, GSG/LCG formula parity
(reference sgg/sgg.py), and the jitted guided-translation scan end-to-end on
tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from weatherconverter_tpu.diffusion.schedule import linear_schedule
from weatherconverter_tpu.guidance.sgg import (
    IMAGENET_STD,
    apply_gsg,
    apply_lcg,
    gradient_magnitude,
    guidance_field,
    seg_input_gradients,
)
from weatherconverter_tpu.guidance.translate import sample_with_sgg

H = 16  # "512px" stand-in
h = 4  # latent resolution (pool 4x)
B = 1
C = 4  # classes


def linear_seg_fn(x):
    """A fixed linear 'seg model': logits = conv-free projection of x, so the
    CE input-gradient has a closed form checkable by finite differences."""
    w = jnp.stack([jnp.full((3,), 0.1 * (i + 1)) for i in range(C)], axis=1)
    return jnp.einsum("bhwc,cd->bhwd", x, w)


def test_seg_input_gradients_finite_difference():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, H, 3))
    gt = jax.random.randint(jax.random.PRNGKey(1), (B, H, H), 0, C)
    g = seg_input_gradients(linear_seg_fn, x, gt)
    assert g.shape == x.shape

    from weatherconverter_tpu.guidance.sgg import seg_ce

    eps = 1e-3
    dx = jnp.zeros_like(x).at[0, 3, 3, 1].set(eps)
    fd = (seg_ce(linear_seg_fn, x + dx, gt) - seg_ce(linear_seg_fn, x - dx, gt)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 3, 3, 1]), float(fd), rtol=1e-2, atol=1e-5)


def test_gradient_magnitude_denormalize():
    g = jnp.ones((B, 4, 4, 3))
    mag = gradient_magnitude(g, denormalize=True)
    want = np.sqrt(np.sum(np.asarray(IMAGENET_STD) ** 2))
    np.testing.assert_allclose(np.asarray(mag), want, rtol=1e-6)
    assert mag.shape == (B, 4, 4, 1)


def test_apply_gsg_formula():
    """mu_hat = mu + lam*sigma*mag; reference mode adds +sigma (sgg.py:22-23)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (B, H, H, 3))
    gt = jax.random.randint(jax.random.PRNGKey(3), (B, H, H), 0, C)
    mu = jnp.zeros((B, h, h, 3))
    sigma = jnp.full((B, 1, 1, 1), 0.5)
    out_ref = apply_gsg(linear_seg_fn, mu, sigma, x, gt, lam=2.0, mode="reference")
    mag = guidance_field(linear_seg_fn, x, gt, pool=4)
    want = mu + 2.0 * sigma * mag + sigma
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(want), rtol=1e-5)

    z = jnp.ones_like(mu) * 0.3
    out_fix = apply_gsg(linear_seg_fn, mu, sigma, x, gt, lam=2.0, noise=z, mode="fixed")
    want_fix = mu + 2.0 * sigma * mag + sigma * z
    np.testing.assert_allclose(np.asarray(out_fix), np.asarray(want_fix), rtol=1e-5)


def test_apply_lcg_recombines_by_class_mask():
    x = jax.random.normal(jax.random.PRNGKey(4), (B, H, H, 3))
    # block-structured gt so each latent pixel has a unique class
    gt = jnp.repeat(jnp.repeat(
        jax.random.randint(jax.random.PRNGKey(5), (B, h, h), 0, C), 4, axis=1), 4, axis=2)
    mu = jnp.zeros((B, h, h, 3))
    sigma = jnp.full((B, 1, 1, 1), 0.5)
    out = apply_lcg(linear_seg_fn, mu, sigma, x, gt, lam=1.0, num_classes=C, mode="reference")
    assert out.shape == (B, h, h, 3)
    assert np.all(np.isfinite(np.asarray(out)))

    # every latent pixel is covered by exactly one class -> the recombined
    # value equals that class's x_t^c there; with lam=0 all x_t^c collapse
    # to mu + sigma, so out == mu + sigma everywhere.
    out0 = apply_lcg(linear_seg_fn, mu, sigma, x, gt, lam=0.0, num_classes=C, mode="reference")
    np.testing.assert_allclose(np.asarray(out0), np.asarray(mu + sigma), rtol=1e-5, atol=1e-6)


def test_lcg_uncovered_pixels_fall_back_in_fixed_mode():
    x = jax.random.normal(jax.random.PRNGKey(6), (B, H, H, 3))
    gt = jnp.full((B, H, H), 255, dtype=jnp.int32)  # nothing covered
    mu = jnp.ones((B, h, h, 3))
    sigma = jnp.full((B, 1, 1, 1), 0.5)
    z = jnp.ones_like(mu)
    out = apply_lcg(linear_seg_fn, mu, sigma, x, gt, lam=1.0, num_classes=C, noise=z, mode="fixed")
    np.testing.assert_allclose(np.asarray(out), np.asarray(mu + sigma * z), rtol=1e-5)


def test_sample_with_sgg_end_to_end_jits():
    sched = linear_schedule(6)
    diff_fn = lambda xt, t: jnp.zeros_like(xt)
    sr_fn = lambda x: jnp.clip(jnp.repeat(jnp.repeat(x, 4, 1), 4, 2) * 0.5 + 0.5, 0, 1)
    seg_fn = linear_seg_fn
    x0 = jnp.zeros((B, h, h, 3))
    gt = jax.random.randint(jax.random.PRNGKey(7), (B, H, H), 0, C)

    out = jax.jit(
        lambda inp, g, k: sample_with_sgg(
            diff_fn, sched, seg_fn, sr_fn, inp, g, k,
            lam=1.0, num_steps=6, num_classes=C, mode="fixed", start_t=3,
        )
    )(x0, gt, jax.random.PRNGKey(8))
    assert out.shape == (B, H, H, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_guidance_every_and_space_collapse_to_unguided_at_lam0():
    """The throughput levers must not perturb the unguided chain: at lam=0
    every (guidance_every, guidance_space) combination consumes the same
    keys and produces the same trajectory."""
    sched = linear_schedule(6)
    diff_fn = lambda xt, t: 0.1 * xt
    sr_fn = lambda x: jnp.clip(jnp.repeat(jnp.repeat(x, 4, 1), 4, 2) * 0.5 + 0.5, 0, 1)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, h, h, 3))
    gt = jax.random.randint(jax.random.PRNGKey(7), (B, H, H), 0, C)

    def run(every, space):
        return sample_with_sgg(
            diff_fn, sched, linear_seg_fn, sr_fn, x0, gt,
            jax.random.PRNGKey(8), lam=0.0, num_steps=6, num_classes=C,
            mode="fixed", start_t=3, guidance_style="gsg",
            guidance_every=every, guidance_space=space,
        )

    base = np.asarray(run(1, "sr"))
    for every, space in ((2, "sr"), (1, "latent"), (3, "latent")):
        np.testing.assert_allclose(
            np.asarray(run(every, space)), base, atol=1e-6,
            err_msg=f"lam=0 chain changed under every={every} space={space}",
        )


def test_guidance_every_guides_only_multiples():
    """guidance_every=k fires the guidance term only on steps i % k == 0
    (i != 0): with a constant unit guidance field the accumulated shift
    counts exactly the fired steps."""
    sched = linear_schedule(8)
    diff_fn = lambda xt, t: jnp.zeros_like(xt)
    sr_fn = lambda x: jnp.repeat(jnp.repeat(x, 4, 1), 4, 2)
    x0 = jnp.zeros((B, h, h, 3))
    gt = jax.random.randint(jax.random.PRNGKey(7), (B, H, H), 0, C)

    outs = {}
    for every in (1, 2, 4):
        outs[every] = np.asarray(sample_with_sgg(
            diff_fn, sched, linear_seg_fn, sr_fn, x0, gt,
            jax.random.PRNGKey(8), lam=5.0, num_steps=8, num_classes=C,
            mode="fixed", start_t=7, guidance_style="gsg",
            guidance_every=every,
        ))
    # more skipped guidance -> strictly different trajectory, and the
    # every=2 output sits between every=1 and every=4 in guidance energy
    d12 = np.abs(outs[1] - outs[2]).max()
    d14 = np.abs(outs[1] - outs[4]).max()
    assert d12 > 1e-6 and d14 > 1e-6
    assert d14 > d12, (d12, d14)


def test_guidance_space_latent_end_to_end():
    """'latent' guidance runs the whole jitted chain without calling sr_fn
    per step (only the final upscale) and stays finite; the field is
    dose-matched by 1/pool^2 (the per-image CE is a mean over pool^2 fewer
    pixels at latent resolution)."""
    sched = linear_schedule(6)
    diff_fn = lambda xt, t: jnp.zeros_like(xt)
    calls = []

    def counting_sr(x):
        calls.append(1)  # traced once per call SITE, not per step
        return jnp.clip(jnp.repeat(jnp.repeat(x, 4, 1), 4, 2) * 0.5 + 0.5, 0, 1)

    x0 = jnp.zeros((B, h, h, 3))
    gt = jax.random.randint(jax.random.PRNGKey(7), (B, H, H), 0, C)
    out = jax.jit(
        lambda inp, g, k: sample_with_sgg(
            diff_fn, sched, linear_seg_fn, counting_sr, inp, g, k,
            lam=4.0, num_steps=6, num_classes=C, mode="fixed", start_t=3,
            guidance_style="gsg", guidance_space="latent",
        )
    )(x0, gt, jax.random.PRNGKey(8))
    assert out.shape == (B, H, H, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # latent mode: sr_fn traced ONLY for the final upscale, never in the body
    assert sum(calls) == 1, calls

    # and the guidance actually does something at lam>0
    out0 = jax.jit(
        lambda inp, g, k: sample_with_sgg(
            diff_fn, sched, linear_seg_fn, counting_sr, inp, g, k,
            lam=0.0, num_steps=6, num_classes=C, mode="fixed", start_t=3,
            guidance_style="gsg", guidance_space="latent",
        )
    )(x0, gt, jax.random.PRNGKey(8))
    assert np.abs(np.asarray(out) - np.asarray(out0)).max() > 1e-6


def test_guidance_space_latent_lcg_alternate():
    """The alternate (even->LCG) schedule also runs in latent space: class
    masks and CE labels are nearest-downsampled train-ids."""
    sched = linear_schedule(6)
    diff_fn = lambda xt, t: jnp.zeros_like(xt)
    sr_fn = lambda x: jnp.repeat(jnp.repeat(x, 4, 1), 4, 2)
    x0 = jnp.zeros((B, h, h, 3))
    gt = jax.random.randint(jax.random.PRNGKey(7), (B, H, H), 0, C)
    out = jax.jit(
        lambda inp, g, k: sample_with_sgg(
            diff_fn, sched, linear_seg_fn, sr_fn, inp, g, k,
            lam=4.0, num_steps=6, num_classes=C, mode="fixed", start_t=3,
            guidance_style="alternate", guidance_space="latent",
        )
    )(x0, gt, jax.random.PRNGKey(8))
    assert out.shape == (B, H, H, 3)
    assert np.all(np.isfinite(np.asarray(out)))


import pytest


@pytest.mark.parametrize("style", ["alternate", "gsg"])
def test_sample_with_sgg_segmented_chain_bit_identical(style):
    """Segmenting the reverse chain into multiple jitted calls (xt_init /
    t_offset / final_sr — how bench.py measures the full-length alternate
    schedule AND the sr>2 gsg headline under the backend's ~60 s
    single-execution bound) reproduces the single-call output BIT-FOR-BIT: a
    continuation consumes the carried key exactly as the uninterrupted scan
    would."""
    sched = linear_schedule(6)
    diff_fn = lambda xt, t: jnp.zeros_like(xt)
    sr_fn = lambda x: jnp.clip(jnp.repeat(jnp.repeat(x, 4, 1), 4, 2) * 0.5 + 0.5, 0, 1)
    seg_fn = linear_seg_fn
    x0 = jnp.linspace(-1, 1, B * h * h * 3).reshape(B, h, h, 3).astype(jnp.float32)
    gt = jax.random.randint(jax.random.PRNGKey(7), (B, H, H), 0, C)
    key = jax.random.PRNGKey(8)
    kw = dict(lam=1.0, num_classes=C, mode="fixed", guidance_style=style)

    single = sample_with_sgg(
        diff_fn, sched, seg_fn, sr_fn, x0, gt, key,
        num_steps=6, start_t=5, **kw,
    )

    xt, kc = sample_with_sgg(  # steps 5..3
        diff_fn, sched, seg_fn, sr_fn, x0, gt, key,
        num_steps=3, start_t=5, t_offset=3, final_sr=False, **kw,
    )
    x_fin, _ = sample_with_sgg(  # steps 2..0, continuation
        diff_fn, sched, seg_fn, sr_fn, xt, gt, kc,
        num_steps=3, xt_init=xt, t_offset=0, final_sr=False, **kw,
    )
    chained = sr_fn(x_fin)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(chained))


def test_sample_with_sgg_reference_mode_matches_unguided_chain():
    """In reference mode translation.py:90 overwrites the guided xt, so the
    trajectory is exactly the unguided mu+sigma chain."""
    sched = linear_schedule(6)
    diff_fn = lambda xt, t: 0.1 * xt
    sr_fn = lambda x: jnp.repeat(jnp.repeat(x, 4, 1), 4, 2)
    gt = jnp.zeros((B, H, H), dtype=jnp.int32)
    x0 = jnp.ones((B, h, h, 3)) * 0.2
    key = jax.random.PRNGKey(9)

    out = sample_with_sgg(
        diff_fn, sched, linear_seg_fn, sr_fn, x0, gt, key,
        lam=5.0, num_steps=6, num_classes=C, mode="reference", start_t=4,
    )
    out_nolam = sample_with_sgg(
        diff_fn, sched, linear_seg_fn, sr_fn, x0, gt, key,
        lam=0.0, num_steps=6, num_classes=C, mode="reference", start_t=4,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_nolam), rtol=1e-5)


def test_guidance_gradients_batch_invariant():
    """Per-image CE normalization (seg_ce_per_image): each image's input
    gradient equals its own single-image computation at any batch size —
    batch-mean CE would divide gradients by B (review round 3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weatherconverter_tpu.guidance.sgg import seg_input_gradients
    from weatherconverter_tpu.models.factory import make_seg_model

    seg = make_seg_model("deeplabv3_resnet18", num_classes=5, train=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 32, 3))
    v = seg.init(jax.random.PRNGKey(1), x)
    gt = jax.random.randint(jax.random.PRNGKey(2), (3, 32, 32), 0, 5)
    fn = lambda im: seg.apply(v, im)

    g_batch = seg_input_gradients(fn, x, gt)
    for i in range(3):
        g_one = seg_input_gradients(fn, x[i : i + 1], gt[i : i + 1])
        np.testing.assert_allclose(
            np.asarray(g_batch[i]), np.asarray(g_one[0]), atol=1e-6, rtol=1e-5
        )


def test_lcg_chunk_width_invariant():
    """apply_lcg must give identical results for any class_chunk — the
    microbatching is an execution detail, not a semantics knob (a batch-mean
    CE made chunk=4 guidance exactly 4x weaker; review round 3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weatherconverter_tpu.guidance.sgg import apply_lcg
    from weatherconverter_tpu.models.factory import make_seg_model

    C = 5
    seg = make_seg_model("deeplabv3_resnet18", num_classes=C, train=False)
    hr = 32
    x = jax.random.normal(jax.random.PRNGKey(0), (2, hr, hr, 3))
    v = seg.init(jax.random.PRNGKey(1), x)
    gt = jax.random.randint(jax.random.PRNGKey(2), (2, hr, hr), 0, C)
    mu = jax.random.normal(jax.random.PRNGKey(3), (2, hr // 2, hr // 2, 3)) * 0.1
    sig = jnp.full((1, 1, 1, 1), 0.5)
    z = jax.random.normal(jax.random.PRNGKey(4), mu.shape)
    fn = lambda im: seg.apply(v, im)

    outs = [
        apply_lcg(fn, mu, sig, x, gt, 60.0, num_classes=C, noise=z,
                  mode="fixed", class_chunk=ck)
        for ck in (1, 2, C)
    ]
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[2]), atol=1e-5, rtol=1e-5)


def test_ddim_guided_translate_fast_path():
    """sample_with_sgg_ddim: few-step guided translation (framework
    extension — the reference can only run its full-length DDPM chain).
    Checks output range/shape, that guidance has an effect, and that both
    guidance schedules run."""
    import jax
    import jax.numpy as jnp

    from weatherconverter_tpu.core.config import UnetModelConfig
    from weatherconverter_tpu.diffusion.schedule import linear_schedule
    from weatherconverter_tpu.guidance.translate import sample_with_sgg_ddim
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.models.srgan import Generator
    from weatherconverter_tpu.models.unet import Unet

    H, SR, C = 16, 2, 5
    HR = H * SR
    ucfg = UnetModelConfig(
        im_size=H, down_channels=[8, 16, 24], mid_channels=[24, 24, 16],
        down_sample=[True, False], time_emb_dim=16, num_down_layers=1,
        num_mid_layers=1, num_up_layers=1, num_heads=2, attn_resolutions=[8],
    )
    unet = Unet(config=ucfg, fused=False)
    sched = linear_schedule(40)
    up = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, H, H, 3)),
                   jnp.zeros((1,), jnp.int32))["params"]
    seg = make_seg_model("deeplabv3_resnet18", num_classes=C, train=False)
    sv = seg.init(jax.random.PRNGKey(1), jnp.zeros((1, HR, HR, 3)))
    gen = Generator(num_channels=8, num_blocks=1, upscale_factor=SR)
    gv = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, H, H, 3)))
    gt = jax.random.randint(jax.random.PRNGKey(3), (2, HR, HR), 0, C)
    inp = jax.random.normal(jax.random.PRNGKey(4), (2, H, H, 3)) * 0.2

    def run(lam, style, eta=0.0):
        fn = jax.jit(lambda: sample_with_sgg_ddim(
            lambda x, t: unet.apply({"params": up}, x, t), sched,
            lambda x: seg.apply(sv, x), lambda x: gen.apply(gv, x),
            inp, gt, jax.random.PRNGKey(5), lam=lam, num_steps=5,
            eta=eta, num_classes=C, guidance_style=style,
        ))
        return fn()

    out = run(10.0, "gsg")
    assert out.shape == (2, HR, HR, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0

    out0 = run(0.0, "gsg")
    assert float(jnp.max(jnp.abs(out - out0))) > 1e-6, "guidance had no effect"

    out_alt = run(10.0, "alternate", eta=1.0)
    assert bool(jnp.all(jnp.isfinite(out_alt)))


def test_ddim_default_span_preserves_source_content():
    """sample_with_sgg_ddim must default its diffusion span to the translate
    span (min(500, T)), NOT the schedule's full T: q-sampling to t=T-1
    (alpha_bar ~ 4e-5) destroys the source image and turns 'translation'
    into label-guided generation (advisor round 1). With an eps=0 denoiser
    the chain's output is a deterministic function of the initial q-sample,
    so output/input correlation directly measures how much source survives."""
    from weatherconverter_tpu.diffusion.schedule import linear_schedule
    from weatherconverter_tpu.guidance.translate import sample_with_sgg_ddim

    sched = linear_schedule(1000)
    Hs, Bs = 24, 2
    # high-contrast structured source: ±1 blocks
    blocks = jnp.sign(jax.random.normal(jax.random.PRNGKey(0), (Bs, 6, 6, 3)))
    inp = jnp.repeat(jnp.repeat(blocks, 4, axis=1), 4, axis=2)
    gt = jnp.zeros((Bs, Hs, Hs), dtype=jnp.int32)
    diff_fn = lambda xt, t: jnp.zeros_like(xt)
    sr_fn = lambda x: jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)  # same-res "SR"

    def corr(span_t):
        out = sample_with_sgg_ddim(
            diff_fn, sched, linear_seg_fn, sr_fn, inp, gt,
            jax.random.PRNGKey(1), lam=0.0, num_steps=6,
            span_t=span_t, num_classes=C, guidance_style="none",
        )
        a = np.asarray(out).ravel() - np.asarray(out).mean()
        b = np.asarray(inp).ravel() - np.asarray(inp).mean()
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    c_default = corr(None)  # must behave like the translate span
    c_full = corr(sched.T)  # explicit full-T opt-in: generation
    assert c_default > 0.1, f"default span destroyed the source (corr={c_default:.3f})"
    assert c_default > c_full + 0.05, (c_default, c_full)


def test_dpm_guided_translate_fast_path():
    """sample_with_sgg_dpm: second-order few-step guided translation
    (DPM-Solver++(2M), arXiv:2211.01095 — framework extension). Output
    range/shape, guidance effect, both schedules, and source-content
    preservation via the default translate span."""
    import jax
    import jax.numpy as jnp

    from weatherconverter_tpu.core.config import UnetModelConfig
    from weatherconverter_tpu.diffusion.schedule import linear_schedule
    from weatherconverter_tpu.guidance.translate import sample_with_sgg_dpm
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.models.srgan import Generator
    from weatherconverter_tpu.models.unet import Unet

    H, SR, C = 16, 2, 5
    HR = H * SR
    ucfg = UnetModelConfig(
        im_size=H, down_channels=[8, 16, 24], mid_channels=[24, 24, 16],
        down_sample=[True, False], time_emb_dim=16, num_down_layers=1,
        num_mid_layers=1, num_up_layers=1, num_heads=2, attn_resolutions=[8],
    )
    unet = Unet(config=ucfg, fused=False)
    sched = linear_schedule(40)
    up = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, H, H, 3)),
                   jnp.zeros((1,), jnp.int32))["params"]
    seg = make_seg_model("deeplabv3_resnet18", num_classes=C, train=False)
    sv = seg.init(jax.random.PRNGKey(1), jnp.zeros((1, HR, HR, 3)))
    gen = Generator(num_channels=8, num_blocks=1, upscale_factor=SR)
    gv = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, H, H, 3)))
    gt = jax.random.randint(jax.random.PRNGKey(3), (2, HR, HR), 0, C)
    inp = jax.random.normal(jax.random.PRNGKey(4), (2, H, H, 3)) * 0.2

    def run(lam, style, span_t=None):
        fn = jax.jit(lambda: sample_with_sgg_dpm(
            lambda x, t: unet.apply({"params": up}, x, t), sched,
            lambda x: seg.apply(sv, x), lambda x: gen.apply(gv, x),
            inp, gt, jax.random.PRNGKey(5), lam=lam, num_steps=5,
            span_t=span_t, num_classes=C, guidance_style=style,
        ))
        return fn()

    out = run(10.0, "gsg")
    assert out.shape == (2, HR, HR, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0

    out0 = run(0.0, "gsg")
    assert float(jnp.max(jnp.abs(out - out0))) > 1e-6, "guidance had no effect"

    out_alt = run(10.0, "alternate")
    assert bool(jnp.all(jnp.isfinite(out_alt)))

    # default span (min(500, T)) keeps the q-sample at the top of the
    # TRANSLATE span; an eps=0 denoiser + identity-style SR (a random-weight
    # SRGAN would scramble any correlation) makes the output a deterministic
    # function of the q-sampled input, so correlation with the input
    # measures source survival (the advisor-round-1 property)
    from weatherconverter_tpu.guidance.translate import sample_with_sgg_dpm as f

    sched1k = linear_schedule(1000)
    blocks = jnp.sign(jax.random.normal(jax.random.PRNGKey(10), (2, 6, 6, 3)))
    src = jnp.repeat(jnp.repeat(blocks, 4, axis=1), 4, axis=2)
    gt24 = jnp.zeros((2, 24, 24), dtype=jnp.int32)
    zero_eps = lambda x, t: jnp.zeros_like(x)
    id_sr = lambda x: jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)
    small_span = f(
        zero_eps, sched1k, linear_seg_fn, id_sr,
        src, gt24, jax.random.PRNGKey(6), lam=0.0, num_steps=5,
        span_t=None, num_classes=C, guidance_style="none",
    )
    a = np.asarray(small_span).ravel() - float(np.asarray(small_span).mean())
    b = np.asarray(src).ravel() - float(np.asarray(src).mean())
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert corr > 0.1, corr


# ---------------------------------------------------------------------------
# present-class packing (LCG throughput lever; guidance/sgg.present_class_ids)
# ---------------------------------------------------------------------------


def test_present_class_ids_topk_sorted_and_padded():
    from weatherconverter_tpu.guidance.sgg import present_class_ids

    gt = jnp.asarray(
        [
            # image 0: class 7 dominant, then 2, then 11; 255 must be ignored
            [[7, 7, 7, 7], [7, 7, 2, 2], [2, 11, 255, 255], [255, 255, 255, 255]],
            # image 1: only class 0
            [[0, 0, 0, 0]] * 4,
        ],
        dtype=jnp.int32,
    )
    ids = present_class_ids(gt, k=4, num_classes=19)
    np.testing.assert_array_equal(np.asarray(ids[0]), [2, 7, 11, -1])
    np.testing.assert_array_equal(np.asarray(ids[1]), [0, -1, -1, -1])
    # truncation keeps the largest-by-area classes (image 0: 7 then 2)
    ids2 = present_class_ids(gt, k=2, num_classes=19)
    np.testing.assert_array_equal(np.asarray(ids2[0]), [2, 7])
    np.testing.assert_array_equal(np.asarray(ids2[1]), [0, -1])


@pytest.mark.parametrize("mode", ["fixed", "reference"])
def test_apply_lcg_present_class_packing_exact(mode):
    """With K slots covering every present class, packed LCG is BIT-exact vs
    the full class sweep: absent classes contribute exact +-0.0 to the
    recombine (reference sgg.py:58) and ids are sorted ascending so the sum
    order matches."""
    from weatherconverter_tpu.guidance.sgg import present_class_ids

    b = 2
    x = jax.random.normal(jax.random.PRNGKey(4), (b, H, H, 3))
    # two images with different small class sets (2 and 3 present classes)
    gt0 = jnp.repeat(jnp.repeat(
        jnp.asarray([[0, 3], [3, 0]], dtype=jnp.int32), H // 2, 0), H // 2, 1)
    gt1 = jnp.repeat(jnp.repeat(
        jnp.asarray([[1, 2], [2, 1]], dtype=jnp.int32), H // 2, 0), H // 2, 1)
    gt = jnp.stack([gt0, gt1]).at[1, 0, 0].set(255)  # some ignore pixels
    mu = jnp.zeros((b, h, h, 3))
    sigma = jnp.full((b, 1, 1, 1), 0.5)
    z = jax.random.normal(jax.random.PRNGKey(5), mu.shape)

    kw = dict(lam=2.0, num_classes=C, noise=z, mode=mode)
    full = apply_lcg(linear_seg_fn, mu, sigma, x, gt, **kw)
    ids = present_class_ids(gt, k=3, num_classes=C)
    packed = apply_lcg(linear_seg_fn, mu, sigma, x, gt, class_ids=ids, **kw)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(packed))
    # chunk width over slots is still a pure perf knob
    packed1 = apply_lcg(
        linear_seg_fn, mu, sigma, x, gt, class_ids=ids, class_chunk=1, **kw
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(packed1), rtol=1e-6, atol=1e-7
    )


def test_apply_lcg_present_k_truncation_falls_back_to_base():
    """K smaller than the number of present classes drops the smallest
    classes: their pixels are uncovered and take the unguided base update in
    'fixed' mode (the quality consequence is what the parity gate
    adjudicates)."""
    from weatherconverter_tpu.guidance.sgg import present_class_ids

    # class 0 covers 3/4 of the image, class 1 the rest
    gt = jnp.where(
        jnp.arange(H)[None, :, None] < H // 2, 0,
        jnp.where(jnp.arange(H)[None, None, :] < H // 2, 0, 1),
    ).astype(jnp.int32) * jnp.ones((B, 1, 1), dtype=jnp.int32)
    x = jax.random.normal(jax.random.PRNGKey(6), (B, H, H, 3))
    mu = jnp.zeros((B, h, h, 3))
    sigma = jnp.full((B, 1, 1, 1), 0.5)
    z = jnp.ones_like(mu) * 0.3

    ids = present_class_ids(gt, k=1, num_classes=C)
    np.testing.assert_array_equal(np.asarray(ids), [[0]])
    out = apply_lcg(
        linear_seg_fn, mu, sigma, x, gt, lam=2.0, num_classes=C,
        noise=z, mode="fixed", class_ids=ids,
    )
    # the class-1 quadrant (bottom-right at latent res) is uncovered -> base
    base = mu + sigma * z
    np.testing.assert_allclose(
        np.asarray(out[:, h // 2 :, h // 2 :]),
        np.asarray(base[:, h // 2 :, h // 2 :]),
        rtol=1e-6,
    )
    # the class-0 region is guided (differs from base)
    assert not np.allclose(np.asarray(out[:, : h // 2]), np.asarray(base[:, : h // 2]))


def test_sample_with_sgg_present_k_bit_identical_end_to_end():
    """lcg_present_k with enough slots reproduces the full-sweep chain
    bit-for-bit through the whole jitted scan (the packed alternate bench
    row's exactness claim)."""
    sched = linear_schedule(6)
    diff_fn = lambda xt, t: jnp.zeros_like(xt)
    sr_fn = lambda x: jnp.clip(jnp.repeat(jnp.repeat(x, 4, 1), 4, 2) * 0.5 + 0.5, 0, 1)
    x0 = jnp.linspace(-1, 1, B * h * h * 3).reshape(B, h, h, 3).astype(jnp.float32)
    gt = jnp.repeat(jnp.repeat(
        jax.random.randint(jax.random.PRNGKey(7), (B, h, h), 0, 3), 4, 1), 4, 2)
    key = jax.random.PRNGKey(8)
    kw = dict(lam=1.0, num_steps=6, num_classes=C, mode="fixed",
              guidance_style="alternate", start_t=5)

    full = sample_with_sgg(diff_fn, sched, linear_seg_fn, sr_fn, x0, gt, key, **kw)
    packed = sample_with_sgg(
        diff_fn, sched, linear_seg_fn, sr_fn, x0, gt, key,
        lcg_present_k=3, **kw,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(packed))
