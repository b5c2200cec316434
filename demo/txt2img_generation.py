"""Text→image generation demo (reference demo/txt2img_generation.py):
SEED decodes '{caption}<img>' into 64 image tokens, the output projector
maps them to diffusion conditioning, the SDXL adapter denoises.

  DEBUG_FLAG=True python demo/txt2img_generation.py \
      --config mllm_npu_tpu/configs/models/seedx_llama2_13b_qwenvl_vitg.yaml \
      --caption "a brown dog in the snow" --out out.jpg --tiny_sdxl
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_adapter(tiny: bool, lm_hidden: int):
    import jax

    from mllm_npu_tpu.utils.misc import honor_platform_env
    honor_platform_env()
    import jax.numpy as jnp

    from mllm_npu_tpu.models.generation.adapter_modules import SDXLAdapter
    from mllm_npu_tpu.models.generation.resampler import ResamplerXL
    from mllm_npu_tpu.models.generation.schedulers import (
        EulerDiscreteScheduler)
    from mllm_npu_tpu.models.generation.unet import (UNetConfig,
                                                     UNet2DConditionModel)
    from mllm_npu_tpu.models.generation.vae import AutoencoderKL, VAEConfig

    if tiny:
        ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
        rkw = dict(dim=32, depth=1, dim_head=8, heads=4, num_queries=4,
                   embedding_dim=lm_hidden, output1_dim=32, output2_dim=32)
    else:
        ucfg, vcfg = UNetConfig.sdxl_base(), VAEConfig.sdxl()
        rkw = dict(dim=1024, depth=4, dim_head=64, heads=16, num_queries=64,
                   embedding_dim=lm_hidden, output1_dim=768,
                   output2_dim=1280)

    unet = UNet2DConditionModel(ucfg)
    S = ucfg.sample_size
    unet_params = unet.init(
        jax.random.PRNGKey(0), jnp.ones((1, S, S, ucfg.in_channels)),
        jnp.ones((1,)),
        jnp.ones((1, 4, ucfg.cross_attention_dim)),
        {"text_embeds": jnp.ones(
            (1, ucfg.projection_class_embeddings_input_dim
             - 6 * ucfg.addition_time_embed_dim)),
         "time_ids": jnp.ones((1, 6))})
    resampler = ResamplerXL(**rkw)
    r_params = resampler.init(jax.random.PRNGKey(1),
                              jnp.ones((1, 4, lm_hidden)))
    vae = AutoencoderKL(vcfg)
    f = vcfg.spatial_scale_factor
    v_params = vae.init(jax.random.PRNGKey(2),
                        jnp.ones((1, S * f, S * f, 3)))
    adapter = SDXLAdapter(unet_module=unet, unet_params=unet_params,
                          resampler_module=resampler,
                          resampler_params=r_params)
    adapter.init_pipe(vae, v_params, EulerDiscreteScheduler())
    return adapter, ucfg, vcfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="mllm_npu_tpu/configs/models/"
                                "seedx_llama2_13b_qwenvl_vitg.yaml")
    parser.add_argument("--caption", type=str, required=True)
    parser.add_argument("--out", type=str, default="generated.jpg")
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--tiny_sdxl", action="store_true")
    parser.add_argument("--fake_tokenizer", action="store_true")
    parser.add_argument("--params_checkpoint", type=str, default=None,
                        help="orbax dir: a trainer --output_dir or a "
                             "converted params dir (the reference demo "
                             "loads pretrained_model_path)")
    args = parser.parse_args()

    import jax

    from mllm_npu_tpu.utils.misc import honor_platform_env
    honor_platform_env()
    import jax.numpy as jnp
    import numpy as np

    from mllm_npu_tpu.configs import instantiate, load_config
    from mllm_npu_tpu.models.factory import init_assembly_params
    from mllm_npu_tpu.serve.engine import InferenceEngine
    from mllm_npu_tpu.utils.testing import TinySpec, synthetic_batch

    cfg = load_config(args.config)
    llm = instantiate(cfg["mllm"]["language_model"])
    bundle = instantiate(cfg["mllm"]["mllm_model"], language_model=llm)
    if args.fake_tokenizer:
        from mllm_npu_tpu.utils.testing import FakeTokenizer
        tokenizer = FakeTokenizer()
    else:
        tokenizer = instantiate(cfg["mllm"]["tokenizer"])
    processor = instantiate(cfg["mllm"]["processor"])

    vis_cfg = bundle.module.vision_encoder.config
    nq = bundle.module.projector.num_queries
    spec = TinySpec(batch=1, seq=8 + 2 * (nq + 2),
                    image_size=vis_cfg.image_size, nq=nq,
                    vocab=llm.config.vocab_size, max_images=2)
    example = synthetic_batch(spec, cmp_images=1, gen_images=1)
    if args.params_checkpoint:
        from mllm_npu_tpu.utils.convert import restore_any_params
        params = restore_any_params(bundle, example,
                                    args.params_checkpoint)
    else:
        params = init_assembly_params(bundle, example,
                                      jax.random.PRNGKey(0))

    adapter, ucfg, vcfg = build_adapter(args.tiny_sdxl,
                                        llm.config.hidden_size)
    engine = InferenceEngine(
        model=bundle.module, lm_config=llm.config, params=params,
        tokenizer=tokenizer, image_transform=processor, adapter=adapter,
        num_img_in_tokens=nq, num_img_out_tokens=min(nq, 64),
        max_new_tokens=min(nq, 64) + 4)

    out = engine.text_to_image_features(args.caption)
    if not out.get("has_img_output"):
        print("model emitted no image tokens; forcing features from the "
              "decoded windows anyway")
    feats = out.get("img_gen_feat")
    if feats is None:
        raise SystemExit("no image features generated")
    size = ucfg.sample_size * vcfg.spatial_scale_factor
    images = adapter.generate(image_embeds=jnp.asarray(feats),
                              num_inference_steps=args.steps,
                              height=size, width=size) \
        if not args.tiny_sdxl else _tiny_generate(adapter, feats, size,
                                                  args.steps)
    images[0].save(args.out)
    print("saved", args.out)


def _tiny_generate(adapter, feats, size, steps):
    """Tiny mode has no visual encoder for negatives; reuse feats."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mllm_npu_tpu.models.generation.adapter_modules import (
        _to_pil, compute_time_ids)

    pe, pooled = adapter.encode_image_embeds(jnp.asarray(feats))
    B = pe.shape[0]
    f = adapter.vae_module.config.spatial_scale_factor
    latents = jax.random.normal(jax.random.PRNGKey(0),
                                (B, size // f, size // f, 4)) \
        * adapter.scheduler.init_noise_sigma
    time_ids = jnp.asarray(np.repeat(
        compute_time_ids((size, size), (0, 0), size), B, axis=0))
    run = adapter._denoise_fn(steps, size, size)
    imgs = run(adapter.unet_params, adapter.vae_params, latents, pe, pe,
               pooled, pooled, time_ids, jnp.float32(5.0))
    return [_to_pil(np.asarray(i)) for i in imgs]


if __name__ == "__main__":
    main()
