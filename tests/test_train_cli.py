"""End-to-end trainer CLI test: tiny DEBUG models + synthetic wds data →
few steps on the 8-device CPU mesh → checkpoint written → resume works."""

import io
import json
import tarfile
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from mllm_npu_tpu.train.train import main


def _make_caption_tar(path: Path, n=24):
    with tarfile.open(path, "w") as tar:
        for i in range(n):
            buf = io.BytesIO()
            Image.new("RGB", (500, 500), (i * 10 % 255, 20, 30)).save(
                buf, format="JPEG")
            for ext, data in ((".txt", f"an image number {i}".encode()),
                              (".jpg", buf.getvalue()),
                              (".json", json.dumps({"similarity": .9}).encode())):
                info = tarfile.TarInfo(f"s{i:04d}{ext}")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))


MODEL_YAML = """
mllm:
  mllm_model:
    _target_: mllm_npu_tpu.models.factory.build_mllm
    freeze_vision_encoder: true
    lm_loss_scale: 1.0
    add_patch_pos: true
    vision_encoder:
      _target_: mllm_npu_tpu.models.factory.build_siglip
      hidden_dim: 64
      output_dim: 128
    projector:
      _target_: mllm_npu_tpu.models.factory.build_attention_resampler
      grid_size: 2
      embed_dim: 128
      num_heads: 4
      kv_dim: 64
  language_model:
    _target_: mllm_npu_tpu.models.factory.get_peft_model_with_resize_embedding
    vocab_size: 4096
    peft_config:
      _target_: mllm_npu_tpu.configs.passthrough_dict
      r: 4
      lora_alpha: 8
      target_modules: [q_proj, v_proj]
    model:
      _target_: mllm_npu_tpu.models.factory.build_llama3
  processor:
    _target_: mllm_npu_tpu.data.processor.init_processor
    processor_json: {proc_json}
"""

DATA_YAML = """
_target_: mllm_npu_tpu.data.datapipes.build_multi_datapipes
_recursive_: False
datapipes:
  - _target_: mllm_npu_tpu.data.tasks.image_caption.build_caption_datapipes_with_pixels
    data_dir: {data_dir}
    max_length: 96
    batch_size: 8
    similarity_thr: 0.2
    min_resolution: 100
    num_img_in_tokens: 4
    num_img_out_tokens: 4
    img_first_ratio: 1.0
    cycle_count: 200
    multi_resolution: True
    resolution_grids: ["1x1"]
    base_resolution: 448
    dataset_name: test
    shard_for_host: False
sample_weights: [1.0]
"""


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("DEBUG_FLAG", "True")
    _make_caption_tar(tmp_path / "shard-000.tar")

    proc_json = tmp_path / "proc.json"
    proc_json.write_text(json.dumps({
        "size": {"height": 56, "width": 56},
        "do_normalize": True, "image_mean": [0.5, 0.5, 0.5],
        "image_std": [0.5, 0.5, 0.5]}))
    model_yaml = tmp_path / "model.yaml"
    model_yaml.write_text(MODEL_YAML.format(proc_json=proc_json))
    data_yaml = tmp_path / "data.yaml"
    data_yaml.write_text(DATA_YAML.format(data_dir=tmp_path))
    out_dir = tmp_path / "out"

    argv = [
        "--model", str(model_yaml),
        "--train_dataset", str(data_yaml),
        "--output_dir", str(out_dir),
        "--max_steps", "4", "--save_steps", "2", "--log_steps", "1",
        "--warmup_steps", "0", "--learning_rate", "1e-3",
        "--fake_tokenizer",
    ]
    main(argv)

    ckpts = sorted(out_dir.glob("checkpoint_*"))
    assert ckpts, f"no checkpoints in {list(out_dir.iterdir())}"

    # offline tracker sink: config + per-step metric history incl. lr
    # (reference records a wandb offline tracker next to TB,
    # train/train.py:284-294)
    runs = [json.loads(x) for x in
            (out_dir / "wandb" / "metrics.jsonl").read_text().splitlines()]
    assert len(runs) == 4 and all("loss" in r and "lr" in r for r in runs)
    cfg = json.loads((out_dir / "wandb" / "config.json").read_text())
    assert cfg["learning_rate"] == 1e-3
    assert (out_dir / "tb").exists()

    # resume: runs 2 more steps from step 4
    argv2 = list(argv)
    argv2[argv2.index("--max_steps") + 1] = "6"
    main(argv2)

    # init-from-converted-params (scripts/tools/convert_checkpoint.py →
    # --params_checkpoint): a fresh run whose initial weights come from
    # the orbax dir instead of init-time torch conversion
    from mllm_npu_tpu.utils.convert import convert_model_checkpoint
    conv_dir = tmp_path / "converted"
    convert_model_checkpoint(str(model_yaml), str(conv_dir))
    argv3 = [
        "--model", str(model_yaml),
        "--train_dataset", str(data_yaml),
        "--output_dir", str(tmp_path / "out2"),
        "--params_checkpoint", str(conv_dir),
        "--max_steps", "1", "--save_steps", "1", "--log_steps", "1",
        "--warmup_steps", "0", "--fake_tokenizer",
    ]
    main(argv3)
    assert sorted((tmp_path / "out2").glob("checkpoint_*"))


@pytest.mark.slow
def test_train_cli_pipeline_stage(tmp_path, monkeypatch):
    """--mesh_stage 2: the trainer CLI runs the GPipe pipelined loss
    (decoder stack under shard_map + ppermute) end-to-end with data=4 x
    stage=2 on the 8-device CPU mesh and writes a checkpoint."""
    monkeypatch.setenv("DEBUG_FLAG", "True")
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    _make_caption_tar(tmp_path / "shard-000.tar")
    proc_json = tmp_path / "proc.json"
    proc_json.write_text(json.dumps({
        "size": {"height": 56, "width": 56},
        "do_normalize": True, "image_mean": [0.5, 0.5, 0.5],
        "image_std": [0.5, 0.5, 0.5]}))
    model_yaml = tmp_path / "model.yaml"
    model_yaml.write_text(MODEL_YAML.format(proc_json=proc_json))
    data_yaml = tmp_path / "data.yaml"
    data_yaml.write_text(DATA_YAML.format(data_dir=tmp_path))
    out_dir = tmp_path / "out_pp"

    main([
        "--model", str(model_yaml),
        "--train_dataset", str(data_yaml),
        "--output_dir", str(out_dir),
        "--mesh_stage", "2", "--pipeline_microbatches", "2",
        "--max_steps", "2", "--save_steps", "2", "--log_steps", "1",
        "--warmup_steps", "0", "--learning_rate", "1e-3",
        "--fake_tokenizer",
    ])
    assert sorted(out_dir.glob("checkpoint_*"))


@pytest.mark.slow
def test_train_cli_qlora_int8(tmp_path, monkeypatch):
    """--quantize_base int8: the SFT recipe at QLoRA layout — frozen
    int8 base + float LoRA adapters — trains through the CLI (loss
    decreases; a zeros int base would sit at exactly ln(vocab)) and the
    checkpoint stores the base as int8."""
    monkeypatch.setenv("DEBUG_FLAG", "True")
    _make_caption_tar(tmp_path / "shard-000.tar")
    proc_json = tmp_path / "proc.json"
    proc_json.write_text(json.dumps({
        "size": {"height": 56, "width": 56},
        "do_normalize": True, "image_mean": [0.5, 0.5, 0.5],
        "image_std": [0.5, 0.5, 0.5]}))
    model_yaml = tmp_path / "model.yaml"
    model_yaml.write_text(MODEL_YAML.format(proc_json=proc_json))
    data_yaml = tmp_path / "data.yaml"
    data_yaml.write_text(DATA_YAML.format(data_dir=tmp_path))
    out_dir = tmp_path / "out_q"

    main([
        "--model", str(model_yaml),
        "--train_dataset", str(data_yaml),
        "--output_dir", str(out_dir),
        "--quantize_base", "int8",
        "--max_steps", "4", "--save_steps", "4", "--log_steps", "1",
        "--warmup_steps", "0", "--learning_rate", "1e-3",
        "--fake_tokenizer",
    ])
    runs = [json.loads(x) for x in
            (out_dir / "wandb" / "metrics.jsonl").read_text().splitlines()]
    losses = [r["loss"] for r in runs]
    assert losses[-1] < losses[0] - 0.1, losses
    # vocab 4096: an all-zero quantized base (the Int8Dense placeholder
    # init) would pin the loss at ln(4096) ≈ 8.3178 forever
    assert not any(abs(v - np.log(4096)) < 1e-3 for v in losses[1:]), losses

    # checkpointed base weights are int8 storage
    import orbax.checkpoint as ocp
    ckpt = sorted(out_dir.glob("checkpoint_*"))[-1]
    meta = ocp.StandardCheckpointer().metadata(str(ckpt / "state"))

    def walk(t, pre=""):
        if isinstance(t, dict):
            for k, v in t.items():
                yield from walk(v, pre + "/" + str(k))
        else:
            yield pre, t

    flat = dict(walk(dict(meta.item_metadata)))
    qkeys = [k for k in flat if k.endswith("kernel_q")
             and k.startswith("/params/")]
    assert qkeys and all(str(flat[k].dtype) == "int8" for k in qkeys), \
        sorted(flat)[:10]
