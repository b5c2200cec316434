"""Serving tests: controller registry/dispatch/expiry; worker generate
roundtrip with a tiny engine; controller→worker streaming proxy."""

import asyncio
import base64
import io
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer
from PIL import Image

from mllm_npu_tpu.serve import controller as controller_mod
from mllm_npu_tpu.serve import worker as worker_mod
from mllm_npu_tpu.serve.controller import Controller
from mllm_npu_tpu.serve.engine import InferenceEngine
from mllm_npu_tpu.serve.worker import ModelWorker
from mllm_npu_tpu.utils.testing import (FakeTokenizer, TinySpec,
                                        build_tiny_mllm, synthetic_batch)


def _tiny_engine():
    spec = TinySpec(batch=1, seq=64, image_size=56, nq=4)
    model, lm_cfg, vis_cfg = build_tiny_mllm(spec)
    batch = synthetic_batch(spec, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    tok = FakeTokenizer()

    from mllm_npu_tpu.data.processor import ImageProcessor
    proc = ImageProcessor(height=56, width=56)
    return InferenceEngine(
        model=model, lm_config=lm_cfg, params=params, tokenizer=tok,
        image_transform=proc, resolution_grids=("1x1",),
        base_resolution=448, num_img_in_tokens=4, num_img_out_tokens=4,
        max_new_tokens=4, cache_dtype=jnp.float32)


def _img_b64():
    buf = io.BytesIO()
    Image.new("RGB", (500, 500), (120, 50, 60)).save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


def test_controller_registry_and_dispatch():
    c = Controller("shortest_queue")
    c.register_worker("http://w1", True,
                      {"model_names": ["m"], "speed": 1, "queue_length": 0})
    c.register_worker("http://w2", True,
                      {"model_names": ["m"], "speed": 1, "queue_length": 5})
    assert c.list_models() == ["m"]
    assert c.get_worker_address("m") == "http://w1"
    assert c.get_worker_address("nope") == ""
    # stale expiry
    c.worker_info["http://w1"].last_heart_beat = time.time() - 100
    c.remove_stale_workers()
    assert "http://w1" not in c.worker_info
    assert c.receive_heart_beat("http://w2", 3)
    assert not c.receive_heart_beat("gone", 0)


@pytest.mark.slow
def test_engine_comprehension_runs():
    eng = _tiny_engine()
    text = eng.comprehension("what is this?", _img_b64())
    assert isinstance(text, str)


@pytest.mark.slow
def test_engine_speculative_matches_plain():
    """--speculative-k serving path: greedy output must be token-for-
    token identical to the non-speculative engine (worker.py
    --speculative-k; generator-level parity in test_generate.py)."""
    spec = TinySpec(batch=1, seq=64, image_size=56, nq=4)
    model, lm_cfg, vis_cfg = build_tiny_mllm(spec)
    batch = synthetic_batch(spec, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    from mllm_npu_tpu.data.processor import ImageProcessor
    proc = ImageProcessor(height=56, width=56)
    common = dict(
        model=model, lm_config=lm_cfg, params=params,
        tokenizer=FakeTokenizer(), image_transform=proc,
        resolution_grids=("1x1",), base_resolution=448,
        num_img_in_tokens=4, num_img_out_tokens=4,
        max_new_tokens=6, cache_dtype=jnp.float32)
    img = _img_b64()
    plain = InferenceEngine(**common).comprehension("describe", img)
    spec_e = InferenceEngine(speculative_k=4, speculative_ngram=2,
                             **common)
    assert spec_e.comprehension("describe", img) == plain


@pytest.mark.slow
def test_worker_and_controller_http():
    eng = _tiny_engine()

    async def run():
        w = ModelWorker("http://unused", "http://worker", "id0", "tiny",
                        eng, no_register=True)
        wapp = worker_mod.create_app(w)
        wserver = TestServer(wapp)
        wclient = TestClient(wserver)
        await wclient.start_server()

        # direct worker generate
        resp = await wclient.post("/worker_generate", json={
            "input_text": "hi", "image": _img_b64(), "image_gen": False})
        body = await resp.read()
        msg = json.loads(body.split(b"\0")[0])
        assert msg["error_code"] == 0

        # status
        resp = await wclient.post("/worker_get_status")
        status = await resp.json()
        assert status["model_names"] == ["tiny"]

        # controller proxying to the worker
        c = Controller("shortest_queue")
        capp = controller_mod.create_app(c)
        cserver = TestServer(capp)
        cclient = TestClient(cserver)
        await cclient.start_server()

        worker_url = str(wclient.make_url("")).rstrip("/")
        await cclient.post("/register_worker", json={
            "worker_name": worker_url, "check_heart_beat": False,
            "worker_status": {"model_names": ["tiny"], "speed": 1,
                              "queue_length": 0}})
        resp = await cclient.post("/list_models")
        assert (await resp.json())["models"] == ["tiny"]

        resp = await cclient.post("/worker_generate", json={
            "model": "tiny", "input_text": "hi", "image": _img_b64(),
            "image_gen": False})
        body = await resp.read()
        msg = json.loads(body.split(b"\0")[0])
        assert msg["error_code"] == 0

        await cclient.close()
        await wclient.close()

    asyncio.run(run())


@pytest.mark.slow
def test_batched_engine_serving_concurrent():
    """BatchedInferenceEngine: concurrent comprehension requests batch
    through one shared KV cache and match the single-request engine's
    output exactly (greedy, fp32 cache)."""
    from concurrent.futures import ThreadPoolExecutor

    from mllm_npu_tpu.serve.engine import BatchedInferenceEngine

    spec = TinySpec(batch=1, seq=64, image_size=56, nq=4)
    model, lm_cfg, vis_cfg = build_tiny_mllm(spec)
    batch = synthetic_batch(spec, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    tok = FakeTokenizer()

    from mllm_npu_tpu.data.processor import ImageProcessor
    proc = ImageProcessor(height=56, width=56)
    common = dict(
        model=model, lm_config=lm_cfg, params=params, tokenizer=tok,
        image_transform=proc, resolution_grids=("1x1",),
        base_resolution=448, num_img_in_tokens=4, num_img_out_tokens=4,
        max_new_tokens=6, cache_dtype=jnp.float32,
        cast_params_bf16=False)
    single = InferenceEngine(**common)
    batched = BatchedInferenceEngine(
        num_slots=4, max_len=64, max_prompt=32, block_steps=2,
        batch_prompt_bucket=16, **common)

    img = _img_b64()
    questions = [f"question number {i}?" for i in range(6)]
    expected = [single.comprehension(q, img) for q in questions]
    with ThreadPoolExecutor(max_workers=6) as ex:
        got = list(ex.map(lambda q: batched.comprehension(q, img),
                          questions))
    assert got == expected, (got, expected)

    # over-capacity prompt raises (maps to the worker's error_code 1)
    with pytest.raises(ValueError):
        batched.comprehension("x " * 200, img)


@pytest.mark.slow
def test_worker_text_only_comprehension():
    """A request without an image (null or absent key) is text-only
    chat: no vision tower run, error_code 0. This is the path the
    prompt-prefix KV cache accelerates."""
    eng = _tiny_engine()
    w = ModelWorker("http://unused", "http://worker", "id0", "tiny", eng,
                    no_register=True)
    for params in ({"input_text": "hello", "image": None},
                   {"input_text": "hello"}):
        chunks = list(w.generate_gate(params))
        msg = json.loads(chunks[0].rstrip(b"\0"))
        assert msg["error_code"] == 0, msg
        assert isinstance(msg["text"], str)


@pytest.mark.slow
def test_worker_error_contract():
    eng = _tiny_engine()
    w = ModelWorker("http://unused", "http://worker", "id0", "tiny", eng,
                    no_register=True)
    chunks = list(w.generate_gate({"input_text": "x", "image_gen": True}))
    msg = json.loads(chunks[0].rstrip(b"\0"))
    assert msg["error_code"] in (1, 3)   # no adapter loaded yet


@pytest.mark.slow
def test_worker_image_gen_end_to_end(monkeypatch):
    """image_gen=True through the full stack: SEED decode → forced
    ladder → output projector → DEBUG-sized SDXL adapter → b64 JPEG."""
    monkeypatch.setenv("DEBUG_FLAG", "True")
    from mllm_npu_tpu.models.factory import build_sdxl_adapter

    spec = TinySpec(batch=1, seq=64, image_size=56, nq=4)
    model, lm_cfg, vis_cfg = build_tiny_mllm(spec, seed=True)
    batch = synthetic_batch(spec, cmp_images=1, gen_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    from mllm_npu_tpu.data.processor import ImageProcessor
    adapter = build_sdxl_adapter(
        resampler={"embedding_dim": vis_cfg.hidden_size})
    # DEBUG adapter has no visual encoder; reuse prompt embeds as the
    # negative so CFG still runs
    orig = adapter.get_image_embeds

    def no_neg(image_embeds=None, **kw):
        pe, pooled = adapter.encode_image_embeds(image_embeds)
        return pe, pe, pooled, pooled

    adapter.get_image_embeds = no_neg
    eng = InferenceEngine(
        model=model, lm_config=lm_cfg, params=params,
        tokenizer=FakeTokenizer(),
        image_transform=ImageProcessor(height=56, width=56),
        adapter=adapter, resolution_grids=("1x1",), base_resolution=448,
        num_img_in_tokens=4, num_img_out_tokens=4,
        max_new_tokens=8, cache_dtype=jnp.float32)
    w = ModelWorker("http://unused", "http://worker", "id1", "tiny", eng,
                    no_register=True)
    chunks = list(w.generate_gate({"input_text": "a cat", "image_gen": True}))
    msg = json.loads(chunks[0].rstrip(b"\0"))
    assert msg["error_code"] == 0, msg
    import base64 as b64mod
    img_bytes = b64mod.b64decode(msg["image"])
    assert img_bytes[:2] == b"\xff\xd8"   # JPEG magic


def test_serve_utils_logger_and_semaphore(tmp_path, monkeypatch):
    """build_logger writes through a rotating file handler; semaphore
    pretty-print matches the reference's format (serve_utils.py:14-84)."""
    import logging

    from mllm_npu_tpu.serve import serve_utils

    monkeypatch.setattr(serve_utils, "handler", None)
    log = serve_utils.build_logger("t_logger", "t.log",
                                   log_dir=str(tmp_path))
    log.info("hello-from-test")
    for h in logging.getLogger().handlers:
        h.flush()
    serve_utils.handler.flush()
    assert "hello-from-test" in (tmp_path / "t.log").read_text()

    sem = asyncio.Semaphore(3)
    s = serve_utils.pretty_print_semaphore(sem)
    assert "value=3" in s and "locked=False" in s
    assert serve_utils.pretty_print_semaphore(None) == "None"


def test_build_logger_captures_stdout_stderr(tmp_path, monkeypatch):
    """With redirect on, bare print() and stderr writes land in the
    rotating log file (reference serve_utils.py:22-45 hijack)."""
    import logging
    import sys

    from mllm_npu_tpu.serve import serve_utils

    monkeypatch.setattr(serve_utils, "handler", None)
    monkeypatch.setenv("MLLM_LOG_REDIRECT", "1")
    old_out, old_err = sys.stdout, sys.stderr
    try:
        serve_utils.build_logger("t_logger2", "cap.log",
                                 log_dir=str(tmp_path))
        assert isinstance(sys.stdout, serve_utils.StreamToLogger)
        print("printed-line-for-capture")
        sys.stderr.write("stderr-line-for-capture\n")
        sys.stdout.flush()
        sys.stderr.flush()
    finally:
        sys.stdout, sys.stderr = old_out, old_err
    serve_utils.handler.flush()
    text = (tmp_path / "cap.log").read_text()
    assert "printed-line-for-capture" in text
    assert "stderr-line-for-capture" in text
    # the shim keeps the file-like surface real code probes
    shim = serve_utils.StreamToLogger(logging.getLogger("x"),
                                      logging.INFO)
    assert not shim.isatty() and shim.encoding == "utf-8"


def test_trackers_jsonl_sink(tmp_path):
    """Without wandb installed, Trackers records config + a metric
    history in the offline wandb-shaped JSONL sink (reference
    train/train.py:284-294 offline tracker)."""
    import json

    from mllm_npu_tpu.train.trackers import Trackers

    tr = Trackers(str(tmp_path), {"learning_rate": 1e-4,
                                  "output_dir": tmp_path}, tb=False)
    tr.log({"loss": 2.5}, step=1)
    tr.scalar("loss", 2.25, step=2)
    tr.close()
    cfg = json.loads((tmp_path / "wandb" / "config.json").read_text())
    assert cfg["learning_rate"] == 1e-4
    assert isinstance(cfg["output_dir"], str)  # non-scalars stringified
    lines = [json.loads(x) for x in
             (tmp_path / "wandb" / "metrics.jsonl").read_text()
             .splitlines()]
    assert [(r["_step"], r["loss"]) for r in lines] == [(1, 2.5),
                                                        (2, 2.25)]


@pytest.mark.slow
def test_add_special_tokens_tool(tmp_path):
    """The tokenizer-prep CLI adds the <img_*>/<loc-*>/span/box tokens
    and saves a loadable tokenizer (reference
    scripts/tools/add_special_tokens_to_tokenizer.py:1-36)."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    # build a minimal WordLevel tokenizer as the "base"
    try:
        from tokenizers import Tokenizer, models, pre_tokenizers
        from transformers import PreTrainedTokenizerFast
    except Exception:
        pytest.skip("tokenizers not available")
    tok = Tokenizer(models.WordLevel({"<unk>": 0, "hello": 1, "x": 2},
                                     unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    base = PreTrainedTokenizerFast(tokenizer_object=tok,
                                   unk_token="<unk>")
    base_dir = tmp_path / "base"
    base.save_pretrained(str(base_dir))

    out_dir = tmp_path / "out"
    script = Path(__file__).resolve().parents[1] / "scripts" / "tools" \
        / "add_special_tokens_to_tokenizer.py"
    r = subprocess.run(
        [_sys.executable, str(script), "--base", str(base_dir),
         "--out", str(out_dir), "--num_img_tokens", "8",
         "--num_loc_tokens", "4"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    from transformers import AutoTokenizer
    loaded = AutoTokenizer.from_pretrained(str(out_dir))
    for t in ("<img>", "</img>", "<patch>", "</patch>", "<img_00000>",
              "<img_00007>", "<loc-0>", "<loc-3>", "<box_start>",
              "<box_end>"):
        ids = loaded.encode(t, add_special_tokens=False)
        assert len(ids) == 1, (t, ids)
    assert loaded.pad_token == "<unk>"


@pytest.mark.slow
def test_streaming_comprehension():
    """stream=true: the worker emits multiple b'\\0'-delimited chunks of
    cumulative text; each is a prefix of the next and the final chunk
    equals the non-streamed answer."""
    from mllm_npu_tpu.serve.engine import BatchedInferenceEngine

    spec = TinySpec(batch=1, seq=64, image_size=56, nq=4)
    model, lm_cfg, _ = build_tiny_mllm(spec)
    batch = synthetic_batch(spec, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    from mllm_npu_tpu.data.processor import ImageProcessor
    eng = BatchedInferenceEngine(
        num_slots=2, max_len=64, max_prompt=32, block_steps=2,
        batch_prompt_bucket=16,
        model=model, lm_config=lm_cfg, params=params,
        tokenizer=FakeTokenizer(),
        image_transform=ImageProcessor(height=56, width=56),
        resolution_grids=("1x1",), base_resolution=448,
        num_img_in_tokens=4, num_img_out_tokens=4,
        max_new_tokens=8, cache_dtype=jnp.float32,
        cast_params_bf16=False)
    img = _img_b64()
    plain = eng.comprehension("what?", img)

    async def run():
        w = ModelWorker("http://unused", "http://worker", "id0", "tiny",
                        eng, no_register=True)
        client = TestClient(TestServer(worker_mod.create_app(w)))
        await client.start_server()
        resp = await client.post("/worker_generate", json={
            "input_text": "what?", "image": img, "image_gen": False,
            "stream": True})
        body = await resp.read()
        await client.close()
        return [json.loads(c) for c in body.split(b"\0") if c]

    chunks = asyncio.run(run())
    assert len(chunks) >= 2, chunks           # block_steps=2, T=8
    assert all(c["error_code"] == 0 for c in chunks)
    texts = [c["text"] for c in chunks]
    assert texts[-1] == plain
    for a, b in zip(texts, texts[1:]):
        assert b.startswith(a), (a, b)


def test_worker_config_json(tmp_path):
    """One JSON wires the full worker stack (reference
    configs/workers/seedx_workers.json:1): values become flag defaults,
    explicit CLI flags still override, and unknown keys fail loudly."""
    from pathlib import Path

    from mllm_npu_tpu.serve.worker import parse_worker_args

    wc = {"model_name": "seedx-json", "model_config": "m.yaml",
          "port": 41234, "batched": True, "num_slots": 4,
          "fuse_projections": True}
    p = tmp_path / "worker.json"
    p.write_text(json.dumps(wc))
    args = parse_worker_args(["--worker-config", str(p)])
    assert args.model_name == "seedx-json" and args.port == 41234
    assert args.batched and args.num_slots == 4
    assert args.fuse_projections and not args.quantize_int8

    args = parse_worker_args(["--worker-config", str(p),
                              "--model-name", "cli-wins"])
    assert args.model_name == "cli-wins"          # CLI beats JSON

    # JSON-enabled booleans must be overridable OFF from the CLI
    args = parse_worker_args(["--worker-config", str(p),
                              "--no-batched", "--no-fuse-projections"])
    assert not args.batched and not args.fuse_projections
    assert args.cast_bf16   # default stays on
    args = parse_worker_args(["--worker-config", str(p),
                              "--no-cast-bf16"])
    assert not args.cast_bf16

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"modle_config": "typo"}))
    with pytest.raises(SystemExit):
        parse_worker_args(["--worker-config", str(bad)])

    shipped = (Path(__file__).resolve().parents[1] / "mllm_npu_tpu" /
               "configs" / "workers" / "seedx_worker.json")
    args = parse_worker_args(["--worker-config", str(shipped)])
    assert args.model_config.endswith("seedx_llama2_13b_qwenvl_vitg.yaml")

    # fp8 KV cache flag: CLI + JSON-default forms both parse
    a_fp8 = parse_worker_args(["--model-config", "m.yaml",
                               "--kv-cache-dtype", "fp8"])
    assert a_fp8.kv_cache_dtype == "fp8"
    wc2 = {"model_config": "m.yaml", "kv_cache_dtype": "fp8"}
    p2 = tmp_path / "worker_fp8.json"
    p2.write_text(json.dumps(wc2))
    assert parse_worker_args(
        ["--worker-config", str(p2)]).kv_cache_dtype == "fp8"
    assert args.batched and args.num_slots == 8


@pytest.mark.slow
def test_engine_flags_thread_from_config(monkeypatch):
    """load_engine_from_config's engine-level flags reach the generator:
    fused+int8+unrolled is the 8B serving stack (VERDICT r1 item 8)."""
    monkeypatch.setenv("DEBUG_FLAG", "True")
    from mllm_npu_tpu.serve.worker import load_engine_from_config

    eng = load_engine_from_config(
        "models/mllm_llama3_8b_siglip_vit.yaml", max_new_tokens=4,
        cast_bf16=False, quantize_int8=True, fuse_projections=True,
        unroll_layers=True)
    gen = eng.generator
    assert gen.lm_config.fused_projections
    assert gen.lm_config.quantization == "int8"
    assert gen.lm_config.scan_layers is False
    out = gen.generate(jnp.asarray([[5, 6, 7]], jnp.int32))
    assert out["generate_ids"].shape[1] == 4
